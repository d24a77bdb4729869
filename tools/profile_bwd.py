"""Split fused-Mamba backward cost: reverse kernel vs XLA closure."""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from medical_image_analysis_tpu.ops import mamba_fused as mf  # noqa: E402
from tools.sweep_scan import timeit  # noqa: E402


def arm_layer_args(b=32, l=257, d_model=768, d_inner=1536, n=16, r=48,
                   taps=4, k=4):
    rng = np.random.default_rng(0)

    def f(*shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr = f(b, l, d_inner).astype(jnp.bfloat16)
    xc = f(b, l, d_inner).astype(jnp.bfloat16)
    p = dict(
        conv_w=f(k, taps, d_inner),
        conv_b=f(k, d_inner),
        x_proj_w=f(k, r + 2 * n, d_inner),
        dt_proj_w=f(k, d_inner, r),
        dt_bias=f(k, d_inner),
        A=-jnp.exp(f(k, d_inner, n)),
        D=f(k, d_inner),
    )
    return xr, xc, p


def main():
    xr, xc, p = arm_layer_args()
    chunk, block_d = 32, 768
    print(f"backend={jax.default_backend()}")

    fwd = jax.jit(functools.partial(
        mf.mamba_fused_dirs, chunk=chunk, block_d=block_d,
    ))
    ms = timeit(lambda: fwd(xr, xc, **p))
    print(f"layer fwd: {ms:.2f} ms")

    def loss(xr, xc, conv_w, conv_b, x_proj_w, dt_proj_w, dt_bias, A, D):
        y = mf.mamba_fused_dirs(
            xr, xc, conv_w, conv_b, x_proj_w, dt_proj_w, dt_bias, A, D,
            chunk=chunk, block_d=block_d,
        )
        return jnp.sum(y.astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 4, 5)))
    ms = timeit(lambda: g(xr, xc, p["conv_w"], p["conv_b"], p["x_proj_w"],
                          p["dt_proj_w"], p["dt_bias"], p["A"], p["D"])[0])
    print(f"layer fwd+bwd (full): {ms:.2f} ms")

    # kernel-only bwd: call _core_bwd with fabricated residuals
    seq_len, d_in = xr.shape[1], xr.shape[2]
    xs = jnp.stack([xr, xc], axis=1)
    conv_b_in = p["conv_b"].astype(jnp.float32)[:, None, :]
    a_t = p["A"].transpose(0, 2, 1)
    wx_t = p["x_proj_w"].transpose(0, 2, 1)
    dtw_t = p["dt_proj_w"].transpose(0, 2, 1)
    db = p["dt_bias"][:, None, :]
    dv = p["D"][:, None, :]

    y, xdbl, carries = mf._fused_fwd(
        xs, p["conv_w"], conv_b_in, wx_t, dtw_t, db, a_t, dv,
        4, True, chunk, block_d, False, True, True,
    )
    res = (xs, p["conv_w"], conv_b_in, wx_t, dtw_t, db, a_t, dv, xdbl,
           carries)
    dy = jnp.ones_like(y)

    full_bwd = jax.jit(lambda res, dy: mf._core_bwd(
        4, True, chunk, block_d, False, True, True, res, dy
    )[0])
    ms = timeit(lambda: full_bwd(res, dy))
    print(f"bwd total (kernel + closure): {ms:.2f} ms")


if __name__ == "__main__":
    main()
