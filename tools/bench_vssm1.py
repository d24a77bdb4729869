"""Throughput of the vssm1 (d_state=1) family vs the reference's own
published numbers.

The ONLY training-throughput numbers the reference publishes are for
this family: ``VMamba/README.md:44-66`` ("The History of Speed Up",
1xA100, batch 128, config vssm_tiny_224_0220 = d_state 1, depths
[2,2,4,2]) — best row ``ssoflex + csm in triton + i16o32 + v4`` at
**0.2970 s/iter = 431.0 img/s**.  Normalizing by bf16 peak
(A100 312 TF, v5e 197 TF), per-chip parity on v5e = **272 img/s**.

This tool measures our vssm1_tiny at the same batch and image size
(fwd, fwd+bwd, and fwd+bwd+AdamW-update to match their full iter), the
per-stage scan_n1 kernel standalone (scan-vs-glue decomposition), and
prints the normalized ratio.

Usage: python tools/bench_vssm1.py [batch] [model]
"""

import math
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from tools.sweep_scan import timeit  # noqa: E402
from medical_image_analysis_tpu.ops.scan_n1 import scan_n1_dirs  # noqa: E402
from medical_image_analysis_tpu.models.vmamba import (  # noqa: E402
    VSSM_CONFIGS, build_vssm,
)

IMG = 224
A100_IMG_S = 431.0          # 0.2970 s/iter @ bs128, VMamba/README.md:66
A100_BF16_TF = 312.0
V5E_BF16_TF = 197.0


def layer_times(batch, l, d_inner, rank):
    rng = np.random.default_rng(0)

    def f(*shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr = f(batch, l, d_inner).astype(jnp.bfloat16)
    xc = f(batch, l, d_inner).astype(jnp.bfloat16)
    p = dict(
        x_proj_w=f(4, rank + 2, d_inner),
        dt_proj_w=f(4, d_inner, rank),
        dt_bias=f(4, d_inner),
        A=-jnp.exp(f(4, d_inner, 1)),
        D=f(4, d_inner),
    )

    def fwd(xr, xc, p):
        return scan_n1_dirs(xr, xc, **p)

    jfwd = jax.jit(fwd)
    t_f = timeit(lambda: jfwd(xr, xc, p))

    def loss(xr, xc, p):
        return jnp.sum(fwd(xr, xc, p).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t_fb = timeit(lambda: g(xr, xc, p)[0])
    return t_f, t_fb


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    name = sys.argv[2] if len(sys.argv) > 2 else "vssm1_tiny"
    print(f"backend={jax.default_backend()} B={batch} model={name}")

    model = build_vssm(name)
    cfg = VSSM_CONFIGS[name]
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, IMG, IMG, 3)),
        jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(0), x[:2])
    params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)

    fwd = jax.jit(lambda p, x: model.apply(p, x))
    t_f = timeit(lambda: fwd(params, x))
    print(f"model fwd: {t_f:.1f} ms ({batch / t_f * 1000:.0f} img/s)")

    from medical_image_analysis_tpu.ops.vit_block import training_trace

    def loss(p, x):
        with training_trace():
            out = model.apply(p, x)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    t_fb = timeit(lambda: jax.tree_util.tree_leaves(g(params, x))[0])
    print(f"model fwd+bwd: {t_fb:.1f} ms ({batch / t_fb * 1000:.0f} img/s)")

    # Full train iter (grad + AdamW), apples-to-apples with the
    # reference's s/iter table.
    import optax

    opt = optax.adamw(1e-4, weight_decay=0.05)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x):
        grads = jax.grad(loss)(p, x)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s

    t_it = timeit(lambda: jax.tree_util.tree_leaves(
        step(params, opt_state, x))[0])
    img_s = batch / t_it * 1000
    norm_target = A100_IMG_S * V5E_BF16_TF / A100_BF16_TF
    print(f"full iter (grad+AdamW): {t_it:.1f} ms ({img_s:.0f} img/s)")
    print(
        f"reference best (1xA100 bs128, VMamba/README.md:66): "
        f"{A100_IMG_S:.0f} img/s -> x{V5E_BF16_TF / A100_BF16_TF:.3f} "
        f"peak-bf16 normalized = {norm_target:.0f} img/s on v5e; "
        f"ours/normalized = {img_s / norm_target:.2f}x"
    )

    # scan-vs-glue decomposition
    scan_f = scan_fb = 0.0
    hw = IMG // 4
    for i, (depth, dim) in enumerate(zip(cfg["depths"], cfg["dims"])):
        l, d_inner, rank = hw * hw, 2 * dim, math.ceil(dim / 16)
        lf, lfb = layer_times(batch, l, d_inner, rank)
        scan_f += depth * lf
        scan_fb += depth * lfb
        print(f"stage{i} (L={l}, Din={d_inner}) x{depth}: "
              f"scan_n1 fwd {lf:.2f} ms, fwd+bwd {lfb:.2f} ms "
              f"-> subtotal {depth * lf:.1f} / {depth * lfb:.1f} ms")
        hw //= 2
    print(f"scan layers total: fwd {scan_f:.1f} ms, fwd+bwd {scan_fb:.1f} ms")
    print(f"glue (model - scan): fwd {t_f - scan_f:.1f} ms, "
          f"fwd+bwd {t_fb - scan_fb:.1f} ms")


if __name__ == "__main__":
    main()
