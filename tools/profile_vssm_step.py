"""VSSM-T fwd/bwd decomposition: fused-scan layers vs XLA glue.

ROADMAP open item: VSSM-T fwd+bwd has not moved since round 2
(~350 ms at B=64) while the scan SoL analysis (tools/scan_mfu.py) shows
the scans at 59-78% of their own dependence-free ceiling.  This tool
answers "where do the OTHER milliseconds go" the way
tools/profile_mae_step.py did for MAE:

  1. model fwd and fwd+bwd (the bench_backbones numbers),
  2. standalone fused-layer (mamba_fused_dirs) fwd and fwd+bwd at each
     stage's exact shape, times the stage depth  -> scan subtotal,
  3. glue = model - scan (in_proj/conv2d/gating/out_proj/MLP/LN/
     cross-scan layout transposes and their backward),
  4. cross-check: the same model with the fused scan stubbed out by a
     shape-preserving elementwise combine (monkeypatch) — measures glue
     directly instead of by subtraction.

Usage: python tools/profile_vssm_step.py [batch]
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
from medical_image_analysis_tpu.ops import mamba_fused as mf  # noqa: E402
from medical_image_analysis_tpu.models.vmamba import build_vssm  # noqa: E402

DEPTHS = (2, 2, 5, 2)
DIMS = (96, 192, 384, 768)
IMG = 224


def stage_shapes(batch):
    """(depth, L, d_inner, rank) per stage for VSSM-T at 224²."""
    out = []
    hw = IMG // 4
    for depth, dim in zip(DEPTHS, DIMS):
        out.append((depth, hw * hw, 2 * dim, math.ceil(dim / 16)))
        hw //= 2
    return out


def layer_times(batch, l, d_inner, rank, n=16, k=4):
    """Standalone fused-layer fwd / fwd+bwd ms at one stage shape,
    matching SS2D's fused call exactly (conv outside the kernel)."""
    rng = np.random.default_rng(0)

    def f(*shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr = f(batch, l, d_inner).astype(jnp.bfloat16)
    xc = f(batch, l, d_inner).astype(jnp.bfloat16)
    p = dict(
        x_proj_w=f(k, rank + 2 * n, d_inner),
        dt_proj_w=f(k, d_inner, rank),
        dt_bias=f(k, d_inner),
        A=-jnp.exp(f(k, d_inner, n)),
        D=f(k, d_inner),
    )

    def fwd(xr, xc, p):
        return mf.mamba_fused_dirs(xr, xc, None, None, **p)

    jfwd = jax.jit(fwd)
    t_f = timeit(lambda: jfwd(xr, xc, p))

    def loss(xr, xc, p):
        return jnp.sum(fwd(xr, xc, p).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t_fb = timeit(lambda: g(xr, xc, p)[0])
    return t_f, t_fb


def model_times(batch, stub=False):
    model = build_vssm("vssm_tiny")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, IMG, IMG, 3)),
        jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)

    orig = mf.mamba_fused_dirs
    if stub:
        def stub_dirs(xr, xc, conv_w, conv_b, x_proj_w, dt_proj_w, dt_bias,
                      A, D, **kw):
            # shape-preserving, O(BLD) elementwise: keeps every layout
            # transform, projection, and residual path live while
            # removing the scan kernel itself.
            s = D.sum() * 1e-3
            return jnp.stack(
                [xr, xr * 0.5 + s, xc, xc * 0.5 + s], axis=1
            ).astype(xr.dtype)
        mf.mamba_fused_dirs = stub_dirs
    try:
        fwd = jax.jit(lambda p, x: model.apply(p, x))
        t_f = timeit(lambda: fwd(params, x))

        from medical_image_analysis_tpu.ops.vit_block import training_trace

        def loss(p, x):
            with training_trace():
                out = model.apply(p, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))
        t_fb = timeit(lambda: jax.tree_util.tree_leaves(g(params, x))[0])
    finally:
        mf.mamba_fused_dirs = orig
    return t_f, t_fb


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"backend={jax.default_backend()} B={batch}")

    t_f, t_fb = model_times(batch)
    print(f"model fwd: {t_f:.1f} ms   fwd+bwd: {t_fb:.1f} ms "
          f"({batch / t_fb * 1000:.0f} img/s)")

    scan_f = scan_fb = 0.0
    for i, (depth, l, d_inner, rank) in enumerate(stage_shapes(batch)):
        lf, lfb = layer_times(batch, l, d_inner, rank)
        scan_f += depth * lf
        scan_fb += depth * lfb
        print(f"stage{i} (L={l}, Din={d_inner}) x{depth}: "
              f"layer fwd {lf:.2f} ms, fwd+bwd {lfb:.2f} ms "
              f"-> subtotal {depth * lf:.1f} / {depth * lfb:.1f} ms")
    print(f"scan layers total: fwd {scan_f:.1f} ms, fwd+bwd {scan_fb:.1f} ms")
    print(f"glue (model - scan): fwd {t_f - scan_f:.1f} ms, "
          f"fwd+bwd {t_fb - scan_fb:.1f} ms")

    s_f, s_fb = model_times(batch, stub=True)
    print(f"stub cross-check (scan replaced by elementwise): "
          f"fwd {s_f:.1f} ms, fwd+bwd {s_fb:.1f} ms")


if __name__ == "__main__":
    main()
