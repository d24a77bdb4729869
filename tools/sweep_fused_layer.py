"""Sweep chunk/block_d/seq knobs of the fused K-dir Mamba layer at the
VSSM-T stage shapes that dominate training time.

The round-5 profile (BENCH_QUEUE_r5/vssm_profile.log) shows the fused
scan layers at 273 of 351 ms fwd+bwd (B=64), so the VSSM-T throughput
item lives or dies inside this kernel.  This sweep answers whether the
round-3-tuned defaults (chunk=64, largest aligned block_d, sequential
FMA chain) are still optimal for the *training* direction at the exact
stage shapes, fwd and fwd+bwd separately.

Usage: python tools/sweep_fused_layer.py [batch]
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

# (name, L, d_inner, rank, depth) for VSSM-T at 224^2
STAGES = [
    ("stage0", 56 * 56, 192, math.ceil(96 / 16), 2),
    ("stage1", 28 * 28, 384, math.ceil(192 / 16), 2),
    ("stage2", 14 * 14, 768, math.ceil(384 / 16), 5),
    ("stage3", 7 * 7, 1536, math.ceil(768 / 16), 2),
]
N = 16
K = 4


def layer_times(batch, l, d_inner, rank, chunk, block_d, seq):
    rng = np.random.default_rng(0)

    def f(*shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr = f(batch, l, d_inner).astype(jnp.bfloat16)
    xc = f(batch, l, d_inner).astype(jnp.bfloat16)
    p = dict(
        x_proj_w=f(K, rank + 2 * N, d_inner),
        dt_proj_w=f(K, d_inner, rank),
        dt_bias=f(K, d_inner),
        A=-jnp.exp(f(K, d_inner, N)),
        D=f(K, d_inner),
    )

    def fwd(xr, xc, p):
        return mf.mamba_fused_dirs(
            xr, xc, None, None, **p, chunk=chunk, block_d=block_d, seq=seq
        )

    jfwd = jax.jit(fwd)
    try:
        t_f = timeit(lambda: jfwd(xr, xc, p))
    except Exception as e:  # noqa: BLE001
        return None, f"fwd: {type(e).__name__}: {str(e)[:80]}"

    def loss(xr, xc, p):
        return jnp.sum(fwd(xr, xc, p).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    try:
        t_fb = timeit(lambda: g(xr, xc, p)[0])
    except Exception as e:  # noqa: BLE001
        return t_f, f"bwd: {type(e).__name__}: {str(e)[:80]}"
    return t_f, t_fb


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = sys.argv[2] if len(sys.argv) > 2 else None
    print(f"backend={jax.default_backend()} B={batch}")
    totals = {}
    for name, l, d_inner, rank, depth in STAGES:
        if only and name != only:
            continue
        dp = ((d_inner + 127) // 128) * 128
        blocks = sorted(
            {bd for bd in (128, 256, 384, 512, 768) if dp % bd == 0},
            reverse=True,
        )
        chunks = [c for c in (256, 128, 64, 32) if c <= l]
        print(f"-- {name}: L={l} Din={d_inner} R={rank} x{depth} "
              f"(blocks {blocks})")
        for seq in (True, False):
            for bd in blocks:
                for c in chunks:
                    t_f, t_fb = layer_times(batch, l, d_inner, rank, c, bd, seq)
                    tag = f"seq={int(seq)} bd={bd:4d} c={c:3d}"
                    if t_f is None or isinstance(t_fb, str):
                        print(f"  {tag}: FAIL {t_fb}")
                        continue
                    print(f"  {tag}: fwd {t_f:7.2f} ms  fwd+bwd {t_fb:7.2f} ms")
                    key = (seq, bd, c)
                    tf0, tfb0 = totals.get(key, (0.0, 0.0))
                    totals[key] = (tf0 + depth * t_f, tfb0 + depth * t_fb)
    if not only and totals:
        best = min(totals.items(), key=lambda kv: kv[1][1])
        (seq, bd, c), (tf, tfb) = best
        print(f"best total (all stages): seq={int(seq)} bd={bd} c={c} "
              f"-> fwd {tf:.1f} ms, fwd+bwd {tfb:.1f} ms")


if __name__ == "__main__":
    main()
