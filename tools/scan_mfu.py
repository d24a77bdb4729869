"""Scan speed-of-light analysis: achieved vs empirical VPU ceiling.

VERDICT round-2 item 3: either make VSSM-T 2x faster or prove where the
time goes. The selective scan is VPU-bound (elementwise exp/FMA chains
over (N, block_d) lanes — no MXU work), so MXU-peak "MFU" is the wrong
lens. This tool:

1. measures an empirical VPU ceiling on the chip: a Pallas kernel
   running the scan's own per-cell arithmetic (exp + 2 FMA + output
   FMA) with NO sequential dependence, on the same block shapes;
2. measures the real fused forward scan on ARM-B / VSSM stage shapes;
3. reports cells/s for both -> sequential-chain utilization, plus the
   per-model VPU-op accounting.

Usage: python tools/scan_mfu.py
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from tools.sweep_scan import make_args, timeit  # noqa: E402


def _ceiling_kernel(u_ref, dt_ref, at_ref, b_ref, y_ref, *, chunk,
                    use_exp=True):
    """Same per-cell arithmetic as the scan (exp + b-build + FMA + C
    reduce), but h depends only on t's own a/b — no cross-t chain.
    ``use_exp=False`` swaps exp for a multiply to price the
    transcendental."""
    u = u_ref[0].astype(jnp.float32)
    dt = dt_ref[0].astype(jnp.float32)
    a_t = at_ref[...]  # (N, block_d)
    bmat = b_ref[0].astype(jnp.float32)
    pre = dt[:, None, :] * a_t[None, :, :]
    a = jnp.exp(pre) if use_exp else pre * 1.0001  # (chunk, N, bd)
    b = (dt * u)[:, None, :] * bmat[:, :, None]
    h = a * b + b  # dependence-free FMA stand-in
    y = jnp.sum(bmat[:, :, None] * h, axis=1)
    y_ref[0] = y.astype(y_ref.dtype)


def ceiling_time(batch_k, seq_len, d, n, chunk=32, block_d=None,
                 use_exp=True):
    from medical_image_analysis_tpu.ops.selective_scan_pallas import (
        _pad_to,
        _pick_block_d,
    )

    block_d = block_d or _pick_block_d(d)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((batch_k, seq_len, d)), jnp.float32)
    dt = jnp.asarray(
        rng.standard_normal((batch_k, seq_len, d)) * 0.1, jnp.float32
    )
    at = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    bm = jnp.asarray(rng.standard_normal((batch_k, seq_len, n)), jnp.float32)
    u_p = _pad_to(_pad_to(u, chunk, 1), block_d, 2)
    dt_p = _pad_to(_pad_to(dt, chunk, 1), block_d, 2)
    at_p = _pad_to(at, block_d, 1)
    b_p = _pad_to(bm, chunk, 1)
    lp, dp = u_p.shape[1], u_p.shape[2]

    f = jax.jit(lambda u_, dt_, at_, b_: pl.pallas_call(
        functools.partial(_ceiling_kernel, chunk=chunk, use_exp=use_exp),
        grid=(batch_k, dp // block_d, lp // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, j, l: (b, l, j)),
            pl.BlockSpec((1, chunk, block_d), lambda b, j, l: (b, l, j)),
            pl.BlockSpec((n, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((1, chunk, n), lambda b, j, l: (b, l, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, block_d), lambda b, j, l: (b, l, j)),
        out_shape=jax.ShapeDtypeStruct((batch_k, lp, dp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(u_, dt_, at_, b_))
    return timeit(lambda: f(u_p, dt_p, at_p, b_p))


def scan_time(b, k, l, d, n, chunk=None):
    from medical_image_analysis_tpu.ops.selective_scan_pallas import (
        selective_scan_dirs,
    )

    args = make_args(b, k, l, d, n)
    kw = {} if chunk is None else {"chunk": chunk}
    f = jax.jit(functools.partial(
        selective_scan_dirs, delta_softplus=True, **kw
    ))
    return timeit(lambda: f(*args))


def report(name, b, k, l, d, n):
    t_scan = scan_time(b, k, l, d, n)
    t_ceil = ceiling_time(b * k, l, d, n)
    t_noexp = ceiling_time(b * k, l, d, n, use_exp=False)
    cells = b * k * l * d * n
    print(
        f"{name}: scan {t_scan:7.2f} ms ({cells / t_scan * 1e-6:7.1f} "
        f"Gcell/s) | dependence-free ceiling {t_ceil:7.2f} ms "
        f"({cells / t_ceil * 1e-6:7.1f} Gcell/s) | no-exp ceiling "
        f"{t_noexp:7.2f} ms | chain efficiency "
        f"{t_ceil / t_scan * 100:5.1f}%"
    )
    return t_scan, t_ceil


def main():
    print(f"backend={jax.default_backend()}")
    # ARM-B layer shape (B=32): L=197->matches bench_backbones
    report("ARM-B layer  (B=32, K=4, L=257, D=1536, N=16)",
           32, 4, 257, 1536, 16)
    # VSSM-T stage shapes (B=64)
    report("VSSM-T stage1(B=64, K=4, L=3136, D=192, N=16)",
           64, 4, 3136, 192, 16)
    report("VSSM-T stage2(B=64, K=4, L=784,  D=384, N=16)",
           64, 4, 784, 384, 16)
    report("VSSM-T stage3(B=64, K=4, L=196,  D=768, N=16)",
           64, 4, 196, 768, 16)


if __name__ == "__main__":
    main()
