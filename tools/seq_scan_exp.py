"""Experiment: sequential (unrolled) in-chunk scan vs Hillis-Steele.

The VPU is one wide SIMD unit — cross-row parallelism already comes from
the (N, block_d) lanes, so a dependent chain of `chunk` FMAs may beat
log2(chunk) full-tensor Hillis-Steele rounds. Fwd only.
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

from medical_image_analysis_tpu.ops.selective_scan_pallas import (  # noqa: E402
    _pad_to,
    _specs,
)
from tools.sweep_scan import make_args, timeit  # noqa: E402


def _fwd_seq_kernel(
    u_ref, dt_ref, at_ref, b_ref, c_ref, d_ref, db_ref,
    y_ref,
    h_ref,
    *, chunk, delta_softplus,
):
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    u = u_ref[0].astype(jnp.float32)
    dt = dt_ref[0].astype(jnp.float32) + db_ref[0, 0][None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    a_t = at_ref[0]
    bmat = b_ref[0].astype(jnp.float32)
    cmat = c_ref[0].astype(jnp.float32)

    a = jnp.exp(dt[:, None, :] * a_t[None, :, :])
    b = (dt * u)[:, None, :] * bmat[:, :, None]

    h = h_ref[:]
    hs = []
    for t in range(chunk):
        h = a[t] * h + b[t]
        hs.append(h)
    h_all = jnp.stack(hs)  # (chunk, N, bd)
    h_ref[:] = h

    y = jnp.sum(cmat[:, :, None] * h_all, axis=1)
    y = y + u * d_ref[0, 0][None, :]
    y_ref[0] = y.astype(y_ref.dtype)


def seq_scan_fwd(u, delta, a_t, bmat, cmat, d_vec, delta_bias,
                 delta_softplus=True, chunk=32, block_d=512):
    batch, k, seq_len, d_total = u.shape
    n = a_t.shape[-1]
    n_groups = k
    u = u.reshape(batch * k, seq_len, d_total)
    delta = delta.reshape(batch * k, seq_len, d_total)
    bmat = bmat.reshape(batch * k, seq_len, n)
    cmat = cmat.reshape(batch * k, seq_len, n)
    a_tt = a_t.astype(jnp.float32).transpose(0, 2, 1)
    d_vecp = d_vec.astype(jnp.float32)[:, None, :]
    db = delta_bias.astype(jnp.float32)[:, None, :]

    u_p = _pad_to(_pad_to(u, chunk, 1), block_d, 2)
    dt_p = _pad_to(_pad_to(delta, chunk, 1), block_d, 2)
    at_p = _pad_to(a_tt, block_d, 2)
    b_p = _pad_to(bmat, chunk, 1)
    c_p = _pad_to(cmat, chunk, 1)
    dv_p = _pad_to(d_vecp, block_d, 2)
    db_p = _pad_to(db, block_d, 2)

    lp, dp = u_p.shape[1], u_p.shape[2]
    nl, ndb = lp // chunk, dp // block_d
    im = _specs(n_groups)

    y = pl.pallas_call(
        functools.partial(
            _fwd_seq_kernel, chunk=chunk, delta_softplus=delta_softplus
        ),
        grid=(batch * k, ndb, nl),
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), im["seq"]),
            pl.BlockSpec((1, chunk, block_d), im["seq"]),
            pl.BlockSpec((1, n, block_d), im["param"]),
            pl.BlockSpec((1, chunk, n), im["bc"]),
            pl.BlockSpec((1, chunk, n), im["bc"]),
            pl.BlockSpec((1, 1, block_d), im["vec"]),
            pl.BlockSpec((1, 1, block_d), im["vec"]),
        ],
        out_specs=pl.BlockSpec((1, chunk, block_d), im["seq"]),
        out_shape=jax.ShapeDtypeStruct((batch * k, lp, dp), u.dtype),
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(u_p, dt_p, at_p, b_p, c_p, dv_p, db_p)
    return y[:, :seq_len, :d_total].reshape(batch, k, seq_len, d_total)


def main():
    b, k, l, d, n = 32, 4, 257, 1536, 16
    args = make_args(b, k, l, d, n)
    print(f"backend={jax.default_backend()}")
    for chunk, bd in [(32, 512), (16, 512), (8, 512), (16, 768), (32, 768),
                      (16, 1536)]:
        f = jax.jit(functools.partial(seq_scan_fwd, chunk=chunk, block_d=bd))
        try:
            ms = timeit(lambda: f(*args))
            print(f"seq chunk={chunk:4d} block_d={bd:4d}: {ms:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"seq chunk={chunk:4d} block_d={bd:4d}: FAIL {e}")
        sys.stdout.flush()
    # correctness vs the HS kernel
    from medical_image_analysis_tpu.ops.selective_scan_pallas import (
        selective_scan_dirs,
    )
    ref = selective_scan_dirs(*args, delta_softplus=True)
    got = seq_scan_fwd(*args, chunk=32, block_d=512)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print("max |seq - hs| =", err)


if __name__ == "__main__":
    main()
