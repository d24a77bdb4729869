"""Experiment: pairwise-combined sequential scan (half the serial chain).

The scan-vs-ceiling measurements (tools/scan_mfu.py) put the sequential
chain's cost at 32-45%. Pairing converts serial latency into parallel
work: precompute a2=a[2t+1]*a[2t], b2=a[2t+1]*b[2t]+b[2t+1] (parallel),
run the dependent chain over chunk/2 steps, then recover even positions
in parallel. Fwd only; compares time + numerics vs the production
kernel.
"""

import functools
import os
import sys

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
    selective_scan_dirs,
)
from tools.sweep_scan import make_args, timeit  # noqa: E402


def _fwd_pair_kernel(
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

    half = chunk // 2
    # Strided slices lower to (unsupported) gathers in Mosaic; split
    # even/odd by reshaping the untiled leading axis instead.
    a4 = a.reshape(half, 2, *a.shape[1:])
    b4 = b.reshape(half, 2, *b.shape[1:])
    a_ev, a_od = a4[:, 0], a4[:, 1]
    b_ev, b_od = b4[:, 0], b4[:, 1]
    a2 = a_od * a_ev                # parallel pair combine
    b2 = a_od * b_ev + b_od

    h = h_ref[:]
    odds = []
    for t in range(half):           # dependent chain, chunk/2 steps
        h = a2[t] * h + b2[t]
        odds.append(h)
    h_od_all = jnp.stack(odds)      # h at 1,3,5,...
    h0 = h_ref[:]                   # incoming chunk carry (read BEFORE
    h_ref[:] = h                    # overwriting with the new carry)

    # Even positions recovered in parallel from the prior odd state:
    # h_ev[t] = a_ev[t] * prev_odd[t] + b_ev[t], prev_odd[0] = h0.
    prev_odd = jnp.concatenate([h0[None], h_od_all[:-1]], axis=0)
    h_ev_all = a_ev * prev_odd + b_ev

    h_all = jnp.stack([h_ev_all, h_od_all], axis=1).reshape(
        chunk, *h_od_all.shape[1:]
    )
    y = jnp.sum(cmat[:, :, None] * h_all, axis=1)
    y = y + u * d_ref[0, 0][None, :]
    y_ref[0] = y.astype(y_ref.dtype)


def pair_scan_fwd(u, delta, a_t, bmat, cmat, d_vec, delta_bias,
                  delta_softplus=True, chunk=64, block_d=None):
    from medical_image_analysis_tpu.ops.selective_scan_pallas import (
        _pick_block_d,
    )

    batch, k, seq_len, d_total = u.shape
    n = a_t.shape[-1]
    block_d = block_d or _pick_block_d(d_total)
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
    im = _specs(k)
    y = pl.pallas_call(
        functools.partial(
            _fwd_pair_kernel, chunk=chunk, delta_softplus=delta_softplus
        ),
        grid=(batch * k, dp // block_d, lp // chunk),
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
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(u_p, dt_p, at_p, b_p, c_p, dv_p, db_p)
    return y[:, :seq_len, :d_total].reshape(batch, k, seq_len, d_total)


def main():
    print(f"backend={jax.default_backend()}")
    shapes = {
        "stage1": (64, 4, 3136, 192, 16),
        "arm   ": (32, 4, 257, 1536, 16),
    }
    for name, sh in shapes.items():
        args = make_args(*sh)
        base = jax.jit(functools.partial(
            selective_scan_dirs, delta_softplus=True
        ))
        ms0 = timeit(lambda: base(*args))
        for chunk in (32, 64, 128):
            f = jax.jit(functools.partial(
                pair_scan_fwd, chunk=chunk
            ))
            try:
                ms = timeit(lambda: f(*args))
                ref = base(*args)
                got = f(*args)
                err = float(jnp.max(jnp.abs(
                    ref.astype(jnp.float32) - got.astype(jnp.float32)
                )))
                print(f"{name} pair chunk={chunk:4d}: {ms:7.2f} ms "
                      f"(prod {ms0:7.2f}) maxerr={err:.2e}", flush=True)
            except Exception as e:
                print(f"{name} pair chunk={chunk:4d}: FAIL {str(e)[:110]}",
                      flush=True)


if __name__ == "__main__":
    main()
