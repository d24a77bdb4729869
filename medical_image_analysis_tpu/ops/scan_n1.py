"""Batch-packed Pallas scan for d_state=1 VMamba ("vssm1" nightly family).

The reference's production backbones — R2GenCSR's vision tower loads
``VMamba/classification/configs/vssm1/vssm_base_224.yaml`` (R2GenCSR.py:79)
— and every row of the published speed table
(``VMamba/README.md:44-66``, 0.297 s/iter best) use **SSM_D_STATE: 1**,
not the d_state=16 v0 architecture.  At N=1 the selective scan
degenerates to a per-channel linear recurrence

    h[t,d] = a[t,d] * h[t-1,d] + dt[t,d] * B[t] * u[t,d]
    y[t,d] = C[t] * h[t,d] + D_skip[d] * u[t,d]
    a[t,d] = exp(dt[t,d] * A[d])

with scalar B/C per timestep.  Running this through the general
``(N, block_d)``-laid-out kernel (selective_scan_pallas.py) wastes 7/8
of every VPU op: the N axis sits on sublanes and pads 1 -> 8.

TPU-first design here instead packs EIGHT BATCH ROWS into the sublanes:

- Inputs are laid out ``(S, BT, L, 8, D)`` (BT = ceil(B/8) batch tiles,
  S = row-/column-major source copies), so each timestep slice
  ``u[t]`` is one native ``(8, block_d)`` vreg tile and the dependent
  chain FMA runs at full VPU width with zero padding waste.
- Grid ``(S*BT, D-blocks, L-chunks)``, L innermost; VMEM scratch
  carries ``h`` (8, block_d) across chunks (same carry discipline as
  selective_scan_pallas.py, proven on-chip rounds 2-4).
- ``dt_proj`` runs in-kernel on the MXU ((chunk*8, R) @ (R, block_d));
  the fp32 ``(B,K,L,D)`` dt tensor never exists (same reasoning as
  mamba_fused.py).
- ``x_dbl = x @ Wx^T`` stays in XLA *outside* the custom VJP, so its
  pullback (dWx, and the x_proj path of du) composes automatically.
- Direction reversal is a STATIC kernel parameter: one launch covers
  the two forward directions (row+, col+), a second the two reversed
  ones, each with the chunk-grid index maps and the in-chunk unroll
  running in its scan order.  No VMEM row flips at all (mamba_fused.py
  needs anti-identity matmul flips because one launch serves all four
  directions; at N=1 the two-launch split is cheaper than the flips).

Backward: reverse-order grid recomputes in-chunk states from saved
chunk-start carries, runs the adjoint suffix chain, and emits du,
per-d-block dx_dbl partials, and fp32-accumulated dA/dD/d dt_bias/dW_dt
(mirroring mamba_fused.py's accumulation pattern).

Reference spec: ``selective_scan_easy`` (test_selective_scan_easy.py:
14-98) restricted to N=1; forced-fp32 recurrence per vmamba.py:394-404.

Numerics: the recurrence (a/b build, chain, C-reduce) is fp32 on the
VPU; the in-kernel ``dt_proj`` matmuls request fp32 accumulation
(``preferred_element_type``), which Mosaic lowers to multi-pass bf16
on the MXU — tighter than XLA's default-precision einsum, and far
tighter than the reference's fastest shipped config (``ssoflex +
i16o32`` feeds the CUDA scan *fp16* inputs, VMamba/README.md:64-72).
The on-chip parity test (test_tpu_parity.py) pins compiled numerics
against the fp32 oracle; interpret-mode tests are exact fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .selective_scan_pallas import _interpret_default, _pad_to


def _pick_block_d(d_total: int) -> int:
    dp = ((d_total + 127) // 128) * 128
    for cand in (512, 384, 256, 128):
        if dp % cand == 0:
            return cand
    return 128


def _pick_chunk(seq_len: int) -> int:
    # Sweep-tuned on chip (tools/sweep_scan_n1.py, BENCH_QUEUE_r5):
    # the batch-packed chain is short (chunk steps of one (8,bd) FMA),
    # so bigger chunks amortize grid overhead without VMEM pressure.
    return 128 if seq_len >= 128 else 32


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------


def _fwd_kernel(
    u_ref, xd_ref, wdt_ref, db_ref, a_ref, d_ref,
    *rest,
    chunk, rank, delta_softplus, reverse, accumulate=False,
):
    if accumulate:
        y_in_ref, y_ref, car_ref, h_ref = rest
    else:
        y_in_ref = None
        y_ref, car_ref, h_ref = rest
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    car_ref[0, 0] = h_ref[:]

    u = u_ref[0, 0].astype(jnp.float32)          # (chunk, 8, bd)
    xd = xd_ref[0, 0]                            # (chunk, 8, C) fp32
    bd = u.shape[-1]

    dtr = xd[:, :, :rank].reshape(chunk * 8, rank)
    dt = jnp.dot(
        dtr, wdt_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + db_ref[0, 0][None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    dt = dt.reshape(chunk, 8, bd)

    bt = xd[:, :, rank]                          # (chunk, 8)
    ct = xd[:, :, rank + 1]

    a = jnp.exp(dt * a_ref[0, 0][None, None, :])
    b = dt * u * bt[:, :, None]

    # Chain loop carries ONLY the FMA (the proven discipline of
    # selective_scan_pallas._scan_states); every per-position op (the
    # C-scale lane-broadcast, the D-skip) is vectorized over the chunk
    # AFTER the stack — the pure-FMA dependent chain pipelines better
    # than one carrying per-t broadcasts.
    h = h_ref[:]
    hs = [None] * chunk
    order = range(chunk - 1, -1, -1) if reverse else range(chunk)
    for t in order:
        h = a[t] * h + b[t]
        hs[t] = h
    h_ref[:] = h

    hs = jnp.stack(hs)                            # (chunk, 8, bd)
    y = ct[:, :, None] * hs + d_ref[0, 0][None, None, :] * u
    if accumulate:
        # Per-source direction merge: this launch's output buffer IS the
        # forward-direction launch's y (input_output_aliases), so the
        # two directions of each source sum here instead of in XLA.
        y_ref[0, 0] = y.astype(y_ref.dtype) + y_in_ref[0, 0]
    else:
        y_ref[0, 0] = y.astype(y_ref.dtype)


def _bwd_kernel(
    u_ref, xd_ref, wdt_ref, db_ref, a_ref, d_ref, car_ref, dy_ref,
    *rest,
    chunk, rank, delta_softplus, reverse, accumulate=False,
):
    if accumulate:
        (du_in_ref, du_ref, dxd_ref, da_ref, dd_ref, ddb_ref,
         ddtw_ref, g_ref) = rest
    else:
        du_in_ref = None
        du_ref, dxd_ref, da_ref, dd_ref, ddb_ref, ddtw_ref, g_ref = rest
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)
        da_ref[0, 0] = jnp.zeros_like(da_ref[0, 0])
        dd_ref[0, 0] = jnp.zeros_like(dd_ref[0, 0])
        ddb_ref[0, 0] = jnp.zeros_like(ddb_ref[0, 0])
        ddtw_ref[0] = jnp.zeros_like(ddtw_ref[0])

    u = u_ref[0, 0].astype(jnp.float32)
    xd = xd_ref[0, 0]
    dy = dy_ref[0, 0].astype(jnp.float32)
    h0 = car_ref[0, 0]
    bd = u.shape[-1]

    dtr = xd[:, :, :rank].reshape(chunk * 8, rank)
    dt_raw = jnp.dot(
        dtr, wdt_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + db_ref[0, 0][None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt_raw)
        sig = jax.nn.sigmoid(dt_raw)
    else:
        dt = dt_raw
        sig = jnp.ones_like(dt_raw)
    dt = dt.reshape(chunk, 8, bd)
    sig = sig.reshape(chunk, 8, bd)

    bt = xd[:, :, rank]
    ct = xd[:, :, rank + 1]
    a_vec = a_ref[0, 0][None, None, :]
    dskip = d_ref[0, 0][None, :]

    # Recompute in-chunk states from the chunk-start carry.
    a = jnp.exp(dt * a_vec)
    b = dt * u * bt[:, :, None]
    order = list(range(chunk - 1, -1, -1) if reverse else range(chunk))
    h = h0
    hs = [None] * chunk       # state AFTER step t
    hprevs = [None] * chunk   # state BEFORE step t
    for t in order:
        hprevs[t] = h
        h = a[t] * h + b[t]
        hs[t] = h
    hs = jnp.stack(hs)
    hprevs = jnp.stack(hprevs)

    # Adjoint suffix chain in reverse scan order; carry from the chunk
    # processed before this one (which is AFTER it in scan order).
    dh = ct[:, :, None] * dy
    p = g_ref[:]
    ps = [None] * chunk
    for t in reversed(order):
        p = dh[t] + p  # p currently holds a[t+1]*P[t+1] (or carry)
        ps[t] = p
        p = a[t] * p
    g_ref[:] = p  # = a[first] * P[first], carry for the previous chunk
    ps = jnp.stack(ps)

    dloga = ps * hprevs * a
    ddt_tot = (dloga * a_vec + ps * u * bt[:, :, None]) * sig
    du = dt * bt[:, :, None] * ps + dy * dskip
    if accumulate:
        # u is shared by both direction launches of a source; the
        # reverse launch's du buffer is aliased in, so du sums here.
        du_ref[0, 0] = du.astype(du_ref.dtype) + du_in_ref[0, 0]
    else:
        du_ref[0, 0] = du.astype(du_ref.dtype)

    ddtr = jnp.dot(
        ddt_tot.reshape(chunk * 8, bd), wdt_ref[0].T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).reshape(chunk, 8, rank)
    dbt = jnp.sum(ps * dt * u, axis=2)            # (chunk, 8)
    dct = jnp.sum(hs * dy, axis=2)
    dxd_ref[0, 0, 0] = jnp.concatenate(
        [ddtr, dbt[:, :, None], dct[:, :, None]], axis=-1
    )

    da_ref[0, 0] += jnp.sum(dloga * dt, axis=(0, 1))
    dd_ref[0, 0] += jnp.sum(dy * u, axis=(0, 1))
    ddb_ref[0, 0] += jnp.sum(ddt_tot, axis=(0, 1))
    ddtw_ref[0] += jnp.dot(
        dtr.T, ddt_tot.reshape(chunk * 8, bd),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


# --------------------------------------------------------------------------
# Core (custom VJP around one two-direction launch)
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _scan_n1_core(
    u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec,
    delta_softplus, chunk, block_d, interpret, reverse,
):
    y, _ = _fwd_call(
        u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec,
        delta_softplus, chunk, block_d, interpret, reverse,
    )
    return y


def _fwd_call(
    u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec,
    delta_softplus, chunk, block_d, interpret, reverse,
    y_init=None,
):
    # Pin operands to default layout (see scan_n1_dirs: XLA:TPU layout
    # assignment otherwise propagates producer-transpose layouts into
    # the Mosaic custom-call buffers, which Mosaic reads/writes in
    # default layout only — observed on-chip under
    # jax_default_matmul_precision='highest' producers).
    (u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec) = (
        jax.lax.optimization_barrier(
            (u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec)
        )
    )
    s, bt, lp, _, dp = u_srt.shape
    rank = wdt_t.shape[1]
    c = xdbl.shape[-1]
    nl, ndb = lp // chunk, dp // block_d
    g = s * bt

    def lmap(i, d, l):
        return (i // bt, i % bt, nl - 1 - l if reverse else l, 0, d)

    def wmap(i, d, l):
        return (i // bt, 0, d)

    in_specs = [
        pl.BlockSpec((1, 1, chunk, 8, block_d), lmap),
        pl.BlockSpec(
            (1, 1, chunk, 8, c),
            lambda i, d, l: (
                i // bt, i % bt, nl - 1 - l if reverse else l, 0, 0
            ),
        ),
        pl.BlockSpec((1, rank, block_d), lambda i, d, l: (i // bt, 0, d)),
        pl.BlockSpec((1, 1, block_d), wmap),
        pl.BlockSpec((1, 1, block_d), wmap),
        pl.BlockSpec((1, 1, block_d), wmap),
    ]
    operands = [u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec]
    aliases = {}
    if y_init is not None:
        in_specs.append(pl.BlockSpec((1, 1, chunk, 8, block_d), lmap))
        operands.append(y_init)
        aliases = {len(operands) - 1: 0}
    y, carries = pl.pallas_call(
        functools.partial(
            _fwd_kernel, chunk=chunk, rank=rank,
            delta_softplus=delta_softplus, reverse=reverse,
            accumulate=y_init is not None,
        ),
        grid=(g, ndb, nl),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, chunk, 8, block_d), lmap),
            pl.BlockSpec(
                (1, 1, 8, block_d), lambda i, d, l: (i, l, 0, d)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, bt, lp, 8, dp), u_srt.dtype),
            jax.ShapeDtypeStruct((g, nl, 8, dp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, block_d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    # Pin results before any consumer can impose a transpose layout.
    y, carries = jax.lax.optimization_barrier((y, carries))
    return y, carries


def _core_fwd(
    u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec,
    delta_softplus, chunk, block_d, interpret, reverse,
):
    y, carries = _fwd_call(
        u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec,
        delta_softplus, chunk, block_d, interpret, reverse,
    )
    return y, (u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec, carries)


def _bwd_call(
    u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec, carries, dy,
    delta_softplus, chunk, block_d, interpret, reverse,
    du_init=None,
):
    # dy arrives through the merge's transpose VJPs; residuals may be
    # re-laid-out in the grad program. Pin everything (see _fwd_call).
    (u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec, carries, dy) = (
        jax.lax.optimization_barrier(
            (u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec, carries, dy)
        )
    )
    s, bt, lp, _, dp = u_srt.shape
    rank = wdt_t.shape[1]
    c = xdbl.shape[-1]
    nl, ndb = lp // chunk, dp // block_d
    g = s * bt

    # Grid walks chunks in REVERSE scan order: scan order is l (fwd dirs)
    # or nl-1-l (reversed dirs), so the bwd source index flips the fwd map.
    def lmap(i, d, l):
        return (i // bt, i % bt, l if reverse else nl - 1 - l, 0, d)

    def wmap(i, d, l):
        return (i // bt, 0, d)

    in_specs = [
        pl.BlockSpec((1, 1, chunk, 8, block_d), lmap),
        pl.BlockSpec(
            (1, 1, chunk, 8, c),
            lambda i, d, l: (
                i // bt, i % bt, l if reverse else nl - 1 - l, 0, 0
            ),
        ),
        pl.BlockSpec((1, rank, block_d), lambda i, d, l: (i // bt, 0, d)),
        pl.BlockSpec((1, 1, block_d), wmap),
        pl.BlockSpec((1, 1, block_d), wmap),
        pl.BlockSpec((1, 1, block_d), wmap),
        # carries are indexed by SCAN-chunk number (fwd wrote them at
        # grid step l = scan chunk l); this grid walks scan chunks
        # in reverse, so the read index is nl-1-l for BOTH direction
        # classes.
        pl.BlockSpec(
            (1, 1, 8, block_d), lambda i, d, l: (i, nl - 1 - l, 0, d)
        ),
        pl.BlockSpec((1, 1, chunk, 8, block_d), lmap),
    ]
    operands = [
        u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec, carries, dy,
    ]
    aliases = {}
    if du_init is not None:
        in_specs.append(pl.BlockSpec((1, 1, chunk, 8, block_d), lmap))
        operands.append(du_init)
        aliases = {len(operands) - 1: 0}
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, chunk=chunk, rank=rank,
            delta_softplus=delta_softplus, reverse=reverse,
            accumulate=du_init is not None,
        ),
        grid=(g, ndb, nl),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, chunk, 8, block_d), lmap),
            pl.BlockSpec(
                (1, 1, 1, chunk, 8, c),
                lambda i, d, l: (
                    i // bt, i % bt, d, l if reverse else nl - 1 - l, 0, 0
                ),
            ),
            pl.BlockSpec((1, 1, block_d), lambda i, d, l: (i, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda i, d, l: (i, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda i, d, l: (i, 0, d)),
            pl.BlockSpec((1, rank, block_d), lambda i, d, l: (i, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, bt, lp, 8, dp), u_srt.dtype),
            jax.ShapeDtypeStruct((s, bt, ndb, lp, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, dp), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, dp), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, dp), jnp.float32),
            jax.ShapeDtypeStruct((g, rank, dp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, block_d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)

    # Same default-layout pinning as the forward merge: du/dxdbl/ddtw
    # cotangents flow into transpose VJPs (of _to_tiles and the
    # weight .transpose), which otherwise propagate their layout back
    # into the Mosaic result buffers (observed on-chip: exactly the
    # transpose-fed cotangents corrupt; reshape-fed ones are exact).
    outs = jax.lax.optimization_barrier(outs)
    du, dxd_p, da_p, dd_p, ddb_p, ddtw_p = outs
    dxdbl = jnp.sum(dxd_p, axis=2)                        # over d-blocks
    # Weights are shared across the batch tiles of each direction: the
    # grid index is s-major (i // bt = s), so per-direction sums are
    # contiguous reshapes, no segment_sum needed.
    da = jnp.sum(da_p.reshape(s, bt, dp), axis=1)[:, None, :]
    dd = jnp.sum(dd_p.reshape(s, bt, dp), axis=1)[:, None, :]
    ddb = jnp.sum(ddb_p.reshape(s, bt, dp), axis=1)[:, None, :]
    ddtw = jnp.sum(ddtw_p.reshape(s, bt, rank, dp), axis=1)
    return (du, dxdbl, ddtw, ddb, da.astype(a_vec.dtype), dd)


def _core_bwd(
    delta_softplus, chunk, block_d, interpret, reverse, res, dy,
):
    u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec, carries = res
    return _bwd_call(
        u_srt, xdbl, wdt_t, dt_bias, a_vec, d_vec, carries, dy,
        delta_softplus, chunk, block_d, interpret, reverse,
    )


_scan_n1_core.defvjp(_core_fwd, _core_bwd)


# --------------------------------------------------------------------------
# Merged two-source core: one aliased output pair for all four directions
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _scan2_core(
    u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec,
    delta_softplus, chunk, block_d, interpret,
):
    y, _, _ = _scan2_fwd_impl(
        u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec,
        delta_softplus, chunk, block_d, interpret,
    )
    return y


def _scan2_fwd_impl(
    u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec,
    delta_softplus, chunk, block_d, interpret,
):
    """Two launches; the reverse pair accumulates onto the forward pair's
    y via input_output_aliases, so y comes back per SOURCE (row, col)."""
    y_f, car_f = _fwd_call(
        u_srt, xd_f, wdt_t[0:2], dt_bias[0:2], a_vec[0:2], d_vec[0:2],
        delta_softplus, chunk, block_d, interpret, False,
    )
    y, car_r = _fwd_call(
        u_srt, xd_r, wdt_t[2:4], dt_bias[2:4], a_vec[2:4], d_vec[2:4],
        delta_softplus, chunk, block_d, interpret, True,
        y_init=y_f,
    )
    return y, car_f, car_r


def _scan2_fwd(
    u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec,
    delta_softplus, chunk, block_d, interpret,
):
    y, car_f, car_r = _scan2_fwd_impl(
        u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec,
        delta_softplus, chunk, block_d, interpret,
    )
    res = (u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec, car_f, car_r)
    return y, res


def _scan2_bwd(delta_softplus, chunk, block_d, interpret, res, dy):
    u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec, car_f, car_r = res
    # y = y_fwd_pair + y_rev_pair, so the SAME dy feeds both backward
    # launches; du accumulates across them through the alias.
    du_r, dxd_r, ddtw_r, ddb_r, da_r, dd_r = _bwd_call(
        u_srt, xd_r, wdt_t[2:4], dt_bias[2:4], a_vec[2:4], d_vec[2:4],
        car_r, dy, delta_softplus, chunk, block_d, interpret, True,
    )
    du, dxd_f, ddtw_f, ddb_f, da_f, dd_f = _bwd_call(
        u_srt, xd_f, wdt_t[0:2], dt_bias[0:2], a_vec[0:2], d_vec[0:2],
        car_f, dy, delta_softplus, chunk, block_d, interpret, False,
        du_init=du_r,
    )
    cat = jnp.concatenate
    return (
        du, dxd_f, dxd_r,
        cat([ddtw_f, ddtw_r], axis=0),
        cat([ddb_f, ddb_r], axis=0),
        cat([da_f, da_r], axis=0),
        cat([dd_f, dd_r], axis=0),
    )


def _scan2_core_fwd(
    u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec,
    delta_softplus, chunk, block_d, interpret,
):
    return _scan2_fwd(
        u_srt, xd_f, xd_r, wdt_t, dt_bias, a_vec, d_vec,
        delta_softplus, chunk, block_d, interpret,
    )


_scan2_core.defvjp(_scan2_core_fwd, _scan2_bwd)


# --------------------------------------------------------------------------
# Public wrapper
# --------------------------------------------------------------------------


def _to_tiles(x, bt):
    """(B, L, D) -> (BT, L, 8, D) with B zero-padded to 8*BT."""
    b, l, d = x.shape
    x = _pad_to(x, 8 * bt, 0) if b < 8 * bt else x
    return x.reshape(bt, 8, l, d).transpose(0, 2, 1, 3)


def _from_tiles(y, b):
    """(BT, L, 8, D) -> (B, L, D)."""
    bt, l, _, d = y.shape
    return y.transpose(0, 2, 1, 3).reshape(bt * 8, l, d)[:b]


def scan_n1_dirs(
    xr: jax.Array,
    xc: jax.Array,
    x_proj_w: jax.Array,
    dt_proj_w: jax.Array,
    dt_bias: jax.Array,
    A: jax.Array,
    D: jax.Array,
    delta_softplus: bool = True,
    chunk: int | None = None,
    block_d: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """K=4-direction selective scan specialized to d_state=1.

    Args (reference parameter order [row, col, row-rev, col-rev], matching
    ``cross_scan``'s direction order — vmamba.py ``CrossScan``):
      xr, xc: (B, L, D) row-major / column-major sources (bf16 ok).
      x_proj_w: (4, R+2, D);  dt_proj_w: (4, D, R);  dt_bias: (4, D);
      A: (4, D, 1) or (4, D);  D: (4, D).
    Returns:
      y: (B, 4, L, D) in source order, direction order [row, col,
      row-rev, col-rev].
    """
    if interpret is None:
        interpret = _interpret_default()
    b, seq_len, d_in = xr.shape
    rank = dt_proj_w.shape[-1]
    if chunk is None:
        chunk = _pick_chunk(seq_len)
    if block_d is None:
        block_d = _pick_block_d(d_in)
    if not interpret:
        block_d = max(block_d, 128)
        chunk = max(chunk, 8)
    bt = -(-b // 8)

    a_vec = A.reshape(4, -1).astype(jnp.float32)          # (4, D)
    d_vec = D.astype(jnp.float32)
    db = dt_bias.astype(jnp.float32)
    wdt_t = dt_proj_w.astype(jnp.float32).transpose(0, 2, 1)  # (4, R, D)

    # x_dbl in XLA (outside the custom VJP, so dWx and the x_proj path
    # of du come from autodiff). Direction sources: k=0 row, k=1 col,
    # k=2 row-rev, k=3 col-rev -> source s = k % 2.
    wx = x_proj_w.astype(jnp.float32)                      # (4, C, D)
    srcs = (xr, xc, xr, xc)
    x_dbl = jnp.stack(
        [
            jnp.einsum(
                "bld,cd->blc", srcs[k].astype(jnp.float32), wx[k],
                preferred_element_type=jnp.float32,
            )
            for k in range(4)
        ],
        axis=1,
    )                                                      # (B, 4, L, C)

    u_p = jnp.stack(
        [_to_tiles(xr, bt), _to_tiles(xc, bt)], axis=0
    )                                                      # (2,BT,L,8,D)
    u_p = _pad_to(_pad_to(u_p, chunk, 2), block_d, 4)

    def xd_tiles(k):
        t = _to_tiles(x_dbl[:, k], bt)                     # (BT, L, 8, C)
        return _pad_to(t, chunk, 1)

    ys = []
    for reverse, lo in ((False, 0), (True, 2)):
        xd = jnp.stack([xd_tiles(k) for k in (lo, lo + 1)], axis=0)
        y = _scan_n1_core(
            u_p, xd,
            _pad_to(wdt_t[lo : lo + 2], block_d, 2),
            _pad_to(db[lo : lo + 2], block_d, 1)[:, None, :],
            _pad_to(a_vec[lo : lo + 2], block_d, 1)[:, None, :],
            _pad_to(d_vec[lo : lo + 2], block_d, 1)[:, None, :],
            delta_softplus, chunk, block_d, interpret, reverse,
        )                                                  # (2,BT,Lp,8,Dp)
        # Result/operand layout pinning lives in _fwd_call/_core_bwd:
        # without it, XLA:TPU propagates the merge transposes' layout
        # into the Mosaic custom-call buffers, which Mosaic reads and
        # writes in default layout only — the merge then reads
        # scrambled data (round-5 on-chip bisect: the launch is
        # bit-exact in isolation and corrupts only with the transpose
        # epilogue in-graph; max abs err 0.64).
        ys.append(y[:, :, :, :, :d_in])
    y_all = jnp.stack(
        [
            _from_tiles(ys[0][0], b), _from_tiles(ys[0][1], b),
            _from_tiles(ys[1][0], b), _from_tiles(ys[1][1], b),
        ],
        axis=1,
    )                                                      # (B, 4, L, D)
    return y_all[:, :, :seq_len]


def scan_n1_sources(
    xr: jax.Array,
    xc: jax.Array,
    x_proj_w: jax.Array,
    dt_proj_w: jax.Array,
    dt_bias: jax.Array,
    A: jax.Array,
    D: jax.Array,
    delta_softplus: bool = True,
    chunk: int | None = None,
    block_d: int | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Four-direction d_state=1 scan with the direction merge in-kernel.

    Same math as ``scan_n1_dirs`` followed by ``y[:,0]+y[:,2]`` /
    ``y[:,1]+y[:,3]``, but the reverse-direction launches accumulate
    onto the forward launches' output buffers (``input_output_aliases``)
    and share one cotangent per source, so the XLA integration around
    the kernel shrinks from four direction tensors to two source
    tensors.  Measured round 5 (tools/scan_bwd_decomp.py, B=128
    vssm1_tiny): the per-direction wrapper paid 26.8 ms of standalone
    tiling/merge VJP glue plus ~36 ms more in-model; this entry point
    exists to remove most of it.

    Returns:
      (y_row, y_col): each (B, L, D); y_col is in column-major order
      (caller transposes back, as with the per-direction wrapper).
    """
    if interpret is None:
        interpret = _interpret_default()
    b, seq_len, d_in = xr.shape
    rank = dt_proj_w.shape[-1]
    if chunk is None:
        chunk = _pick_chunk(seq_len)
    if block_d is None:
        block_d = _pick_block_d(d_in)
    if not interpret:
        block_d = max(block_d, 128)
        chunk = max(chunk, 8)
    bt = -(-b // 8)

    a_vec = A.reshape(4, -1).astype(jnp.float32)
    d_vec = D.astype(jnp.float32)
    db = dt_bias.astype(jnp.float32)
    wdt_t = dt_proj_w.astype(jnp.float32).transpose(0, 2, 1)

    # x_dbl in the source dtype with fp32 accumulation: the fp32 buffer
    # the kernel consumes is (B, L, R+2) — tiny — but casting the SOURCE
    # to fp32 first (the per-direction wrapper's einsum) made the VJP
    # materialize fp32 (B, L, D) pullbacks.  dot_general keeps the bf16
    # operand and still accumulates fp32.
    wx = x_proj_w.astype(xr.dtype)                         # (4, C, D)
    srcs = (xr, xc, xr, xc)
    x_dbl = [
        jax.lax.dot_general(
            srcs[k], wx[k], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for k in range(4)
    ]                                                      # 4 x (B, L, C)

    u_p = jnp.stack([_to_tiles(xr, bt), _to_tiles(xc, bt)], axis=0)
    u_p = _pad_to(_pad_to(u_p, chunk, 2), block_d, 4)

    def xd_pair(k0, k1):
        return jnp.stack(
            [
                _pad_to(_to_tiles(x_dbl[k0], bt), chunk, 1),
                _pad_to(_to_tiles(x_dbl[k1], bt), chunk, 1),
            ],
            axis=0,
        )

    y = _scan2_core(
        u_p, xd_pair(0, 1), xd_pair(2, 3),
        _pad_to(wdt_t, block_d, 2),
        _pad_to(db, block_d, 1)[:, None, :],
        _pad_to(a_vec, block_d, 1)[:, None, :],
        _pad_to(d_vec, block_d, 1)[:, None, :],
        delta_softplus, chunk, block_d, interpret,
    )                                                      # (2,BT,Lp,8,Dp)
    y = y[:, :, :, :, :d_in]
    y_row = _from_tiles(y[0], b)[:, :seq_len]
    y_col = _from_tiles(y[1], b)[:, :seq_len]
    return y_row, y_col
