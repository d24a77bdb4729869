"""Fused multi-direction Mamba layer (the ``mamba_inner_fn`` analog).

The reference fuses conv + projections + selective scan + gating in one
CUDA call (``mamba_simple.py:16-33`` imports ``mamba_inner_fn`` /
``bimamba_inner_fn``). Round-1 ran these stages as separate XLA ops; the
builder's measurement showed the Pallas scan was only ~44% of layer time
— the rest was HBM-materialized glue (direction stacks/flips, a conv
kernel, fp32 ``dt`` of size (B,K,L,d_inner), einsums). This module folds
the glue into the scan kernel (TPU-first design, not a CUDA port):

- **Direction layout via index maps.** Source rows are read directly
  from the (B, S, L, D) source array (S=1 row-major, S=2 adds the
  column-major copy); reversed directions read chunks back-to-front and
  flip rows in VMEM. No flipped/stacked HBM copies.
- **Causal depthwise conv in-kernel.** The d_conv-1 carry rows ride a
  VMEM scratch across the sequential L-chunk grid (fwd); the backward
  reads a one-chunk halo block instead.
- **dt_proj in-kernel.** ``dt = x_dbl[:, :R] @ W_dt`` is a tiny MXU
  matmul per block — the (B,K,L,d_inner) fp32 ``dt`` tensor never exists.
- **x_proj as a pre-kernel.** B/C/dt_r need a full-d_inner reduction of
  the conv output, so a cheap first kernel computes
  ``x_dbl = silu(conv(x)) @ W_x^T`` per direction ((B,K,L,R+2N), ~5% of
  the old ``h`` tensor), recomputing the 4-tap conv in the main kernel.
- **Sequential in-chunk scan** (see selective_scan_pallas.py): a chain
  of ``chunk`` dependent FMAs over (N, block_d) lanes.

Outputs are written back in *source* order (reversed directions
un-flipped in VMEM), so the caller's merge is ``y0 + y1`` plus one
transpose for the column-major pair.

Backward: a reverse-grid kernel recomputes states from saved chunk
carries and emits du (w.r.t. the conv output), u and silu'(pre)
(input-dtype), per-block partials for dB/dC/dt_r, and accumulated
dA/dD/d dt_bias/d W_dt; the closure in XLA is then pure input-dtype
elementwise + transposed-conv shifts + fp32-accumulated reductions —
no recompute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .selective_scan_pallas import (
    _adjoint_states,
    _interpret_default,
    _pad_to,
    _pick_block_d,
    _pick_chunk,
    _scan_states,
)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv_rows(rows, w, b):
    """Causal depthwise conv over rows (chunk + taps-1, bd) -> (chunk, bd).

    rows[0:taps-1] is the carry (previous rows in scan order); w (taps, bd).
    """
    taps = w.shape[0]
    chunk = rows.shape[0] - (taps - 1)
    acc = jnp.zeros((chunk, rows.shape[1]), jnp.float32)
    for j in range(taps):
        acc = acc + w[j][None, :] * rows[j : j + chunk].astype(jnp.float32)
    if b is not None:
        acc = acc + b[None, :]
    return acc


def _flip_rows(x):
    """Reverse rows of a 2D (rows, lanes) block.

    Mosaic TPU has no `rev` lowering; multiplying by the anti-identity
    permutation matrix on the MXU is exact (0/1 coefficients) and tiny
    (rows x rows x lanes).
    """
    rows = x.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    anti = (i + j == rows - 1).astype(x.dtype)
    return jnp.dot(anti, x, preferred_element_type=x.dtype)


def _valid_rows(l, chunk, rev, lp, seq_len):
    """(chunk, 1) 0/1 mask of rows that map to real source positions.

    Padding always sits at the *source* tail, which is the scan tail for
    forward directions and the scan HEAD for reversed ones — where a
    nonzero conv bias would otherwise pollute the initial state.
    """
    idx = l * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    pad = lp - seq_len
    # f32 blend, not a bool-vector select (Mosaic has no i1-vector select).
    fwd_ok = (idx < seq_len).astype(jnp.float32)
    rev_ok = (idx >= pad).astype(jnp.float32)
    return jnp.where(rev, rev_ok, fwd_ok)


# --------------------------------------------------------------------------
# Stage 1: x_dbl = silu(conv(x_dir)) @ Wx^T  per direction
# --------------------------------------------------------------------------


def _xdbl_kernel(
    x_ref, wx_ref, cw_ref, cb_ref,
    xdbl_ref,
    carry_ref,
    *, chunk, taps, k_dirs, use_conv, lp, seq_len,
):
    l = pl.program_id(1)
    k = pl.program_id(0) % k_dirs
    rev = (k % 2) == 1

    x = x_ref[0, 0].astype(jnp.float32)  # (chunk, Dp)
    x = jnp.where(rev, _flip_rows(x), x)

    if use_conv:
        @pl.when(l == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        rows = jnp.concatenate([carry_ref[:], x], axis=0)
        carry_ref[:] = rows[-(taps - 1):]
        h = _silu(_conv_rows(rows, cw_ref[0], cb_ref[0, 0]))
    else:
        h = x
    h = h * _valid_rows(l, chunk, rev, lp, seq_len)
    xdbl_ref[0] = jnp.dot(
        h, wx_ref[0], preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# Stage 2: conv + dt_proj + selective scan + D skip, per (dir, d-block)
# --------------------------------------------------------------------------


def _fused_fwd_kernel(
    x_ref, xdbl_ref, cw_ref, cb_ref, dtw_ref, db_ref, at_ref, d_ref,
    y_ref, car_ref,
    carry_ref, h_ref,
    *, chunk, taps, k_dirs, rank, n, delta_softplus, seq, use_conv,
    lp, seq_len,
):
    l = pl.program_id(2)
    k = pl.program_id(0) % k_dirs
    rev = (k % 2) == 1

    x = x_ref[0, 0].astype(jnp.float32)  # (chunk, bd)
    x = jnp.where(rev, _flip_rows(x), x)

    if use_conv:
        @pl.when(l == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        rows = jnp.concatenate([carry_ref[:], x], axis=0)
        carry_ref[:] = rows[-(taps - 1):]
        u = _silu(_conv_rows(rows, cw_ref[0], cb_ref[0, 0]))
    else:
        u = x
    u = u * _valid_rows(l, chunk, rev, lp, seq_len)

    @pl.when(l == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    car_ref[0, 0] = h_ref[:]

    xdbl = xdbl_ref[0]  # (chunk, R + 2N) fp32
    dt = jnp.dot(
        xdbl[:, :rank], dtw_ref[0], preferred_element_type=jnp.float32
    ) + db_ref[0, 0][None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    bmat = xdbl[:, rank : rank + n]
    cmat = xdbl[:, rank + n : rank + 2 * n]
    a_t = at_ref[0]  # (N, bd)

    a = jnp.exp(dt[:, None, :] * a_t[None, :, :])
    b = (dt * u)[:, None, :] * bmat[:, :, None]
    h = _scan_states(a, b, h_ref[:], chunk, seq)
    h_ref[:] = h[chunk - 1]

    y = jnp.sum(cmat[:, :, None] * h, axis=1) + u * d_ref[0, 0][None, :]
    y = jnp.where(rev, _flip_rows(y), y)  # back to source order
    y_ref[0] = y.astype(y_ref.dtype)


def _fused_bwd_kernel(
    x_ref, xhalo_ref, xdbl_ref, cw_ref, cb_ref, dtw_ref, db_ref, at_ref,
    d_ref, car_ref, dy_ref,
    du_ref, ddtr_ref, dbm_ref, dcm_ref, da_ref, dd_ref, ddb_ref, ddtw_ref,
    u_ref, ds_ref,
    g_ref,
    *, chunk, taps, k_dirs, rank, n, delta_softplus, seq, use_conv,
    lp, seq_len,
):
    l = pl.program_id(2)  # reversed scan order via index maps
    k = pl.program_id(0) % k_dirs
    rev = (k % 2) == 1
    first_chunk = l == pl.num_programs(2) - 1  # scan chunk 0

    x = x_ref[0, 0].astype(jnp.float32)
    x = jnp.where(rev, _flip_rows(x), x)

    if use_conv:
        halo = xhalo_ref[0, 0].astype(jnp.float32)
        halo = jnp.where(rev, _flip_rows(halo), halo)
        halo = jnp.where(first_chunk, jnp.zeros_like(halo), halo)
        rows = jnp.concatenate([halo[-(taps - 1):], x], axis=0)
        pre = _conv_rows(rows, cw_ref[0], cb_ref[0, 0])
        sig = jax.nn.sigmoid(pre)
        u = pre * sig
        dsilu = sig * (1.0 + pre * (1.0 - sig))
    else:
        u = x
        dsilu = jnp.ones_like(x)
    u = u * _valid_rows(pl.num_programs(2) - 1 - l, chunk, rev, lp, seq_len)
    # emitted for the XLA closure (saves the conv/silu recompute there)
    u_ref[0] = u.astype(u_ref.dtype)
    ds_ref[0] = dsilu.astype(ds_ref.dtype)

    xdbl = xdbl_ref[0]
    dtr = xdbl[:, :rank]
    dt_raw = jnp.dot(
        dtr, dtw_ref[0], preferred_element_type=jnp.float32
    ) + db_ref[0, 0][None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt_raw)
        sig = jax.nn.sigmoid(dt_raw)
    else:
        dt = dt_raw
        sig = jnp.ones_like(dt_raw)
    bmat = xdbl[:, rank : rank + n]
    cmat = xdbl[:, rank + n : rank + 2 * n]
    a_t = at_ref[0]
    dy = dy_ref[0].astype(jnp.float32)
    dy = jnp.where(rev, _flip_rows(dy), dy)  # dy arrives in source order
    h0 = car_ref[0, 0]

    a = jnp.exp(dt[:, None, :] * a_t[None, :, :])
    b = (dt * u)[:, None, :] * bmat[:, :, None]
    h = _scan_states(a, b, h0, chunk, seq)
    h_prev = jnp.concatenate([h0[None, :, :], h[: chunk - 1]], axis=0)

    @pl.when(l == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)
        da_ref[0] = jnp.zeros_like(da_ref[0])
        dd_ref[0, 0] = jnp.zeros_like(dd_ref[0, 0])
        ddb_ref[0, 0] = jnp.zeros_like(ddb_ref[0, 0])
        ddtw_ref[0] = jnp.zeros_like(ddtw_ref[0])

    dh = cmat[:, :, None] * dy[:, None, :]
    p = _adjoint_states(a, dh, g_ref[:], chunk, seq)
    g_ref[:] = a[0] * p[0]

    dloga = p * h_prev * a
    gb = jnp.sum(p * bmat[:, :, None], axis=1)  # (chunk, bd)
    ddt_a = jnp.sum(dloga * a_t[None, :, :], axis=1)
    ddt_b = gb * u
    ddt_tot = (ddt_a + ddt_b) * sig
    du = dt * gb + dy * d_ref[0, 0][None, :]  # grad wrt u = silu(conv(x))
    du_ref[0] = du.astype(du_ref.dtype)  # scan order
    ddtr_ref[0, 0] = jnp.dot(
        ddt_tot, dtw_ref[0].T, preferred_element_type=jnp.float32
    )
    dbm_ref[0, 0] = jnp.sum(p * (dt * u)[:, None, :], axis=2)
    dcm_ref[0, 0] = jnp.sum(h * dy[:, None, :], axis=2)
    da_ref[0] += jnp.sum(dloga * dt[:, None, :], axis=0)
    dd_ref[0, 0] += jnp.sum(dy * u, axis=0)
    ddb_ref[0, 0] += jnp.sum(ddt_tot, axis=0)
    ddtw_ref[0] += jnp.dot(
        dtr.T, ddt_tot, preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# Host-side wrappers
# --------------------------------------------------------------------------


def _prep(xs, k_dirs, chunk, block_d):
    """Pad (B, S, L, D) source to chunk/block multiples."""
    xs_p = _pad_to(_pad_to(xs, chunk, 2), block_d, 3)
    return xs_p


def _layout(b, s, k_dirs, nl):
    """Index maps shared by the kernels; grid (B*K, [ndb,] L-chunks)."""

    def src(bk):
        return bk % k_dirs // 2 if s == 2 else 0

    def lmap(bk, l):
        k = bk % k_dirs
        return jnp.where(k % 2 == 1, nl - 1 - l, l)

    return src, lmap


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14)
)
def _mamba_fused_core(
    xs, conv_w, conv_b, wx_t, dtw_t, dt_bias, a_t, d_vec,
    k_dirs, delta_softplus, chunk, block_d, interpret, seq, use_conv,
):
    y, _, _ = _fused_fwd(
        xs, conv_w, conv_b, wx_t, dtw_t, dt_bias, a_t, d_vec,
        k_dirs, delta_softplus, chunk, block_d, interpret, seq, use_conv,
    )
    return y


def _xdbl_call(
    xs_p, wx_t, conv_w, conv_b,
    k_dirs, chunk, taps, interpret, use_conv, seq_len,
):
    b, s, lp, dp = xs_p.shape
    c = wx_t.shape[-1]
    nl = lp // chunk
    src, lmap = _layout(b, s, k_dirs, nl)

    return pl.pallas_call(
        functools.partial(
            _xdbl_kernel, chunk=chunk, taps=taps, k_dirs=k_dirs,
            use_conv=use_conv, lp=lp, seq_len=seq_len,
        ),
        grid=(b * k_dirs, nl),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk, dp),
                lambda bk, l: (bk // k_dirs, src(bk), lmap(bk, l), 0),
            ),
            pl.BlockSpec((1, dp, c), lambda bk, l: (bk % k_dirs, 0, 0)),
            pl.BlockSpec((1, taps, dp), lambda bk, l: (bk % k_dirs, 0, 0)),
            pl.BlockSpec((1, 1, dp), lambda bk, l: (bk % k_dirs, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, c), lambda bk, l: (bk, l, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b * k_dirs, lp, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((taps - 1, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs_p, wx_t, conv_w, conv_b)


def _fused_fwd(
    xs, conv_w, conv_b, wx_t, dtw_t, dt_bias, a_t, d_vec,
    k_dirs, delta_softplus, chunk, block_d, interpret, seq, use_conv,
):
    b, s, seq_len, d_in = xs.shape
    n = a_t.shape[1]
    rank = dtw_t.shape[1]
    taps = conv_w.shape[1]
    out_dtype = xs.dtype

    xs_p = _prep(xs, k_dirs, chunk, block_d)
    _, _, lp, dp = xs_p.shape
    nl, ndb = lp // chunk, dp // block_d
    cw_p = _pad_to(conv_w, block_d, 2)
    cb_p = _pad_to(conv_b, block_d, 2)
    wx_p = _pad_to(wx_t, block_d, 1)
    dtw_p = _pad_to(dtw_t, block_d, 2)
    db_p = _pad_to(dt_bias, block_d, 2)
    at_p = _pad_to(a_t, block_d, 2)
    dv_p = _pad_to(d_vec, block_d, 2)

    xdbl = _xdbl_call(
        xs_p, wx_p, cw_p, cb_p, k_dirs, chunk, taps, interpret, use_conv,
        seq_len,
    )

    src, lmap = _layout(b, s, k_dirs, nl)
    c = wx_t.shape[-1]

    y, carries = pl.pallas_call(
        functools.partial(
            _fused_fwd_kernel, chunk=chunk, taps=taps, k_dirs=k_dirs,
            rank=rank, n=n, delta_softplus=delta_softplus, seq=seq,
            use_conv=use_conv, lp=lp, seq_len=seq_len,
        ),
        grid=(b * k_dirs, ndb, nl),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk, block_d),
                lambda bk, d, l: (bk // k_dirs, src(bk), lmap(bk, l), d),
            ),
            pl.BlockSpec((1, chunk, c), lambda bk, d, l: (bk, l, 0)),
            pl.BlockSpec((1, taps, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, rank, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, n, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, chunk, block_d), lambda bk, d, l: (bk, lmap(bk, l), d)
            ),
            pl.BlockSpec(
                (1, 1, n, block_d), lambda bk, d, l: (bk, l, 0, d)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * k_dirs, lp, dp), out_dtype),
            jax.ShapeDtypeStruct((b * k_dirs, nl, n, dp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((taps - 1, block_d), jnp.float32),
            pltpu.VMEM((n, block_d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs_p, xdbl, cw_p, cb_p, dtw_p, db_p, at_p, dv_p)
    y = y[:, :seq_len, :d_in].reshape(b, k_dirs, seq_len, d_in)
    return y, xdbl, carries


def _core_fwd(
    xs, conv_w, conv_b, wx_t, dtw_t, dt_bias, a_t, d_vec,
    k_dirs, delta_softplus, chunk, block_d, interpret, seq, use_conv,
):
    y, xdbl, carries = _fused_fwd(
        xs, conv_w, conv_b, wx_t, dtw_t, dt_bias, a_t, d_vec,
        k_dirs, delta_softplus, chunk, block_d, interpret, seq, use_conv,
    )
    res = (xs, conv_w, conv_b, wx_t, dtw_t, dt_bias, a_t, d_vec, xdbl,
           carries)
    return y, res


def _core_bwd(
    k_dirs, delta_softplus, chunk, block_d, interpret, seq, use_conv,
    res, dy,
):
    (xs, conv_w, conv_b, wx_t, dtw_t, dt_bias, a_t, d_vec, xdbl,
     carries) = res
    b, s, seq_len, d_in = xs.shape
    n = a_t.shape[1]
    rank = dtw_t.shape[1]
    taps = conv_w.shape[1]
    c = wx_t.shape[-1]

    xs_p = _prep(xs, k_dirs, chunk, block_d)
    _, _, lp, dp = xs_p.shape
    nl, ndb = lp // chunk, dp // block_d
    cw_p = _pad_to(conv_w, block_d, 2)
    cb_p = _pad_to(conv_b, block_d, 2)
    dtw_p = _pad_to(dtw_t, block_d, 2)
    db_p = _pad_to(dt_bias, block_d, 2)
    at_p = _pad_to(a_t, block_d, 2)
    dv_p = _pad_to(d_vec, block_d, 2)
    dy_p = _pad_to(
        _pad_to(dy.reshape(b * k_dirs, seq_len, d_in), chunk, 1),
        block_d, 2,
    )

    src, lmap = _layout(b, s, k_dirs, nl)

    def rlmap(bk, d, l):
        # reverse scan order; lmap then maps scan order -> source chunk
        return lmap(bk, nl - 1 - l)

    outs = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, chunk=chunk, taps=taps, k_dirs=k_dirs,
            rank=rank, n=n, delta_softplus=delta_softplus, seq=seq,
            use_conv=use_conv, lp=lp, seq_len=seq_len,
        ),
        grid=(b * k_dirs, ndb, nl),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk, block_d),
                lambda bk, d, l: (bk // k_dirs, src(bk), rlmap(bk, d, l), d),
            ),
            # halo: previous chunk in *scan* order
            pl.BlockSpec(
                (1, 1, chunk, block_d),
                lambda bk, d, l: (
                    bk // k_dirs, src(bk),
                    lmap(bk, jnp.maximum(nl - 1 - l - 1, 0)), d,
                ),
            ),
            pl.BlockSpec(
                (1, chunk, c), lambda bk, d, l: (bk, nl - 1 - l, 0)
            ),
            pl.BlockSpec((1, taps, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, rank, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, n, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda bk, d, l: (bk % k_dirs, 0, d)),
            pl.BlockSpec(
                (1, 1, n, block_d), lambda bk, d, l: (bk, nl - 1 - l, 0, d)
            ),
            pl.BlockSpec(
                (1, chunk, block_d), lambda bk, d, l: (bk, rlmap(bk, d, l), d)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, chunk, block_d), lambda bk, d, l: (bk, nl - 1 - l, d)
            ),
            pl.BlockSpec(
                (1, 1, chunk, rank), lambda bk, d, l: (bk, d, nl - 1 - l, 0)
            ),
            pl.BlockSpec(
                (1, 1, chunk, n), lambda bk, d, l: (bk, d, nl - 1 - l, 0)
            ),
            pl.BlockSpec(
                (1, 1, chunk, n), lambda bk, d, l: (bk, d, nl - 1 - l, 0)
            ),
            pl.BlockSpec((1, n, block_d), lambda bk, d, l: (bk, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda bk, d, l: (bk, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda bk, d, l: (bk, 0, d)),
            pl.BlockSpec(
                (1, rank, block_d), lambda bk, d, l: (bk, 0, d)
            ),
            pl.BlockSpec(
                (1, chunk, block_d), lambda bk, d, l: (bk, nl - 1 - l, d)
            ),
            pl.BlockSpec(
                (1, chunk, block_d), lambda bk, d, l: (bk, nl - 1 - l, d)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * k_dirs, lp, dp), xs.dtype),
            jax.ShapeDtypeStruct((b * k_dirs, ndb, lp, rank), jnp.float32),
            jax.ShapeDtypeStruct((b * k_dirs, ndb, lp, n), jnp.float32),
            jax.ShapeDtypeStruct((b * k_dirs, ndb, lp, n), jnp.float32),
            jax.ShapeDtypeStruct((b * k_dirs, n, dp), jnp.float32),
            jax.ShapeDtypeStruct((b * k_dirs, 1, dp), jnp.float32),
            jax.ShapeDtypeStruct((b * k_dirs, 1, dp), jnp.float32),
            jax.ShapeDtypeStruct((b * k_dirs, rank, dp), jnp.float32),
            jax.ShapeDtypeStruct((b * k_dirs, lp, dp), xs.dtype),
            jax.ShapeDtypeStruct((b * k_dirs, lp, dp), xs.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs_p, xs_p, xdbl, cw_p, cb_p, dtw_p, db_p, at_p, dv_p, carries, dy_p)

    (du_p, ddtr_p, dbm_p, dcm_p, da_p, dd_p, ddb_p, ddtw_p,
     u_p, ds_p) = outs

    # Close the conv/x_proj graph in XLA, on *padded* lengths and in
    # SCAN order throughout (pads at the head of reversed directions
    # line up with the kernel's row indexing; pad rows carry zero
    # gradients by the kernel's validity masking). The kernel emits
    # u = silu(conv(x)) and silu'(pre) so nothing is recomputed here.
    cdt = xs.dtype
    du_scan = du_p[:, :, :d_in]
    dx_dbl = jnp.concatenate(
        [
            jnp.sum(ddtr_p, axis=1),
            jnp.sum(dbm_p, axis=1),
            jnp.sum(dcm_p, axis=1),
        ],
        axis=-1,
    )  # (B*K, Lp, C) scan order, fp32

    k_of = jnp.arange(b * k_dirs) % k_dirs
    rev = (k_of % 2 == 1)[:, None, None]

    def scan_seq(arr):  # (B*K, Lp, D) source order <-> scan order
        return jnp.where(rev, jnp.flip(arr, axis=1), arr)

    # du_total = scan-path grad + x_proj-path grad, both w.r.t. u.
    du_total = du_scan + jnp.einsum(
        "blc,bdc->bld", dx_dbl.astype(cdt), wx_t[k_of].astype(cdt),
        preferred_element_type=jnp.float32,
    ).astype(cdt)

    u_scan = u_p[:, :, :d_in]
    if use_conv:
        dpre = du_total * ds_p[:, :, :d_in]
        # transposed causal conv: dx[s] = sum_j w[j] dpre[s + taps-1-j]
        w_rows = conv_w[k_of].astype(cdt)  # (B*K, taps, D)
        dpre_pad = jnp.pad(dpre, ((0, 0), (0, taps - 1), (0, 0)))
        dx_scan = sum(
            w_rows[:, j][:, None, :]
            * dpre_pad[:, taps - 1 - j : taps - 1 - j + lp]
            for j in range(taps)
        )
        # x in scan order, only needed for the conv weight grad
        xs_u = xs_p[:, :, :, :d_in].astype(cdt)
        if s == 2:
            x_src = jnp.where(
                (k_of // 2 == 1)[:, None, None],
                jnp.repeat(xs_u[:, 1], k_dirs, axis=0),
                jnp.repeat(xs_u[:, 0], k_dirs, axis=0),
            )
        else:
            x_src = jnp.repeat(xs_u[:, 0], k_dirs, axis=0)
        x_scan = scan_seq(x_src)
        x_pad = jnp.pad(x_scan, ((0, 0), (taps - 1, 0), (0, 0)))
        dw_rows = jnp.stack(
            [
                jnp.einsum(
                    "bld,bld->bd", dpre, x_pad[:, j : j + lp],
                    preferred_element_type=jnp.float32,
                )
                for j in range(taps)
            ],
            axis=1,
        )  # (B*K, taps, D)
        dconv_w = jax.ops.segment_sum(dw_rows, k_of, num_segments=k_dirs)
        dconv_b = jax.ops.segment_sum(
            jnp.sum(dpre.astype(jnp.float32), axis=1), k_of,
            num_segments=k_dirs,
        )[:, None, :]
    else:
        dx_scan = du_total
        dconv_w = jnp.zeros_like(conv_w)
        dconv_b = jnp.zeros_like(conv_b)

    # x_proj weight grad: dWx_t[k] = sum_{b,l} u[b,l,:]^T dx_dbl[b,l,:].
    dwx_t = jax.ops.segment_sum(
        jnp.einsum(
            "bld,blc->bdc", u_scan, dx_dbl.astype(cdt),
            preferred_element_type=jnp.float32,
        ),
        k_of, num_segments=k_dirs,
    )

    # Fold direction grads back onto the (B, S, L, D) source.
    dx_src = scan_seq(dx_scan).reshape(b, k_dirs, lp, d_in)[:, :, :seq_len]
    if s == 2:
        dxs = jnp.stack(
            [dx_src[:, 0] + dx_src[:, 1], dx_src[:, 2] + dx_src[:, 3]],
            axis=1,
        )
    else:
        dxs = jnp.sum(dx_src, axis=1, keepdims=True)

    da = jax.ops.segment_sum(
        da_p[:, :, :d_in], k_of, num_segments=k_dirs
    )  # (K, N, D), matching a_t
    dd = jax.ops.segment_sum(dd_p[:, 0, :d_in], k_of, num_segments=k_dirs)
    ddb = jax.ops.segment_sum(ddb_p[:, 0, :d_in], k_of, num_segments=k_dirs)
    ddtw = jax.ops.segment_sum(
        ddtw_p[:, :, :d_in], k_of, num_segments=k_dirs
    )  # (K, R, D), matching dtw_t

    return (
        dxs.astype(xs.dtype),
        dconv_w.astype(conv_w.dtype),
        dconv_b.astype(conv_b.dtype),
        dwx_t.astype(wx_t.dtype),
        ddtw.astype(dtw_t.dtype),
        ddb.astype(dt_bias.dtype)[:, None, :],
        da.astype(a_t.dtype),
        dd.astype(d_vec.dtype)[:, None, :],
    )


_mamba_fused_core.defvjp(_core_fwd, _core_bwd)


def mamba_fused_dirs(
    xr: jax.Array,
    xc: jax.Array | None,
    conv_w: jax.Array | None,
    conv_b: jax.Array | None,
    x_proj_w: jax.Array,
    dt_proj_w: jax.Array,
    dt_bias: jax.Array,
    A: jax.Array,
    D: jax.Array,
    delta_softplus: bool = True,
    chunk: int | None = None,
    block_d: int | None = None,
    interpret: bool | None = None,
    use_conv: bool = True,
    seq: bool = True,
) -> jax.Array:
    """Fused multi-direction Mamba inner function.

    Args:
      xr: (B, L, D) row-major scan source (post in_proj x half).
      xc: (B, L, D) column-major source, or None (then K = conv_w.shape[0]
          must be 1 or 2).
      conv_w: (K, taps, D); conv_b: (K, D) or None.
      x_proj_w: (K, R+2N, D); dt_proj_w: (K, D, R); dt_bias: (K, D).
      A: (K, D, N) (negative reals); D: (K, D).
    Returns:
      y_dirs (B, K, L, D) in **source** order for every direction
      (reversed scans already un-flipped): merge row-major pairs with a
      plain sum, column-major pairs after the inverse transpose.
    """
    if interpret is None:
        interpret = _interpret_default()
    k_dirs = x_proj_w.shape[0]
    d_in = xr.shape[-1]
    if conv_w is None:
        use_conv = False
        conv_w = jnp.zeros((k_dirs, 4, d_in), jnp.float32)
    if chunk is None:
        # The fused layer prefers a bigger chunk than the standalone
        # scan: the r5 sweep (tools/sweep_fused_layer.py, BENCH_QUEUE_r5/
        # sweep_fused_layer.log) has c=128 at 70.8 ms vs 74.4 fwd+bwd on
        # the L=3136 stage and tied-or-better at L=784; short sequences
        # keep the standalone heuristic (c=32).
        seq_len = xr.shape[1]
        chunk = 128 if seq_len >= 512 else _pick_chunk(seq_len)
    if block_d is None:
        block_d = _pick_block_d(d_in)
    if not interpret:
        block_d = max(block_d, 128)
        chunk = max(chunk, 8)

    xs = (
        jnp.stack([xr, xc], axis=1)
        if xc is not None
        else xr[:, None]
    )
    if conv_b is None:
        conv_b_in = jnp.zeros((k_dirs, 1, conv_w.shape[2]), jnp.float32)
    else:
        conv_b_in = conv_b.astype(jnp.float32)[:, None, :]
    a_t = A.astype(jnp.float32).transpose(0, 2, 1)  # (K, N, D)
    wx_t = x_proj_w.astype(jnp.float32).transpose(0, 2, 1)  # (K, D, C)
    dtw_t = dt_proj_w.astype(jnp.float32).transpose(0, 2, 1)  # (K, R, D)
    db = dt_bias.astype(jnp.float32)[:, None, :]
    dv = D.astype(jnp.float32)[:, None, :]

    return _mamba_fused_core(
        xs, conv_w.astype(jnp.float32), conv_b_in, wx_t, dtw_t, db, a_t,
        dv,
        k_dirs, delta_softplus, chunk, block_d, interpret, seq, use_conv,
    )
