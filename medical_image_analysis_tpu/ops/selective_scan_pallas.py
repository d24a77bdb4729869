"""Pallas TPU kernel for the selective scan (Mamba S6) with custom VJP.

Design (TPU-first, not a CUDA translation):

- Grid ``(batch, D-blocks, L-chunks)`` with the L-chunk axis innermost.
  TPU grids execute sequentially per core, so a VMEM scratch buffer
  carries the recurrent state ``h`` across chunks — the expanded
  ``(L, N, D)`` state never touches HBM (the CUDA kernels at
  ``/root/reference/.../csrc/selective_scan/cusoflex/selective_scan_fwd_kernel_oflex.cuh``
  use cub block scans per thread-block instead; the chunked math spec is
  ``test_selective_scan_easy.py:14-98``).
- Within a chunk, the first-order linear recurrence
  ``h[t] = a[t]*h[t-1] + b[t]`` runs as an unrolled *sequential* loop of
  FMAs over the chunk axis, vectorized over ``(N, block_d)`` lanes: the
  VPU is one wide SIMD unit, so cross-row parallelism already comes from
  the (N, block_d) lanes and the dependent chain of ``chunk`` FMAs beats
  log2(chunk) full-tensor Hillis–Steele rounds (measured 3.9 ms vs
  6.8 ms on ARM-B layer shapes; the HS variant is kept for comparison
  via ``scan_impl='hs'``).
- Layout inside the kernel is ``(chunk, N, block_d)`` so the lane
  dimension is the channel block (128) and state dim N sits on sublanes.
- The backward pass is a second Pallas kernel running the chunk grid in
  *reverse* (via index maps), recomputing per-chunk states from saved
  chunk-boundary carries (O(L/C * N * D) extra HBM, ~N/C of the input)
  and running the adjoint suffix scan — mirroring the reverse block scan
  of the reference backward kernel (``selective_scan_bwd_kernel_oflex.cuh``).

Numerics: fp32 recurrence regardless of input dtype, matching the
reference's forced-fp32 path (``vmamba.py:394-404``).

Grouped B/C (VMamba's K=4 directions) are handled by folding the group
axis into the batch and indexing per-group parameter rows with
``batch % n_param_groups`` in the index maps — one kernel launch for all
four directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _log2(x: int) -> int:
    n = 0
    while (1 << n) < x:
        n += 1
    assert (1 << n) == x, f"{x} not a power of two"
    return n


def _prefix_scan(a, b, chunk):
    """Inclusive Hillis-Steele prefix scan of h[t]=a[t]h[t-1]+b[t] over axis 0.

    Returns (cum_a, h) where cum_a[t] = prod(a[0..t]) and h[t] is the
    in-chunk state with zero initial state.
    """
    n, bd = a.shape[1], a.shape[2]
    for j in range(_log2(chunk)):
        k = 1 << j
        ones = jnp.ones((k, n, bd), jnp.float32)
        zeros = jnp.zeros((k, n, bd), jnp.float32)
        a_sh = jnp.concatenate([ones, a[: chunk - k]], axis=0)
        b_sh = jnp.concatenate([zeros, b[: chunk - k]], axis=0)
        b = b + a * b_sh
        a = a * a_sh
    return a, b


def _suffix_scan(a_hat, b, chunk):
    """Suffix scan P[t] = b[t] + a_hat[t] * P[t+1] over axis 0 (P[chunk]=0)."""
    n, bd = a_hat.shape[1], a_hat.shape[2]
    for j in range(_log2(chunk)):
        k = 1 << j
        zeros = jnp.zeros((k, n, bd), jnp.float32)
        a_sh = jnp.concatenate([a_hat[k:], zeros], axis=0)
        b_sh = jnp.concatenate([b[k:], zeros], axis=0)
        b = b + a_hat * b_sh
        a_hat = a_hat * a_sh
    return b


def _scan_states(a, b, h0, chunk, seq):
    """All-states h[0..chunk-1] of h[t]=a[t]h[t-1]+b[t] given h0.

    seq: unrolled dependent-FMA chain (fastest on the VPU); otherwise a
    log-depth Hillis–Steele scan (kept for comparison/fallback).
    Returns (chunk, N, bd) fp32.
    """
    if seq:
        h = h0
        hs = []
        for t in range(chunk):
            h = a[t] * h + b[t]
            hs.append(h)
        return jnp.stack(hs)
    cum_a, h_in = _prefix_scan(a, b, chunk)
    return h_in + cum_a * h0[None, :, :]


def _fwd_kernel(
    u_ref, dt_ref, at_ref, b_ref, c_ref, d_ref, db_ref,
    y_ref, car_ref,
    h_ref,
    *, chunk, delta_softplus, seq,
):
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    # Save the chunk-*start* state for the backward pass.
    car_ref[0, 0] = h_ref[:]

    u = u_ref[0].astype(jnp.float32)          # (chunk, bd)
    dt = dt_ref[0].astype(jnp.float32) + db_ref[0, 0][None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    a_t = at_ref[0]                            # (N, bd) fp32
    bmat = b_ref[0].astype(jnp.float32)        # (chunk, N)
    cmat = c_ref[0].astype(jnp.float32)        # (chunk, N)

    a = jnp.exp(dt[:, None, :] * a_t[None, :, :])          # (chunk, N, bd)
    b = (dt * u)[:, None, :] * bmat[:, :, None]            # (chunk, N, bd)
    h = _scan_states(a, b, h_ref[:], chunk, seq)
    h_ref[:] = h[chunk - 1]

    y = jnp.sum(cmat[:, :, None] * h, axis=1)              # (chunk, bd)
    y = y + u * d_ref[0, 0][None, :]
    y_ref[0] = y.astype(y_ref.dtype)


def _adjoint_states(a, dh, g_carry, chunk, seq):
    """Suffix recurrence P[t] = dh[t] + a[t+1] P[t+1]; P from the next
    chunk enters through ``g_carry`` at the last row. Returns all P."""
    if seq:
        p = dh[chunk - 1] + g_carry
        ps = [p]
        for t in range(chunk - 2, -1, -1):
            p = dh[t] + a[t + 1] * p
            ps.append(p)
        ps.reverse()
        return jnp.stack(ps)
    carry_inject = jnp.concatenate(
        [jnp.zeros((chunk - 1, *g_carry.shape), jnp.float32),
         g_carry[None]],
        axis=0,
    )
    dh = dh + carry_inject
    a_hat = jnp.concatenate(
        [a[1:], jnp.zeros((1, *g_carry.shape), jnp.float32)], axis=0
    )
    return _suffix_scan(a_hat, dh, chunk)


def _bwd_kernel(
    u_ref, dt_ref, at_ref, b_ref, c_ref, d_ref, db_ref, car_ref, dy_ref,
    du_ref, ddt_ref, da_ref, dbm_ref, dcm_ref, dd_ref, ddb_ref,
    g_ref,
    *, chunk, delta_softplus, seq,
):
    l = pl.program_id(2)
    nl = pl.num_programs(2)

    @pl.when(l == 0)  # first processed == last chunk (reversed index maps)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    @pl.when(l == 0)
    def _():
        da_ref[0] = jnp.zeros_like(da_ref[0])
        dd_ref[0, 0] = jnp.zeros_like(dd_ref[0, 0])
        ddb_ref[0, 0] = jnp.zeros_like(ddb_ref[0, 0])

    u = u_ref[0].astype(jnp.float32)
    dt_raw = dt_ref[0].astype(jnp.float32) + db_ref[0, 0][None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt_raw)
        sig = jax.nn.sigmoid(dt_raw)
    else:
        dt = dt_raw
        sig = jnp.ones_like(dt_raw)
    a_t = at_ref[0]
    bmat = b_ref[0].astype(jnp.float32)
    cmat = c_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    h0 = car_ref[0, 0]                                     # (N, bd)

    # Recompute forward states for this chunk.
    a = jnp.exp(dt[:, None, :] * a_t[None, :, :])
    b = (dt * u)[:, None, :] * bmat[:, :, None]
    h = _scan_states(a, b, h0, chunk, seq)
    h_prev = jnp.concatenate([h0[None, :, :], h[: chunk - 1]], axis=0)

    # Adjoint: P[t] = dL/dh[t] = C[t]*dy[t] + a[t+1]*P[t+1] (+ carry).
    dh = cmat[:, :, None] * dy[:, None, :]
    p = _adjoint_states(a, dh, g_ref[:], chunk, seq)
    g_ref[:] = a[0] * p[0]

    # Gradients.
    dloga = p * h_prev * a                                  # d wrt (dt*A)
    gb = jnp.sum(p * bmat[:, :, None], axis=1)              # (chunk, bd)
    ddt_a = jnp.sum(dloga * a_t[None, :, :], axis=1)
    ddt_b = gb * u
    ddt_tot = (ddt_a + ddt_b) * sig
    du = dt * gb + dy * d_ref[0, 0][None, :]

    du_ref[0] = du.astype(du_ref.dtype)
    ddt_ref[0] = ddt_tot.astype(ddt_ref.dtype)
    dbm_ref[0, 0] = jnp.sum(p * (dt * u)[:, None, :], axis=2).astype(dbm_ref.dtype)
    dcm_ref[0, 0] = jnp.sum(h * dy[:, None, :], axis=2).astype(dcm_ref.dtype)
    da_ref[0] += jnp.sum(dloga * dt[:, None, :], axis=0)
    dd_ref[0, 0] += jnp.sum(dy * u, axis=0)
    ddb_ref[0, 0] += jnp.sum(ddt_tot, axis=0)


def _pad_to(x, mult, axis):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_chunk(seq_len: int) -> int:
    """chunk=64 for long sequences, 32 otherwise.

    Sweep-tuned on v5e (tools/sweep_scan.py, round 3): at the VSSM
    stage shapes chunk=64 beats the round-2 choice of 128 on BOTH
    directions — stage-1 (L=3136, D=192) fwd 17.3 ms vs 19.6, bwd
    56.3 ms vs 60.9; stage-2/3 fwd win 3-7%, bwd ties. Short/mid
    sequences keep 32: the backward's ~6 live (chunk, N, bd) VMEM
    stacks degrade faster than the forward gains — ARM-B (L=257)
    fwd is 3.26 ms @ c32 vs 3.55 @ c64, and model fwd+bwd follows.
    """
    return 64 if seq_len >= 512 else 32


def _pick_block_d(d_total: int) -> int:
    """Largest lane-aligned block that divides the 128-padded channel
    count (sweep-tuned: bigger blocks amortize per-grid-point overhead)."""
    dp = ((d_total + 127) // 128) * 128
    for cand in (768, 512, 384, 256, 128):
        if dp % cand == 0:
            return cand
    return 128


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11)
)
def _selective_scan_core(
    u, delta, a_t, bmat, cmat, d_vec, delta_bias,
    delta_softplus, chunk, block_d, interpret, seq,
):
    y, _ = _fwd_call(
        u, delta, a_t, bmat, cmat, d_vec, delta_bias,
        delta_softplus, chunk, block_d, interpret, seq,
    )
    return y


def _specs(n_groups):
    """Index maps shared by fwd/bwd, keyed by array kind; args (b, d, l)."""
    return {
        "seq": lambda b, d, l: (b, l, d),           # (batch, L, D) -> (1, chunk, bd)
        "param": lambda b, d, l: (b % n_groups, 0, d),  # (G, N, D) -> (1, N, bd)
        "vec": lambda b, d, l: (b % n_groups, 0, d),  # (G, 1, D) -> (1, 1, bd)
        "bc": lambda b, d, l: (b, l, 0),            # (batch, L, N) -> (1, chunk, N)
        "car": lambda b, d, l: (b, l, 0, d),        # (batch, nl, N, D)
    }


def _fwd_call(
    u, delta, a_t, bmat, cmat, d_vec, delta_bias,
    delta_softplus, chunk, block_d, interpret, seq,
):
    batch, seq_len, d_total = u.shape
    n = a_t.shape[1]
    n_groups = a_t.shape[0]
    out_dtype = u.dtype

    u_p = _pad_to(_pad_to(u, chunk, 1), block_d, 2)
    dt_p = _pad_to(_pad_to(delta, chunk, 1), block_d, 2)
    at_p = _pad_to(a_t, block_d, 2)
    b_p = _pad_to(bmat, chunk, 1)
    c_p = _pad_to(cmat, chunk, 1)
    dv_p = _pad_to(d_vec, block_d, 2)
    db_p = _pad_to(delta_bias, block_d, 2)

    lp, dp = u_p.shape[1], u_p.shape[2]
    nl, ndb = lp // chunk, dp // block_d
    im = _specs(n_groups)

    y, carries = pl.pallas_call(
        functools.partial(
            _fwd_kernel, chunk=chunk, delta_softplus=delta_softplus,
            seq=seq,
        ),
        grid=(batch, ndb, nl),
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), im["seq"]),
            pl.BlockSpec((1, chunk, block_d), im["seq"]),
            pl.BlockSpec((1, n, block_d), im["param"]),
            pl.BlockSpec((1, chunk, n), im["bc"]),
            pl.BlockSpec((1, chunk, n), im["bc"]),
            pl.BlockSpec((1, 1, block_d), im["vec"]),
            pl.BlockSpec((1, 1, block_d), im["vec"]),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, block_d), im["seq"]),
            pl.BlockSpec((1, 1, n, block_d), im["car"]),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, lp, dp), out_dtype),
            jax.ShapeDtypeStruct((batch, nl, n, dp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u_p, dt_p, at_p, b_p, c_p, dv_p, db_p)
    return y[:, :seq_len, :d_total], carries


def _core_fwd(
    u, delta, a_t, bmat, cmat, d_vec, delta_bias,
    delta_softplus, chunk, block_d, interpret, seq,
):
    y, carries = _fwd_call(
        u, delta, a_t, bmat, cmat, d_vec, delta_bias,
        delta_softplus, chunk, block_d, interpret, seq,
    )
    return y, (u, delta, a_t, bmat, cmat, d_vec, delta_bias, carries)


def _core_bwd(delta_softplus, chunk, block_d, interpret, seq, res, dy):
    u, delta, a_t, bmat, cmat, d_vec, delta_bias, carries = res
    batch, seq_len, d_total = u.shape
    n = a_t.shape[1]
    n_groups = a_t.shape[0]

    u_p = _pad_to(_pad_to(u, chunk, 1), block_d, 2)
    dt_p = _pad_to(_pad_to(delta, chunk, 1), block_d, 2)
    at_p = _pad_to(a_t, block_d, 2)
    b_p = _pad_to(bmat, chunk, 1)
    c_p = _pad_to(cmat, chunk, 1)
    dv_p = _pad_to(d_vec, block_d, 2)
    db_p = _pad_to(delta_bias, block_d, 2)
    dy_p = _pad_to(_pad_to(dy, chunk, 1), block_d, 2)

    lp, dp = u_p.shape[1], u_p.shape[2]
    nl, ndb = lp // chunk, dp // block_d

    # Reverse the chunk axis through index maps; everything else forward.
    def rev_seq(b, d, l):
        return (b, nl - 1 - l, d)

    def rev_bc(b, d, l):
        return (b, nl - 1 - l, 0)

    def rev_car(b, d, l):
        return (b, nl - 1 - l, 0, d)

    def rev_bc_part(b, d, l):
        return (b, d, nl - 1 - l, 0)

    im = _specs(n_groups)

    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, chunk=chunk, delta_softplus=delta_softplus,
            seq=seq,
        ),
        grid=(batch, ndb, nl),
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), rev_seq),
            pl.BlockSpec((1, chunk, block_d), rev_seq),
            pl.BlockSpec((1, n, block_d), im["param"]),
            pl.BlockSpec((1, chunk, n), rev_bc),
            pl.BlockSpec((1, chunk, n), rev_bc),
            pl.BlockSpec((1, 1, block_d), im["vec"]),
            pl.BlockSpec((1, 1, block_d), im["vec"]),
            pl.BlockSpec((1, 1, n, block_d), rev_car),
            pl.BlockSpec((1, chunk, block_d), rev_seq),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, block_d), rev_seq),
            pl.BlockSpec((1, chunk, block_d), rev_seq),
            pl.BlockSpec((1, n, block_d), lambda b, d, l: (b, 0, d)),
            pl.BlockSpec((1, 1, chunk, n), rev_bc_part),
            pl.BlockSpec((1, 1, chunk, n), rev_bc_part),
            pl.BlockSpec((1, 1, block_d), lambda b, d, l: (b, 0, d)),
            pl.BlockSpec((1, 1, block_d), lambda b, d, l: (b, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, lp, dp), u.dtype),
            jax.ShapeDtypeStruct((batch, lp, dp), delta.dtype),
            jax.ShapeDtypeStruct((batch, n, dp), jnp.float32),
            jax.ShapeDtypeStruct((batch, ndb, lp, n), jnp.float32),
            jax.ShapeDtypeStruct((batch, ndb, lp, n), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, dp), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, dp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u_p, dt_p, at_p, b_p, c_p, dv_p, db_p, carries, dy_p)

    du, ddt, da_p, dbm_p, dcm_p, dd_p, ddb_p = outs
    du = du[:, :seq_len, :d_total]
    ddt = ddt[:, :seq_len, :d_total]
    dbm = jnp.sum(dbm_p, axis=1)[:, :seq_len].astype(bmat.dtype)
    dcm = jnp.sum(dcm_p, axis=1)[:, :seq_len].astype(cmat.dtype)
    # Per-group parameter grads: sum the per-batch partials of each group.
    da_p = da_p[:, :, :d_total]
    dd_p = dd_p[:, :, :d_total]
    ddb_p = ddb_p[:, :, :d_total]
    da = jnp.zeros_like(a_t).at[jnp.arange(batch) % n_groups].add(da_p)
    dd = jnp.zeros_like(d_vec).at[jnp.arange(batch) % n_groups].add(dd_p)
    ddb = jnp.zeros_like(delta_bias).at[jnp.arange(batch) % n_groups].add(ddb_p)
    return du, ddt, da, dbm, dcm, dd, ddb


_selective_scan_core.defvjp(_core_fwd, _core_bwd)


def _resolve_tiling(chunk, block_d, d_total, scan_impl, interpret,
                    seq_len=None):
    seq = scan_impl == "seq"
    if chunk is None:
        chunk = _pick_chunk(seq_len) if (seq and seq_len) else (
            32 if seq else 128
        )
    if block_d is None:
        block_d = _pick_block_d(d_total)
    if not interpret:
        # Mosaic tiling: the lane (last) block dim must be a multiple of
        # 128; sublane (chunk) a multiple of 8. Interpret mode has no
        # such constraint, so tests may use smaller blocks.
        block_d = max(block_d, 128)
        chunk = max(chunk, 8)
    return chunk, block_d, seq


def selective_scan_pallas(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    chunk: int | None = None,
    block_d: int | None = None,
    interpret: bool | None = None,
    scan_impl: str = "seq",
) -> jax.Array:
    """Pallas selective scan, same signature as ``selective_scan_ref``.

    ``u``/``delta``: (batch, L, D); ``A``: (D, N); ``B``/``C``:
    (batch, L, N) or (batch, L, G, N) with G dividing D (grouped B/C are
    folded into the batch axis: one kernel launch covers all groups).
    """
    if interpret is None:
        interpret = _interpret_default()
    batch, seq_len, d_total = u.shape
    chunk, block_d, seq = _resolve_tiling(
        chunk, block_d, d_total, scan_impl, interpret, seq_len
    )
    n = A.shape[1]

    if B.ndim == 3:
        n_groups_bc = 1
        bmat, cmat = B, C
    else:
        n_groups_bc = B.shape[2]
        bmat, cmat = None, None

    if n_groups_bc == 1:
        a_t = A.astype(jnp.float32).T[None]  # (1, N, D)
        d_vec = (
            jnp.zeros((1, 1, d_total), jnp.float32)
            if D is None
            else D.astype(jnp.float32)[None, None]
        )
        db_vec = (
            jnp.zeros((1, 1, d_total), jnp.float32)
            if delta_bias is None
            else delta_bias.astype(jnp.float32)[None, None]
        )
        return _selective_scan_core(
            u, delta, a_t, bmat, cmat, d_vec, db_vec,
            delta_softplus, chunk, block_d, interpret, seq,
        )

    # Grouped case: fold groups into batch. u (batch, L, G*dg) ->
    # (batch*G, L, dg); parameter rows indexed by batch % G in-kernel.
    g = n_groups_bc
    dg = d_total // g
    u_f = u.reshape(batch, seq_len, g, dg).transpose(0, 2, 1, 3)
    u_f = u_f.reshape(batch * g, seq_len, dg)
    dt_f = delta.reshape(batch, seq_len, g, dg).transpose(0, 2, 1, 3)
    dt_f = dt_f.reshape(batch * g, seq_len, dg)
    b_f = B.transpose(0, 2, 1, 3).reshape(batch * g, seq_len, n)
    c_f = C.transpose(0, 2, 1, 3).reshape(batch * g, seq_len, n)
    a_t = A.astype(jnp.float32).reshape(g, dg, n).transpose(0, 2, 1)  # (G,N,dg)
    d_vec = (
        jnp.zeros((g, 1, dg), jnp.float32)
        if D is None
        else D.astype(jnp.float32).reshape(g, 1, dg)
    )
    db_vec = (
        jnp.zeros((g, 1, dg), jnp.float32)
        if delta_bias is None
        else delta_bias.astype(jnp.float32).reshape(g, 1, dg)
    )
    y_f = _selective_scan_core(
        u_f, dt_f, a_t, b_f, c_f, d_vec, db_vec,
        delta_softplus, chunk, block_d, interpret, seq,
    )
    y = y_f.reshape(batch, g, seq_len, dg).transpose(0, 2, 1, 3)
    return y.reshape(batch, seq_len, d_total)


def selective_scan_dirs(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    chunk: int | None = None,
    block_d: int | None = None,
    interpret: bool | None = None,
    scan_impl: str = "seq",
) -> jax.Array:
    """Multi-direction scan: K directions with distinct inputs AND params.

    One kernel launch covers all K directional scans of a multi-direction
    Mamba (ARM bimamba v3, ``mamba_simple.py:447-532``) by folding the
    direction axis into the batch and cycling parameter rows with
    ``batch % K`` in the kernel's index maps.

    Args:
      u, delta: (batch, K, L, D).
      A: (K, D, N);  B, C: (batch, K, L, N);  D: (K, D);
      delta_bias: (K, D).
    Returns:
      y: (batch, K, L, D).
    """
    if interpret is None:
        interpret = _interpret_default()
    batch, k, seq_len, d = u.shape
    chunk, block_d, seq = _resolve_tiling(
        chunk, block_d, d, scan_impl, interpret, seq_len
    )
    n = A.shape[-1]
    u_f = u.reshape(batch * k, seq_len, d)
    dt_f = delta.reshape(batch * k, seq_len, d)
    b_f = B.reshape(batch * k, seq_len, n)
    c_f = C.reshape(batch * k, seq_len, n)
    a_t = A.astype(jnp.float32).transpose(0, 2, 1)  # (K, N, D)
    d_vec = (
        jnp.zeros((k, 1, d), jnp.float32)
        if D is None
        else D.astype(jnp.float32)[:, None, :]
    )
    db_vec = (
        jnp.zeros((k, 1, d), jnp.float32)
        if delta_bias is None
        else delta_bias.astype(jnp.float32)[:, None, :]
    )
    y_f = _selective_scan_core(
        u_f, dt_f, a_t, b_f, c_f, d_vec, db_vec,
        delta_softplus, chunk, block_d, interpret, seq,
    )
    return y_f.reshape(batch, k, seq_len, d)
