"""Sequence-parallel selective scan over a device mesh.

The SSM analog of ring attention (SURVEY.md §5.7 extension — the
reference has no sequence parallelism; its long-context story is the
linear-time scan itself). For sequences too long for one chip, the L
axis is sharded across the mesh and the recurrence is completed with a
two-pass Blelloch decomposition over shards:

  pass 1: each shard runs the local scan from a zero state and exposes
          its transition (A_s = prod a, B_s = final local state);
  exchange: all_gather of the (A_s, B_s) pairs (tiny: (B, D, N) each)
          over ICI; every shard folds the prefix composition to get its
          incoming state H_{s-1};
  pass 2: local scan re-runs seeded with H_{s-1}.

Inside each shard the Pallas kernel (or jnp reference) does the work;
the collective payload is O(B*D*N), independent of L.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.selective_scan import _broadcast_groups, _scan_combine


def _local_scan(u, delta, A, B, C, D, delta_bias, delta_softplus, h0):
    """Reference-style local scan with explicit initial state h0."""
    in_dtype = u.dtype
    d = u.shape[-1]
    u32 = u.astype(jnp.float32)
    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    a = jnp.exp(dt[..., None] * A.astype(jnp.float32)[None, None])
    bm = _broadcast_groups(B.astype(jnp.float32), d)
    cm = _broadcast_groups(C.astype(jnp.float32), d)
    b = (dt * u32)[..., None] * bm
    cum_a, h_in = jax.lax.associative_scan(_scan_combine, (a, b), axis=1)
    h = h_in + cum_a * h0[:, None]
    y = jnp.sum(cm * h, axis=-1)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None, :] * u32
    return y.astype(in_dtype), cum_a[:, -1], h[:, -1]


def selective_scan_sp(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None,
    delta_bias: jax.Array | None,
    delta_softplus: bool,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Selective scan with L sharded over ``axis`` of ``mesh``.

    Shapes as :func:`..ops.selective_scan.selective_scan_ref`; L must be
    divisible by the axis size.
    """
    n_shards = mesh.shape[axis]
    batch, seq_len, d = u.shape
    assert seq_len % n_shards == 0

    def shard_fn(u_s, dt_s, a_all, b_s, c_s, d_all, bias_all):
        n = a_all.shape[-1]
        h0 = jnp.zeros((batch, d, n), jnp.float32)
        # pass 1: local transition
        _, cum_a_last, h_last = _local_scan(
            u_s, dt_s, a_all, b_s, c_s, d_all, bias_all,
            delta_softplus, h0,
        )
        # exchange shard transitions (A_s, B_s)
        a_pairs = jax.lax.all_gather(cum_a_last, axis)  # (S, B, D, N)
        b_pairs = jax.lax.all_gather(h_last, axis)
        idx = jax.lax.axis_index(axis)

        def fold(s, carry):
            # carry = state entering shard s; advance only while s < idx.
            take = s < idx
            nxt = a_pairs[s] * carry + b_pairs[s]
            return jnp.where(take, nxt, carry)

        h_in = jax.lax.fori_loop(0, n_shards, fold, h0)
        # pass 2: local scan seeded with the incoming state
        y, _, _ = _local_scan(
            u_s, dt_s, a_all, b_s, c_s, d_all, bias_all,
            delta_softplus, h_in,
        )
        return y

    d_arr = D if D is not None else jnp.zeros((d,), jnp.float32)
    bias_arr = (
        delta_bias if delta_bias is not None else jnp.zeros((d,), jnp.float32)
    )
    spec_l = P(None, axis, None)
    bc_spec = P(None, axis, *([None] * (B.ndim - 2)))
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_l, spec_l, P(), bc_spec, bc_spec, P(), P()),
        out_specs=spec_l,
        check_vma=False,
    )
    return fn(u, delta, A, B, C, d_arr, bias_arr)
