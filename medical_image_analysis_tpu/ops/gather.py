"""Gathers whose VJP is itself a gather, for permutation-structured
token selection (MAE masking / unshuffling).

The VJP of ``jnp.take_along_axis`` is an XLA scatter. At the MAE step
shapes this is cheap (measured 0.6 ms/step at B=128 L=576 d=768,
tools/profile_mae_step.py — the hypothesis that it dominated the
backward was wrong), but scatters still serialize per row and their
cost grows with L, so keeping them out of the pretrain graph is free
insurance. MAE's indices are injective by construction (``ids_keep``
is a prefix of the shuffle permutation, ``ids_restore`` is a full
permutation — ``models/vit.py random_mask_ids``, reference
``HD_Xray_Pretrain_MAE/pretrain/models/mae.py:157-182``), so the
cotangent is itself a gather through the inverse permutation:

    y = x[ids]          =>   dx = pad(dy, zeros)[inv]

where ``inv`` maps each input row to the output row that read it (or to
a zero row if unread).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes


def _f0(a):
    """float0 cotangent for integer primal inputs."""
    return np.zeros(a.shape, dtypes.float0)


@jax.custom_vjp
def injective_gather(x: jax.Array, ids: jax.Array, inv: jax.Array):
    """``take_along_axis(x, ids, axis=1)`` with a gather-based VJP.

    x: (B, L, D); ids: (B, K) rows to read, all distinct per batch;
    inv: (B, L) with inv[b, j] = position of j in ids[b] if present,
    else any index >= K (unread rows get zero gradient via padding).
    """
    return jnp.take_along_axis(x, ids[..., None], axis=1)


def _ig_fwd(x, ids, inv):
    return injective_gather(x, ids, inv), (ids, inv, x.shape[1])


def _ig_bwd(res, dy):
    ids, inv, l = res
    b, k, d = dy.shape
    if k < l:
        dy = jnp.concatenate(
            [dy, jnp.zeros((b, l - k, d), dy.dtype)], axis=1
        )
    # clamp handles inv entries pointing past K into the zero pad
    dx = jnp.take_along_axis(
        dy, jnp.minimum(inv, l - 1)[..., None], axis=1
    )
    return dx, _f0(ids), _f0(inv)


injective_gather.defvjp(_ig_fwd, _ig_bwd)


def subset_gather(x: jax.Array, ids_keep: jax.Array,
                  ids_restore: jax.Array) -> jax.Array:
    """Keep rows ``ids_keep`` of x (MAE mask selection).

    ids_keep = ids_shuffle[:, :K] and ids_restore = argsort(ids_shuffle)
    (the pair ``random_mask_ids`` already produces): ids_restore[b, j]
    < K iff row j was kept, and then equals its position in ids_keep —
    exactly the inverse map the VJP gather needs.
    """
    return injective_gather(x, ids_keep, ids_restore)


def perm_gather(x: jax.Array, perm: jax.Array) -> jax.Array:
    """Full-permutation ``take_along_axis`` (MAE decoder unshuffle);
    the inverse permutation is recovered with an argsort at trace time
    (L ~ hundreds: negligible next to the scatter it replaces)."""
    return injective_gather(x, perm, jnp.argsort(perm, axis=1))
