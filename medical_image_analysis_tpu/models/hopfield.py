"""Modern Hopfield layers: associative memory retrieval as iterated
scaled-dot attention.

Re-designs ``/root/reference/AM_MRG/hopfield_layers/hflayers/``
(``Hopfield`` __init__.py:12, ``HopfieldPooling`` :363, ``HopfieldLayer``
:631-770; update loop ``functional.py:8-160``): retrieval iterates
``xi <- softmax(beta * xi K^T) K`` until ``update_steps_max`` is reached
(0 = single step = plain cross-attention), then reads out values.

AM-MRG plugs frozen memory banks (CAM visual memory, report memory) into
``HopfieldLayer.lookup_weights`` (``AM_MRG.py:64-91,137-166``) — here the
stored patterns are either a parameter or passed at call time.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import trunc_normal_init


def hopfield_retrieve(
    query: jax.Array,  # (B, L, D)
    keys: jax.Array,  # (B, M, D) stored patterns (key space)
    values: jax.Array,  # (B, M, Dv)
    beta: float,
    update_steps: int = 0,
) -> jax.Array:
    """Core Hopfield update loop (functional.py:8-160)."""
    xi = query
    for _ in range(update_steps):
        attn = jax.nn.softmax(
            beta * jnp.einsum("bld,bmd->blm", xi, keys), axis=-1
        )
        xi = jnp.einsum("blm,bmd->bld", attn, keys)
    attn = jax.nn.softmax(
        beta * jnp.einsum("bld,bmd->blm", xi, keys), axis=-1
    )
    return jnp.einsum("blm,bmv->blv", attn, values)


class Hopfield(nn.Module):
    """Generic association module: query/stored-pattern projections around
    :func:`hopfield_retrieve`."""

    hidden: int
    num_heads: int = 1
    update_steps_max: int = 0
    scaling: float | None = None

    @nn.compact
    def __call__(self, query, stored, values=None):
        values = stored if values is None else values
        d = self.hidden
        q = nn.Dense(d, name="q_proj")(query)
        k = nn.Dense(d, name="k_proj")(stored)
        v = nn.Dense(d, name="v_proj")(values)
        beta = self.scaling or d**-0.5
        out = hopfield_retrieve(q, k, v, beta, self.update_steps_max)
        return nn.Dense(query.shape[-1], name="out_proj")(out)


class HopfieldLayer(nn.Module):
    """Trainable-or-provided stored patterns (hflayers HopfieldLayer).

    If ``lookup_weights`` is not passed to ``__call__``, a learnable
    pattern bank of shape (num_patterns, hidden) is used.
    """

    hidden: int
    num_patterns: int = 0
    update_steps_max: int = 0
    scaling: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array, lookup_weights: jax.Array | None = None):
        if lookup_weights is None:
            bank = self.param(
                "lookup_weights", trunc_normal_init,
                (self.num_patterns, self.hidden),
            )
            lookup_weights = jnp.broadcast_to(
                bank[None], (x.shape[0], self.num_patterns, self.hidden)
            )
        elif lookup_weights.ndim == 2:
            lookup_weights = jnp.broadcast_to(
                lookup_weights[None],
                (x.shape[0], *lookup_weights.shape),
            )
        lookup_weights = lookup_weights.astype(x.dtype)
        return Hopfield(
            hidden=self.hidden,
            update_steps_max=self.update_steps_max,
            scaling=self.scaling,
            name="assoc",
        )(x, lookup_weights)


class HopfieldPooling(nn.Module):
    """Pool a variable set into ``num_queries`` slots via association
    (hflayers :363)."""

    hidden: int
    num_queries: int = 1
    update_steps_max: int = 0

    @nn.compact
    def __call__(self, stored: jax.Array) -> jax.Array:
        b = stored.shape[0]
        q = self.param(
            "pooling_queries", trunc_normal_init, (1, self.num_queries, self.hidden)
        )
        q = jnp.broadcast_to(q, (b, self.num_queries, self.hidden)).astype(
            stored.dtype
        )
        out = Hopfield(
            hidden=self.hidden, update_steps_max=self.update_steps_max,
            name="assoc",
        )(q, stored)
        return out.reshape(b, -1)
