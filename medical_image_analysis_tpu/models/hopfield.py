"""Modern Hopfield layers: associative memory retrieval as iterated
scaled-dot attention.

Faithful to ``/root/reference/AM_MRG/hopfield_layers/hflayers/``
(``Hopfield`` __init__.py:12, ``HopfieldPooling`` :363, ``HopfieldLayer``
:631-770; core ``functional.py:150-455``): per-head association space of
``head_dim`` (the library's ``hidden_size``) with a separate per-head
``pattern_dim`` value space (``pattern_size``), optional LayerNorms on
stored/state/pattern-projection inputs (library defaults: on), scaling
``beta`` multiplying the projected queries, and the retrieval loop
``q <- softmax(beta q K^T) K`` run ``update_steps_max`` times before the
value read-out and the ``num_heads*pattern_dim -> out_dim`` projection.

AM-MRG plugs frozen memory banks (CAM visual memory, report memory) into
``HopfieldLayer.lookup_weights`` (``AM_MRG.py:64-91,137-166``:
input 768, hidden 1024, pattern 768, 6 heads, scaling 4.0) — here the
stored patterns are either a parameter or passed at call time.
Association dropout (0.1 in the reference, train-only) is omitted:
retrieval here runs deterministically.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import trunc_normal_init


def hopfield_retrieve(
    query: jax.Array,  # (B, L, H, Dh) projected state patterns
    keys: jax.Array,  # (B, M, H, Dh) projected stored patterns
    values: jax.Array,  # (B, M, H, Dv)
    beta: float,
    update_steps: int = 0,
) -> jax.Array:
    """Core Hopfield update loop (functional.py:330-440), per head."""
    q = query
    for _ in range(update_steps):
        attn = jax.nn.softmax(
            beta * jnp.einsum("blhd,bmhd->bhlm", q, keys), axis=-1
        )
        q = jnp.einsum("bhlm,bmhd->blhd", attn, keys)
    attn = jax.nn.softmax(
        beta * jnp.einsum("blhd,bmhd->bhlm", q, keys), axis=-1
    )
    return jnp.einsum("bhlm,bmhv->blhv", attn, values)


class Hopfield(nn.Module):
    """Generic association module: per-head query/stored-pattern/value
    projections around :func:`hopfield_retrieve`.

    ``hidden`` is the PER-HEAD association dim (library hidden_size);
    ``pattern_dim`` the per-head value dim (library pattern_size,
    defaults to ``hidden``); ``out_dim`` the output projection width
    (defaults to the query's input dim)."""

    hidden: int
    num_heads: int = 1
    pattern_dim: int | None = None
    out_dim: int | None = None
    update_steps_max: int = 0
    scaling: float | None = None
    # Library defaults: normalize stored/state/pattern inputs (affine).
    norm_stored: bool = True
    norm_state: bool = True
    norm_pattern: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, query, stored, values=None):
        values = stored if values is None else values
        nh, hd = self.num_heads, self.hidden
        pd = self.pattern_dim or hd
        if self.norm_state:
            query = nn.LayerNorm(epsilon=1e-5, name="norm_state")(query)
        if self.norm_stored:
            stored = nn.LayerNorm(epsilon=1e-5, name="norm_stored")(stored)
        if self.norm_pattern:
            values = nn.LayerNorm(epsilon=1e-5, name="norm_pattern")(values)
        b, l, _ = query.shape
        m = stored.shape[1]
        q = nn.Dense(nh * hd, use_bias=self.use_bias, name="q_proj")(
            query).reshape(b, l, nh, hd)
        k = nn.Dense(nh * hd, use_bias=self.use_bias, name="k_proj")(
            stored).reshape(b, m, nh, hd)
        v = nn.Dense(nh * pd, use_bias=self.use_bias, name="v_proj")(
            values).reshape(b, m, nh, pd)
        beta = self.scaling or hd**-0.5
        out = hopfield_retrieve(q, k, v, beta, self.update_steps_max)
        out = out.reshape(b, l, nh * pd)
        return nn.Dense(
            self.out_dim or query.shape[-1], name="out_proj"
        )(out)


class HopfieldLayer(nn.Module):
    """Trainable-or-provided stored patterns (hflayers HopfieldLayer).

    If ``lookup_weights`` is not passed to ``__call__``, a learnable
    pattern bank of shape (num_patterns, pattern input dim) is used.
    The bank feeds BOTH the stored-pattern (key) and pattern-projection
    (value) inputs, like the library with ``target_weights=None``.
    """

    hidden: int
    num_patterns: int = 0
    num_heads: int = 1
    pattern_dim: int | None = None
    out_dim: int | None = None
    update_steps_max: int = 0
    scaling: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array, lookup_weights: jax.Array | None = None):
        if lookup_weights is None:
            bank = self.param(
                "lookup_weights", trunc_normal_init,
                (self.num_patterns, x.shape[-1]),
            )
            lookup_weights = jnp.broadcast_to(
                bank[None], (x.shape[0], self.num_patterns, x.shape[-1])
            )
        elif lookup_weights.ndim == 2:
            lookup_weights = jnp.broadcast_to(
                lookup_weights[None],
                (x.shape[0], *lookup_weights.shape),
            )
        lookup_weights = lookup_weights.astype(x.dtype)
        return Hopfield(
            hidden=self.hidden,
            num_heads=self.num_heads,
            pattern_dim=self.pattern_dim,
            out_dim=self.out_dim,
            update_steps_max=self.update_steps_max,
            scaling=self.scaling,
            name="assoc",
        )(x, lookup_weights)


class HopfieldPooling(nn.Module):
    """Pool a variable set into ``num_queries`` slots via association
    (hflayers :363)."""

    hidden: int
    num_queries: int = 1
    num_heads: int = 1
    update_steps_max: int = 0

    @nn.compact
    def __call__(self, stored: jax.Array) -> jax.Array:
        b = stored.shape[0]
        q = self.param(
            "pooling_queries", trunc_normal_init,
            (1, self.num_queries, self.hidden),
        )
        q = jnp.broadcast_to(q, (b, self.num_queries, self.hidden)).astype(
            stored.dtype
        )
        out = Hopfield(
            hidden=self.hidden, num_heads=self.num_heads,
            update_steps_max=self.update_steps_max,
            name="assoc",
        )(q, stored)
        return out.reshape(b, -1)
