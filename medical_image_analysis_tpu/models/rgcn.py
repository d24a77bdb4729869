"""R-GCN knowledge-graph encoder + multi-scale fusion + cross-attention
lookup (R2GenKG heads).

Re-designs ``/root/reference/R2GenKG/visual_rgcn/``:
``graph.py:7-30`` (2-layer torch_geometric RGCNConv, 3 relation types),
``self_attention.py:4-71`` (MultiScaleSelfAttentionFusion with scale +
position embeddings), ``cross.py:5-38`` (ResidualCrossAttentionBlock),
``cam.py:6-35`` (CrossAttentionLookup over the 6943x768 disease-token
bank) — without torch_geometric: message passing is segment scatter-add
with mean normalisation, static edge padding (pad edges point at a dummy
node row).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import trunc_normal_init


def rgcn_conv(
    h: jax.Array,  # (N+1, D_in) node features; last row = dummy for padding
    edge_index: jax.Array,  # (2, E) int32 [src, dst]; pad edges -> dummy row N
    edge_type: jax.Array,  # (E,) int32 in [0, R)
    w_rel: jax.Array,  # (R, D_in, D_out)
    w_self: jax.Array,  # (D_in, D_out)
) -> jax.Array:
    """One R-GCN layer: h'_i = W0 h_i + sum_r (1/c_{i,r}) sum_j W_r h_j."""
    n = h.shape[0]
    r = w_rel.shape[0]
    src, dst = edge_index[0], edge_index[1]
    msgs = jnp.einsum("ed,rdo->ero", h[src], w_rel)  # (E, R, D_out)
    onehot = jax.nn.one_hot(edge_type, r, dtype=h.dtype)  # (E, R)
    msgs = jnp.einsum("ero,er->ero", msgs, onehot)
    agg = jnp.zeros((n, r, w_rel.shape[-1]), h.dtype).at[dst].add(msgs)
    count = jnp.zeros((n, r), h.dtype).at[dst].add(onehot)
    agg = agg / jnp.maximum(count, 1.0)[..., None]
    return h @ w_self + agg.sum(axis=1)


class RGCN(nn.Module):
    """2-layer R-GCN with ReLU (graph.py:7-30)."""

    hidden: int
    out_dim: int
    num_relations: int = 3

    @nn.compact
    def __call__(self, x, edge_index, edge_type):
        w1r = self.param(
            "w1_rel", nn.initializers.lecun_normal(),
            (self.num_relations, x.shape[-1], self.hidden),
        )
        w1s = self.param(
            "w1_self", nn.initializers.lecun_normal(), (x.shape[-1], self.hidden)
        )
        h = nn.relu(rgcn_conv(x, edge_index, edge_type, w1r, w1s))
        w2r = self.param(
            "w2_rel", nn.initializers.lecun_normal(),
            (self.num_relations, self.hidden, self.out_dim),
        )
        w2s = self.param(
            "w2_self", nn.initializers.lecun_normal(), (self.hidden, self.out_dim)
        )
        return rgcn_conv(h, edge_index, edge_type, w2r, w2s)


class MultiScaleSelfAttentionFusion(nn.Module):
    """Fuse multiple graph scales with a transformer encoder + scale and
    position embeddings (self_attention.py:4-71)."""

    dim: int
    num_scales: int = 5
    num_heads: int = 8
    num_layers: int = 2
    max_nodes: int = 256

    @nn.compact
    def __call__(self, scale_feats: list[jax.Array]) -> jax.Array:
        # scale_feats: list of (B, N_s, D)
        scale_emb = self.param(
            "scale_embed", trunc_normal_init, (self.num_scales, self.dim)
        )
        pos_emb = self.param(
            "pos_embed", trunc_normal_init, (self.max_nodes, self.dim)
        )
        parts = []
        for s, f in enumerate(scale_feats):
            n = f.shape[1]
            parts.append(f + scale_emb[s][None, None] + pos_emb[:n][None])
        x = jnp.concatenate(parts, axis=1)
        for i in range(self.num_layers):
            y = nn.SelfAttention(num_heads=self.num_heads, name=f"attn{i}")(
                nn.LayerNorm(name=f"ln{i}")(x)
            )
            x = x + y
            y = nn.Dense(self.dim * 4, name=f"ffn{i}_in")(
                nn.LayerNorm(name=f"ln{i}b")(x)
            )
            x = x + nn.Dense(self.dim, name=f"ffn{i}_out")(nn.gelu(y))
        return x


class ResidualCrossAttentionBlock(nn.Module):
    """query + MHA(query, context) + MLP, all residual (cross.py:5-38).

    Faithful details: ONE shared pre-norm (``ln_1``) is applied to q, k
    AND v; the norms' beta is a zero BUFFER (scale-only LayerNorm); the
    MLP uses torch's exact (erf) GELU."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, query, context):
        b, lq, _ = query.shape
        nh, hd = self.num_heads, self.dim // self.num_heads
        ln1 = nn.LayerNorm(use_bias=False, name="ln_1")
        x = ln1(query)
        ctx = ln1(context)
        q = nn.Dense(self.dim, name="q")(x).reshape(b, lq, nh, hd)
        k = nn.Dense(self.dim, name="k")(ctx).reshape(b, -1, nh, hd)
        v = nn.Dense(self.dim, name="v")(ctx).reshape(b, -1, nh, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5, axis=-1
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, lq, self.dim)
        query = query + nn.Dense(self.dim, name="proj")(out)
        y = nn.Dense(self.dim * 4, name="mlp_in")(
            nn.LayerNorm(use_bias=False, name="ln_2")(query)
        )
        return query + nn.Dense(self.dim, name="mlp_out")(
            nn.gelu(y, approximate=False)
        )


class CrossAttentionLookup(nn.Module):
    """Single-head cross-attention lookup into a static token bank
    (cam.py:6-35; R2GenKG disease bank 6943x768)."""

    dim: int

    @nn.compact
    def __call__(self, query: jax.Array, bank: jax.Array) -> jax.Array:
        # bank: (M, D) host-provided constant or array.
        if bank.ndim == 2:
            bank = jnp.broadcast_to(
                bank[None], (query.shape[0], *bank.shape)
            )
        bank = bank.astype(query.dtype)
        q = nn.Dense(self.dim, name="q")(query)
        k = nn.Dense(self.dim, name="k")(bank)
        v = nn.Dense(self.dim, name="v")(bank)
        attn = jax.nn.softmax(
            jnp.einsum("bld,bmd->blm", q, k) * self.dim**-0.5, axis=-1
        )
        return jnp.einsum("blm,bmd->bld", attn, v)
