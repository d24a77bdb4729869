"""Bidirectional text encoder (Bio_ClinicalBERT stand-in) for CLIP
alignment and report-memory embedding.

Reference: ``MambaXrayVL_CLIP.py:86-91`` (Bio_ClinicalBERT tower, EOS
pooling) and the report-memory generator
(``AM_MRG/models/report_memory_generation.py``). HF BERT weights can be
imported via :mod:`..ckpt.torch_import` when available; from-scratch
training works for the CLIP stage.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import trunc_normal_init
from .vit import TransformerBlock


class TextEncoder(nn.Module):
    vocab_size: int = 30522
    dim: int = 768
    depth: int = 6
    num_heads: int = 12
    max_len: int = 256

    @nn.compact
    def __call__(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """ids/mask (B, L) -> token features (B, L, D)."""
        x = nn.Embed(self.vocab_size, self.dim, name="tok_embed")(ids)
        pos = self.param("pos_embed", trunc_normal_init, (1, self.max_len, self.dim))
        x = x + pos[:, : ids.shape[1]].astype(x.dtype)
        x = nn.LayerNorm(name="embed_norm")(x)
        # Bidirectional with padding masked out: add large negative bias to
        # padded keys inside each attention — reuse TransformerBlock by
        # zeroing padded tokens (attention still sees them, so mask via
        # value zeroing is insufficient); instead build blocks inline.
        nh, hd = self.num_heads, self.dim // self.num_heads
        attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            qkv = nn.Dense(3 * self.dim, name=f"qkv_{i}")(h)
            b, l, _ = h.shape
            qkv = qkv.reshape(b, l, 3, nh, hd)
            q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
            a = jax.nn.softmax(
                jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd**-0.5 + attn_bias,
                axis=-1,
            )
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
            x = x + nn.Dense(self.dim, name=f"proj_{i}")(o)
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Dense(self.dim * 4, name=f"fc1_{i}")(h)
            x = x + nn.Dense(self.dim, name=f"fc2_{i}")(nn.gelu(h))
        return nn.LayerNorm(name="final_norm")(x)

    @staticmethod
    def pool_eos(feats: jax.Array, mask: jax.Array) -> jax.Array:
        """Feature at the last valid token (EOS pooling)."""
        last = jnp.maximum(mask.sum(axis=1) - 1, 0).astype(jnp.int32)
        return jnp.take_along_axis(
            feats, last[:, None, None], axis=1
        )[:, 0]
