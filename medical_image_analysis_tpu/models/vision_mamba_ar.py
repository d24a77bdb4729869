"""Autoregressive Mamba pretraining (MambaXray-VL stage 1).

Re-designs ``/root/reference/CXPMRG_Bench_MambaXray_VL/pretrain/models_pretrain.py:285-546``:
patch embed -> 4x4 token clusters (cluster-major order) -> drop the last
cluster -> unidirectional Mamba encoder -> multi-scale features from
``skip`` layers -> enc2dec -> 4 cross-attention decoder blocks with a
block-causal (cluster-tril) mask -> predict next-cluster pixels with
per-patch-normalised MSE.

The cluster-causal mask is the reference's long-context strategy (no
ring attention needed — see SURVEY.md §5.7); here it is a static mask
applied inside standard batched attention on the MXU.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import Mlp, PatchEmbed, trunc_normal_init
from .mamba import MambaBlock
from .vit import patchify, sincos_pos_embed_2d

CLUSTER = 4  # 4x4 patches per cluster


def to_clusters(x: jax.Array, grid: int) -> jax.Array:
    """(B, grid*grid, C) row-major -> (B, n_clusters, 16, C) cluster-major."""
    b, l, c = x.shape
    g = grid // CLUSTER
    x = x.reshape(b, g, CLUSTER, g, CLUSTER, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g * g, CLUSTER * CLUSTER, c)


def cluster_causal_mask(n_clusters: int, tokens: int = 16) -> np.ndarray:
    """Block-tril additive mask (mask_generate, models_pretrain.py:395-400)."""
    tril = np.tril(np.ones((n_clusters, n_clusters), np.float32))
    mask = np.where(tril == 0, -np.inf, 0.0).astype(np.float32)
    mask = np.repeat(np.repeat(mask, tokens, axis=0), tokens, axis=1)
    return mask


class CrossAttnDecoderBlock(nn.Module):
    """Query tokens cross-attend into encoder latents (+ MLP)."""

    dim: int
    num_heads: int = 16
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, q_tokens, context, mask):
        b, lq, _ = q_tokens.shape
        nh, hd = self.num_heads, self.dim // self.num_heads
        x = nn.LayerNorm(name="norm1")(q_tokens)
        ctx = nn.LayerNorm(name="norm_ctx")(context)
        q = nn.Dense(self.dim, name="q")(x).reshape(b, lq, nh, hd)
        k = nn.Dense(self.dim, name="k")(ctx).reshape(b, -1, nh, hd)
        v = nn.Dense(self.dim, name="v")(ctx).reshape(b, -1, nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
        attn = attn + mask[None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, lq, self.dim)
        q_tokens = q_tokens + nn.Dense(self.dim, name="proj")(out)
        y = Mlp(int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(name="norm2")(q_tokens)
        )
        return q_tokens + y


class VisionMambaAR(nn.Module):
    """AR-pretrain VisionMamba; __call__ returns the scalar loss."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    dec_embed_dim: int = 512
    expand: int = 1
    d_state: int = 16
    in_chans: int = 3
    dec_heads: int = 16
    scan_backend: str = "auto"

    @property
    def skip(self):
        if self.depth == 12:
            return [6, 8, 10, 12]
        if self.depth == 24:
            return [12, 16, 20, 24]
        k = min(4, self.depth)  # small configs (tests): last k layers
        return list(range(self.depth - k + 1, self.depth + 1))

    @nn.compact
    def __call__(self, imgs: jax.Array, deterministic: bool = True):
        b = imgs.shape[0]
        x = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")(imgs)
        _, l, c = x.shape
        grid = int(math.isqrt(l))
        pos = jnp.asarray(
            sincos_pos_embed_2d(c, grid, cls_token=False)
        ).astype(x.dtype)
        x = x + pos

        clusters = to_clusters(x, grid)  # (B, n_clusters, 16, C)
        n_total = clusters.shape[1]
        n_ar = n_total - 1
        h = clusters[:, :-1].reshape(b, n_ar * 16, c)

        feats = []
        for i in range(self.depth):
            h = MambaBlock(
                d_model=self.embed_dim,
                d_state=self.d_state,
                expand=self.expand,
                bimamba_type="none",
                scan_backend=self.scan_backend,
                name=f"layers_{i}",
            )(h, deterministic=deterministic)
            if (i + 1) in self.skip:
                feats.append(h)
        feats = [
            nn.LayerNorm(name=f"norm_{i + 1}")(f) for i, f in enumerate(feats)
        ]
        feats = jnp.concatenate(feats, axis=-1)
        latents = nn.Dense(4 * self.dec_embed_dim, name="enc2dec")(feats)
        latents = latents.reshape(b, n_ar * 16, self.dec_embed_dim, 4)

        # Decoder queries: positional tokens for clusters 1..n (next-cluster
        # prediction), via a learnable ar_token + fixed sincos positions.
        dc = self.dec_embed_dim
        ar_token = self.param("ar_token", trunc_normal_init, (1, 1, dc))
        dec_pos = jnp.asarray(
            sincos_pos_embed_2d(dc, grid, cls_token=False)
        ).astype(x.dtype)
        q = (ar_token + dec_pos).astype(x.dtype)  # (1, L, dc)
        q = to_clusters(q, grid)[:, 1:].reshape(1, n_ar * 16, dc)
        q = jnp.broadcast_to(q, (b, n_ar * 16, dc))

        mask = jnp.asarray(cluster_causal_mask(n_ar))
        for i in range(4):
            q = CrossAttnDecoderBlock(
                dc, self.dec_heads, name=f"dec_block{i}"
            )(q, latents[..., i], mask)
        q = nn.LayerNorm(name="ar_norm")(q)
        pred = nn.Dense(
            self.patch_size**2 * self.in_chans, name="ar_pred"
        )(q)

        # Per-patch-normalised MSE against clusters 1..n.
        target = patchify(imgs, self.patch_size)
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
        target = to_clusters(target, grid)[:, 1:].reshape(
            b, n_ar * 16, -1
        )
        loss = jnp.mean((pred - target) ** 2)
        return loss


AR_CONFIGS = {
    "arm_base_pz16": dict(embed_dim=768, depth=12, dec_embed_dim=512),
    "arm_large_pz16": dict(embed_dim=1024, depth=24, dec_embed_dim=512),
    # HD 1280² variant, patch 64 (models_pretrain.py:541-546).
    "arm_base_pz16_1280": dict(
        patch_size=64, embed_dim=768, depth=12, dec_embed_dim=512
    ),
}


def build_vision_mamba_ar(name: str, **overrides) -> VisionMambaAR:
    cfg = dict(AR_CONFIGS[name])
    cfg.update(overrides)
    return VisionMambaAR(**cfg)
