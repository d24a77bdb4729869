"""ViT encoder + Masked Autoencoder (MAE) with X-ray region masking.

Re-designs ``/root/reference/HD_Xray_Pretrain_MAE/pretrain/models/mae.py:41-389``
(1280x1280, patch64, in_chans=1 HD pretraining; plain 75% random masking
and the "yiliao" chest-region masking with separate inner/outer ratios
:184-253) and the timm-ViT finetune encoders
(``HD.../finetune/DP/models/vit.py``).

Masking uses argsort-of-uniform-noise shuffles with static keep counts —
identical math to the reference, XLA-friendly fixed shapes.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import perm_gather, subset_gather
from .common import DropPath, Mlp, PatchEmbed, trunc_normal_init


def sincos_pos_embed_2d(dim: int, grid: int, cls_token: bool = True) -> np.ndarray:
    """Fixed 2D sin-cos positional embedding, (1, grid²(+1), dim)."""
    assert dim % 4 == 0
    coords = np.arange(grid, dtype=np.float32)
    gy, gx = np.meshgrid(coords, coords, indexing="ij")
    omega = np.arange(dim // 4, dtype=np.float32) / (dim / 4)
    omega = 1.0 / 10000**omega

    def embed(pos):
        out = pos.reshape(-1)[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    pe = np.concatenate([embed(gy), embed(gx)], axis=1)  # (L, dim)
    if cls_token:
        pe = np.concatenate([np.zeros((1, dim), np.float32), pe], axis=0)
    return pe[None]


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.attention import fused_attention

        b, l, _ = x.shape
        nh, hd = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, nh, hd)
        out = fused_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        return nn.Dense(self.dim, name="proj")(out.reshape(b, l, self.dim))


class TransformerBlock(nn.Module):
    """Pre-LN ViT block over explicit params, with two execution paths:
    fused Pallas block kernels (LN+attn+proj and LN+MLP each one kernel —
    ~1.7x encoder speedup on v5e, see ops/vit_block.py) or the unfused
    XLA path (used off-TPU and when stochastic depth is active)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    fused: bool | None = None  # None = auto (fused on TPU)

    def setup(self):
        d = self.dim
        hidden = int(self.dim * self.mlp_ratio)
        dense_init = nn.initializers.lecun_normal()
        self.ln1_scale = self.param("ln1_scale", nn.initializers.ones, (d,))
        self.ln1_bias = self.param("ln1_bias", nn.initializers.zeros, (d,))
        self.qkv_kernel = self.param("qkv_kernel", dense_init, (d, 3 * d))
        self.qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * d,))
        self.proj_kernel = self.param("proj_kernel", dense_init, (d, d))
        self.proj_bias = self.param("proj_bias", nn.initializers.zeros, (d,))
        self.ln2_scale = self.param("ln2_scale", nn.initializers.ones, (d,))
        self.ln2_bias = self.param("ln2_bias", nn.initializers.zeros, (d,))
        self.fc1_kernel = self.param("fc1_kernel", dense_init, (d, hidden))
        self.fc1_bias = self.param("fc1_bias", nn.initializers.zeros, (hidden,))
        self.fc2_kernel = self.param("fc2_kernel", dense_init, (hidden, d))
        self.fc2_bias = self.param("fc2_bias", nn.initializers.zeros, (d,))
        self.dp1 = DropPath(self.drop_path, name="dp1")
        self.dp2 = DropPath(self.drop_path, name="dp2")

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from ..ops.vit_block import (
            _attn_unfused,
            _mlp_unfused,
            fused_attn_block,
            fused_bwd_fits,
            fused_mlp_block,
            in_training_trace,
            tpu_is_target,
        )

        dt = x.dtype
        w = lambda p: p.astype(dt)  # noqa: E731
        use_fused = self.fused
        if use_fused is None:
            use_fused = tpu_is_target()
        if self.drop_path > 0 and not deterministic:
            use_fused = False
        if self.is_initializing():
            use_fused = False  # init runs f32 on tiny shapes; skip kernels
        if (
            use_fused
            and (not deterministic or in_training_trace())
            and not fused_bwd_fits(
                x.shape[0], x.shape[1], self.dim,
                int(self.dim * self.mlp_ratio),
            )
        ):
            # Training trace (grads will be taken) at shapes where the
            # fused backward kernels cannot compile: plain XLA AD with
            # saved residuals beats fused-fwd + recompute-fallback bwd
            # by ~25% on the full MAE step (ops/vit_block.py
            # fused_bwd_fits).
            use_fused = False

        if use_fused:
            x = fused_attn_block(
                x, w(self.qkv_kernel), w(self.qkv_bias),
                w(self.proj_kernel), w(self.proj_bias),
                w(self.ln1_scale), w(self.ln1_bias), self.num_heads,
            )
            return fused_mlp_block(
                x, w(self.fc1_kernel), w(self.fc1_bias),
                w(self.fc2_kernel), w(self.fc2_bias),
                w(self.ln2_scale), w(self.ln2_bias),
            )

        y = _attn_unfused(
            x, w(self.qkv_kernel), w(self.qkv_bias), w(self.proj_kernel),
            w(self.proj_bias), w(self.ln1_scale), w(self.ln1_bias),
            self.num_heads,
        ) - x
        x = x + self.dp1(y, deterministic)
        y = _mlp_unfused(
            x, w(self.fc1_kernel), w(self.fc1_bias), w(self.fc2_kernel),
            w(self.fc2_bias), w(self.ln2_scale), w(self.ln2_bias),
        ) - x
        return x + self.dp2(y, deterministic)


def patchify(imgs: jax.Array, p: int) -> jax.Array:
    """(B, H, W, C) -> (B, L, p*p*C)."""
    b, h, w, c = imgs.shape
    x = imgs.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(x: jax.Array, p: int, h: int, w: int, c: int) -> jax.Array:
    b = x.shape[0]
    x = x.reshape(b, h // p, w // p, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def random_mask_ids(rng, n: int, l: int, mask_ratio: float):
    """Keep/restore indices for per-sample random masking (mae.py:157-182).

    Returns (ids_keep (n, len_keep), mask (n, l; 1 = removed),
    ids_restore (n, l))."""
    len_keep = int(l * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (n, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((n, l)).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, mask, ids_restore


def random_masking(rng, x: jax.Array, mask_ratio: float):
    """Per-sample random masking; returns (x_keep, mask, ids_restore)."""
    n, l, d = x.shape
    ids_keep, mask, ids_restore = random_mask_ids(rng, n, l, mask_ratio)
    x_keep = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
    return x_keep, mask, ids_restore


def region_masking(
    rng, x: jax.Array, mask_ratio_outer: float, mask_ratio_inner: float
):
    """Chest-region masking (mae.py random_masking_yiliao :184-253).

    A fixed rectangular interior (rows [0.25s+1, 0.75s+1), cols
    [0.125s+1, 0.75s+1) of the sqrt(L) grid) is masked at
    ``mask_ratio_inner``; the exterior at ``mask_ratio_outer``.
    """
    n, l, d = x.shape
    s = int(math.isqrt(l))
    assert s * s == l
    label = np.zeros((s, s), np.int32)
    label[int(s * 0.25) + 1 : int(s * 0.75) + 1,
          int(s * 0.125) + 1 : int(s * 0.75) + 1] = 1
    label = label.reshape(-1)
    idx_out = np.nonzero(label == 0)[0]
    idx_in = np.nonzero(label == 1)[0]
    keep_out = int(len(idx_out) * (1 - mask_ratio_outer))
    keep_in = int(len(idx_in) * (1 - mask_ratio_inner))

    r1, r2 = jax.random.split(rng)
    sh_out = jnp.argsort(jax.random.uniform(r1, (n, len(idx_out))), axis=1)
    sh_in = jnp.argsort(jax.random.uniform(r2, (n, len(idx_in))), axis=1)
    sh_out = jnp.asarray(idx_out)[sh_out]
    sh_in = jnp.asarray(idx_in)[sh_in]
    ids_shuffle = jnp.concatenate(
        [sh_out[:, :keep_out], sh_in[:, :keep_in],
         sh_out[:, keep_out:], sh_in[:, keep_in:]],
        axis=1,
    )
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    len_keep = keep_out + keep_in
    ids_keep = ids_shuffle[:, :len_keep]
    x_keep = subset_gather(x, ids_keep, ids_restore)
    mask = jnp.ones((n, l)).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_keep, mask, ids_restore



class ViT(nn.Module):
    """Plain ViT encoder returning tokens (cls first).

    The reference's DP feature extractor
    (``HD_Xray_Pretrain_MAE/finetune/DP/models/vit.py:273-285``) runs
    ``blocks[:-1]`` and returns WITHOUT the final LayerNorm — replicate
    it with ``depth=ref_depth-1, final_norm=False,
    fixed_sincos_pos=False`` (import map
    ``ckpt/torch_import.vit_torch_to_flax``, golden
    ``tests/test_reference_goldens.py``).
    """

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    fixed_sincos_pos: bool = True
    final_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")(x)
        b, l, d = x.shape
        grid = int(math.isqrt(l))
        cls = self.param("cls_token", trunc_normal_init, (1, 1, d))
        if self.fixed_sincos_pos:
            pos = jnp.asarray(sincos_pos_embed_2d(d, grid))
        else:
            pos = self.param("pos_embed", trunc_normal_init, (1, l + 1, d))
        x = x + pos[:, 1:].astype(x.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls + pos[:, :1], (b, 1, d)).astype(x.dtype), x],
            axis=1,
        )
        dpr = [
            self.drop_path_rate * i / max(self.depth - 1, 1)
            for i in range(self.depth)
        ]
        for i in range(self.depth):
            x = TransformerBlock(
                d, self.num_heads, self.mlp_ratio, dpr[i], name=f"block{i}"
            )(x, deterministic)
        if not self.final_norm:
            return x
        return nn.LayerNorm(name="norm")(x)


class MAE(nn.Module):
    """Masked autoencoder (mae.py:41-389)."""

    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = True

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")
        self.cls_token = self.param("cls_token", trunc_normal_init, (1, 1, self.embed_dim))
        self.blocks = [
            TransformerBlock(self.embed_dim, self.num_heads, self.mlp_ratio, name=f"block{i}")
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(name="encoder_norm")
        self.decoder_embed = nn.Dense(self.decoder_embed_dim, name="decoder_embed")
        self.mask_token = self.param(
            "mask_token", trunc_normal_init, (1, 1, self.decoder_embed_dim)
        )
        self.decoder_blocks = [
            TransformerBlock(
                self.decoder_embed_dim, self.decoder_num_heads, self.mlp_ratio,
                name=f"dec_block{i}",
            )
            for i in range(self.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(name="decoder_norm")
        self.decoder_pred = nn.Dense(
            self.patch_size**2 * self.in_chans, name="decoder_pred"
        )

    def encode(self, imgs, rng=None, mask_type="random", mask_ratio=0.75,
               mask_ratio_inner=0.75, deterministic=True):
        if mask_type == "random" and rng is not None:
            # Mask-first fast path: choose keep ids, gather raw patches,
            # embed only the kept 25% (4x less patch-embed work and no
            # full-length token tensor in HBM).
            b = imgs.shape[0]
            p = self.patch_size
            l = (imgs.shape[1] // p) * (imgs.shape[2] // p)
            grid = int(math.isqrt(l))
            ids_keep, mask, ids_restore = random_mask_ids(
                rng, b, l, mask_ratio
            )
            patches = patchify(imgs, p)
            kept = jnp.take_along_axis(patches, ids_keep[..., None], axis=1)
            x = self.patch_embed.embed_flat(kept)
            d = x.shape[-1]
            pos = jnp.asarray(sincos_pos_embed_2d(d, grid)).astype(x.dtype)
            pos_kept = jnp.take_along_axis(
                jnp.broadcast_to(pos[:, 1:], (b, l, d)),
                ids_keep[..., None], axis=1,
            )
            x = x + pos_kept
            cls = jnp.broadcast_to(
                self.cls_token + pos[:, :1], (b, 1, d)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
            for blk in self.blocks:
                x = blk(x, deterministic)
            return self.norm(x), mask, ids_restore

        x = self.patch_embed(imgs)
        b, l, d = x.shape
        grid = int(math.isqrt(l))
        pos = jnp.asarray(sincos_pos_embed_2d(d, grid)).astype(x.dtype)
        x = x + pos[:, 1:]
        if mask_type == "none" or rng is None:
            mask = jnp.zeros((b, l))
            ids_restore = jnp.broadcast_to(jnp.arange(l), (b, l))
        else:
            x, mask, ids_restore = region_masking(
                rng, x, mask_ratio, mask_ratio_inner
            )
        cls = jnp.broadcast_to(
            self.cls_token + pos[:, :1], (b, 1, d)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        for blk in self.blocks:
            x = blk(x, deterministic)
        return self.norm(x), mask, ids_restore

    def decode(self, latent, ids_restore, deterministic=True):
        x = self.decoder_embed(latent)
        b, l_keep1, d = x.shape
        l = ids_restore.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token, (b, l + 1 - l_keep1, d)
        ).astype(x.dtype)
        x_ = jnp.concatenate([x[:, 1:], mask_tokens], axis=1)
        x_ = perm_gather(x_, ids_restore)
        x = jnp.concatenate([x[:, :1], x_], axis=1)
        grid = int(math.isqrt(l))
        pos = jnp.asarray(sincos_pos_embed_2d(d, grid)).astype(x.dtype)
        x = x + pos
        for blk in self.decoder_blocks:
            x = blk(x, deterministic)
        x = self.decoder_norm(x)
        return self.decoder_pred(x)[:, 1:]  # drop cls

    def loss(self, imgs, pred, mask):
        target = patchify(imgs, self.patch_size)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        per_patch = jnp.mean((pred - target) ** 2, axis=-1)
        return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def __call__(self, imgs, rng=None, mask_type="random", mask_ratio=0.75,
                 mask_ratio_inner=0.75, deterministic=True):
        latent, mask, ids_restore = self.encode(
            imgs, rng, mask_type, mask_ratio, mask_ratio_inner, deterministic
        )
        pred = self.decode(latent, ids_restore, deterministic)
        return self.loss(imgs, pred, mask), pred, mask


# Plain ViT encoder presets (timm vit_*_patch16 dims — the DP/RG
# finetune extractor family, ``HD.../finetune/DP/models/vit.py``).
VIT_CONFIGS = {
    "vit_tiny": dict(patch_size=16, embed_dim=192, depth=12, num_heads=3),
    "vit_base": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "vit_large": dict(patch_size=16, embed_dim=1024, depth=24,
                      num_heads=16),
}

MAE_CONFIGS = {
    "mae_vit_base_patch16": dict(embed_dim=768, depth=12, num_heads=12),
    "mae_vit_large_patch16": dict(embed_dim=1024, depth=24, num_heads=16),
    # HD 1280x1280 single-channel variant (mae.py:49, patch 64).
    "mae_vit_base_patch64_hd": dict(
        patch_size=64, in_chans=1, embed_dim=768, depth=12, num_heads=12
    ),
}


def build_mae(name: str, **overrides) -> MAE:
    cfg = dict(MAE_CONFIGS[name])
    cfg.update(overrides)
    return MAE(**cfg)
