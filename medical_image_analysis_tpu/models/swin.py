"""Swin Transformer backbone + SwinCheX multi-head disease classifier.

TPU-native re-implementation of the reference SwinCheX variant
(``/root/reference/AM_MRG/SwinCheX/models/swin_transformer.py:490-640``)
and the HF ``microsoft/swin-base-patch4-window7-224`` used as a frozen
encoder by R2GenCSR/R2GenKG (``R2GenCSR.py:72``, ``R2GenKG.py:42``).

Window attention on TPU: windows are folded into the batch axis via
reshape/transpose (layout transforms XLA fuses); attention itself is a
dense (nW*B, 49, 49) batched matmul on the MXU. Shifts use jnp.roll;
the shifted-window attention mask is computed statically at trace time.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import DropPath, Mlp, trunc_normal_init


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """Inverse of window_partition."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    )  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, L, L)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, L, L) additive mask for shifted-window attention."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    windows = img.reshape(1, h // ws, ws, w // ws, ws, 1)
    windows = windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class _DenseParams(nn.Module):
    """nn.Dense-shaped params (same names/init) exposed as raw tensors
    so the fused kernel path can consume them directly."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return k, b


class _LNParams(nn.Module):
    """nn.LayerNorm-shaped params (scale/bias) as raw tensors."""

    @nn.compact
    def __call__(self, dim: int):
        return (
            self.param("scale", nn.initializers.ones, (dim,)),
            self.param("bias", nn.initializers.zeros, (dim,)),
        )


class WindowAttention(nn.Module):
    """Takes PRE-norm windows + the block's norm1 params and returns
    ``windows + attn_delta`` (residual included), so the fused Pallas
    kernel (ops/swin_block.py — LN+qkv+attn+bias/mask+proj+residual in
    one launch) and the unfused XLA path are drop-in equals. LN commutes
    with roll/partition (both permute tokens), so normalizing inside the
    window layout is exact."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None, ln,
                 fused: bool = False) -> jax.Array:
        from ..ops.swin_block import fused_swin_attn_block

        bn, l, c = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv_w, qkv_b = _DenseParams(
            3 * self.dim, self.qkv_bias, name="qkv"
        )(c)
        proj_w, proj_b = _DenseParams(self.dim, name="proj")(self.dim)
        ws = self.window_size
        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            ((2 * ws - 1) ** 2, nh),
        )
        idx = _relative_position_index(ws)
        bias = (
            bias_table[idx.reshape(-1)].reshape(l, l, nh).transpose(2, 0, 1)
        )
        ln_g, ln_b = ln

        if fused:
            dt = x.dtype
            mask_arr = (
                jnp.asarray(mask, jnp.float32)
                if mask is not None
                else jnp.zeros((1, l, l), jnp.float32)
            )
            return fused_swin_attn_block(
                x, qkv_w.astype(dt),
                qkv_b.astype(dt) if qkv_b is not None
                else jnp.zeros((3 * self.dim,), dt),
                proj_w.astype(dt), proj_b.astype(dt),
                ln_g.astype(dt), ln_b.astype(dt),
                bias.astype(jnp.float32), mask_arr, nh,
            )

        from ..ops.vit_block import _ln

        h = _ln(x, ln_g, ln_b, 1e-5).astype(x.dtype)
        qkv = (h @ qkv_w.astype(h.dtype)) + (
            qkv_b.astype(h.dtype) if qkv_b is not None else 0.0
        )
        q, k, v = jnp.split(qkv.reshape(bn, l, 3, nh, hd), 3, axis=2)
        q = q[:, :, 0].transpose(0, 2, 1, 3)  # (bn, nh, l, hd)
        k = k[:, :, 0].transpose(0, 2, 1, 3)
        v = v[:, :, 0].transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd**-0.5
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bn // nw, nw, nh, l, l) + mask[None, :, None]
            attn = attn.reshape(bn, nh, l, l)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bn, l, c)
        return x + (
            out @ proj_w.astype(out.dtype) + proj_b.astype(out.dtype)
        ).astype(x.dtype)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from ..ops.vit_block import in_training_trace, tpu_is_target

        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        # Fused Pallas window-attention for inference traces on TPU;
        # training uses the unfused XLA path so AD saves residuals (the
        # fused-fwd + recompute-bwd trap measured in ops/vit_block.py).
        fused = (
            tpu_is_target()
            and deterministic
            and not in_training_trace()
            and not self.is_initializing()
        )

        ln1 = _LNParams(name="norm1")(c)
        y = x
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = window_partition(y, ws)
        mask = (
            jnp.asarray(_shift_attn_mask(h, w, ws, shift))
            if shift > 0
            else None
        )
        wout = WindowAttention(
            self.dim, self.num_heads, ws, name="attn"
        )(windows, mask, ln1, fused)
        y = window_reverse(wout, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        # wout included the residual in window layout; recover the
        # delta so DropPath scales only the branch.
        x = x + DropPath(self.drop_path, name="drop_path1")(
            y - x, deterministic
        )

        y = Mlp(int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), deterministic
        )
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMerging(nn.Module):
    """2x2 patch merging: concat 4 neighbours -> LN -> Dense(2C)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin backbone; returns the final token sequence (B, L, C_last)."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, kernel_size=(p, p), strides=(p, p),
            padding="VALID", name="patch_embed",
        )(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        idx = 0
        for stage, depth in enumerate(self.depths):
            dim = self.embed_dim * (2**stage)
            for blk in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[stage],
                    window_size=self.window_size,
                    shift=0 if blk % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dpr[idx],
                    name=f"stage{stage}_block{blk}",
                )(x, deterministic)
                idx += 1
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim * 2, name=f"merge{stage}")(x)

        b, h, w, c = x.shape
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x.reshape(b, h * w, c))
        return x  # (B, L, C_last)


class SwinCheX(nn.Module):
    """Swin classifier with per-disease MLP head stacks.

    Reference ``swin_transformer.py:556-574``: each of ``num_classes``
    diseases gets a [C -> 384 -> 48 (-> 48) -> 2] ReLU MLP producing
    2-way logits; loss is the sum of per-head cross-entropies
    (``SwinCheX/main.py:175-268``).
    """

    backbone: SwinTransformer
    num_classes: int = 14
    num_mlp_heads: int = 3

    _HEAD_DIMS = {0: (), 1: (48,), 2: (384, 48), 3: (384, 48, 48)}

    def setup(self):
        hidden = self._HEAD_DIMS[self.num_mlp_heads]
        heads = []
        for i in range(self.num_classes):
            stack = [
                nn.Dense(hd, name=f"head{i}_fc{j}")
                for j, hd in enumerate(hidden)
            ]
            stack.append(nn.Dense(2, name=f"head{i}_out"))
            heads.append(stack)
        self.heads = heads

    def tokens(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """Final-stage token features (the GradCAM target layer)."""
        return self.backbone(x, deterministic)

    def logits_from_tokens(self, tokens: jax.Array) -> jax.Array:
        feat = jnp.mean(tokens, axis=1)  # avgpool over tokens
        logits = []
        for stack in self.heads:
            h = feat
            for layer in stack[:-1]:
                h = nn.relu(layer(h))
            logits.append(stack[-1](h))
        return jnp.stack(logits, axis=1)  # (B, num_classes, 2)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.logits_from_tokens(self.tokens(x, deterministic))


SWIN_CONFIGS = {
    "swin_tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def build_swin(name: str, **overrides) -> SwinTransformer:
    cfg = dict(SWIN_CONFIGS[name])
    cfg.update(overrides)
    return SwinTransformer(**cfg)
