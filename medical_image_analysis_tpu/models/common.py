"""Shared model components (channels-last, TPU-friendly)."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class PatchEmbed(nn.Module):
    """Image-to-patch embedding via a strided conv (channels-last).

    (B, H, W, C) -> (B, H/p * W/p, dim). Reference:
    ``arm/Finetuning/models_mamba.py`` PatchEmbed / timm PatchEmbed.
    ``embed_flat`` embeds already-patchified pixels (B, K, p*p*C) —
    used by the MAE mask-first fast path to embed only kept patches.
    """

    patch_size: int = 16
    embed_dim: int = 768
    flatten: bool = True

    def setup(self):
        p = self.patch_size
        self.proj = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            name="proj",
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.proj(x)
        if self.flatten:
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
        return x

    def embed_flat(self, patches: jax.Array) -> jax.Array:
        b, k, f = patches.shape
        p = self.patch_size
        x = patches.reshape(b * k, p, p, f // (p * p))
        return self.proj(x).reshape(b, k, self.embed_dim)


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def _gelu_exact(x):
    return nn.gelu(x, approximate=False)  # torch nn.GELU parity


class Mlp(nn.Module):
    """Transformer MLP block."""

    hidden_dim: int
    out_dim: int | None = None
    act: Callable = _gelu_exact
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def insert_token(x: jax.Array, token: jax.Array, pos: int) -> jax.Array:
    """Insert a (B, 1, D) token at position ``pos`` of (B, L, D)."""
    return jnp.concatenate([x[:, :pos], token, x[:, pos:]], axis=1)


def remove_token(x: jax.Array, pos: int):
    """Split out the token at ``pos``: returns (token (B,1,D), rest)."""
    tok = x[:, pos : pos + 1]
    rest = jnp.concatenate([x[:, :pos], x[:, pos + 1 :]], axis=1)
    return tok, rest


def spatial_transpose_with_cls(x: jax.Array, pos: int) -> jax.Array:
    """Row-major -> column-major token order, keeping the cls token at
    ``pos`` fixed (ARM bimamba-v3 column scan, ``mamba_simple.py:478-487``).

    The non-cls length must be a perfect square.
    """
    b, l, d = x.shape
    tok, rest = remove_token(x, pos)
    s = int(round((l - 1) ** 0.5))
    assert s * s == l - 1, f"sequence length {l - 1} is not a square"
    rest = rest.reshape(b, s, s, d).transpose(0, 2, 1, 3).reshape(b, l - 1, d)
    return insert_token(rest, tok, pos)
