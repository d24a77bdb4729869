"""2D cross scan / merge: 4-directional sequence expansion for VMamba.

Channels-last, time-major TPU layout: images are ``(B, H, W, C)`` and
sequences ``(B, K, L, C)``. Directions (matching the reference
``CrossScan``/``CrossMerge`` in
``/root/reference/R2GenCSR/VMamba/classification/models/vmamba.py:25-67``
and the Triton versions in ``csm_triton.py:7-45``):

  k=0 row-major, k=1 column-major, k=2 reversed row-major,
  k=3 reversed column-major.

These are pure layout transforms (transpose/flip/reshape) — XLA fuses
them into neighbouring ops and JAX autodiff gives the exact adjoints, so
unlike the reference no custom kernels or autograd.Functions are needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_scan(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 4, H*W, C) directional sequences."""
    b, h, w, c = x.shape
    row = x.reshape(b, h * w, c)
    col = x.transpose(0, 2, 1, 3).reshape(b, h * w, c)
    return jnp.stack(
        [row, col, jnp.flip(row, axis=1), jnp.flip(col, axis=1)], axis=1
    )


def cross_merge(ys: jax.Array, h: int, w: int) -> jax.Array:
    """(B, 4, H*W, C) -> (B, H*W, C), summing the four directions."""
    b, k, l, c = ys.shape
    assert k == 4 and l == h * w
    row = ys[:, 0] + jnp.flip(ys[:, 2], axis=1)
    col = ys[:, 1] + jnp.flip(ys[:, 3], axis=1)
    col = col.reshape(b, w, h, c).transpose(0, 2, 1, 3).reshape(b, l, c)
    return row + col


def cross_scan_1d(x: jax.Array) -> jax.Array:
    """(B, L, C) -> (B, 2, L, C): forward + reversed (bidirectional 1D)."""
    return jnp.stack([x, jnp.flip(x, axis=1)], axis=1)


def cross_merge_1d(ys: jax.Array) -> jax.Array:
    """(B, 2, L, C) -> (B, L, C)."""
    return ys[:, 0] + jnp.flip(ys[:, 1], axis=1)
