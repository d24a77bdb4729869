"""Causal depthwise 1D convolution (the Mamba short conv).

Replaces the ``causal-conv1d`` CUDA extension used throughout the
reference (``/root/reference/CXPMRG_Bench_MambaXray_VL/arm/Finetuning/mamba_simple.py:16``).

TPU-first: kernel width is tiny (4), so the conv is expressed as a sum
of K statically-shifted slices — pure VPU work that XLA fuses into the
surrounding projections, with no im2col and no gather. Layout is
time-major ``(B, L, D)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = "silu",
) -> jax.Array:
    """y[t] = sum_k w[k] * x[t - K + 1 + k], with zero left-padding.

    Args:
      x: (B, L, D).
      weight: (K, D) depthwise taps, tap K-1 multiplies x[t].
      bias: (D,) or None.
    """
    k = weight.shape[0]
    pads = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    seq_len = x.shape[1]
    y = None
    for i in range(k):
        term = pads[:, i : i + seq_len, :] * weight[i][None, None, :]
        y = term if y is None else y + term
    if bias is not None:
        y = y + bias[None, None, :]
    if activation == "silu":
        y = jax.nn.silu(y)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation}")
    return y


def causal_conv1d_update(
    x_t: jax.Array,
    conv_state: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = "silu",
):
    """Single-token decode step.

    Args:
      x_t: (B, D) current input.
      conv_state: (B, K-1, D) previous inputs (oldest first).
    Returns:
      (y_t (B, D), new_conv_state (B, K-1, D)).
    """
    k = weight.shape[0]
    window = jnp.concatenate([conv_state, x_t[:, None, :]], axis=1)  # (B,K,D)
    y = jnp.sum(window * weight[None, :, :], axis=1)
    if bias is not None:
        y = y + bias[None, :]
    if activation == "silu":
        y = jax.nn.silu(y)
    new_state = window[:, 1:k, :]
    return y, new_state
