"""Selective scan (Mamba S6 recurrence) — jnp reference + dispatcher.

The recurrence (per batch b, channel d, state n, time t):

    dt[t]   = softplus(delta[t] + delta_bias)          (optional)
    a[t]    = exp(dt[t] * A[d, n])
    h[t]    = a[t] * h[t-1] + dt[t] * B[t, n] * u[t]
    y[t, d] = sum_n C[t, n] * h[t, d, n] + D[d] * u[t, d]

This module provides ``selective_scan_ref`` — a pure-jnp implementation
built on ``jax.lax.associative_scan`` (log-depth, fully differentiable by
JAX autodiff) used as the correctness oracle and CPU fallback — and
``selective_scan``, which dispatches to the Pallas TPU kernel in
:mod:`.selective_scan_pallas` when available.

Layout is TPU-native *time-major-within-batch*: ``u`` is ``(batch, L, D)``
(the reference CUDA kernels use ``(batch, D, L)``; see
``/root/reference/R2GenCSR/VMamba/kernels/selective_scan/csrc/selective_scan/cusoflex/selective_scan_oflex.cpp:144``
and the chunked math spec
``/root/reference/R2GenCSR/VMamba/kernels/selective_scan/test_selective_scan_easy.py:14-98``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _broadcast_groups(x: jax.Array, d: int) -> jax.Array:
    """(batch, L, G, N) -> (batch, L, D, N) by repeating each group D/G times."""
    if x.ndim == 3:  # (batch, L, N): single group
        x = x[:, :, None, :]
    b, l, g, n = x.shape
    if g == d:
        return x
    assert d % g == 0, f"channels {d} not divisible by groups {g}"
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, l, g, d // g, n))
    return x.reshape(b, l, d, n)


def _scan_combine(left, right):
    """Compose two first-order linear maps h -> a*h + b (left applied first)."""
    a_l, b_l = left
    a_r, b_r = right
    return a_r * a_l, a_r * b_l + b_r


def selective_scan_ref(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Pure-jnp selective scan.

    Args:
      u:     (batch, L, D) input sequence.
      delta: (batch, L, D) timestep.
      A:     (D, N) state matrix (typically ``-exp(A_log)``).
      B:     (batch, L, N) or (batch, L, G, N) input projection.
      C:     (batch, L, N) or (batch, L, G, N) output projection.
      D:     (D,) skip weight or None.
      delta_bias: (D,) or None.
      delta_softplus: apply softplus to delta (+ bias) first.
      return_last_state: also return h[L-1] of shape (batch, D, N).

    Returns:
      y: (batch, L, D) in u.dtype (compute in fp32, as the reference
      kernels force fp32 for the recurrence).
    """
    in_dtype = u.dtype
    d = u.shape[-1]
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    A = A.astype(jnp.float32)
    Bm = _broadcast_groups(B.astype(jnp.float32), d)  # (batch, L, D, N)
    Cm = _broadcast_groups(C.astype(jnp.float32), d)

    a = jnp.exp(delta[..., None] * A[None, None, :, :])  # (batch, L, D, N)
    b = (delta * u)[..., None] * Bm
    _, h = jax.lax.associative_scan(_scan_combine, (a, b), axis=1)
    y = jnp.sum(Cm * h, axis=-1)  # (batch, L, D)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None, :] * u
    y = y.astype(in_dtype)
    if return_last_state:
        return y, h[:, -1]  # (batch, D, N) fp32
    return y


@functools.partial(
    jax.jit,
    static_argnames=("delta_softplus", "backend", "chunk", "block_d"),
)
def selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    backend: str = "auto",
    chunk: int = 128,
    block_d: int = 128,
) -> jax.Array:
    """Selective scan dispatcher: Pallas TPU kernel or jnp reference.

    ``backend``: "auto" (Pallas on TPU, reference otherwise), "pallas",
    "ref".
    """
    if backend == "auto":
        platform = jax.devices()[0].platform
        backend = "pallas" if platform == "tpu" else "ref"
    if backend == "pallas":
        from .selective_scan_pallas import selective_scan_pallas

        return selective_scan_pallas(
            u, delta, A, B, C, D, delta_bias,
            delta_softplus=delta_softplus, chunk=chunk, block_d=block_d,
        )
    return selective_scan_ref(
        u, delta, A, B, C, D, delta_bias, delta_softplus=delta_softplus
    )
