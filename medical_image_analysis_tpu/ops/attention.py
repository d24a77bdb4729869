"""Fused short-sequence attention (Pallas TPU).

Profiling on v5e showed XLA's unfused attention dominating ViT encode
time: the materialized (B*H, L, L) score tensor costs more HBM traffic
than all the dense matmuls combined (see bench notes). For the short
sequences this framework uses (ViT 145-576 tokens, Swin windows 49,
MAE-masked 144, report decode <1k), the whole per-head score tile fits
in VMEM — one kernel computes qk^T, softmax, and @v without touching
HBM in between, grid over batch*heads.

Supports an optional additive (L, L) mask broadcast over batch/heads
(causal LLM training, cluster-causal AR decoding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, with_mask):
    q = q_ref[:].astype(jnp.float32)  # (G, L, hd)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, L, L)
    if with_mask:
        s = s + m_ref[:].astype(jnp.float32)[None]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o.astype(o_ref.dtype)


def fused_attention(
    q: jax.Array,  # (B, L, H, hd)
    k: jax.Array,  # (B, S, H, hd)   (S == L required for now)
    v: jax.Array,  # (B, S, H, hd)
    mask: jax.Array | None = None,  # (L, S) additive, broadcast
    scale: float | None = None,
    group: int = 8,
    interpret: bool | None = None,
) -> jax.Array:
    """Returns (B, L, H, hd). Falls back to einsum off-TPU shapes that
    don't fit (very long S)."""
    if interpret is None:
        interpret = _interpret_default()
    b, l, h, hd = q.shape
    s_len = k.shape[1]
    scale = scale if scale is not None else hd**-0.5

    # VMEM budget check: (G, L, S) f32 scores + 3 (G, L, hd) operands.
    def einsum_path():
        # native dtype (bf16 scores): matches the XLA baseline's traffic.
        attn = jnp.einsum("blhd,bshd->bhls", q, k) * scale
        if mask is not None:
            attn = attn + mask[None, None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhls,bshd->blhd", attn.astype(v.dtype), v)

    g = group
    bh = b * h
    while g > 1 and bh % g != 0:
        g //= 2
    use_kernel = (
        l == s_len
        and bh % g == 0
        and g * l * s_len * 4 <= 8 * 1024 * 1024  # scores tile in VMEM
    )
    if not use_kernel:
        return einsum_path()

    qf = q.transpose(0, 2, 1, 3).reshape(bh, l, hd)
    kf = k.transpose(0, 2, 1, 3).reshape(bh, s_len, hd)
    vf = v.transpose(0, 2, 1, 3).reshape(bh, s_len, hd)
    m = mask if mask is not None else jnp.zeros((1, 1), jnp.float32)
    with_mask = mask is not None

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, with_mask=with_mask
        ),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, l, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_len, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_len, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec(m.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, l, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, l, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, m)
    return out.reshape(b, h, l, hd).transpose(0, 2, 1, 3)
