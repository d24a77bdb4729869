"""Fused Swin window-attention kernel (Pallas TPU).

One kernel per attention sub-layer: LN + qkv + per-head windowed
attention with relative-position bias (+ shifted-window mask) + output
projection + residual, with a block of windows resident in VMEM —
the Swin analog of ``ops/vit_block.py`` (same motivation: at L=49 the
XLA path round-trips HBM between LN, the head transposes, and the tiny
score tensors).

Reference semantics: ``R2GenCSR/VMamba/.../swin_transformer.py``
WindowAttention (bias table indexed by relative position, additive
shift mask per window) — reimplemented per ``models/swin.py``.

Layout contract: windows arrive as (B*nH*nW, ws*ws, C) in
``window_partition`` order, so row r belongs to in-image window
``r % nW``. The shift mask (nW, L, L) is therefore fed through a block
index map ``i -> (i % (nW / g_batch))`` — window blocks cycle through
the mask blocks with no per-row gather. The kernel adds the residual to
its (pre-LN, pre-partition-rolled) input, so callers apply
``window_reverse`` + un-roll directly to the output.

Training traces use the unfused XLA path (plain AD with saved
residuals); the custom-vjp fallback here exists for correctness, not
speed (see vit_block.py's measured fused-fwd + recompute-bwd trap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .vit_block import (
    _VMEM_BUDGET,
    _compiler_params,
    _interpret_default,
    _ln,
)


def _swin_attn_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g_ref, b_ref, bias_ref,
    mask_ref, o_ref, *, heads, eps,
):
    x = x_ref[:]  # (gb, L, C) windows
    gb, l, d = x.shape
    hd = d // heads
    h = _ln(x, g_ref[0][None, None], b_ref[0][None, None], eps).astype(
        x.dtype
    )
    h2 = h.reshape(gb * l, d)

    def proj(col0):
        out = jax.lax.dot_general(
            h2, wqkv_ref[:, col0 : col0 + d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0, col0 : col0 + d][None]
        return out.astype(x.dtype).reshape(gb, l, d)

    qm, km, vm = proj(0), proj(d), proj(2 * d)
    mask = mask_ref[:].astype(jnp.float32)  # (gb|1, L, L)
    outs = []
    for i in range(heads):
        q = qm[:, :, i * hd : (i + 1) * hd].astype(jnp.float32)
        k = km[:, :, i * hd : (i + 1) * hd].astype(jnp.float32)
        v = vm[:, :, i * hd : (i + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (hd**-0.5)
        s = s + bias_ref[i].astype(jnp.float32)[None] + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    o = jnp.concatenate(outs, axis=-1).reshape(gb * l, d)
    out = jax.lax.dot_general(
        o, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0][None]
    o_ref[:] = x + out.reshape(gb, l, d).astype(x.dtype)


def _swin_attn_unfused(x, wqkv, bqkv, wo, bo, g, b, bias, mask, heads,
                       eps=1e-5):
    """XLA reference path (identical math, f32 scores)."""
    bn, l, d = x.shape
    hd = d // heads
    h = _ln(x, g, b, eps).astype(x.dtype)
    qkv = (h @ wqkv + bqkv).reshape(bn, l, 3, heads, hd)
    s = jnp.einsum(
        "blhd,bshd->bhls", qkv[:, :, 0], qkv[:, :, 1],
        preferred_element_type=jnp.float32,
    ) * hd**-0.5
    s = s + bias[None].astype(jnp.float32)
    nw = mask.shape[0]
    if nw > 1:
        s = (
            s.reshape(bn // nw, nw, heads, l, l)
            + mask[None, :, None].astype(jnp.float32)
        ).reshape(bn, heads, l, l)
    else:
        s = s + mask[:, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhls,bshd->blhd", p.astype(x.dtype), qkv[:, :, 2])
    return x + (o.reshape(bn, l, d) @ wo + bo).astype(x.dtype)


def _swin_stack_bytes(gb, l, d):
    # h f32 + q/k/v pairs + per-head f32 scores; same family as
    # vit_block._attn_stack_bytes but with the (L, L) bias/mask adds.
    return 4 * gb * l * (20 * d + 16 * l)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_swin_attn_block(x, wqkv, bqkv, wo, bo, ln_g, ln_b, bias, mask,
                          heads, eps=1e-5, g_batch=16, interpret=None):
    """x: (B*nW_total, L, C) windows; bias (heads, L, L); mask (nW, L, L)
    additive (zeros (1, L, L) when unshifted). Returns x + attn-delta."""
    if interpret is None:
        interpret = _interpret_default()
    bn, l, d = x.shape
    nw = mask.shape[0]
    gb = g_batch
    if x.dtype.itemsize >= 4:
        gb = max(gb // 2, 1)
    while gb > 1 and _swin_stack_bytes(gb, l, d) > _VMEM_BUDGET:
        gb //= 2
    # blocks must tile both the row axis and (when shifted) the mask's
    # window axis so the i -> i % (nw/gb) index map lines rows up with
    # their in-image window's mask.
    while gb > 1 and (bn % gb or (nw > 1 and nw % gb)):
        gb //= 2

    ws = [w[None] if w.ndim == 1 else w for w in (wqkv, bqkv, wo, bo,
                                                  ln_g, ln_b)]
    blocked = pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0))
    in_specs = [blocked]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n))
    in_specs.append(pl.BlockSpec(bias.shape, lambda i: (0, 0, 0)))
    if nw > 1:
        nblk = nw // gb
        in_specs.append(
            pl.BlockSpec((gb, l, l), lambda i, n=nblk: (i % n, 0, 0))
        )
    else:
        in_specs.append(pl.BlockSpec((1, l, l), lambda i: (0, 0, 0)))
    return pl.pallas_call(
        functools.partial(_swin_attn_kernel, heads=heads, eps=eps),
        grid=(bn // gb,),
        in_specs=in_specs,
        out_specs=blocked,
        out_shape=jax.ShapeDtypeStruct((bn, l, d), x.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x, *ws, bias, mask)


def _fsb_fwd(x, wqkv, bqkv, wo, bo, ln_g, ln_b, bias, mask, heads, eps,
             g_batch, interpret):
    y = fused_swin_attn_block(x, wqkv, bqkv, wo, bo, ln_g, ln_b, bias,
                              mask, heads, eps, g_batch, interpret)
    return y, (x, wqkv, bqkv, wo, bo, ln_g, ln_b, bias, mask)


def _fsb_bwd(heads, eps, g_batch, interpret, res, dy):
    # Correctness fallback only: training paths choose the unfused XLA
    # route up-front (models/swin.py gating), so this recompute-vjp is
    # never on a hot path.
    x, wqkv, bqkv, wo, bo, ln_g, ln_b, bias, mask = res
    _, vjp = jax.vjp(
        lambda *a: _swin_attn_unfused(*a, mask, heads, eps),
        x, wqkv, bqkv, wo, bo, ln_g, ln_b, bias,
    )
    return (*vjp(dy), jnp.zeros_like(mask))


fused_swin_attn_block.defvjp(_fsb_fwd, _fsb_bwd)
