"""Fused ViT block kernels (Pallas TPU): LN+QKV+attention+proj+residual
and LN+MLP+residual, each as one kernel.

Motivation (measured on v5e, B=512 L=145 ViT-B): the dense matmuls alone
run at ~190 TFLOP/s but the full block only ~80 TFLOP/s — LayerNorms,
attention score tensors, and head transposes each round-trip HBM. These
kernels keep a batch-block of activations resident in VMEM through the
whole sub-layer; weights are broadcast blocks.

Forward and backward are both Pallas kernels: the backward recomputes
the sub-layer forward inside VMEM (flash-attention-style — no stored
attention probabilities or hidden activations) and emits dx per batch
block plus weight gradients accumulated in fp32 across the sequential
TPU grid. Set MIA_VIT_BWD=xla to fall back to the round-2 behavior
(jax.vjp over the unfused XLA path) for A/B comparison.
"""

from __future__ import annotations

import contextlib
import functools
import os
import threading

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def tpu_is_target() -> bool:
    """True when new traces will execute on the TPU backend.

    The fused-kernel gates must NOT enable Mosaic kernels for
    computations pinned to another device: under
    ``jax.default_device(cpu)`` on a TPU host (e.g. the side-input
    synthesis in ``data/side_inputs.py``) ``jax.default_backend()``
    still reports "tpu", but lowering a Pallas TPU kernel for the CPU
    device fails.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def _interpret_default() -> bool:
    return not tpu_is_target()


_train_trace = threading.local()


@contextlib.contextmanager
def training_trace():
    """Mark the enclosing trace as a training loss (gradients WILL be
    taken through it). ``make_train_step`` wraps every loss trace in
    this; :class:`models.vit.TransformerBlock` reads it at trace time to
    skip the fused forward at shapes where the fused backward cannot
    compile (see :func:`fused_bwd_fits`) — models often run their vision
    towers with ``deterministic=True`` even in training losses, so the
    ``deterministic`` flag alone under-detects training."""
    prev = getattr(_train_trace, "on", False)
    _train_trace.on = True
    try:
        yield
    finally:
        _train_trace.on = prev


def in_training_trace() -> bool:
    return getattr(_train_trace, "on", False)


def _ln(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias)


def _attn_block_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g_ref, b_ref, o_ref,
    *, heads,
):
    # Mosaic-friendly: 2D/3D ops only; heads via static column slices.
    x = x_ref[:]  # (gB, L, D)
    gb, l, d = x.shape
    hd = d // heads
    h = _ln(x, g_ref[0][None, None], b_ref[0][None, None]).astype(x.dtype)
    h2 = h.reshape(gb * l, d)

    def proj(col0):  # one third of the qkv projection, bf16 result
        out = jax.lax.dot_general(
            h2, wqkv_ref[:, col0 : col0 + d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0, col0 : col0 + d][None]
        return out.astype(x.dtype).reshape(gb, l, d)

    qm, km, vm = proj(0), proj(d), proj(2 * d)
    outs = []
    for i in range(heads):
        q = qm[:, :, i * hd : (i + 1) * hd].astype(jnp.float32)
        k = km[:, :, i * hd : (i + 1) * hd].astype(jnp.float32)
        v = vm[:, :, i * hd : (i + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (hd**-0.5)
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


def _mlp_block_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b_ref, o_ref, *,
    eps=1e-6,
):
    x = x_ref[:]
    gb, l, d = x.shape
    h = _ln(
        x, g_ref[0][None, None], b_ref[0][None, None], eps
    ).astype(x.dtype)
    hidden = jax.lax.dot_general(
        h.reshape(gb * l, d), w1_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b1_ref[0][None]
    # tanh-approx GELU: Mosaic has no erf lowering; with bf16
    # activations the approximation error (max ~3e-4 absolute) is
    # below bf16 rounding — quantified in test_vit_block.py.
    hidden = jax.nn.gelu(hidden.astype(jnp.float32), approximate=True)
    out = jax.lax.dot_general(
        hidden.astype(x.dtype), w2_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b2_ref[0][None]
    o_ref[:] = x + out.reshape(gb, l, d).astype(x.dtype)


def _attn_unfused(x, wqkv, bqkv, wo, bo, g, b, heads):
    d = x.shape[-1]
    hd = d // heads
    h = _ln(x, g, b).astype(x.dtype)
    qkv = (h @ wqkv + bqkv).reshape(*x.shape[:2], 3, heads, hd)
    attn = jnp.einsum(
        "blhd,bshd->bhls", qkv[:, :, 0], qkv[:, :, 1]
    ) * hd**-0.5
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhls,bshd->blhd", attn, qkv[:, :, 2])
    return x + (o.reshape(*x.shape) @ wo + bo).astype(x.dtype)


def _mlp_unfused(x, w1, b1, w2, b2, g, b, eps=1e-6):
    h = _ln(x, g, b, eps).astype(x.dtype)
    hidden = jax.nn.gelu((h @ w1 + b1).astype(jnp.float32), approximate=True)
    return x + (hidden.astype(x.dtype) @ w2 + b2).astype(x.dtype)


def _gelu_tanh_grad(x):
    """d/dx of tanh-approx GELU (fp32)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    u = c * (x + 0.044715 * x * x * x)
    t = jnp.tanh(u)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * c * (
        1.0 + 3 * 0.044715 * x * x
    )


def _ln_fwd32(x2, g_ref, b_ref, eps=1e-6):
    """LN recompute in fp32 on (rows, D): returns (xhat, inv_sigma, h32)."""
    x32 = x2.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * inv
    g32 = g_ref[0].astype(jnp.float32)
    h32 = xhat * g32[None] + b_ref[0].astype(jnp.float32)[None]
    return xhat, inv, g32, h32


def _ln_bwd32(dh, xhat, inv, g32):
    """Gradient through LN given dL/dh32; returns (dx32, dg, db)."""
    dg = jnp.sum(dh * xhat, axis=0)
    db = jnp.sum(dh, axis=0)
    dxh = dh * g32[None]
    dx32 = (
        dxh
        - dxh.mean(-1, keepdims=True)
        - xhat * (dxh * xhat).mean(-1, keepdims=True)
    ) * inv
    return dx32, dg, db


def _acc_at(ref, idx, val):
    """Accumulate a weight-grad contribution across sequential grid steps
    into a (statically sliced) region of an output ref."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ref[idx] = val.astype(ref.dtype)

    @pl.when(i > 0)
    def _add():
        ref[idx] = ref[idx] + val.astype(ref.dtype)


def _acc(ref, val):
    _acc_at(ref, tuple(slice(None) for _ in ref.shape), val)


def _acc_dyn(ref, idx, val, first):
    """Accumulate into a dynamically-sliced region of an output ref;
    `first` selects init-vs-add (True only on grid step 0)."""

    @pl.when(first)
    def _init():
        ref[idx] = val.astype(ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _add():
        ref[idx] = ref[idx] + val.astype(ref.dtype)


def _mlp_block_bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b_ref, dy_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbl_ref,
    *, hc, eps=1e-6,
):
    # The hidden dimension is processed in hc-column chunks inside a
    # fori_loop (NOT a Python loop: Mosaic allocates each unrolled
    # iteration's matmul temps separately on the stack — measured
    # 19.8M with 16 unrolled chunks vs the same work in-loop) so the
    # fp32 (rows, hidden) activations and (d, hidden) weight-grad temps
    # never exist at full width. Unchunked, the kernel measures 19.3M
    # at ViT-B encoder shapes and 24.9M at the MAE decoder's L=577 —
    # past the 16M Mosaic stack limit.
    x = x_ref[:]
    gb, l, d = x.shape
    hidden = w1_ref.shape[1]
    xhat, inv, g32, h32 = _ln_fwd32(
        x.reshape(gb * l, d), g_ref, b_ref, eps
    )
    h = h32.astype(x.dtype)
    dy = dy_ref[:].reshape(gb * l, d)
    _acc(db2_ref, jnp.sum(dy.astype(jnp.float32), axis=0)[None])
    first = pl.program_id(0) == 0
    rows = slice(None)

    def chunk(j, dh):
        c = j * hc
        w1c = w1_ref[rows, pl.ds(c, hc)]  # (d, hc)
        hpre = jax.lax.dot_general(
            h, w1c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[slice(0, 1), pl.ds(c, hc)].astype(jnp.float32)
        hid = jax.nn.gelu(hpre, approximate=True).astype(x.dtype)
        _acc_dyn(dw2_ref, (pl.ds(c, hc), rows), jax.lax.dot_general(
            hid, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), first)
        dhid = jax.lax.dot_general(
            dy, w2_ref[pl.ds(c, hc), rows],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dhpre = (dhid * _gelu_tanh_grad(hpre)).astype(x.dtype)
        _acc_dyn(dw1_ref, (rows, pl.ds(c, hc)), jax.lax.dot_general(
            h, dhpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), first)
        _acc_dyn(db1_ref, (slice(0, 1), pl.ds(c, hc)),
                 jnp.sum(dhpre.astype(jnp.float32), axis=0)[None], first)
        return dh + jax.lax.dot_general(
            dhpre, w1c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dh = jax.lax.fori_loop(
        0, hidden // hc, chunk, jnp.zeros((gb * l, d), jnp.float32)
    )
    dx32, dg, dbl = _ln_bwd32(dh, xhat, inv, g32)
    _acc(dg_ref, dg[None])
    _acc(dbl_ref, dbl[None])
    dx_ref[:] = dy_ref[:] + dx32.astype(x.dtype).reshape(gb, l, d)


def _attn_block_bwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g_ref, b_ref, dy_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg_ref, dbl_ref,
    *, heads,
):
    x = x_ref[:]
    gb, l, d = x.shape
    hd = d // heads
    scale = hd ** -0.5
    xhat, inv, g32, h32 = _ln_fwd32(x.reshape(gb * l, d), g_ref, b_ref)
    h2 = h32.astype(x.dtype)

    def proj(col0):
        out = jax.lax.dot_general(
            h2, wqkv_ref[:, col0 : col0 + d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0, col0 : col0 + d][None]
        return out.astype(x.dtype).reshape(gb, l, d)

    qm, km, vm = proj(0), proj(d), proj(2 * d)
    dy = dy_ref[:].reshape(gb * l, d)
    do3 = jax.lax.dot_general(
        dy, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(gb, l, d)
    _acc(dbo_ref, jnp.sum(dy.astype(jnp.float32), axis=0)[None])
    outs, dqs, dks, dvs = [], [], [], []
    for i in range(heads):
        sl = slice(i * hd, (i + 1) * hd)
        q, k, v = qm[:, :, sl], km[:, :, sl], vm[:, :, sl]
        s = jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pc = p.astype(x.dtype)
        do_h = do3[:, :, sl]
        outs.append(jax.lax.dot_general(
            pc, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
        dvs.append(jax.lax.dot_general(
            pc, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
        dp = jax.lax.dot_general(
            do_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
              * scale).astype(x.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
        dks.append(jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
    o = jnp.concatenate(outs, axis=-1).reshape(gb * l, d)
    _acc(dwo_ref, jax.lax.dot_general(
        o, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ))
    dqkv = jnp.concatenate(
        [jnp.concatenate(dqs, axis=-1), jnp.concatenate(dks, axis=-1),
         jnp.concatenate(dvs, axis=-1)], axis=-1,
    ).reshape(gb * l, 3 * d)
    _acc(dbqkv_ref, jnp.sum(dqkv.astype(jnp.float32), axis=0)[None])
    _acc(dwqkv_ref, jax.lax.dot_general(
        h2, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ))
    dh = jax.lax.dot_general(
        dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx32, dg, dbl = _ln_bwd32(dh, xhat, inv, g32)
    _acc(dg_ref, dg[None])
    _acc(dbl_ref, dbl[None])
    dx_ref[:] = dy_ref[:] + dx32.astype(x.dtype).reshape(gb, l, d)


def _attn_stack_bytes(gb, l, d, hidden_unused=None):
    # calibrated against measured Mosaic stack sizes (16.0M at gb=4,
    # l=145, d=768; 17.1M at gb=2, l=401, d=512).
    return 4 * gb * l * (8 * d + 3 * l)


def _mlp_stack_bytes(gb, l, d, hidden):
    # calibrated: 22.25M at gb=4, l=145, d=768, hidden=3072.
    return int(4 * gb * l * (2 * d + 2.75 * hidden))


# Mosaic's DEFAULT scoped-vmem limit is 16M, but v5e has ~128M physical
# VMEM and the limit is raisable per-kernel (compiler_params
# vmem_limit_bytes — the Mamba kernels already run at 100M). Round 3
# architected the backward fallbacks around the 16M default; with the
# limit raised the fused backwards fit at ViT-B-and-up shapes. The
# planning budget stays below the hard limit to leave room for
# double-buffered IO blocks.
_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = 72 * 1024 * 1024


def _compiler_params(interpret):
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _block_call(kernel, x, weights, extra_kwargs, g_batch, interpret,
                stack_bytes=None):
    b, l, d = x.shape
    gb = g_batch
    if x.dtype.itemsize >= 4:  # f32 doubles VMEM pressure
        gb = max(gb // 2, 1)
    if stack_bytes is not None:
        while gb > 1 and stack_bytes(gb) > _VMEM_BUDGET:
            gb //= 2
    while gb > 1 and b % gb != 0:
        gb //= 2
    specs = [pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0))]
    ws = [w[None] if w.ndim == 1 else w for w in weights]
    for w in ws:
        specs.append(
            pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
        )
    return pl.pallas_call(
        functools.partial(kernel, **extra_kwargs),
        grid=(b // gb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        input_output_aliases={0: 0},  # residual block: reuse x's buffer
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x, *ws)


def _attn_bwd_out_bytes(d):
    # fp32 weight-grad outputs (dwqkv+dbqkv+dwo+dbo+dg+db) resident in
    # scoped VMEM across the sequential grid — single source of truth
    # for BOTH the _fab_bwd branch choice and fused_bwd_fits' gate.
    return 4 * (4 * d * d + 3 * d + d + d + d)


def _attn_bwd_stack_bytes(gb, l, d):
    # bwd holds q/k/v + dq/dk/dv lists + fp32 p/dp/ds per head; the
    # per-head score tensors dominate at long L.
    return 4 * gb * l * (20 * d + 14 * l)


def _mlp_bwd_out_bytes(d, hidden):
    # fp32 weight-grad outputs accumulated across the sequential grid
    # stay resident in scoped VMEM for the WHOLE kernel (dw1+dw2 alone
    # are 8*d*hidden = 18.9M at d=768/hidden=3072 — the round-3
    # "structurally impossible under 16M" wall; fits comfortably now
    # that the kernels request vmem_limit_bytes=_VMEM_LIMIT).
    return 4 * (2 * d * hidden + hidden + 3 * d)


def _mlp_bwd_stack_bytes(gb, l, d, hidden, hc):
    # temp model calibrated against measured Mosaic stacks of the
    # unchunked kernel (19.3M at (1,145,768,3072) incl. its 18.9M of
    # resident outputs); outputs are accounted separately above.
    r = gb * l
    return 20 * r * d + 12 * r * hc + 8 * d * hc


def _mlp_bwd_plan(b, l, d, hidden, g_batch):
    """Pick (g_batch, hidden-chunk) for the fused MLP bwd kernel; larger
    batch blocks first (fewer weight re-fetches), then larger hidden
    chunks (fewer passes). None if temps + resident fp32 weight-grad
    outputs cannot fit the Mosaic scoped-vmem limit."""
    budget = _VMEM_BUDGET - _mlp_bwd_out_bytes(d, hidden)
    if budget <= 0:
        return None
    hcs = [hc for hc in (1024, 512, 256, 128) if hidden % hc == 0]
    if not hcs:
        hcs = [hidden]
    gb = g_batch
    while gb > 1 and b % gb:
        gb //= 2
    while gb >= 1:
        for hc in hcs:
            if _mlp_bwd_stack_bytes(gb, l, d, hidden, hc) <= budget:
                return gb, hc
        gb //= 2
    return None


def _bwd_call(kernel, x, weights, dy, wgrad_shapes, extra_kwargs, g_batch,
              interpret, stack_bytes=None):
    """Run a fused backward kernel: dx is batch-blocked, weight grads are
    fp32 full blocks accumulated across the (sequential) grid."""
    b, l, d = x.shape
    gb = g_batch
    if x.dtype.itemsize >= 4:
        gb = max(gb // 2, 1)
    if stack_bytes is not None:
        while gb > 1 and stack_bytes(gb) > _VMEM_BUDGET:
            gb //= 2
    while gb > 1 and b % gb != 0:
        gb //= 2
    blocked = pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0))
    in_specs = [blocked]
    ws = [w[None] if w.ndim == 1 else w for w in weights]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n))
    in_specs.append(blocked)
    out_shapes = [jax.ShapeDtypeStruct((b, l, d), x.dtype)]
    out_specs = [blocked]
    for shp in wgrad_shapes:
        shp2 = (1, *shp) if len(shp) == 1 else shp
        out_shapes.append(jax.ShapeDtypeStruct(shp2, jnp.float32))
        out_specs.append(
            pl.BlockSpec(shp2, lambda i, n=len(shp2): (0,) * n)
        )
    outs = pl.pallas_call(
        functools.partial(kernel, **extra_kwargs),
        grid=(b // gb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={len(ws) + 1: 0},  # dy buffer becomes dx
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x, *ws, dy)
    dx = outs[0]
    wgrads = [
        g.reshape(shp) for g, shp in zip(outs[1:], wgrad_shapes)
    ]
    return dx, wgrads


def _use_xla_bwd() -> bool:
    return os.environ.get("MIA_VIT_BWD", "").lower() == "xla"


def fused_bwd_fits(b: int, l: int, d: int, hidden: int,
                   g_batch: int = 2) -> bool:
    """True iff BOTH fused backward kernels can compile at these shapes.

    Callers that know gradients will be taken (training mode) should
    skip the fused forward when this is False: the custom-vjp fallback
    is ``jax.vjp`` over the unfused path, which recomputes the whole
    unfused forward inside the backward — measured 5.7x-fwd backward on
    the ViT-B MAE step (tools/profile_mae_step.py) vs ~2x for plain XLA
    AD with saved residuals. Fused fwd + fallback bwd is strictly worse
    than unfused end-to-end whenever this returns False.
    """
    if _attn_bwd_stack_bytes(1, l, d) + _attn_bwd_out_bytes(d) > _VMEM_BUDGET:
        return False
    return _mlp_bwd_plan(b, l, d, hidden, g_batch) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_attn_block(x, wqkv, bqkv, wo, bo, ln_g, ln_b, heads,
                     g_batch=4, interpret=None):
    if interpret is None:
        interpret = _interpret_default()
    l, d = x.shape[1], x.shape[2]
    return _block_call(
        _attn_block_kernel, x, (wqkv, bqkv, wo, bo, ln_g, ln_b),
        {"heads": heads}, g_batch, interpret,
        stack_bytes=lambda gb: _attn_stack_bytes(gb, l, d),
    )


def _fab_fwd(x, wqkv, bqkv, wo, bo, ln_g, ln_b, heads, g_batch, interpret):
    y = fused_attn_block(x, wqkv, bqkv, wo, bo, ln_g, ln_b, heads,
                         g_batch, interpret)
    return y, (x, wqkv, bqkv, wo, bo, ln_g, ln_b)


def _fab_bwd(heads, g_batch, interpret, res, dy):
    x, wqkv, bqkv, wo, bo, ln_g, ln_b = res
    if interpret is None:
        interpret = _interpret_default()
    l, d = x.shape[1], x.shape[2]
    # The bwd kernel keeps the whole recomputed sub-layer live in VMEM
    # plus its fp32 weight-grad outputs (resident across the sequential
    # grid: 16*d^2 + small ~ 9.4M at d=768). The kernels request
    # vmem_limit_bytes=_VMEM_LIMIT, so ViT-B/L and the MAE decoder
    # (L=577) all fit; only outsized shapes fall back to the XLA vjp.
    attn_out = _attn_bwd_out_bytes(d)
    oversize = not interpret and (
        _attn_bwd_stack_bytes(1, l, d) + attn_out > _VMEM_BUDGET
    )
    if _use_xla_bwd() or oversize:
        _, vjp = jax.vjp(
            lambda *a: _attn_unfused(*a, heads=heads),
            x, wqkv, bqkv, wo, bo, ln_g, ln_b,
        )
        return vjp(dy)
    dx, wg = _bwd_call(
        _attn_block_bwd_kernel, x,
        (wqkv, bqkv, wo, bo, ln_g, ln_b), dy,
        [wqkv.shape, bqkv.shape, wo.shape, bo.shape, ln_g.shape,
         ln_b.shape],
        {"heads": heads}, g_batch, interpret,
        stack_bytes=lambda gb: _attn_bwd_stack_bytes(gb, l, d) + attn_out,
    )
    prim = (wqkv, bqkv, wo, bo, ln_g, ln_b)
    return (dx, *(g.astype(p.dtype) for g, p in zip(wg, prim)))


fused_attn_block.defvjp(_fab_fwd, _fab_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mlp_block(x, w1, b1, w2, b2, ln_g, ln_b, g_batch=2,
                    interpret=None, eps=1e-6):
    if interpret is None:
        interpret = _interpret_default()
    l, d = x.shape[1], x.shape[2]
    hidden = w1.shape[1]
    return _block_call(
        _mlp_block_kernel, x, (w1, b1, w2, b2, ln_g, ln_b),
        {"eps": eps},
        g_batch, interpret,
        stack_bytes=lambda gb: _mlp_stack_bytes(gb, l, d, hidden),
    )


def _fmb_fwd(x, w1, b1, w2, b2, ln_g, ln_b, g_batch, interpret, eps):
    y = fused_mlp_block(x, w1, b1, w2, b2, ln_g, ln_b, g_batch, interpret,
                        eps)
    return y, (x, w1, b1, w2, b2, ln_g, ln_b)


def _fmb_bwd(g_batch, interpret, eps, res, dy):
    x, w1, b1, w2, b2, ln_g, ln_b = res
    if interpret is None:
        interpret = _interpret_default()
    b, l, d = x.shape
    hidden = w1.shape[1]
    plan = _mlp_bwd_plan(b, l, d, hidden, g_batch)
    if _use_xla_bwd() or (not interpret and plan is None):
        _, vjp = jax.vjp(
            lambda *a: _mlp_unfused(*a, eps=eps),
            x, w1, b1, w2, b2, ln_g, ln_b,
        )
        return vjp(dy)
    gb, hc = plan if plan is not None else (g_batch, hidden)
    dx, wg = _bwd_call(
        _mlp_block_bwd_kernel, x, (w1, b1, w2, b2, ln_g, ln_b), dy,
        [w1.shape, b1.shape, w2.shape, b2.shape, ln_g.shape, ln_b.shape],
        {"hc": hc, "eps": eps}, gb, interpret,
    )
    prim = (w1, b1, w2, b2, ln_g, ln_b)
    return (dx, *(g.astype(p.dtype) for g, p in zip(wg, prim)))


fused_mlp_block.defvjp(_fmb_fwd, _fmb_bwd)
