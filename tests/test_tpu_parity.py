"""On-chip compiled-kernel parity subset (VERDICT round-2 item 7).

Runs ONLY with ``MIA_TEST_BACKEND=tpu`` (real chip): asserts the
Mosaic-COMPILED kernels (not interpret mode) against the jnp oracle —
scan fwd/bwd, the fused multi-direction Mamba layer, and one fused ViT
block. Keep this fast (one compile each): it is executed once per round
and recorded in BENCH.md/PROGRESS.

    MIA_TEST_BACKEND=tpu python -m pytest tests/test_tpu_parity.py -q
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("MIA_TEST_BACKEND", "cpu") != "tpu"
    or jax.default_backend() != "tpu",
    reason="needs MIA_TEST_BACKEND=tpu and a real TPU",
)


def _scan_inputs(b=2, l=256, d=128, n=16, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((b, l, d)).astype(np.float32)
    delta = (rng.standard_normal((b, l, d)) * 0.1).astype(np.float32)
    a = -np.exp(rng.standard_normal((d, n)) * 0.5).astype(np.float32)
    bm = rng.standard_normal((b, l, n)).astype(np.float32)
    cm = rng.standard_normal((b, l, n)).astype(np.float32)
    dd = rng.standard_normal((d,)).astype(np.float32)
    bias = (rng.standard_normal((d,)) * 0.1).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (u, delta, a, bm, cm, dd, bias))


def test_compiled_scan_fwd_bwd_matches_oracle():
    from medical_image_analysis_tpu.ops.selective_scan import (
        selective_scan,
        selective_scan_ref,
    )

    u, delta, a, bm, cm, dd, bias = _scan_inputs()

    def f(backend):
        def loss(args):
            y = selective_scan(*args, delta_softplus=True, backend=backend)
            return (y * jnp.cos(y)).sum(), y

        (val, y), grads = jax.value_and_grad(loss, has_aux=True)(
            (u, delta, a, bm, cm, dd, bias)
        )
        return y, val, grads

    y_p, v_p, g_p = jax.jit(lambda: f("pallas"))()
    y_r, v_r, g_r = f("ref")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r),
                               rtol=2e-4, atol=2e-4)
    for gp, gr in zip(jax.tree_util.tree_leaves(g_p),
                      jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=5e-3, atol=5e-3)


def test_compiled_fused_mamba_layer_matches_ref_backend():
    from medical_image_analysis_tpu.models.mamba import MambaMixer

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 65, 64)).astype(np.float32))
    fused = MambaMixer(d_model=64, d_state=16, expand=2,
                       bimamba_type="v3", if_devide_out=True,
                       scan_backend="fused")
    ref = MambaMixer(d_model=64, d_state=16, expand=2,
                     bimamba_type="v3", if_devide_out=True,
                     scan_backend="ref")
    params = ref.init(jax.random.PRNGKey(0), x, 32)
    y_f = np.asarray(jax.jit(
        lambda p, xx: fused.apply(p, xx, 32)
    )(params, x))
    y_r = np.asarray(ref.apply(params, x, 32))
    np.testing.assert_allclose(y_f, y_r, rtol=3e-3, atol=3e-3)


def test_compiled_vit_block_matches_unfused():
    from medical_image_analysis_tpu.models.vit import TransformerBlock

    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((2, 128, 128)).astype(jnp.bfloat16)
    )
    fused = TransformerBlock(dim=128, num_heads=4, fused=True)
    plain = TransformerBlock(dim=128, num_heads=4, fused=False)
    params = plain.init(jax.random.PRNGKey(0), x)
    y_f = np.asarray(
        jax.jit(lambda p, xx: fused.apply(p, xx))(params, x)
    ).astype(np.float32)
    y_p = np.asarray(plain.apply(params, x)).astype(np.float32)
    np.testing.assert_allclose(y_f, y_p, rtol=5e-2, atol=5e-2)

    # gradients: the compiled fused BACKWARD kernels (round 3) vs the
    # unfused XLA vjp, params and input together.
    def loss(mod):
        def f(p, xx):
            return jnp.mean(mod.apply(p, xx).astype(jnp.float32) ** 2)
        return f

    g_f = jax.jit(jax.grad(loss(fused), argnums=(0, 1)))(params, x)
    g_p = jax.jit(jax.grad(loss(plain), argnums=(0, 1)))(params, x)
    for gf, gp in zip(jax.tree_util.tree_leaves(g_f),
                      jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gp, np.float32),
            rtol=5e-2, atol=5e-3,
        )


def test_compiled_swin_window_attn_matches_unfused():
    """Mosaic-compiled fused Swin window attention (round 3) vs the XLA
    path, masked (shifted, mask index-map cycling) and unmasked."""
    from medical_image_analysis_tpu.models.swin import _shift_attn_mask
    from medical_image_analysis_tpu.ops.swin_block import (
        _swin_attn_unfused,
        fused_swin_attn_block,
    )

    rng = np.random.default_rng(3)
    h = w = 14
    ws, shift, heads, d = 7, 3, 4, 128
    nw = (h // ws) * (w // ws)
    l = ws * ws
    x = jnp.asarray(
        rng.standard_normal((2 * nw, l, d)).astype(jnp.bfloat16)
    )
    args = [
        jnp.asarray(a.astype(np.float32)).astype(jnp.bfloat16)
        for a in (
            rng.standard_normal((d, 3 * d)) * 0.05,
            rng.standard_normal(3 * d) * 0.02,
            rng.standard_normal((d, d)) * 0.05,
            rng.standard_normal(d) * 0.02,
            1 + 0.1 * rng.standard_normal(d),
            0.1 * rng.standard_normal(d),
        )
    ]
    bias = jnp.asarray(
        rng.standard_normal((heads, l, l)) * 0.1, jnp.float32
    )
    for mask in (
        jnp.zeros((1, l, l), jnp.float32),
        jnp.asarray(_shift_attn_mask(h, w, ws, shift)),
    ):
        y_f = jax.jit(
            lambda xx, m=mask: fused_swin_attn_block(
                xx, *args, bias, m, heads, 1e-5, 2
            )
        )(x)
        y_p = _swin_attn_unfused(x, *args, bias, mask, heads)
        np.testing.assert_allclose(
            np.asarray(y_f, np.float32), np.asarray(y_p, np.float32),
            rtol=5e-2, atol=5e-2,
        )


def test_compiled_scan_n1_fwd_bwd_matches_oracle():
    """Batch-packed d_state=1 kernel, COMPILED (Mosaic), fwd + grads vs
    the exact fp32 jnp oracle.  The compiled kernel is bit-identical to
    interpret mode (round-5 bisect); residual tolerance covers only the
    oracle's own default-precision einsums.  This test also guards the
    layout-pinning barriers in scan_n1.py: without them XLA propagates
    the merge/VJP transpose layouts into the Mosaic result buffers and
    errors reach O(0.6) absolute."""
    from medical_image_analysis_tpu.ops.scan_n1 import scan_n1_dirs
    from medical_image_analysis_tpu.ops.selective_scan import (
        selective_scan_ref,
    )

    rng = np.random.default_rng(0)
    b, l, d, rank = 8, 196, 128, 8

    def f(*shape, scale=0.4):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr, xc = f(b, l, d), f(b, l, d)
    p = dict(
        x_proj_w=f(4, rank + 2, d),
        dt_proj_w=f(4, d, rank),
        dt_bias=f(4, d, scale=0.2),
        A=-jnp.exp(f(4, d, 1, scale=0.3)),
        D=f(4, d),
    )

    def oracle(xr, xc, p):
        srcs, revs = (xr, xc, xr, xc), (False, False, True, True)
        ys = []
        for k in range(4):
            u = srcs[k]
            if revs[k]:
                u = jnp.flip(u, axis=1)
            x_dbl = jnp.einsum("bld,cd->blc", u, p["x_proj_w"][k])
            dt = jnp.einsum(
                "blr,dr->bld", x_dbl[..., :rank], p["dt_proj_w"][k]
            )
            y = selective_scan_ref(
                u, dt, p["A"][k], x_dbl[..., rank : rank + 1],
                x_dbl[..., rank + 1 :], p["D"][k], p["dt_bias"][k],
                delta_softplus=True,
            )
            ys.append(jnp.flip(y, axis=1) if revs[k] else y)
        return jnp.stack(ys, axis=1)

    w = f(4, l, d)

    def loss_k(xr, xc, p):
        return jnp.sum(
            scan_n1_dirs(xr, xc, **p, interpret=False) * w[None]
        )

    def loss_o(xr, xc, p):
        return jnp.sum(oracle(xr, xc, p) * w[None])

    # args-style jit (NOT closure constants): the persistent compile
    # cache can serve a stale executable for no-arg closure jits.
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(xr, xc, p)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(xr, xc, p)
    y_k = jax.jit(
        lambda xr, xc, p: scan_n1_dirs(xr, xc, **p, interpret=False)
    )(xr, xc, p)
    y_o = np.asarray(oracle(xr, xc, p))
    # Scale-aware bounds: the kernel's dt matmuls round operands to
    # bf16 (fp32 accumulate); vs the oracle's matmuls that compounds to
    # ~3e-3 of tensor scale in the weight grads (measured 2.7e-3).
    # The two miscompile classes this test guards against sat at
    # ~2e-2 of scale (fwd) and ~3e-3 absolute at near-zero elements —
    # both far above these bounds.
    err = np.abs(np.asarray(y_k) - y_o).max()
    assert err <= 1e-3 * np.abs(y_o).max() + 1e-4, f"fwd err {err}"
    for a, b_ in zip(jax.tree_util.tree_leaves(gk),
                     jax.tree_util.tree_leaves(go)):
        a, b_ = np.asarray(a), np.asarray(b_)
        e = np.abs(a - b_).max()
        bound = 5e-3 * np.abs(b_).max() + 1e-4
        assert e <= bound, f"grad err {e} > {bound} (shape {a.shape})"


def test_compiled_scan_n1_sources_matches_dirs():
    """The merged per-source entry point (scan_n1_sources: in-kernel
    direction accumulation via input_output_aliases), COMPILED, fwd +
    grads vs the per-direction kernel it replaces in SS2D.  Guards the
    aliased-accumulation launches against the same layout-propagation
    class the per-direction test pins."""
    from medical_image_analysis_tpu.ops.scan_n1 import (
        scan_n1_dirs, scan_n1_sources,
    )

    rng = np.random.default_rng(3)
    b, l, d, rank = 8, 196, 128, 8

    def f(*shape, scale=0.4):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr, xc = f(b, l, d), f(b, l, d)
    p = dict(
        x_proj_w=f(4, rank + 2, d),
        dt_proj_w=f(4, d, rank),
        dt_bias=f(4, d, scale=0.2),
        A=-jnp.exp(f(4, d, 1, scale=0.3)),
        D=f(4, d),
    )
    wr, wc = f(l, d), f(l, d)

    def loss_s(xr, xc, p):
        y_row, y_col = scan_n1_sources(xr, xc, **p, interpret=False)
        return jnp.sum(y_row * wr) + jnp.sum(y_col * wc)

    def loss_d(xr, xc, p):
        y = scan_n1_dirs(xr, xc, **p, interpret=False)
        return jnp.sum((y[:, 0] + y[:, 2]) * wr) + jnp.sum(
            (y[:, 1] + y[:, 3]) * wc
        )

    ys = jax.jit(
        lambda xr, xc, p: scan_n1_sources(xr, xc, **p, interpret=False)
    )(xr, xc, p)
    yd = jax.jit(
        lambda xr, xc, p: scan_n1_dirs(xr, xc, **p, interpret=False)
    )(xr, xc, p)
    for got, want in ((ys[0], yd[:, 0] + yd[:, 2]),
                      (ys[1], yd[:, 1] + yd[:, 3])):
        e = np.abs(np.asarray(got) - np.asarray(want)).max()
        bound = 1e-3 * np.abs(np.asarray(want)).max() + 1e-4
        assert e <= bound, f"fwd err {e} > {bound}"
    gs = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2)))(xr, xc, p)
    gd = jax.jit(jax.grad(loss_d, argnums=(0, 1, 2)))(xr, xc, p)
    for a, b_ in zip(jax.tree_util.tree_leaves(gs),
                     jax.tree_util.tree_leaves(gd)):
        a, b_ = np.asarray(a), np.asarray(b_)
        e = np.abs(a - b_).max()
        bound = 3e-3 * np.abs(b_).max() + 1e-4
        assert e <= bound, f"grad err {e} > {bound} (shape {a.shape})"
