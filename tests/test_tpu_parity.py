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
