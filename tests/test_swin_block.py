"""Fused Swin window-attention kernel (ops/swin_block.py) vs the
unfused XLA path — both through the raw op and through the
WindowAttention module (interpret mode off-TPU)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.models.swin import (
    SwinTransformer,
    WindowAttention,
    _shift_attn_mask,
)
from medical_image_analysis_tpu.ops.swin_block import (
    _swin_attn_unfused,
    fused_swin_attn_block,
)


def _mats(rng, d, heads, l):
    return dict(
        wqkv=jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32),
        bqkv=jnp.asarray(rng.standard_normal(3 * d) * 0.02, jnp.float32),
        wo=jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32),
        bo=jnp.asarray(rng.standard_normal(d) * 0.02, jnp.float32),
        ln_g=jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32),
        ln_b=jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32),
        bias=jnp.asarray(
            rng.standard_normal((heads, l, l)) * 0.1, jnp.float32
        ),
    )


def test_kernel_matches_unfused_unshifted():
    rng = np.random.default_rng(0)
    bn, l, d, heads = 8, 49, 128, 4
    x = jnp.asarray(rng.standard_normal((bn, l, d)), jnp.float32)
    m = _mats(rng, d, heads, l)
    mask = jnp.zeros((1, l, l), jnp.float32)
    got = fused_swin_attn_block(
        x, m["wqkv"], m["bqkv"], m["wo"], m["bo"], m["ln_g"], m["ln_b"],
        m["bias"], mask, heads,
    )
    want = _swin_attn_unfused(
        x, m["wqkv"], m["bqkv"], m["wo"], m["bo"], m["ln_g"], m["ln_b"],
        m["bias"], mask, heads,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_kernel_matches_unfused_shifted_mask_cycling():
    """The i -> i %% (nW/gb) mask index map must line every row up with
    its in-image window's mask (2 images x 4 windows here)."""
    rng = np.random.default_rng(1)
    h = w = 14
    ws, shift, heads, d = 7, 3, 2, 128
    nw = (h // ws) * (w // ws)
    l = ws * ws
    bn = 2 * nw
    x = jnp.asarray(rng.standard_normal((bn, l, d)), jnp.float32)
    m = _mats(rng, d, heads, l)
    mask = jnp.asarray(_shift_attn_mask(h, w, ws, shift))
    got = fused_swin_attn_block(
        x, m["wqkv"], m["bqkv"], m["wo"], m["bo"], m["ln_g"], m["ln_b"],
        m["bias"], mask, heads, 1e-5, 2,  # g_batch=2 < nW exercises cycling
    )
    want = _swin_attn_unfused(
        x, m["wqkv"], m["bqkv"], m["wo"], m["bo"], m["ln_g"], m["ln_b"],
        m["bias"], mask, heads,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_window_attention_module_fused_equals_unfused():
    rng = np.random.default_rng(2)
    bn, l, d, heads = 4, 49, 128, 4
    x = jnp.asarray(rng.standard_normal((bn, l, d)), jnp.float32)
    ln = (
        jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32),
        jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32),
    )
    mod = WindowAttention(d, heads, 7)
    params = mod.init(jax.random.PRNGKey(0), x, None, ln, False)
    out_ref = mod.apply(params, x, None, ln, False)
    out_fused = mod.apply(params, x, None, ln, True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


@pytest.mark.slow
def test_swin_transformer_forward_and_grad_still_work():
    """Param tree unchanged (import-map names) and AD path green."""
    rng = jax.random.PRNGKey(0)
    model = SwinTransformer(
        embed_dim=32, depths=(2, 1), num_heads=(2, 4), window_size=4
    )
    x = jax.random.normal(rng, (1, 32, 32, 3))
    params = model.init(rng, x)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = {"/".join(str(getattr(k, "key", k)) for k in p)
             for p, _ in flat}
    assert any("attn/qkv/kernel" in p for p in paths)
    assert any("norm1/scale" in p for p in paths)
    loss = lambda p: jnp.sum(model.apply(p, x) ** 2)  # noqa: E731
    g = jax.grad(loss)(params)
    assert all(
        bool(jnp.isfinite(leaf).all())
        for leaf in jax.tree_util.tree_leaves(g)
    )
