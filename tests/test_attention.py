"""Fused attention kernel vs einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.ops.attention import fused_attention


def _ref(q, k, v, mask=None, scale=None):
    hd = q.shape[-1]
    scale = scale or hd**-0.5
    a = jnp.einsum("blhd,bshd->bhls", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if mask is not None:
        a = a + mask[None, None]
    a = jax.nn.softmax(a, axis=-1)
    return jnp.einsum("bhls,bshd->blhd", a.astype(v.dtype), v)


@pytest.mark.parametrize("l", [16, 144])
@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_attention_matches(l, with_mask):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    b, h, hd = 2, 4, 32
    q = jax.random.normal(ks[0], (b, l, h, hd))
    k = jax.random.normal(ks[1], (b, l, h, hd))
    v = jax.random.normal(ks[2], (b, l, h, hd))
    mask = None
    if with_mask:
        mask = jnp.where(jnp.tril(jnp.ones((l, l), bool)), 0.0, -jnp.inf)
    out = fused_attention(q, k, v, mask, group=4)
    ref = _ref(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_fused_attention_fallback_cross():
    # L != S falls back to the einsum path.
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (2, 8, 4, 16))
    k = jax.random.normal(key, (2, 12, 4, 16))
    v = jax.random.normal(key, (2, 12, 4, 16))
    out = fused_attention(q, k, v)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
