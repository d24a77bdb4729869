"""SS2D / VSSM backbone tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.models.vmamba import SS2D, VSSBlock, VSSM


@pytest.mark.slow
def test_ss2d_pallas_matches_ref_backend():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 24))
    m_ref = SS2D(d_model=24, d_state=8, scan_backend="ref")
    params = m_ref.init(jax.random.PRNGKey(1), x)
    y_ref = m_ref.apply(params, x)
    y_pal = SS2D(d_model=24, d_state=8, scan_backend="pallas").apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-3, atol=2e-3
    )
    assert y_ref.shape == x.shape


@pytest.mark.slow
def test_vssm_shapes_and_finite():
    m = VSSM(
        depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), d_state=4,
        scan_backend="ref", drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x)
    pooled = m.apply(params, x)
    assert pooled.shape == (2, 128)
    fmap = m.apply(params, x, pool=False)
    assert fmap.shape == (2, 1, 1, 128)  # 32/4/2/2/2 = 1
    assert bool(jnp.all(jnp.isfinite(pooled)))


def test_vssblock_residual():
    m = VSSBlock(dim=16, d_state=4, scan_backend="ref", mlp_ratio=2.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
