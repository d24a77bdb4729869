"""Mamba mixer / block / ARM backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.models.mamba import (
    ARM,
    MambaBlock,
    MambaMixer,
    build_arm,
)


def test_mixer_pallas_matches_ref_backend():
    mixer_kwargs = dict(
        d_model=32, d_state=8, bimamba_type="v3", if_devide_out=True
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 32))  # 16 patches + cls
    m_ref = MambaMixer(**mixer_kwargs, scan_backend="ref")
    params = m_ref.init(jax.random.PRNGKey(1), x, cls_pos=8)
    y_ref = m_ref.apply(params, x, cls_pos=8)
    m_pal = MambaMixer(**mixer_kwargs, scan_backend="pallas")
    y_pal = m_pal.apply(params, x, cls_pos=8)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-3, atol=2e-3
    )


def test_mixer_unidirectional_is_causal():
    m = MambaMixer(d_model=16, d_state=4, bimamba_type="none", scan_backend="ref")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    y1 = m.apply(params, x)
    x2 = x.at[:, 8:].set(99.0)  # perturb the future
    y2 = m.apply(params, x2)
    # conv has receptive field d_conv-1=3 into the past; outputs strictly
    # before t=8 must be identical.
    np.testing.assert_allclose(
        np.asarray(y1[:, :8]), np.asarray(y2[:, :8]), rtol=1e-5, atol=1e-5
    )


def test_block_and_arm_shapes():
    arm = ARM(
        patch_size=4, embed_dim=48, depth=2, d_state=4, scan_backend="ref",
        drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = arm.init(jax.random.PRNGKey(1), x)
    y = arm.apply(params, x)
    assert y.shape == (2, 17, 48)  # 16 patches + middle cls
    assert bool(jnp.all(jnp.isfinite(y)))


def test_arm_registry():
    m = build_arm("arm_base_pz16", depth=1)
    assert m.embed_dim == 768 and m.depth == 1


@pytest.mark.slow
def test_arm_gradients_finite():
    arm = ARM(
        patch_size=4, embed_dim=32, depth=1, d_state=4, scan_backend="ref",
        drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    params = arm.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return jnp.sum(arm.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(leaf))) for leaf in leaves)
    assert any(float(jnp.max(jnp.abs(leaf))) > 0 for leaf in leaves)
