"""AR-pretrain VisionMamba tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.models.vision_mamba_ar import (
    VisionMambaAR,
    cluster_causal_mask,
    to_clusters,
)


def test_to_clusters_order():
    # 8x8 grid -> 4 clusters of 16; cluster 0 is the top-left 4x4 block.
    grid = 8
    idx = jnp.arange(grid * grid, dtype=jnp.float32).reshape(1, grid * grid, 1)
    cl = to_clusters(idx, grid)
    assert cl.shape == (1, 4, 16, 1)
    first = np.asarray(cl[0, 0, :, 0]).astype(int)
    expect = [r * grid + c for r in range(4) for c in range(4)]
    np.testing.assert_array_equal(first, expect)


def test_cluster_causal_mask():
    m = cluster_causal_mask(3, tokens=2)
    assert m.shape == (6, 6)
    assert m[0, 2] == -np.inf and m[2, 0] == 0.0 and m[0, 1] == 0.0


@pytest.mark.slow
def test_ar_pretrain_loss_and_grad():
    model = VisionMambaAR(
        patch_size=4, embed_dim=32, depth=2, dec_embed_dim=16, d_state=4,
        dec_heads=2, scan_backend="ref",
    )
    # 32x32 image, patch 4 -> 8x8 grid -> 4 clusters.
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    loss = model.apply(params, x)
    assert bool(jnp.isfinite(loss)) and float(loss) > 0

    g = jax.grad(lambda p: model.apply(p, x))(params)
    assert all(
        bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree_util.tree_leaves(g)
    )


def test_ar_skip_layers():
    m = VisionMambaAR(depth=12)
    assert m.skip == [6, 8, 10, 12]
    assert VisionMambaAR(depth=24).skip == [12, 16, 20, 24]
