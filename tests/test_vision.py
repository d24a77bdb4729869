"""Swin / ViT / MAE backbone tests."""

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.models.swin import (
    SwinCheX,
    SwinTransformer,
    window_partition,
    window_reverse,
)
from medical_image_analysis_tpu.models.vit import (
    MAE,
    ViT,
    patchify,
    random_masking,
    region_masking,
    unpatchify,
)


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 4)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_swin_forward():
    m = SwinTransformer(
        embed_dim=24, depths=(2, 2), num_heads=(2, 4), window_size=4,
        drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(params, x)
    assert y.shape == (2, 16, 48)  # 32/4=8 -> merge -> 4x4, dim 48
    assert bool(jnp.all(jnp.isfinite(y)))


def test_swinchex_heads():
    backbone = SwinTransformer(
        embed_dim=16, depths=(1, 1), num_heads=(2, 2), window_size=4,
        drop_path_rate=0.0,
    )
    m = SwinCheX(backbone=backbone, num_classes=14, num_mlp_heads=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x)
    logits = m.apply(params, x)
    assert logits.shape == (2, 14, 2)


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    p = patchify(x, 4)
    assert p.shape == (2, 16, 48)
    back = unpatchify(p, 4, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_random_masking_properties():
    x = jnp.arange(2 * 16 * 4, dtype=jnp.float32).reshape(2, 16, 4)
    keep, mask, ids_restore = random_masking(jax.random.PRNGKey(0), x, 0.75)
    assert keep.shape == (2, 4, 4)
    assert mask.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(mask.sum(axis=1)), [12, 12])


def test_region_masking_ratios():
    x = jnp.zeros((1, 64, 4))  # 8x8 grid
    keep, mask, _ = region_masking(jax.random.PRNGKey(0), x, 0.5, 1.0)
    # interior patches (label box) fully masked; exterior half kept.
    assert keep.shape[1] == int(mask.shape[1] - mask.sum())


def test_mae_end_to_end():
    m = MAE(
        patch_size=4, in_chans=1, embed_dim=32, depth=2, num_heads=2,
        decoder_embed_dim=24, decoder_depth=1, decoder_num_heads=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    params = m.init(
        {"params": jax.random.PRNGKey(1)}, x, rng=jax.random.PRNGKey(2)
    )
    loss, pred, mask = m.apply(params, x, rng=jax.random.PRNGKey(3))
    assert pred.shape == (2, 16, 16)  # L=16 patches, p*p*c=16
    assert float(loss) > 0 and bool(jnp.isfinite(loss))
    # region masking path
    loss2, _, _ = m.apply(
        params, x, rng=jax.random.PRNGKey(4), mask_type="region",
        mask_ratio=0.5, mask_ratio_inner=0.9,
    )
    assert bool(jnp.isfinite(loss2))


def test_vit_tokens():
    m = ViT(patch_size=4, embed_dim=32, depth=2, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(params, x)
    assert y.shape == (2, 17, 32)
