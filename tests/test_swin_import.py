"""HF SwinModel weight import: output parity on random weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.ckpt.torch_import import swin_hf_to_flax
from medical_image_analysis_tpu.models.swin import SwinTransformer

pytestmark = pytest.mark.slow


def test_swin_import_matches_hf():
    import torch
    from transformers import SwinConfig, SwinModel

    torch.manual_seed(0)
    cfg = SwinConfig(
        image_size=32, patch_size=4, embed_dim=16, depths=[1, 1],
        num_heads=[2, 2], window_size=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
    )
    hf = SwinModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = swin_hf_to_flax(sd, depths=[1, 1])

    model = SwinTransformer(
        patch_size=4, embed_dim=16, depths=(1, 1), num_heads=(2, 2),
        window_size=4, drop_path_rate=0.0,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            torch.tensor(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
