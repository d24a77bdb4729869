"""ARM torch-checkpoint key map: structural/shape parity + forward runs.

(The reference ARM needs mamba_ssm CUDA to instantiate, so unlike the
Llama/Swin import tests this checks the key/shape mapping on a synthetic
state dict with the reference's exact naming/shape conventions, then runs
our model with the imported params.)
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from medical_image_analysis_tpu.ckpt.torch_import import (
    arm_torch_to_flax,
    replicate_dir_weights,
)
from medical_image_analysis_tpu.models.mamba import ARM

pytestmark = pytest.mark.slow


def _synthetic_arm_sd(depth=1, d=24, din=24, n=4, rank=2, patches=16):
    # din == d: the reference ARM runs its mixers at expand=1
    # (models_mamba.py:151), so d_inner equals embed_dim.
    rng = np.random.default_rng(0)
    f = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    sd = {
        "patch_embed.proj.weight": f(d, 3, 8, 8),
        "patch_embed.proj.bias": f(d),
        "cls_token": f(1, 1, d),
        "pos_embed": f(1, patches + 1, d),
        "norm_f.weight": np.ones(d, np.float32),
        "norm_f.bias": np.zeros(d, np.float32),
    }
    for i in range(depth):
        sd[f"layers.{i}.norm.weight"] = np.ones(d, np.float32)
        p = f"layers.{i}.mixer"
        sd[f"{p}.in_proj.weight"] = f(2 * din, d)
        sd[f"{p}.out_proj.weight"] = f(d, din)
        for s in ("", "_b", "_c", "_c_b"):
            sd[f"{p}.conv1d{s}.weight"] = f(din, 1, 4)
            sd[f"{p}.conv1d{s}.bias"] = f(din)
            sd[f"{p}.x_proj{s}.weight"] = f(rank + 2 * n, din)
            sd[f"{p}.dt_proj{s}.weight"] = f(din, rank)
            sd[f"{p}.dt_proj{s}.bias"] = f(din)
            sd[f"{p}.A{s}_log"] = f(din, n)
            sd[f"{p}.D{s}"] = np.ones(din, np.float32)
    return sd


def test_arm_import_shapes_and_forward():
    sd = _synthetic_arm_sd()
    params = arm_torch_to_flax(sd, depth=1)
    model = ARM(
        patch_size=8, embed_dim=24, depth=1, d_state=4,
        scan_backend="ref", drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 32, 3)),
        jnp.float32,
    )
    ref_params = model.init(jax.random.PRNGKey(0), x)
    # identical tree structure and shapes
    ref_shapes = jax.tree_util.tree_map(jnp.shape, ref_params)
    got_shapes = jax.tree_util.tree_map(jnp.shape, params)
    assert ref_shapes == got_shapes
    y = model.apply(params, x)
    assert y.shape == (1, 17, 24)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_replicate_then_import():
    # Stage-1 checkpoints have only the uni-direction weights; the
    # surgery (MambaXrayVL_CLIP.py:37-60) replicates them to 4 dirs.
    sd = _synthetic_arm_sd()
    uni = {
        k: v for k, v in sd.items()
        if not any(t in k for t in ("_b.", "_c.", "_c_b.",
                                    "A_b", "A_c", "D_b", "D_c"))
    }
    full = replicate_dir_weights(uni)
    params = arm_torch_to_flax(full, depth=1)
    conv = np.asarray(params["params"]["layers_0"]["mixer"]["conv_w"])
    np.testing.assert_allclose(conv[0], conv[1])  # replicated
