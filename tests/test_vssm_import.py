"""VSSM torch-checkpoint key map: shape parity + forward runs."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from medical_image_analysis_tpu.ckpt.torch_import import vssm_torch_to_flax
from medical_image_analysis_tpu.models.vmamba import VSSM

pytestmark = pytest.mark.slow


def _synthetic_vssm_sd(depths=(1, 1), dims=(16, 32), n=4, ratio=2.0,
                       mlp_ratio=4.0):
    rng = np.random.default_rng(0)
    f = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    sd = {
        "patch_embed.0.weight": f(dims[0], 3, 4, 4),
        "patch_embed.0.bias": f(dims[0]),
        "patch_embed.2.weight": np.ones(dims[0], np.float32),
        "patch_embed.2.bias": np.zeros(dims[0], np.float32),
        "classifier.norm.weight": np.ones(dims[-1], np.float32),
        "classifier.norm.bias": np.zeros(dims[-1], np.float32),
    }
    k = 4
    for s, depth in enumerate(depths):
        dim = dims[s]
        din = int(ratio * dim)
        rank = max(dim // 16, 1)
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}."
            op = p + "op."
            sd[p + "norm.weight"] = np.ones(dim, np.float32)
            sd[p + "norm.bias"] = np.zeros(dim, np.float32)
            sd[op + "in_proj.weight"] = f(2 * din, dim)
            sd[op + "conv2d.weight"] = f(din, 1, 3, 3)
            sd[op + "conv2d.bias"] = f(din)
            sd[op + "x_proj_weight"] = f(k, rank + 2 * n, din)
            sd[op + "dt_projs_weight"] = f(k, din, rank)
            sd[op + "dt_projs_bias"] = f(k, din)
            sd[op + "A_logs"] = f(k * din, n)
            sd[op + "Ds"] = np.ones(k * din, np.float32)
            sd[op + "out_norm.weight"] = np.ones(din, np.float32)
            sd[op + "out_norm.bias"] = np.zeros(din, np.float32)
            sd[op + "out_proj.weight"] = f(dim, din)
            sd[p + "norm2.weight"] = np.ones(dim, np.float32)
            sd[p + "norm2.bias"] = np.zeros(dim, np.float32)
            sd[p + "mlp.fc1.weight"] = f(int(dim * mlp_ratio), dim)
            sd[p + "mlp.fc1.bias"] = f(int(dim * mlp_ratio))
            sd[p + "mlp.fc2.weight"] = f(dim, int(dim * mlp_ratio))
            sd[p + "mlp.fc2.bias"] = f(dim)
        if s < len(depths) - 1:
            d = f"layers.{s}.downsample."
            sd[d + "1.weight"] = f(dims[s + 1], dim, 3, 3)
            sd[d + "1.bias"] = f(dims[s + 1])
            sd[d + "3.weight"] = np.ones(dims[s + 1], np.float32)
            sd[d + "3.bias"] = np.zeros(dims[s + 1], np.float32)
    return sd


def test_vssm_import_shapes_and_forward():
    sd = _synthetic_vssm_sd()
    params = vssm_torch_to_flax(sd, depths=[1, 1])
    model = VSSM(
        depths=(1, 1), dims=(16, 32), d_state=4, scan_backend="ref",
        drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 32, 3)),
        jnp.float32,
    )
    ref_params = model.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_map(jnp.shape, ref_params) == \
        jax.tree_util.tree_map(jnp.shape, params)
    pooled = model.apply(params, x)
    assert pooled.shape == (1, 32)
    assert bool(jnp.all(jnp.isfinite(pooled)))
