"""MambaPEFT adapter family (EMRRG mamba_peft.py:44-573 parity).

Each weight-space adapter must (a) be identity at init (zero-init up/B
factor), (b) change the output once its params move, (c) train — grads
flow to the adapter only. additional_scan must widen d_state and be
exactly output-preserving when zero-initialized.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medical_image_analysis_tpu.models.mamba_lm import MambaLM, lm_loss
from medical_image_analysis_tpu.peft.mamba_peft import (
    MambaPEFTConfig,
    effective_d_state,
    init_mamba_peft,
    mamba_peft_trainable_mask,
    merge_mamba_peft,
)

pytestmark = pytest.mark.slow

V, D, DEPTH, N = 64, 16, 2, 4


def _model(d_state=N, peft_cfg=None):
    return MambaLM(
        vocab_size=V, d_model=D, depth=DEPTH, d_state=d_state,
        scan_backend="ref", peft_cfg=peft_cfg,
    )


@pytest.fixture(scope="module")
def base():
    model = _model()
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, V, (2, 12)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), ids)
    return model, params, ids


WEIGHT_ADAPTERS = [
    "lora_out_proj", "lora_in_proj", "lora_X", "lora_Z", "lora_x_proj",
    "lora_d", "lora_B", "lora_C", "lora_dt", "lora_conv1d",
]


@pytest.mark.parametrize("name", WEIGHT_ADAPTERS)
def test_lora_adapter_identity_then_active(base, name):
    model, params, ids = base
    cfg = MambaPEFTConfig(**{name: True})
    peft = init_mamba_peft(jax.random.PRNGKey(1), params, cfg)
    assert any("|" + name in k for k in peft), sorted(peft)
    merged = merge_mamba_peft(params, peft, cfg)
    y0 = model.apply(params, ids)
    y1 = model.apply(merged, ids)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    # perturb the zero factor -> output moves; grads reach the adapter.
    peft2 = jax.tree_util.tree_map(
        lambda x: x + 0.05 if x.ndim >= 2 else x, peft
    )
    y2 = model.apply(merge_mamba_peft(params, peft2, cfg), ids)
    assert float(jnp.max(jnp.abs(y2 - y0))) > 1e-6

    def loss(pf):
        logits = model.apply(merge_mamba_peft(params, pf, cfg), ids)
        return lm_loss(logits, ids, jnp.ones_like(ids))

    g = jax.grad(loss)(peft2)
    gnorm = sum(
        float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(g)
    )
    assert gnorm > 0


def test_learnable_v2_deltas(base):
    model, params, ids = base
    cfg = MambaPEFTConfig(
        learnable_A=True, learnable_A_v2=True,
        learnable_D=True, learnable_D_v2=True,
        learnable_conv1d=True, learnable_conv1d_v2=True,
        learnable_bias=True, learnable_bias_v2=True,
    )
    peft = init_mamba_peft(jax.random.PRNGKey(1), params, cfg)
    names = {k.split("|")[1] for k in peft}
    assert names == {
        "learnable_A", "learnable_D", "learnable_conv1d", "learnable_bias"
    }
    merged = merge_mamba_peft(params, peft, cfg)
    np.testing.assert_allclose(
        np.asarray(model.apply(merged, ids)),
        np.asarray(model.apply(params, ids)), atol=1e-6,
    )
    peft2 = jax.tree_util.tree_map(lambda x: x + 0.03, peft)
    y2 = model.apply(merge_mamba_peft(params, peft2, cfg), ids)
    assert float(jnp.max(jnp.abs(y2 - model.apply(params, ids)))) > 1e-6


def test_learnable_v1_mask(base):
    _, params, _ = base
    cfg = MambaPEFTConfig(learnable_A=True, learnable_D=True)
    mask = mamba_peft_trainable_mask(params, cfg)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    assert any(v for k, v in flat.items() if k.endswith("A_log"))
    assert any(v for k, v in flat.items() if k.endswith("/D"))
    assert not any(
        v for k, v in flat.items() if "in_proj" in k or "embed" in k
    )


@pytest.mark.parametrize("pos", ["suffix", "prefix"])
def test_additional_scan(base, pos):
    model, params, ids = base
    cfg = MambaPEFTConfig(
        additional_scan=True, scan_addition_num=2, scan_addition_pos=pos,
        zero_init_x_proj=True,
    )
    peft = init_mamba_peft(jax.random.PRNGKey(1), params, cfg)
    merged = merge_mamba_peft(params, peft, cfg)
    wide = _model(d_state=effective_d_state(cfg, N))
    a_shape = merged["params"]["layers_0"]["mixer"]["A_log"].shape
    assert a_shape[-1] == N + 2
    # zero-init B rows -> the extra states carry nothing: exact parity.
    y_wide = wide.apply(merged, ids)
    y_base = model.apply(params, ids)
    np.testing.assert_allclose(
        np.asarray(y_wide), np.asarray(y_base), atol=1e-5
    )
    # train the addition (random-init B/C rows, the reference default):
    # grads must flow into the new columns.
    cfg_t = dataclasses.replace(cfg, zero_init_x_proj=False)
    peft_t = init_mamba_peft(jax.random.PRNGKey(2), params, cfg_t)

    def loss(pf):
        logits = wide.apply(merge_mamba_peft(params, pf, cfg_t), ids)
        return lm_loss(logits, ids, jnp.ones_like(ids))

    g = jax.grad(loss)(peft_t)
    g0 = g["params/layers_0/mixer/|scan_addi"]
    assert float(jnp.sum(jnp.abs(g0["A_log_addi"]))) > 0
    assert float(jnp.sum(jnp.abs(g0["x_proj_addi"]))) > 0


def test_activation_adapters_train():
    cfg = MambaPEFTConfig(
        adaptformer=True, dim_adaptf=8,
        prompt_tuning=True, prompt_num_tokens=2,
        prefix_tuning=True, num_virtual_tokens=1,
    )
    model = _model(peft_cfg=cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, V, (2, 12)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 12, V)
    p = params["params"]
    assert "prompt_encoder" in p and "prefix_encoder" in p
    assert "adaptf_down_0" in p

    def loss(pp):
        return lm_loss(model.apply(pp, ids), ids, jnp.ones_like(ids))

    g = jax.grad(loss)(params)["params"]
    assert float(jnp.sum(jnp.abs(g["prompt_encoder"]))) > 0
    assert float(jnp.sum(jnp.abs(g["prefix_encoder"]))) > 0
    # up is zero-init (identity at start) -> its grad moves first.
    assert float(jnp.sum(jnp.abs(g["adaptf_up_0"]["kernel"]))) > 0


def test_composes_with_partial_x_rule(base):
    """The MambaPEFT lora_X is the EMRRG partial-X rule's generalisation;
    both coexist on one tree (T11/EMRRG composition)."""
    from medical_image_analysis_tpu.peft.lora import (
        apply_lora,
        init_lora,
        mamba_partial_x_rules,
    )

    model, params, ids = base
    cfg = MambaPEFTConfig(lora_dt=True)
    peft = init_mamba_peft(jax.random.PRNGKey(1), params, cfg)
    rules = mamba_partial_x_rules(d_inner=2 * D, rank=2)
    lora = init_lora(jax.random.PRNGKey(2), params, rules)
    merged = merge_mamba_peft(apply_lora(params, lora, rules), peft, cfg)
    y = model.apply(merged, ids)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_vision_qv_lora_slices():
    """vis_use_lora analog: two adapters per fused qkv kernel, deltas
    land only in the q and v column thirds (k untouched)."""
    import jax
    import jax.numpy as jnp

    from medical_image_analysis_tpu.peft.lora import (
        apply_lora,
        init_lora,
        vision_qv_rules,
    )

    d = 6
    params = {"vision": {"swin": {"blk": {"attn": {"qkv": {
        "kernel": jnp.zeros((4, 3 * d))}}}}}}
    rules = vision_qv_rules(rank=2)
    lora = init_lora(jax.random.PRNGKey(0), params, rules)
    path = "vision/swin/blk/attn/qkv/kernel"
    assert path in lora and f"{path}@1" in lora
    assert lora[path]["b"].shape == (2, d)
    # force nonzero deltas
    lora = {
        k: {"a": jnp.ones_like(v["a"]), "b": jnp.ones_like(v["b"])}
        for k, v in lora.items()
    }
    merged = apply_lora(params, lora, rules)
    kern = merged["vision"]["swin"]["blk"]["attn"]["qkv"]["kernel"]
    assert float(jnp.abs(kern[:, :d]).sum()) > 0        # q slice
    assert float(jnp.abs(kern[:, d:2 * d]).sum()) == 0  # k untouched
    assert float(jnp.abs(kern[:, 2 * d:]).sum()) > 0    # v slice


def test_fit_mrg_vision_lora_and_freeze(tmp_path):
    """Recipe smoke: train.lora_vision freezes the vision base and
    trains adapters on the swin qkv (plus train.freeze_vision alone)."""
    import jax.numpy as jnp

    from medical_image_analysis_tpu.configs.config import make_config
    from medical_image_analysis_tpu.train.loop import fit

    cfg = make_config({
        "data": {"dataset": "synthetic", "batch_size": 4,
                 "input_size": 32, "max_len": 16, "vocab_min_freq": 1},
        "model": {
            "task": "r2gengpt", "vision": "swin",
            "vision_kwargs": dict(embed_dim=8, depths=(1, 1),
                                  num_heads=(2, 2), window_size=4,
                                  drop_path_rate=0.0),
            "llm_kwargs": dict(dim=32, n_layers=1, n_heads=4,
                               n_kv_heads=4, hidden_dim=64,
                               dtype=jnp.float32),
        },
        "train": {"epochs": 1, "lr": 1e-3, "warmup_steps": 2,
                  "log_every": 100, "save_dir": str(tmp_path),
                  "lora_vision": True},
        "generate": {"num_beams": 1, "max_new_tokens": 4,
                     "min_new_tokens": 1, "max_cache_len": 160},
    })
    scores = fit(cfg)
    assert "Bleu_4" in scores


def test_vision_lora_partial_x_on_arm_tower():
    """EMRRG --lora_X analog: on an SSM vision tower, train.lora_vision
    lands adapters on the in_proj X half (first half of xz columns)."""
    import jax
    import jax.numpy as jnp

    from medical_image_analysis_tpu.peft.lora import (
        apply_lora,
        init_lora,
        vision_qv_rules,
    )

    d = 8
    params = {"vision": {"layers_0": {"mixer": {"in_proj": {
        "kernel": jnp.zeros((d, 2 * d))}}}}}
    rules = vision_qv_rules(rank=2)
    lora = init_lora(jax.random.PRNGKey(0), params, rules)
    path = "vision/layers_0/mixer/in_proj/kernel"
    assert list(lora) == [path]
    assert lora[path]["b"].shape == (2, d)  # X half only
    lora[path] = {"a": jnp.ones((d, 2)), "b": jnp.ones((2, d))}
    merged = apply_lora(params, lora, rules)
    kern = merged["vision"]["layers_0"]["mixer"]["in_proj"]["kernel"]
    assert float(jnp.abs(kern[:, :d]).sum()) > 0   # X columns adapted
    assert float(jnp.abs(kern[:, d:]).sum()) == 0  # Z gate untouched
