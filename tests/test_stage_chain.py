"""The reference's 3-stage pipeline chained INSIDE the framework:
AR pretrain -> CLIP align -> downstream SFT via model.vision_init
(MambaXrayVL_CLIP.py:44-66 / MambaXrayVL_DownStream.py:33-42 surgery on
our own artifacts), plus the MAE -> DP finetune chain
(extract_backbone_weights.py analog)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medical_image_analysis_tpu.configs.config import make_config
from medical_image_analysis_tpu.ckpt.bridge import (
    ar_encoder_to_arm,
    graft,
    load_pretrain_params,
    resolve_vision_overlay,
)
from medical_image_analysis_tpu.ckpt.checkpoint import auto_resume_helper
from medical_image_analysis_tpu.train.loop import fit

pytestmark = pytest.mark.slow

TINY_AR = dict(patch_size=4, embed_dim=16, depth=1, d_state=4,
               dec_embed_dim=16, dec_heads=2, scan_backend="ref")
TINY_ARM = dict(patch_size=4, embed_dim=16, depth=1, d_state=4,
                scan_backend="ref", drop_path_rate=0.0)
TINY_LLM = dict(dim=32, n_layers=1, n_heads=4, n_kv_heads=4,
                hidden_dim=64, dtype=jnp.float32)
TINY_MAE = dict(embed_dim=16, depth=1, num_heads=2,
                decoder_embed_dim=16, decoder_depth=1,
                decoder_num_heads=2)
TINY_VIT = dict(patch_size=16, embed_dim=16, depth=1, num_heads=2)


def _base(save_dir, task, **model_kw):
    return make_config({
        "data": {"dataset": "synthetic", "batch_size": 4,
                 "input_size": 32, "max_len": 16, "vocab_min_freq": 1},
        "model": {"task": task, **model_kw},
        "train": {"epochs": 1, "lr": 1e-3, "warmup_steps": 2,
                  "log_every": 100, "save_dir": str(save_dir)},
        "generate": {"num_beams": 1, "max_new_tokens": 4,
                     "min_new_tokens": 1, "max_cache_len": 160},
    })


def test_ar_to_clip_to_sft_chain(tmp_path):
    # stage 1: AR pretrain
    fit(_base(tmp_path / "ar", "ar", vision_kwargs=TINY_AR))
    ar_state = auto_resume_helper(str(tmp_path / "ar"))
    assert ar_state

    # the overlay tiles every 1-dir mixer tensor into 4 slots
    src = load_pretrain_params(ar_state)
    ov = resolve_vision_overlay(src, "arm")
    a4 = np.asarray(ov["layers_0"]["mixer"]["A_log"])
    assert a4.shape[0] == 4
    assert np.array_equal(a4[0], a4[3])
    assert np.array_equal(
        a4[0], np.asarray(src["layers_0"]["mixer"]["A_log"])[0]
    )

    # stage 2: CLIP align initialized from stage 1
    fit(_base(tmp_path / "clip", "clip", vision_size="base",
              vision_kwargs=TINY_ARM, vision_init=ar_state))
    clip_state = auto_resume_helper(str(tmp_path / "clip"))
    assert clip_state
    # trained CLIP state still resolves to a 4-dir ARM tower
    ov2 = resolve_vision_overlay(
        load_pretrain_params(clip_state), "arm"
    )
    assert np.asarray(ov2["layers_0"]["mixer"]["A_log"]).shape[0] == 4

    # stage 3: downstream SFT initialized from stage 2
    scores = fit(_base(
        tmp_path / "sft", "r2gengpt", vision="arm",
        vision_kwargs=TINY_ARM, llm_kwargs=TINY_LLM,
        vision_init=clip_state,
    ))
    assert "Bleu_4" in scores


def test_mae_to_dp_chain(tmp_path):
    fit(_base(tmp_path / "mae", "mae", vision_kwargs=TINY_MAE))
    mae_state = auto_resume_helper(str(tmp_path / "mae"))
    assert mae_state
    res = fit(_base(tmp_path / "dp", "dp", vision="vit",
                    vision_kwargs=TINY_VIT, vision_init=mae_state))
    assert "instance_f1" in res  # pedestrian-style DP metrics present


def test_mae_to_r2gen_chain(tmp_path):
    """HD MAE pretrain -> RG_english finetune (classic R2Gen with the
    pretrained ViT extractor)."""
    fit(_base(tmp_path / "mae", "mae", vision_kwargs=TINY_MAE))
    mae_state = auto_resume_helper(str(tmp_path / "mae"))
    scores = fit(_base(
        tmp_path / "rg", "r2gen", vision="vit", vision_kwargs=TINY_VIT,
        vision_init=mae_state,
        task_kwargs=dict(r2gen_kwargs=dict(
            d_model=16, d_ff=16, num_layers=1, num_heads=2,
            rm_num_slots=2, rm_num_heads=2,
        )),
    ))
    assert "Bleu_4" in scores


def test_bridge_validation_errors():
    ar = {"patch_embed": {}, "layers_0": {
        "mixer": {"A_log": np.zeros((2, 4, 4), np.float32)}, "norm": {}}}
    with pytest.raises(ValueError, match="1-direction"):
        ar_encoder_to_arm(ar)
    with pytest.raises(KeyError):
        graft({"a": {"x": np.zeros(2)}}, ("a",), {"y": np.zeros(2)})
    with pytest.raises(ValueError, match="shape"):
        graft({"a": {"x": np.zeros(2)}}, ("a",), {"x": np.zeros(3)})
    with pytest.raises(ValueError, match="could not locate"):
        resolve_vision_overlay({"something": {}}, "arm")
