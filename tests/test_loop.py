"""End-to-end training recipes on synthetic data (tiny, CPU)."""

import tempfile

import jax.numpy as jnp
import pytest

from medical_image_analysis_tpu.configs.config import make_config
from medical_image_analysis_tpu.models.mrg import GenerateConfig
from medical_image_analysis_tpu.train.loop import fit


def _base_cfg(task, **model_kw):
    # fresh dir per test: fit() intentionally resumes best_score from an
    # existing best.json, so a shared save_dir makes assertions stateful
    save_dir = tempfile.mkdtemp(prefix="mia_test_save_")
    return make_config({
        "data": {
            "dataset": "synthetic", "batch_size": 4, "input_size": 32,
            "max_len": 16, "vocab_min_freq": 1,
        },
        "model": {"task": task, **model_kw},
        "train": {
            "epochs": 1, "lr": 1e-3, "warmup_steps": 2, "log_every": 100,
            "save_dir": save_dir,
        },
        "generate": {
            "num_beams": 1, "max_new_tokens": 4, "min_new_tokens": 1,
            "max_cache_len": 64,
        },
    })


TINY_LLM_KW = dict(dim=32, n_layers=1, n_heads=4, n_kv_heads=4,
                   hidden_dim=64, dtype=jnp.float32)
TINY_SWIN = dict(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                 window_size=4, drop_path_rate=0.0)
TINY_ARM = dict(patch_size=8, embed_dim=16, depth=1, d_state=4,
                scan_backend="ref", drop_path_rate=0.0)


def test_fit_mrg_synthetic():
    cfg = _base_cfg(
        "r2gengpt", vision="swin", vision_kwargs=TINY_SWIN,
        llm_kwargs=TINY_LLM_KW,
    )
    scores = fit(cfg)
    assert "Bleu_4" in scores and "ce_f1" in scores
    # weighted model selection (ref scorer_types/weights): best delta +
    # score record written alongside the per-epoch deltas
    import json
    import os

    assert "val_score" in scores
    sd = cfg.train.save_dir
    assert os.path.exists(os.path.join(sd, "checkpoint_best.msgpack"))
    best = json.load(open(os.path.join(sd, "best.json")))
    assert best["val_score"] == scores["val_score"]


def test_fit_csr_synthetic():
    cfg = _base_cfg(
        "r2gencsr", vision="swin", vision_kwargs=TINY_SWIN,
        llm_kwargs=TINY_LLM_KW,
    )
    cfg.data.n_context = 1
    scores = fit(cfg)
    assert "Bleu_4" in scores


def test_fit_mae_synthetic():
    cfg = _base_cfg("mae", vision_kwargs=dict(
        embed_dim=32, depth=1, num_heads=2, decoder_embed_dim=16,
        decoder_depth=1, decoder_num_heads=2,
    ))
    cfg.model.mask_type = "region"
    out = fit(cfg)
    assert out["loss"] > 0


def test_fit_ar_synthetic():
    cfg = _base_cfg("ar", vision_kwargs=dict(
        patch_size=4, embed_dim=16, depth=1, dec_embed_dim=16, d_state=4,
        dec_heads=2, scan_backend="ref",
    ))
    out = fit(cfg)
    assert out["loss"] > 0


@pytest.mark.slow
def test_fit_clip_synthetic():
    cfg = _base_cfg("clip", vision_size="base")
    cfg.model.vision_kwargs = dict(TINY_ARM)
    out = fit(cfg)
    assert out["loss"] > 0


def test_fit_classify_synthetic():
    cfg = _base_cfg("swinchex", vision_kwargs=TINY_SWIN)
    out = fit(cfg)
    assert out["loss"] > 0


def test_fit_mrg_tp_lora_accum_remat():
    """Recipe-level: R2GenGPT on a (data, model) mesh with LoRA'd frozen
    LLM, gradient accumulation, and remat (VERDICT round-1 item 3)."""
    cfg = _base_cfg(
        "r2gengpt", vision="arm", vision_kwargs=dict(TINY_ARM),
        llm_kwargs=TINY_LLM_KW,
    )
    cfg.train.mesh_model = 2
    cfg.train.lora_llm = True
    cfg.train.lora_rank = 2
    cfg.train.accum_steps = 2
    cfg.train.remat = True
    scores = fit(cfg)
    assert "Bleu_4" in scores


def test_kill_and_resume_reproduces_run(tmp_path):
    """Train 3 epochs straight vs 2 epochs + resume for the 3rd: the
    resumed run must land on the same final train state (VERDICT item 9:
    misc.save_model/auto_resume_helper parity)."""
    import jax
    import numpy as np

    def cfg_for(d, epochs):
        cfg = _base_cfg("mae", vision_kwargs=dict(
            embed_dim=32, depth=1, num_heads=2, decoder_embed_dim=16,
            decoder_depth=1, decoder_num_heads=2,
        ))
        cfg.train.epochs = epochs
        cfg.train.save_dir = str(d)
        cfg.train.warmup_steps = 4
        return cfg

    from flax import serialization

    fit(cfg_for(tmp_path / "a", 3))

    # "Kill" after 2 of 3 epochs (same schedules), then auto-resume.
    kill = cfg_for(tmp_path / "b", 3)
    kill.train.max_epochs_this_run = 2
    fit(kill)
    cfg = cfg_for(tmp_path / "b", 3)
    cfg.train.resume = "auto"
    fit(cfg)

    def final_state(d):
        with open(d / "state_epoch00002.msgpack", "rb") as f:
            return serialization.msgpack_restore(f.read())

    a = final_state(tmp_path / "a")
    b = final_state(tmp_path / "b")
    assert int(a["epoch"]) == int(b["epoch"]) == 2
    leaves_a = jax.tree_util.tree_leaves(a["state"])
    leaves_b = jax.tree_util.tree_leaves(b["state"])
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(la, lb, rtol=2e-5, atol=2e-6)


def test_fit_learnable_synthetic():
    """The label-grammar corpus (convergence-demo dataset) runs through
    the standard r2gengpt recipe end-to-end."""
    cfg = _base_cfg(
        "r2gengpt", vision="swin", vision_kwargs=TINY_SWIN,
        llm_kwargs=TINY_LLM_KW,
    )
    cfg.data.dataset = "synthetic_learnable"
    cfg.data.synthetic_train_size = 16
    scores = fit(cfg)
    assert "Bleu_4" in scores
