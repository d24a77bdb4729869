"""Real-format HF assets end-to-end: safetensors loading (llama + qwen2
with biases), int8 quantized weights, TP-sharded placement, and the fast
BPE tokenizer bridge (VERDICT round-1 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medical_image_analysis_tpu.ckpt.hf_load import (
    load_llm_params,
    read_hf_config,
)
from medical_image_analysis_tpu.data.hf_tokenizer import HFTokenizer
from medical_image_analysis_tpu.models.llm import TransformerLM

pytestmark = pytest.mark.slow

CORPUS = [
    "the heart size is within normal limits .",
    "there is no focal consolidation pleural effusion or pneumothorax .",
    "mild cardiomegaly with small bilateral pleural effusions .",
    "the lungs are clear without evidence of acute disease .",
] * 8


def _save_tiny_qwen(tmp_path):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg).eval()
    d = tmp_path / "qwen_tiny"
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def qwen_ckpt(tmp_path_factory):
    return _save_tiny_qwen(tmp_path_factory.mktemp("hf"))


def _hf_logits(model, ids):
    import torch

    with torch.no_grad():
        return model(torch.tensor(ids)).logits.float().numpy()


def test_read_hf_config(qwen_ckpt):
    _, d = qwen_ckpt
    cfg = read_hf_config(d, dtype=jnp.float32)
    assert cfg.vocab_size == 256 and cfg.n_layers == 2
    assert cfg.n_kv_heads == 2 and cfg.attn_bias


def test_safetensors_load_logit_parity(qwen_ckpt):
    hf_model, d = qwen_ckpt
    cfg = read_hf_config(d, dtype=jnp.float32)
    params = load_llm_params(d, cfg, dtype=jnp.float32)
    lm = TransformerLM(cfg)
    ids = np.arange(24, dtype=np.int32).reshape(2, 12) + 3
    ours = np.asarray(lm.apply(params, input_ids=jnp.asarray(ids)))
    theirs = _hf_logits(hf_model, ids)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_int8_load_close(qwen_ckpt):
    hf_model, d = qwen_ckpt
    cfg = read_hf_config(d, dtype=jnp.float32, quant_int8=True)
    params = load_llm_params(d, cfg, dtype=jnp.float32, int8=True)
    leaf = params["params"]["layers_0"]["self_attn"]["q_proj"]
    assert leaf["kernel_q"].dtype == jnp.int8
    lm = TransformerLM(cfg)
    ids = np.arange(24, dtype=np.int32).reshape(2, 12) + 3
    ours = np.asarray(lm.apply(params, input_ids=jnp.asarray(ids)))
    theirs = _hf_logits(hf_model, ids)
    # int8 weights: logits agree to quantization noise, ranking mostly kept.
    assert np.mean(np.argmax(ours, -1) == np.argmax(theirs, -1)) > 0.8


def test_tp_sharded_load(qwen_ckpt):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from medical_image_analysis_tpu.parallel.mesh import make_mesh

    hf_model, d = qwen_ckpt
    mesh = make_mesh(data=4, model=2)
    cfg = read_hf_config(d, dtype=jnp.float32)
    params = load_llm_params(d, cfg, dtype=jnp.float32, mesh=mesh)
    k = params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert "model" in str(k.sharding.spec)
    lm = TransformerLM(cfg)
    ids = np.arange(24, dtype=np.int32).reshape(2, 12) + 3
    ours = np.asarray(lm.apply(params, input_ids=jnp.asarray(ids)))
    theirs = _hf_logits(hf_model, ids)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_bpe_tokenizer_roundtrip(tmp_path):
    tok = HFTokenizer.train_bpe(CORPUS, vocab_size=512)
    assert tok.vocab_size <= 512
    ids = tok.encode("no pleural effusion .", add_bos=True, add_eos=True)
    assert ids[0] == tok.BOS and ids[-1] == tok.EOS
    assert tok.decode(ids) == "no pleural effusion ."
    padded, mask = tok.pad(ids, 16)
    assert len(padded) == 16 and sum(mask) == len(ids)
    p = tmp_path / "tok.json"
    tok.save(str(p))
    tok2 = HFTokenizer.load(str(p))
    assert tok2.encode("pleural effusion") == tok.encode("pleural effusion")


def test_tokenizer_drops_into_batcher():
    """The recipes' MRGBatcher accepts the HF tokenizer unchanged."""
    from medical_image_analysis_tpu.data.datasets import (
        MRGBatcher,
        synthetic_annotations,
        synthetic_image_loader,
    )

    ann = synthetic_annotations()
    tok = HFTokenizer.train_bpe((s.report for s in ann["train"]), 512)
    b = MRGBatcher(
        ann["train"], tok, synthetic_image_loader(32, 1), batch_size=4,
        max_len=16, num_views=1,
    )
    batch = next(b.batches(shuffle=False))
    assert batch["target_ids"].shape == (4, 16)
    assert batch["target_ids"].max() < tok.vocab_size


def test_fit_mrg_streams_hf_weights(tmp_path):
    """End-to-end SFT against a real-format HF checkpoint: architecture
    from config.json, weights streamed into the frozen LLM tower, the
    checkpoint's own BPE tokenizer picked up by build_data."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from medical_image_analysis_tpu.configs.config import make_config
    from medical_image_analysis_tpu.data.datasets import synthetic_annotations
    from medical_image_analysis_tpu.train.loop import build_data, fit

    hf_cfg = Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    d = tmp_path / "qwen512"
    Qwen2ForCausalLM(hf_cfg).eval().save_pretrained(
        d, safe_serialization=True)
    ann = synthetic_annotations()
    tok = HFTokenizer.train_bpe((s.report for s in ann["train"]), 512)
    tok.save(str(d / "tokenizer.json"))

    cfg = make_config({
        "data": {
            "dataset": "synthetic", "batch_size": 4, "input_size": 32,
            "max_len": 16,
        },
        "model": {
            "task": "r2gengpt", "vision": "arm",
            "llm_weights_dir": str(d),
            "vision_kwargs": dict(patch_size=8, embed_dim=16, depth=1,
                                  d_state=4, scan_backend="ref",
                                  drop_path_rate=0.0),
        },
        "train": {
            "epochs": 1, "lr": 1e-3, "warmup_steps": 2, "log_every": 100,
            "save_dir": str(tmp_path / "run"),
        },
        "generate": {
            "num_beams": 1, "max_new_tokens": 4, "min_new_tokens": 1,
            "max_cache_len": 160,
        },
    })
    _, tok2, _, _ = build_data(cfg)
    assert isinstance(tok2, HFTokenizer)  # checkpoint tokenizer picked up
    scores = fit(cfg)
    assert "Bleu_4" in scores
    assert any(
        f.name.startswith("checkpoint_epoch")
        for f in (tmp_path / "run").iterdir()
    )


def test_emrrg_grafts_hf_weights(tmp_path):
    """EMRRG: the hybrid decoder's Llama-named base layers stream from
    the HF checkpoint; hybrid-only cross-attn/gate params keep init
    (reference: pretrained Llama + inserted gated cross-attn)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from medical_image_analysis_tpu.configs.config import make_config
    from medical_image_analysis_tpu.data.datasets import synthetic_annotations
    from medical_image_analysis_tpu.train.loop import fit

    hf_cfg = Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    d = tmp_path / "qwen512"
    Qwen2ForCausalLM(hf_cfg).eval().save_pretrained(
        d, safe_serialization=True)
    ann = synthetic_annotations()
    HFTokenizer.train_bpe(
        (s.report for s in ann["train"]), 512
    ).save(str(d / "tokenizer.json"))

    cfg = make_config({
        "data": {"dataset": "synthetic", "batch_size": 4,
                 "input_size": 32, "max_len": 16},
        "model": {
            "task": "emrrg", "vision": "arm",
            "llm_weights_dir": str(d),
            # cross_every=2 over 2 layers => layer 0 is hybrid: the
            # graft must route Qwen2 attention biases into the hybrid
            # layer too (it inherits the pretrained weights).
            "task_kwargs": dict(cross_every=2),
            "vision_kwargs": dict(patch_size=8, embed_dim=16, depth=1,
                                  d_state=4, scan_backend="ref",
                                  drop_path_rate=0.0),
        },
        "train": {"epochs": 1, "lr": 1e-3, "warmup_steps": 2,
                  "log_every": 100, "save_dir": str(tmp_path / "run")},
        "generate": {"num_beams": 1, "max_new_tokens": 4,
                     "min_new_tokens": 1, "max_cache_len": 160},
    })
    scores = fit(cfg)
    assert "Bleu_4" in scores
