"""Serving demo smoke (X3, reference ``R2GenCSR/demo.py:12-43``):
build the preprocess -> encode -> beam generate -> decode pipeline from
a tiny config, run it one-shot, and drive the HTTP JSON server."""

import pytest
import argparse
import base64
import io
import json
import threading
import urllib.request

import numpy as np
import yaml

pytestmark = pytest.mark.slow


def _tiny_config(tmp_path):
    cfg = {
        "data": {"input_size": 32, "max_len": 16},
        "model": {
            "task": "r2gengpt",
            "vision": "vit",
            "vision_kwargs": {
                "patch_size": 8, "embed_dim": 16, "depth": 1,
                "num_heads": 2,
            },
            "llm_kwargs": {
                "dim": 32, "n_layers": 1, "n_heads": 4, "n_kv_heads": 4,
                "hidden_dim": 64,
            },
        },
        "generate": {
            "max_new_tokens": 4, "min_new_tokens": 1,
            "max_cache_len": 64,
        },
    }
    p = tmp_path / "demo.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_demo_pipeline_and_server(tmp_path):
    from medical_image_analysis_tpu.cli.demo import build_pipeline, make_server

    args = argparse.Namespace(
        config=_tiny_config(tmp_path), vocab=None, delta=None,
    )
    report_for = build_pipeline(args)

    img = np.random.default_rng(0).integers(
        0, 255, (48, 40, 3), dtype=np.uint8
    )
    report = report_for(img)
    assert isinstance(report, str)

    # HTTP JSON API on an ephemeral port
    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.fromarray(img).save(buf, format="PNG")
    server = make_server(report_for, 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.server_address[1]}/generate",
            data=json.dumps(
                {"image": base64.b64encode(buf.getvalue()).decode()}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
    finally:
        server.shutdown()
    assert out["report"] == report


def test_demo_serves_hf_weights(tmp_path):
    """Demo pipeline against a real-format HF checkpoint: tokenizer and
    weights both come from model.llm_weights_dir (int8 serving form)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from medical_image_analysis_tpu.cli.demo import build_pipeline
    from medical_image_analysis_tpu.data.datasets import synthetic_annotations
    from medical_image_analysis_tpu.data.hf_tokenizer import HFTokenizer

    d = tmp_path / "ckpt"
    torch.manual_seed(0)
    Qwen2ForCausalLM(Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )).eval().save_pretrained(d, safe_serialization=True)
    HFTokenizer.train_bpe(
        (s.report for s in synthetic_annotations()["train"]), 512
    ).save(str(d / "tokenizer.json"))

    cfg = {
        "data": {"input_size": 32, "max_len": 16},
        "model": {
            "task": "r2gengpt", "vision": "vit",
            "llm_weights_dir": str(d), "llm_int8": True,
            "vision_kwargs": {"patch_size": 8, "embed_dim": 16,
                              "depth": 1, "num_heads": 2},
        },
        "generate": {"max_new_tokens": 4, "min_new_tokens": 1,
                     "max_cache_len": 64},
    }
    p = tmp_path / "demo.yaml"
    p.write_text(yaml.safe_dump(cfg))
    args = argparse.Namespace(config=str(p), vocab=None, delta=None)
    report_for = build_pipeline(args)
    img = np.random.default_rng(0).integers(
        0, 255, (48, 40, 3), dtype=np.uint8
    )
    assert isinstance(report_for(img), str)
