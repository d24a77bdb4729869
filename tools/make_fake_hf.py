"""Generate a real-shape random HF checkpoint (safetensors shards).

Proves the full-scale asset path without downloadable weights
(VERDICT round-2 item 6; reference trains against Llama-2-7b-chat,
``R2GenCSR.py:141-176``): real tensor names/shapes/dtypes, multi-shard
layout with ``model.safetensors.index.json``, loadable by
``ckpt/hf_load.py`` with int8 quantization and TP placement. Weight
*content* is tiled random (throughput/memory behavior is shape- and
dtype-determined, not value-determined).

  python tools/make_fake_hf.py llama2_7b /tmp/fake_llama2_7b
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from medical_image_analysis_tpu.models.llm import LLM_CONFIGS

SHARD_BYTES = 2 << 30  # ~2 GB per shard

_HF_NAMES = {
    "llama2_7b": dict(arch="LlamaForCausalLM", tie=False, bias=False),
    "llama2_13b": dict(arch="LlamaForCausalLM", tie=False, bias=False),
    "qwen1_5_0_5b": dict(arch="Qwen2ForCausalLM", tie=True, bias=True),
    "qwen1_5_1_8b": dict(arch="Qwen2ForCausalLM", tie=True, bias=True),
}


def tensor_specs(name: str):
    cfg = LLM_CONFIGS[name]
    meta = _HF_NAMES[name]
    hd = cfg.dim // cfg.n_heads
    kv = cfg.n_kv_heads * hd
    specs = [("model.embed_tokens.weight", (cfg.vocab_size, cfg.dim))]
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        specs += [
            (p + "self_attn.q_proj.weight", (cfg.dim, cfg.dim)),
            (p + "self_attn.k_proj.weight", (kv, cfg.dim)),
            (p + "self_attn.v_proj.weight", (kv, cfg.dim)),
            (p + "self_attn.o_proj.weight", (cfg.dim, cfg.dim)),
            (p + "mlp.gate_proj.weight", (cfg.hidden_dim, cfg.dim)),
            (p + "mlp.up_proj.weight", (cfg.hidden_dim, cfg.dim)),
            (p + "mlp.down_proj.weight", (cfg.dim, cfg.hidden_dim)),
            (p + "input_layernorm.weight", (cfg.dim,)),
            (p + "post_attention_layernorm.weight", (cfg.dim,)),
        ]
        if meta["bias"]:
            specs += [
                (p + f"self_attn.{q}_proj.bias",
                 (cfg.dim if q == "q" else kv,))
                for q in ("q", "k", "v")
            ]
    specs.append(("model.norm.weight", (cfg.dim,)))
    if not meta["tie"]:
        specs.append(("lm_head.weight", (cfg.vocab_size, cfg.dim)))
    return cfg, meta, specs


def write_fake_checkpoint(name: str, out_dir: str, seed: int = 0):
    from safetensors.torch import save_file

    cfg, meta, specs = tensor_specs(name)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    pool = (rng.standard_normal(1 << 24) * 0.02).astype(np.float32)

    def fill(shape):
        n = int(np.prod(shape))
        arr = np.resize(pool, n).reshape(shape)
        return torch.from_numpy(arr).to(torch.bfloat16)

    shards: list[dict] = [{}]
    sizes = [0]
    for tname, shape in specs:
        nbytes = int(np.prod(shape)) * 2
        if sizes[-1] + nbytes > SHARD_BYTES and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][tname] = fill(shape)
        sizes[-1] += nbytes

    weight_map = {}
    n = len(shards)
    for si, shard in enumerate(shards):
        fname = (
            "model.safetensors" if n == 1
            else f"model-{si + 1:05d}-of-{n:05d}.safetensors"
        )
        save_file(shard, os.path.join(out_dir, fname))
        for tname in shard:
            weight_map[tname] = fname
        shard.clear()
    with open(os.path.join(out_dir, "model.safetensors.index.json"),
              "w") as f:
        json.dump({"metadata": {"total_size": sum(sizes)},
                   "weight_map": weight_map}, f)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": [meta["arch"]],
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.dim,
            "num_hidden_layers": cfg.n_layers,
            "num_attention_heads": cfg.n_heads,
            "num_key_value_heads": cfg.n_kv_heads,
            "intermediate_size": cfg.hidden_dim,
            "rope_theta": cfg.rope_theta,
            "rms_norm_eps": cfg.norm_eps,
            "tie_word_embeddings": meta["tie"],
            "torch_dtype": "bfloat16",
        }, f)
    total = sum(sizes) / (1 << 30)
    print(f"wrote {name}: {len(weight_map)} tensors, "
          f"{total:.1f} GiB bf16, {n} shard(s) -> {out_dir}")


if __name__ == "__main__":
    write_fake_checkpoint(
        sys.argv[1] if len(sys.argv) > 1 else "llama2_7b",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/fake_hf",
    )
