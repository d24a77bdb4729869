"""Full-scale HF checkpoint loading: safetensors streaming, int8, TP.

The reference loads Llama-2-7b / Qwen1.5 with ``from_pretrained`` +
optional ``load_in_8bit`` / ``device_map='auto'``
(``/root/reference/R2GenCSR/models/R2GenCSR.py:140-152``,
``CXPMRG_Bench_MambaXray_VL/models/MambaXrayVL_DownStream.py:65-118``).
TPU-native equivalent:

- ``read_hf_config``  — HF ``config.json`` -> :class:`LLMConfig`
  (llama + qwen2 architectures, incl. Qwen's attention biases and tied
  embeddings).
- ``load_llm_params`` — streams tensors one at a time out of the
  ``*.safetensors`` shards (no full state_dict in host RAM), casts to
  bf16, optionally quantizes matmul kernels to int8 with per-column
  scales (halving 7B HBM: ~7 GB weights on a 16 GB chip), and optionally
  ``device_put``\\ s each leaf with tensor-parallel shardings over a
  mesh's ``model`` axis.

Memory plan for Llama-2-7b on one 16 GB chip: int8 kernels (6.5 GB) +
bf16 embeddings/norms (~0.6 GB) + KV cache (bf16, 1k tokens, B=8:
~2.1 GB) + activations < 16 GB. For bf16 weights (13.5 GB), shard over
``model`` with a 2+-chip mesh instead.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llm import LLMConfig


class SafetensorsIndex(Mapping):
    """Lazy name -> tensor view over one or more safetensors shards."""

    def __init__(self, model_dir: str):
        from safetensors import safe_open

        self._safe_open = safe_open
        self._file_of: dict[str, str] = {}
        files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no *.safetensors under {model_dir}")
        for f in files:
            with safe_open(f, framework="pt") as sf:
                for k in sf.keys():
                    self._file_of[k] = f

    def __getitem__(self, key: str) -> np.ndarray:
        import torch

        # torch framework handles bf16 shards (numpy has no bf16).
        with self._safe_open(self._file_of[key], framework="pt") as sf:
            t = sf.get_tensor(key)
        if t.dtype == torch.bfloat16:
            t = t.to(torch.float32)
        return t.numpy()

    def __iter__(self):
        return iter(self._file_of)

    def __len__(self):
        return len(self._file_of)


def read_hf_config(model_dir: str, **overrides) -> LLMConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        hc = json.load(f)
    arch = (hc.get("architectures") or ["LlamaForCausalLM"])[0].lower()
    kw: dict[str, Any] = dict(
        vocab_size=hc["vocab_size"],
        dim=hc["hidden_size"],
        n_layers=hc["num_hidden_layers"],
        n_heads=hc["num_attention_heads"],
        n_kv_heads=hc.get("num_key_value_heads", hc["num_attention_heads"]),
        hidden_dim=hc["intermediate_size"],
        rope_theta=hc.get("rope_theta", 10000.0),
        norm_eps=hc.get("rms_norm_eps", 1e-5),
        tie_embeddings=hc.get("tie_word_embeddings", False),
        attn_bias="qwen2" in arch or hc.get("attention_bias", False),
    )
    kw.update(overrides)
    return LLMConfig(**kw)


def _quantize(w: np.ndarray) -> dict:
    """Per-output-column symmetric int8: w ≈ q * scale."""
    w32 = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(w32).max(axis=0), 1e-8) / 127.0
    q = np.clip(np.rint(w32 / scale[None, :]), -127, 127).astype(np.int8)
    return {"kernel_q": q, "scale": scale.astype(np.float32)}


def load_llm_params(
    model_dir: str,
    cfg: LLMConfig | None = None,
    dtype=jnp.bfloat16,
    int8: bool = False,
    mesh=None,
) -> dict:
    """Stream an HF Llama/Qwen2 checkpoint into TransformerLM params.

    Same key map as :func:`..ckpt.torch_import.llama_hf_to_flax`, plus
    Qwen2 attention biases, streaming (one tensor resident at a time),
    int8 kernel quantization, and TP placement.
    """
    cfg = cfg or read_hf_config(model_dir)
    sd = SafetensorsIndex(model_dir)

    def dev_put(path_str, leaf):
        if mesh is None:
            return jnp.asarray(leaf)
        from jax.sharding import NamedSharding
        from ..parallel.tp import param_specs

        spec = param_specs({path_str: leaf}, mesh=mesh)[path_str]
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def kernel(name: str, path_str: str, quantizable: bool = True):
        w = np.ascontiguousarray(np.asarray(sd[name], np.float32).T)
        if int8 and quantizable:
            return {
                k: dev_put(f"{path_str}/{k}", v)
                for k, v in _quantize(w).items()
            }
        return {"kernel": dev_put(f"{path_str}/kernel", w.astype(dtype))}

    def vec(name: str, path_str: str, to=np.float32):
        return dev_put(path_str, np.asarray(sd[name], to))

    params: dict = {
        "embed_tokens": {
            "embedding": vec("model.embed_tokens.weight",
                             "embed_tokens/embedding", dtype)
        },
        "norm": {"scale": vec("model.norm.weight", "norm/scale")},
    }
    if not cfg.tie_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = kernel("lm_head.weight", "lm_head")
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        attn = {
            proj: kernel(p + f"self_attn.{proj}.weight",
                         f"layers_{i}/self_attn/{proj}")
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj")
        }
        if cfg.attn_bias:
            for proj in ("q_proj", "k_proj", "v_proj"):
                bname = p + f"self_attn.{proj}.bias"
                if bname in sd:
                    attn[proj]["bias"] = vec(
                        bname, f"layers_{i}/self_attn/{proj}/bias",
                        np.float32 if int8 else dtype,
                    )
        params[f"layers_{i}"] = {
            "self_attn": attn,
            "mlp": {
                proj: kernel(p + f"mlp.{proj}.weight",
                             f"layers_{i}/mlp/{proj}")
                for proj in ("gate_proj", "up_proj", "down_proj")
            },
            "input_layernorm": {
                "scale": vec(p + "input_layernorm.weight",
                             f"layers_{i}/input_layernorm/scale")
            },
            "post_attention_layernorm": {
                "scale": vec(p + "post_attention_layernorm.weight",
                             f"layers_{i}/post_attention_layernorm/scale")
            },
        }
    return {"params": params}
