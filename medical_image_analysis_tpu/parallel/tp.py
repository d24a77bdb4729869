"""Tensor-parallel partition specs for the LLM tower.

The reference has no TP (SURVEY.md §2.8); this is the TPU-native
scaling path for 7B-class decoders on small chips: Megatron-style
column/row sharding of attention and MLP kernels over the mesh's
``model`` axis. XLA inserts the all-reduces from the param shardings —
no manual collectives.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over param path, PartitionSpec) — first match wins.
LLM_TP_RULES = [
    (r"embed_tokens/embedding", P(None, "model")),
    (r"self_attn/(q_proj|k_proj|v_proj)/kernel", P(None, "model")),
    (r"self_attn/o_proj/kernel", P("model", None)),
    (r"cross_attn_kv_proj/kernel", P(None, "model")),
    (r"cross_attn_gate_proj/kernel", P(None, "model")),
    (r"mlp/(gate_proj|up_proj)/kernel", P(None, "model")),
    (r"mlp/down_proj/kernel", P("model", None)),
    (r"lm_head/kernel", P(None, "model")),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_specs(params, rules=None):
    """Pytree of PartitionSpecs: TP rules where they match, replicated
    elsewhere."""
    rules = rules or LLM_TP_RULES

    def spec(path, leaf):
        p = _path_str(path)
        for pat, s in rules:
            if re.search(pat, p):
                return s
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params, rules=None):
    """device_put params with TP shardings; downstream computations
    (optimizer init, train steps) inherit them through jit."""
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs,
    )
