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


def param_specs(params, rules=None, mesh: Mesh | None = None):
    """Pytree of PartitionSpecs: TP rules where they match, replicated
    elsewhere. With ``mesh``, a rule whose sharded dimension does not
    divide evenly (e.g. an odd vocab size) falls back to replicated."""
    rules = rules or LLM_TP_RULES

    def fits(leaf, s) -> bool:
        if mesh is None:
            return True
        shape = getattr(leaf, "shape", ())
        if len(shape) < len(s):
            return False
        for ax, name in enumerate(s):
            if name is None:
                continue
            if shape[ax] % mesh.shape[name] != 0:
                return False
        return True

    def spec(path, leaf):
        p = _path_str(path)
        for pat, s in rules:
            if re.search(pat, p):
                return s if fits(leaf, s) else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params, rules=None):
    """device_put params with TP shardings. Recipes go through
    ``train.train_state.shard_state`` (params + ZeRO opt moments); this
    is the params-only form for inference/serving."""
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs,
    )
