"""LoRA as functional param-tree transforms.

Replaces HF ``peft`` LoRA on LLM q/v_proj (+ vision query/value,
``R2GenCSR.py:111-167``) and EMRRG's vendored MambaPEFT partial-SSM LoRA
(``EMRRG/mamba_peft/src/peft/tuners/mamba_peft.py:44-380``, runtime
monkey-patch ``_apply_lora_X_to_model``
``EMRRG/models/MambaXrayVL_DownStream.py:271-306``).

Design (much cleaner in JAX): the merge is a pure function
``merged = base + (alpha/r) * A @ B`` applied inside the loss; training
differentiates w.r.t. the LoRA params only. ``out_slice`` restricts the
delta to a column range of the kernel — that is exactly "partial LoRA on
the in_proj X half" (the X columns of Mamba's joint xz projection).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoRARule:
    pattern: str  # regex over 'a/b/c' param paths (matched on kernels)
    rank: int = 8
    alpha: float = 16.0
    out_slice: tuple[int, int] | None = None  # column range of the delta


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _match(rules, path, leaf) -> LoRARule | None:
    if leaf.ndim != 2:  # only Dense kernels
        return None
    for r in rules:
        if re.search(r.pattern, path):
            return r
    return None


def init_lora(rng, params, rules: list[LoRARule]):
    """Returns a pytree with {'a','b'} at matched kernel positions and
    None elsewhere (same treedef as params, dict leaves)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    for i, (path, leaf) in enumerate(flat):
        p = _path_str(path)
        rule = _match(rules, p, leaf)
        if rule is None:
            continue
        d_in, d_out = leaf.shape
        cols = (
            rule.out_slice[1] - rule.out_slice[0]
            if rule.out_slice
            else d_out
        )
        a = jax.random.normal(keys[i], (d_in, rule.rank)) * 0.01
        b = jnp.zeros((rule.rank, cols))
        out[p] = {"a": a, "b": b}
    return out


def apply_lora(params, lora, rules: list[LoRARule]):
    """base + (alpha/r) A@B (optionally into a column slice)."""
    rule_by_path = {}

    def merge(path, leaf):
        p = _path_str(path)
        if p not in lora:
            return leaf
        rule = _match(rules, p, leaf)
        delta = (rule.alpha / rule.rank) * (
            lora[p]["a"] @ lora[p]["b"]
        ).astype(leaf.dtype)
        if rule.out_slice:
            s, e = rule.out_slice
            return leaf.at[:, s:e].add(delta)
        return leaf + delta

    return jax.tree_util.tree_map_with_path(merge, params)


# Reference presets -------------------------------------------------------

def llama_qv_rules(rank: int = 16, alpha: float = 16.0) -> list[LoRARule]:
    """HF-peft default: LoRA on q_proj/v_proj (R2GenCSR.py:160-175)."""
    return [LoRARule(r"self_attn/(q_proj|v_proj)/kernel", rank, alpha)]


def mamba_partial_x_rules(
    d_inner: int, rank: int = 8, alpha: float = 16.0
) -> list[LoRARule]:
    """EMRRG partial LoRA on the X half of in_proj (xz joint projection:
    first d_inner output columns are X, second half the gate Z)."""
    return [
        LoRARule(r"mixer/in_proj/kernel", rank, alpha, out_slice=(0, d_inner))
    ]
