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
    # Fractional column range of the delta, resolved against each
    # matched kernel's output width — lets one rule target e.g. the q
    # third of a fused qkv kernel across Swin stages whose dims differ.
    out_frac: tuple[float, float] | None = None


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _matches(rules, path, leaf) -> list[tuple[int, LoRARule]]:
    if leaf.ndim != 2:  # only Dense kernels
        return []
    return [
        (i, r) for i, r in enumerate(rules) if re.search(r.pattern, path)
    ]


def _cols(rule: LoRARule, d_out: int) -> tuple[int, int] | None:
    if rule.out_slice:
        return rule.out_slice
    if rule.out_frac:
        return int(rule.out_frac[0] * d_out), int(rule.out_frac[1] * d_out)
    return None


def init_lora(rng, params, rules: list[LoRARule]):
    """Returns {'path': {'a','b'}} at matched kernel positions. When
    several rules hit one kernel (e.g. separate q and v adapters on a
    fused qkv), each extra adapter is keyed 'path@<rule index>' (the
    first keeps the bare path, so single-rule checkpoints are stable)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    for i, (path, leaf) in enumerate(flat):
        p = _path_str(path)
        for j, (ri, rule) in enumerate(_matches(rules, p, leaf)):
            d_in, d_out = leaf.shape
            sl = _cols(rule, d_out)
            cols = sl[1] - sl[0] if sl else d_out
            a = jax.random.normal(
                jax.random.fold_in(keys[i], ri), (d_in, rule.rank)
            ) * 0.01
            b = jnp.zeros((rule.rank, cols))
            out[p if j == 0 else f"{p}@{ri}"] = {"a": a, "b": b}
    return out


def apply_lora(params, lora, rules: list[LoRARule]):
    """base + (alpha/r) A@B (optionally into a column slice/fraction)."""

    def merge(path, leaf):
        p = _path_str(path)
        ms = _matches(rules, p, leaf)
        for j, (ri, rule) in enumerate(ms):
            key = p if j == 0 else f"{p}@{ri}"
            if key not in lora:
                continue
            delta = (rule.alpha / rule.rank) * (
                lora[key]["a"] @ lora[key]["b"]
            ).astype(leaf.dtype)
            sl = _cols(rule, leaf.shape[1])
            if sl:
                leaf = leaf.at[:, sl[0]:sl[1]].add(delta)
            else:
                leaf = leaf + delta
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)


# Reference presets -------------------------------------------------------

def llama_qv_rules(rank: int = 16, alpha: float = 16.0) -> list[LoRARule]:
    """HF-peft default: LoRA on q_proj/v_proj (R2GenCSR.py:160-175)."""
    return [LoRARule(r"self_attn/(q_proj|v_proj)/kernel", rank, alpha)]


def vision_qv_rules(rank: int = 16, alpha: float = 16.0) -> list[LoRARule]:
    """``vis_use_lora`` (R2GenCSR.py:111-121: HF-peft LoRA on the vision
    attention query/value). Swin/ViT here use one fused qkv kernel, so
    two adapters target its q and v column thirds. For SSM towers
    (ARM/VSSM, no query/value modules) the analog is EMRRG's partial
    LoRA on the X half of the joint xz in_proj (``--lora_X --dim_X``,
    EMRRG/configs/config.py); its pattern is inert on attention towers
    and vice versa, so one rule set serves every family."""
    return [
        LoRARule(r"vision/.*qkv/kernel", rank, alpha, out_frac=(0, 1 / 3)),
        LoRARule(r"vision/.*qkv/kernel", rank, alpha,
                 out_frac=(2 / 3, 1.0)),
        LoRARule(r"vision/.*mixer/in_proj/kernel", rank, alpha,
                 out_frac=(0, 0.5)),
    ]


def mamba_partial_x_rules(
    d_inner: int, rank: int = 8, alpha: float = 16.0
) -> list[LoRARule]:
    """EMRRG partial LoRA on the X half of in_proj (xz joint projection:
    first d_inner output columns are X, second half the gate Z)."""
    return [
        LoRARule(r"mixer/in_proj/kernel", rank, alpha, out_slice=(0, d_inner))
    ]
