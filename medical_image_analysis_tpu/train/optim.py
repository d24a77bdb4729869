"""Optimizers & schedules matching the reference recipes (SURVEY.md R5).

- AdamW + cosine (Lightning models, ``R2GenCSR.py:804-807``)
- linear warmup + half-cycle cosine per-step (``utils/lr_sched.py:15``,
  ``lightning_tools/optim.py:6-59``)
- no-weight-decay groups: bias / norm / pos_embed / A_log / D
  (timm ``add_weight_decay``; ``mamba_simple.py`` ``_no_weight_decay``)
- blr x batch/256 scaling (``main_pretrain.py:156-173``)
- layer-wise lr decay (``utils/lr_decay.py:76``)
- LARS for linear probing (``Finetuning/util/lars.py:46``)
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import optax

NO_DECAY_PATTERNS = (
    "bias", "scale", "pos_embed", "cls_token", "A_log", r"(^|/)D$",
    "logit_scale", "embedding", "ar_token", "mask_token",
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def no_decay_mask(params) -> Any:
    """True = apply weight decay."""

    def decide(path, _):
        p = _path_str(path)
        return not any(re.search(pat, p) for pat in NO_DECAY_PATTERNS)

    return jax.tree_util.tree_map_with_path(decide, params)


def warmup_cosine(
    base_lr: float, warmup_steps: int, total_steps: int,
    min_lr: float = 0.0,
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=min_lr,
    )


def scaled_lr(blr: float, global_batch: int) -> float:
    """blr * batch / 256 (main_pretrain.py:156-173)."""
    return blr * global_batch / 256.0


def layer_decay_scales(params, decay: float, num_layers: int) -> Any:
    """Per-param multiplier decay^(num_layers - layer_idx); layer index
    parsed from names like 'layers_7' / 'block7' / 'stage2_block1'."""

    def scale(path, _):
        p = _path_str(path)
        m = re.search(r"(?:layers?_|block)(\d+)", p)
        layer = int(m.group(1)) + 1 if m else 0
        return decay ** (num_layers + 1 - layer)

    return jax.tree_util.tree_map_with_path(scale, params)


def make_adamw(
    lr: float | optax.Schedule,
    weight_decay: float = 0.05,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float | None = 1.0,
    params_for_mask=None,
    trainable_mask=None,
    layer_decay: tuple[float, int] | None = None,
) -> optax.GradientTransformation:
    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip))
    mask = no_decay_mask(params_for_mask) if params_for_mask is not None else None
    txs.append(
        optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay, mask=mask)
    )
    if layer_decay is not None and params_for_mask is not None:
        scales = layer_decay_scales(params_for_mask, *layer_decay)
        txs.append(
            optax.GradientTransformation(
                lambda params: optax.EmptyState(),
                lambda updates, state, params=None: (
                    jax.tree_util.tree_map(
                        lambda u, s: u * s, updates, scales
                    ),
                    state,
                ),
            )
        )
    tx = optax.chain(*txs)
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(lambda m: not m, trainable_mask),
            ),
        )
    return tx


def make_lars(
    lr: float | optax.Schedule, weight_decay: float = 0.0,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    return optax.lars(lr, weight_decay=weight_decay, momentum=momentum)
