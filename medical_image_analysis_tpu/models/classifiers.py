"""Disease-prediction classifiers + losses.

- :class:`DPClassifier`: ViT encoder + multi-attribute head with weighted
  sigmoid BCE (reference ``HD_Xray_Pretrain_MAE/finetune/DP/train.py:23-200``,
  ``models/base_block.py``; pedestrian-attribute-style training).
- :func:`swinchex_loss`: sum of 14 per-head 2-way cross-entropies
  (``AM_MRG/SwinCheX/main.py:175-268``). The model is
  :class:`..models.swin.SwinCheX`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vit import ViT


class VSSMClassifier(nn.Module):
    """VSSM backbone + linear head — the VMamba classification runner
    (``R2GenCSR/VMamba/classification/main.py``, ``models/vmamba.py:1305``:
    patch embed -> 4 stages -> norm -> avgpool -> ``nn.Linear`` head).
    Trained with mixup/EMA via the classify recipe."""

    num_classes: int = 14
    vssm_kwargs: Any = None

    def setup(self):
        from .vmamba import VSSM

        self.backbone = VSSM(**(self.vssm_kwargs or {}), name="backbone")
        self.head = nn.Dense(self.num_classes, name="head")

    def __call__(self, images, deterministic=True):
        pooled = self.backbone(images, pool=True,
                               deterministic=deterministic)
        return self.head(pooled)


class DPClassifier(nn.Module):
    """ViT global-pool + per-attribute linear head -> (B, num_attrs)."""

    num_attrs: int = 14
    vit_kwargs: Any = None

    def setup(self):
        self.encoder = ViT(**(self.vit_kwargs or {}), name="encoder")
        self.head = nn.Dense(self.num_attrs, name="head")

    def __call__(self, images, deterministic=True):
        tokens = self.encoder(images, deterministic)
        pooled = tokens[:, 1:].mean(axis=1)  # global pool over patches
        return self.head(pooled)


def weighted_bce_loss(logits, labels, sample_weight=None):
    """Sigmoid BCE with optional per-attribute positive weighting
    (DP tools/function.py ratio2weight-style)."""
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    loss = -(labels * logp + (1.0 - labels) * lognp)
    if sample_weight is not None:
        loss = loss * sample_weight
    return loss.mean()


def swinchex_loss(logits, labels):
    """logits (B, C, 2), labels (B, C): sum of per-head CEs. Labels may
    be soft (mixup/cutmix, SwinCheX data/build.py) — p(positive) per
    head; hard {0,1} labels are the special case."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    pos = labels.astype(lp.dtype)
    ll = (1.0 - pos) * lp[..., 0] + pos * lp[..., 1]
    return -ll.mean(axis=0).sum()
