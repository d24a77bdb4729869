"""MambaXray-VL: stage-2 CLIP alignment model.

Reference ``/root/reference/CXPMRG_Bench_MambaXray_VL/models/MambaXrayVL_CLIP.py:15-199``:
ARM encoder (mean-pooled) ‖ ClinicalBERT text tower (EOS-pooled) ->
linear projections to 2048 -> symmetric InfoNCE. Stage-1 -> stage-2
checkpoint surgery (1-direction -> 4-direction replication, pos-embed
interpolation) lives in :mod:`..ckpt.torch_import`.

Stage 3 (SFT) is :class:`..models.mrg.R2GenGPT` with ``chosen="arm"``
(MambaXrayVL_DownStream.py:16-436).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .clip import CLIPHead, clip_loss
from .mamba import ARM
from .text_encoder import TextEncoder


class MambaXrayVLCLIP(nn.Module):
    arm_kwargs: Any = None
    text_kwargs: Any = None
    proj_dim: int = 2048
    # "scratch": trainable-from-zero tower (TextEncoder); "bert": the
    # faithful Bio_ClinicalBERT tower (models/bert.BertModel, importable
    # from real HF weights via ckpt/torch_import.bert_hf_to_flax) —
    # MambaXrayVL_CLIP.py:86-122.
    text_tower: str = "scratch"

    def setup(self):
        self.visual_encoder = ARM(**(self.arm_kwargs or {}), name="visual_encoder")
        if self.text_tower == "bert":
            from .bert import BertConfig, BertModel

            self.text_encoder = BertModel(
                BertConfig(**(self.text_kwargs or {})), name="text_encoder"
            )
        else:
            self.text_encoder = TextEncoder(
                **(self.text_kwargs or {}), name="text_encoder"
            )
        self.head = CLIPHead(proj_dim=self.proj_dim, name="head")

    def encode_img(self, images, deterministic=True):
        tokens = self.visual_encoder(images, deterministic)
        return tokens.mean(axis=1)

    def encode_txt(self, ids, mask):
        feats = self.text_encoder(ids, mask)
        # last valid token (EOS) pooling, MambaXrayVL_CLIP.py:121-122
        return TextEncoder.pool_eos(feats, mask)

    def __call__(self, images, text_ids, text_mask, deterministic=True):
        v = self.encode_img(images, deterministic)
        t = self.encode_txt(text_ids, text_mask)
        vp, tp, scale = self.head(v, t)
        return clip_loss(vp, tp, scale)
