"""Learned CheXbert labeler (the trained clinical-efficacy model).

The reference's P/R/F1 numbers come from the trained CheXbert model
(BERT-base + 14 per-condition classification heads) whose csv output
feeds ``compute_ce.py`` (``/root/reference/HD_Xray_Pretrain_MAE/
finetune/RG_english/compute_ce.py``) and the R2GenCSR ``chexbert``
retrieval mode (``R2GenCSR.py:323-344``).

Architecture (stanfordmlgroup CheXbert): BERT-base encoder, CLS hidden
state into 14 linear heads — 13 conditions with 4 classes
(blank / positive / negative / uncertain) and "No Finding" with 2.
``compute_ce`` semantics map {uncertain, negative, blank} -> 0 and
positive -> 1 before micro P/R/F1.

Weights import from a CheXbert ``.pth`` via
:func:`chexbert_torch_to_flax`; the rule labeler in :mod:`.chexbert`
remains the no-weights fallback.
"""

from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.bert import BertConfig, BertModel
from .chexbert import CHEXPERT_LABELS

# CheXbert head order (stanfordmlgroup/CheXbert src/constants.py).
CHEXBERT_CONDITIONS = [
    "enlarged cardiomediastinum", "cardiomegaly", "lung opacity",
    "lung lesion", "edema", "consolidation", "pneumonia", "atelectasis",
    "pneumothorax", "pleural effusion", "pleural other", "fracture",
    "support devices", "no finding",
]
assert CHEXBERT_CONDITIONS == CHEXPERT_LABELS

CLS_BLANK, CLS_POSITIVE, CLS_NEGATIVE, CLS_UNCERTAIN = 0, 1, 2, 3


class CheXbert(nn.Module):
    """BERT-base + 14 per-condition heads (13x4-way + 1x2-way)."""

    cfg: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        h = BertModel(self.cfg, name="bert")(
            input_ids=input_ids, attention_mask=attention_mask
        )
        cls = h[:, 0]
        logits = [
            nn.Dense(4, name=f"head_{i}")(cls) for i in range(13)
        ]
        logits.append(nn.Dense(2, name="head_13")(cls))
        return logits  # list of (B, 4|2)


def chexbert_torch_to_flax(sd: Mapping[str, np.ndarray],
                           n_layers: int = 12) -> dict:
    """CheXbert .pth state dict -> flax params.

    Accepts the released format (``module.``-prefixed, ``bert.*`` tower,
    ``linear_heads.{i}.*`` heads)."""
    from ..ckpt.torch_import import bert_hf_to_flax

    clean = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        clean[k] = v
    bert_sd = {
        k[len("bert."):]: v for k, v in clean.items() if k.startswith("bert.")
    }
    params = {"bert": bert_hf_to_flax(bert_sd, n_layers)["params"]}
    for i in range(14):
        params[f"head_{i}"] = {
            "kernel": np.ascontiguousarray(
                clean[f"linear_heads.{i}.weight"].T
            ),
            "bias": clean[f"linear_heads.{i}.bias"],
        }
    return {
        "params": jax.tree_util.tree_map(jnp.asarray, params,
                                         is_leaf=lambda x: not isinstance(x, dict))
    }


def chexbert_labels(logits: list) -> np.ndarray:
    """Per-head argmax -> {0,1} labels with compute_ce semantics
    (positive=1; blank/negative/uncertain=0; No-Finding head binary)."""
    out = []
    for i, lg in enumerate(logits[:-1]):
        out.append((np.argmax(np.asarray(lg), -1) == CLS_POSITIVE))
    out.append(np.argmax(np.asarray(logits[-1]), -1) == 1)
    return np.stack(out, axis=1).astype(np.int32)


def make_learned_labeler(params, tokenizer, max_len: int = 128,
                         cfg: BertConfig = BertConfig()):
    """Returns ``labeler(report) -> (14,)`` pluggable into
    :func:`.chexbert.clinical_efficacy`."""
    model = CheXbert(cfg)

    @jax.jit
    def run(ids, mask):
        return model.apply(params, ids, mask)

    def labeler(report: str) -> np.ndarray:
        ids = tokenizer.encode(report, max_len=max_len)
        ids, mask = tokenizer.pad(ids, max_len)
        logits = run(
            jnp.asarray([ids], jnp.int32), jnp.asarray([mask], jnp.int32)
        )
        return chexbert_labels(logits)[0]

    return labeler
