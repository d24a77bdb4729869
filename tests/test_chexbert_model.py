"""Learned CheXbert labeler: architecture + import parity + CE plumbing.

The reference model is BERT-base + 14 linear heads on CLS
(compute_ce.py pipeline). Parity oracle: torch BertModel CLS -> torch
linear heads, on a CheXbert-format state dict.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medical_image_analysis_tpu.evalx.chexbert import clinical_efficacy
from medical_image_analysis_tpu.evalx.chexbert_model import (
    CheXbert,
    chexbert_labels,
    chexbert_torch_to_flax,
    make_learned_labeler,
)
from medical_image_analysis_tpu.models.bert import BertConfig

CFG = BertConfig(
    vocab_size=128, dim=32, n_layers=2, n_heads=4, intermediate=64,
    max_position=64,
)


@pytest.fixture(scope="module")
def torch_chexbert():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel as HFBert

    hf_cfg = HFBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(0)
    bert = HFBert(hf_cfg).eval()
    heads = [torch.nn.Linear(32, 4) for _ in range(13)]
    heads.append(torch.nn.Linear(32, 2))
    sd = {}
    for k, v in bert.state_dict().items():
        sd["module.bert." + k] = v.numpy()
    for i, h in enumerate(heads):
        sd[f"module.linear_heads.{i}.weight"] = h.weight.detach().numpy()
        sd[f"module.linear_heads.{i}.bias"] = h.bias.detach().numpy()
    return bert, heads, sd


def test_chexbert_import_logit_parity(torch_chexbert):
    import torch

    bert, heads, sd = torch_chexbert
    ids = np.random.default_rng(0).integers(1, 128, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    with torch.no_grad():
        cls = bert(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state[:, 0]
        theirs = [h(cls).numpy() for h in heads]

    params = chexbert_torch_to_flax(sd, n_layers=2)
    ours = CheXbert(CFG).apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    assert len(ours) == 14
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(a), b, rtol=3e-4, atol=3e-4)


def test_chexbert_labels_semantics():
    # heads argmax: positive class (1) -> label 1; others -> 0.
    logits = [np.zeros((2, 4)) for _ in range(13)]
    logits[0][0, 1] = 5.0  # positive
    logits[1][0, 3] = 5.0  # uncertain -> 0 (compute_ce maps -1 to 0)
    logits[2][0, 2] = 5.0  # negative -> 0
    logits.append(np.zeros((2, 2)))
    logits[13][1, 1] = 5.0  # no finding positive for sample 1
    lab = chexbert_labels([jnp.asarray(x) for x in logits])
    assert lab.shape == (2, 14)
    assert lab[0, 0] == 1 and lab[0, 1] == 0 and lab[0, 2] == 0
    assert lab[1, 13] == 1


def test_learned_labeler_plugs_into_ce(torch_chexbert):
    from medical_image_analysis_tpu.data.tokenizer import WordTokenizer

    _, _, sd = torch_chexbert
    params = chexbert_torch_to_flax(sd, n_layers=2)
    tok = WordTokenizer(["no", "pleural", "effusion", "cardiomegaly"])
    labeler = make_learned_labeler(params, tok, max_len=16, cfg=CFG)
    gts = {"a": ["no pleural effusion"], "b": ["cardiomegaly"]}
    res = {"a": ["no pleural effusion"], "b": ["cardiomegaly"]}
    scores = clinical_efficacy(gts, res, labeler=labeler)
    # identical texts -> identical labels -> perfect or degenerate-perfect
    assert scores["ce_f1"] >= 0.0
    assert set(scores) >= {"ce_precision", "ce_recall", "ce_f1"}
