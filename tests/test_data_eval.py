"""Data layer + NLG/classification metrics."""

import numpy as np
import pytest

from medical_image_analysis_tpu.data.datasets import (
    MRGBatcher,
    drop_unclear_reports,
    prefetch,
    sample_context_ids,
    synthetic_annotations,
    synthetic_image_loader,
)
from medical_image_analysis_tpu.data.report_cleaning import clean_report
from medical_image_analysis_tpu.data.tokenizer import WordTokenizer
from medical_image_analysis_tpu.evalx.bleu import bleu
from medical_image_analysis_tpu.evalx.cider import cider
from medical_image_analysis_tpu.evalx.classification import (
    multilabel_auc,
    pedestrian_metrics,
    roc_auc,
)
from medical_image_analysis_tpu.evalx.meteor import meteor
from medical_image_analysis_tpu.evalx.nlg import compute_nlg_scores
from medical_image_analysis_tpu.evalx.rouge import rouge_l


def test_clean_report_iu():
    raw = "1. The lungs are clear.. 2. No effusion, seen!  "
    out = clean_report(raw, "iu_xray")
    assert out == "the lungs are clear . no effusion seen ."


def test_clean_report_mimic():
    raw = "FINDINGS:\nThe   heart is normal..  1. Lungs clear."
    out = clean_report(raw, "mimic_cxr")
    assert "\n" not in out and ".." not in out
    assert out.endswith(" .")


def test_tokenizer_roundtrip():
    tok = WordTokenizer.from_corpus(
        ["the lungs are clear .", "the heart is normal ."], min_freq=1
    )
    ids = tok.encode("the lungs are clear .", add_bos=True, add_eos=True)
    assert ids[0] == tok.BOS and ids[-1] == tok.EOS
    assert tok.decode(ids) == "the lungs are clear ."
    padded, mask = tok.pad(ids, 12)
    assert len(padded) == 12 and sum(mask) == len(ids)


def test_batcher_shapes_and_context():
    ann = synthetic_annotations(n_train=10)
    tok = WordTokenizer.from_corpus(
        [s.report for s in ann["train"]], min_freq=1
    )
    b = MRGBatcher(
        ann["train"], tok, synthetic_image_loader(32), batch_size=4,
        max_len=24, n_context=2,
    )
    batches = list(prefetch(b.batches()))
    assert len(batches) == 2  # 10 // 4 drop_last
    bt = batches[0]
    assert bt["images"].shape == (4, 2, 32, 32, 3)
    assert bt["target_ids"].shape == (4, 24)
    assert bt["context_images"].shape == (4, 4, 32, 32, 3)  # 2 pos + 2 neg


def test_context_sampling_keyword():
    ann = synthetic_annotations(n_train=30)
    rng = np.random.default_rng(0)
    pos, neg = sample_context_ids(rng, ann["train"], 3, mode="keyword",
                                  keyword="effusion")
    for i in pos:
        assert "effusion" in ann["train"][i].report


def test_drop_unclear():
    ann = synthetic_annotations(n_train=5)
    ann["train"][0].report = "no ."
    kept = drop_unclear_reports(ann["train"])
    assert len(kept) == 4


def test_bleu_perfect_and_partial():
    gts = {"a": ["the cat sat on the mat"]}
    res = {"a": ["the cat sat on the mat"]}
    s = bleu(gts, res)
    assert all(abs(x - 1.0) < 1e-6 for x in s)
    res2 = {"a": ["the cat sat"]}
    s2 = bleu(gts, res2)
    assert s2[0] < 1.0  # brevity penalty
    assert s2[3] < s2[0]


def test_rouge_lcs():
    gts = {"a": ["the cat sat on the mat"]}
    assert abs(rouge_l(gts, {"a": ["the cat sat on the mat"]}) - 1.0) < 1e-9
    partial = rouge_l(gts, {"a": ["the dog sat on a mat"]})
    assert 0.0 < partial < 1.0


def test_cider_idf_behavior():
    gts = {
        "a": ["the lungs are clear"],
        "b": ["there is a pleural effusion"],
    }
    res_good = {"a": ["the lungs are clear"],
                "b": ["there is a pleural effusion"]}
    res_bad = {"a": ["there is a pleural effusion"],
               "b": ["the lungs are clear"]}
    assert cider(gts, res_good) > cider(gts, res_bad)
    assert cider(gts, res_good) > 5.0  # perfect match ~ 10


def test_meteor_ordering():
    gts = {"a": ["the cat sat on the mat"]}
    perfect = meteor(gts, {"a": ["the cat sat on the mat"]})
    scrambled = meteor(gts, {"a": ["mat the on sat cat the"]})
    unrelated = meteor(gts, {"a": ["dogs bark loudly outside"]})
    assert perfect > scrambled > unrelated
    # stemming: 'sitting' should partially match 'sit'? (suffix stem)
    stemmed = meteor({"a": ["walking home"]}, {"a": ["walk home"]})
    assert stemmed > 0.5


def test_nlg_aggregator_keys():
    gts = {"a": ["the lungs are clear ."]}
    res = {"a": ["the lungs are clear ."]}
    out = compute_nlg_scores(gts, res)
    assert set(out) == {
        "Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L", "METEOR",
        "CIDEr",
    }


def test_roc_auc_matches_known():
    scores = np.array([0.1, 0.4, 0.35, 0.8])
    labels = np.array([0, 0, 1, 1])
    assert abs(roc_auc(scores, labels) - 0.75) < 1e-9
    out = multilabel_auc(
        np.stack([scores, scores], 1), np.stack([labels, labels], 1)
    )
    assert abs(out["auc_mean"] - 0.75) < 1e-9


def test_pedestrian_metrics():
    preds = np.array([[0.9, 0.1], [0.8, 0.7]])
    labels = np.array([[1, 0], [1, 1]])
    m = pedestrian_metrics(preds, labels)
    assert m["instance_prec"] == 1.0
    # label 0 has no negative samples -> its specificity term is 0,
    # so ma = mean(0.5, 1.0) = 0.75.
    assert abs(m["ma"] - 0.75) < 1e-9
