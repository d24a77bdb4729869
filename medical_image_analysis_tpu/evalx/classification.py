"""Classification metrics: per-label accuracy, AUC, attribute metrics.

Reference: ``AM_MRG/SwinCheX/main.py:271-360`` (per-head accuracy +
sklearn roc_auc_score) and the DP pedestrian-style metrics
(``HD.../finetune/DP/tools/function.py:132``: label-wise mean accuracy +
instance-level prec/rec/F1).
"""

from __future__ import annotations

import numpy as np


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Binary AUC via rank statistic (ties averaged)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_scores = np.concatenate([pos, neg])[order]
    ranks[order] = np.arange(1, len(order) + 1)
    # average ranks for ties
    uniq, inv, counts = np.unique(
        sorted_scores, return_inverse=True, return_counts=True
    )
    cum = np.cumsum(counts)
    avg_rank = (cum - (counts - 1) / 2.0)
    tied = avg_rank[inv]
    ranks_in_order = np.empty(len(order), np.float64)
    ranks_in_order[order] = tied
    r_pos = ranks_in_order[: len(pos)].sum()
    return float(
        (r_pos - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))
    )


def multilabel_auc(scores: np.ndarray, labels: np.ndarray) -> dict:
    """scores/labels (N, C) -> per-label AUC + mean (SwinCheX validate)."""
    aucs = [roc_auc(scores[:, c], labels[:, c]) for c in range(scores.shape[1])]
    valid = [a for a in aucs if not np.isnan(a)]
    return {"auc_per_label": aucs,
            "auc_mean": float(np.mean(valid)) if valid else float("nan")}


def per_label_accuracy(logits2: np.ndarray, labels: np.ndarray) -> dict:
    """logits2 (N, C, 2) softmax-head predictions."""
    pred = logits2.argmax(-1)
    acc = (pred == labels).mean(axis=0)
    return {"acc_per_label": acc.tolist(), "acc_mean": float(acc.mean())}


def pedestrian_metrics(preds: np.ndarray, labels: np.ndarray,
                       threshold: float = 0.5) -> dict:
    """DP attribute metrics (tools/function.py get_pedestrian_metrics):
    label-wise mean accuracy + instance prec/rec/F1/acc."""
    p = (preds > threshold).astype(np.float64)
    g = labels.astype(np.float64)
    eps = 1e-20
    # label-wise
    tp = ((p == 1) & (g == 1)).sum(0)
    tn = ((p == 0) & (g == 0)).sum(0)
    pos = (g == 1).sum(0)
    neg = (g == 0).sum(0)
    label_ma = float(((tp / (pos + eps) + tn / (neg + eps)) / 2).mean())
    # instance-wise
    inter = ((p == 1) & (g == 1)).sum(1)
    union = ((p == 1) | (g == 1)).sum(1)
    acc = float((inter / (union + eps)).mean())
    prec = float((inter / (p.sum(1) + eps)).mean())
    rec = float((inter / (g.sum(1) + eps)).mean())
    f1 = 2 * prec * rec / (prec + rec + eps)
    return {"ma": label_ma, "instance_acc": acc, "instance_prec": prec,
            "instance_rec": rec, "instance_f1": f1}
