"""GradCAM over SwinCheX tokens + AM-MRG memory-bank generators.

Re-designs ``/root/reference/AM_MRG/SwinCheX/cam.py:35-181``
(pytorch_grad_cam GradCAM with a Swin reshape_transform, per-disease
CAM.pkl) and the AM-MRG memory builders (``AM_MRG/models/AM_MRG.py:64-91``
visual memory = disease tokens ⊕ sampled CAM features;
``report_memory_generation.py:1-86`` label-proportional report memory).

GradCAM in JAX is one jax.grad: weights = GAP(d logit / d tokens),
cam = relu(sum_c w_c * token_c) reshaped onto the final-stage grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def swin_grad_cam(model, params, images: jax.Array, class_idx: int):
    """Returns (cam (B, g, g) in [0,1], tokens (B, L, C)).

    ``model`` is a :class:`..models.swin.SwinCheX`.
    """
    from ..models.swin import SwinCheX

    from ..ops.vit_block import training_trace

    tokens = model.apply(params, images, method=SwinCheX.tokens)

    def positive_logit(tok):
        # training_trace: grads flow through this apply — fused blocks
        # must pick the AD-friendly unfused path (ops/vit_block.py).
        with training_trace():
            logits = model.apply(
                params, tok, method=SwinCheX.logits_from_tokens
            )
        return logits[:, class_idx, 1].sum()

    grads = jax.grad(positive_logit)(tokens)  # (B, L, C)
    weights = grads.mean(axis=1, keepdims=True)  # GAP over tokens
    cam = jnp.maximum((weights * tokens).sum(-1), 0.0)  # (B, L)
    b, l = cam.shape
    g = int(round(l**0.5))
    cam = cam.reshape(b, g, g)
    cmin = cam.min(axis=(1, 2), keepdims=True)
    cmax = cam.max(axis=(1, 2), keepdims=True)
    return (cam - cmin) / jnp.maximum(cmax - cmin, 1e-8), tokens


def extract_cam_features(
    tokens: jax.Array, cam: jax.Array, top_n: int = 8
) -> np.ndarray:
    """Per-image top-N token features by CAM weight (the reference's
    sampled CAM features feeding the visual memory)."""
    b, l, c = tokens.shape
    flat = np.asarray(cam).reshape(b, l)
    toks = np.asarray(tokens)
    out = []
    for i in range(b):
        idx = np.argsort(-flat[i])[:top_n]
        out.append(toks[i, idx])
    return np.stack(out)  # (B, top_n, C)


def build_visual_memory(
    disease_tokens: np.ndarray,  # (14, D) stage-1 disease tokens
    cam_features: np.ndarray,  # (N, D) pooled CAM features across dataset
    max_features: int = 256,
    seed: int = 0,
) -> np.ndarray:
    """Visual memory bank [disease_tokens ⊕ sampled CAM features]
    (AM_MRG.py:64-91 -> lookup_weights [1, N+14, 768])."""
    rng = np.random.default_rng(seed)
    n = min(max_features, len(cam_features))
    idx = rng.choice(len(cam_features), n, replace=False)
    return np.concatenate([disease_tokens, cam_features[idx]], axis=0)


def build_report_memory(
    report_embs: np.ndarray,  # (M, D) report CLS embeddings
    labels: np.ndarray,  # (M, 14) binary labels
    size: int = 6000,
    seed: int = 0,
) -> np.ndarray:
    """Label-proportional sample of report embeddings
    (report_memory_generation.py:1-86)."""
    rng = np.random.default_rng(seed)
    m = len(report_embs)
    if m <= size:
        return report_embs
    counts = labels.sum(axis=0)
    probs = np.zeros(m)
    for c in range(labels.shape[1]):
        members = labels[:, c] == 1
        if members.sum() > 0:
            probs[members] += counts[c] / max(counts.sum(), 1) / members.sum()
    if probs.sum() == 0:
        probs = np.ones(m)
    probs = probs / probs.sum()
    idx = rng.choice(m, size, replace=False, p=probs)
    return report_embs[idx]
