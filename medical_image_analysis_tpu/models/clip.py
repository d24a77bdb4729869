"""CLIP alignment heads + symmetric InfoNCE (MambaXray-VL stage 2).

Reference: ``/root/reference/CXPMRG_Bench_MambaXray_VL/models/MambaXrayVL_CLIP.py:93-150``
(linear vision/text projections to 2048-d, learnable logit_scale init
1/0.07, symmetric cross-entropy).

On a device mesh the batch is the contrastive pool; for global-batch
InfoNCE across data-parallel shards use ``parallel.collectives.
all_gather_batch`` before calling :func:`clip_loss`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class CLIPHead(nn.Module):
    proj_dim: int = 2048

    @nn.compact
    def __call__(self, image_feats: jax.Array, text_feats: jax.Array):
        v = nn.Dense(self.proj_dim, name="vision_proj")(image_feats)
        t = nn.Dense(self.proj_dim, name="text_proj")(text_feats)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-6)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-6)
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1.0 / 0.07)),
            (),
        )
        scale = jnp.exp(logit_scale)
        return v, t, scale


def clip_loss(v: jax.Array, t: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over the (global) batch."""
    logits = scale * v @ t.T  # (B, B)
    labels = jnp.arange(v.shape[0])
    li = -jnp.mean(
        jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=1), labels[:, None], axis=1
        )
    )
    lt = -jnp.mean(
        jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=0), labels[None, :], axis=0
        )
    )
    return 0.5 * (li + lt)
