"""EMRRG: partial-LoRA Mamba encoder + hybrid gated cross-attn decoder.

Reference ``/root/reference/EMRRG/models/MambaXrayVL_DownStream.py:49-585``:
ARM encoder (partial LoRA on the in_proj X-half — applied as a
param-tree transform in :mod:`..peft.lora`, not monkey-patching) with
slow/fast visual token split via stride-2 average pooling (:209-228):
*slow* (pooled) tokens enter the LLM prompt; *fast* (full-resolution)
tokens feed the hybrid layers' vision cross-attention.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .hybrid_decoder import HybridTransformerLM
from .llm import LLMConfig
from .mamba import ARM
from .mrg import GenerateConfig, MRGMixin, _encode_views


def slow_fast_split(tokens: jax.Array, cls_pos: int):
    """fast = all spatial tokens; slow = 2x2 stride-2 avg-pooled grid.

    tokens: (B, L+1, D) with cls at ``cls_pos``.
    """
    b, l1, d = tokens.shape
    cls = tokens[:, cls_pos : cls_pos + 1]
    rest = jnp.concatenate(
        [tokens[:, :cls_pos], tokens[:, cls_pos + 1 :]], axis=1
    )
    g = int(math.isqrt(l1 - 1))
    grid = rest.reshape(b, g, g, d)
    slow = jax.lax.reduce_window(
        grid, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    slow = slow.reshape(b, (g // 2) * (g // 2), d)
    fast = rest
    return jnp.concatenate([cls, slow], axis=1), fast


class EMRRG(nn.Module, MRGMixin):
    llm_cfg: LLMConfig
    arm_kwargs: Any = None
    cross_every: int = 4
    gate_fn: str = "tanh"
    text_only_cross: bool = False  # onlytext2media variant (:699-779)

    def setup(self):
        self.vision = ARM(**(self.arm_kwargs or {}), name="vision")
        self.llm = HybridTransformerLM(
            self.llm_cfg, cross_every=self.cross_every,
            gate_fn=self.gate_fn, text_only_cross=self.text_only_cross,
            name="llm",
        )
        self.proj_norm = nn.LayerNorm(name="proj_norm")
        self.proj = nn.Dense(self.llm_cfg.dim, name="proj")
        self.fast_proj = nn.Dense(self.llm_cfg.dim, name="fast_proj")

    def encode_img(self, images, deterministic=True):
        # (B, V, H, W, 3) batches mean over views (use_feature_mean);
        # cls stays at the middle position after the mean.
        if images.ndim == 5:
            tokens = _encode_views(
                lambda x: self.vision(x, deterministic), images
            )
        else:
            tokens = self.vision(images, deterministic)  # (B, L+1, D)
        cls_pos = (tokens.shape[1] - 1) // 2
        slow, fast = slow_fast_split(tokens, cls_pos)
        return (
            self.proj(self.proj_norm(slow)),
            self.fast_proj(fast),
        )

    def __call__(self, images, before_ids, after_ids, target_ids,
                 target_mask, deterministic=True):
        slow, fast = self.encode_img(images, deterministic)
        prompt = self._wrap(slow, before_ids, after_ids)
        kwargs = {"vision": fast}
        if self.text_only_cross:
            # gate cross-attention off on the visual token span.
            b = prompt.shape[0]
            lb, lv = before_ids.shape[1], slow.shape[1]
            la, lt = after_ids.shape[1], target_ids.shape[1]
            kwargs["text_mask"] = jnp.concatenate(
                [jnp.ones((b, lb)), jnp.zeros((b, lv)),
                 jnp.ones((b, la + lt))], axis=1,
            )
        return self._loss(prompt, target_ids, target_mask, **kwargs)

    def generate(self, images, before_ids, after_ids,
                 gcfg: GenerateConfig = GenerateConfig()):
        slow, fast = self.encode_img(images, True)
        prompt = self._wrap(slow, before_ids, after_ids)
        return self._generate(prompt, gcfg, vision=fast)
