"""MAC-RRG task model: R2GenGPT + concept (KG agent) + RAG embeddings.

Reference ``/root/reference/MAC_RRG/model/R2GenGPT.py:37-666``: Swin +
Llama-2 where the LLM prompt is [img ⊕ rag ⊕ concept ⊕ text]
(:361-387); the concept/rag tensors come from the host-side agents in
:mod:`..agents` over the draft report (iterative refinement: generate a
draft with the base model, run the agents on it, regenerate).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llm import LLMConfig, TransformerLM
from .mrg import GenerateConfig, MRGMixin, VisionEncoder, _encode_views


class MACRRG(nn.Module, MRGMixin):
    llm_cfg: LLMConfig
    chosen: str = "swin"
    vision_kwargs: Any = None
    use_feature_mean: bool = True

    def setup(self):
        kw = {f"{self.chosen}_kwargs": self.vision_kwargs or {}}
        self.vision = VisionEncoder(chosen=self.chosen, **kw, name="vision")
        self.llm = TransformerLM(self.llm_cfg, name="llm")
        self.proj_norm = nn.LayerNorm(name="proj_norm")
        self.proj = nn.Dense(self.llm_cfg.dim, name="proj")
        self.rag_proj = nn.Dense(self.llm_cfg.dim, name="rag_proj")
        self.concept_proj = nn.Dense(self.llm_cfg.dim, name="concept_proj")

    def encode_img(self, images, rag_embeds, concept_embeds,
                   deterministic=True):
        tokens = _encode_views(
            lambda x: self.vision(x, deterministic), images,
            self.use_feature_mean,
        )
        return jnp.concatenate(
            [
                self.proj(self.proj_norm(tokens)),
                self.rag_proj(rag_embeds),
                self.concept_proj(concept_embeds),
            ],
            axis=1,
        )

    def __call__(self, images, rag_embeds, concept_embeds, before_ids,
                 after_ids, target_ids, target_mask, deterministic=True):
        img = self.encode_img(
            images, rag_embeds, concept_embeds, deterministic
        )
        prompt = self._wrap(img, before_ids, after_ids)
        return self._loss(prompt, target_ids, target_mask)

    def generate(self, images, rag_embeds, concept_embeds, before_ids,
                 after_ids, gcfg: GenerateConfig = GenerateConfig()):
        img = self.encode_img(images, rag_embeds, concept_embeds, True)
        prompt = self._wrap(img, before_ids, after_ids)
        return self._generate(prompt, gcfg)
