"""AM-MRG: Hopfield associative-memory report generation.

Reference ``/root/reference/AM_MRG/models/AM_MRG.py:21-546``:
ARM-L encoder -> ``Qformer_proj`` (to 1408) -> Q-Former with 14 disease
query tokens -> two frozen-bank HopfieldLayer lookups (stage-1 CAM
visual memory ``[N+14, 768]`` and Bio_ClinicalBERT report memory) ->
LLM input = [visual ⊕ query ⊕ disease-memory ⊕ report-memory]
(``encode_img`` :266-295).

Memory banks are offline artifacts (SwinCheX CAM extraction + report
memory generation, SURVEY.md F3) passed as arrays at call time.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .hopfield import HopfieldLayer
from .llm import LLMConfig, TransformerLM
from .mamba import ARM
from .mrg import GenerateConfig, MRGMixin, _encode_views
from .qformer import QFormer


class AMMRG(nn.Module, MRGMixin):
    llm_cfg: LLMConfig
    arm_kwargs: Any = None
    qformer_dim: int = 768
    qformer_width: int = 1408
    num_disease_queries: int = 14
    qformer_layers: int = 12
    qformer_heads: int = 12
    # Reference HopfieldLayer config (AM_MRG.py:137-166): association
    # head_dim 1024 at input 768, 6 heads, beta = args.scaling (4.0).
    hopfield_hidden: int = 0  # 0 -> 4*qformer_dim//3 (1024 at 768)
    hopfield_heads: int = 6
    hopfield_scaling: float = 4.0

    def setup(self):
        self.vision = ARM(**(self.arm_kwargs or {}), name="vision")
        self.qformer_proj = nn.Dense(self.qformer_width, name="qformer_proj")
        self.qformer = QFormer(
            dim=self.qformer_dim,
            num_layers=self.qformer_layers,
            num_heads=self.qformer_heads,
            num_queries=self.num_disease_queries,
            name="qformer",
        )
        hh = self.hopfield_hidden or 4 * self.qformer_dim // 3
        self.visual_memory = HopfieldLayer(
            hidden=hh, num_heads=self.hopfield_heads,
            pattern_dim=self.qformer_dim, scaling=self.hopfield_scaling,
            name="visual_memory",
        )
        self.report_memory = HopfieldLayer(
            hidden=hh, num_heads=self.hopfield_heads,
            pattern_dim=self.qformer_dim, scaling=self.hopfield_scaling,
            name="report_memory",
        )
        self.llm = TransformerLM(self.llm_cfg, name="llm")
        self.visual_proj = nn.Dense(self.llm_cfg.dim, name="visual_proj")
        self.query_proj = nn.Dense(self.llm_cfg.dim, name="query_proj")
        self.dmem_proj = nn.Dense(self.llm_cfg.dim, name="dmem_proj")
        self.rmem_proj = nn.Dense(self.llm_cfg.dim, name="rmem_proj")

    def encode_img(self, images, visual_bank, report_bank,
                   deterministic=True):
        if images.ndim == 5:  # (B, V, H, W, 3): mean over views
            tokens = _encode_views(
                lambda x: self.vision(x, deterministic), images
            )
        else:
            tokens = self.vision(images, deterministic)  # (B, L, D)
        wide = self.qformer_proj(tokens)
        query = self.qformer(wide)  # (B, 14, qdim)
        dmem = self.visual_memory(query, visual_bank)
        rmem = self.report_memory(query, report_bank)
        return jnp.concatenate(
            [
                self.visual_proj(tokens),
                self.query_proj(query),
                self.dmem_proj(dmem),
                self.rmem_proj(rmem),
            ],
            axis=1,
        )

    def __call__(self, images, visual_bank, report_bank, before_ids,
                 after_ids, target_ids, target_mask, deterministic=True):
        img = self.encode_img(images, visual_bank, report_bank, deterministic)
        prompt = self._wrap(img, before_ids, after_ids)
        return self._loss(prompt, target_ids, target_mask)

    def generate(self, images, visual_bank, report_bank, before_ids,
                 after_ids, gcfg: GenerateConfig = GenerateConfig()):
        img = self.encode_img(images, visual_bank, report_bank, True)
        prompt = self._wrap(img, before_ids, after_ids)
        return self._generate(prompt, gcfg)
