"""R2GenKG: multi-modal knowledge-graph report generation.

Reference ``/root/reference/R2GenKG/models/R2GenKG.py:29-529``:
Swin encoder -> Q-Former disease tokens -> ``CrossAttentionLookup`` over
a 6943x768 disease-token bank ("check" tokens); R-GCN over 5
multi-granularity graph scales -> transformer fusion with scale/pos
embeddings -> bidirectional graph<->image cross-attention; LLM input =
[img ⊕ g2i ⊕ i2g ⊕ query ⊕ check] (``encode_img`` :228-269).

Graph tensors (node features per scale, edge_index, edge_type — the
offline M3KG artifacts, configs/config.py:18-33) are call-time inputs
with static padded shapes.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llm import LLMConfig, TransformerLM
from .mrg import GenerateConfig, MRGMixin, VisionEncoder
from .qformer import QFormer
from .rgcn import (
    RGCN,
    CrossAttentionLookup,
    MultiScaleSelfAttentionFusion,
    ResidualCrossAttentionBlock,
)


class R2GenKG(nn.Module, MRGMixin):
    llm_cfg: LLMConfig
    chosen: str = "swin"
    vision_kwargs: Any = None
    graph_dim: int = 768
    num_scales: int = 5
    num_disease_queries: int = 14
    qformer_layers: int = 2
    qformer_heads: int = 12
    num_fusion_heads: int = 8

    def setup(self):
        kw = {f"{self.chosen}_kwargs": self.vision_kwargs or {}}
        self.vision = VisionEncoder(chosen=self.chosen, **kw, name="vision")
        self.qformer = QFormer(
            dim=self.graph_dim,
            num_layers=self.qformer_layers,
            num_heads=self.qformer_heads,
            num_queries=self.num_disease_queries,
            name="qformer",
        )
        self.lookup = CrossAttentionLookup(dim=self.graph_dim, name="lookup")
        self.rgcns = [
            RGCN(hidden=self.graph_dim, out_dim=self.graph_dim,
                 name=f"rgcn{i}")
            for i in range(self.num_scales)
        ]
        self.fusion = MultiScaleSelfAttentionFusion(
            dim=self.graph_dim, num_scales=self.num_scales,
            num_heads=self.num_fusion_heads, name="fusion"
        )
        self.img_to_graph_dim = nn.Dense(self.graph_dim, name="img_to_graph_dim")
        self.g2i = ResidualCrossAttentionBlock(
            dim=self.graph_dim, num_heads=self.num_fusion_heads, name="g2i"
        )
        self.i2g = ResidualCrossAttentionBlock(
            dim=self.graph_dim, num_heads=self.num_fusion_heads, name="i2g"
        )
        self.llm = TransformerLM(self.llm_cfg, name="llm")
        self.img_proj = nn.Dense(self.llm_cfg.dim, name="img_proj")
        self.g2i_proj = nn.Dense(self.llm_cfg.dim, name="g2i_proj")
        self.i2g_proj = nn.Dense(self.llm_cfg.dim, name="i2g_proj")
        self.query_proj = nn.Dense(self.llm_cfg.dim, name="query_proj")
        self.check_proj = nn.Dense(self.llm_cfg.dim, name="check_proj")

    def encode_img(
        self,
        images,  # (B, V, H, W, 3)
        node_feats: Sequence[jax.Array],  # per scale (N_s+1, D_node)
        edge_indices: Sequence[jax.Array],  # per scale (2, E_s)
        edge_types: Sequence[jax.Array],  # per scale (E_s,)
        disease_bank: jax.Array,  # (M, graph_dim)
        deterministic=True,
    ):
        b, v = images.shape[:2]
        flat = images.reshape(b * v, *images.shape[2:])
        tokens = self.vision(flat, deterministic)
        tokens = tokens.reshape(b, v, *tokens.shape[1:]).mean(axis=1)

        query = self.qformer(tokens)  # (B, 14, graph_dim)
        check = self.lookup(query, disease_bank)

        scale_feats = []
        for i in range(self.num_scales):
            g = self.rgcns[i](node_feats[i], edge_indices[i], edge_types[i])
            scale_feats.append(
                jnp.broadcast_to(g[None, :-1], (b, g.shape[0] - 1, g.shape[1]))
            )  # drop dummy pad row
        fused = self.fusion(scale_feats)

        img_g = self.img_to_graph_dim(tokens)
        g2i = self.g2i(img_g, fused)  # graph info into image tokens
        i2g = self.i2g(fused, img_g)  # image info into graph nodes

        return jnp.concatenate(
            [
                self.img_proj(tokens),
                self.g2i_proj(g2i),
                self.i2g_proj(i2g),
                self.query_proj(query),
                self.check_proj(check),
            ],
            axis=1,
        )

    def __call__(self, images, node_feats, edge_indices, edge_types,
                 disease_bank, before_ids, after_ids, target_ids,
                 target_mask, deterministic=True):
        img = self.encode_img(
            images, node_feats, edge_indices, edge_types, disease_bank,
            deterministic,
        )
        prompt = self._wrap(img, before_ids, after_ids)
        return self._loss(prompt, target_ids, target_mask)

    def generate(self, images, node_feats, edge_indices, edge_types,
                 disease_bank, before_ids, after_ids,
                 gcfg: GenerateConfig = GenerateConfig()):
        img = self.encode_img(
            images, node_feats, edge_indices, edge_types, disease_bank, True
        )
        prompt = self._wrap(img, before_ids, after_ids)
        return self._generate(prompt, gcfg)
