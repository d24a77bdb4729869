"""Q-Former: BERT-style query transformer with periodic cross-attention.

Re-designs the BLIP-2 Q-Former used by AM-MRG / R2GenKG
(``/root/reference/AM_MRG/models/Qformer.py`` 1216 LoC;
``AM_MRG/models/AM_MRG.py:206-234`` — 14 learnable disease query tokens,
cross-attention every ``cross_attention_freq`` layers) and the mini
2-layer / 64-query projector variant of R2GenCSR
(``R2GenCSR/models/R2GenCSR.py:24-54``).

Query-only mode (the only mode the reference exercises at runtime):
learnable queries self-attend and periodically cross-attend into image
features. Post-LN BERT block structure.
"""

from __future__ import annotations

import flax.linen as nn
import jax


class QFormer(nn.Module):
    """BLIP-2-faithful Q-Former (delegates to :class:`.bert.Blip2QFormer`):
    learnable queries over a post-LN BERT encoder, cross-attention into
    image features every ``cross_attention_freq`` layers, separate
    query-position FFN, optional text path — loadable from
    ``blip2_pretrained_flant5xxl.pth`` via
    :func:`..ckpt.torch_import.blip2_qformer_to_flax`.

    __call__(image_feats (B, L, enc_dim)[, input_ids, attention_mask])
    -> (B, num_queries [+ L_text], dim)
    """

    dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    num_queries: int = 14
    cross_attention_freq: int = 2
    intermediate: int = 3072

    @nn.compact
    def __call__(self, encoder_states: jax.Array, input_ids=None,
                 attention_mask=None) -> jax.Array:
        from .bert import Blip2QFormer

        return Blip2QFormer(
            num_queries=self.num_queries,
            dim=self.dim,
            n_layers=self.num_layers,
            n_heads=self.num_heads,
            intermediate=self.intermediate,
            cross_attention_freq=self.cross_attention_freq,
            name="blip2",
        )(encoder_states, input_ids, attention_mask)


class EncoderProjectorQFormer(nn.Module):
    """Mini Q-Former projector (R2GenCSR.py:24-54): 2 layers, 64 queries,
    projecting vision features into the LLM embedding space."""

    dim: int = 768
    out_dim: int = 4096
    num_queries: int = 64
    num_layers: int = 2
    num_heads: int = 12

    @nn.compact
    def __call__(self, image_feats: jax.Array) -> jax.Array:
        q = QFormer(
            dim=self.dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            num_queries=self.num_queries,
            cross_attention_freq=1,
            intermediate=self.dim * 4,
            name="qformer",
        )(image_feats)
        return nn.Dense(self.out_dim, name="linear")(q)
