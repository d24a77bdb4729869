"""Post-LN BERT encoder + BLIP-2 Q-Former (checkpoint-compatible).

Faithful re-implementations (not ports) of the towers the reference
loads pretrained weights into:

- ``BertModel``: HF ``bert-base``-style post-LN encoder — the
  Bio_ClinicalBERT text tower used for CLIP alignment
  (``CXPMRG_Bench_MambaXray_VL/models/MambaXrayVL_CLIP.py:86-91``),
  report-memory embedding (``AM_MRG/models/report_memory_generation.py``)
  and the learned CheXbert labeler
  (``HD_Xray_Pretrain_MAE/finetune/RG_english/compute_ce.py``).
- ``Blip2QFormer``: the BLIP-2 Q-Former — a BERT encoder with learnable
  query tokens, cross-attention into image features every
  ``cross_attention_freq`` layers, and a separate query-position FFN
  (``intermediate_query``/``output_query``), plus an optional text path
  (``AM_MRG/models/Qformer.py`` 1216 LoC; ``AM_MRG.py:206-234`` loads
  ``blip2_pretrained_flant5xxl.pth`` into it).

Import maps live in :mod:`..ckpt.torch_import` (``bert_hf_to_flax``,
``blip2_qformer_to_flax``) with output-parity tests against
``transformers`` BertModel / Blip2QFormerModel.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    eps: float = 1e-12
    # Q-Former extras (0 / False = plain BERT)
    cross_attention_freq: int = 0
    query_ffn: bool = False  # BLIP-2 intermediate_query/output_query
    use_embeddings: bool = True  # word/pos/type embeddings present


def _mask_bias(mask):
    return jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)


class BertAttention(nn.Module):
    """self.{query,key,value} + output.{dense,LayerNorm} (post-LN)."""

    dim: int
    n_heads: int
    eps: float

    @nn.compact
    def __call__(self, x, kv, bias):
        nh, hd = self.n_heads, self.dim // self.n_heads
        b, lq, _ = x.shape
        q = nn.Dense(self.dim, name="query")(x).reshape(b, lq, nh, hd)
        k = nn.Dense(self.dim, name="key")(kv).reshape(b, -1, nh, hd)
        v = nn.Dense(self.dim, name="value")(kv).reshape(b, -1, nh, hd)
        a = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
        if bias is not None:
            a = a + bias
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, lq, self.dim)
        o = nn.Dense(self.dim, name="out")(o)
        return nn.LayerNorm(epsilon=self.eps, name="out_norm")(o + x)


class BertFFN(nn.Module):
    dim: int
    intermediate: int
    eps: float

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.intermediate, name="dense_in")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="dense_out")(h)
        return nn.LayerNorm(epsilon=self.eps, name="norm")(h + x)


class BertLayer(nn.Module):
    cfg: BertConfig
    has_cross: bool

    @nn.compact
    def __call__(self, x, self_bias, enc=None, enc_bias=None,
                 query_length: int = 0):
        c = self.cfg
        x = BertAttention(c.dim, c.n_heads, c.eps, name="attention")(
            x, x, self_bias
        )
        if self.has_cross and enc is not None:
            if query_length and query_length < x.shape[1]:
                # only query positions cross-attend (Qformer.py:429-447)
                qpart = BertAttention(
                    c.dim, c.n_heads, c.eps, name="crossattention"
                )(x[:, :query_length], enc, enc_bias)
                x = jnp.concatenate([qpart, x[:, query_length:]], axis=1)
            else:
                x = BertAttention(
                    c.dim, c.n_heads, c.eps, name="crossattention"
                )(x, enc, enc_bias)
        if c.query_ffn:
            ql = query_length if query_length else x.shape[1]
            qout = BertFFN(
                c.dim, c.intermediate, c.eps, name="ffn_query"
            )(x[:, :ql])
            if ql < x.shape[1]:
                tout = BertFFN(c.dim, c.intermediate, c.eps, name="ffn")(
                    x[:, ql:]
                )
                return jnp.concatenate([qout, tout], axis=1)
            return qout
        return BertFFN(c.dim, c.intermediate, c.eps, name="ffn")(x)


class BertModel(nn.Module):
    """Post-LN BERT; optionally with query tokens + cross-attention.

    __call__ returns the last hidden state (B, L', D); ``pool='cls'``
    additionally applies the tanh pooler on position 0.
    """

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids=None,
        attention_mask=None,
        token_type_ids=None,
        query_embeds=None,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        pool: str | None = None,
    ):
        c = self.cfg
        parts = []
        if query_embeds is not None:
            parts.append(query_embeds)
        ql = 0 if query_embeds is None else query_embeds.shape[1]
        if input_ids is not None:
            we = nn.Embed(c.vocab_size, c.dim, name="word_embeddings")(
                input_ids
            )
            lp = input_ids.shape[1]
            pos = self.param(
                "position_embeddings", nn.initializers.normal(0.02),
                (c.max_position, c.dim),
            )
            we = we + pos[None, :lp]
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            we = we + nn.Embed(
                c.type_vocab, c.dim, name="token_type_embeddings"
            )(token_type_ids)
            parts.append(we)
        x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        x = nn.LayerNorm(epsilon=c.eps, name="embeddings_norm")(x)

        b, total = x.shape[:2]
        if attention_mask is None:
            attention_mask = jnp.ones((b, total - ql), jnp.int32)
        full_mask = jnp.concatenate(
            [jnp.ones((b, ql), attention_mask.dtype), attention_mask],
            axis=1,
        ) if ql else attention_mask
        self_bias = _mask_bias(full_mask)
        enc_bias = (
            _mask_bias(encoder_attention_mask)
            if encoder_attention_mask is not None
            else None
        )

        for i in range(c.n_layers):
            has_cross = (
                c.cross_attention_freq > 0
                and i % c.cross_attention_freq == 0
            )
            x = BertLayer(c, has_cross, name=f"layer_{i}")(
                x, self_bias, encoder_hidden_states, enc_bias,
                query_length=ql,
            )
        if pool == "cls":
            return nn.tanh(
                nn.Dense(c.dim, name="pooler")(x[:, 0])
            )
        return x


class Blip2QFormer(nn.Module):
    """BLIP-2 Q-Former: learnable queries (+ optional text) over a BERT
    encoder with periodic cross-attention into image features.

    __call__(image_embeds, input_ids=None, attention_mask=None) ->
    (B, num_queries [+ L_text], dim).
    """

    num_queries: int = 32
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    intermediate: int = 3072
    cross_attention_freq: int = 2
    vocab_size: int = 30522
    eps: float = 1e-12

    @nn.compact
    def __call__(self, image_embeds, input_ids=None, attention_mask=None):
        cfg = BertConfig(
            vocab_size=self.vocab_size, dim=self.dim,
            n_layers=self.n_layers, n_heads=self.n_heads,
            intermediate=self.intermediate, eps=self.eps,
            cross_attention_freq=self.cross_attention_freq,
            query_ffn=True,
        )
        queries = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, self.num_queries, self.dim),
        )
        b = image_embeds.shape[0]
        q = jnp.broadcast_to(queries, (b, self.num_queries, self.dim))
        enc_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
        return BertModel(cfg, name="bert")(
            input_ids=input_ids,
            attention_mask=attention_mask,
            query_embeds=q.astype(image_embeds.dtype),
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=enc_mask,
        )
