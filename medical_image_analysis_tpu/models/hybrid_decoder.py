"""Hybrid gated cross-attention LLM decoder (EMRRG).

Re-designs ``/root/reference/EMRRG/models/hybrid_decoder_layer.py``
(1494 LoC: ``Qwen2HybridFlashAttention2`` :605-933,
``all2media_cross_attn`` :653-699, ``onlytext2media_cross_attn``
:699-779, ``Qwen2HybridDecoderLayer`` :1331+): every Nth decoder layer
adds vision cross-attention that *shares the self-attention queries*,
projects K/V from vision features (``cross_attn_kv_proj``), and blends
via a dynamic tanh or sigmoid gate (``cross_attn_gate_proj``).

Here the hybrid layer wraps the same Llama/Qwen block primitives as
:mod:`.llm` (flash attention is XLA-fused attention on TPU — no custom
kernel needed at these short lengths), and vision features are passed
functionally instead of the reference's ``condition_vis_x`` mutation.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llm import (
    LLMConfig,
    LlamaMLP,
    _ancestry_decode_attn,
    _rope,
    _split_ancestry_decode_attn,
)


class HybridAttention(nn.Module):
    """Self-attention + gated vision cross-attention with shared queries."""

    cfg: LLMConfig
    gate_fn: str = "tanh"  # tanh | sigmoid
    text_only_cross: bool = False

    @nn.compact
    def __call__(self, x, positions, mask, vision, layer_cache=None,
                 text_mask=None, beam=None):
        cfg = self.cfg
        b, l, _ = x.shape
        nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        # attn_bias: the reference hybrid layer inherits the pretrained
        # Qwen2 attention weights incl. biases (load_state_dict of the
        # original layer, MambaXrayVL_DownStream.py:196-206).
        q = nn.Dense(nh * hd, use_bias=cfg.attn_bias, dtype=cfg.dtype,
                     name="q_proj")(x)
        k = nn.Dense(nkv * hd, use_bias=cfg.attn_bias, dtype=cfg.dtype,
                     name="k_proj")(x)
        v = nn.Dense(nkv * hd, use_bias=cfg.attn_bias, dtype=cfg.dtype,
                     name="v_proj")(x)
        q = q.reshape(b, l, nh, hd)
        k = k.reshape(b, l, nkv, hd)
        v = v.reshape(b, l, nkv, hd)
        q_rot, k_rot = _rope(q, k, positions, cfg.rope_theta)

        if layer_cache is not None and len(layer_cache) == 5:
            # Split beam cache (llm.split_beam_cache): shared prompt
            # segment + per-beam generated segment.
            kp, vp, kg, vg, cur = layer_cache
            kg = jax.lax.dynamic_update_slice(
                kg, k_rot.astype(kg.dtype), (0, cur, 0, 0)
            )
            vg = jax.lax.dynamic_update_slice(
                vg, v.astype(vg.dtype), (0, cur, 0, 0)
            )
            new_cache = (kp, vp, kg, vg, cur + l)
            if nkv != nh:
                rep = nh // nkv
                kp, vp, kg, vg = (
                    jnp.repeat(t, rep, axis=2) for t in (kp, vp, kg, vg)
                )
            mask_p, mask_g = mask
            self_out = _split_ancestry_decode_attn(
                q_rot, kp, vp, kg, vg, mask_p, mask_g, beam, hd
            ).reshape(b, l, nh * hd)
            return self._cross_merge(
                x, q, self_out, vision, text_mask, b, l, nh, nkv, hd
            ), new_cache

        if layer_cache is not None:
            ck, cv, cur = layer_cache
            ck = jax.lax.dynamic_update_slice(
                ck, k_rot.astype(ck.dtype), (0, cur, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, cur, 0, 0)
            )
            k_all, v_all = ck, cv
            new_cache = (ck, cv, cur + l)
        else:
            k_all, v_all = k_rot, v
            new_cache = None

        if nkv != nh:
            rep = nh // nkv
            k_all = jnp.repeat(k_all, rep, axis=2)
            v_all = jnp.repeat(v_all, rep, axis=2)
        if beam is not None and l == 1:
            # Append-only beam cache: ancestry resolved inside attention
            # (models/llm.py _ancestry_decode_attn). Vision cross-attn
            # below needs no reorder — vision rows are beam-replicated.
            self_out = _ancestry_decode_attn(
                q_rot, k_all, v_all, mask, beam, hd
            ).reshape(b, l, nh * hd)
        else:
            # bf16 operands + fp32 accumulation: exact products, no
            # multi-pass fp32 MXU matmul (see models/llm.py LlamaAttention).
            attn = jnp.einsum(
                "blhd,bshd->bhls", q_rot, k_all,
                preferred_element_type=jnp.float32,
            ) * hd**-0.5
            attn = jax.nn.softmax(attn + mask, axis=-1)
            self_out = jnp.einsum(
                "bhls,bshd->blhd", attn.astype(v_all.dtype), v_all
            ).reshape(b, l, nh * hd)

        return self._cross_merge(
            x, q, self_out, vision, text_mask, b, l, nh, nkv, hd
        ), new_cache

    def _cross_merge(self, x, q, self_out, vision, text_mask, b, l, nh,
                     nkv, hd):
        """Vision cross-attention with the SAME (un-rotated) queries,
        blended into ``self_out`` via the dynamic gate + o_proj."""
        cfg = self.cfg
        kv = nn.Dense(
            2 * nkv * hd, use_bias=False, dtype=cfg.dtype,
            name="cross_attn_kv_proj",
        )(vision)
        ck_, cv_ = jnp.split(kv.reshape(b, -1, 2 * nkv, hd), 2, axis=2)
        if nkv != nh:
            rep = nh // nkv
            ck_ = jnp.repeat(ck_, rep, axis=2)
            cv_ = jnp.repeat(cv_, rep, axis=2)
        xattn = jnp.einsum(
            "blhd,bshd->bhls", q, ck_,
            preferred_element_type=jnp.float32,
        ) * hd**-0.5
        xattn = jax.nn.softmax(xattn, axis=-1)
        cross_out = jnp.einsum(
            "bhls,bshd->blhd", xattn.astype(cv_.dtype), cv_
        ).reshape(b, l, nh * hd)

        gate = nn.Dense(
            nh * hd, use_bias=False, dtype=cfg.dtype,
            name="cross_attn_gate_proj",
        )(x)
        gate = jnp.tanh(gate) if self.gate_fn == "tanh" else nn.sigmoid(gate)
        if self.text_only_cross and text_mask is not None:
            gate = gate * text_mask[..., None].astype(gate.dtype)
        merged = self_out + gate * cross_out
        return nn.Dense(
            cfg.dim, use_bias=False, dtype=cfg.dtype, name="o_proj"
        )(merged)


class HybridDecoderLayer(nn.Module):
    cfg: LLMConfig
    gate_fn: str = "tanh"
    text_only_cross: bool = False

    @nn.compact
    def __call__(self, x, positions, mask, vision, layer_cache=None,
                 text_mask=None, beam=None):
        cfg = self.cfg
        h = nn.RMSNorm(epsilon=cfg.norm_eps, name="input_layernorm")(x)
        attn_out, new_cache = HybridAttention(
            cfg, self.gate_fn, self.text_only_cross, name="self_attn"
        )(h, positions, mask, vision, layer_cache, text_mask, beam)
        x = x + attn_out
        h = nn.RMSNorm(epsilon=cfg.norm_eps, name="post_attention_layernorm")(x)
        return x + LlamaMLP(cfg, name="mlp")(h), new_cache


class HybridTransformerLM(nn.Module):
    """TransformerLM where every ``cross_every``-th layer is hybrid
    (vision cross-attention), mirroring EMRRG's
    ``_initialize_hybrid_decoder_layers``
    (``EMRRG/models/MambaXrayVL_DownStream.py:176-208``).

    Same call convention as :class:`..llm.TransformerLM` plus a required
    ``vision`` argument (B, Lv, dim).
    """

    cfg: LLMConfig
    cross_every: int = 4
    gate_fn: str = "tanh"
    text_only_cross: bool = False

    def setup(self):
        from .llm import LlamaBlock  # avoid cycle at module import

        cfg = self.cfg
        layers = []
        for i in range(cfg.n_layers):
            # reference placement: layers 0, n, 2n, ...
            # (_initialize_hybrid_decoder_layers: range(0, L, n))
            if i % self.cross_every == 0:
                layers.append(
                    HybridDecoderLayer(
                        cfg, self.gate_fn, self.text_only_cross,
                        name=f"layers_{i}",
                    )
                )
            else:
                layers.append(LlamaBlock(cfg, name=f"layers_{i}"))
        self.layers = layers
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.dim, dtype=cfg.dtype, name="embed_tokens"
        )
        self.final_norm = nn.RMSNorm(epsilon=cfg.norm_eps, name="norm")
        self.lm_head = nn.Dense(
            cfg.vocab_size, use_bias=False, dtype=jnp.float32, name="lm_head"
        )

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(self, input_ids=None, inputs_embeds=None, vision=None,
                 attention_mask=None, positions=None, cache=None,
                 cache_mask=None, text_mask=None, beam=None):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        x = inputs_embeds.astype(cfg.dtype)
        b, l, _ = x.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(l), (b, l))

        if cache is not None and len(cache[0]) == 5:
            # Split beam cache — see models/llm.py TransformerLM.
            assert l == 1 and beam is not None
            sp = cache[0][0].shape[1]
            sg = cache[0][2].shape[1]
            cur = cache[0][4]
            bp = cache[0][0].shape[0]
            if cache_mask is not None:
                mask_p = jnp.where(
                    cache_mask[:, None, None, :sp] > 0, 0.0, -jnp.inf
                )
            else:
                mask_p = jnp.zeros((bp, 1, 1, sp))
            mask_g = jnp.where(
                jnp.arange(sg)[None, None, None, :] <= cur, 0.0, -jnp.inf
            )
            mask = (mask_p, mask_g)
        elif cache is not None:
            cur = cache[0][2]
            s = cache[0][0].shape[1]
            kpos = jnp.arange(s)[None, None, :]
            slot_ok = kpos <= (cur + jnp.arange(l)[None, :, None])
            mask = jnp.where(slot_ok, 0.0, -jnp.inf)
            if cache_mask is not None:
                mask = mask + jnp.where(
                    cache_mask[:, None, :] > 0, 0.0, -jnp.inf
                )
            mask = mask[:, None, :, :]
        else:
            causal = jnp.tril(jnp.ones((l, l), jnp.bool_))
            mask = jnp.where(causal[None, None], 0.0, -jnp.inf)
            if attention_mask is not None:
                mask = mask + jnp.where(
                    attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf
                )

        new_cache = [] if cache is not None else None
        for i, layer in enumerate(self.layers):
            layer_cache = cache[i] if cache is not None else None
            if isinstance(layer, HybridDecoderLayer):
                x, lc = layer(x, positions, mask, vision, layer_cache,
                              text_mask, beam)
            else:
                x, lc = layer(x, positions, mask, layer_cache, beam)
            if new_cache is not None:
                new_cache.append(lc)

        x = self.final_norm(x)
        logits = self.lm_head(x.astype(jnp.float32))
        if cache is not None:
            return logits, new_cache
        return logits
