"""Decoder-only transformer LM (Llama/Qwen family) with functional KV cache.

Replaces the reference's HF ``LlamaForCausalLM`` / Qwen usage
(``/root/reference/R2GenCSR/models/R2GenCSR.py:141-176``,
``CXPMRG_Bench_MambaXray_VL/models/MambaXrayVL_DownStream.py:65-118``).
Prompts are assembled as embedding sequences (``inputs_embeds``), exactly
like the reference's ``prompt_wrap`` — never token ids.

TPU-first: static shapes everywhere (fixed max_seq_len cache,
``lax.dynamic_update_slice`` writes), bf16 activations with fp32 norms
and logits, GQA via head broadcasting, rotary embeddings computed from
explicit positions so left-padded generation is exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    hidden_dim: int = 11008
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    tie_embeddings: bool = False
    attn_bias: bool = False  # Qwen2 q/k/v biases
    quant_int8: bool = False  # int8 weights + per-column scales
    remat: bool = False  # activation checkpointing per block
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


# Reference model shapes (architecture parity; weights imported from HF
# checkpoints via ckpt.torch_import when available).
LLM_CONFIGS = {
    "llama2_7b": LLMConfig(32000, 4096, 32, 32, 32, 11008),
    "llama2_13b": LLMConfig(32000, 5120, 40, 40, 40, 13824),
    "qwen1_5_0_5b": LLMConfig(151936, 1024, 24, 16, 16, 2816),
    "qwen1_5_1_8b": LLMConfig(151936, 2048, 24, 16, 16, 5504),
    "tiny_test": LLMConfig(256, 64, 2, 4, 2, 128),
}


def _rope(q: jax.Array, k: jax.Array, positions: jax.Array, theta: float):
    """Rotary embedding, HF Llama convention (rotate_half)."""
    hd = q.shape[-1]
    inv = 1.0 / theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    freqs = positions[..., None].astype(jnp.float32) * inv  # (B, L, hd/2)
    cos = jnp.cos(freqs)[:, :, None, :]  # (B, L, 1, hd/2)
    sin = jnp.sin(freqs)[:, :, None, :]

    def rot(x):
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        out = jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )
        return out.astype(x.dtype)

    return rot(q), rot(k)


class QuantDense(nn.Module):
    """int8-weight Dense: kernel stored int8 in HBM with per-output-column
    fp32 scales, dequantized into the matmul (XLA fuses the cast+scale).
    The TPU analog of the reference's ``load_in_8bit`` low-resource LLM
    path (``R2GenCSR.py:146-152``) — halves 7B weight memory vs bf16."""

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kq = self.param(
            "kernel_q", nn.initializers.zeros,
            (x.shape[-1], self.features), jnp.int8,
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        w = kq.astype(self.dtype) * scale.astype(self.dtype)[None, :]
        y = x.astype(self.dtype) @ w
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ).astype(self.dtype)
        return y


def _dense(cfg: LLMConfig, features: int, name: str, use_bias: bool = False):
    if cfg.quant_int8:
        return QuantDense(
            features, dtype=cfg.dtype, use_bias=use_bias, name=name
        )
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.dtype, name=name)


class LlamaAttention(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, positions, mask, layer_cache=None, beam=None):
        cfg = self.cfg
        b, l, _ = x.shape
        nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        q = _dense(cfg, nh * hd, "q_proj", cfg.attn_bias)(x)
        k = _dense(cfg, nkv * hd, "k_proj", cfg.attn_bias)(x)
        v = _dense(cfg, nkv * hd, "v_proj", cfg.attn_bias)(x)
        q = q.reshape(b, l, nh, hd)
        k = k.reshape(b, l, nkv, hd)
        v = v.reshape(b, l, nkv, hd)
        q, k = _rope(q, k, positions, cfg.rope_theta)

        if layer_cache is not None and len(layer_cache) == 5:
            # Split beam cache: group-shared prompt segment + per-beam
            # generated segment (see split_beam_cache). Decode-only.
            kp, vp, kg, vg, cur = layer_cache
            kg = jax.lax.dynamic_update_slice(
                kg, k.astype(kg.dtype), (0, cur, 0, 0)
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
            out = _split_ancestry_decode_attn(
                q, kp, vp, kg, vg, mask_p, mask_g, beam, hd
            ).reshape(b, l, nh * hd)
            return _dense(cfg, cfg.dim, "o_proj")(out), new_cache

        if layer_cache is not None:
            ck, cv, cur = layer_cache  # (B, max_len, nkv, hd) x2, scalar
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cur, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cur, 0, 0))
            k_all, v_all = ck, cv
            new_cache = (ck, cv, cur + l)
        else:
            k_all, v_all = k, v
            new_cache = None

        if nkv != nh:
            rep = nh // nkv
            k_all = jnp.repeat(k_all, rep, axis=2)
            v_all = jnp.repeat(v_all, rep, axis=2)

        if beam is not None and l == 1:
            out = _ancestry_decode_attn(q, k_all, v_all, mask, beam, hd)
            out = out.reshape(b, l, nh * hd)
            return _dense(cfg, cfg.dim, "o_proj")(out), new_cache

        # bf16 inputs with fp32 accumulation: each bf16*bf16 product is
        # exact in fp32, so this equals the cast-to-fp32 einsum bit for
        # bit while avoiding the multi-pass fp32 matmul on the MXU (and
        # 2x the KV-cache read traffic at decode time).
        attn = jnp.einsum(
            "blhd,bshd->bhls", q, k_all,
            preferred_element_type=jnp.float32,
        ) * hd**-0.5
        attn = attn + mask  # (B, 1|nh, L, S) additive
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", attn.astype(v_all.dtype), v_all)
        out = out.reshape(b, l, nh * hd)
        out = _dense(cfg, cfg.dim, "o_proj")(out)
        return out, new_cache


def _ancestry_decode_attn(q, k_all, v_all, mask, beam, hd):
    """Beam decode attention over an APPEND-ONLY cache (no per-step
    physical reorder).

    ``beam``: (B, nb, S) int32 ancestry map — ``beam[b, i, s]`` is the
    group-relative cache row (0..nb-1) holding logical beam (b, i)'s
    token at slot s. (nb rides in the shape so the argument stays a
    plain array — safe through ``nn.remat`` boundaries.) Instead of a
    per-(row, s) gather (unvectorizable on TPU), scores against ALL nb
    rows of the group are computed — nb x the decode attention FLOPs,
    trivial next to its HBM traffic — and the ancestry row is selected
    with an elementwise mask. This removes the full-cache gather+rewrite
    the reorder path does each step (~2/3 of beam-decode HBM traffic,
    BENCH.md serving notes); the per-slot dot products are identical fp32
    values, so logits match the reorder path.

    q (R,1,nh,hd); k/v (R,S,nh,hd); mask (R,1,1,S) additive. R = B*nb.
    """
    anc = beam
    nb = anc.shape[1]
    r, s, nh = k_all.shape[0], k_all.shape[1], k_all.shape[2]
    bb = r // nb
    qg = q[:, 0].reshape(bb, nb, nh, hd)
    kg = k_all.reshape(bb, nb, s, nh, hd)
    sall = jnp.einsum(
        "bihd,bjshd->bhijs", qg, kg, preferred_element_type=jnp.float32
    ) * hd**-0.5
    sel = (
        anc[:, :, None, :]
        == jnp.arange(nb, dtype=anc.dtype)[None, None, :, None]
    )  # (B, i, j, s)
    scores = jnp.sum(jnp.where(sel[:, None], sall, 0.0), axis=3)
    mask = jnp.broadcast_to(mask, (r, 1, 1, s))  # batch dim may be 1
    scores = scores + mask.reshape(bb, nb, 1, s).transpose(0, 2, 1, 3)
    p = jax.nn.softmax(scores, axis=-1)  # (B, h, i, s) fp32
    vg = v_all.reshape(bb, nb, s, nh, hd)
    pj = jnp.where(
        sel[:, None], p[:, :, :, None, :], 0.0
    ).astype(v_all.dtype)  # (B, h, i, j, s)
    out = jnp.einsum("bhijs,bjshd->bihd", pj, vg)
    return out.reshape(r, 1, nh, hd)


def _split_ancestry_decode_attn(q, kp, vp, kg, vg, mask_p, mask_g, anc, hd):
    """Beam decode attention over a SPLIT cache: prompt K/V stored once
    per batch item (shared by the whole beam group — it is identical
    across beams), generated K/V per beam row with ancestry resolution
    (:func:`_ancestry_decode_attn`).

    Per-step KV HBM traffic drops from nb*(Sp+Sg) to Sp + nb*Sg
    slot-rows per group (~47% less at the serving config Sp=206,
    Sg=100, nb=3 — on top of the reorder elimination), and prefill
    runs on B rows instead of B*nb. Softmax over the concatenated
    [prompt | generated] score axis — identical distribution to the
    joint cache.

    q (R,1,nh,hd); kp/vp (B,Sp,nh,hd); kg/vg (R,Sg,nh,hd);
    mask_p (B,1,1,Sp), mask_g (1,1,1,Sg) additive; anc (B,nb,Sg).
    """
    bb, nb = anc.shape[0], anc.shape[1]
    sp, sg = kp.shape[1], kg.shape[1]
    nh = q.shape[2]
    qg = q[:, 0].reshape(bb, nb, nh, hd)
    sc_p = jnp.einsum(
        "bihd,bshd->bhis", qg, kp, preferred_element_type=jnp.float32
    ) * hd**-0.5
    sc_p = sc_p + mask_p.reshape(bb, 1, 1, sp)
    kgg = kg.reshape(bb, nb, sg, nh, hd)
    sall = jnp.einsum(
        "bihd,bjshd->bhijs", qg, kgg, preferred_element_type=jnp.float32
    ) * hd**-0.5
    sel = (
        anc[:, :, None, :]
        == jnp.arange(nb, dtype=anc.dtype)[None, None, :, None]
    )  # (B, i, j, s)
    sc_g = jnp.sum(jnp.where(sel[:, None], sall, 0.0), axis=3)
    sc_g = sc_g + mask_g.reshape(1, 1, 1, sg)
    p = jax.nn.softmax(jnp.concatenate([sc_p, sc_g], axis=-1), axis=-1)
    pp, pg = p[..., :sp], p[..., sp:]
    out_p = jnp.einsum(
        "bhis,bshd->bihd", pp.astype(vp.dtype), vp,
        preferred_element_type=jnp.float32,
    )
    vgg = vg.reshape(bb, nb, sg, nh, hd)
    pj = jnp.where(sel[:, None], pg[:, :, :, None, :], 0.0).astype(vg.dtype)
    out_g = jnp.einsum(
        "bhijs,bjshd->bihd", pj, vgg, preferred_element_type=jnp.float32
    )
    return (out_p + out_g).astype(q.dtype).reshape(bb * nb, 1, nh, hd)


class LlamaMLP(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        g = _dense(cfg, cfg.hidden_dim, "gate_proj")(x)
        u = _dense(cfg, cfg.hidden_dim, "up_proj")(x)
        return _dense(cfg, cfg.dim, "down_proj")(nn.silu(g) * u)


class LlamaBlock(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, positions, mask, layer_cache=None, beam=None):
        cfg = self.cfg
        h = nn.RMSNorm(epsilon=cfg.norm_eps, name="input_layernorm")(x)
        attn_out, new_cache = LlamaAttention(cfg, name="self_attn")(
            h, positions, mask, layer_cache, beam
        )
        x = x + attn_out
        h = nn.RMSNorm(epsilon=cfg.norm_eps, name="post_attention_layernorm")(x)
        return x + LlamaMLP(cfg, name="mlp")(h), new_cache


class TransformerLM(nn.Module):
    """Decoder-only LM. Accepts token ids or ``inputs_embeds``.

    ``embed`` is exposed as a separate method so task models can assemble
    multimodal prompts in embedding space (the reference's prompt_wrap).
    """

    cfg: LLMConfig

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.dim, dtype=cfg.dtype, name="embed_tokens"
        )
        block_cls = nn.remat(LlamaBlock) if cfg.remat else LlamaBlock
        self.layers = [
            block_cls(cfg, name=f"layers_{i}") for i in range(cfg.n_layers)
        ]
        self.final_norm = nn.RMSNorm(epsilon=cfg.norm_eps, name="norm")
        if not cfg.tie_embeddings:
            if cfg.quant_int8:
                self.lm_head = QuantDense(
                    cfg.vocab_size, dtype=jnp.float32, name="lm_head"
                )
            else:
                self.lm_head = nn.Dense(
                    cfg.vocab_size, use_bias=False, dtype=jnp.float32,
                    name="lm_head",
                )

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        input_ids: jax.Array | None = None,
        inputs_embeds: jax.Array | None = None,
        attention_mask: jax.Array | None = None,  # (B, L) 1=keep (no cache)
        positions: jax.Array | None = None,  # (B, L)
        cache: list | None = None,
        cache_mask: jax.Array | None = None,  # (B, max_len) 1=valid slot
        beam: jax.Array | None = None,  # (B, nb, max_len) int32 ancestry
    ):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        x = inputs_embeds.astype(cfg.dtype)
        b, l, _ = x.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(l), (b, l))

        if cache is not None and len(cache[0]) == 5:
            # Split beam cache (split_beam_cache): (mask_p, mask_g)
            # tuple — prompt segment fully valid (modulo cache_mask
            # padding, (B_group, Sp)), generated segment causal over
            # gen-relative slots.
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
            kpos = jnp.arange(s)[None, None, :]  # (1, 1, S)
            # Causal over absolute cache slots: token i of this call sits
            # at slot cur+i and may attend slots <= cur+i.
            slot_ok = kpos <= (cur + jnp.arange(l)[None, :, None])
            mask = jnp.where(slot_ok, 0.0, -jnp.inf)
            if cache_mask is not None:
                # cache_mask (B, S): 0 marks padded prompt slots.
                mask = mask + jnp.where(
                    cache_mask[:, None, :] > 0, 0.0, -jnp.inf
                )
            mask = mask[:, None, :, :]  # (B, 1, L, S)
        else:
            causal = jnp.tril(jnp.ones((l, l), jnp.bool_))
            mask = jnp.where(causal[None, None], 0.0, -jnp.inf)
            if attention_mask is not None:
                mask = mask + jnp.where(
                    attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf
                )

        new_cache = [] if cache is not None else None
        for i in range(cfg.n_layers):
            layer_cache = cache[i] if cache is not None else None
            x, lc = self.layers[i](x, positions, mask, layer_cache, beam)
            if new_cache is not None:
                new_cache.append(lc)

        x = self.final_norm(x)
        if cfg.tie_embeddings:
            logits = self.embed_tokens.attend(x.astype(cfg.dtype))
        else:
            logits = self.lm_head(x.astype(jnp.float32))
        logits = logits.astype(jnp.float32)
        if cache is not None:
            return logits, new_cache
        return logits


def init_cache(cfg: LLMConfig, batch: int, max_len: int, dtype=None):
    """Empty KV cache: list of (k, v, cur_index) per layer."""
    dtype = dtype or cfg.dtype
    return [
        (
            jnp.zeros((batch, max_len, cfg.n_kv_heads, cfg.head_dim), dtype),
            jnp.zeros((batch, max_len, cfg.n_kv_heads, cfg.head_dim), dtype),
            jnp.int32(0),
        )
        for _ in range(cfg.n_layers)
    ]


def reorder_cache(cache, beam_idx: jax.Array):
    """Gather cache rows along batch for beam search."""
    return [(k[beam_idx], v[beam_idx], cur) for k, v, cur in cache]


def split_beam_cache(prompt_cache, num_beams: int, gen_slots: int):
    """Promote a B-row prefill cache to the split beam layout.

    The prompt K/V tensors are kept as-is (ONE row per batch item,
    shared read-only by the whole beam group — beams are identical over
    the prompt, so per-beam copies are pure HBM waste) and an empty
    per-beam generated segment of ``gen_slots`` is attached. Use with
    ``beam=`` ancestry decode (``_split_ancestry_decode_attn``).
    """
    out = []
    for ck, cv, _cur in prompt_cache:
        b, _sp, h, d = ck.shape
        kg = jnp.zeros((b * num_beams, gen_slots, h, d), ck.dtype)
        out.append((ck, cv, kg, jnp.zeros_like(kg), jnp.int32(0)))
    return out
