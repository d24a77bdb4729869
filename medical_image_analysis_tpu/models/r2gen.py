"""R2Gen: transformer encoder-decoder with relational memory and
memory-conditioned LayerNorm (the classic RG baseline).

Reference ``/root/reference/HD_Xray_Pretrain_MAE/finetune/RG_english/modules/``:
``encoder_decoder.py`` (Transformer :37, RelationalMemory :246-302,
EncoderDecoder :303-387), conditional LayerNorm sublayers, visual
extractor ``visual_extractor.py:83`` (ResNet/ViT patch features), own
beam search (``caption_model.py:26-202``) — here decoding reuses
:mod:`.generation` with a full-prefix re-decode step, mirroring the
reference's ``core()`` which re-runs the decoder on the growing
sequence (no KV cache) each step.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .generation import beam_generate, greedy_generate


class RelationalMemory(nn.Module):
    """Gated slot memory updated per target token (:246-302)."""

    num_slots: int
    d_model: int
    num_heads: int = 1

    def setup(self):
        self.attn_q = nn.Dense(self.d_model, name="attn_q")
        self.attn_k = nn.Dense(self.d_model, name="attn_k")
        self.attn_v = nn.Dense(self.d_model, name="attn_v")
        self.attn_o = nn.Dense(self.d_model, name="attn_o")
        self.mlp1 = nn.Dense(self.d_model, name="mlp1")
        self.mlp2 = nn.Dense(self.d_model, name="mlp2")
        self.w_gate = nn.Dense(2 * self.d_model, name="w_gate")
        self.u_gate = nn.Dense(2 * self.d_model, name="u_gate")

    def init_memory(self, batch: int) -> jax.Array:
        eye = jnp.eye(self.num_slots)
        if self.d_model > self.num_slots:
            eye = jnp.pad(eye, ((0, 0), (0, self.d_model - self.num_slots)))
        else:
            eye = eye[:, : self.d_model]
        return jnp.broadcast_to(eye[None], (batch, self.num_slots, self.d_model))

    def step(self, token_emb: jax.Array, memory: jax.Array) -> jax.Array:
        """token_emb (B, D), memory (B, S, D) -> new memory."""
        nh = self.num_heads
        hd = self.d_model // nh
        b = memory.shape[0]
        kv_in = jnp.concatenate([memory, token_emb[:, None]], axis=1)
        q = self.attn_q(memory).reshape(b, -1, nh, hd)
        k = self.attn_k(kv_in).reshape(b, -1, nh, hd)
        v = self.attn_v(kv_in).reshape(b, -1, nh, hd)
        a = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5, axis=-1
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(
            b, -1, self.d_model
        )
        nxt = memory + self.attn_o(o)
        nxt = nxt + nn.relu(self.mlp2(nn.relu(self.mlp1(nxt))))
        gates = self.w_gate(token_emb[:, None]) + self.u_gate(jnp.tanh(memory))
        ig, fg = jnp.split(gates, 2, axis=-1)
        return nn.sigmoid(ig) * jnp.tanh(nxt) + nn.sigmoid(fg) * memory

    def __call__(self, token_embs: jax.Array) -> jax.Array:
        """(B, T, D) -> per-step memories (B, T, S*D)."""
        return self._scan(token_embs)

    def _scan(self, token_embs: jax.Array) -> jax.Array:
        b, t, _ = token_embs.shape
        mem = self.init_memory(b)
        outs = []
        for i in range(t):
            mem = self.step(token_embs[:, i], mem)
            outs.append(mem.reshape(b, -1))
        return jnp.stack(outs, axis=1)


def _ref_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """The reference's LayerNorm core: ``(x - mean) / (std + eps)`` with
    torch's UNBIASED std and eps added to std, not variance
    (encoder_decoder.py:93-104) — matches bit-for-bit, unlike
    nn.LayerNorm's biased-variance rsqrt form."""
    mean = x.mean(-1, keepdims=True)
    n = x.shape[-1]
    std = jnp.sqrt(x.var(-1, keepdims=True) * n / (n - 1))
    return (x - mean) / (std + eps)


class RefLayerNorm(nn.Module):
    """gamma/beta LayerNorm in the reference's std-form."""

    d_model: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.d_model,))
        beta = self.param("beta", nn.initializers.zeros, (self.d_model,))
        return gamma * _ref_norm(x) + beta


class ConditionalLayerNorm(nn.Module):
    """LayerNorm whose gamma/beta are shifted by memory-predicted deltas
    (R2Gen ConditionalSublayerConnection). The delta heads are 2-layer
    ReLU MLPs (encoder_decoder.py:153-159; the reference sizes the
    second gamma linear ``rm_d_model -> rm_d_model``, which equals
    d_model in every config)."""

    d_model: int

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array) -> jax.Array:
        # memory (B, T, S*D) aligned per decoder position.
        gamma = self.param("gamma", nn.initializers.ones, (self.d_model,))
        beta = self.param("beta", nn.initializers.zeros, (self.d_model,))
        dg = nn.Dense(self.d_model, name="delta_gamma2")(
            nn.relu(nn.Dense(self.d_model, name="delta_gamma")(memory))
        )
        db = nn.Dense(self.d_model, name="delta_beta2")(
            nn.relu(nn.Dense(self.d_model, name="delta_beta")(memory))
        )
        return (gamma + dg) * _ref_norm(x) + (beta + db)


class _MHA(nn.Module):
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None):
        b, lq, _ = q_in.shape
        nh, hd = self.num_heads, self.d_model // self.num_heads
        q = nn.Dense(self.d_model, name="q")(q_in).reshape(b, lq, nh, hd)
        k = nn.Dense(self.d_model, name="k")(kv_in).reshape(b, -1, nh, hd)
        v = nn.Dense(self.d_model, name="v")(kv_in).reshape(b, -1, nh, hd)
        a = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
        if mask is not None:
            a = a + mask
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, lq, self.d_model)
        return nn.Dense(self.d_model, name="o")(o)


class R2Gen(nn.Module):
    """att_feats (B, L, D_vis) + target ids -> log-probs / generation."""

    vocab_size: int
    d_model: int = 512
    d_ff: int = 512
    num_layers: int = 3
    num_heads: int = 8
    rm_num_slots: int = 3
    rm_num_heads: int = 8

    def setup(self):
        self.att_embed = nn.Dense(self.d_model, name="att_embed")
        self.embed = nn.Embed(self.vocab_size, self.d_model, name="embed")
        self.rm = RelationalMemory(
            self.rm_num_slots, self.d_model, self.rm_num_heads, name="rm"
        )
        self.enc_attn = [
            _MHA(self.d_model, self.num_heads, name=f"enc_attn{i}")
            for i in range(self.num_layers)
        ]
        self.enc_ffn = [
            (nn.Dense(self.d_ff, name=f"enc_ff{i}a"),
             nn.Dense(self.d_model, name=f"enc_ff{i}b"))
            for i in range(self.num_layers)
        ]
        self.enc_ln = [
            RefLayerNorm(self.d_model, name=f"enc_ln{i}")
            for i in range(2 * self.num_layers)
        ]
        # Final stack norms (reference Encoder.norm / Decoder.norm,
        # encoder_decoder.py:58-68, 106-116).
        self.enc_norm = RefLayerNorm(self.d_model, name="enc_norm")
        self.dec_norm = RefLayerNorm(self.d_model, name="dec_norm")
        self.dec_self = [
            _MHA(self.d_model, self.num_heads, name=f"dec_self{i}")
            for i in range(self.num_layers)
        ]
        self.dec_cross = [
            _MHA(self.d_model, self.num_heads, name=f"dec_cross{i}")
            for i in range(self.num_layers)
        ]
        self.dec_ffn = [
            (nn.Dense(self.d_ff, name=f"dec_ff{i}a"),
             nn.Dense(self.d_model, name=f"dec_ff{i}b"))
            for i in range(self.num_layers)
        ]
        self.dec_cln = [
            ConditionalLayerNorm(self.d_model, name=f"dec_cln{i}")
            for i in range(3 * self.num_layers)
        ]
        self.logit = nn.Dense(self.vocab_size, name="logit")

    def encode(self, att_feats: jax.Array) -> jax.Array:
        x = self.att_embed(att_feats)
        for i in range(self.num_layers):
            h = self.enc_ln[2 * i](x)
            x = x + self.enc_attn[i](h, h)
            h = self.enc_ln[2 * i + 1](x)
            fa, fb = self.enc_ffn[i]
            x = x + fb(nn.relu(fa(h)))
        return self.enc_norm(x)

    def _positional(self, t: int) -> jax.Array:
        pos = jnp.arange(t)[:, None]
        dim = jnp.arange(0, self.d_model, 2)[None]
        angle = pos / 10000 ** (dim / self.d_model)
        pe = jnp.zeros((t, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(angle))
        pe = pe.at[:, 1::2].set(jnp.cos(angle))
        return pe

    def decode(self, enc: jax.Array, seq: jax.Array) -> jax.Array:
        """seq (B, T) token ids -> logits (B, T, V)."""
        b, t = seq.shape
        x = self.embed(seq) * self.d_model**0.5 + self._positional(t)[None]
        # The memory consumes the SAME scaled+positional embeddings the
        # decoder does (Transformer.decode: rm(self.tgt_embed(tgt), ...)).
        mems = self.rm(x)  # (B, T, S*D)
        causal = jnp.where(
            jnp.tril(jnp.ones((t, t), bool))[None, None], 0.0, -jnp.inf
        )
        for i in range(self.num_layers):
            h = self.dec_cln[3 * i](x, mems)
            x = x + self.dec_self[i](h, h, causal)
            h = self.dec_cln[3 * i + 1](x, mems)
            x = x + self.dec_cross[i](h, enc)
            h = self.dec_cln[3 * i + 2](x, mems)
            fa, fb = self.dec_ffn[i]
            x = x + fb(nn.relu(fa(h)))
        return self.logit(self.dec_norm(x))

    def __call__(self, att_feats: jax.Array, seq: jax.Array) -> jax.Array:
        return self.decode(self.encode(att_feats), seq)

    def generate(self, att_feats: jax.Array, max_new_tokens: int = 60,
                 num_beams: int = 3, bos_id: int = 1, eos_id: int = 2):
        """Beam/greedy decode re-running the decoder on the growing
        prefix each step (the reference's core())."""
        enc = self.encode(att_feats)
        b = att_feats.shape[0]
        nb = max(num_beams, 1)
        rows = b * nb
        enc = jnp.repeat(enc, nb, axis=0) if nb > 1 else enc
        buf0 = jnp.full((rows, max_new_tokens + 1), eos_id, jnp.int32)
        buf0 = buf0.at[:, 0].set(bos_id)

        first_logits = self.decode(enc, buf0[:, :1])[:, -1]

        def step(tokens, cache, t):
            # incoming token was chosen at generation step t-1 -> slot t
            # of the buffer (bos at slot 0); next-token logits sit at
            # decoder position t.
            buf, enc_rows = cache
            buf = buf.at[:, t].set(tokens[:, 0])
            logits = self.decode(enc_rows, buf)  # (rows, T+1, V)
            out = jax.lax.dynamic_index_in_dim(
                logits, jnp.clip(t, 0, max_new_tokens - 1),
                axis=1, keepdims=False,
            )
            return out, (buf, enc_rows)

        cache = (buf0, enc)
        if nb > 1:
            def reorder(cache, beam_idx):
                buf, e = cache
                return (buf[beam_idx], e[beam_idx])

            return beam_generate(
                step, cache, first_logits, batch=b, num_beams=nb,
                max_new_tokens=max_new_tokens, eos_id=eos_id,
                reorder_cache_fn=reorder,
            )
        return greedy_generate(
            step, cache, first_logits, max_new_tokens=max_new_tokens,
            eos_id=eos_id,
        )


class R2GenPipeline(nn.Module):
    """Visual extractor + R2Gen — the runnable form of the HD finetune
    RG task (``RG_english/main.py`` shape: extractor -> att_feats ->
    EncoderDecoder -> CE over report tokens).

    Batch convention matches :class:`..mrg.MRGMixin` (images
    (B, V, H, W, 3); target_ids/mask (B, Lt) with EOS, no BOS — the
    pipeline prepends BOS for the decoder input).
    """

    vocab_size: int
    chosen: str = "vit"
    vision_kwargs: Any = None
    r2gen_kwargs: Any = None
    bos_id: int = 1
    eos_id: int = 2

    def setup(self):
        from .mrg import VisionEncoder, _encode_views  # noqa: F401

        kw = {f"{self.chosen}_kwargs": self.vision_kwargs or {}}
        self.vision = VisionEncoder(chosen=self.chosen, **kw, name="vision")
        self.r2gen = R2Gen(
            vocab_size=self.vocab_size, **(self.r2gen_kwargs or {}),
            name="r2gen",
        )

    def att_feats(self, images, deterministic=True):
        from .mrg import _encode_views

        return _encode_views(
            lambda x: self.vision(x, deterministic), images
        )

    def __call__(self, images, target_ids, target_mask,
                 deterministic=True):
        att = self.att_feats(images, deterministic)
        b = target_ids.shape[0]
        seq_in = jnp.concatenate(
            [jnp.full((b, 1), self.bos_id, target_ids.dtype),
             target_ids[:, :-1]], axis=1,
        )
        logits = self.r2gen(att, seq_in)  # (B, Lt, V)
        lp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(lp, target_ids[..., None], axis=-1)[..., 0]
        m = target_mask.astype(jnp.float32)
        return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)

    def generate(self, images, max_new_tokens: int = 60,
                 num_beams: int = 3):
        att = self.att_feats(images, True)
        return self.r2gen.generate(
            att, max_new_tokens=max_new_tokens, num_beams=num_beams,
            bos_id=self.bos_id, eos_id=self.eos_id,
        )
