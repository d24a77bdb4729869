"""Medical report generation task models.

The reference's single most load-bearing shape (SURVEY.md §7): every
project is `encoder -> projector -> [prompt ⊕ visual ⊕ text] -> LLM`,
teacher-forced CE for training and HF-style generate for eval:

- ``R2GenGPT``  — the common skeleton (Swin/VSSM/ARM encoder + linear or
  Q-Former projector + Llama/Qwen LM). Covers
  ``/root/reference/MAC_RRG/model/R2GenGPT.py:37`` and
  ``CXPMRG_Bench_MambaXray_VL/models/MambaXrayVL_DownStream.py:16``.
- ``R2GenCSR``  — adds context-sample retrieval residuals
  (``R2GenCSR/models/R2GenCSR.py:309-474``).
- Heads-heavy variants live in :mod:`.am_mrg`, :mod:`.r2gen_kg`,
  :mod:`.emrrg`.

Batch convention (host-tokenized, fixed shapes):
  images       (B, V, H, W, 3)    V views (IU=2, MIMIC=1..2 padded)
  before_ids   (B, Lb)  prompt text before the image (starts with BOS)
  after_ids    (B, La)  prompt text after the image (ends "Assistant:")
  target_ids   (B, Lt)  report tokens (ends with EOS), pad = pad_id
  target_mask  (B, Lt)  1 = real token
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .generation import beam_generate, greedy_generate
from .llm import (
    LLMConfig,
    TransformerLM,
    init_cache,
    reorder_cache,
    split_beam_cache,
)
from .mamba import ARM
from .qformer import EncoderProjectorQFormer
from .swin import SwinTransformer
from .vmamba import VSSM


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    """HF-generate settings (R2GenCSR/configs/config.py:62-68)."""

    num_beams: int = 3
    max_new_tokens: int = 120
    min_new_tokens: int = 80
    repetition_penalty: float = 2.0
    length_penalty: float = 2.0
    no_repeat_ngram_size: int = 2  # config.py:65 default
    eos_id: int = 2
    max_cache_len: int = 1024
    # Split append-only beam KV cache: prompt KV stored once per item
    # (shared by the beam group), generated KV per beam with the
    # ancestry map resolved inside attention (llm.split_beam_cache +
    # _split_ancestry_decode_attn) — no per-step physical cache
    # reorder, 1/nb prefill compute, ~4x less decode HBM traffic at the
    # serving config. Identical tokens to the reorder path.
    beam_ancestry: bool = True


def lm_cross_entropy(logits, labels, mask):
    """Shifted teacher-forced CE: logits[t] predicts labels[t+1]."""
    logits = logits[:, :-1]
    labels = labels[:, 1:]
    mask = mask[:, 1:]
    lp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _encode_views(vision_fn, images, use_feature_mean=True):
    """Run the encoder over views and mean or concat (R2GenCSR.py:229-265)."""
    b, v = images.shape[:2]
    flat = images.reshape(b * v, *images.shape[2:])
    tokens = vision_fn(flat)  # (B*V, L, D)
    tokens = tokens.reshape(b, v, *tokens.shape[1:])
    if use_feature_mean:
        return tokens.mean(axis=1)
    return tokens.reshape(b, -1, tokens.shape[-1])


class VisionEncoder(nn.Module):
    """Encoder dispatch: swin | vssm | arm | vit -> tokens (B, L, D)."""

    chosen: str = "swin"
    swin_kwargs: Any = None
    vssm_kwargs: Any = None
    arm_kwargs: Any = None
    vit_kwargs: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.chosen == "swin":
            return SwinTransformer(
                **(self.swin_kwargs or {}), name="swin"
            )(x, deterministic)
        if self.chosen == "vssm":
            fmap = VSSM(**(self.vssm_kwargs or {}), name="vssm")(
                x, pool=False, deterministic=deterministic
            )
            b, h, w, c = fmap.shape
            return fmap.reshape(b, h * w, c)
        if self.chosen == "arm":
            return ARM(**(self.arm_kwargs or {}), name="arm")(
                x, deterministic
            )
        if self.chosen == "vit":
            # MAE-pretrained ViT patch features (the HD finetune RG/DP
            # visual extractor, ``RG_english/modules/visual_extractor.py:83``).
            from .vit import ViT

            toks = ViT(**(self.vit_kwargs or {}), name="vit")(
                x, deterministic
            )
            return toks[:, 1:]  # drop cls: att_feats are patch tokens
        raise ValueError(self.chosen)


class MRGMixin:
    """Shared prompt assembly / loss / generate for MRG models.

    Subclasses implement ``encode_img(images, batch) -> (B, Lv, llm_dim)``
    inside flax scope.
    """

    def _wrap(self, img_emb, before_ids, after_ids):
        be = self.llm.embed(before_ids)
        ae = self.llm.embed(after_ids)
        return jnp.concatenate([be, img_emb.astype(be.dtype), ae], axis=1)

    def _loss(self, prompt_emb, target_ids, target_mask, **llm_kwargs):
        te = self.llm.embed(target_ids)
        embeds = jnp.concatenate([prompt_emb, te], axis=1)
        b, lp = prompt_emb.shape[:2]
        attn = jnp.concatenate(
            [jnp.ones((b, lp), jnp.int32), target_mask.astype(jnp.int32)],
            axis=1,
        )
        logits = self.llm(
            inputs_embeds=embeds, attention_mask=attn, **llm_kwargs
        )
        labels = jnp.concatenate(
            [jnp.zeros((b, lp), jnp.int32), target_ids], axis=1
        )
        mask = jnp.concatenate(
            [jnp.zeros((b, lp)), target_mask.astype(jnp.float32)], axis=1
        )
        return lm_cross_entropy(logits, labels, mask)

    def _generate(self, prompt_emb, gcfg: GenerateConfig, **llm_kwargs):
        b, lp, _ = prompt_emb.shape
        nb = gcfg.num_beams
        use_split = nb > 1 and gcfg.beam_ancestry
        rows = b * max(nb, 1)
        if nb > 1 and not use_split:
            prompt_emb = jnp.repeat(prompt_emb, nb, axis=0)
            llm_kwargs = {
                k: jnp.repeat(v, nb, axis=0) if hasattr(v, "ndim") else v
                for k, v in llm_kwargs.items()
            }
        if use_split:
            # Shared-prompt prefill: B rows (beams are identical over
            # the prompt), promoted to the split beam cache below —
            # 1/nb the prefill compute and prompt KV memory.
            prefill_rows = b
            cache = init_cache(self.llm_cfg, prefill_rows, lp)
        else:
            prefill_rows = rows
            cache = init_cache(self.llm_cfg, rows, gcfg.max_cache_len)
        positions = jnp.broadcast_to(jnp.arange(lp), (prefill_rows, lp))
        first, cache = self.llm(
            inputs_embeds=prompt_emb, positions=positions, cache=cache,
            **llm_kwargs,
        )
        first = first[:, -1]
        if use_split:
            cache = split_beam_cache(cache, nb, gcfg.max_new_tokens)
            first = jnp.repeat(first, nb, axis=0)
            llm_kwargs = {
                k: jnp.repeat(v, nb, axis=0) if hasattr(v, "ndim") else v
                for k, v in llm_kwargs.items()
            }

        def step(tokens, cache, t):
            # body t consumes the token picked at step t-1, which sits
            # at absolute position lp + t - 1 (cache slot == position).
            pos = jnp.full((tokens.shape[0], 1), lp) + t - 1
            logits, cache = self.llm(
                input_ids=tokens, positions=pos, cache=cache, **llm_kwargs
            )
            return logits[:, 0], cache

        def step_anc(tokens, cache, anc, t):
            pos = jnp.full((tokens.shape[0], 1), lp) + t - 1
            logits, cache = self.llm(
                input_ids=tokens, positions=pos, cache=cache,
                beam=anc.reshape(b, nb, -1), **llm_kwargs
            )
            return logits[:, 0], cache

        if nb > 1:
            return beam_generate(
                step_anc if use_split else step, cache, first,
                batch=b, num_beams=nb,
                max_new_tokens=gcfg.max_new_tokens, eos_id=gcfg.eos_id,
                min_new_tokens=gcfg.min_new_tokens,
                repetition_penalty=gcfg.repetition_penalty,
                length_penalty=gcfg.length_penalty,
                no_repeat_ngram_size=gcfg.no_repeat_ngram_size,
                reorder_cache_fn=reorder_cache,
                # anc indexes the GENERATED segment only; writes there
                # start at gen slot 0, hence prompt_len=0.
                ancestry_slots=gcfg.max_new_tokens if use_split else None,
                prompt_len=0,
            )
        return greedy_generate(
            step, cache, first,
            max_new_tokens=gcfg.max_new_tokens, eos_id=gcfg.eos_id,
            min_new_tokens=gcfg.min_new_tokens,
            repetition_penalty=gcfg.repetition_penalty,
            no_repeat_ngram_size=gcfg.no_repeat_ngram_size,
        )


class R2GenGPT(nn.Module, MRGMixin):
    """The canonical MRG skeleton (frozen/LoRA'd LLM handled by optimizer
    masks, not the module)."""

    llm_cfg: LLMConfig
    chosen: str = "swin"
    vision_kwargs: Any = None
    projector: str = "linear"  # linear | qformer
    use_feature_mean: bool = True
    # ref --global_only (R2GenCSR.py:229-256): the prompt carries ONE
    # mean-pooled visual embedding instead of the full token grid.
    global_only: bool = False

    def setup(self):
        kw = {f"{self.chosen}_kwargs": self.vision_kwargs or {}}
        self.vision = VisionEncoder(chosen=self.chosen, **kw, name="vision")
        self.llm = TransformerLM(self.llm_cfg, name="llm")
        if self.projector == "linear":
            # R2GenGPT llama_proj: LayerNorm + Linear into LLM space.
            self.proj_norm = nn.LayerNorm(name="proj_norm")
            self.proj = nn.Dense(self.llm_cfg.dim, name="proj")
        else:
            self.proj_q = EncoderProjectorQFormer(
                out_dim=self.llm_cfg.dim, name="proj_q"
            )

    def encode_img(self, images, deterministic=True):
        tokens = _encode_views(
            lambda x: self.vision(x, deterministic), images,
            self.use_feature_mean,
        )
        if self.global_only:
            tokens = tokens.mean(axis=1, keepdims=True)
        if self.projector == "linear":
            return self.proj(self.proj_norm(tokens))
        return self.proj_q(tokens)

    def __call__(self, images, before_ids, after_ids, target_ids,
                 target_mask, deterministic=True):
        img = self.encode_img(images, deterministic)
        prompt = self._wrap(img, before_ids, after_ids)
        return self._loss(prompt, target_ids, target_mask)

    def generate(self, images, before_ids, after_ids,
                 gcfg: GenerateConfig = GenerateConfig()):
        img = self.encode_img(images, True)
        prompt = self._wrap(img, before_ids, after_ids)
        return self._generate(prompt, gcfg)


class R2GenCSR(nn.Module, MRGMixin):
    """Context-sample retrieval MRG (R2GenCSR.py:55-818).

    Context images (N positive then N negative exemplars, host-sampled by
    keyword/random/CheXbert — data layer) are encoded global-pooled with
    stop-gradient; the model prepends pos/neg *residual* embeddings
    (global image embed − context embed) wrapped in learnable marker
    tokens (context_encode_with_wrap :374-474).
    """

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
        self.ctx_proj = nn.Dense(self.llm_cfg.dim, name="ctx_proj")
        # learnable pos/neg context marker embeddings
        self.pos_marker = self.param(
            "pos_marker", nn.initializers.normal(0.02), (1, 1, self.llm_cfg.dim)
        )
        self.neg_marker = self.param(
            "neg_marker", nn.initializers.normal(0.02), (1, 1, self.llm_cfg.dim)
        )

    def encode_img(self, images, deterministic=True):
        tokens = _encode_views(
            lambda x: self.vision(x, deterministic), images,
            self.use_feature_mean,
        )
        return self.proj(self.proj_norm(tokens)), tokens.mean(axis=1)

    def context_residuals(self, global_feat, context_images):
        """(B, D_vis) global feats - pooled context feats -> LLM space."""
        b, n = context_images.shape[:2]
        flat = context_images.reshape(b * n, *context_images.shape[2:])
        ctx = jax.lax.stop_gradient(
            self.vision(flat, True).mean(axis=1)
        ).reshape(b, n, -1)
        resid = global_feat[:, None, :] - ctx  # (B, N, D_vis)
        return self.ctx_proj(resid)

    def __call__(self, images, context_images, before_ids, after_ids,
                 target_ids, target_mask, deterministic=True):
        img, global_feat = self.encode_img(images, deterministic)
        ctx = self.context_residuals(global_feat, context_images)
        n = ctx.shape[1] // 2
        b = ctx.shape[0]
        pos = jnp.broadcast_to(self.pos_marker, (b, 1, self.llm_cfg.dim))
        neg = jnp.broadcast_to(self.neg_marker, (b, 1, self.llm_cfg.dim))
        ctx_emb = jnp.concatenate(
            [pos, ctx[:, :n], neg, ctx[:, n:]], axis=1
        )
        prompt = self._wrap(
            jnp.concatenate([ctx_emb, img], axis=1), before_ids, after_ids
        )
        return self._loss(prompt, target_ids, target_mask)

    def generate(self, images, context_images, before_ids, after_ids,
                 gcfg: GenerateConfig = GenerateConfig()):
        img, global_feat = self.encode_img(images, True)
        ctx = self.context_residuals(global_feat, context_images)
        n = ctx.shape[1] // 2
        b = ctx.shape[0]
        pos = jnp.broadcast_to(self.pos_marker, (b, 1, self.llm_cfg.dim))
        neg = jnp.broadcast_to(self.neg_marker, (b, 1, self.llm_cfg.dim))
        ctx_emb = jnp.concatenate([pos, ctx[:, :n], neg, ctx[:, n:]], axis=1)
        prompt = self._wrap(
            jnp.concatenate([ctx_emb, img], axis=1), before_ids, after_ids
        )
        return self._generate(prompt, gcfg)
