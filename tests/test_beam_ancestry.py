"""Reorder-free (ancestry) beam decode vs the cache-reorder path.

The append-only beam KV cache (``generation.py ancestry_slots`` +
``models/llm.py _ancestry_decode_attn``) must produce the SAME tokens as
physically re-gathering the cache every step: per-slot attention dot
products are identical fp32 values, only resolved by selection instead
of gather. Traffic motivation in BENCH.md serving notes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.models.generation import beam_generate
from medical_image_analysis_tpu.models.llm import (
    LLM_CONFIGS,
    TransformerLM,
    _ancestry_decode_attn,
    init_cache,
    reorder_cache,
)

pytestmark = pytest.mark.slow


def test_ancestry_attn_matches_explicit_gather():
    """Unit: ancestry-resolved attention == attention over the
    explicitly gathered per-beam K/V."""
    rng = np.random.default_rng(0)
    bb, nb, s, nh, hd = 2, 3, 16, 4, 8
    r = bb * nb
    q = jnp.asarray(rng.standard_normal((r, 1, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((r, s, nh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((r, s, nh, hd)), jnp.float32)
    # Valid ancestry: arbitrary group-relative rows per (row, slot).
    anc = jnp.asarray(rng.integers(0, nb, (r, s)), jnp.int32)
    cur = 10  # slots >= cur masked out
    mask = jnp.where(jnp.arange(s)[None, None, None, :] < cur, 0.0, -jnp.inf)

    got = _ancestry_decode_attn(q, k, v, mask, anc.reshape(bb, nb, s), hd)

    # Explicit per-(row, slot) gather oracle.
    kg = k.reshape(bb, nb, s, nh, hd)
    vg = v.reshape(bb, nb, s, nh, hd)
    ancg = anc.reshape(bb, nb, s)
    k_sel = np.empty((bb, nb, s, nh, hd), np.float32)
    v_sel = np.empty((bb, nb, s, nh, hd), np.float32)
    for b in range(bb):
        for i in range(nb):
            for t in range(s):
                k_sel[b, i, t] = kg[b, ancg[b, i, t], t]
                v_sel[b, i, t] = vg[b, ancg[b, i, t], t]
    k_sel = jnp.asarray(k_sel.reshape(r, s, nh, hd))
    v_sel = jnp.asarray(v_sel.reshape(r, s, nh, hd))
    attn = jnp.einsum(
        "blhd,bshd->bhls", q, k_sel, preferred_element_type=jnp.float32
    ) * hd**-0.5
    attn = jax.nn.softmax(attn + mask, axis=-1)
    want = jnp.einsum("bhls,bshd->blhd", attn.astype(v_sel.dtype), v_sel)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("rep_penalty", [1.0, 2.0])
def test_beam_tokens_match_reorder_path(rep_penalty):
    """End-to-end: tiny LLM, beam 3 — ancestry mode reproduces the
    reorder path's tokens exactly."""
    cfg = LLM_CONFIGS["tiny_test"]
    model = TransformerLM(cfg)
    rng = jax.random.PRNGKey(0)
    batch, nb, lp, slots, new = 2, 3, 7, 32, 12
    rows = batch * nb

    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, lp), 0,
                             cfg.vocab_size)
    params = model.init(rng, ids)
    ids_r = jnp.repeat(ids, nb, axis=0)

    def run(ancestry: bool):
        cache = init_cache(cfg, rows, slots)
        pos = jnp.broadcast_to(jnp.arange(lp), (rows, lp))
        first, cache = model.apply(
            params, input_ids=ids_r, positions=pos, cache=cache
        )

        def step(tokens, cache, t):
            pos = jnp.full((tokens.shape[0], 1), lp) + t - 1
            logits, cache = model.apply(
                params, input_ids=tokens, positions=pos, cache=cache
            )
            return logits[:, 0], cache

        def step_anc(tokens, cache, anc, t):
            pos = jnp.full((tokens.shape[0], 1), lp) + t - 1
            logits, cache = model.apply(
                params, input_ids=tokens, positions=pos, cache=cache,
                beam=anc.reshape(batch, nb, -1),
            )
            return logits[:, 0], cache

        return beam_generate(
            step_anc if ancestry else step, cache, first[:, -1],
            batch=batch, num_beams=nb, max_new_tokens=new, eos_id=2,
            min_new_tokens=4, repetition_penalty=rep_penalty,
            length_penalty=2.0,
            reorder_cache_fn=reorder_cache,
            ancestry_slots=slots if ancestry else None,
            prompt_len=lp,
        )

    out_reorder = jax.jit(lambda: run(False))()
    out_anc = jax.jit(lambda: run(True))()
    np.testing.assert_array_equal(
        np.asarray(out_reorder), np.asarray(out_anc)
    )


def test_split_cache_matches_reorder_path():
    """Shared-prompt split cache (llm.split_beam_cache +
    _split_ancestry_decode_attn): B-row prefill + per-beam generated
    segment must reproduce the replicated-prompt reorder path's tokens."""
    from medical_image_analysis_tpu.models.llm import split_beam_cache

    cfg = LLM_CONFIGS["tiny_test"]
    model = TransformerLM(cfg)
    batch, nb, lp, new = 2, 3, 6, 10
    rows = batch * nb
    ids = jax.random.randint(jax.random.PRNGKey(7), (batch, lp), 0,
                             cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(8), ids)

    def run_reorder():
        ids_r = jnp.repeat(ids, nb, axis=0)
        cache = init_cache(cfg, rows, lp + new)
        pos = jnp.broadcast_to(jnp.arange(lp), (rows, lp))
        first, cache = model.apply(
            params, input_ids=ids_r, positions=pos, cache=cache
        )

        def step(tokens, cache, t):
            pos = jnp.full((tokens.shape[0], 1), lp) + t - 1
            logits, cache = model.apply(
                params, input_ids=tokens, positions=pos, cache=cache
            )
            return logits[:, 0], cache

        return beam_generate(
            step, cache, first[:, -1], batch=batch, num_beams=nb,
            max_new_tokens=new, eos_id=2, min_new_tokens=3,
            repetition_penalty=2.0, length_penalty=2.0,
            reorder_cache_fn=reorder_cache,
        )

    def run_split():
        cache = init_cache(cfg, batch, lp)  # B-row prefill
        pos = jnp.broadcast_to(jnp.arange(lp), (batch, lp))
        first, cache = model.apply(
            params, input_ids=ids, positions=pos, cache=cache
        )
        cache = split_beam_cache(cache, nb, new)
        first = jnp.repeat(first[:, -1], nb, axis=0)

        def step_anc(tokens, cache, anc, t):
            pos = jnp.full((tokens.shape[0], 1), lp) + t - 1
            logits, cache = model.apply(
                params, input_ids=tokens, positions=pos, cache=cache,
                beam=anc.reshape(batch, nb, -1),
            )
            return logits[:, 0], cache

        return beam_generate(
            step_anc, cache, first, batch=batch, num_beams=nb,
            max_new_tokens=new, eos_id=2, min_new_tokens=3,
            repetition_penalty=2.0, length_penalty=2.0,
            ancestry_slots=new, prompt_len=0,
        )

    np.testing.assert_array_equal(
        np.asarray(jax.jit(run_reorder)()),
        np.asarray(jax.jit(run_split)()),
    )


def test_hybrid_decoder_beam_ancestry_matches_reorder():
    """EMRRG's hybrid gated decoder: ancestry mode == reorder mode."""
    from medical_image_analysis_tpu.models.hybrid_decoder import (
        HybridTransformerLM,
    )

    cfg = LLM_CONFIGS["tiny_test"]
    model = HybridTransformerLM(cfg, cross_every=2)
    batch, nb, lp, slots, new = 2, 3, 5, 24, 8
    rows = batch * nb
    ids = jax.random.randint(jax.random.PRNGKey(3), (batch, lp), 0,
                             cfg.vocab_size)
    vision = jax.random.normal(jax.random.PRNGKey(4), (batch, 6, cfg.dim))
    params = model.init(jax.random.PRNGKey(5), ids, vision=vision)
    ids_r = jnp.repeat(ids, nb, axis=0)
    vis_r = jnp.repeat(vision, nb, axis=0)

    def run(ancestry: bool):
        cache = init_cache(cfg, rows, slots)
        pos = jnp.broadcast_to(jnp.arange(lp), (rows, lp))
        first, cache = model.apply(
            params, input_ids=ids_r, vision=vis_r, positions=pos,
            cache=cache,
        )

        def step(tokens, cache, t):
            pos = jnp.full((tokens.shape[0], 1), lp) + t - 1
            logits, cache = model.apply(
                params, input_ids=tokens, vision=vis_r, positions=pos,
                cache=cache,
            )
            return logits[:, 0], cache

        def step_anc(tokens, cache, anc, t):
            pos = jnp.full((tokens.shape[0], 1), lp) + t - 1
            logits, cache = model.apply(
                params, input_ids=tokens, vision=vis_r, positions=pos,
                cache=cache, beam=anc.reshape(batch, nb, -1),
            )
            return logits[:, 0], cache

        return beam_generate(
            step_anc if ancestry else step, cache, first[:, -1],
            batch=batch, num_beams=nb, max_new_tokens=new, eos_id=2,
            repetition_penalty=2.0, length_penalty=1.0,
            reorder_cache_fn=reorder_cache,
            ancestry_slots=slots if ancestry else None,
            prompt_len=lp,
        )

    np.testing.assert_array_equal(
        np.asarray(jax.jit(lambda: run(False))()),
        np.asarray(jax.jit(lambda: run(True))()),
    )
