"""LLM decoder: HF Llama parity (logits + generation) and cache math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.models.llm import (
    LLM_CONFIGS,
    LLMConfig,
    TransformerLM,
    init_cache,
    reorder_cache,
)
from medical_image_analysis_tpu.models.generation import (
    beam_generate,
    greedy_generate,
)
from medical_image_analysis_tpu.ckpt.torch_import import llama_hf_to_flax

CFG = LLMConfig(
    vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
    hidden_dim=128, dtype=jnp.float32, norm_eps=1e-6,  # HF test default
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.dim,
        num_hidden_layers=CFG.n_layers, num_attention_heads=CFG.n_heads,
        num_key_value_heads=CFG.n_kv_heads, intermediate_size=CFG.hidden_dim,
        max_position_embeddings=512,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    if "lm_head.weight" not in sd:  # tied weights
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    params = llama_hf_to_flax(sd, CFG.n_layers)
    return hf, params


def test_logits_match_hf(hf_pair):
    import torch

    hf, params = hf_pair
    model = TransformerLM(CFG)
    ids = np.array([[3, 17, 92, 5, 44, 101], [8, 2, 63, 77, 15, 99]])
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model.apply(params, input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_cached_decode_matches_uncached(hf_pair):
    _, params = hf_pair
    model = TransformerLM(CFG)
    ids = jnp.array([[3, 17, 92, 5, 44, 101]])
    full = model.apply(params, input_ids=ids)

    cache = init_cache(CFG, 1, 16, dtype=jnp.float32)
    logits_p, cache = model.apply(
        params, input_ids=ids[:, :4],
        positions=jnp.arange(4)[None], cache=cache,
    )
    logits_s = []
    for t in range(4, 6):
        lg, cache = model.apply(
            params, input_ids=ids[:, t : t + 1],
            positions=jnp.full((1, 1), t), cache=cache,
        )
        logits_s.append(lg[:, 0])
    np.testing.assert_allclose(
        np.asarray(logits_p[:, -1]), np.asarray(full[:, 3]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits_s[0]), np.asarray(full[:, 4]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits_s[1]), np.asarray(full[:, 5]), rtol=1e-4, atol=1e-4
    )


def _decode_step_fn(model, params, prompt_len):
    def step(tokens, cache, t):
        # the token consumed at loop step t was picked at step t-1 and
        # sits at absolute position prompt_len + t - 1
        pos = jnp.full((tokens.shape[0], 1), 0) + prompt_len + t - 1
        logits, cache = model.apply(
            params, input_ids=tokens, positions=pos, cache=cache
        )
        return logits[:, 0], cache

    return step


def test_greedy_matches_hf(hf_pair):
    import torch

    hf, params = hf_pair
    model = TransformerLM(CFG)
    ids = np.array([[3, 17, 92, 5], [9, 41, 7, 66]])
    eos = 2
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(ids), max_new_tokens=8, min_new_tokens=8,
            num_beams=1, do_sample=False, eos_token_id=eos,
            pad_token_id=eos,
        ).numpy()[:, 4:]

    cache = init_cache(CFG, 2, 32, dtype=jnp.float32)
    first, cache = model.apply(
        params, input_ids=jnp.asarray(ids),
        positions=jnp.broadcast_to(jnp.arange(4), (2, 4)), cache=cache,
    )
    out = greedy_generate(
        _decode_step_fn(model, params, 4), cache, first[:, -1],
        max_new_tokens=8, eos_id=eos, min_new_tokens=8,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_beam_matches_hf(hf_pair):
    import torch

    hf, params = hf_pair
    model = TransformerLM(CFG)
    ids = np.array([[3, 17, 92, 5]])
    eos = 2
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(ids), max_new_tokens=8, min_new_tokens=2,
            num_beams=3, do_sample=False, eos_token_id=eos,
            pad_token_id=eos, repetition_penalty=2.0, length_penalty=2.0,
            early_stopping=True,
        ).numpy()[:, 4:]

    nb = 3
    cache = init_cache(CFG, nb, 32, dtype=jnp.float32)
    ids_rep = jnp.repeat(jnp.asarray(ids), nb, axis=0)
    first, cache = model.apply(
        params, input_ids=ids_rep,
        positions=jnp.broadcast_to(jnp.arange(4), (nb, 4)), cache=cache,
    )
    out = beam_generate(
        _decode_step_fn(model, params, 4), cache, first[:, -1],
        batch=1, num_beams=nb, max_new_tokens=8, eos_id=eos,
        min_new_tokens=2, repetition_penalty=2.0, length_penalty=2.0,
        reorder_cache_fn=reorder_cache,
    )
    out = np.asarray(out)[:, : ref.shape[1]]
    np.testing.assert_array_equal(out, ref)


def test_incremental_seen_equals_sequence_formula():
    """The greedy/sampling loops carry a (B, V) seen mask updated per
    step; it must penalize exactly like re-deriving the mask from the
    generated sequence (beam keeps the from-sequence formula)."""
    import numpy as np

    from medical_image_analysis_tpu.models.generation import (
        _apply_repetition_penalty,
        _mark_seen,
        _penalize_seen,
    )

    rng = np.random.default_rng(0)
    b, v, t = 3, 50, 7
    logits = jnp.asarray(rng.standard_normal((b, v)), jnp.float32)
    seq = jnp.asarray(rng.integers(0, v, (b, t)), jnp.int32)
    # pad tail with -1 (unfilled) like the decode loops do
    seq = jnp.concatenate(
        [seq, jnp.full((b, 3), -1, jnp.int32)], axis=1
    )

    seen = jnp.zeros((b, v), jnp.bool_)
    for i in range(t):
        seen = _mark_seen(seen, seq[:, i])

    np.testing.assert_allclose(
        np.asarray(_penalize_seen(logits, seen, 2.0)),
        np.asarray(_apply_repetition_penalty(logits, seq, 2.0)),
        rtol=0, atol=0,
    )


@pytest.mark.slow
def test_generate_positions_match_uncached_oracle():
    """Cached greedy decode must reproduce step-by-step UNCACHED full
    forwards (the oracle that caught the lp+t vs lp+t-1 RoPE position
    off-by-one: wrong positions diverge from the oracle at token 2)."""
    cfg = LLM_CONFIGS["tiny_test"]
    model = TransformerLM(cfg)
    lp, new = 6, 6
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, lp), 0,
                             cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)

    seq = ids
    for _ in range(new):
        logits = model.apply(params, input_ids=seq)
        nxt = jnp.argmax(logits[:, -1], -1)[:, None]
        seq = jnp.concatenate([seq, nxt.astype(seq.dtype)], 1)
    oracle = np.asarray(seq[0, lp:])

    cache = init_cache(cfg, 1, lp + new, dtype=jnp.float32)
    first, cache = model.apply(
        params, input_ids=ids,
        positions=jnp.broadcast_to(jnp.arange(lp), (1, lp)), cache=cache,
    )
    out = greedy_generate(
        _decode_step_fn(model, params, lp), cache, first[:, -1],
        max_new_tokens=new, eos_id=-1,
    )
    np.testing.assert_array_equal(np.asarray(out[0]), oracle)


def test_greedy_ngram_ban_matches_hf(hf_pair):
    """no_repeat_ngram_size parity in the reference's calling convention
    (inputs_embeds => HF bans over generated ids only, R2GenCSR.py:65)."""
    import torch

    hf, params = hf_pair
    model = TransformerLM(CFG)
    ids = np.array([[3, 17, 92, 5], [9, 41, 7, 66]])
    eos = 2
    with torch.no_grad():
        emb = hf.get_input_embeddings()(torch.tensor(ids))
        ref = hf.generate(
            inputs_embeds=emb, max_new_tokens=10, min_new_tokens=10,
            num_beams=1, do_sample=False, eos_token_id=eos,
            pad_token_id=eos, no_repeat_ngram_size=2,
        ).numpy()

    cache = init_cache(CFG, 2, 32, dtype=jnp.float32)
    first, cache = model.apply(
        params, input_ids=jnp.asarray(ids),
        positions=jnp.broadcast_to(jnp.arange(4), (2, 4)), cache=cache,
    )
    out = greedy_generate(
        _decode_step_fn(model, params, 4), cache, first[:, -1],
        max_new_tokens=10, eos_id=eos, min_new_tokens=10,
        no_repeat_ngram_size=2,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_beam_ngram_ban_matches_hf(hf_pair):
    import torch

    hf, params = hf_pair
    model = TransformerLM(CFG)
    ids = np.array([[3, 17, 92, 5]])
    eos = 2
    with torch.no_grad():
        emb = hf.get_input_embeddings()(torch.tensor(ids))
        ref = hf.generate(
            inputs_embeds=emb, max_new_tokens=10, min_new_tokens=10,
            num_beams=3, do_sample=False, eos_token_id=eos,
            pad_token_id=eos, no_repeat_ngram_size=2,
            repetition_penalty=2.0, length_penalty=2.0,
            early_stopping=True,
        ).numpy()

    nb = 3
    cache = init_cache(CFG, nb, 32, dtype=jnp.float32)
    ids_rep = jnp.repeat(jnp.asarray(ids), nb, axis=0)
    first, cache = model.apply(
        params, input_ids=ids_rep,
        positions=jnp.broadcast_to(jnp.arange(4), (nb, 4)), cache=cache,
    )
    out = beam_generate(
        _decode_step_fn(model, params, 4), cache, first[:, -1],
        batch=1, num_beams=nb, max_new_tokens=10, eos_id=eos,
        min_new_tokens=10, repetition_penalty=2.0, length_penalty=2.0,
        no_repeat_ngram_size=2, reorder_cache_fn=reorder_cache,
    )
    out = np.asarray(out)[:, : ref.shape[1]]
    np.testing.assert_array_equal(out, ref)
