"""Autoregressive generation: greedy / sampling / beam search.

Matches the HF ``generate`` semantics the reference relies on
(``/root/reference/R2GenCSR/models/R2GenCSR.py:606-616``: beam 3-5,
``repetition_penalty=2.0``, ``length_penalty=2.0``, min/max_new_tokens,
``inputs_embeds`` prompts):

- repetition penalty over *generated* tokens (HF applies it to
  ``input_ids``, which is empty when prompting with embeddings);
- EOS banned while ``len < min_new_tokens``;
- beam hypotheses scored ``sum_logprobs / len**length_penalty``;
- finished beams keep their score; output padded with EOS.

Fully jittable: fixed ``max_new_tokens`` steps via ``lax.fori_loop``,
static shapes, KV-cache gathers for beam reordering (t5x-style alive /
finished bookkeeping).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7

# decode_step(tokens (B, 1) int32, cache, t) -> (logits (B, V) fp32, cache)
DecodeStep = Callable


def _apply_repetition_penalty(logits, seq, penalty):
    """HF RepetitionPenaltyLogitsProcessor over generated tokens.

    seq: (B, T) with -1 for unfilled slots.
    """
    if penalty == 1.0:
        return logits
    v = logits.shape[-1]
    onehot = jax.nn.one_hot(jnp.where(seq < 0, v, seq), v + 1, dtype=jnp.float32)
    seen = onehot.sum(axis=1)[..., :v] > 0  # (B, V)
    return _penalize_seen(logits, seen, penalty)


def _penalize_seen(logits, seen, penalty):
    """Apply the repetition penalty given a precomputed (B, V) seen mask.

    The decode loops carry ``seen`` incrementally (one scatter per step)
    instead of re-deriving it from the sequence — the O(B*T*V) fused
    one-hot reduction per step becomes O(B*V)."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _mark_seen(seen, tok):
    """seen: (B, V) bool; tok: (B,) int32 -> seen with tok rows set.

    Vectorized compare-or rather than a scatter: TPU scatters serialize,
    an iota compare fuses into one VPU pass over (B, V)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, seen.shape, 1)
    return seen | (iota == tok[:, None])


def _ban_repeated_ngrams(logits, seq, t, n):
    """HF NoRepeatNGramLogitsProcessor over the generated ids: ban any
    token that would complete an n-gram already present in ``seq[:t]``
    (R2GenCSR decodes with ``no_repeat_ngram_size=2``, config.py:65).

    seq: (B, T) generated ids, -1 in unfilled slots; ``t`` is the slot
    being chosen (traced scalar). Cost per step: (n-1) shifted compares
    over (B, T) plus one scatter-add into (B, V) — no (B, T, V) tensor.
    """
    if n <= 0:
        return logits
    b, T = seq.shape
    v = logits.shape[-1]
    if T - n + 1 <= 0:
        return logits
    idx = jnp.arange(T - n + 1)[None]  # candidate n-gram starts
    # Window i matches iff seq[i : i+n-1] equals the current context
    # seq[t-n+1 : t]; only windows fully inside the filled prefix count.
    m = idx <= t - n
    for j in range(n - 1):
        pos = jnp.maximum(t - (n - 1) + j, 0)
        ctx_j = jnp.take_along_axis(
            seq, jnp.full((b, 1), 0, jnp.int32) + pos, axis=1
        )  # (B, 1)
        m = m & (seq[:, j : j + T - n + 1] == ctx_j)
    nxt = seq[:, n - 1 : T]  # token following each window
    rows = jnp.arange(b)[:, None]
    hits = jnp.zeros((b, v), jnp.int32).at[
        rows, jnp.where(m, nxt, 0)
    ].add(m.astype(jnp.int32), mode="drop")
    return jnp.where(hits > 0, NEG_INF, logits)


def _ban_eos_before_min(logits, t, eos_id, min_new_tokens):
    if min_new_tokens <= 0:
        return logits
    v = logits.shape[-1]
    return jnp.where(
        (t < min_new_tokens) & (jnp.arange(v)[None] == eos_id), NEG_INF, logits
    )


def greedy_generate(
    decode_step: DecodeStep,
    cache,
    first_logits: jax.Array,  # (B, V) from the prefill call
    max_new_tokens: int,
    eos_id: int,
    min_new_tokens: int = 0,
    repetition_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
):
    """Greedy decode; returns (B, max_new_tokens), EOS-padded after stop."""
    b, v = first_logits.shape
    seq = jnp.full((b, max_new_tokens), -1, jnp.int32)
    done = jnp.zeros((b,), jnp.bool_)
    seen = jnp.zeros((b, v), jnp.bool_)

    def pick(logits, seq, seen, t):
        logits = _penalize_seen(logits, seen, repetition_penalty)
        logits = _ban_repeated_ngrams(logits, seq, t, no_repeat_ngram_size)
        logits = _ban_eos_before_min(logits, t, eos_id, min_new_tokens)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    tok = pick(first_logits, seq, seen, 0)
    seq = seq.at[:, 0].set(tok)
    seen = _mark_seen(seen, tok)
    done = done | (tok == eos_id)

    def body(t, state):
        seq, seen, done, cache, tok = state
        logits, cache = decode_step(tok[:, None], cache, t)
        nxt = jnp.where(done, eos_id, pick(logits, seq, seen, t))
        seq = seq.at[:, t].set(nxt)
        seen = _mark_seen(seen, nxt)
        done = done | (nxt == eos_id)
        return seq, seen, done, cache, nxt

    seq, seen, done, cache, _ = jax.lax.fori_loop(
        1, max_new_tokens, body, (seq, seen, done, cache, tok)
    )
    return jnp.where(seq < 0, eos_id, seq)


def sample_generate(
    decode_step: DecodeStep,
    cache,
    rng: jax.Array,
    first_logits: jax.Array,
    max_new_tokens: int,
    eos_id: int,
    temperature: float = 1.0,
    top_p: float = 1.0,
    min_new_tokens: int = 0,
    repetition_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
):
    """Temperature / nucleus sampling."""
    b, v = first_logits.shape
    seq = jnp.full((b, max_new_tokens), -1, jnp.int32)
    done = jnp.zeros((b,), jnp.bool_)
    seen = jnp.zeros((b, v), jnp.bool_)

    def pick(logits, seq, seen, t, key):
        logits = _penalize_seen(logits, seen, repetition_penalty)
        logits = _ban_repeated_ngrams(logits, seq, t, no_repeat_ngram_size)
        logits = _ban_eos_before_min(logits, t, eos_id, min_new_tokens)
        logits = logits / jnp.maximum(temperature, 1e-6)
        if top_p < 1.0:
            sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            cutoff_idx = jnp.sum(cum < top_p, axis=-1)
            cutoff = jnp.take_along_axis(
                sorted_logits, cutoff_idx[:, None], axis=-1
            )
            logits = jnp.where(logits < cutoff, NEG_INF, logits)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    rng, key = jax.random.split(rng)
    tok = pick(first_logits, seq, seen, 0, key)
    seq = seq.at[:, 0].set(tok)
    seen = _mark_seen(seen, tok)
    done = done | (tok == eos_id)

    def body(t, state):
        seq, seen, done, cache, tok, rng = state
        rng, key = jax.random.split(rng)
        logits, cache = decode_step(tok[:, None], cache, t)
        nxt = jnp.where(done, eos_id, pick(logits, seq, seen, t, key))
        seq = seq.at[:, t].set(nxt)
        seen = _mark_seen(seen, nxt)
        done = done | (nxt == eos_id)
        return seq, seen, done, cache, nxt, rng

    seq, seen, done, cache, _, _ = jax.lax.fori_loop(
        1, max_new_tokens, body, (seq, seen, done, cache, tok, rng)
    )
    return jnp.where(seq < 0, eos_id, seq)


def beam_generate(
    decode_step: DecodeStep,
    cache,  # already expanded to batch*num_beams rows (prompt replicated)
    first_logits: jax.Array,  # (B*nb, V) from prefill (identical per beam)
    batch: int,
    num_beams: int,
    max_new_tokens: int,
    eos_id: int,
    min_new_tokens: int = 0,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
    reorder_cache_fn=None,
    ancestry_slots: int | None = None,
    prompt_len: int = 0,
):
    """Beam search; returns the best sequence per item, (B, max_new_tokens).

    Two cache strategies:

    - ``reorder_cache_fn`` (default): the KV cache is physically
      re-gathered to parent rows every step (HF/t5x style). Reads and
      rewrites the whole cache per step — the dominant HBM traffic of
      beam decode (BENCH.md serving notes).
    - ``ancestry_slots=S``: the cache is APPEND-ONLY. A (rows, S) int32
      ancestry map tracks, per logical beam and slot, which physical
      group row wrote that slot's KV; attention resolves it in-kernel
      (``models/llm.py _ancestry_decode_attn``). ``decode_step`` then
      takes ``(tokens, cache, anc, t)`` and S must equal the cache's
      slot count. Token output is identical to the reorder path (same
      fp32 dot products, selected not gathered).
    """
    nb = num_beams
    v = first_logits.shape[-1]
    ancestry = ancestry_slots is not None

    def expand(logits, alive_seq, alive_logp, fin_seq, fin_scores, t):
        """One beam-expansion step from per-beam logits (B, nb, V)."""
        # Penalty mask recomputed from alive_seq each step: carrying a
        # (B, nb, V) seen mask through the loop costs a per-step beam-
        # axis gather of the big mask that measures SLOWER on TPU than
        # the fused one-hot reduction over the (short) sequence.
        # HF _beam_search order: log_softmax FIRST, then the logits
        # processors act on the log-probs with NO renormalization
        # (generation/utils.py) — renormalizing after the -inf ngram ban
        # shifts each beam row by its own logsumexp and flips cross-beam
        # rankings (measured vs transformers on a tiny model).
        lp = jax.nn.log_softmax(
            logits.reshape(batch * nb, v), axis=-1
        )
        lp = _apply_repetition_penalty(
            lp, alive_seq.reshape(batch * nb, -1), repetition_penalty
        )
        lp = _ban_repeated_ngrams(
            lp, alive_seq.reshape(batch * nb, -1), t, no_repeat_ngram_size
        )
        lp = _ban_eos_before_min(lp, t, eos_id, min_new_tokens)
        lp = lp.reshape(batch, nb, v)
        cand = alive_logp[..., None] + lp
        top_logp, top_idx = jax.lax.top_k(cand.reshape(batch, nb * v), 2 * nb)
        beam_idx = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)
        seqs = jnp.take_along_axis(alive_seq, beam_idx[..., None], axis=1)
        seqs = seqs.at[:, :, t].set(tok)  # dynamic t -> scatter
        is_eos = tok == eos_id

        cand_fin = jnp.where(
            is_eos, top_logp / (t + 1.0) ** length_penalty, NEG_INF
        )
        fs = jnp.concatenate([fin_scores, cand_fin], axis=1)
        ss = jnp.concatenate([fin_seq, jnp.where(seqs < 0, eos_id, seqs)], axis=1)
        fin_scores, pick = jax.lax.top_k(fs, nb)
        fin_seq = jnp.take_along_axis(ss, pick[..., None], axis=1)

        alive_cand = jnp.where(is_eos, NEG_INF, top_logp)
        alive_logp, apick = jax.lax.top_k(alive_cand, nb)
        alive_seq = jnp.take_along_axis(seqs, apick[..., None], axis=1)
        bidx = jnp.take_along_axis(beam_idx, apick, axis=1)
        ntok = jnp.take_along_axis(tok, apick, axis=1)
        return alive_seq, alive_logp, fin_seq, fin_scores, bidx, ntok

    alive_seq = jnp.full((batch, nb, max_new_tokens), -1, jnp.int32)
    # Only beam 0 live at t=0 (all beams identical after prefill).
    alive_logp = jnp.tile(jnp.array([0.0] + [NEG_INF] * (nb - 1)), (batch, 1))
    fin_seq = jnp.full((batch, nb, max_new_tokens), eos_id, jnp.int32)
    fin_scores = jnp.full((batch, nb), NEG_INF)

    logits0 = first_logits.reshape(batch, nb, v)
    alive_seq, alive_logp, fin_seq, fin_scores, bidx, tok = expand(
        logits0, alive_seq, alive_logp, fin_seq, fin_scores, 0
    )
    flat_idx = (jnp.arange(batch)[:, None] * nb + bidx).reshape(-1)
    if ancestry:
        own = (jnp.arange(batch * nb) % nb).astype(jnp.int32)
        # Prompt KV is replicated across a group's rows, so "own row"
        # is a valid ancestor for every slot; parent-gathers keep the
        # invariant for generated slots.
        anc = jnp.broadcast_to(
            own[:, None], (batch * nb, ancestry_slots)
        )[flat_idx]
        slot_iota = jnp.arange(ancestry_slots)[None]
    else:
        anc = jnp.zeros((1,), jnp.int32)  # pytree placeholder
        cache = reorder_cache_fn(cache, flat_idx)

    def body(t, state):
        alive_seq, alive_logp, fin_seq, fin_scores, cache, anc, tok = state
        if ancestry:
            # decode_step is about to write slot prompt_len+t-1 into
            # each row's OWN cache row and reads it in the same
            # attention call — mark it before the step.
            anc = jnp.where(
                slot_iota == prompt_len + t - 1, own[:, None], anc
            )
            logits, cache = decode_step(
                tok.reshape(batch * nb, 1), cache, anc, t
            )
        else:
            logits, cache = decode_step(tok.reshape(batch * nb, 1), cache, t)
        alive_seq, alive_logp, fin_seq, fin_scores, bidx, tok = expand(
            logits.reshape(batch, nb, v),
            alive_seq, alive_logp, fin_seq, fin_scores, t,
        )
        flat_idx = (jnp.arange(batch)[:, None] * nb + bidx).reshape(-1)
        if ancestry:
            anc = anc[flat_idx]
        else:
            cache = reorder_cache_fn(cache, flat_idx)
        return alive_seq, alive_logp, fin_seq, fin_scores, cache, anc, tok

    state = (alive_seq, alive_logp, fin_seq, fin_scores, cache, anc, tok)
    (alive_seq, alive_logp, fin_seq, fin_scores, cache, anc,
     _) = jax.lax.fori_loop(1, max_new_tokens, body, state)

    # If nothing finished, fall back to the best alive beam.
    alive_scores = alive_logp / float(max_new_tokens) ** length_penalty
    none_fin = jnp.all(fin_scores <= NEG_INF / 2, axis=1)
    best_fin = jnp.argmax(fin_scores, axis=1)
    best_alive = jnp.argmax(alive_scores, axis=1)
    best = jnp.where(none_fin, best_alive, best_fin)
    out_fin = jnp.take_along_axis(fin_seq, best[:, None, None], axis=1)[:, 0]
    out_alive = jnp.take_along_axis(alive_seq, best[:, None, None], axis=1)[:, 0]
    out = jnp.where(none_fin[:, None], out_alive, out_fin)
    return jnp.where(out < 0, eos_id, out)
