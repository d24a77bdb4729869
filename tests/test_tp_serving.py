"""Tensor-parallel SERVING equality: a TP-sharded beam generate (split
ancestry cache) must emit the same tokens as the single-device run.

The reference serves 7B decoders on one GPU (`load_in_8bit`); the
TPU-native scaling path shards attention/MLP kernels over the mesh's
``model`` axis (parallel/tp.py) and lets XLA insert the collectives.
The split-cache ancestry attention keeps the head axis intact through
every einsum, so TP sharding propagates through decode unchanged —
this test pins that end to end on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.models.generation import beam_generate
from medical_image_analysis_tpu.models.llm import (
    LLM_CONFIGS,
    TransformerLM,
    init_cache,
    split_beam_cache,
)
from medical_image_analysis_tpu.parallel.mesh import make_mesh
from medical_image_analysis_tpu.parallel.tp import shard_params

pytestmark = pytest.mark.slow


def _beam_split_generate(model, params, ids, nb, lp, new):
    batch = ids.shape[0]
    cfg = model.cfg
    cache = init_cache(cfg, batch, lp)
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
        max_new_tokens=new, eos_id=2, min_new_tokens=2,
        repetition_penalty=2.0, length_penalty=2.0,
        ancestry_slots=new, prompt_len=0,
    )


def test_tp_beam_generate_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg = LLM_CONFIGS["tiny_test"]  # dim 64, 4 heads, 2 kv heads
    model = TransformerLM(cfg)
    batch, nb, lp, new = 2, 3, 5, 8
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch, lp), 0,
                             cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)

    ref = jax.jit(
        lambda p: _beam_split_generate(model, p, ids, nb, lp, new)
    )(params)

    mesh = make_mesh(data=len(jax.devices()) // 2, model=2)
    sharded = shard_params(mesh, params)
    q = sharded["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert len(q.devices()) > 1, "q_proj should span the model axis"
    with mesh:
        out = jax.jit(
            lambda p: _beam_split_generate(model, p, ids, nb, lp, new)
        )(sharded)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
