"""Classic R2Gen (relational memory encoder-decoder)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.models.r2gen import R2Gen, RelationalMemory

pytestmark = pytest.mark.slow


def _model():
    return R2Gen(
        vocab_size=50, d_model=32, d_ff=64, num_layers=1, num_heads=4,
        rm_num_slots=3, rm_num_heads=4,
    )


def test_relational_memory_shapes():
    rm = RelationalMemory(num_slots=3, d_model=16, num_heads=4)
    embs = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    params = rm.init(jax.random.PRNGKey(1), embs)
    mems = rm.apply(params, embs)
    assert mems.shape == (2, 5, 48)
    # memory at step t must not depend on future tokens
    embs2 = embs.at[:, 3:].set(9.0)
    mems2 = rm.apply(params, embs2)
    np.testing.assert_allclose(
        np.asarray(mems[:, :3]), np.asarray(mems2[:, :3]), rtol=1e-5
    )


def test_r2gen_forward_and_causality():
    m = _model()
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 24))
    seq = jnp.asarray(np.random.default_rng(0).integers(3, 50, (2, 7)))
    params = m.init(jax.random.PRNGKey(1), feats, seq)
    logits = m.apply(params, feats, seq)
    assert logits.shape == (2, 7, 50)
    seq2 = seq.at[:, 5:].set(4)
    logits2 = m.apply(params, feats, seq2)
    np.testing.assert_allclose(
        np.asarray(logits[:, :5]), np.asarray(logits2[:, :5]),
        rtol=1e-4, atol=1e-5,
    )


def test_r2gen_generate():
    m = _model()
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 24))
    seq = jnp.ones((2, 4), jnp.int32)
    params = m.init(jax.random.PRNGKey(1), feats, seq)
    out = m.apply(params, feats, 6, 2, method=R2Gen.generate)
    assert out.shape == (2, 6)
    out_greedy = m.apply(
        params, feats, 6, 1, method=R2Gen.generate
    )
    assert out_greedy.shape == (2, 6)
