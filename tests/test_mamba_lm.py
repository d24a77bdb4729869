"""Mamba LM: full-sequence forward vs incremental step decode."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.models.mamba_lm import (
    MambaLM,
    alpaca_prompt,
    lm_loss,
)
from medical_image_analysis_tpu.peft.lora import (
    apply_lora,
    init_lora,
    mamba_partial_x_rules,
)

pytestmark = pytest.mark.slow


def _model():
    return MambaLM(
        vocab_size=64, d_model=24, depth=2, d_state=4, scan_backend="ref"
    )


def test_step_decode_matches_full_forward():
    model = _model()
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, 64, (2, 10)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), ids)
    full = model.apply(params, ids)  # (2, 10, 64)

    states = model.apply(params, 2, method=MambaLM.init_states)
    outs = []
    for t in range(10):
        logits, states = model.apply(
            params, ids[:, t], states, method=MambaLM.step
        )
        outs.append(logits)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full), rtol=2e-4, atol=2e-4
    )


def test_lm_loss_and_partial_lora():
    model = _model()
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, 64, (2, 8)), jnp.int32
    )
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids)
    rules = mamba_partial_x_rules(d_inner=48, rank=2)
    lora = init_lora(jax.random.PRNGKey(1), params, rules)
    assert any("in_proj" in k for k in lora)

    def loss(lora_p):
        merged = apply_lora(params, lora_p, rules)
        return lm_loss(model.apply(merged, ids), ids, mask)

    l0 = loss(lora)
    g = jax.grad(loss)(lora)
    assert bool(jnp.isfinite(l0))
    gmax = max(
        float(jnp.max(jnp.abs(v["a"]))) + float(jnp.max(jnp.abs(v["b"])))
        for v in g.values()
    )
    assert gmax > 0


def test_alpaca_prompt():
    p = alpaca_prompt("summarize", "text here", "resp")
    assert "### instruction : summarize" in p and "### input : text here" in p
