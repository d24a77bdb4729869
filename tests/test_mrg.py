"""MRG task models: loss + generation end-to-end (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.models.llm import LLMConfig
from medical_image_analysis_tpu.models.mrg import (
    GenerateConfig,
    R2GenCSR,
    R2GenGPT,
    lm_cross_entropy,
)

TINY_LLM = LLMConfig(
    vocab_size=64, dim=32, n_layers=2, n_heads=4, n_kv_heads=4,
    hidden_dim=64, dtype=jnp.float32,
)
SWIN_KW = dict(
    embed_dim=8, depths=(1, 1), num_heads=(2, 2), window_size=4,
    drop_path_rate=0.0,
)
GCFG = GenerateConfig(
    num_beams=2, max_new_tokens=6, min_new_tokens=2, eos_id=2,
    max_cache_len=64,
)


def _batch(b=2):
    rng = np.random.default_rng(0)
    return dict(
        images=jnp.asarray(
            rng.standard_normal((b, 2, 32, 32, 3)).astype(np.float32)
        ),
        before_ids=jnp.asarray(rng.integers(3, 64, (b, 4))),
        after_ids=jnp.asarray(rng.integers(3, 64, (b, 3))),
        target_ids=jnp.asarray(rng.integers(3, 64, (b, 5))),
        target_mask=jnp.asarray([[1, 1, 1, 1, 0]] * b),
    )


def test_lm_cross_entropy_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[1, 2, 3, 4]])
    mask = jnp.array([[1.0, 1.0, 1.0, 0.0]])
    loss = lm_cross_entropy(logits, labels, mask)
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)


@pytest.mark.slow
def test_r2gengpt_loss_and_generate():
    m = R2GenGPT(llm_cfg=TINY_LLM, chosen="swin", vision_kwargs=SWIN_KW)
    batch = _batch()
    params = m.init(jax.random.PRNGKey(0), **batch)
    loss = m.apply(params, **batch)
    assert bool(jnp.isfinite(loss)) and float(loss) > 0
    out = m.apply(
        params, batch["images"], batch["before_ids"], batch["after_ids"],
        GCFG, method=R2GenGPT.generate,
    )
    assert out.shape == (2, 6)
    assert out.dtype == jnp.int32


def test_r2gengpt_qformer_projector():
    m = R2GenGPT(
        llm_cfg=TINY_LLM, chosen="swin", vision_kwargs=SWIN_KW,
        projector="qformer",
    )
    batch = _batch()
    params = m.init(jax.random.PRNGKey(0), **batch)
    loss = m.apply(params, **batch)
    assert bool(jnp.isfinite(loss))


@pytest.mark.slow
def test_r2gencsr_context_path():
    m = R2GenCSR(llm_cfg=TINY_LLM, chosen="swin", vision_kwargs=SWIN_KW)
    batch = _batch()
    rng = np.random.default_rng(1)
    ctx = jnp.asarray(
        rng.standard_normal((2, 4, 32, 32, 3)).astype(np.float32)
    )  # 2 pos + 2 neg
    params = m.init(jax.random.PRNGKey(0), batch["images"], ctx,
                    batch["before_ids"], batch["after_ids"],
                    batch["target_ids"], batch["target_mask"])
    loss = m.apply(params, batch["images"], ctx, batch["before_ids"],
                   batch["after_ids"], batch["target_ids"],
                   batch["target_mask"])
    assert bool(jnp.isfinite(loss))
    out = m.apply(params, batch["images"], ctx, batch["before_ids"],
                  batch["after_ids"], GCFG, method=R2GenCSR.generate)
    assert out.shape == (2, 6)


@pytest.mark.slow
def test_r2gengpt_grad_flows_to_vision_and_proj():
    m = R2GenGPT(llm_cfg=TINY_LLM, chosen="swin", vision_kwargs=SWIN_KW)
    batch = _batch()
    params = m.init(jax.random.PRNGKey(0), **batch)
    g = jax.grad(lambda p: m.apply(p, **batch))(params)
    gp = g["params"]
    assert float(jnp.max(jnp.abs(gp["proj"]["kernel"]))) > 0
    vis = jax.tree_util.tree_leaves(gp["vision"])
    assert any(float(jnp.max(jnp.abs(leaf))) > 0 for leaf in vis)


def test_r2gengpt_global_only():
    """ref --global_only: one pooled visual token in the prompt
    (R2GenCSR.py:229-256)."""
    m = R2GenGPT(
        llm_cfg=TINY_LLM, chosen="swin", vision_kwargs=SWIN_KW,
        global_only=True,
    )
    batch = _batch()
    params = m.init(jax.random.PRNGKey(0), **batch)
    img = m.apply(
        params, batch["images"], method=R2GenGPT.encode_img
    )
    assert img.shape[1] == 1  # single pooled embedding
    loss = m.apply(params, **batch)
    assert bool(jnp.isfinite(loss))
    out = m.apply(
        params, batch["images"], batch["before_ids"], batch["after_ids"],
        GCFG, method=R2GenGPT.generate,
    )
    assert out.shape == (2, 6)
