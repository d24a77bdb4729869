"""Post-LN BERT + BLIP-2 Q-Former output parity vs `transformers`.

VERDICT round-1 item 6: the text tower must load real BERT
(Bio_ClinicalBERT-convention) weights with output parity, and the
Q-Former must match the BLIP-2 architecture (cross-attn every 2 layers,
separate query FFN) with a checkpoint key map.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import jax

from medical_image_analysis_tpu.ckpt.torch_import import (
    bert_hf_to_flax,
    blip2_qformer_to_flax,
)
from medical_image_analysis_tpu.models.bert import (
    BertConfig,
    BertModel,
    Blip2QFormer,
)

pytestmark = pytest.mark.slow


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_bert():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel as HFBert

    cfg = HFBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(0)
    return HFBert(cfg).eval()


def test_bert_output_parity(hf_bert):
    import torch

    ids = np.random.default_rng(0).integers(1, 128, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        theirs = hf_bert(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    cfg = BertConfig(
        vocab_size=128, dim=32, n_layers=2, n_heads=4, intermediate=64,
        max_position=64,
    )
    params = bert_hf_to_flax(_np_sd(hf_bert), 2)
    ours = BertModel(cfg).apply(
        params, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(ours)[:, :7], theirs[:, :7], rtol=2e-4, atol=2e-4
    )


def test_bert_pooler_parity(hf_bert):
    import torch

    ids = np.arange(1, 13, dtype=np.int64).reshape(2, 6)
    with torch.no_grad():
        theirs = hf_bert(torch.tensor(ids)).pooler_output.numpy()
    cfg = BertConfig(
        vocab_size=128, dim=32, n_layers=2, n_heads=4, intermediate=64,
        max_position=64,
    )
    params = bert_hf_to_flax(_np_sd(hf_bert), 2)
    ours = BertModel(cfg).apply(
        params, input_ids=jnp.asarray(ids), pool="cls"
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def hf_qformer():
    import torch
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    cfg = Blip2QFormerConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        cross_attention_frequency=2, encoder_hidden_size=48,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    return Blip2QFormerModel(cfg).eval()


def test_blip2_qformer_output_parity(hf_qformer):
    import torch

    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 5, 32)).astype(np.float32)
    enc = rng.standard_normal((2, 7, 48)).astype(np.float32)
    with torch.no_grad():
        theirs = hf_qformer(
            query_embeds=torch.tensor(q),
            encoder_hidden_states=torch.tensor(enc),
        ).last_hidden_state.numpy()

    cfg = BertConfig(
        vocab_size=128, dim=32, n_layers=4, n_heads=4, intermediate=64,
        cross_attention_freq=2, query_ffn=True, use_embeddings=False,
    )
    params = blip2_qformer_to_flax(_np_sd(hf_qformer), 4)
    ours = BertModel(cfg).apply(
        params,
        query_embeds=jnp.asarray(q),
        encoder_hidden_states=jnp.asarray(enc),
        attention_mask=jnp.zeros((2, 0), jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs, rtol=3e-4, atol=3e-4
    )


def test_blip2_qformer_lavis_key_convention(hf_qformer):
    """The reference checkpoint naming (Qformer.bert.encoder.layer.i.
    attention.self.*) maps onto the same params."""
    sd = _np_sd(hf_qformer)
    lavis = {}
    for k, v in sd.items():
        k2 = k.replace(".attention.attention.", ".attention.self.")
        k2 = k2.replace(".crossattention.attention.", ".crossattention.self.")
        k2 = k2.replace("layernorm.", "embeddings.LayerNorm.")
        lavis["Qformer.bert." + k2] = v
    a = blip2_qformer_to_flax(sd, 4)
    b = blip2_qformer_to_flax(lavis, 4)
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_blip2_qformer_module_with_text():
    """Query + text path: queries cross-attend to the image, text rides
    the text FFN; output length = nq + L_text."""
    m = Blip2QFormer(
        num_queries=4, dim=32, n_layers=2, n_heads=4, intermediate=64,
        vocab_size=128,
    )
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((2, 6, 48)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 128, (2, 5)), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), img, ids, mask)
    out = m.apply(params, img, ids, mask)
    assert out.shape == (2, 9, 32)
    out_q = m.apply(params, img)
    assert out_q.shape == (2, 4, 32)
    # text path params exist alongside query FFN
    l0 = params["params"]["bert"]["layer_0"]
    assert "ffn_query" in l0 and "ffn" in l0 and "crossattention" in l0
