"""AM-MRG / R2GenKG / EMRRG / CLIP stage / classifiers (tiny, CPU)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.models.am_mrg import AMMRG
from medical_image_analysis_tpu.models.classifiers import (
    DPClassifier,
    swinchex_loss,
    weighted_bce_loss,
)
from medical_image_analysis_tpu.models.emrrg import EMRRG, slow_fast_split
from medical_image_analysis_tpu.models.llm import LLMConfig
from medical_image_analysis_tpu.models.mambaxray_vl import MambaXrayVLCLIP
from medical_image_analysis_tpu.models.mrg import GenerateConfig
from medical_image_analysis_tpu.models.r2gen_kg import R2GenKG

TINY_LLM = LLMConfig(
    vocab_size=64, dim=32, n_layers=2, n_heads=4, n_kv_heads=4,
    hidden_dim=64, dtype=jnp.float32,
)
ARM_KW = dict(
    patch_size=8, embed_dim=24, depth=1, d_state=4, scan_backend="ref",
    drop_path_rate=0.0,
)
GCFG = GenerateConfig(num_beams=2, max_new_tokens=4, min_new_tokens=1,
                      eos_id=2, max_cache_len=128)


def _text(b=2):
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.integers(3, 64, (b, 3))),
        jnp.asarray(rng.integers(3, 64, (b, 2))),
        jnp.asarray(rng.integers(3, 64, (b, 4))),
        jnp.ones((b, 4), jnp.int32),
    )


@pytest.mark.slow
def test_am_mrg():
    m = AMMRG(llm_cfg=TINY_LLM, arm_kwargs=ARM_KW, qformer_dim=16,
              qformer_width=24, qformer_layers=1, qformer_heads=4)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    vbank = jax.random.normal(jax.random.PRNGKey(1), (10, 16))
    rbank = jax.random.normal(jax.random.PRNGKey(2), (12, 16))
    before, after, tgt, mask = _text()
    params = m.init(jax.random.PRNGKey(3), imgs, vbank, rbank, before,
                    after, tgt, mask)
    loss = m.apply(params, imgs, vbank, rbank, before, after, tgt, mask)
    assert bool(jnp.isfinite(loss))
    out = m.apply(params, imgs, vbank, rbank, before, after, GCFG,
                  method=AMMRG.generate)
    assert out.shape == (2, 4)


@pytest.mark.slow
def test_r2gen_kg():
    m = R2GenKG(
        llm_cfg=TINY_LLM, chosen="swin",
        vision_kwargs=dict(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                           window_size=4, drop_path_rate=0.0),
        graph_dim=16, num_scales=2, qformer_layers=1, qformer_heads=4,
        num_fusion_heads=4,
    )
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 32, 32, 3))
    nf = [jax.random.normal(jax.random.PRNGKey(i), (5, 16))
          for i in range(2)]
    ei = [jnp.array([[0, 1], [1, 2]]) for _ in range(2)]
    et = [jnp.array([0, 1]) for _ in range(2)]
    bank = jax.random.normal(jax.random.PRNGKey(9), (30, 16))
    before, after, tgt, mask = _text()
    params = m.init(jax.random.PRNGKey(3), imgs, nf, ei, et, bank,
                    before, after, tgt, mask)
    loss = m.apply(params, imgs, nf, ei, et, bank, before, after, tgt, mask)
    assert bool(jnp.isfinite(loss))


def test_slow_fast_split():
    # 4x4 grid + cls -> slow 2x2 + cls, fast 16.
    toks = jnp.arange(2 * 17 * 3, dtype=jnp.float32).reshape(2, 17, 3)
    slow, fast = slow_fast_split(toks, cls_pos=8)
    assert slow.shape == (2, 5, 3)
    assert fast.shape == (2, 16, 3)


def test_emrrg():
    m = EMRRG(llm_cfg=TINY_LLM, arm_kwargs=ARM_KW, cross_every=2)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    before, after, tgt, mask = _text()
    params = m.init(jax.random.PRNGKey(1), imgs, before, after, tgt, mask)
    loss = m.apply(params, imgs, before, after, tgt, mask)
    assert bool(jnp.isfinite(loss))
    out = m.apply(params, imgs, before, after, GCFG, method=EMRRG.generate)
    assert out.shape == (2, 4)


def test_mambaxray_clip():
    m = MambaXrayVLCLIP(
        arm_kwargs=ARM_KW,
        text_kwargs=dict(vocab_size=100, dim=16, depth=1, num_heads=2,
                         max_len=16),
        proj_dim=32,
    )
    imgs = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 100, (4, 8)))
    mask = jnp.ones((4, 8), jnp.int32)
    params = m.init(jax.random.PRNGKey(1), imgs, ids, mask)
    loss = m.apply(params, imgs, ids, mask)
    assert bool(jnp.isfinite(loss)) and float(loss) > 0


def test_classifiers():
    m = DPClassifier(
        num_attrs=14,
        vit_kwargs=dict(patch_size=8, embed_dim=16, depth=1, num_heads=2),
    )
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), imgs)
    logits = m.apply(params, imgs)
    assert logits.shape == (2, 14)
    labels = jnp.zeros((2, 14)).at[:, 0].set(1.0)
    assert bool(jnp.isfinite(weighted_bce_loss(logits, labels)))
    logits2 = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 2))
    assert bool(jnp.isfinite(swinchex_loss(logits2, labels)))


def test_mac_rrg():
    from medical_image_analysis_tpu.models.mac_rrg import MACRRG

    m = MACRRG(
        llm_cfg=TINY_LLM, chosen="swin",
        vision_kwargs=dict(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                           window_size=4, drop_path_rate=0.0),
    )
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 32, 32, 3))
    rag = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    conc = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    before, after, tgt, mask = _text()
    params = m.init(jax.random.PRNGKey(3), imgs, rag, conc, before, after,
                    tgt, mask)
    loss = m.apply(params, imgs, rag, conc, before, after, tgt, mask)
    assert bool(jnp.isfinite(loss))
    out = m.apply(params, imgs, rag, conc, before, after, GCFG,
                  method=MACRRG.generate)
    assert out.shape == (2, 4)


def test_emrrg_text_only_cross():
    m = EMRRG(llm_cfg=TINY_LLM, arm_kwargs=ARM_KW, cross_every=2,
              text_only_cross=True)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    before, after, tgt, mask = _text()
    params = m.init(jax.random.PRNGKey(1), imgs, before, after, tgt, mask)
    loss = m.apply(params, imgs, before, after, tgt, mask)
    assert bool(jnp.isfinite(loss))


def test_emrrg_hybrid_layers_trainable_under_llm_freeze():
    """Reference freeze semantics (MambaXrayVL_DownStream.py:151-162):
    hybrid decoder layers are rebuilt after the blanket llama freeze, so
    they train in full; the other LLM layers stay frozen."""
    from medical_image_analysis_tpu.train.loop import (
        trainable_mask,
        unfreeze_hybrid_layers,
    )

    m = EMRRG(llm_cfg=TINY_LLM, arm_kwargs=ARM_KW, cross_every=2)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    before, after, tgt, mask_ = _text()
    params = m.init(jax.random.PRNGKey(1), imgs, before, after, tgt, mask_)
    mask = trainable_mask(params, freeze_llm=True)
    mask = {"params": unfreeze_hybrid_layers(mask["params"], m.cross_every)}
    llm = mask["params"]["llm"]
    # layer 0 is hybrid (0 % 2 == 0) -> fully trainable
    assert all(jax.tree_util.tree_leaves(llm["layers_0"]))
    # layer 1 is a plain Llama block -> frozen
    assert not any(jax.tree_util.tree_leaves(llm["layers_1"]))
    # embed/norm/lm_head stay frozen
    assert not any(jax.tree_util.tree_leaves(llm["embed_tokens"]))
    # vision + projector towers train
    assert all(jax.tree_util.tree_leaves(mask["params"]["vision"]))


def test_clip_bert_text_tower_real_weights():
    """Stage-2 CLIP with the faithful Bio_ClinicalBERT tower
    (MambaXrayVL_CLIP.py:86-122): real HF BERT weights spliced in, text
    features match transformers' last_hidden_state EOS-pooled."""
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBert

    from medical_image_analysis_tpu.ckpt.torch_import import bert_hf_to_flax

    torch.manual_seed(0)
    hf = HFBert(HFBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64,
    )).eval()
    m = MambaXrayVLCLIP(
        arm_kwargs=ARM_KW, text_tower="bert",
        text_kwargs=dict(vocab_size=128, dim=32, n_layers=2, n_heads=4,
                         intermediate=64, max_position=64),
        proj_dim=16,
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ids = rng.integers(1, 128, (2, 8)).astype(np.int64)
    mask = np.ones((2, 8), np.int64)
    mask[1, 5:] = 0
    params = m.init(jax.random.PRNGKey(0), imgs, jnp.asarray(ids),
                    jnp.asarray(mask))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    bert_params = bert_hf_to_flax(sd, 2)["params"]
    params = {"params": {**params["params"],
                         "text_encoder": bert_params}}
    got = m.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                  method=MambaXrayVLCLIP.encode_txt)
    with torch.no_grad():
        lh = hf(torch.tensor(ids),
                attention_mask=torch.tensor(mask)).last_hidden_state
    eos = mask.sum(-1) - 1
    ref = lh[np.arange(2), eos].numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)
    # and the full CLIP loss still runs with the spliced tower
    loss = m.apply(params, imgs, jnp.asarray(ids), jnp.asarray(mask))
    assert bool(jnp.isfinite(loss))
