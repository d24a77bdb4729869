"""MAC agents, GradCAM, memory generators, PTB tokenizer, native ext."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.agents.kg_agent import (
    encode_concepts,
    extract_entity_links,
    graph_attention_embed,
    merge_entities,
    preprocess_report,
)
from medical_image_analysis_tpu.agents.rag_agent import (
    EntityWiseSearcher,
    encode_rag,
    merge_dedup_chunks_only,
)
from medical_image_analysis_tpu.evalx.ptb_tokenizer import (
    ptb_tokenize_sentence,
    tokenize,
)
from medical_image_analysis_tpu.models.swin import SwinCheX, SwinTransformer
from medical_image_analysis_tpu.utils.cam import (
    build_report_memory,
    build_visual_memory,
    extract_cam_features,
    swin_grad_cam,
)

ALIASES = {
    "pleural effusion": "EFFUSION",
    "effusion": "EFFUSION",
    "cardiomegaly": "CARDIOMEGALY",
    "enlarged heart": "CARDIOMEGALY",
}
RELATIONS = [
    ("EFFUSION", "located_in", "PLEURA"),
    ("CARDIOMEGALY", "affects", "HEART"),
    ("PLEURA", "part_of", "LUNG"),
]


def _embed(texts):
    rng = np.random.default_rng(0)
    out = []
    for t in texts:
        r = np.random.default_rng(abs(hash(t)) % 2**32)
        out.append(r.standard_normal(16).astype(np.float32))
    return np.stack(out)


def test_entity_extraction_and_links():
    ents = preprocess_report(
        "there is a small pleural effusion . enlarged heart .", ALIASES
    )
    assert merge_entities(ents) == ["EFFUSION", "CARDIOMEGALY"]
    links = extract_entity_links(RELATIONS, ["EFFUSION"], topk=10)
    assert links["EFFUSION"] == [("located_in", "PLEURA")]


def test_concept_and_rag_encoding():
    report = "there is a pleural effusion ."
    conc = encode_concepts(report, ALIASES, RELATIONS, _embed,
                           max_entities=10)
    assert conc.shape == (10, 16)
    assert np.abs(conc[0]).sum() > 0 and np.abs(conc[5]).sum() == 0

    chunks = ["effusion is fluid in the pleura",
              "cardiomegaly means enlarged heart",
              "normal lungs are clear"]
    searcher = EntityWiseSearcher(chunks, _embed)
    rag, mask = encode_rag(report, ALIASES, searcher, _embed, topk=1,
                           max_chunks=4)
    assert rag.shape == (4, 16) and mask.sum() == 1
    assert merge_dedup_chunks_only([[0, 1], [1, 2]]) == [0, 1, 2]


def test_graph_attention_embed_no_neighbors():
    c = np.ones(4, np.float32)
    out = graph_attention_embed(c, np.zeros((0, 4)), np.zeros((0, 4)))
    np.testing.assert_allclose(out, c)


def test_swin_grad_cam_and_memories():
    backbone = SwinTransformer(
        embed_dim=16, depths=(1, 1), num_heads=(2, 2), window_size=4,
        drop_path_rate=0.0,
    )
    model = SwinCheX(backbone=backbone, num_classes=3, num_mlp_heads=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    cam, tokens = swin_grad_cam(model, params, x, class_idx=1)
    assert cam.shape == (2, 4, 4)  # 32/4 -> merge -> 4x4 grid
    assert float(cam.max()) <= 1.0 and float(cam.min()) >= 0.0
    feats = extract_cam_features(tokens, cam, top_n=3)
    assert feats.shape == (2, 3, 32)

    vmem = build_visual_memory(np.zeros((14, 32)), feats.reshape(-1, 32),
                               max_features=4)
    assert vmem.shape == (18, 32)
    rmem = build_report_memory(
        np.random.default_rng(0).standard_normal((50, 8)),
        np.random.default_rng(1).integers(0, 2, (50, 14)), size=20,
    )
    assert rmem.shape == (20, 8)


def test_ptb_tokenizer_python():
    toks = ptb_tokenize_sentence("The lungs, (both) are clear... Isn't it?")
    assert "," not in toks and "..." not in toks and "?" not in toks
    assert "-lrb-" not in toks and "-LRB-" not in toks
    assert "lungs" in toks and "is" in toks and "n't" in toks


def test_ptb_tokenize_batch_native_matches_python():
    try:
        from medical_image_analysis_tpu.native import ptb_tokenize_batch
    except Exception:
        pytest.skip("native extension unavailable")
    sents = [
        "The lungs, (both) are clear... Isn't it?",
        "No effusion; heart size -- normal.",
    ]
    native = ptb_tokenize_batch(sents)
    python = [" ".join(ptb_tokenize_sentence(s)) for s in sents]
    assert native == python


def test_tokenize_interface():
    caps = {"a": ["The Heart is Normal."], "b": ["No, effusion!"]}
    out = tokenize(caps)
    assert out["a"] == ["the heart is normal"]
    assert out["b"] == ["no effusion"]
