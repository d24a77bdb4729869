"""VL heads: Q-Former, Hopfield, R-GCN, CLIP, hybrid decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.models.clip import CLIPHead, clip_loss
from medical_image_analysis_tpu.models.hopfield import (
    Hopfield,
    HopfieldLayer,
    HopfieldPooling,
    hopfield_retrieve,
)
from medical_image_analysis_tpu.models.hybrid_decoder import HybridDecoderLayer
from medical_image_analysis_tpu.models.llm import LLMConfig
from medical_image_analysis_tpu.models.qformer import (
    EncoderProjectorQFormer,
    QFormer,
)
from medical_image_analysis_tpu.models.rgcn import (
    RGCN,
    CrossAttentionLookup,
    MultiScaleSelfAttentionFusion,
    ResidualCrossAttentionBlock,
    rgcn_conv,
)


def test_qformer_shapes():
    m = QFormer(dim=32, num_layers=2, num_heads=4, num_queries=14,
                intermediate=64)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 48))
    p = m.init(jax.random.PRNGKey(1), feats)
    out = m.apply(p, feats)
    assert out.shape == (2, 14, 32)


def test_qformer_projector():
    m = EncoderProjectorQFormer(dim=32, out_dim=64, num_queries=8,
                                num_layers=2, num_heads=4)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 48))
    p = m.init(jax.random.PRNGKey(1), feats)
    assert m.apply(p, feats).shape == (2, 8, 64)


def test_hopfield_retrieval_converges_to_pattern():
    # With high beta and a query near a stored pattern, retrieval should
    # return (nearly) that pattern — the associative-memory property.
    # (B, M, H=1, D) per-head layout
    patterns = (jnp.eye(4) * 4.0)[None, :, None, :]  # well-separated
    query = jnp.array([[[[3.5, 0.3, 0.1, 0.0]]]])  # (1, 1, 1, 4)
    out = hopfield_retrieve(query, patterns, patterns, beta=8.0,
                            update_steps=2)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]), [4.0, 0, 0, 0], atol=1e-2
    )


def test_hopfield_layer_with_external_bank():
    m = HopfieldLayer(hidden=16, update_steps_max=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    bank = jax.random.normal(jax.random.PRNGKey(1), (7, 16))
    p = m.init(jax.random.PRNGKey(2), x, bank)
    out = m.apply(p, x, bank)
    assert out.shape == (2, 5, 16)


def test_hopfield_pooling():
    m = HopfieldPooling(hidden=16, num_queries=2)
    stored = jax.random.normal(jax.random.PRNGKey(0), (3, 9, 16))
    p = m.init(jax.random.PRNGKey(1), stored)
    assert m.apply(p, stored).shape == (3, 32)


def test_rgcn_conv_manual():
    # 3 nodes + dummy; edges 0->1 (rel 0), 2->1 (rel 1).
    h = jnp.asarray(np.eye(4, 3, dtype=np.float32))  # (N+1=4, 3)
    edge_index = jnp.array([[0, 2], [1, 1]])
    edge_type = jnp.array([0, 1])
    r, din, dout = 3, 3, 2
    w_rel = jnp.ones((r, din, dout))
    w_self = jnp.zeros((din, dout))
    out = rgcn_conv(h, edge_index, edge_type, w_rel, w_self)
    # node1 receives mean over rel0 {node0} + mean over rel1 {node2}.
    np.testing.assert_allclose(np.asarray(out[1]), [2.0, 2.0])
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 0.0])


def test_rgcn_module_and_fusion():
    m = RGCN(hidden=8, out_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 4))
    ei = jnp.array([[0, 1, 2], [1, 2, 3]])
    et = jnp.array([0, 1, 2])
    p = m.init(jax.random.PRNGKey(1), x, ei, et)
    out = m.apply(p, x, ei, et)
    assert out.shape == (6, 16)

    fusion = MultiScaleSelfAttentionFusion(dim=16, num_scales=2,
                                           num_heads=4, num_layers=1)
    feats = [jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16)),
             jax.random.normal(jax.random.PRNGKey(3), (2, 5, 16))]
    p2 = fusion.init(jax.random.PRNGKey(4), feats)
    assert fusion.apply(p2, feats).shape == (2, 8, 16)


def test_cross_attention_blocks():
    blk = ResidualCrossAttentionBlock(dim=16, num_heads=4)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    p = blk.init(jax.random.PRNGKey(2), q, c)
    assert blk.apply(p, q, c).shape == (2, 3, 16)

    lk = CrossAttentionLookup(dim=16)
    bank = jax.random.normal(jax.random.PRNGKey(3), (20, 16))
    p2 = lk.init(jax.random.PRNGKey(4), q, bank)
    assert lk.apply(p2, q, bank).shape == (2, 3, 16)


def test_clip_head_and_loss():
    m = CLIPHead(proj_dim=32)
    vi = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    tx = jax.random.normal(jax.random.PRNGKey(1), (4, 24))
    p = m.init(jax.random.PRNGKey(2), vi, tx)
    v, t, scale = m.apply(p, vi, tx)
    loss = clip_loss(v, t, scale)
    assert bool(jnp.isfinite(loss)) and float(loss) > 0
    # Perfectly aligned features with high scale -> near-zero loss.
    ident = jnp.eye(4, 32)
    assert float(clip_loss(ident, ident, jnp.asarray(100.0))) < 1e-3


def test_hybrid_decoder_layer():
    cfg = LLMConfig(vocab_size=64, dim=32, n_layers=1, n_heads=4,
                    n_kv_heads=2, hidden_dim=64, dtype=jnp.float32)
    layer = HybridDecoderLayer(cfg, gate_fn="tanh")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    vision = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 32))
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    mask = jnp.where(jnp.tril(jnp.ones((6, 6), bool))[None, None], 0.0,
                     -jnp.inf)
    p = layer.init(jax.random.PRNGKey(2), x, pos, mask, vision)
    out, cache = layer.apply(p, x, pos, mask, vision)
    assert out.shape == x.shape and cache is None
    # Vision must influence the output through the gate.
    out2, _ = layer.apply(p, x, pos, mask, vision * 2.0)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-6
