"""Side-input artifact builders for the heads-heavy task pipelines.

The reference's AM-MRG / R2GenKG / MAC-RRG models consume *offline
artifacts* produced by separate scripts:

- AM-MRG memory banks: stage-1 SwinCheX disease tokens + GradCAM
  features (``AM_MRG/SwinCheX/cam.py:35-181``) and a label-proportional
  Bio_ClinicalBERT report memory
  (``AM_MRG/models/report_memory_generation.py:1-86``);
- R2GenKG M3KG graph tensors: per-scale node features / edge_index /
  edge_type ``.pt`` files + a 6943x768 disease-token bank
  (``R2GenKG/configs/config.py:18-33``);
- MAC-RRG agent context: alias dictionary (``res_dict_aliases.json``),
  relation triples, chunk corpus + cached chunk vectors
  (``MAC_RRG/A_MM_KG_Agent/_*.py``, ``A_RAG_Agent/z_chunks_clinicalbert.py``).

This module makes every pipeline runnable end-to-end: artifacts load
from ``.npz`` paths when provided, and otherwise are *synthesized from
the training split with the same builder chain the reference uses*
(GradCAM -> CAM features -> visual memory; text-encoder CLS -> report
memory; report co-occurrence graph -> R-GCN tensors; alias/relations ->
agents). Synthesis uses randomly-initialized towers when no checkpoint
is given — shapes, dataflow, and determinism match the real chain.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def _on_cpu():
    """Pin side-input synthesis to the host CPU backend: these are
    offline artifact builders over tiny towers — remote TPU compiles
    (minutes each; 14 GradCAM grads alone) would dwarf the work."""
    try:
        dev = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        dev = None
    if dev is None:
        yield
    else:
        with jax.default_device(dev):
            yield

from ..evalx.chexbert import CHEXPERT_LABELS, _KEYWORDS, extract_labels
from ..utils.cam import (
    build_report_memory,
    build_visual_memory,
    extract_cam_features,
    swin_grad_cam,
)
from .tokenizer import WordTokenizer


def make_text_embedder(
    tok: WordTokenizer,
    dim: int = 64,
    depth: int = 2,
    num_heads: int = 4,
    max_len: int = 64,
    seed: int = 0,
    params=None,
) -> Callable[[Sequence[str]], np.ndarray]:
    """EOS-pooled text embedding (the Bio_ClinicalBERT stand-in used by
    the report-memory / agent chains). Random init unless ``params``."""
    from ..models.text_encoder import TextEncoder

    model = TextEncoder(
        vocab_size=tok.vocab_size, dim=dim, depth=depth,
        num_heads=num_heads, max_len=max_len,
    )
    if params is None:
        with _on_cpu():
            dummy = jnp.ones((1, 4), jnp.int32)
            params = model.init(jax.random.PRNGKey(seed), dummy,
                                jnp.ones((1, 4), jnp.int32))

    def embed(texts: Sequence[str]) -> np.ndarray:
        ids, masks = [], []
        for t in texts:
            i, m = tok.pad(
                tok.encode(t, max_len=max_len - 1, add_eos=True), max_len
            )
            ids.append(i)
            masks.append(m)
        with _on_cpu():
            ids = jnp.asarray(ids, jnp.int32)
            masks = jnp.asarray(masks, jnp.int32)
            feats = model.apply(params, ids, masks)
            pooled = TextEncoder.pool_eos(feats, masks)
        return np.asarray(pooled, np.float32)

    return embed


def build_am_banks(
    samples,
    image_loader,
    embed_texts: Callable[[Sequence[str]], np.ndarray],
    bank_dim: int,
    visual_bank_path: str = "",
    report_bank_path: str = "",
    n_cam_images: int = 8,
    cam_top_n: int = 4,
    report_memory_size: int = 256,
    visual_max_features: int = 128,
    swin_kwargs: dict | None = None,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """(visual_bank (14+N, bank_dim), report_bank (M, bank_dim)).

    Paths win when given (``.npy``/``.npz`` with an ``arr``/first key).
    Otherwise the full AM-MRG artifact chain runs on the train split:
    GradCAM over a (random-init) SwinCheX -> per-class CAM features ->
    :func:`..utils.cam.build_visual_memory`; text-embedded reports +
    rule labels -> :func:`..utils.cam.build_report_memory`.
    """
    from ..models.swin import SwinCheX, SwinTransformer

    rng = np.random.default_rng(seed)
    # Each bank path is honored independently — a provided real
    # artifact must never be silently replaced by a synthesized one.
    rbank = vbank = None
    if report_bank_path:
        rbank = _load_array(report_bank_path)
    if visual_bank_path:
        vbank = _load_array(visual_bank_path)
    if rbank is not None and vbank is not None:
        return vbank, rbank

    if rbank is None:
        # -- report memory --------------------------------------------
        reports = [s.report for s in samples[: 4 * report_memory_size]]
        embs = embed_texts(reports)
        labels = np.stack([extract_labels(r) for r in reports])
        rbank = build_report_memory(
            embs, labels, size=report_memory_size, seed=seed
        )
        rbank = _project(rbank, bank_dim, rng)
    if vbank is not None:
        return vbank.astype(np.float32), rbank.astype(np.float32)

    # -- visual memory (stage-1 CAM chain) ----------------------------
    kw = dict(embed_dim=16, depths=(1, 1), num_heads=(2, 2), window_size=4,
              drop_path_rate=0.0)
    kw.update(swin_kwargs or {})
    backbone = SwinTransformer(**kw)
    model = SwinCheX(backbone=backbone, num_classes=14)
    imgs = np.stack(
        [image_loader(s)[0] for s in samples[:n_cam_images]]
    ).astype(np.float32)
    per_class = []
    with _on_cpu():
        params = model.init(jax.random.PRNGKey(seed), jnp.asarray(imgs))
        for c in range(14):
            cam, tokens = swin_grad_cam(model, params, jnp.asarray(imgs), c)
            per_class.append(
                extract_cam_features(tokens, cam, top_n=cam_top_n)
            )
    feats = np.stack(per_class)  # (14, B, top_n, C)
    disease_tokens = feats.mean(axis=(1, 2))  # (14, C) stage-1 tokens
    cam_features = feats.reshape(-1, feats.shape[-1])
    vbank = build_visual_memory(
        _project(disease_tokens, bank_dim, rng),
        _project(cam_features, bank_dim, rng),
        max_features=visual_max_features, seed=seed,
    )
    return vbank.astype(np.float32), rbank.astype(np.float32)


def _project(x: np.ndarray, dim: int, rng: np.random.Generator):
    """Fixed random projection into the bank dimension (identity when
    dims already match)."""
    if x.shape[-1] == dim:
        return x.astype(np.float32)
    w = rng.standard_normal((x.shape[-1], dim)).astype(np.float32)
    return (x @ w) / np.sqrt(x.shape[-1])


def _load_array(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        z = np.load(path)
        key = "arr" if "arr" in z.files else z.files[0]
        return z[key].astype(np.float32)
    return np.load(path).astype(np.float32)


# ---------------------------------------------------------------------------
# R2GenKG graph artifacts
# ---------------------------------------------------------------------------


def synthesize_graph_artifacts(
    reports: Sequence[str],
    embed_texts: Callable[[Sequence[str]], np.ndarray],
    num_scales: int = 5,
    base_nodes: int = 8,
    edges_per_scale: int = 64,
    disease_bank_size: int = 64,
    seed: int = 0,
) -> dict:
    """Multi-granularity KG tensors from the train corpus (the M3KG
    artifact analog). Scale ``s`` holds the top ``base_nodes*(s+1)``
    content words; edges are typed: 0 = co-occurrence in a report,
    1 = adjacency within a sentence, 2 = same CheXpert category.
    Static shapes: node row ``N_s`` is the dummy pad row; pad edges
    point at it (the :func:`..models.rgcn.rgcn_conv` convention).

    Returns ``{"node_feats": [...], "edge_indices": [...],
    "edge_types": [...], "disease_bank": (M, D)}``.
    """
    from collections import Counter

    stop = {"the", "is", "are", "of", "a", "an", "no", "." , "there", "in"}
    counter = Counter()
    for r in reports:
        counter.update(w for w in r.split() if w not in stop and len(w) > 2)
    ranked = [w for w, _ in counter.most_common(num_scales * base_nodes * 2)]

    # keyword -> category index for type-2 edges
    kw_cat = {}
    for ci, label in enumerate(CHEXPERT_LABELS[:-1]):
        for kw in _KEYWORDS[label]:
            for w in kw.split():
                kw_cat[w] = ci

    out = {"node_feats": [], "edge_indices": [], "edge_types": []}
    for s in range(num_scales):
        k = base_nodes * (s + 1)
        words = (ranked + [f"node{i}" for i in range(k)])[:k]
        widx = {w: i for i, w in enumerate(words)}
        feats = embed_texts(words)  # (k, D)
        feats = np.concatenate(
            [feats, np.zeros((1, feats.shape[1]), np.float32)]
        )  # dummy pad row

        edges: list[tuple[int, int, int]] = []
        seen = set()

        def add(a: int, b: int, t: int):
            if a != b and (a, b, t) not in seen:
                seen.add((a, b, t))
                edges.append((a, b, t))

        for r in reports[:200]:
            toks = [w for w in r.split() if w in widx]
            present = sorted({widx[w] for w in toks})
            for i in range(len(toks) - 1):  # type 1: sentence adjacency
                if toks[i] in widx and toks[i + 1] in widx:
                    add(widx[toks[i]], widx[toks[i + 1]], 1)
            for i in present:  # type 0: co-occurrence
                for j in present:
                    add(i, j, 0)
            if len(edges) >= edges_per_scale:
                break
        for wa, ca in kw_cat.items():  # type 2: same CheXpert category
            for wb, cb in kw_cat.items():
                if ca == cb and wa in widx and wb in widx:
                    add(widx[wa], widx[wb], 2)
        edges = edges[:edges_per_scale]
        ei = np.full((2, edges_per_scale), k, np.int32)  # pad -> dummy row
        et = np.zeros((edges_per_scale,), np.int32)
        for i, (a, b, t) in enumerate(edges):
            ei[0, i], ei[1, i], et[i] = a, b, t
        out["node_feats"].append(feats)
        out["edge_indices"].append(ei)
        out["edge_types"].append(et)

    bank_terms = list(CHEXPERT_LABELS) + ranked
    bank_terms = (bank_terms + [f"term{i}" for i in range(disease_bank_size)])
    out["disease_bank"] = embed_texts(bank_terms[:disease_bank_size])
    return out


def load_graph_npz(path: str, num_scales: int = 5) -> dict:
    """Graph artifacts from one ``.npz`` with keys ``node_feats_{s}``,
    ``edge_index_{s}``, ``edge_type_{s}``, ``disease_bank`` (the .pt
    tensors of ``R2GenKG/configs/config.py:18-33``, converted)."""
    z = np.load(path)
    return {
        "node_feats": [z[f"node_feats_{s}"] for s in range(num_scales)],
        "edge_indices": [z[f"edge_index_{s}"] for s in range(num_scales)],
        "edge_types": [z[f"edge_type_{s}"] for s in range(num_scales)],
        "disease_bank": z["disease_bank"],
    }


# ---------------------------------------------------------------------------
# MAC-RRG agent context
# ---------------------------------------------------------------------------


def build_alias_dict(reports: Sequence[str], max_terms: int = 200) -> dict:
    """alias -> canonical entity (res_dict_aliases.json analog):
    CheXpert keywords map to their category name; frequent content words
    map to themselves."""
    alias = {}
    for label in CHEXPERT_LABELS[:-1]:
        for kw in _KEYWORDS[label]:
            alias[kw] = label
    from collections import Counter

    counter = Counter()
    for r in reports:
        counter.update(w for w in r.split() if len(w) > 3)
    for w, _ in counter.most_common(max_terms):
        alias.setdefault(w, w)
    return alias


def build_relations(
    reports: Sequence[str], alias_dict: dict, max_relations: int = 500
) -> list[tuple[str, str, str]]:
    """(head, relation, tail) triples by co-occurrence of canonical
    entities inside a report (``co_occurs``) or sentence
    (``same_sentence``) — the offline KG the agents traverse."""
    rels: list[tuple[str, str, str]] = []
    seen = set()
    aliases = sorted(alias_dict, key=len, reverse=True)
    for r in reports:
        text = " " + r.lower() + " "
        ents = [alias_dict[a] for a in aliases if a in text]
        ents = list(dict.fromkeys(ents))
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                key = (ents[i], "co_occurs", ents[j])
                if key not in seen:
                    seen.add(key)
                    rels.append(key)
                if len(rels) >= max_relations:
                    return rels
    return rels


class MACContext:
    """Everything the MAC-RRG agents need, built once per run: alias
    dict, relation triples, chunk corpus + searcher, embedder; plus a
    per-sample cache of (rag, concept) tensors keyed by draft text."""

    def __init__(
        self,
        reports: Sequence[str],
        embed_texts: Callable[[Sequence[str]], np.ndarray],
        max_chunks: int = 8,
        max_entities: int = 8,
        topk: int = 3,
    ):
        from ..agents.rag_agent import EntityWiseSearcher

        self.embed_texts = embed_texts
        self.alias_dict = build_alias_dict(reports)
        self.relations = build_relations(reports, self.alias_dict)
        # chunk corpus: unique sentences from the train reports
        chunks = []
        seen = set()
        for r in reports:
            for sent in r.split("."):
                sent = sent.strip()
                if sent and sent not in seen:
                    seen.add(sent)
                    chunks.append(sent)
        self.chunks = chunks[:512] or ["none"]
        self.searcher = EntityWiseSearcher(self.chunks, embed_texts)
        self.max_chunks = max_chunks
        self.max_entities = max_entities
        self.topk = topk
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def agent_embeds(self, draft: str) -> tuple[np.ndarray, np.ndarray]:
        """draft text -> (rag (max_chunks, D), concept (max_entities, D))."""
        if draft in self._cache:
            return self._cache[draft]
        from ..agents.kg_agent import encode_concepts
        from ..agents.rag_agent import encode_rag

        rag, _ = encode_rag(
            draft, self.alias_dict, self.searcher, self.embed_texts,
            topk=self.topk, max_chunks=self.max_chunks,
        )
        concept = encode_concepts(
            draft, self.alias_dict, self.relations, self.embed_texts,
            max_entities=self.max_entities,
        )
        self._cache[draft] = (rag, concept)
        return rag, concept

    def extra_fn(self, sample):
        """MRGBatcher ``extra_fn``: agents run over the sample's draft
        (falling back to the report when no draft field exists)."""
        rag, concept = self.agent_embeds(sample.draft or sample.report)
        return {"rag_embeds": rag, "concept_embeds": concept}
