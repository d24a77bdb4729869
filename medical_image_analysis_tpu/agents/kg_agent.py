"""MAC-RRG knowledge-graph agent (host-side, offline).

Re-designs ``/root/reference/MAC_RRG/A_MM_KG_Agent/``:
``_2_entity_res_anatomy_disorder.py`` (entity extraction against an
alias dictionary + merging), ``_3_three.py`` (neighbourhood link
extraction, topk=10), ``_6_GraphAttentionEmbedder.py`` (attention over
central + neighbour + edge embeddings). Embeddings come from any text
encoder with an ``embed_texts(list[str]) -> (N, D)`` interface (the
reference uses Bio_ClinicalBERT; :class:`..models.text_encoder` works).
"""

from __future__ import annotations

import re
from typing import Callable, Mapping, Sequence

import numpy as np


def preprocess_report(
    report: str, alias_dict: Mapping[str, str]
) -> list[str]:
    """Extract canonical entities whose aliases appear in the report.

    alias_dict: alias -> canonical entity id/name
    (res_dict_aliases.json semantics).
    """
    text = " " + report.lower() + " "
    found = []
    # longest-alias-first so multiword aliases win.
    for alias in sorted(alias_dict, key=len, reverse=True):
        if re.search(r"(?<![a-z])" + re.escape(alias.lower()) + r"(?![a-z])",
                     text):
            found.append(alias_dict[alias])
    return found


def merge_entities(entities: Sequence[str]) -> list[str]:
    """De-duplicate preserving first-seen order."""
    seen, out = set(), []
    for e in entities:
        if e not in seen:
            seen.add(e)
            out.append(e)
    return out


def extract_entity_links(
    relations: Sequence[tuple[str, str, str]],
    entities: Sequence[str],
    topk: int = 10,
) -> dict[str, list[tuple[str, str]]]:
    """central -> up to topk (relation, neighbour) pairs (_3_three.py)."""
    out: dict[str, list[tuple[str, str]]] = {}
    for e in entities:
        links = []
        for head, rel, tail in relations:
            if head == e:
                links.append((rel, tail))
            elif tail == e:
                links.append((rel, head))
            if len(links) >= topk:
                break
        out[e] = links
    return out


def graph_attention_embed(
    central: np.ndarray,  # (D,)
    neighbors: np.ndarray,  # (K, D)
    edges: np.ndarray,  # (K, D)
) -> np.ndarray:
    """Attention over neighbourhood (GraphAttentionEmbedder): central
    attends to neighbour+edge features; returns (D,)."""
    if neighbors.size == 0:
        return central
    keys = neighbors + edges
    scores = keys @ central / np.sqrt(central.shape[-1])
    w = np.exp(scores - scores.max())
    w = w / w.sum()
    return central + w @ neighbors


def encode_concepts(
    report: str,
    alias_dict: Mapping[str, str],
    relations: Sequence[tuple[str, str, str]],
    embed_texts: Callable[[Sequence[str]], np.ndarray],
    topk: int = 10,
    max_entities: int = 100,
) -> np.ndarray:
    """Report -> (max_entities, D) concept embeddings, zero-padded
    (encode_concept, MAC R2GenGPT.py:203-251)."""
    entities = merge_entities(preprocess_report(report, alias_dict))
    if not entities:
        dim = embed_texts(["none"]).shape[-1]
        return np.zeros((max_entities, dim), np.float32)
    links = extract_entity_links(relations, entities, topk)
    outs = []
    for central in entities[:max_entities]:
        pairs = links.get(central, [])
        texts = [central] + [n for _, n in pairs] + [r for r, _ in pairs]
        embs = embed_texts(texts)
        k = len(pairs)
        out = graph_attention_embed(
            embs[0], embs[1 : 1 + k], embs[1 + k : 1 + 2 * k]
        )
        outs.append(out)
    arr = np.stack(outs).astype(np.float32)
    pad = max_entities - arr.shape[0]
    if pad > 0:
        arr = np.concatenate(
            [arr, np.zeros((pad, arr.shape[1]), np.float32)]
        )
    return arr
