"""MAC-RRG multi-agent iterative refinement driver.

The reference's whole point (``MAC_RRG/model/R2GenGPT.py:252-387`` plus
the ``A_MM_KG_Agent/_*.py`` / ``A_RAG_Agent`` artifact chain): a base
model produces a *draft* report, the KG agent extracts entities from the
draft and embeds their graph neighbourhoods, the RAG agent retrieves and
embeds supporting chunks, and the generator re-runs conditioned on
[img ⊕ rag ⊕ concept]. This module composes those pieces into one
driver:

    draft (no agent context) -> agents(draft) -> regenerate -> ...

``rounds=1`` matches the reference (one refinement pass over the stored
``Draft_text``); more rounds iterate on the model's own output.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..ckpt.checkpoint import load_delta, merge_delta
from ..configs.config import RunConfig
from ..evalx.chexbert import clinical_efficacy
from ..evalx.nlg import compute_nlg_scores
from ..models.mac_rrg import MACRRG
from .loop import (
    _device_batch,
    build_data,
    build_mrg_model,
    make_task_adapter,
)


def refine_mac_rrg(
    cfg: RunConfig,
    params=None,
    delta_file: str = "",
    rounds: int = 1,
    split: str = "val",
    max_batches: int = 20,
) -> dict:
    """Run the draft -> agents -> regenerate loop over ``split``.

    Returns ``{"draft": NLG+CE scores, "refined": scores, "reports":
    {id: [refined text]}}``. ``params`` (or a trainable-delta file from
    :func:`..train.loop.fit_mrg`) supplies trained weights; random init
    otherwise (useful for plumbing checks).
    """
    assert cfg.model.task == "mac_rrg", "refine_mac_rrg needs task=mac_rrg"
    ann, tok, batcher, loader = build_data(cfg)
    ad = make_task_adapter(cfg, ann, tok, loader)
    ctx = ad.mac_ctx
    model = build_mrg_model(cfg, tok.vocab_size)
    gcfg = dataclasses.replace(cfg.generate, eos_id=tok.EOS)

    ev = batcher(split, extra_fn=ad.extra_fn)
    first = next(ev.batches(shuffle=False, drop_last=False))
    if params is None:
        params = model.init(
            jax.random.PRNGKey(cfg.train.seed), *ad.loss_args(first)
        )
        if delta_file:
            delta, _ = load_delta(delta_file)
            params = merge_delta(params, delta)

    @jax.jit
    def gen_fn(p, batch):
        return model.apply(
            p, *ad.gen_args(batch), gcfg, method=MACRRG.generate
        )

    rag_shape = first["rag_embeds"].shape[1:]
    con_shape = first["concept_embeds"].shape[1:]

    gts: dict = {}
    draft_res: dict = {}
    refined_res: dict = {}
    for bi, batch in enumerate(ev.batches(shuffle=False, drop_last=False)):
        if bi >= max_batches:
            break
        b = len(batch["ids"])
        # Round 0: agent-free draft (zero rag/concept context).
        work = dict(
            batch,
            rag_embeds=np.zeros((b, *rag_shape), np.float32),
            concept_embeds=np.zeros((b, *con_shape), np.float32),
        )
        out = np.asarray(gen_fn(params, _device_batch(work, None)))
        drafts = [tok.decode(out[i]) for i in range(b)]
        for i, sid in enumerate(batch["ids"]):
            gts[sid] = [batch["reports"][i]]
            draft_res[sid] = [drafts[i]]

        for _ in range(rounds):
            rag = np.zeros((b, *rag_shape), np.float32)
            con = np.zeros((b, *con_shape), np.float32)
            for i, d in enumerate(drafts):
                r, c = ctx.agent_embeds(d or "none")
                rag[i], con[i] = r, c
            work = dict(batch, rag_embeds=rag, concept_embeds=con)
            out = np.asarray(gen_fn(params, _device_batch(work, None)))
            drafts = [tok.decode(out[i]) for i in range(b)]
        for i, sid in enumerate(batch["ids"]):
            refined_res[sid] = [drafts[i]]

    def score(res):
        s = compute_nlg_scores(gts, res)
        s.update(clinical_efficacy(gts, res))
        return s

    return {
        "draft": score(draft_res),
        "refined": score(refined_res),
        "reports": refined_res,
    }


