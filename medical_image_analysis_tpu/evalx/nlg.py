"""NLG metric aggregator — the reference's per-model ``score()``.

``/root/reference/R2GenCSR/models/R2GenCSR.py:202-225``: BLEU-1..4,
ROUGE-L, METEOR, CIDEr over {id: [sentence]} dicts; chinese datasets
space-join characters first (:215-217).
"""

from __future__ import annotations

from .bleu import bleu
from .cider import cider
from .meteor import meteor
from .rouge import rouge_l


def compute_nlg_scores(
    gts: dict[str, list[str]],
    res: dict[str, list[str]],
    chinese: bool = False,
) -> dict[str, float]:
    if chinese:
        gts = {k: [" ".join(list(v.replace(" ", ""))) for v in vs]
               for k, vs in gts.items()}
        res = {k: [" ".join(list(v.replace(" ", ""))) for v in vs]
               for k, vs in res.items()}
    b = bleu(gts, res)
    return {
        "Bleu_1": b[0],
        "Bleu_2": b[1],
        "Bleu_3": b[2],
        "Bleu_4": b[3],
        "ROUGE_L": rouge_l(gts, res),
        "METEOR": meteor(gts, res),
        "CIDEr": cider(gts, res),
    }
