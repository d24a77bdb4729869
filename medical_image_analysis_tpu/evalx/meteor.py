"""METEOR-lite: pure-Python approximation of METEOR 1.5.

The reference pipes sentences through ``java -jar meteor-1.5.jar``
(``/root/reference/R2GenCSR/evalcap/meteor/meteor.py:44-52``). This
implementation reproduces the core scoring — unigram alignment
(exact + suffix-stem matching), weighted harmonic mean
F = P*R / (alpha*P + (1-alpha)*R), fragmentation chunk penalty
gamma*(chunks/matches)^beta — without the jar's WordNet synonym /
paraphrase tables (documented divergence; alpha=0.9, beta=3, gamma=0.5,
the METEOR 1.5 'en' defaults without the paraphrase stage).
"""

from __future__ import annotations

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5


def _stem(w: str) -> str:
    for suf in ("ing", "ed", "es", "s"):
        if len(w) > len(suf) + 2 and w.endswith(suf):
            return w[: -len(suf)]
    return w


def _align(cand: list[str], ref: list[str]):
    """Greedy stage-wise alignment: exact first, then stems. Returns
    (num_matches, num_chunks)."""
    match_of = [-1] * len(cand)
    used = [False] * len(ref)
    for stage in (lambda w: w, _stem):
        keyed = {}
        for j, w in enumerate(ref):
            if not used[j]:
                keyed.setdefault(stage(w), []).append(j)
        for i, w in enumerate(cand):
            if match_of[i] >= 0:
                continue
            slots = keyed.get(stage(w))
            while slots:
                j = slots.pop(0)
                if not used[j]:
                    match_of[i] = j
                    used[j] = True
                    break
    matches = sum(1 for m in match_of if m >= 0)
    chunks = 0
    prev = None
    for i, m in enumerate(match_of):
        if m >= 0:
            if prev is None or m != prev + 1:
                chunks += 1
            prev = m
        else:
            prev = None if prev is None else prev
    return matches, chunks


def meteor(gts: dict[str, list[str]], res: dict[str, list[str]]) -> float:
    scores = []
    for sid, cands in res.items():
        cand = cands[0].lower().split()
        best = 0.0
        for ref_s in gts[sid]:
            ref = ref_s.lower().split()
            m, ch = _align(cand, ref)
            if m == 0:
                continue
            p = m / len(cand)
            r = m / len(ref)
            f = (p * r) / (ALPHA * p + (1 - ALPHA) * r)
            penalty = GAMMA * (ch / m) ** BETA
            best = max(best, f * (1 - penalty))
        scores.append(best)
    return sum(scores) / max(len(scores), 1)
