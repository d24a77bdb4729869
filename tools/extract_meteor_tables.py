"""Extract METEOR 1.5 jar data into ``MeteorTables.from_files`` format.

The reference scores METEOR through ``java -jar meteor-1.5.jar -stdio``
(``R2GenCSR/evalcap/meteor/meteor.py:44-52``), whose English synonym
stage uses WordNet-derived synset data and whose paraphrase stage uses
the full paraphrase-en table — both packaged inside the jar (a jar is a
zip). The jar ships with neither this repo nor the reference mount, so
the framework bundles small curated radiology tables by default; METEOR
values under those are self-consistent but NOT comparable to jar-scored
published numbers.

This tool closes that gap for users who have the jar:

    python tools/extract_meteor_tables.py /path/to/meteor-1.5.jar -o tables/
    export MIA_METEOR_TABLES=tables/     # picked up by evalx at import

It scans the jar for the English synset/exception entries
(``*english.synsets`` / ``*english.exceptions``) and the paraphrase
table (``*paraphrase-en*``), converting to:

- ``meteor_synonyms.tsv``   — ``word<TAB>id1 id2 ...`` (one word per
  line; ids are synset identifiers — words sharing an id are synonyms).
  Morphological exception forms from ``english.exceptions`` inherit the
  base word's synset ids so stem-stage exceptions still hit the synonym
  stage, matching the jar's lookup chain.
- ``meteor_paraphrases.txt`` — ``phrase1 ||| phrase2`` lines.

Paraphrase source format is auto-detected per entry (the jar stores it
gzipped): ``|||``-separated, tab-separated, or alternating line pairs.
Weights (a third field, where present) are dropped — our scorer, like
the reference wrapper's default task, uses unweighted stage matching.
"""

from __future__ import annotations

import argparse
import gzip
import io
import os
import sys
import zipfile


def _find(names: list[str], *needles: str) -> str | None:
    for n in names:
        low = n.lower()
        if all(s in low for s in needles):
            return n
    return None


def _read_entry(zf: zipfile.ZipFile, name: str) -> list[str]:
    raw = zf.read(name)
    if name.endswith(".gz"):
        raw = gzip.decompress(raw)
    return io.TextIOWrapper(
        io.BytesIO(raw), encoding="utf-8", errors="replace"
    ).read().splitlines()


def convert_synonyms(syn_lines: list[str],
                     exc_lines: list[str] | None) -> list[str]:
    """jar synset lines -> ``word<TAB>ids`` tsv lines."""
    table: dict[str, set] = {}
    for line in syn_lines:
        parts = line.split()
        if len(parts) < 2:
            continue
        word = parts[0].lower()
        table.setdefault(word, set()).update(parts[1:])
    # exceptions: "<variant> <base1> [base2 ...]" — variant inherits the
    # bases' synset ids (the jar resolves variants to bases pre-lookup).
    for line in exc_lines or []:
        parts = line.split()
        if len(parts) < 2:
            continue
        variant = parts[0].lower()
        ids = set()
        for base in parts[1:]:
            ids.update(table.get(base.lower(), ()))
        if ids:
            table.setdefault(variant, set()).update(ids)
    return [f"{w}\t{' '.join(sorted(ids))}" for w, ids in sorted(table.items())]


def convert_paraphrases(lines: list[str]) -> list[str]:
    """jar paraphrase lines -> ``a ||| b`` lines (format auto-detect)."""
    sample = [ln for ln in lines[:200] if ln.strip()]
    out = []
    if any("|||" in ln for ln in sample):
        for ln in lines:
            parts = [p.strip() for p in ln.split("|||")]
            if len(parts) >= 2 and parts[0] and parts[1]:
                out.append(f"{parts[0]} ||| {parts[1]}")
    elif any("\t" in ln for ln in sample):
        for ln in lines:
            parts = [p.strip() for p in ln.split("\t")]
            if len(parts) >= 2 and parts[0] and parts[1]:
                out.append(f"{parts[0]} ||| {parts[1]}")
    else:  # alternating phrase / paraphrase line pairs
        clean = [ln.strip() for ln in lines if ln.strip()]
        for a, b in zip(clean[::2], clean[1::2]):
            out.append(f"{a} ||| {b}")
    return out


def extract(jar_path: str, out_dir: str) -> dict[str, int]:
    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    with zipfile.ZipFile(jar_path) as zf:
        names = zf.namelist()
        syn = _find(names, "english", "synsets") or _find(names, "synsets")
        exc = _find(names, "english", "exceptions")
        para = (_find(names, "paraphrase-en") or _find(names, "paraphrase"))
        if not syn and not para:
            raise SystemExit(
                f"no synset or paraphrase entries found in {jar_path}; "
                f"entries seen: {names[:20]}..."
            )
        if syn:
            rows = convert_synonyms(
                _read_entry(zf, syn), _read_entry(zf, exc) if exc else None
            )
            path = os.path.join(out_dir, "meteor_synonyms.tsv")
            with open(path, "w") as f:
                f.write("\n".join(rows) + "\n")
            counts["synonyms"] = len(rows)
            print(f"{path}: {len(rows)} words (from {syn}"
                  + (f" + {exc}" if exc else "") + ")")
        if para:
            rows = convert_paraphrases(_read_entry(zf, para))
            path = os.path.join(out_dir, "meteor_paraphrases.txt")
            with open(path, "w") as f:
                f.write("\n".join(rows) + "\n")
            counts["paraphrases"] = len(rows)
            print(f"{path}: {len(rows)} pairs (from {para})")
    return counts


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("jar", help="path to meteor-1.5.jar")
    ap.add_argument("-o", "--out", default="meteor_tables",
                    help="output directory (point MIA_METEOR_TABLES here)")
    args = ap.parse_args(argv)
    extract(args.jar, args.out)
    print(f"done — export MIA_METEOR_TABLES={args.out}")


if __name__ == "__main__":
    main()
