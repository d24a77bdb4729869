"""Bundled METEOR synonym/paraphrase tables: the 4-stage scorer is
active by default and pinned on fixture sentence pairs
(VERDICT round-2 item 5; jar data formats per
``evalcap/meteor/meteor.py:44-52``)."""

import pytest

from medical_image_analysis_tpu.evalx.meteor import (
    MeteorTables,
    default_tables,
    meteor,
)


def test_tables_load_and_formats(tmp_path):
    t = default_tables()
    assert len(t.synonyms) > 200 and len(t.paraphrases) > 50
    # The loader parses the jar-style file formats.
    syn = tmp_path / "syn.tsv"
    syn.write_text("effusion\t1 2\nfluid\t2\n")
    par = tmp_path / "par.txt"
    par.write_text("pleural effusion ||| pleural fluid\n")
    t2 = MeteorTables.from_files(str(syn), str(par))
    assert t2.synonyms["effusion"] & t2.synonyms["fluid"]
    assert (
        ("pleural", "fluid") in t2.paraphrases[("pleural", "effusion")]
    )


def test_synonym_stage_active_by_default():
    gts = {"a": ["there is a small pleural effusion"]}
    res = {"a": ["there is a small pleural fluid"]}
    with_tables = meteor(gts, res)
    exact_stem_only = meteor(gts, res, tables=None)
    assert with_tables > exact_stem_only
    assert with_tables == pytest.approx(0.9644290, abs=1e-4)
    assert exact_stem_only == pytest.approx(0.83, abs=1e-4)


def test_paraphrase_stage_matches_phrases():
    gts = {"a": ["cardiomegaly is present"]}
    res = {"a": ["the heart is enlarged"]}
    with_tables = meteor(gts, res)
    exact_stem_only = meteor(gts, res, tables=None)
    assert with_tables > exact_stem_only
    assert with_tables == pytest.approx(0.3870968, abs=1e-4)


def test_identical_sentences_near_one():
    s = {"a": ["the lungs are clear"]}
    assert meteor(s, s) == pytest.approx(0.9921875, abs=1e-6)


def _make_jar(path, para_body: bytes, para_name="data/paraphrase-en.gz"):
    import gzip
    import zipfile

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "synonym/english.synsets",
            "effusion 101 102\nfluid 102\ncardiomegaly 200\n",
        )
        zf.writestr("synonym/english.exceptions", "effusions effusion\n")
        zf.writestr(para_name, gzip.compress(para_body))


def test_jar_extractor_roundtrip(tmp_path, monkeypatch):
    """tools/extract_meteor_tables.py: synthetic meteor-1.5.jar-format
    archive -> tables -> MIA_METEOR_TABLES changes scores (jar-table
    parity path, VERDICT r3 item 6)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.extract_meteor_tables import extract

    jar = tmp_path / "meteor-1.5.jar"
    _make_jar(
        jar, b"pleural effusion ||| pleural fluid ||| 0.91\n"
    )
    out = tmp_path / "tables"
    counts = extract(str(jar), str(out))
    assert counts == {"synonyms": 4, "paraphrases": 1}
    t = MeteorTables.from_files(
        str(out / "meteor_synonyms.tsv"), str(out / "meteor_paraphrases.txt")
    )
    # exception form inherits base synset ids; synonym lookup works
    assert t.synonyms["effusions"] == t.synonyms["effusion"]
    assert t.synonyms["effusion"] & t.synonyms["fluid"]
    assert ("pleural", "fluid") in t.paraphrases[("pleural", "effusion")]

    # env-var override is honored by default_tables() and flips the
    # bundled-tables flag that gates the nlg.py caveat.
    from medical_image_analysis_tpu.evalx import meteor as meteor_mod

    monkeypatch.setenv("MIA_METEOR_TABLES", str(out))
    default_tables.cache_clear()
    try:
        tt = default_tables()
        assert not meteor_mod.using_bundled_tables
        assert tt.synonyms["cardiomegaly"] == frozenset({"200"})
        gts = {"a": ["small pleural effusion"]}
        res = {"a": ["small pleural fluid"]}
        assert meteor(gts, res) > meteor(gts, res, tables=None)
    finally:
        monkeypatch.delenv("MIA_METEOR_TABLES")
        default_tables.cache_clear()
        default_tables()
        assert meteor_mod.using_bundled_tables


def test_jar_extractor_format_autodetect(tmp_path):
    """tab-separated and line-pair paraphrase formats also convert."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.extract_meteor_tables import extract

    jar = tmp_path / "tab.jar"
    _make_jar(jar, b"heart is enlarged\tcardiomegaly\n")
    extract(str(jar), str(tmp_path / "t1"))
    assert "cardiomegaly" in (tmp_path / "t1" / "meteor_paraphrases.txt").read_text()

    jar2 = tmp_path / "pairs.jar"
    _make_jar(jar2, b"no acute disease\nno acute findings\n")
    extract(str(jar2), str(tmp_path / "t2"))
    line = (tmp_path / "t2" / "meteor_paraphrases.txt").read_text().strip()
    assert line == "no acute disease ||| no acute findings"


def test_report_pair_fixture():
    """Pinned multi-sentence fixture: synonym (effusion/fluid,
    mild/small) and paraphrase (no evidence of / without evidence of)
    stages all fire."""
    gts = {
        "r1": [
            "small left pleural effusion . heart size is normal . "
            "no evidence of pneumothorax ."
        ]
    }
    res = {
        "r1": [
            "mild left pleural fluid . normal heart size . "
            "without evidence of pneumothorax ."
        ]
    }
    with_tables = meteor(gts, res)
    exact_stem_only = meteor(gts, res, tables=None)
    assert with_tables > exact_stem_only + 0.1
    assert with_tables == pytest.approx(
        meteor(gts, res), abs=1e-12
    )  # deterministic
