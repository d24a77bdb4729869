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
