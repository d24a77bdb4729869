"""Data-layer parity features (VERDICT items 8/10): chexbert retrieval,
study-grouped two-view sampling, zip loader, parallel decode, mixup,
METEOR synonym/paraphrase tables."""

import zipfile

import numpy as np

from medical_image_analysis_tpu.data.datasets import (
    MRGBatcher,
    Sample,
    group_study_two_views,
    load_chexbert_csv,
    mixup_cutmix,
    sample_context_ids,
    synthetic_annotations,
    synthetic_image_loader,
    zip_image_loader,
)
from medical_image_analysis_tpu.data.tokenizer import WordTokenizer
from medical_image_analysis_tpu.evalx.meteor import MeteorTables, meteor


def _samples():
    return [
        Sample("p1", ["a.png"], "large pleural effusion is seen"),
        Sample("p2", ["b.png"], "cardiomegaly with edema"),
        Sample("n1", ["c.png"], "the lungs are clear"),
        Sample("n2", ["d.png"], "no acute abnormality"),
    ]


def test_chexbert_mode_rule_fallback():
    rng = np.random.default_rng(0)
    pos, neg = sample_context_ids(rng, _samples(), 2, mode="chexbert")
    # positives must come from finding-bearing reports (idx 0/1).
    assert set(pos) <= {0, 1} and set(neg) <= {2, 3}


def test_chexbert_mode_csv(tmp_path):
    csv = tmp_path / "ann_chexbert.csv"
    csv.write_text(
        "id,cardiomegaly,no_finding\np1,1,0\np2,1,0\nn1,0,1\nn2,,1\n"
    )
    labels = load_chexbert_csv(str(csv))
    assert labels["p1"][-1] == 0 and labels["n1"][-1] == 1
    rng = np.random.default_rng(0)
    pos, neg = sample_context_ids(
        rng, _samples(), 2, mode="chexbert", chexbert_labels=labels
    )
    assert set(pos) <= {0, 1} and set(neg) <= {2, 3}


def test_multi_keyword_mode():
    rng = np.random.default_rng(0)
    pos, neg = sample_context_ids(
        rng, _samples(), 2, mode="keyword",
        keyword=["effusion", "cardiomegaly", "edema"],
    )
    assert set(pos) <= {0, 1} and set(neg) <= {2, 3}


def test_group_study_two_views():
    samples = [
        Sample("a", ["s1_a.png"], "r", study_id="s1"),
        Sample("b", ["s1_b.png"], "r", study_id="s1"),
        Sample("c", ["s2_a.png"], "r", study_id="s2"),
        Sample("d", ["s3_a.png", "s3_b.png", "s3_c.png"], "r",
               study_id="s3"),
    ]
    out = group_study_two_views(samples, np.random.default_rng(0))
    assert sorted(out[0].image_paths) == ["s1_a.png", "s1_b.png"]  # pooled 2
    assert out[2].image_paths == ["s2_a.png", "s2_a.png"]  # 1 -> duplicated
    assert len(out[3].image_paths) == 2  # >2 -> own + random pooled


def test_zip_image_loader(tmp_path):
    import PIL.Image

    zpath = tmp_path / "imgs.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for name in ("x.png", "y.png"):
            buf = tmp_path / name
            PIL.Image.fromarray(
                np.random.default_rng(0).integers(
                    0, 255, (40, 40, 3)
                ).astype(np.uint8)
            ).save(buf)
            zf.write(buf, name)
    loader = zip_image_loader(str(zpath), 32)
    out = loader(Sample("s", ["x.png", "y.png"], "r"))
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()


def test_decode_scaled_parity(tmp_path):
    """Fast DCT-scaled decode stays close to the reference full decode
    on a smooth (radiograph-like) JPEG, and is exact for non-JPEG."""
    import io

    import PIL.Image

    from medical_image_analysis_tpu.data.preprocessing import decode_scaled

    rng = np.random.default_rng(0)
    # Smooth large grayscale image (separable low-freq ramp + noise).
    y = np.linspace(0, 1, 1200)[:, None] * np.linspace(1, 0.2, 1000)[None]
    img = (255 * (0.7 * y + 0.05)).astype(np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(img, "L").save(buf, "JPEG", quality=95)
    fast = decode_scaled(io.BytesIO(buf.getvalue()), 224, fast=True)
    full_img = decode_scaled(io.BytesIO(buf.getvalue()), 224, fast=False)
    full = np.asarray(
        PIL.Image.fromarray(full_img).resize((224, 224), PIL.Image.BICUBIC))
    assert fast.shape == full.shape == (224, 224, 3)
    assert np.abs(fast.astype(np.float32) - full.astype(np.float32)).mean() < 2.0
    # PNG: draft is a no-op; grayscale-resize-then-expand still matches
    # full-decode-then-resize closely (L resample == per-channel resample).
    png = tmp_path / "g.png"
    PIL.Image.fromarray(rng.integers(0, 255, (64, 80), np.uint8), "L").save(png)
    a = decode_scaled(str(png), 32, fast=True)
    b_img = decode_scaled(str(png), 32, fast=False)
    b = np.asarray(PIL.Image.fromarray(b_img).resize((32, 32),
                                                     PIL.Image.BICUBIC))
    assert np.array_equal(a, b)


def test_parallel_batcher_matches_serial():
    ann = synthetic_annotations()
    tok = WordTokenizer.from_corpus(
        (s.report for s in ann["train"]), min_freq=1
    )
    loader = synthetic_image_loader(16, 2)
    kw = dict(batch_size=4, max_len=12, num_views=2)
    serial = MRGBatcher(ann["train"], tok, loader, num_workers=1, **kw)
    parallel = MRGBatcher(ann["train"], tok, loader, num_workers=8, **kw)
    b1 = next(serial.batches(shuffle=False))
    b2 = next(parallel.batches(shuffle=False))
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_array_equal(b1["target_ids"], b2["target_ids"])


def test_mixup_cutmix_soft_labels():
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((4, 2, 16, 16, 3)).astype(np.float32)
    labels = np.eye(4, 14, dtype=np.float32)
    mixed, soft = mixup_cutmix(rng, imgs, labels, prob=1.0)
    assert mixed.shape == imgs.shape and soft.shape == labels.shape
    np.testing.assert_allclose(soft.sum(1), labels.sum(1), rtol=1e-5)
    assert soft.max() <= 1.0 + 1e-6


def test_meteor_synonym_tables(tmp_path):
    syn = tmp_path / "synsets.txt"
    syn.write_text("car\tn1001\nautomobile\tn1001\nroad\tn2002\n")
    tables = MeteorTables.from_files(synonym_path=str(syn))
    gts = {"a": ["the car drove home"]}
    res = {"a": ["the automobile drove home"]}
    without = meteor(gts, res)
    with_tables = meteor(gts, res, tables=tables)
    assert with_tables > without


def test_meteor_paraphrase_tables(tmp_path):
    para = tmp_path / "paraphrase.txt"
    para.write_text("heart size ||| cardiac silhouette\n")
    tables = MeteorTables.from_files(paraphrase_path=str(para))
    gts = {"a": ["the heart size is normal"]}
    res = {"a": ["the cardiac silhouette is normal"]}
    without = meteor(gts, res)
    with_tables = meteor(gts, res, tables=tables)
    assert with_tables > without


def test_learnable_holdout_disjoint_combinations():
    """Compositional holdout: val/test bit-combinations never occur in
    train; every individual sentence still does (composition, not
    vocabulary, is what eval measures)."""
    from medical_image_analysis_tpu.data.datasets import (
        LEARNABLE_FINDINGS,
        learnable_synthetic_annotations,
    )

    ann = learnable_synthetic_annotations(
        n_train=256, n_val=32, n_test=32, holdout=16
    )

    def bits_of(split):
        return {int(s.id.rsplit("_", 1)[1]) for s in ann[split]}

    tr, va, te = bits_of("train"), bits_of("val"), bits_of("test")
    assert not (tr & va) and not (tr & te)
    assert va | te  # non-empty eval pools
    # every finding appears in both polarities in train (sentences seen)
    n_f = len(LEARNABLE_FINDINGS)
    for k in range(n_f):
        assert any((b >> k) & 1 for b in tr)
        assert any(not ((b >> k) & 1) for b in tr)
