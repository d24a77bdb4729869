"""DICOM decode (data/dicom.py): synthesized Part-10 fixtures.

MIMIC-CXR native format (BASELINE.json north-star scope; the reference
only does PIL JPEG, ``data_helper.py:74-80``): uncompressed + RLE
Lossless decode, MONOCHROME1/2, rescale + window viewing transform,
end-to-end through ``decode_scaled`` into the standard resize path.
"""

import io
import struct

import numpy as np
import pytest

from medical_image_analysis_tpu.data.dicom import DicomError, decode_dicom
from medical_image_analysis_tpu.data.preprocessing import decode_scaled

EXPLICIT_TS = "1.2.840.10008.1.2.1"
IMPLICIT_TS = "1.2.840.10008.1.2"
RLE_TS = "1.2.840.10008.1.2.5"


def _el(group, elem, vr, value: bytes) -> bytes:
    tag = struct.pack("<HH", group, elem)
    if vr in ("OB", "OW", "UN", "SQ", "UT"):
        return tag + vr.encode() + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return tag + vr.encode() + struct.pack("<H", len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    return struct.pack("<HH", group, elem) + struct.pack("<I", len(value)) + value


def _ds(x) -> bytes:
    s = f"{x}".encode()
    return s + b" " if len(s) % 2 else s


def _packbits(data: bytes) -> bytes:
    """PackBits encode (PS3.5 G.3.1)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while (j < n and j - i < 128
                   and not (j + 1 < n and data[j + 1] == data[j])):
                j += 1
            out.append(j - i - 1)
            out.extend(data[i:j])
            i = j
    return bytes(out)


def make_dicom(pix16: np.ndarray, *, ts=EXPLICIT_TS, photometric="MONOCHROME2",
               wc=None, ww=None, slope=None, intercept=None) -> bytes:
    rows, cols = pix16.shape
    explicit = ts != IMPLICIT_TS
    el = (lambda g, e, vr, v: _el(g, e, vr, v)) if explicit else (
        lambda g, e, vr, v: _el_implicit(g, e, v))
    body = b""
    body += el(0x0028, 0x0002, "US", struct.pack("<H", 1))
    pm = photometric.encode()
    body += el(0x0028, 0x0004, "CS", pm + (b" " if len(pm) % 2 else b""))
    body += el(0x0028, 0x0010, "US", struct.pack("<H", rows))
    body += el(0x0028, 0x0011, "US", struct.pack("<H", cols))
    body += el(0x0028, 0x0100, "US", struct.pack("<H", 16))
    body += el(0x0028, 0x0103, "US", struct.pack("<H", 0))
    if wc is not None:
        body += el(0x0028, 0x1050, "DS", _ds(wc))
        body += el(0x0028, 0x1051, "DS", _ds(ww))
    if intercept is not None:
        body += el(0x0028, 0x1052, "DS", _ds(intercept))
        body += el(0x0028, 0x1053, "DS", _ds(slope))

    if ts == RLE_TS:
        raw = pix16.astype("<u2").tobytes()
        msb = _packbits(raw[1::2])
        lsb = _packbits(raw[0::2])
        if len(msb) % 2:
            msb += b"\x00"
        if len(lsb) % 2:
            lsb += b"\x00"
        header = struct.pack("<I", 2) + struct.pack(
            "<15I", 64, 64 + len(msb), *([0] * 13))
        frame = header + msb + lsb
        pd = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" + \
            struct.pack("<I", 0xFFFFFFFF)
        pd += struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty BOT
        pd += struct.pack("<HHI", 0xFFFE, 0xE000, len(frame)) + frame
        pd += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        body += pd
    else:
        body += el(0x7FE0, 0x0010, "OW", pix16.astype("<u2").tobytes())

    ts_b = ts.encode() + (b"\x00" if len(ts) % 2 else b"")
    meta = _el(0x0002, 0x0010, "UI", ts_b)
    return b"\x00" * 128 + b"DICM" + meta + body


@pytest.fixture
def pix():
    rng = np.random.default_rng(0)
    return rng.integers(0, 4096, (37, 29)).astype(np.uint16)


def _expected_window(pix, lo, hi):
    arr = np.clip((pix.astype(np.float32) - lo) / (hi - lo), 0, 1)
    return np.round(arr * 255).astype(np.uint8)


def test_uncompressed_minmax(pix):
    out = decode_dicom(make_dicom(pix))
    exp = _expected_window(pix, pix.min(), pix.max())
    assert out.dtype == np.uint8 and out.shape == pix.shape
    np.testing.assert_array_equal(out, exp)


def test_window_and_rescale(pix):
    out = decode_dicom(
        make_dicom(pix, wc=1024, ww=2048, slope=2, intercept=-100))
    scaled = pix.astype(np.float32) * 2 - 100
    exp = np.round(np.clip((scaled - 0) / 2048, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)


def test_monochrome1_inversion(pix):
    out1 = decode_dicom(make_dicom(pix, photometric="MONOCHROME1"))
    out2 = decode_dicom(make_dicom(pix.max() - pix))
    np.testing.assert_array_equal(out1, out2)


def test_implicit_vr(pix):
    np.testing.assert_array_equal(
        decode_dicom(make_dicom(pix, ts=IMPLICIT_TS)),
        decode_dicom(make_dicom(pix)),
    )


def test_rle_matches_uncompressed(pix):
    np.testing.assert_array_equal(
        decode_dicom(make_dicom(pix, ts=RLE_TS)),
        decode_dicom(make_dicom(pix)),
    )


def test_rle_constant_image():
    flat = np.full((16, 16), 777, np.uint16)
    out = decode_dicom(make_dicom(flat, ts=RLE_TS, wc=777, ww=100))
    assert out.shape == (16, 16)
    assert (out == 255).all() or (out == 128).all()  # mid-window value
    # wc=777 ww=100 -> lo=727: (777-727)/100 = 0.5 -> 128
    np.testing.assert_array_equal(out, np.full((16, 16), 128, np.uint8))


def test_decode_scaled_dcm_end_to_end(pix, tmp_path):
    """decode_scaled routes .dcm through the DICOM decoder and the same
    bicubic resize + RGB expand tail as JPEG inputs."""
    import PIL.Image

    p = tmp_path / "study.dcm"
    p.write_bytes(make_dicom(pix))
    out = decode_scaled(str(p), 64)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    gray = decode_dicom(make_dicom(pix))
    ref = PIL.Image.fromarray(gray).resize((64, 64), PIL.Image.BICUBIC)
    np.testing.assert_array_equal(out, np.asarray(ref.convert("RGB")))
    # file-like input sniffs the Part-10 magic (zip-loader path)
    out2 = decode_scaled(io.BytesIO(p.read_bytes()), 64)
    np.testing.assert_array_equal(out, out2)


def test_truncated_raises():
    with pytest.raises((DicomError, Exception)):
        decode_dicom(b"\x00" * 128 + b"DICM" + b"\x12\x34")


# ---------------------------------------------------------------------------
# JPEG Lossless (SOF3) — encoder fixture + round trips
# ---------------------------------------------------------------------------

JPEG_LL_SV1_TS = "1.2.840.10008.1.2.4.70"
JPEG_LL_TS = "1.2.840.10008.1.2.4.57"

# categories 0..16: sixteen 5-bit codes + one 6-bit (canonically valid)
_HUF_COUNTS = [0, 0, 0, 0, 16, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_HUF_SYMS = list(range(17))


def _huff_codes():
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(_HUF_COUNTS[ln - 1]):
            codes[_HUF_SYMS[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)
        return bytes(self.out)


def encode_jpeg_lossless(img: np.ndarray, precision=16, psv=1, pt=0):
    """Minimal single-component SOF3 encoder (test fixture)."""
    rows, cols = img.shape
    img = img.astype(np.int64)
    default = 1 << (precision - pt - 1)
    diffs = np.empty((rows, cols), np.int64)
    for r in range(rows):
        for c in range(cols):
            if r == 0 and c == 0:
                pred = default
            elif r == 0:
                pred = img[0, c - 1]
            elif c == 0:
                pred = img[r - 1, 0]
            elif psv == 1:
                pred = img[r, c - 1]
            elif psv == 2:
                pred = img[r - 1, c]
            elif psv == 4:
                pred = img[r, c - 1] + img[r - 1, c] - img[r - 1, c - 1]
            elif psv == 7:
                pred = (img[r, c - 1] + img[r - 1, c]) >> 1
            else:
                raise NotImplementedError(psv)
            d = int(img[r, c] - pred)
            # wrap to the mod-2^16 representative in [-32768, 32767]
            d = ((d + 32768) & 0xFFFF) - 32768
            diffs[r, c] = d
    codes = _huff_codes()
    bw = _BitWriter()
    for d in diffs.ravel():
        d = int(d)
        if d == -32768:
            code, ln = codes[16]
            bw.put(code, ln)
            continue
        ssss = 0 if d == 0 else int(abs(d)).bit_length()
        code, ln = codes[ssss]
        bw.put(code, ln)
        if ssss:
            v = d if d >= 0 else d + (1 << ssss) - 1
            bw.put(v & ((1 << ssss) - 1), ssss)
    scan = bw.flush()

    dht_payload = bytes([0]) + bytes(_HUF_COUNTS) + bytes(_HUF_SYMS)
    dht = b"\xff\xc4" + struct.pack(">H", 2 + len(dht_payload)) + dht_payload
    sof = b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3, precision, rows,
                                    cols, 1) + bytes([1, 0x11, 0])
    sos = b"\xff\xda" + struct.pack(">HB", 6 + 2, 1) + bytes(
        [1, 0x00, psv, 0, pt])
    return b"\xff\xd8" + dht + sof + sos + scan + b"\xff\xd9"


def make_dicom_jll(pix16: np.ndarray, *, ts=JPEG_LL_SV1_TS, psv=1,
                   wc=None, ww=None) -> bytes:
    frame = encode_jpeg_lossless(pix16, psv=psv)
    if len(frame) % 2:
        frame += b"\x00"
    rows, cols = pix16.shape
    body = b""
    body += _el(0x0028, 0x0002, "US", struct.pack("<H", 1))
    body += _el(0x0028, 0x0004, "CS", b"MONOCHROME2 "[:12].rstrip() + b" ")
    body += _el(0x0028, 0x0010, "US", struct.pack("<H", rows))
    body += _el(0x0028, 0x0011, "US", struct.pack("<H", cols))
    body += _el(0x0028, 0x0100, "US", struct.pack("<H", 16))
    body += _el(0x0028, 0x0103, "US", struct.pack("<H", 0))
    if wc is not None:
        body += _el(0x0028, 0x1050, "DS", _ds(wc))
        body += _el(0x0028, 0x1051, "DS", _ds(ww))
    pd = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" + \
        struct.pack("<I", 0xFFFFFFFF)
    pd += struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    pd += struct.pack("<HHI", 0xFFFE, 0xE000, len(frame)) + frame
    pd += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    body += pd
    ts_b = ts.encode() + (b"\x00" if len(ts) % 2 else b"")
    meta = _el(0x0002, 0x0010, "UI", ts_b)
    return b"\x00" * 128 + b"DICM" + meta + body


def test_jpeg_lossless_sv1_matches_uncompressed(pix):
    np.testing.assert_array_equal(
        decode_dicom(make_dicom_jll(pix)),
        decode_dicom(make_dicom(pix)),
    )


def test_jpeg_lossless_sv1_exact_values():
    """Bit-exact pixel recovery (lossless!) via full-range window."""
    rng = np.random.default_rng(7)
    # smooth + edges + extremes: exercises big and tiny categories
    pix = (np.cumsum(rng.integers(-9, 10, (23, 31)), axis=1)
           + 2048).astype(np.uint16)
    pix[5, 5] = 0
    pix[6, 6] = 65535
    out = decode_dicom(make_dicom_jll(pix, wc=32768, ww=65536))
    exp = np.round(np.clip(
        (pix.astype(np.float64) - 0) / 65536, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)


@pytest.mark.parametrize("psv", [2, 4, 7])
def test_jpeg_lossless_other_predictors(pix, psv):
    np.testing.assert_array_equal(
        decode_dicom(make_dicom_jll(pix, ts=JPEG_LL_TS, psv=psv)),
        decode_dicom(make_dicom(pix)),
    )


def test_jpeg_lossless_constant_and_gradient():
    flat = np.full((9, 9), 1234, np.uint16)
    np.testing.assert_array_equal(
        decode_dicom(make_dicom_jll(flat, wc=1234, ww=100)),
        np.full((9, 9), 128, np.uint8),
    )
    grad = np.tile(np.arange(64, dtype=np.uint16) * 64, (8, 1))
    np.testing.assert_array_equal(
        decode_dicom(make_dicom_jll(grad)),
        decode_dicom(make_dicom(grad)),
    )
