"""Minimal host-side DICOM decoder for chest X-rays.

MIMIC-CXR is natively DICOM; the reference only ever decodes JPEG via
PIL (``R2GenCSR/dataset/data_helper.py:74-80``), so this is north-star
scope (BASELINE.json names "JPEG/DICOM decode" in the fused
preprocessing path) rather than reference parity.  Pure numpy — no
pydicom in the image.

Supported: DICOM Part 10 files (128-byte preamble + ``DICM``) and bare
datasets, explicit & implicit VR little endian, with pixel data either
native/uncompressed (transfer syntaxes 1.2.840.10008.1.2{,.1}) or RLE
Lossless (1.2.840.10008.1.2.5, PS3.5 Annex G: encapsulated fragments,
64-byte segment-offset header, PackBits segments stored as byte planes
MSB-first).  8/16-bit MONOCHROME1/2 and RGB; MONOCHROME1 is inverted,
Rescale slope/intercept applied, then windowed (WindowCenter/Width when
present, else full-range min/max) to uint8 — the standard CXR viewing
transform, producing the same uint8 (H, W) array a JPEG export of the
study would contain, which then feeds the ordinary resize/normalize
path (:func:`..preprocessing.decode_scaled`).
"""

from __future__ import annotations

import struct

import numpy as np

_EXPLICIT_LONG_VRS = {b"OB", b"OW", b"OF", b"OL", b"OD", b"SQ", b"UC",
                      b"UR", b"UT", b"UN"}
_RLE_TS = "1.2.840.10008.1.2.5"
_IMPLICIT_TS = "1.2.840.10008.1.2"


class DicomError(ValueError):
    pass


def _read_elements(buf: bytes, start: int, explicit: bool):
    """Yield (group, elem, value_bytes, end_pos) for top-level elements."""
    pos = start
    n = len(buf)
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, pos)
        pos += 4
        if explicit and group != 0xFFFE:
            vr = buf[pos:pos + 2]
            if vr in _EXPLICIT_LONG_VRS:
                (length,) = struct.unpack_from("<I", buf, pos + 4)
                pos += 8
            else:
                (length,) = struct.unpack_from("<H", buf, pos + 2)
                pos += 4
        else:
            (length,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        if length == 0xFFFFFFFF:
            # undefined length: encapsulated pixel data or sequence —
            # return the raw remainder; the caller parses fragments.
            yield group, elem, buf[pos:], n
            return
        yield group, elem, buf[pos:pos + length], pos + length
        pos += length


def _rle_unpack(seg: bytes, out_len: int) -> np.ndarray:
    """PackBits decode of one RLE segment (PS3.5 G.3.1)."""
    out = np.empty(out_len, np.uint8)
    i, o, n = 0, 0, len(seg)
    while i < n and o < out_len:
        h = seg[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            cnt = h + 1
            out[o:o + cnt] = np.frombuffer(seg, np.uint8, cnt, i)
            i += cnt
            o += cnt
        elif h > 128:  # replicate next byte 257-h times
            cnt = 257 - h
            out[o:o + cnt] = seg[i]
            i += 1
            o += cnt
        # h == 128: no-op
    if o < out_len:
        raise DicomError(f"RLE segment underrun ({o} < {out_len})")
    return out


def _decode_rle(pixel_blob: bytes, rows: int, cols: int,
                samples: int, bytes_per_sample: int) -> np.ndarray:
    # Encapsulated: item tags (FFFE,E000) — first is the Basic Offset
    # Table, the second the (single-frame) RLE frame.
    pos = 0
    frags = []
    while pos + 8 <= len(pixel_blob):
        group, elem, length = struct.unpack_from("<HHI", pixel_blob, pos)
        pos += 8
        if (group, elem) == (0xFFFE, 0xE0DD):  # sequence delimiter
            break
        if (group, elem) != (0xFFFE, 0xE000):
            raise DicomError(f"unexpected tag in encapsulated data: "
                             f"({group:04x},{elem:04x})")
        frags.append(pixel_blob[pos:pos + length])
        pos += length
    if len(frags) < 2:
        raise DicomError("RLE pixel data has no frame fragment")
    frame = frags[1]
    n_segs = struct.unpack_from("<I", frame, 0)[0]
    offsets = struct.unpack_from("<15I", frame, 4)[:n_segs]
    if n_segs != samples * bytes_per_sample:
        raise DicomError(
            f"RLE segments {n_segs} != samples*bytes {samples}*"
            f"{bytes_per_sample}")
    npix = rows * cols
    planes = []
    for s, off in enumerate(offsets):
        end = offsets[s + 1] if s + 1 < n_segs else len(frame)
        planes.append(_rle_unpack(frame[off:end], npix))
    # byte planes are MSB first within each sample
    out = np.zeros((samples, npix), np.uint32)
    for s in range(samples):
        for b in range(bytes_per_sample):
            shift = 8 * (bytes_per_sample - 1 - b)
            out[s] += planes[s * bytes_per_sample + b].astype(np.uint32) << shift
    return out.reshape(samples, rows, cols)


def decode_dicom(data: bytes) -> np.ndarray:
    """DICOM bytes -> uint8 (H, W) or (H, W, 3) viewing-transformed image."""
    if data[128:132] == b"DICM":
        # File meta group is always explicit VR little endian.
        body_start = 132
        ts = None
        for group, elem, val, end in _read_elements(data, 132, True):
            if group != 0x0002:
                break
            if (group, elem) == (0x0002, 0x0010):
                ts = val.rstrip(b"\x00 ").decode()
            body_start = end
        explicit = ts != _IMPLICIT_TS
    else:
        body_start, ts = 0, None
        # sniff: explicit files have a valid VR at offset 4
        explicit = data[4:6].isalpha() and data[4:6].isupper()

    rows = cols = None
    samples, bits_alloc, pixel_rep = 1, 16, 0
    photometric = "MONOCHROME2"
    slope, intercept = 1.0, 0.0
    wc = ww = None
    pixel = None
    for group, elem, val, _end in _read_elements(data, body_start, explicit):
        tag = (group, elem)
        if tag == (0x0028, 0x0002):
            samples = struct.unpack("<H", val[:2])[0]
        elif tag == (0x0028, 0x0004):
            photometric = val.rstrip(b"\x00 ").decode()
        elif tag == (0x0028, 0x0010):
            rows = struct.unpack("<H", val[:2])[0]
        elif tag == (0x0028, 0x0011):
            cols = struct.unpack("<H", val[:2])[0]
        elif tag == (0x0028, 0x0100):
            bits_alloc = struct.unpack("<H", val[:2])[0]
        elif tag == (0x0028, 0x0103):
            pixel_rep = struct.unpack("<H", val[:2])[0]
        elif tag == (0x0028, 0x1050):
            wc = float(val.split(b"\\")[0])
        elif tag == (0x0028, 0x1051):
            ww = float(val.split(b"\\")[0])
        elif tag == (0x0028, 0x1052):
            intercept = float(val)
        elif tag == (0x0028, 0x1053):
            slope = float(val)
        elif tag == (0x7FE0, 0x0010):
            pixel = val
            break
    if pixel is None or rows is None or cols is None:
        raise DicomError("missing Rows/Columns/PixelData")

    bps = bits_alloc // 8
    if ts == _RLE_TS:
        arr = _decode_rle(pixel, rows, cols, samples, bps).astype(np.float32)
    else:
        dt = {1: np.uint8, 2: np.uint16}[bps]
        arr = np.frombuffer(pixel, dt, rows * cols * samples)
        if pixel_rep == 1:
            arr = arr.astype({1: np.int8, 2: np.int16}[bps])
        if samples > 1:  # interleaved (planar config 0)
            arr = arr.reshape(rows, cols, samples).transpose(2, 0, 1)
        else:
            arr = arr.reshape(1, rows, cols)
        arr = arr.astype(np.float32)

    arr = arr * slope + intercept
    if photometric == "MONOCHROME1":
        arr = arr.max() - arr
    if samples == 1:
        if wc is not None and ww is not None and ww > 0:
            lo, hi = wc - ww / 2.0, wc + ww / 2.0
        else:
            lo, hi = float(arr.min()), float(arr.max())
        arr = np.clip((arr[0] - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
        return np.round(arr * 255.0).astype(np.uint8)
    # RGB: already display values
    return np.clip(arr.transpose(1, 2, 0), 0, 255).astype(np.uint8)
