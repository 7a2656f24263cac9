"""Baseline JPEG decoder tests (fastlink_spark/jpeg.py).

The encoder here is TEST-LOCAL and independent of the decoder: forward
DCT via the transpose pair of the decoder's IDCT basis (orthogonality
is what makes the roundtrip a real check), standard ITU T.81 Annex K
quantization + Huffman tables (public spec constants), its own bit
writer with 0xFF stuffing. A decoder bug cannot cancel against an
encoder bug short of both mis-implementing the spec identically.
"""

from __future__ import annotations

import numpy as np
import pytest

from fastlink_spark.jpeg import _T, decode_jpeg

# ---------------------------------------------------------------- Annex K

STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = bytes(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = bytes(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]
)
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = bytes(
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _codes(bits, vals):
    """value -> (code, length), canonical assignment per the spec."""
    out = {}
    code, vi = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _cat(v):
    """JPEG magnitude category + the appended bits for value v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt(tid, q88):
    return _seg(0xDB, bytes([tid]) + bytes(q88.reshape(-1)[ZIGZAG].astype(np.uint8)))


def _dht(tc, th, bits, vals):
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _encode_block(bw, block, q88, dc_codes, ac_codes, pred):
    """block: 8x8 float (level-shifted pixels). Returns new DC pred."""
    F = _T.T @ block @ _T  # forward DCT — the transpose pair of the decoder's IDCT
    zz = np.rint(F / q88).astype(np.int64).reshape(-1)[ZIGZAG]
    s, bits = _cat(int(zz[0]) - pred)
    c, ln = dc_codes[s]
    bw.put(c, ln)
    if s:
        bw.put(bits, s)
    run = 0
    last = max([k for k in range(1, 64) if zz[k]] or [0])
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)
            run -= 16
        s, bits = _cat(int(zz[k]))
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(bits, s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        bw.put(c, ln)
    return int(zz[0])


def _pad8(img):
    h, w = img.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    return np.pad(img, [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2), mode="edge")


def encode_gray(img, q88, *, restart_interval=0):
    """Grayscale baseline JPEG (1 component, 4:4:4)."""
    h, w = img.shape
    dc_codes = _codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _codes(AC_LUMA_BITS, AC_LUMA_VALS)
    p = _pad8(img.astype(np.float64) - 128.0)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, q88)
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    pred = 0
    mcus_x, mcus_y = p.shape[1] // 8, p.shape[0] // 8
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            pred = 0
        my, mx = divmod(mcu, mcus_x)
        pred = _encode_block(
            bw, p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], q88, dc_codes, ac_codes, pred
        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _rgb_to_ycbcr(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def encode_color_444(rgb, qy, qc):
    """Color baseline JPEG, 3 components, no subsampling."""
    h, w = rgb.shape[:2]
    y, cb, cr = _rgb_to_ycbcr(rgb.astype(np.float64))
    planes = [_pad8(p - 128.0) for p in (y, cb, cr)]
    dcl, acl = _codes(DC_LUMA_BITS, DC_LUMA_VALS), _codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dcc, acc = _codes(DC_CHROMA_BITS, DC_CHROMA_VALS), _codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, qy) + _dqt(1, qc)
    out += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS) + _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    bw = _BitWriter()
    preds = [0, 0, 0]
    tabs = [(qy, dcl, acl), (qc, dcc, acc), (qc, dcc, acc)]
    mcus_x, mcus_y = planes[0].shape[1] // 8, planes[0].shape[0] // 8
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci in range(3):
            q, dc, ac = tabs[ci]
            preds[ci] = _encode_block(
                bw,
                planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                q,
                dc,
                ac,
                preds[ci],
            )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- tests


def _gradient_gray(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 7 + xx * 5) % 251).astype(np.uint8)


def test_jpeg_roundtrip_gray_q1():
    """Q=1 keeps quantization loss at DCT float-rounding scale; the
    decode must land within ±2 of the source everywhere."""
    img = _gradient_gray(24, 17)
    q1 = np.ones((8, 8), dtype=np.int32)
    payload = encode_gray(img, q1)
    out = decode_jpeg(payload)
    assert out.shape == (24, 17, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 0] == out[:, :, 2]).all()
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_jpeg_roundtrip_gray_annexk_quality():
    """Annex K luma table (real quantization): lossy but must stay
    visually faithful — a genuinely smooth ramp (no mod-wrap sawtooth
    edges, which legitimately ring at this quantization) reconstructs
    within ±24 with a small mean error."""
    yy, xx = np.mgrid[0:32, 0:32]
    img = (yy * 3 + xx * 4 + 16).astype(np.uint8)  # max 3*31+4*31+16 = 233
    payload = encode_gray(img, STD_LUMA_Q)
    out = decode_jpeg(payload)[:, :, 0].astype(int)
    diff = np.abs(out - img.astype(int))
    assert diff.max() <= 24
    assert diff.mean() <= 6.0


def test_jpeg_roundtrip_color_444():
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(16, 8, 3)).astype(np.uint8)
    q1 = np.ones((8, 8), dtype=np.int32)
    payload = encode_color_444(rgb, q1, q1)
    out = decode_jpeg(payload)
    assert out.shape == (16, 8, 3)
    # YCbCr forward+inverse rounding plus Q=1 quantization: ±3
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3


def test_jpeg_restart_markers():
    """DRI/RSTn: same pixels as the no-restart encode, DC preds reset
    per segment."""
    img = _gradient_gray(16, 32)  # 8 MCUs
    q1 = np.ones((8, 8), dtype=np.int32)
    plain = decode_jpeg(encode_gray(img, q1))
    rst = decode_jpeg(encode_gray(img, q1, restart_interval=2))
    assert (plain == rst).all()


def _uniform_subsampled_jpeg(sampling, h, w, n_yblocks):
    """Hand-assembled uniform color JPEG: one MCU, Y sampling per
    `sampling`, chroma 1x1, DC-only blocks. Y quantized DC=5 with flat
    Q=16 -> every pixel round(5*16/8)+128 = 138; Cb=Cr=128 -> gray."""
    q16 = np.full((8, 8), 16, dtype=np.int32)
    dcl = _codes(DC_LUMA_BITS, DC_LUMA_VALS)
    acl = _codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dcc = _codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    acc = _codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, q16) + _dqt(1, q16)
    out += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, sampling, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS) + _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    bw = _BitWriter()
    # Y block 1: DC diff +5 (cat 3), EOB; remaining Y blocks: DC 0, EOB
    s, bits = _cat(5)
    c, ln = dcl[s]
    bw.put(c, ln)
    bw.put(bits, s)
    bw.put(*acl[0x00])
    for _ in range(n_yblocks - 1):
        bw.put(*dcl[0])
        bw.put(*acl[0x00])
    for _ in range(2):  # Cb, Cr: DC diff 0, EOB
        bw.put(*dcc[0])
        bw.put(*acc[0x00])
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize(
    "sampling,h,w,n_y",
    [
        (0x22, 16, 16, 4),  # 4:2:0 — four Y blocks per MCU
        (0x21, 8, 16, 2),   # 4:2:2 — horizontal-only subsampling
        (0x12, 16, 8, 2),   # 4:4:0 — vertical-only subsampling
    ],
)
def test_jpeg_subsampled_handcrafted_uniform(sampling, h, w, n_y):
    img = decode_jpeg(_uniform_subsampled_jpeg(sampling, h, w, n_y))
    assert img.shape == (h, w, 3)
    assert (img == 138).all()


def test_jpeg_gray_declared_sampling_is_noninterleaved():
    """T.81: an Ns=1 scan is non-interleaved — declared sampling
    factors do not shape the entropy stream. A grayscale file whose
    SOF declares 2x2 must decode identically to the 1x1 twin."""
    img = _gradient_gray(24, 17)
    payload = encode_gray(img, np.ones((8, 8), dtype=np.int32))
    sof = payload.index(b"\xff\xc0")
    patched = bytearray(payload)
    assert patched[sof + 11] == 0x11  # the component sampling byte
    patched[sof + 11] = 0x22
    assert (decode_jpeg(bytes(patched)) == decode_jpeg(payload)).all()


def test_jpeg_frozen_golden_8x8():
    """Frozen byte-literal golden (hand-assembled once, pinned): 8x8
    grayscale, flat Q=16, quantized DC=-3 -> every pixel
    round(-3*16/8)+128 = 122. Pins the decoder's bit-level behavior
    against regressions independent of the test encoder."""
    q16 = np.full((8, 8), 16, dtype=np.int32)
    golden = (
        b"\xff\xd8"
        + _dqt(0, q16)
        + _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        # bits: DC cat2 code '011' + bits '00' (-3), AC EOB '1010',
        # padded with 1s -> 01100101 01111111 = 0x65 0x7f
        + bytes([0x65, 0x7F])
        + b"\xff\xd9"
    )
    img = decode_jpeg(golden)
    assert img.shape == (8, 8, 3)
    assert (img == 122).all()


def test_jpeg_progressive_raises():
    bad = b"\xff\xd8" + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bad + b"\xff\xd9")


def test_jpeg_truncated_entropy_raises():
    img = _gradient_gray(8, 8)
    payload = encode_gray(img, np.ones((8, 8), dtype=np.int32))
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_jpeg_dims_cap_raises():
    huge = (
        b"\xff\xd8"
        + _seg(0xC0, bytes([8]) + (60000).to_bytes(2, "big") + (60000).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    with pytest.raises(ValueError, match="decode cap"):
        decode_jpeg(huge)


def test_jpeg_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")


def test_extract_features_jpeg_end_to_end(spark):
    """image/jpeg rides the REAL decode path through mapInPandas: the
    distributed feature equals image_feature(decode_jpeg(payload))
    locally, and a corrupt row (progressive SOF2) degrades to ok=False
    without failing the task."""
    from fastlink_spark.multimodal import (
        extract_features,
        image_feature,
        with_media_metadata,
    )

    rng = np.random.RandomState(5)
    q1 = np.ones((8, 8), dtype=np.int32)
    payloads = {
        0: encode_gray(_gradient_gray(12, 20), STD_LUMA_Q),
        1: encode_color_444(rng.randint(0, 256, size=(8, 16, 3)).astype(np.uint8), q1, q1),
    }
    rows = [(i, bytearray(p)) for i, p in payloads.items()]
    rows.append((99, bytearray(b"\xff\xd8" + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])) + b"\xff\xd9")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    media = with_media_metadata(df, "doc_id", "payload", "image/jpeg")
    out = {r["doc_id"]: r for r in extract_features(media, dim=16).collect()}
    assert not out[99]["ok"] and out[99]["feature"] is None
    for i, p in payloads.items():
        assert out[i]["ok"]
        want = image_feature(decode_jpeg(p), 16)
        assert np.allclose(np.array(out[i]["feature"], dtype=np.float32), want)


def test_jpeg_sos_component_order_differs_from_frame():
    """T.81: the entropy stream follows the SCAN header's component
    order. A file whose SOS lists Cr,Cb,Y (frame order Y,Cb,Cr) must
    decode to the same pixels as the conventional ordering (r6 review:
    frame-order iteration garbled or desynced such files)."""
    q16 = np.full((8, 8), 16, dtype=np.int32)
    dcl = _codes(DC_LUMA_BITS, DC_LUMA_VALS)
    acl = _codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dcc = _codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    acc = _codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, q16) + _dqt(1, q16)
    out += _seg(
        0xC0,
        bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS) + _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    # SOS lists components REVERSED: Cr (chroma tabs), Cb, then Y
    out += _seg(0xDA, bytes([3, 3, 0x11, 2, 0x11, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    for _ in range(2):  # Cr, Cb first: DC diff 0, EOB (chroma tables)
        bw.put(*dcc[0])
        bw.put(*acc[0x00])
    s, bits = _cat(5)  # then Y: DC diff +5, EOB (luma tables)
    c, ln = dcl[s]
    bw.put(c, ln)
    bw.put(bits, s)
    bw.put(*acl[0x00])
    bw.flush()
    out += bw.out + b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 8, 3)
    assert (img == 138).all()


def test_jpeg_mutation_fuzz_never_escapes_valueerror():
    """Per-row error policy: any corrupt payload must either decode or
    raise an exception in extract_features' catch set (ValueError /
    EOFError / IndexError / struct.error) — never TypeError, KeyError,
    numpy errors, MemoryError, or an infinite loop. 400 deterministic
    truncations + byte flips of a valid color payload."""
    import random

    rng_img = np.random.RandomState(3)
    base = encode_color_444(
        rng_img.randint(0, 256, size=(16, 16, 3)).astype(np.uint8),
        STD_LUMA_Q,
        np.ones((8, 8), dtype=np.int32),
    )
    rnd = random.Random(17)
    allowed = (ValueError, EOFError, IndexError)
    for trial in range(400):
        b = bytearray(base)
        if trial % 2 == 0:
            del b[rnd.randrange(2, len(b)) :]  # truncate
        for _ in range(rnd.randrange(1, 4)):  # plus 1-3 byte flips
            if len(b) > 3:
                b[rnd.randrange(2, len(b))] = rnd.randrange(256)
        try:
            out = decode_jpeg(bytes(b))
            assert out.dtype == np.uint8 and out.ndim == 3
        except allowed:
            pass


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes — both in the header stream and before RST markers in
    the entropy stream (r6 review: a fill byte used to be read as a
    marker / end the scan early)."""
    img = _gradient_gray(16, 32)
    q1 = np.ones((8, 8), dtype=np.int32)
    plain = encode_gray(img, q1, restart_interval=2)
    want = decode_jpeg(plain)
    # fill bytes before every RST marker in the entropy stream
    padded = plain.replace(b"\xff\xd0", b"\xff\xff\xff\xd0").replace(
        b"\xff\xd1", b"\xff\xff\xd1"
    )
    assert padded != plain
    assert (decode_jpeg(padded) == want).all()
    # fill bytes before a header marker (the SOF0)
    sof = plain.index(b"\xff\xc0")
    padded2 = plain[:sof] + b"\xff\xff" + plain[sof:]
    assert (decode_jpeg(padded2) == want).all()
