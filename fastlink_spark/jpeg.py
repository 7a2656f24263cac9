"""Baseline sequential JPEG decode — pure stdlib + NumPy.

Narrows the media carve-out the same way r5's PNG decoder did
(SURVEY.md §2 multimodal row; VERDICT r5 "Next round" #8): baseline
JPEG is Huffman coding + an 8x8 IDCT, both expressible without codec
libraries, so "needs a codec lib" no longer applies. What this decoder
covers — the overwhelming share of real-world JPEGs:

- SOF0 (baseline sequential DCT), 8-bit precision
- 1 or 3 components (grayscale / YCbCr), one interleaved scan
- sampling factors 1-2 in each axis (4:4:4, 4:2:2, 4:2:0, 4:4:0),
  any integer-ratio combination up to 2
- restart markers (DRI / RSTn)
- 0xFF00 byte stuffing, APPn/COM/DNL skipping

Out of scope -> ValueError (the module's per-row bad-data policy:
extract_features maps it to an ok=False row, never a task failure):
progressive (SOF2), arithmetic coding (SOF9+), 12-bit, hierarchical,
multi-scan non-interleaved files, fractional sampling ratios.

Scale shape: the entropy decode is an inherently sequential per-row
Python loop (the bit stream carries no block offsets — same story as
PNG's paeth filter loop); the IDCT is batched per component into one
einsum over all blocks. Declared-dims caps bound every allocation
BEFORE decode (a crafted header degrades to ok=False, not an executor
OOM). At a 100 TB photo corpus you'd hand this stage a native codec;
the Spark-side plumbing (mapInPandas batch shape, ok=False rows,
feature schema) is identical either way.
"""

from __future__ import annotations

import numpy as np

# declared-dims cap in PEAK transient bytes (~80 B/pixel across coef
# arrays, IDCT temporaries, upsampled planes and the rgb stack — see
# _decode_scan): 2 GiB admits ~26.8 MP, comfortably above ordinary
# phone photos, while still bounding every allocation BEFORE decode so
# a crafted header degrades to ok=False instead of an executor OOM
JPEG_MAX_PIXEL_BYTES = 1 << 31

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 1-D IDCT basis: T[x, u] = c(u)/2 * cos((2x+1) u pi / 16); spatial =
# T @ F @ T.T (separable 2-D). Orthogonal, so the test encoder's
# forward DCT is T.T @ f @ T — an independent inverse pair.
_T = np.zeros((8, 8))
for _x in range(8):
    for _u in range(8):
        _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _T[_x, _u] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _Huff:
    """Canonical Huffman table from the DHT BITS/HUFFVAL lists."""

    __slots__ = ("lookup",)

    def __init__(self, counts: list[int], values: bytes):
        if len(counts) != 16 or sum(counts) != len(values):
            raise ValueError("bad DHT table")
        self.lookup: dict[tuple[int, int], int] = {}
        code, vi = 0, 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lookup[(ln, code)] = values[vi]
                code += 1
                vi += 1
            if code > (1 << ln):
                raise ValueError("overfull DHT table")
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.cnt = 0

    def bit(self) -> int:
        if self.cnt == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.cnt = 8
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code, ln = 0, 0
        lk = table.lookup
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            v = lk.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: map the s received bits to a signed coefficient."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _entropy_segments(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the scan's entropy bytes, splitting at RSTn markers.
    Returns (segments, index of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nb = buf[i + 1] if i + 1 < n else None
        if nb == 0x00:
            cur.append(0xFF)
            i += 2
        elif nb == 0xFF:
            i += 1  # fill byte before a marker (T.81 B.1.1.2) — r6 review
        elif nb is not None and 0xD0 <= nb <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break  # any real marker (EOI, next SOS, ...) ends the scan
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (h, w, 3) uint8 RGB (grayscale
    replicated). See the module docstring for scope; everything outside
    it raises ValueError (-> ok=False row in extract_features)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    dc: dict[int, _Huff] = {}
    ac: dict[int, _Huff] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them (r6 review: a fill byte was read as a
        # marker and the next real marker's bytes as a segment length)
        while i + 4 <= n and payload[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            break
        m = payload[i + 1]
        if m == 0xD9:  # EOI before any scan
            raise ValueError("JPEG ended before SOS")
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        seg = payload[i + 4 : i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                nv = sum(counts)
                vals = seg[p + 17 : p + 17 + nv]
                p += 17 + nv
                if tc > 1:
                    raise ValueError("bad DHT class")
                (dc if tc == 0 else ac)[th] = _Huff(counts, vals)
        elif m == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF header")
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nf = seg[5]
            if len(seg) < 6 + 3 * nf:
                raise ValueError("truncated JPEG SOF component list")
            if nf not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nf}")
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError(f"unsupported sampling {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{m - 0xC0} (baseline SOF0 only)"
            )
        elif m == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG DRI")
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS
            return _decode_scan(
                payload, i + 2 + seg_len, seg, frame, qt, dc, ac, restart_interval
            )
        # APPn / COM / DNL / anything else: skip
        i += 2 + seg_len
    raise ValueError("no JPEG scan found")


def _decode_scan(payload, scan_start, sos, frame, qt, dc_tabs, ac_tabs, restart_interval):
    if frame is None:
        raise ValueError("JPEG SOS before SOF")
    h, w, comps = frame
    if h <= 0 or w <= 0:
        raise ValueError("bad JPEG dimensions")
    # declared-dims cap BEFORE any allocation (PNG decoder's rule),
    # budgeted at PEAK transient usage, not output size: per-pixel the
    # decode holds int32 coef storage (4 B) + int64 deq (8 B) + float64
    # deq/nat/spatial temporaries (3x8 B) + up to three upsampled
    # float64 planes (3x8 B) + the float64 rgb stack (24 B) ≈ 80 B/px
    # worst case (r6 review: the earlier 12 B/px budget admitted ~4x
    # the cap in real allocations; r7/ADVICE: coef storage moved from
    # lists of boxed ints — ~84+ B/px of Python object overhead the
    # budget did not count — to a preallocated int32 ndarray, so every
    # term above is a real flat allocation now). 2 GiB / 80 B ≈ a
    # 26.8 MP ceiling per row — comfortably above ordinary phone
    # photos (12-24 MP).
    if h * w * 80 > JPEG_MAX_PIXEL_BYTES:
        raise ValueError(
            f"JPEG dimensions {w}x{h} exceed the decode cap "
            f"({h * w * 80} > {JPEG_MAX_PIXEL_BYTES} bytes)"
        )
    if len(sos) < 4 or len(sos) < 1 + 2 * sos[0] + 3:
        raise ValueError("truncated JPEG SOS header")
    ns = sos[0]
    if ns != len(comps):
        raise ValueError("non-interleaved multi-scan JPEG not supported")
    if ns == 1:
        # T.81: a single-component scan is NON-interleaved — the MCU is
        # one data unit and the component is coded raster-order over
        # its own block grid; the frame's declared sampling factors do
        # not shape the entropy stream. Normalizing to 1x1 makes the
        # interleaved code path below compute exactly that geometry
        # (without this, a grayscale file declaring 2x2 sampling would
        # decode garbled but ok=True — r6 review).
        cid, _, _, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    scan_order = []
    scan_tabs = {}
    for c in range(ns):
        cs, tt = sos[1 + 2 * c], sos[2 + 2 * c]
        scan_tabs[cs] = (tt >> 4, tt & 15)
        scan_order.append(cs)
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    n_mcus = mcus_x * mcus_y

    per_comp = {}
    if len({cid for cid, _, _, _ in comps}) != len(comps):
        raise ValueError("duplicate JPEG component ids")
    for cid, hs, vs, tq in comps:
        if cid not in scan_tabs:
            raise ValueError("frame component missing from scan")
        td, ta = scan_tabs[cid]
        if tq not in qt or td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("missing JPEG quant/Huffman table")
        bw, bh = mcus_x * hs, mcus_y * vs  # blocks per axis
        per_comp[cid] = {
            "hs": hs,
            "vs": vs,
            "q_zz": qt[tq].astype(np.int64),  # zigzag order, as stored in DQT
            "dc": dc_tabs[td],
            "ac": ac_tabs[ta],
            # preallocated (blocks, 64) int32 coef store (zigzag order):
            # one vectorized row-assign per decoded block (NOT 64 numpy
            # scalar stores — those were ~10x a list op, r6 review), no
            # boxed-int overhead (r7/ADVICE: lists of 64 Python ints
            # cost ~84+ B/px, ~2x the whole declared budget). int32 is
            # safe: AC coefs are <2^15 by category; the DC pred
            # accumulates diffs of magnitude <2^11 over at most ~850k
            # blocks at the 26.8 MP cap (incl. MCU padding), so
            # |pred| < 1.8e9 < 2^31.
            "coefs": np.zeros((bh * bw, 64), dtype=np.int32),
            "bw": bw,
            "bh": bh,
        }
    if set(scan_order) != set(per_comp):
        raise ValueError("scan component not in frame")
    # entropy decode follows the SCAN header's component order — T.81
    # mandates it, and files whose SOS reorders components decode
    # garbled (or desync) under frame order (r6 review)
    scan_comps = [per_comp[cid] for cid in scan_order]

    segs, _ = _entropy_segments(payload, scan_start)
    seg_idx = 0
    r = _BitReader(segs[0])
    preds = [0] * ns
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing JPEG restart segment")
            r = _BitReader(segs[seg_idx])
            preds = [0] * ns
        my, mx = divmod(mcu, mcus_x)
        for ci, pc in enumerate(scan_comps):
            for by in range(pc["vs"]):
                for bx in range(pc["hs"]):
                    zz = _decode_block(r, pc["dc"], pc["ac"], preds, ci)
                    bi = (my * pc["vs"] + by) * pc["bw"] + (mx * pc["hs"] + bx)
                    pc["coefs"][bi] = zz

    planes = []
    for cid, _, _, _ in comps:  # planes in FRAME order (Y, Cb, Cr)
        pc = per_comp[cid]
        # dequantize + dezigzag + batched IDCT over ALL blocks at once
        deq = pc["coefs"].astype(np.int64) * pc["q_zz"]
        deq = deq.astype(np.float64)
        nat = np.zeros_like(deq)
        nat[:, _ZIGZAG] = deq
        blocks = nat.reshape(-1, 8, 8)
        spatial = np.einsum("xu,nuv,yv->nxy", _T, blocks, _T)
        plane = (
            spatial.reshape(pc["bh"], pc["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(pc["bh"] * 8, pc["bw"] * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // pc["vs"], axis=0), hmax // pc["hs"], axis=1)
        planes.append(plane[:h, :w] + 128.0)

    if len(planes) == 1:
        g = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_block(r: _BitReader, dct: _Huff, act: _Huff, preds: list[int], ci: int):
    """One 8x8 block -> 64 quantized coefficients (plain list, zigzag
    order — row-assigned into the component's int32 coef ndarray by
    the caller; the list itself is transient per block)."""
    zz = [0] * 64
    s = r.huff(dct)
    if s > 11:
        raise ValueError("bad JPEG DC category")
    preds[ci] += _extend(r.bits(s), s)
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = r.huff(act)
        rr, ss = rs >> 4, rs & 15
        if ss == 0:
            if rr == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[k] = _extend(r.bits(ss), ss)
        k += 1
    return zz
