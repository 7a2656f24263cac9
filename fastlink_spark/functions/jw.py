"""Batch-vectorized Jaro / Jaro-Winkler similarity in NumPy.

The reference computes Jaro-Winkler via the R ``stringdist`` C library
(``1 - stringdist(a, b, method="jw", p=0.1)``; called from
``R/gammaCKpar.R``, ``R/gammaCK2par.R``, ``R/stringSubset.R``).
Semantics reproduced here (unit-tested in tests/test_jw.py):

- Winkler prefix bonus: common prefix capped at 4 chars, weight p=0.1,
  applied UNCONDITIONALLY (stringdist has no 0.7 "boost threshold";
  some libraries, e.g. DuckDB's jaro_winkler_similarity, gate the bonus
  at jaro>=0.7 — the two conventions agree for jaro>=0.7, which covers
  every gamma threshold we use, since jw<0.82 whenever jaro<0.7).
- transpositions counted as (#mismatched matched-positions)/2.0 (float).
- both strings empty -> 1.0; one empty -> 0.0; zero matches -> 0.0.

Implementation is batch-vectorized: the only Python-level loop is over
CHARACTER POSITIONS of the longer string (<= ``max_len``), with all work
inside each step vectorized across the whole Arrow batch via NumPy —
satisfying the "vectorized pandas/Arrow UDFs (no per-row Python)"
mandate of BASELINE.json input_hint. A unique-pair factorization
(reference's core trick: ``R/gammaCKpar.R`` compares unique values, not
rows — SURVEY.md J1/X1) deduplicates identical (a, b) pairs inside each
batch before scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_PREFIX_WEIGHT = 0.1
_MAX_PREFIX = 4
# Cap string length for the O(L^2) window scan. 128 chars is far beyond
# any normalized title/url-host field; longer inputs are truncated
# (documented behavior, same effect as pre-normalizing with substr).
_DEFAULT_MAX_LEN = 128


def _codes(strings: np.ndarray, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """object array of str -> (uint32 codepoint matrix [n, L], lengths [n])."""
    n = len(strings)
    if n == 0:
        return np.zeros((0, 1), dtype=np.uint32), np.zeros(0, dtype=np.int64)
    lens = np.fromiter((min(len(s), max_len) for s in strings), dtype=np.int64, count=n)
    L = max(int(lens.max()), 1)
    # object->fixed-width copy in ONE C-level cast: astype to 'U{L}'
    # truncates longer strings to L exactly like the old per-row
    # ``s[:L]`` loop (verified byte-equal), without n Python iterations
    u = strings.astype(f"U{L}")
    codes = u.view(np.uint32).reshape(n, L)
    return codes, lens


def jaro_winkler_np(
    a: np.ndarray,
    b: np.ndarray,
    *,
    winkler: bool = True,
    max_len: int = _DEFAULT_MAX_LEN,
) -> np.ndarray:
    """Jaro(-Winkler) similarity for two equal-length object arrays of str.

    Vectorized across pairs; Python loop only over char positions.
    Memory-bandwidth optimized (the kernel is DRAM-bound at high core
    counts): rows are BUCKETED by max(len) so temporaries are sized to
    the bucket, and codepoints are downcast to uint8 when the bucket is
    pure-ASCII (4x less traffic than uint32).
    """
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out

    a_codes, a_len = _codes(a, max_len)
    b_codes, b_len = _codes(b, max_len)

    w = np.maximum(a_len, b_len)
    buckets = [0, 8, 16, 24, 32, 48, 64, 96, max_len]
    lo = 0
    for hi in buckets[1:]:
        sel = (w > lo) | ((w == 0) & (lo == 0)) if lo == 0 else (w > lo)
        sel &= w <= hi
        lo = hi
        if not sel.any():
            continue
        idx = np.nonzero(sel)[0]
        La = max(int(a_len[idx].max()), 1)
        Lb = max(int(b_len[idx].max()), 1)
        ac = a_codes[idx][:, :La]
        bc = b_codes[idx][:, :Lb]
        ascii_ok = ac.max(initial=0) < 256 and bc.max(initial=0) < 256
        if ascii_ok:
            ac = ac.astype(np.uint8)
            bc = bc.astype(np.uint8)
        if ascii_ok and Lb <= 64 and La <= 64:
            out[idx] = _jaro_core_bitparallel(ac, a_len[idx], bc, b_len[idx], winkler)
        else:
            out[idx] = _jaro_core(ac, a_len[idx], bc, b_len[idx], winkler)
    return out


_PREFIX_MASKS = np.array([(1 << i) - 1 for i in range(65)], dtype=np.uint64)


def _jaro_core_bitparallel(
    a_codes: np.ndarray,
    a_len: np.ndarray,
    b_codes: np.ndarray,
    b_len: np.ndarray,
    winkler: bool,
) -> np.ndarray:
    """Bit-parallel greedy Jaro matching for ASCII strings with len<=64
    (the standard rapidfuzz-style technique, public knowledge): the b
    side is a per-char 64-bit position mask, so each a-position claims
    its match with O(1) uint64 ops per pair instead of an O(Lb) scan —
    removes the DRAM-bandwidth floor that capped multi-core scaling."""
    n, La = a_codes.shape
    Lb = b_codes.shape[1]
    both_empty = (a_len == 0) & (b_len == 0)
    window = np.maximum(np.maximum(a_len, b_len) // 2 - 1, 0)

    # batch-local alphabet: remap the (typically ~30) chars actually
    # present so the position-mask table stays cache-resident
    present = np.zeros(256, dtype=bool)
    present[a_codes.reshape(-1)] = True
    present[b_codes.reshape(-1)] = True
    remap = np.zeros(256, dtype=np.int16)
    alpha = np.nonzero(present)[0]
    remap[alpha] = np.arange(len(alpha))
    n_alpha = len(alpha)

    # position-mask table: pm[i, c] = bitmask of positions of char c in b_i
    pm = np.zeros((n, n_alpha), dtype=np.uint64)
    rows = np.arange(n)
    b_m = remap[b_codes]
    a_m = remap[a_codes]
    for p in range(Lb):
        live = rows[p < b_len]
        codes_p = b_m[live, p]
        # (row, char) is unique within one position p -> plain fancy
        # gather|scatter, no unbuffered bitwise_or.at needed
        pm[live, codes_p] = pm[live, codes_p] | (np.uint64(1) << np.uint64(p))

    used = np.zeros(n, dtype=np.uint64)
    match_a = np.zeros((n, La), dtype=bool)
    pos_b = np.zeros((n, La), dtype=np.uint8)
    u64 = np.uint64
    for j in range(La):
        lo = np.maximum(j - window, 0).astype(np.uint64)
        hi = np.minimum(j + window + 1, b_len).astype(np.int64)
        win = _PREFIX_MASKS[hi] & ~_PREFIX_MASKS[lo]
        cand = pm[rows, a_m[:, j]] & win & ~used
        if j > 0:
            cand &= np.where(j < a_len, ~u64(0), u64(0))
        bbit = cand & (~cand + u64(1))  # lowest set bit
        got = bbit != 0
        used |= bbit
        match_a[:, j] = got
        # exact position: log2 of a power of two (exact in float64)
        pos_b[:, j] = np.where(got, np.log2(bbit, where=got, out=np.zeros(n)), 0).astype(np.uint8)

    m = match_a.sum(axis=1).astype(np.float64)

    # transpositions: matched a-chars in j order vs matched b-chars in
    # b-position order (one compaction pass each, as in _jaro_core);
    # int8/uint8 keys keep these the only O(n*L) passes cache-friendly
    big8 = np.int16(127)
    key_a = np.where(match_a, np.arange(La, dtype=np.int16), big8)
    idx_a = np.argsort(key_a, axis=1, kind="stable")
    a_seq = np.take_along_axis(a_codes, idx_a, axis=1)
    # order matched b positions ascending; unmatched -> big
    key_b = np.where(match_a, pos_b.astype(np.int16), big8)
    idx_b = np.argsort(key_b, axis=1, kind="stable")
    bpos_sorted = np.take_along_axis(pos_b.astype(np.int64), idx_b, axis=1)
    b_seq = np.take_along_axis(
        b_codes, np.minimum(bpos_sorted, Lb - 1), axis=1
    )
    k_range = np.arange(La)
    mism = ((a_seq != b_seq) & (k_range < m[:, None])).sum(axis=1)
    t = mism / 2.0

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (
            m / np.maximum(a_len, 1) + m / np.maximum(b_len, 1) + (m - t) / np.maximum(m, 1)
        ) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    jaro = np.where(both_empty, 1.0, jaro)

    if winkler:
        P = min(_MAX_PREFIX, La, Lb)
        if P > 0:
            pre_eq = (a_codes[:, :P] == b_codes[:, :P]) & (
                np.arange(P) < np.minimum(a_len, b_len)[:, None]
            )
            ell = np.cumprod(pre_eq, axis=1).sum(axis=1)
        else:
            ell = np.zeros(n)
        jaro = jaro + ell * _PREFIX_WEIGHT * (1.0 - jaro)
    return jaro


def _jaro_core(
    a_codes: np.ndarray,
    a_len: np.ndarray,
    b_codes: np.ndarray,
    b_len: np.ndarray,
    winkler: bool,
) -> np.ndarray:
    n, La = a_codes.shape
    Lb = b_codes.shape[1]
    both_empty = (a_len == 0) & (b_len == 0)
    window = np.maximum(np.maximum(a_len, b_len) // 2 - 1, 0)

    b_used = np.zeros((n, Lb), dtype=bool)
    match_a = np.zeros((n, La), dtype=bool)
    jrange_b = np.arange(Lb)

    # Greedy Jaro matching: for each position j of `a` (in order), claim
    # the first unclaimed equal char of `b` within the window. Sequential
    # in j, vectorized across all n pairs.
    for j in range(La):
        lo = np.maximum(j - window, 0)
        hi = np.minimum(j + window + 1, b_len)
        cand = (b_codes == a_codes[:, j : j + 1]) & ~b_used
        cand &= (jrange_b >= lo[:, None]) & (jrange_b < hi[:, None])
        if j > 0:
            cand &= (j < a_len)[:, None]
        has = cand.any(axis=1)
        if not has.any():
            continue
        pos = cand.argmax(axis=1)
        rows = np.nonzero(has)[0]
        b_used[rows, pos[rows]] = True
        match_a[rows, j] = True

    m = match_a.sum(axis=1).astype(np.float64)

    # Transpositions: compact matched chars of a (in a-order) and of b
    # (in b-order) to the front via stable argsort on the match mask,
    # then count positional mismatches among the first m chars.
    W = max(La, Lb)
    big = np.int64(1 << 40)
    key_a = np.where(match_a, np.arange(La), big)
    idx_a = np.argsort(key_a, axis=1, kind="stable")
    a_seq = np.take_along_axis(a_codes, idx_a, axis=1)
    key_b = np.where(b_used, jrange_b, big)
    idx_b = np.argsort(key_b, axis=1, kind="stable")
    b_seq = np.take_along_axis(b_codes, idx_b, axis=1)
    if La < W:
        a_seq = np.pad(a_seq, ((0, 0), (0, W - La)))
    if Lb < W:
        b_seq = np.pad(b_seq, ((0, 0), (0, W - Lb)))
    k_range = np.arange(W)
    mism = ((a_seq != b_seq) & (k_range < m[:, None])).sum(axis=1)
    t = mism / 2.0

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (
            m / np.maximum(a_len, 1) + m / np.maximum(b_len, 1) + (m - t) / np.maximum(m, 1)
        ) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    jaro = np.where(both_empty, 1.0, jaro)

    if winkler:
        P = min(_MAX_PREFIX, La, Lb)
        if P > 0:
            pre_eq = (a_codes[:, :P] == b_codes[:, :P]) & (
                np.arange(P) < np.minimum(a_len, b_len)[:, None]
            )
            ell = np.cumprod(pre_eq, axis=1).sum(axis=1)
        else:
            ell = np.zeros(n)
        jaro = jaro + ell * _PREFIX_WEIGHT * (1.0 - jaro)
    return jaro


def jaro_winkler_series(
    a: pd.Series, b: pd.Series, *, winkler: bool = True, max_len: int = _DEFAULT_MAX_LEN
) -> pd.Series:
    """Null-safe, unique-pair-factorized JW over two pandas Series.

    Nulls propagate (either side null -> NaN), matching the reference's
    NA handling (NA pairs are split out before comparison in
    ``R/gammaCKpar.R`` and re-enter as gamma=NA).
    """
    valid = (~(a.isna() | b.isna())).to_numpy()
    out = np.full(len(a), np.nan, dtype=np.float64)
    if valid.any():
        va = a.to_numpy(dtype=object)[valid]
        vb = b.to_numpy(dtype=object)[valid]
        # unique-value factorization (SURVEY.md J1): score each distinct
        # (a, b) pair once, broadcast back by inverse index. Hash-based
        # pd.factorize per side + int64 combo codes — much cheaper than
        # np.unique over object tuples (that path serialized 32-core
        # runs on allocation/bandwidth).
        ca, ua = pd.factorize(va, use_na_sentinel=False)
        cb, ub = pd.factorize(vb, use_na_sentinel=False)
        combo = ca.astype(np.int64) * np.int64(len(ub)) + cb.astype(np.int64)
        uc, inverse = np.unique(combo, return_inverse=True)
        pa = (uc // len(ub)).astype(np.int64)
        pb = (uc % len(ub)).astype(np.int64)
        sa = ua.to_numpy(dtype=object)[pa] if hasattr(ua, "to_numpy") else np.asarray(ua, dtype=object)[pa]
        sb = ub.to_numpy(dtype=object)[pb] if hasattr(ub, "to_numpy") else np.asarray(ub, dtype=object)[pb]
        # exact-equality fast path (r8): JW(s, s) == 1.0 exactly in this
        # kernel for every s (full-window matches, t=0, prefix bonus
        # multiplies (1-jaro)=0), and candidate pairs agree exactly on
        # normalized fields a lot (same-url duplicate variants), so the
        # O(L^2)/bit-parallel scan runs only on the non-equal uniques.
        # One vectorized object compare per unique pair; bit-identical
        # outputs (q29's literal oracle pins them).
        eq = sa == sb
        sims = np.ones(len(uc), dtype=np.float64)
        ne = ~eq
        if ne.any():
            sims[ne] = jaro_winkler_np(sa[ne], sb[ne], winkler=winkler, max_len=max_len)
        out[valid] = sims[inverse]
    return pd.Series(out)
