"""Damerau-Levenshtein (restricted / optimal-string-alignment) distance
for the ``stringdist.method='dl'`` FieldSpec kind (SURVEY.md F2) — the
one stringdist method the repo lacked (jw / lv / soundex shipped in r1).

Semantics: classic OSA recurrence — substitution/insert/delete cost 1
plus a transposition of ADJACENT characters cost 1, no substring edited
twice ('ab'->'ba' = 1 where plain Levenshtein = 2). Vectorized per DP
row with NumPy inside an Arrow-batched pandas UDF slot (same slot as
JW): the insert left-dependency is resolved with the running-min trick
min_k(cur[k] + (j-k)) = idx + cummin(cur - idx), so each row is O(|b|)
NumPy ops, no per-cell Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def osa_distance(a: str, b: str) -> int:
    """Single-pair OSA distance (row-vectorized DP)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    av = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(lb + 1)
    prev2 = None
    prev = idx.astype(np.int64)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (av[i - 1] != bv)
        cur[1:] = np.minimum(prev[1:] + 1, sub)  # delete | substitute
        if i >= 2:
            tr = (av[i - 1] == bv[:-1]) & (av[i - 2] == bv[1:])
            if tr.any():
                cand = prev2[:-2] + 1
                cur[2:] = np.where(tr[: lb - 1], np.minimum(cur[2:], cand), cur[2:])
        # insert: cur[j] = min(cur[j], min_k<=j cur[k] + (j-k))
        cur = np.minimum(cur, np.minimum.accumulate(cur - idx) + idx)
        prev2, prev = prev, cur
    return int(prev[lb])


_DEFAULT_MAX_LEN = 128  # same cap as jw.py: the O(|a|*|b|) DP is
# unbounded on input length — a dl FieldSpec pointed at a long text
# column would otherwise run ~10^10 DP cells per unique pair and stall
# the executor (r5 review). Similarity is computed on the truncated
# prefixes, exactly like the JW kernel's contract.


def osa_sim_series(
    a: pd.Series, b: pd.Series, *, max_len: int = _DEFAULT_MAX_LEN
) -> pd.Series:
    """Normalized OSA similarity 1 - d/max(len) over two string series
    (null if either side null — pandas NaN/None/NA all count as null,
    mirroring jw.py's isna() rule; 1.0 for two empties). Unique-pair
    factorized like the JW kernel: each distinct (a,b) pair is computed
    once per Arrow batch; the DP itself is row-vectorized NumPy."""
    valid = (~(a.isna() | b.isna())).to_numpy()
    out = np.full(len(a), np.nan)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    seen: dict[tuple, float] = {}
    for i in np.flatnonzero(valid):
        # str() coercion: a non-string value that survives isna (e.g. a
        # numeric column routed to kind='dl') compares by its string
        # form instead of silently nulling the whole field out of the
        # EM (r5 review — the old isinstance(float) test did exactly
        # that)
        x, y = av[i], bv[i]
        x = x if isinstance(x, str) else str(x)
        y = y if isinstance(y, str) else str(y)
        if max_len:
            x, y = x[:max_len], y[:max_len]
        key = (x, y)
        s = seen.get(key)
        if s is None:
            mx = max(len(x), len(y))
            s = 1.0 if mx == 0 else 1.0 - osa_distance(x, y) / mx
            seen[key] = s
        out[i] = s
    return pd.Series(out)
