"""MinHash signatures + LSH band keys, entirely JVM-side.

Reference analogue: none — fastLink blocks via exact keys / windows /
k-means (``R/blockData.R``, ``R/clusterMatch.R``); BASELINE.json
north_star replaces k-means with deterministic text-shingle MinHash
band keys (SURVEY.md G20/G14). Deterministic => reproducible => resumable.

Design notes (scale): every step is a Catalyst expression over array
columns (split / transform / xxhash64 / array_min / aggregate) —
whole-stage codegen, no Python, no shuffle. Per-seed signatures reuse
one pass of shingle string hashing: sig_i = min_h xxhash64(h, i) over
the precomputed int64 shingle hashes, so each shingle string is hashed
once regardless of k. ANSI-mode safe (xxhash64 re-seed instead of an
overflowing a*x+b mod p permutation).

CRITICAL plan-size note: the k-element signature and b band keys are
built with ``F.transform(F.sequence(...), ...)`` — O(1) expression-tree
size in k and b. Building them as Python-generated ``F.array(*[...])``
literals embeds the upstream shingle subtree k*b times, which blows up
analysis/codegen and stalls executors (observed: 64-wide array hung a
100-row task indefinitely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE_W = 5
DEFAULT_BANDS = 16
DEFAULT_ROWS_PER_BAND = 4


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens (deterministic tokenizer)."""
    toks = F.split(F.lower(F.coalesce(text, F.lit(""))), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def shingle_hashes_from_tokens(toks: Column, w: int = DEFAULT_SHINGLE_W) -> Column:
    """array<bigint> xxhash64 over w-token shingles; short docs (<w
    tokens) contribute their full token string as a single shingle;
    empty token set -> null."""
    n = F.size(toks)
    full = F.array(F.xxhash64(F.concat_ws(" ", toks)))
    sh = F.transform(
        F.sequence(F.lit(0), n - F.lit(w)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(w)))),
    )
    return F.when(n >= F.lit(w), sh).when(n > 0, full)


def signature_from_hashes(hashes: Column, k: int) -> Column:
    """array<bigint> of k min-hashes: sig_i = min_h xxhash64(h, seed=i)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(F.transform(hashes, lambda h: F.xxhash64(h, i))),
    )


def band_keys_from_signature(
    sig: Column, bands: int = DEFAULT_BANDS, rows_per_band: int = DEFAULT_ROWS_PER_BAND
) -> Column:
    """array<string> LSH band keys 'b{j}:{chained xxhash64 of the j-th
    r-row signature slice}' (S-curve threshold ~ (1/b)^(1/r))."""
    r = rows_per_band
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.concat_ws(
            "",
            F.lit("b"),
            j.cast("string"),
            F.lit(":"),
            F.aggregate(
                F.slice(sig, j * F.lit(r) + F.lit(1), F.lit(r)),
                F.lit(0).cast("long"),
                lambda acc, x: F.xxhash64(acc, x),
            ).cast("string"),
        ),
    )


def add_minhash_bands(
    df: DataFrame,
    text_col: str,
    out_col: str = "band_keys",
    *,
    w: int = DEFAULT_SHINGLE_W,
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    keep_signature: bool = False,
) -> DataFrame:
    """text -> `out_col`: array<string> of LSH band keys (null text or
    empty token set -> null). Staged projections keep each level
    computed once per row."""
    k = bands * rows_per_band
    df = df.withColumn("__mh_sh", shingle_hashes_from_tokens(tokens(F.col(text_col)), w))
    df = df.withColumn(
        "__mh_sig",
        F.when(F.col("__mh_sh").isNotNull(), signature_from_hashes(F.col("__mh_sh"), k)),
    )
    df = df.withColumn(
        out_col,
        F.when(
            F.col("__mh_sig").isNotNull(),
            band_keys_from_signature(F.col("__mh_sig"), bands, rows_per_band),
        ),
    )
    if keep_signature:
        df = df.withColumnRenamed("__mh_sig", f"{out_col}_signature").drop("__mh_sh")
    else:
        df = df.drop("__mh_sh", "__mh_sig")
    return df
