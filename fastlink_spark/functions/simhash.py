"""64-bit SimHash over token hashes — JVM-side, O(1) expression tree.

Charikar-style: bit b of the fingerprint is 1 iff the majority of token
hashes have bit b set. Near-duplicates have small Hamming distance
(F.bit_count(a ^ b)). Complements MinHash: SimHash catches high-overlap
docs with one pass + cheap pairwise distance; MinHash LSH gives
candidate generation. ANSI-safe (bitwise ops, bounded adds).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .minhash import tokens


def simhash_from_hashes(hashes: Column, bits: int = 64) -> Column:
    """array<bigint> token hashes -> bigint simhash (null for empty)."""

    # count of set bits at position b across hashes, majority -> bit set.
    # call_function: the PySpark shiftleft/shiftrightunsigned wrappers
    # only take int shift amounts; the SQL functions accept columns.
    sh = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(
            F.when(
                F.aggregate(
                    hashes,
                    F.lit(0).cast("long"),
                    lambda a, h: a
                    + F.call_function("shiftrightunsigned", h, b).bitwiseAND(
                        F.lit(1).cast("long")
                    ),
                )
                * 2
                > F.size(hashes),
                F.call_function("shiftleft", F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        ),
    )
    return F.when(F.size(hashes) > 0, sh)


def md5_hash60(s: Column) -> Column:
    """60-bit integer from the first 15 hex chars of md5(s) — the
    oracle-twin hash: DuckDB computes the identical value via
    ``('0x' || substr(md5(x),1,15))::BIGINT`` (verified bit-exact).
    xxhash64 stays the production hash (one JVM op vs md5+conv)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def simhash(text: Column, *, hash_impl: str = "xxhash64") -> Column:
    """text -> simhash over unigram token hashes. hash_impl='xxhash64'
    (production, 64-bit) or 'md5' (oracle-twin, 60-bit)."""
    toks = tokens(text)
    if hash_impl == "md5":
        return simhash_from_hashes(F.transform(toks, md5_hash60), bits=60)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return simhash_from_hashes(hashes)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))
