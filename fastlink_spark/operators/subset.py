"""stringSubset / blockData extras.

- ``string_subset``: reference ``R/stringSubset.R • stringSubset`` — a
  fuzzy SEMI-join: keep only records participating in >=1 candidate
  pair (used upstream to shrink inputs before full linkage). Spark:
  left_semi against the candidate-pair set (SURVEY.md J9).
- ``window_blocks``: reference ``R/blockData.R • blockData(window.block=,
  window.size=)`` — overlapping numeric windows as block keys via the
  explode-to-buckets idiom (SURVEY.md J5): a row with value x lands in
  buckets floor(x/w) - 1 .. + 1, so any pair with |xa - xb| <= w shares
  a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def string_subset(records: DataFrame, pairs: DataFrame, id_col: str, *, id_a: str = "a_rec_id", id_b: str = "b_rec_id") -> DataFrame:
    """Records that appear on either side of >=1 candidate pair."""
    ids = pairs.select(F.col(id_a).alias(id_col)).union(pairs.select(F.col(id_b).alias(id_col))).distinct()
    return records.join(ids, id_col, "left_semi")


def window_block_keys(value: Column, window_size: float, prefix: str = "w") -> Column:
    """array<string> of overlapping window block keys for a numeric
    column (null value -> empty array)."""
    if not window_size > 0:
        # window_size=0 divides to null: concat_ws skips the null bucket
        # and every row silently lands in ONE global block — candidate
        # generation then goes quadratic with no error (r5 review)
        raise ValueError(f"window_size must be > 0, got {window_size}")
    b = F.floor(value / F.lit(float(window_size)))
    keys = F.transform(
        F.sequence(F.lit(-1), F.lit(1)),
        lambda d: F.concat_ws(":", F.lit(prefix), (b + d).cast("string")),
    )
    return F.when(value.isNotNull(), keys).otherwise(F.array().cast("array<string>"))


def window_blocks(df: DataFrame, value_col: str, window_size: float, id_col: str) -> DataFrame:
    """(id, value) -> exploded (block_key, id) rows under overlapping
    numeric windows; feed into operators.pairs.candidate_pairs. Every
    row lands in its own bucket b plus b±1, so a qualifying pair
    co-occurs in up to 3 cells and is de-duplicated downstream (O2:
    candidate_pairs' dropDuplicates). A one-sided own-bucket-only
    explode would cut that 3x candidate duplication but only applies to
    two-TABLE joins — a self-join needs both rows co-located in the
    same cell, so the symmetric explode is the correct shape here."""
    return df.select(
        F.explode(window_block_keys(F.col(value_col), window_size)).alias("block_key"),
        F.col(id_col),
        F.col(value_col),
    )
