"""Candidate-pair generation: salted blocked self-join with explicit
skew splitting.

Reference analogue: the implicit |A|x|B| pair space of
``R/gammaCKpar.R`` / ``R/tableCounts.R`` (sparse unique-value index
algebra, ``src/ m_func_par``) — dissolved here into blocking + equi-join
(SURVEY.md X3/X5, J3/J7). The Zipf-skewed host distribution of web data
makes hot block keys inevitable; per BASELINE.json north_star the skew
split is EXPLICIT (triangle-salted self-join), with AQE skew-join only
as backstop.

Triangle salting (self-join form): each row in a skewed block gets salt
s = pmod(xxhash64(id), S); the quadratic block is covered exactly once
by the S*(S+1)/2 sub-joins {(sa, sb) : sa <= sb}, enumerated via a tiny
broadcast combo table. Unskewed blocks ride the same path with S=1
(single (0,0) combo) — one code path, no union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SKEW_THRESHOLD = 5_000  # block size above which we salt
DEFAULT_TARGET_BLOCK = 2_500  # aim for ~target^2/2 comparisons per task
MAX_SALTS = 64


def _salt_plan(profile: DataFrame, skew_threshold: int, target: int) -> DataFrame:
    """(block_key, n) -> (block_key, s_cnt) for blocks needing S>1."""
    return (
        profile.filter(F.col("n") > skew_threshold)
        .select(
            "block_key",
            F.least(F.ceil(F.col("n") / target), F.lit(MAX_SALTS)).cast("int").alias("s_cnt"),
        )
    )


def _combos(spark: SparkSession, s_values: list[int]) -> DataFrame:
    """Tiny (s_cnt, sa, sb) table: sa<=sb triangle combos per salt count."""
    rows = [(s, a, b) for s in s_values for a in range(s) for b in range(a, s)]
    return spark.createDataFrame(rows, "s_cnt int, sa int, sb int")


def candidate_pairs(
    blocked: DataFrame,
    *,
    id_col: str = "rec_id",
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    target_block: int = DEFAULT_TARGET_BLOCK,
    dedupe_pairs: bool = True,
) -> DataFrame:
    """Blocked self-join -> candidate pairs ``(a_*, b_*)`` with
    ``id_a < id_b`` canonical order (reference: dedupe branch of
    ``R/fastLink.R`` + i<j canonicalization, SURVEY.md J7).

    `blocked`: one row per (block_key, record), carrying `id_col` plus
    the slim comparison attributes. Attribute columns come out prefixed
    ``a_`` / ``b_``.

    Overlapping blocking schemes (minhash bands + host) produce the same
    pair under several keys; ``dedupe_pairs`` keeps one winner via
    dropDuplicates on the canonical pair id (SURVEY.md O2).
    """
    spark = blocked.sparkSession
    profile = blocked.groupBy("block_key").agg(F.count("*").alias("n"))
    plan = _salt_plan(profile, skew_threshold, target_block)
    s_values = sorted({r.s_cnt for r in plan.collect()} | {1})
    combos = _combos(spark, s_values)

    rows = (
        blocked.join(F.broadcast(plan), "block_key", "left")
        .withColumn("s_cnt", F.coalesce(F.col("s_cnt"), F.lit(1)))
        .withColumn("salt", F.pmod(F.xxhash64(F.col(id_col)), F.col("s_cnt")).cast("int"))
    )

    attr_cols = [c for c in blocked.columns if c not in ("block_key",)]
    left = rows.join(F.broadcast(combos), ["s_cnt"], "inner").where(F.col("salt") == F.col("sa"))
    a = left.select(
        F.col("block_key").alias("a_bk"),
        "sa",
        "sb",
        *[F.col(c).alias(f"a_{c}") for c in attr_cols],
    )
    b = rows.select(
        F.col("block_key").alias("b_bk"),
        F.col("salt").alias("b_salt"),
        *[F.col(c).alias(f"b_{c}") for c in attr_cols],
    )
    # Oriented triangle: each unordered pair is produced exactly once —
    # via its (min_salt -> left, max_salt -> right) orientation, or by
    # id order on the diagonal (equal salts). The id inequality must NOT
    # be applied to off-diagonal combos (salt order is independent of id
    # order; filtering by both silently drops ~half the cross-salt
    # pairs — caught by the q02 salted-vs-unsalted DuckDB oracle).
    pairs = a.join(
        b,
        on=[
            F.col("a_bk") == F.col("b_bk"),
            F.col("sb") == F.col("b_salt"),
            (F.col("sa") < F.col("sb"))
            | ((F.col("sa") == F.col("sb")) & (F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))),
        ],
        how="inner",
    ).drop("sa", "sb", "b_salt", "a_bk", "b_bk")

    # canonicalize to id_a < id_b (swap whole attr sets where needed)
    swap = F.col(f"a_{id_col}") > F.col(f"b_{id_col}")
    pairs = pairs.select(
        *[
            F.when(swap, F.col(f"b_{c}")).otherwise(F.col(f"a_{c}")).alias(f"a_{c}")
            for c in attr_cols
        ],
        *[
            F.when(swap, F.col(f"a_{c}")).otherwise(F.col(f"b_{c}")).alias(f"b_{c}")
            for c in attr_cols
        ],
    )

    if dedupe_pairs:
        pairs = pairs.dropDuplicates([f"a_{id_col}", f"b_{id_col}"])
    return pairs


def candidate_pairs_two(
    blocked_a: DataFrame,
    blocked_b: DataFrame,
    *,
    id_col: str = "rec_id",
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    target_block: int = DEFAULT_TARGET_BLOCK,
    dedupe_pairs: bool = True,
) -> DataFrame:
    """Two-table (dfA x dfB) blocked join — the reference's primary
    linkage mode (``R/fastLink.R • fastLink(dfA, dfB, ...)``), as
    opposed to the dedupe self-join. Skew split: rows of the LARGER
    (A) side of a hot block get salt = pmod(xxhash64(id), S); the B
    side of that block is replicated to all S salts via a broadcast
    salt-sequence join, so each (block, salt) cell joins independently.

    Inputs: (block_key, id, attrs...) per side; outputs a_*/b_* columns.
    """
    spark = blocked_a.sparkSession
    prof = (
        blocked_a.groupBy("block_key").agg(F.count("*").alias("na"))
        .join(blocked_b.groupBy("block_key").agg(F.count("*").alias("nb")), "block_key")
        .withColumn("n", F.col("na") + F.col("nb"))
    )
    plan = (
        prof.filter(F.col("n") > skew_threshold)
        .select(
            "block_key",
            F.least(F.ceil(F.col("n") / target_block), F.lit(MAX_SALTS)).cast("int").alias("s_cnt"),
        )
    )

    a_cols = [c for c in blocked_a.columns if c != "block_key"]
    b_cols = [c for c in blocked_b.columns if c != "block_key"]

    a = (
        blocked_a.join(F.broadcast(plan), "block_key", "left")
        .withColumn("s_cnt", F.coalesce(F.col("s_cnt"), F.lit(1)))
        .withColumn("salt", F.pmod(F.xxhash64(F.col(id_col)), F.col("s_cnt")).cast("int"))
        .select("block_key", "salt", *[F.col(c).alias(f"a_{c}") for c in a_cols])
    )
    b = (
        blocked_b.join(F.broadcast(plan), "block_key", "left")
        .withColumn("s_cnt", F.coalesce(F.col("s_cnt"), F.lit(1)))
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.col("s_cnt") - 1)))
        .withColumn("salt", F.col("salt").cast("int"))
        .select(
            F.col("block_key").alias("b_bk"),
            F.col("salt").alias("b_salt"),
            *[F.col(c).alias(f"b_{c}") for c in b_cols],
        )
    )
    pairs = a.join(
        b,
        on=[F.col("block_key") == F.col("b_bk"), F.col("salt") == F.col("b_salt")],
        how="inner",
    ).drop("block_key", "b_bk", "salt", "b_salt")
    if dedupe_pairs:
        pairs = pairs.dropDuplicates([f"a_{id_col}", f"b_{id_col}"])
    return pairs
