"""One-to-one match assignment — ``R/dedupeMatches.R • dedupeMatches``
(SURVEY.md J8/G11/W1).

The reference offers two modes: linear-sum-assignment via lpSolve
(``linprog=TRUE``) and greedy winner-take-all. Spark-first: the greedy
mode is two ranked-window passes iterated to a fixpoint (each pass is
one shuffle); the exact LSAP mode is NOT ported (lpSolve/scipy absent;
greedy matches the reference's default behavior for its test suite and
differs only on zeta ties inside dense bipartite blocks).

Greedy fixpoint semantics: repeatedly accept pairs that are the current
best (by zeta desc, deterministic tie-break) for BOTH endpoints, remove
matched endpoints, repeat. This reproduces sequential greedy matching
exactly, in O(rounds) shuffles instead of a driver loop over pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_matches(
    pairs: DataFrame,
    *,
    id_a: str = "a_rec_id",
    id_b: str = "b_rec_id",
    score: str = "zeta",
    max_rounds: int = 20,
) -> DataFrame:
    """Matched pairs -> 1:1 subset (greedy mutual-best fixpoint).

    Deterministic: ties broken by (score desc, partner id asc).
    """
    remaining = pairs.select(id_a, id_b, score).localCheckpoint(eager=True)
    accepted: DataFrame | None = None

    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        wa = Window.partitionBy(id_a).orderBy(F.desc(score), F.asc(id_b))
        wb = Window.partitionBy(id_b).orderBy(F.desc(score), F.asc(id_a))
        ranked = remaining.withColumn("ra", F.row_number().over(wa)).withColumn(
            "rb", F.row_number().over(wb)
        )
        mutual = ranked.where((F.col("ra") == 1) & (F.col("rb") == 1)).select(
            id_a, id_b, score
        )
        mutual = mutual.localCheckpoint(eager=True)
        if mutual.isEmpty():
            break
        accepted = mutual if accepted is None else accepted.unionByName(mutual)
        used = (
            mutual.select(F.col(id_a).alias("uid"))
            .union(mutual.select(F.col(id_b).alias("uid")))
            .distinct()
        )
        remaining = (
            remaining.join(used.withColumnRenamed("uid", id_a), id_a, "left_anti")
            .join(used.withColumnRenamed("uid", id_b), id_b, "left_anti")
            .select(id_a, id_b, score)
            .localCheckpoint(eager=True)
        )

    if accepted is None:
        return pairs.select(id_a, id_b, score).limit(0)
    return accepted.localCheckpoint(eager=True)
