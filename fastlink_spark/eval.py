"""Evaluation: pairwise F1 of predicted clusters vs ground truth, and
the confusion/summary stats of the reference (``R/confusion.R``,
``R/summary.fastLink.R`` — SURVEY.md G17/G18).

The F1 gate (BASELINE.json metric): over labeled pairs at the fixed
blocking key, predicted-match := same predicted cluster_id; F1 of that
indicator vs is_match must be >= 0.99.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_f1(
    entities: DataFrame, labeled_pairs: DataFrame, key_col: str = "url"
) -> dict:
    """entities: (url, cluster_id); labeled_pairs: (url_a, url_b, is_match).

    LEFT joins, not inner: a labeled record the pipeline lost (e.g. no
    block keys) must count as predicted-non-match for every pair it is
    in (fn when is_match) — an inner join would silently shrink the
    evaluation denominator and inflate the gate exactly when records go
    missing."""
    ea = entities.select(
        F.col(key_col).alias("url_a"), F.col("cluster_id").alias("ca")
    )
    eb = entities.select(
        F.col(key_col).alias("url_b"), F.col("cluster_id").alias("cb")
    )
    j = (
        labeled_pairs.join(ea, "url_a", "left")
        .join(eb, "url_b", "left")
        .withColumn(
            "pred",
            F.col("ca").isNotNull()
            & F.col("cb").isNotNull()
            & (F.col("ca") == F.col("cb")),
        )
    )
    agg = j.agg(
        F.sum((F.col("pred") & F.col("is_match")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("is_match")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("is_match")).cast("long")).alias("fn"),
        F.sum((~F.col("pred") & ~F.col("is_match")).cast("long")).alias("tn"),
    ).collect()[0]
    tp, fp, fn, tn = (int(agg[c] or 0) for c in ("tp", "fp", "fn", "tn"))
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn, "precision": prec, "recall": rec, "f1": f1}


def match_summary(scored_patterns, thresholds=(0.75, 0.85, 0.95)) -> dict:
    """summary.fastLink analogue over the scored pattern table (pandas):
    match counts and expected FDR/FNR at each zeta threshold."""
    out = {}
    z = scored_patterns["zeta"]
    n = scored_patterns["cnt"]
    for t in thresholds:
        sel = z >= t
        n_match = int(n[sel].sum())
        exp_fdr = float((n[sel] * (1 - z[sel])).sum() / max(n_match, 1))
        exp_fnr_num = float((n[~sel] * z[~sel]).sum())
        exp_matches = float((n * z).sum())
        out[str(t)] = {
            "matches": n_match,
            "expected_fdr": exp_fdr,
            "expected_fnr": exp_fnr_num / max(exp_matches, 1e-12),
        }
    return out
