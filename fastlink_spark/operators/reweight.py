"""nameReweight + aggregateEM + movers-prior helpers.

- ``name_reweight``: reference ``R/nameReweight.R • nameReweight()``
  (SURVEY.md G12/A3): common values (e.g. common first names / common
  page titles) agree by chance far more often than rare ones; replace
  the field's GLOBAL chance-agreement probability u_k[agree] =
  sum_v p_v^2 with the VALUE-SPECIFIC p_v^2 when recomputing each
  agreeing pair's posterior. Rare-value agreements get boosted, common
  ones damped.
- ``pool_pattern_counts``: reference ``R/aggregateEM.R • aggregateEM()``
  (SURVEY.md G15/A4): pooling sufficient statistics across blocks
  BEFORE one EM is equivalent to aggregating per-block EMs.
- ``movers_prior``: reference ``R/calcMoversPriors.R`` (SURVEY.md G16):
  reduces an external migration/overlap estimate to the (lambda_prior,
  w_lambda) pseudo-count pair consumed by em.emlink_mar.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..em import EMResult


def value_frequencies(records: DataFrame, field: str) -> DataFrame:
    """(value, p_v): share of records holding each value of `field`.

    ONE scan of the records table (r5 review: a driver count() plus
    the groupBy was two full passes): the total is an empty-frame
    window-sum over the per-value COUNT table — rows = distinct
    values, executor-side — the same shape name_reweight's m_v
    renormalization uses."""
    from pyspark.sql import Window

    counts = (
        records.where(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("value"))
        .agg(F.count("*").alias("__n"))
    )
    tot = F.sum("__n").over(Window.partitionBy())
    return counts.select("value", (F.col("__n") / tot).alias("p_v"))


def name_reweight(
    pairs_with_zeta: DataFrame,
    records: DataFrame,
    field: str,
    em: EMResult,
    *,
    agree_level: int = 2,
    renormalize_m: bool = False,
    match_threshold: float = 0.85,
) -> DataFrame:
    """Recompute zeta for pairs that AGREE on `field`, substituting the
    value-specific chance-agreement probability p_v^2 for the field's
    global u[agree]. Non-agreeing pairs keep their zeta.

    ``renormalize_m=True`` additionally renormalizes the m side (the
    reference's fuller adjustment, ``R/nameReweight.R``): the field's
    global m[agree] is replaced by the value-specific probability of the
    value AMONG DECLARED MATCHES — m_v = share of value v among agreeing
    pairs whose (original) zeta >= match_threshold. Rare-but-matching
    values thus get a second boost beyond the u swap; values never seen
    among matches fall back to the global m[agree] (adjustment 1 on the
    m side). The m_v table is computed and joined fully
    distributed — no driver collect anywhere, so high-cardinality
    fields (page titles at web scale) are safe; AQE picks broadcast vs
    shuffle for the join-back by the table's actual size.

    Requires columns a_<field> and gamma_<field> on the pair rows.
    """
    gcol = f"gamma_{field}"
    u_agree = em.u[gcol][em.levels[gcol].index(agree_level)]
    m_agree = em.m[gcol][em.levels[gcol].index(agree_level)]
    freqs = value_frequencies(records, field).withColumnRenamed("value", f"a_{field}")

    # unhinted like the m_v join below: freqs has one row per distinct
    # field value — tiny for first names, possibly millions for titles
    # at web scale, so AQE picks broadcast vs shuffle by measured size
    # (a forced broadcast would OOM exactly the high-cardinality case
    # this operator documents as safe)
    agreeing = pairs_with_zeta.where(F.col(gcol) == agree_level).join(
        freqs, f"a_{field}", "left"
    )
    # odds form: zeta = o/(1+o) with o = lam/(1-lam) * prod(m/u);
    # swap the field's u[agree] for p_v^2 => multiply odds by u_agree/p_v^2
    odds = F.col("zeta") / (1 - F.col("zeta"))
    adj = F.coalesce(
        F.lit(u_agree) / F.greatest(F.col("p_v") * F.col("p_v"), F.lit(1e-12)), F.lit(1.0)
    )
    new_odds = odds * adj
    if renormalize_m:
        # Fully distributed m_v table — NOTHING is collected to the
        # driver (a driver materialization here would grow with the
        # field's distinct agreeing matched values: fine for first
        # names, unbounded for `title` on a web-scale corpus). One
        # map-side-combining agg over the pair lineage produces the
        # per-value counts; the total is a window-sum over the COUNT
        # table (rows = distinct matched values, a few MB even at
        # millions of values — the empty-frame window collapses that
        # table, never the pair stream, to one task). The join back is
        # left unhinted so AQE broadcast-converts it when the table is
        # small (the common case) and shuffle-joins it when it isn't.
        # Empty matched set => empty mfreq => left-join nulls =>
        # coalesce(…, 1.0) no-op, so no driver-side tot>0 probe is
        # needed. At agree_level both sides are non-null by
        # construction (gamma is null-propagating), so the null filter
        # drops nothing from the total.
        from pyspark.sql import Window

        counts = (
            pairs_with_zeta.where(
                (F.col(gcol) == agree_level) & (F.col("zeta") >= match_threshold)
            )
            .where(F.col(f"a_{field}").isNotNull())
            .groupBy(f"a_{field}")
            .agg(F.count("*").alias("n_v"))
        )
        mfreq = counts.select(
            f"a_{field}",
            (
                F.col("n_v") / F.sum("n_v").over(Window.partitionBy())
            ).alias("m_v"),
        )
        agreeing = agreeing.join(mfreq, f"a_{field}", "left")
        # swap m[agree] for m_v => further multiply odds by m_v/m_agree
        new_odds = new_odds * F.coalesce(
            F.col("m_v") / F.lit(m_agree), F.lit(1.0)
        )
    reweighted = agreeing.withColumn(
        "zeta_reweighted", F.least(new_odds / (1 + new_odds), F.lit(1.0))
    ).drop("p_v", "m_v")
    rest = pairs_with_zeta.where(
        F.col(gcol).isNull() | (F.col(gcol) != agree_level)
    ).withColumn("zeta_reweighted", F.col("zeta"))
    return reweighted.unionByName(rest)


def pool_pattern_counts(tables: list[pd.DataFrame], gamma_cols: list[str]) -> pd.DataFrame:
    """Sum per-block pattern-count tables into one sufficient statistic."""
    allp = pd.concat(tables, ignore_index=True)
    return allp.groupby(gamma_cols, dropna=False, as_index=False)["cnt"].sum()


def movers_prior(expected_matches: float, nobs_a: int, nobs_b: int, weight: float = 1.0) -> dict:
    """External overlap estimate -> EM prior knobs (lambda_prior ~
    expected match share of the pair space, w_lambda pseudo-count)."""
    lam = expected_matches / max(nobs_a * nobs_b, 1)
    return {"lambda_prior": min(max(lam, 0.0), 1.0), "lambda_prior_w": weight}


def movers_priors_from_table(
    migration: DataFrame,
    nobs_a: int,
    nobs_b: int,
    *,
    from_col: str = "geo_from",
    to_col: str = "geo_to",
    count_col: str = "n",
    target_geo: str | None = None,
    weight: float = 1.0,
) -> dict:
    """The reference's full calcMoversPriors DATA path
    (``R/calcMoversPriors.R``): ingest a migration/overlap lookup table
    (the reference packages IRS state-to-state flow counts), aggregate
    it to the expected matched-population share, and reduce to the
    (lambda_prior, lambda_prior_w) pseudo-count pair consumed by
    em.emlink_mar — vs the scalar shortcut movers_prior() above.

    Expected matches = stayer share (rows with geo_from == geo_to,
    optionally restricted to `target_geo`) times the smaller snapshot:
    records present in both snapshots that did not move. One driver-side
    aggregate over a tiny lookup table."""
    m = migration
    if target_geo is not None:
        m = m.where((F.col(from_col) == target_geo) | (F.col(to_col) == target_geo))
    row = m.agg(
        F.sum(
            F.when(F.col(from_col) == F.col(to_col), F.col(count_col)).otherwise(F.lit(0))
        ).alias("stay"),
        F.sum(count_col).alias("total"),
    ).collect()[0]
    stay = float(row["stay"] or 0.0)
    total = float(row["total"] or 0.0)
    share = stay / total if total > 0 else 0.0
    return movers_prior(share * min(nobs_a, nobs_b), nobs_a, nobs_b, weight)
