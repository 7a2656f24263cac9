"""Round-4 additions: collect-free nameReweight m-renormalization,
materializer-retention safety of the greedy 1:1 fixpoint, shared
per-manager operator materializer, DL/Levenshtein hard-oracle helpers,
emlinklog arbitrary interaction sets, scratch-aware default
materializer, and incremental-state compaction."""

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ----------------------------- nameReweight m-renorm is collect-free

def test_name_reweight_renorm_no_driver_collect(spark, monkeypatch):
    """renormalize_m=True must never materialize the per-value match
    counts on the driver (unbounded for high-cardinality fields such as
    page titles at web scale). Guard: DataFrame.collect is poisoned
    while the operator builds its plan — any driver materialization
    inside name_reweight raises; results are then evaluated normally
    and must match the exact m_v/m_agree odds formula."""
    from fastlink_spark.em import emlink_mar
    from fastlink_spark.operators.reweight import name_reweight

    import pandas as pd

    patt = pd.DataFrame({"gamma_title": [2, 0], "cnt": [100, 900]})
    em = emlink_mar(patt, ["gamma_title"])
    m_agree = em.m["gamma_title"][em.levels["gamma_title"].index(2)]
    # high-cardinality shape: (almost) every value distinct
    n = 300
    records = spark.createDataFrame(
        [(i, f"title-{i}") for i in range(n)], "rec_id long, title string"
    )
    pairs = spark.createDataFrame(
        [(i, i + n, f"title-{i}", 2, 0.95) for i in range(n)]
        + [(7, 900, "title-7", 2, 0.95)]  # title-7 matched twice
        + [(8, 901, "x", 0, 0.2)],
        "a_rec_id long, b_rec_id long, a_title string, gamma_title int, zeta double",
    )

    def poisoned(self, *a, **k):
        raise AssertionError("driver collect inside name_reweight")

    real_collect = DataFrame.collect
    monkeypatch.setattr(DataFrame, "collect", poisoned)
    try:
        out = name_reweight(
            pairs, records, "title", em, renormalize_m=True, match_threshold=0.85
        )
    finally:
        monkeypatch.setattr(DataFrame, "collect", real_collect)

    got = {r["a_rec_id"]: r["zeta_reweighted"] for r in out.collect()}
    # title-7 appears twice among the n+1 matched agreeing pairs
    m7 = 2 / (n + 1)
    freqs = {f"title-{i}": 1 / n for i in range(n)}
    p7 = freqs["title-7"]
    u_agree = em.u["gamma_title"][em.levels["gamma_title"].index(2)]
    odds0 = 0.95 / 0.05
    o = odds0 * (u_agree / (p7 * p7)) * (m7 / m_agree)
    assert got[7] == pytest.approx(min(o / (1 + o), 1.0), rel=1e-9)
    assert got[8] == pytest.approx(0.2)  # non-agreeing untouched


# ------------------- greedy fixpoint survives parquet-cut retention

def test_greedy_dedupe_with_parquet_retention(spark, tmp_path):
    """Multi-round greedy 1:1 assignment under a parquet materializer
    with keep_per_name=2: the accepted union must roll through retained
    cuts so no round's output references deleted parquet. The chain
    a1>a2>a3>a4 forces one acceptance per round (3+ productive rounds,
    which deletes the round-0 'greedy_mutual' dir before the end)."""
    from fastlink_spark.operators.dedupe_matches import dedupe_matches
    from fastlink_spark.plans.materialize import parquet_materializer

    rows, score = [], 0.99
    # path graph a_i -- b_i -- a_{i+1}: strictly decreasing scores force
    # greedy to take (a_i, b_i) one round at a time
    for i in range(5):
        rows.append((i, i, score - 0.01 * i))
        if i < 4:
            rows.append((i + 1, i, score - 0.005 - 0.01 * i))
    pairs = spark.createDataFrame(rows, "a_rec_id long, b_rec_id long, zeta double")
    mat = parquet_materializer(str(tmp_path), keep_per_name=2)
    out = dedupe_matches(pairs, materializer=mat).collect()
    got = {(r["a_rec_id"], r["b_rec_id"]) for r in out}
    assert got == {(i, i) for i in range(5)}


def test_checkpoint_manager_shares_one_materializer(spark, tmp_path):
    """Two materializer() calls on one CheckpointManager must return the
    SAME closure (shared per-name suffix counters): otherwise two
    operators cutting under one hint would overwrite each other's
    still-live parquet."""
    from fastlink_spark.plans.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path))
    m1 = mgr.materializer()
    m2 = mgr.materializer()
    assert m1 is m2
    df = spark.range(3)
    m1(df, "cut")
    m2(df, "cut")
    import os

    dirs = sorted(d for d in os.listdir(tmp_path / "_op_stages"))
    assert dirs == ["cut_000", "cut_001"]
