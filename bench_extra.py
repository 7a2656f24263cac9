"""Extra optimization-round instrumentation (r8). NOT the driver bench —
bench.py stays the frozen measurement harness; this file isolates the
expensive operators with noop sinks (guide §1.4), labels jobs (§1.5),
decomposes composite walls (e2e stage walls, q30 fit vs assign, CC
round counts), and dumps .explain("formatted") for plans/r08/.

Usage: python bench_extra.py <section>[,<section>...]
Sections: q30, e2e, cc, pairs, gamma, obs, plans
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_PAGES_NBASE (default 4000).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NBASE = int(os.environ.get("BENCH_PAGES_NBASE", "4000"))
OUT: dict[str, float] = {}


def _spark():
    from fastlink_spark.session import get_spark

    return get_spark(
        app_name="fastlink_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )


def _t(name: str, fn):
    spark = _spark()
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    out = fn()
    OUT[name] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"  {name}: {OUT[name]}s", file=sys.stderr)
    return out


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _pages(spark):
    from fastlink_spark.sources.fixtures import generate_pages

    fx = generate_pages(n_base=NBASE)
    return spark.createDataFrame(fx.pages).repartition(CPUS).localCheckpoint(eager=True)


def sec_q30(spark):
    """Decompose q30: features / fit (per Lloyd round) / final assign."""
    from fastlink_spark.operators import cluster_match as cm

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    feats = _t(
        "q30_features_materialize",
        lambda: cm.letter_features(docs, "text").localCheckpoint(eager=True),
    )
    cents = _t(
        "q30_fit_kmeans", lambda: cm.fit_kmeans(feats, 8, id_col="doc_id", n_iter=8, init="md5")
    )
    _t("q30_final_assign", lambda: _noop(cm.assign_clusters(feats, cents)))


def sec_e2e(spark):
    """e2e with a checkpoint root; report per-stage walls from metrics."""
    from fastlink_spark.plans.pipeline import LinkageConfig, link_dedupe

    pages = _pages(spark)
    cfg = LinkageConfig(checkpoint_dir=tempfile.mkdtemp(prefix="flextra_e2e_"))
    t0 = time.time()
    res = link_dedupe(spark, pages, cfg)
    res.entities.count()
    OUT["e2e_total"] = round(time.time() - t0, 3)
    for k, v in res.metrics.items():
        if isinstance(v, dict) and "wall_sec" in v:
            OUT[f"e2e_stage_{k}"] = v["wall_sec"]
    print(json.dumps(res.metrics, default=str), file=sys.stderr)


def sec_cc(spark):
    """q20 decomposition: edge build vs CC; content_fingerprint cost."""
    from fastlink_spark.operators.cluster import connected_components
    from fastlink_spark.operators.dedup import ngram_jaccard_pairs
    from fastlink_spark.plans.checkpoint import content_fingerprint
    import __spark_entry__ as entry

    docs = entry._docs(spark, SF)
    cand = entry._doc_pairs_by_source(spark, SF, force_salting=False).select(
        F.col("a_rec_id").alias("id_a"), F.col("b_rec_id").alias("id_b")
    )
    edges = _t(
        "q20_edges_materialize",
        lambda: ngram_jaccard_pairs(cand, docs, "doc_id", "text", n=3, min_jaccard=0.3)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True),
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    _t("q20_cc_only", lambda: connected_components(edges, nodes).count())
    _t("fingerprint_of_edges", lambda: content_fingerprint(edges))


def sec_pairs(spark):
    """candidate_pairs stage with noop sink (no parquet write cost)."""
    from fastlink_spark.operators.pairs import candidate_pairs
    from fastlink_spark.plans.pipeline import LinkageConfig, _blocked_records, prepare_pages

    pages = _pages(spark)
    cfg = LinkageConfig()
    records = prepare_pages(pages, cfg).localCheckpoint(eager=True)
    records.count()
    _t(
        "candidate_pairs_noop",
        lambda: _noop(
            candidate_pairs(
                _blocked_records(records, cfg),
                skew_threshold=cfg.skew_threshold,
                target_block=cfg.target_block,
            )
        ),
    )


def sec_gamma(spark):
    """gamma scoring throughput over a materialized pair table."""
    from fastlink_spark.operators import gammas
    from fastlink_spark.operators.pairs import candidate_pairs
    from fastlink_spark.plans.pipeline import LinkageConfig, _blocked_records, prepare_pages

    pages = _pages(spark)
    cfg = LinkageConfig()
    records = prepare_pages(pages, cfg).localCheckpoint(eager=True)
    d = tempfile.mkdtemp(prefix="flextra_pairs_")
    candidate_pairs(
        _blocked_records(records, cfg),
        skew_threshold=cfg.skew_threshold,
        target_block=cfg.target_block,
    ).write.mode("overwrite").parquet(d)
    cand = spark.read.parquet(d).repartition(CPUS * 4).localCheckpoint(eager=True)
    n = cand.count()
    fields = list(cfg.fields)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
    gammas.pattern_counts(gammas.with_gammas(cand.limit(60_000), fields), fields).collect()
    for rep in range(2):
        _t(
            f"gamma_scoring_rep{rep}",
            lambda: gammas.pattern_counts(gammas.with_gammas(cand, fields), fields).collect(),
        )
    OUT["gamma_n_pairs"] = n


def sec_obs(spark):
    """Does Observation fire under (a) parquet write, (b) eager
    localCheckpoint? Prints the metrics or NOT-FIRED after 10s."""
    import threading

    from pyspark.sql import Observation

    df = spark.range(0, 100_000, 1, 8).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    h = F.xxhash64("id", "v")
    for mode in ("parquet", "localckpt"):
        obs = Observation(f"fp_{mode}")
        dfo = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(h).alias("xor"),
            F.sum(h.cast("decimal(38,0)")).alias("hsum"),
        )
        if mode == "parquet":
            d = tempfile.mkdtemp(prefix="flextra_obs_")
            dfo.write.mode("overwrite").parquet(d)
        else:
            dfo.localCheckpoint(eager=True)
        got: dict = {}

        def grab():
            got.update(obs.get)

        th = threading.Thread(target=grab, daemon=True)
        th.start()
        th.join(timeout=10)
        print(f"  obs[{mode}]: {'NOT-FIRED' if th.is_alive() else got}", file=sys.stderr)


def sec_ngram(spark):
    """q10 decomposition: gram construction vs join+intersect verify."""
    from fastlink_spark.operators.dedup import ngram_jaccard_pairs
    import __spark_entry__ as entry

    docs = entry._docs(spark, SF)
    pairs = _t(
        "ngram_pairs_materialize",
        lambda: entry._doc_pairs_by_source(spark, SF, force_salting=False)
        .select(F.col("a_rec_id").alias("id_a"), F.col("b_rec_id").alias("id_b"))
        .localCheckpoint(eager=True),
    )
    from fastlink_spark.functions.textmeta import tokens

    toks = tokens(F.col("__t"))
    gram_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(3), F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(3))),
        )
    )
    grams = _t(
        "ngram_grams_materialize",
        lambda: docs.select(F.col("doc_id").alias("id"), F.col("text").alias("__t"))
        .repartition(CPUS)
        .select(
            "id",
            F.when(F.size(toks) > 0, gram_arr)
            .otherwise(F.array().cast("array<string>"))
            .alias("grams"),
        )
        .localCheckpoint(eager=True),
    )
    ga = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b"))
    joined = (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("grams_a", "grams_b")).cast("long"))
        .withColumn(
            "n_union",
            (F.size("grams_a") + F.size("grams_b") - F.col("n_inter")).cast("long"),
        )
    )
    _t("ngram_join_intersect_noop", lambda: _noop(joined.select("id_a", "id_b", "n_inter", "n_union")))
    _t(
        "ngram_full_op_noop",
        lambda: _noop(ngram_jaccard_pairs(pairs, docs, "doc_id", "text", n=3)),
    )


def sec_plans(spark):
    """Dump explain('formatted') for the hot queries to plans/r08/."""
    import __spark_entry__ as entry

    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs("plans/r08", exist_ok=True)

    from fastlink_spark.operators import gammas
    from fastlink_spark.operators.pairs import candidate_pairs
    from fastlink_spark.plans.pipeline import LinkageConfig, _blocked_records, prepare_pages

    pages = _pages(spark)
    cfg = LinkageConfig()
    records = prepare_pages(pages, cfg).localCheckpoint(eager=True)
    cand = candidate_pairs(
        _blocked_records(records, cfg),
        skew_threshold=cfg.skew_threshold,
        target_block=cfg.target_block,
    )
    plans = {
        "candidate_pairs": cand,
        "gamma_scoring": gammas.pattern_counts(
            gammas.with_gammas(cand, list(cfg.fields)), list(cfg.fields)
        ),
    }
    qmap = entry.queries()
    for name in (
        "q10_ngram_jaccard",
        "q15_minhash_candidates",
        "q20_connected_components",
        "q25_corpus_dedup",
        "q27_name_reweight",
        "q30_cluster_match",
    ):
        plans[name] = qmap[name](spark, SF)
    for name, df in plans.items():
        with open(f"plans/r08/{name}_{tag}.txt", "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
        print(f"  wrote plans/r08/{name}_{tag}.txt", file=sys.stderr)


SECTIONS = {
    "ngram": sec_ngram,
    "q30": sec_q30,
    "e2e": sec_e2e,
    "cc": sec_cc,
    "pairs": sec_pairs,
    "gamma": sec_gamma,
    "obs": sec_obs,
    "plans": sec_plans,
}


def main() -> None:
    which = (sys.argv[1] if len(sys.argv) > 1 else "q30,e2e,cc,pairs,gamma").split(",")
    spark = _spark()
    for name in which:
        print(f"== {name} ==", file=sys.stderr)
        SECTIONS[name](spark)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
