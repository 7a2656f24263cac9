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
  4. accepted pairs assign each new record to min(own rec_id, partner
     labels) — a single distributed groupBy, no iteration;
  5. label DISAGREEMENT edges (matched pairs whose two endpoints ended
     up with different labels — within-batch transitive chains, or a
     new record bridging old clusters) are collected to the driver
     (only conflicting LABEL pairs, never the pair stream), resolved
     with a tiny union-find, and persisted as a relabel map;
  6. state (records index + entities + relabel map) written to the
     state dir; ``entities()`` applies the (broadcast) relabel map at
     read, so merged clusters read as one entity.

The relabel map grows with the merge count; ``compact()`` (first-class
since r4) re-links the persisted state through the batch operators and
empties it — schedule per N batches / map-size threshold, same
tradeoff as any streaming CC. On Iceberg the relabel would be a MERGE
INTO over the affected partition subset instead of a read-time map.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..em import EMResult, apply_em
from ..operators import gammas
from ..operators.pairs import candidate_pairs_two
from ..plans.materialize import resolve as _resolve_mat
from ..plans.pipeline import LinkageConfig, prepare_pages


def _deterministic_cond(cfg: LinkageConfig):
    """Pair predicate for cfg.deterministic_fields (exact, non-null
    agreement on every listed field) — the same rule as the batch
    pipeline's deterministic-match pass. None when the list is empty."""
    cond = None
    for f in cfg.deterministic_fields:
        eq = (
            F.col(f"a_{f}").isNotNull()
            & F.col(f"b_{f}").isNotNull()
            & (F.col(f"a_{f}") == F.col(f"b_{f}"))
        )
        cond = eq if cond is None else (cond & eq)
    return cond


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

    def _read_relabels(self) -> dict[int, int]:
        p = self._path("relabels.json")
        if os.path.exists(p):
            import json

            with open(p) as f:
                return {int(k): int(v) for k, v in json.load(f).items()}
        return {}

    def _write_relabels(self, mapping: dict[int, int]) -> None:
        import json

        with open(self._path("relabels.json"), "w") as f:
            json.dump({str(k): v for k, v in mapping.items()}, f)

    def entities(self) -> DataFrame | None:
        """Entity state with the relabel map applied (merged clusters
        read as one). The map is tiny (one row per merge event) and is
        applied as a broadcast join."""
        ent = self._read_state("entities")
        if ent is None:
            return None
        mapping = self._read_relabels()
        if not mapping:
            return ent
        mdf = self.spark.createDataFrame(
            list(mapping.items()), "cluster_id long, __to long"
        )
        return (
            ent.join(F.broadcast(mdf), "cluster_id", "left")
            .select(
                *[c for c in ent.columns if c != "cluster_id"],
                F.coalesce("__to", "cluster_id").alias("cluster_id"),
            )
        )

    # -- core -------------------------------------------------------------
    def process_batch(self, new_pages: DataFrame, batch_id: int = 0) -> DataFrame:
        """Link one micro-batch; returns the new entities rows."""
        cfg = self.cfg
        fields = list(cfg.fields)
        new_rec = _resolve_mat(None)(prepare_pages(new_pages, cfg), "new_rec")

        old_rec = self._read_state("records")
        attrs = ["rec_id"] + [f.name for f in fields]
        new_blocked = new_rec.select(F.explode("block_keys").alias("block_key"), *attrs)
        if old_rec is not None:
            index = old_rec.select(F.explode("block_keys").alias("block_key"), *attrs).union(
                new_blocked
            )
        else:
            index = new_blocked

        # new-batch bands x (corpus ∪ new) bands through the salted S x T
        # grid (operators.pairs.candidate_pairs_two): a hot band in the
        # persisted index — boilerplate-heavy corpora collide massively
        # on one band value — would otherwise put batch_rows x
        # corpus_rows of that band into ONE reduce task, the straggler
        # class the batch path eliminated in r3. Same pair semantics as
        # the raw equi-join it replaces: both orientations of new x new
        # pairs survive (harmless duplicates the downstream min-label
        # assignment tolerates), self-pairs filtered.
        pairs = candidate_pairs_two(new_blocked, index, id_col="rec_id").where(
            F.col("a_rec_id") != F.col("b_rec_id")
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
            det_cond = _deterministic_cond(cfg)
            if det_cond is not None:
                # the batch pipeline's deterministic-match pass
                # (pipeline._build_matched): pairs exactly equal on all
                # cfg.deterministic_fields are accepted regardless of
                # zeta — the incremental path must match batch semantics
                # or compact()/batch re-runs would merge pairs the
                # stream left split. max(zeta) keeps the pair list
                # duplicate-free and byte-stable like the batch stage.
                det = scored.where(det_cond).select(
                    "a_rec_id", "b_rec_id", F.lit(1.0).alias("zeta")
                )
                matched = (
                    matched.unionByName(det)
                    .groupBy("a_rec_id", "b_rec_id")
                    .agg(F.max("zeta").alias("zeta"))
                )

        old_ent = self.entities()
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
            # new record -> min(existing partner cluster, partner rec_id, own rec_id).
            # Including the record's OWN rec_id in the min is load-bearing: a
            # batch of mutual duplicates {A<B<C} must all converge on A — the
            # partner-only min labels A with B's id while B/C get A's
            # (within-batch duplicates never co-clustered otherwise).
            assign = (
                partner_clusters.withColumn(
                    "cand_cluster", F.coalesce("cluster_id", "b_rec_id")
                )
                .groupBy(F.col("a_rec_id").alias("rec_id"))
                .agg(F.min("cand_cluster").alias("cluster_id"))
            )
            new_ent = new_ids.join(assign, "rec_id", "left").select(
                "rec_id",
                F.least(F.coalesce("cluster_id", "rec_id"), F.col("rec_id")).alias("cluster_id"),
            )
        else:
            new_ent = new_ids.withColumn("cluster_id", F.col("rec_id"))
        new_ent = _resolve_mat(None)(
            new_ent.join(new_rec.select("rec_id", "url"), "rec_id"), "new_ent"
        )

        # Reconcile: matched pairs whose endpoints got DIFFERENT labels
        # (within-batch transitive chains; new record bridging old
        # clusters). Only the distinct conflicting LABEL pairs reach the
        # driver — O(merge events), not O(pairs).
        if matched is not None:
            lab_a = new_ent.select(
                F.col("rec_id").alias("a_rec_id"), F.col("cluster_id").alias("la")
            )
            lab_b_new = new_ent.select(
                F.col("rec_id").alias("b_rec_id"), F.col("cluster_id").alias("lb")
            )
            if old_ent is not None:
                lab_b = old_ent.select(
                    F.col("rec_id").alias("b_rec_id"), F.col("cluster_id").alias("lb")
                ).unionByName(lab_b_new)
            else:
                lab_b = lab_b_new
            conflicts = (
                matched.join(lab_a, "a_rec_id")
                .join(lab_b, "b_rec_id")
                .where(F.col("la") != F.col("lb"))
                .select("la", "lb")
                .distinct()
                .collect()
            )
            if conflicts:
                mapping = self._read_relabels()
                parent: dict[int, int] = {}

                def find(x: int) -> int:
                    r = x
                    while parent.get(r, r) != r:
                        r = parent[r]
                    while parent.get(x, x) != x:
                        parent[x], x = r, parent[x]
                    return r

                def union(x: int, y: int) -> None:
                    rx, ry = find(x), find(y)
                    if rx != ry:
                        lo, hi = (rx, ry) if rx < ry else (ry, rx)
                        parent[hi] = lo

                for k, v in mapping.items():
                    union(k, v)
                for r in conflicts:
                    union(int(r["la"]), int(r["lb"]))
                resolved = {x: find(x) for x in parent}
                self._write_relabels({k: v for k, v in resolved.items() if k != v})
                mdf = self.spark.createDataFrame(
                    [(k, v) for k, v in resolved.items() if k != v],
                    "cluster_id long, __to long",
                )
                new_ent = _resolve_mat(None)(
                    new_ent.join(F.broadcast(mdf), "cluster_id", "left").select(
                        "rec_id",
                        F.coalesce("__to", "cluster_id").alias("cluster_id"),
                        "url",
                    ),
                    "new_ent_relabel",
                )

        new_rec.write.mode("append").parquet(self._path("records"))
        new_ent.write.mode("append").parquet(self._path("entities"))
        return new_ent

    def compact(self) -> DataFrame | None:
        """Periodic state compaction — the module-docstring tradeoff
        ("a periodic re-run of batch CC compacts the relabel map")
        made a first-class op. Re-links the ENTIRE persisted record
        state through the batch operators with the FROZEN EM (salted
        grid self-join -> gamma scoring -> frozen-zeta threshold plus
        the cfg.deterministic_fields exact-match pass, exactly like the
        batch pipeline's matched stage -> large-star/small-star CC),
        rewrites the entities state to the CC labels, and empties the
        relabel map. Re-crawled urls contribute their LATEST crawl row
        (warc_ts desc, deterministic tiebreak). After compact(),
        ``entities()`` serves exactly the clusters a from-scratch batch
        run over the same pages with the same frozen parameters
        produces, and read-time relabel cost is zero until the next
        merge event. Cost = one batch link over the corpus — schedule
        it off-peak; every stage is the same scale-audited plan the
        batch pipeline runs (no new shuffle shapes)."""
        import pandas as pd

        from ..operators.cluster import connected_components
        from ..plans.pipeline import _blocked_records

        records = self._read_state("records")
        if records is None:
            return None
        from pyspark.sql import Window

        cfg = self.cfg
        fields = list(cfg.fields)
        gcols = [f"gamma_{f.name}" for f in fields]
        mat = _resolve_mat(None)
        # re-crawled urls appear once per batch in the append-only
        # records state (same rec_id = xxhash64(url)); keep the LATEST
        # crawl deterministically (warc_ts desc, content-hash tiebreak
        # for equal timestamps) — a bare dropDuplicates picks a
        # partition-order-dependent row, making compaction output
        # nondeterministic and possibly linking on stale attributes.
        wins = Window.partitionBy("rec_id").orderBy(
            F.desc_nulls_last("warc_ts"),
            F.asc(F.xxhash64(*[c for c in records.columns if c != "rec_id"])),
        )
        records = mat(
            records.withColumn("_rn", F.row_number().over(wins))
            .where(F.col("_rn") == 1)
            .drop("_rn"),
            "compact_records",
        )

        blocked = _blocked_records(records, cfg)
        from ..operators.pairs import candidate_pairs

        pairs = candidate_pairs(
            blocked, skew_threshold=cfg.skew_threshold, target_block=cfg.target_block
        )
        scored = gammas.with_gammas(pairs, fields)
        patt = gammas.pattern_counts(scored, fields).toPandas()
        if len(patt):
            z = apply_em(patt, self.em)
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
            edges = (
                scored.join(F.broadcast(zdf), cond, "inner")
                .where(F.col("zeta") >= cfg.threshold)
                .select("a_rec_id", "b_rec_id")
            )
            det_cond = _deterministic_cond(cfg)
            if det_cond is not None:
                # mirror the batch pipeline's deterministic-match pass —
                # without it compacted clusters would diverge from a
                # from-scratch link_dedupe on pairs like (2,0,0) that
                # agree exactly on url_norm but score under threshold
                edges = edges.unionByName(
                    scored.where(det_cond).select("a_rec_id", "b_rec_id")
                ).distinct()
        else:
            edges = records.select(
                F.col("rec_id").alias("a_rec_id")
            ).limit(0).withColumn("b_rec_id", F.col("a_rec_id"))

        labels = connected_components(
            edges, records.select(F.col("rec_id").alias("id")), materializer=mat
        )
        new_ent = mat(
            labels.withColumnRenamed("id", "rec_id")
            .join(records.select("rec_id", "url"), "rec_id")
            .select("rec_id", "cluster_id", "url"),
            "compact_entities",
        )
        new_ent.write.mode("overwrite").parquet(self._path("entities"))
        self._write_relabels({})
        return self.spark.read.parquet(self._path("entities"))

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
