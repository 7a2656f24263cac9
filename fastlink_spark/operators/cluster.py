"""Iterative large-star / small-star connected components.

Absent in the reference (fastLink stops at pairs + 1:1 dedupe,
``R/dedupeMatches.R``); REQUIRED by BASELINE.json north_star:
"thresholded pairs are clustered into entities via iterative
large-star/small-star connected components". Algorithm: Kiveris et al.
2014, "Connected Components in MapReduce and Beyond" (public paper) —
converges in O(log n) rounds vs O(diameter) for naive label
propagation, which is what makes it the right choice for web-scale
chain-y duplicate graphs.

Driver-looped DataFrame program: each round is two shuffles
(groupBy-min + join); lineage cut per round via the injectable
``materializer`` (default DISK_ONLY localCheckpoint; pass
``plans.materialize.parquet_materializer`` for the fault-tolerant
production shape) so the plan doesn't grow unboundedly; convergence =
edge-set fixpoint (count + order-insensitive xxhash64 checksum). An
optional on-disk checkpoint callback lets the pipeline persist each
round for resume (BASELINE.json north_rule).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.materialize import Materializer, resolve


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(neighborhood ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nbr_min = sym.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        sym.join(nbr_min, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.least("mn", "u").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame, *, oriented: bool = False) -> DataFrame:
    """Orient edges high->low; connect every smaller neighbor (and u
    itself) to the minimum of the smaller-neighborhood.

    ``oriented=True`` (r8 optimization): skip the re-orientation +
    distinct when the input provably already satisfies the
    postcondition — ``_large_star`` emits ``(u', v') = (v, least(mn, u))``
    only for rows with ``v > u``, so ``v' <= u < v = u'`` strictly (no
    self-loops, already high->low) and it ends in ``.distinct()``. The
    loop always feeds small-star from large-star, so this removes one
    full exchange + dedup of the edge set per CC round."""
    if oriented:
        o = e
    else:
        o = (
            e.where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
        )
    nbr_min = o.groupBy("u").agg(F.min("v").alias("mn"))
    joined = o.join(nbr_min, "u")
    out = joined.select(F.col("v").alias("u"), F.col("mn").alias("v")).union(
        nbr_min.select(F.col("u"), F.col("mn").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    *,
    max_iter: int | None = None,
    on_round: Callable[[int, DataFrame], DataFrame] | None = None,
    materializer: Materializer | None = None,
) -> DataFrame:
    """Edges ``(u, v)`` (any orientation; any orderable id type — long
    hashes or wide hex-string keys) -> ``(id, cluster_id)`` with
    cluster_id = min node id of the component. For 10^12-node graphs
    prefer dense long ids (``dense_long_ids`` below) over wide string
    keys: every round shuffles the ids twice.

    `nodes`: optional single-column ('id') universe; nodes without edges
    come back as singleton clusters (cluster_id = id).
    `on_round`: hook called with (round_idx, edges) after each
    large+small round; may return a re-materialized DataFrame (used by
    the pipeline to checkpoint rounds to disk for resume).
    `materializer`: per-round lineage cut (plans.materialize; default
    DISK_ONLY localCheckpoint, parquet for the production shape).
    """
    mat = resolve(materializer)
    e0 = edges.select(
        F.col(edges.columns[0]).alias("u"),
        F.col(edges.columns[1]).alias("v"),
    ).where(F.col("u") != F.col("v")).distinct()

    # the iteration-bound/convergence fingerprint rides the
    # materializer's own action as a query observation (r8: the r5 fix
    # merged count+fingerprint into ONE extra scan; this removes that
    # scan entirely — the cut write streams every row anyway)
    from ..plans.checkpoint import fingerprint_observation

    e0, _fp0 = fingerprint_observation(e0)
    e = mat(e0, "cc_edges")
    n_edges, prev = _fp0(fallback_df=e)
    if max_iter is None:
        # large/small-star converges in O(log^2 n) worst case, ~log n in
        # practice; generous bound, asserted below.
        max_iter = max(10, 2 * int(math.log2(max(n_edges, 2))) + 10)
    converged = False
    for it in range(1, max_iter + 1):
        # large-star output is strictly oriented + distinct, so
        # small-star skips its re-orientation exchange (see _small_star)
        ss = _small_star(_large_star(e), oriented=True)
        ss, _fp = fingerprint_observation(ss)
        e2 = mat(ss, "cc_round")
        if on_round is not None:
            maybe = on_round(it, e2)
            if maybe is not None:
                e2 = maybe
        cur = _fp(fallback_df=e2)[1]
        e = e2
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(f"connected components did not converge in {max_iter} rounds")

    # fixpoint edges are star edges node->root (root = component min)
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    labels = labels.union(roots).groupBy("id").agg(F.min("cluster_id").alias("cluster_id"))

    if nodes is not None:
        nodes_n = nodes.select(F.col(nodes.columns[0]).alias("id"))
        labels = (
            nodes_n.join(labels, "id", "left")
            .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
        )
    else:
        # no universe given: nodes whose ONLY edge was a self-loop were
        # dropped by the entry u != v filter and are absent from the
        # fixpoint — restore them as singletons. Only the self-loop
        # subset (normally empty/tiny) is shuffled, not the edge set.
        selfs = (
            edges.where(F.col(edges.columns[0]) == F.col(edges.columns[1]))
            .select(F.col(edges.columns[0]).alias("id"))
            .distinct()
        )
        labels = labels.unionByName(
            selfs.join(labels, "id", "left_anti").withColumn(
                "cluster_id", F.col("id")
            )
        )
    return labels


def dense_long_ids(
    df: DataFrame, key_col: str, *, materializer: Materializer | None = None
) -> DataFrame:
    """(key) -> (key, dense_id long): collision-free dense longs for CC
    over wide (128-bit / string) record keys at 10^12 scale, where a
    64-bit hash would merge ~1e4 unrelated clusters by birthday
    collisions. Scalable pattern: per-partition row_number + broadcast
    partition offsets (one tiny collect of partition counts — NO global
    sort). The keyed stream is MATERIALIZED before the counts collect so
    the offsets and the window ranking read the same frozen ``__pid``
    column — without the cut, ``spark_partition_id`` is re-evaluated per
    job and AQE coalescing / conf drift between the two jobs could
    silently mint colliding ids."""
    from pyspark.sql import Window

    mat = resolve(materializer)
    part = mat(
        df.select(key_col).distinct().withColumn("__pid", F.spark_partition_id()),
        "dense_ids",
    )
    counts = part.groupBy("__pid").count().collect()
    offs, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offs[r["__pid"]] = acc
        acc += r["count"]
    odf = part.sparkSession.createDataFrame(
        list(offs.items()), "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(key_col)
    return (
        part.join(F.broadcast(odf), "__pid")
        .select(
            key_col,
            (F.row_number().over(w) + F.col("__off") - 1).cast("long").alias("dense_id"),
        )
    )
