"""Structured-Streaming operators: watermarked tumbling-window
aggregation and stateful streaming exact-dedup.

The reference is batch-only (SURVEY.md §2.10); these are the documented
streaming extensions a continuously-ingesting web-corpus pipeline needs
(driver mandate). Batch twin of the windowed agg is q22 — identical
grouping semantics, so the batch oracle carries the correctness signal
while the tests here assert streamed == batch on the same input plus
checkpointed incremental processing across availableNow restarts.

Scale notes: windowed agg state is bounded by (watermark horizon x key
cardinality) — late rows beyond the watermark are dropped instead of
growing state forever. The stateful dedup keeps ONE boolean-sized state
entry per distinct hash inside applyInPandasWithState (RocksDB-backed
state store on a real cluster); emitting only first-seen rows makes the
downstream pipeline idempotent under replay.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def windowed_event_counts(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (streaming twin of q22):
    (window_start, key, n_events, sum_value). Append-mode-compatible —
    a window only emits once the watermark passes its end."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def run_windowed_counts_to_memory(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    schema,
    *,
    query_name: str = "windowed_counts",
    **agg_kwargs,
):
    """TEST-ONLY wiring: readStream(parquet) -> windowed agg ->
    complete-mode memory sink, availableNow trigger (drains everything
    currently in the directory, then stops — incremental across restarts
    via the checkpoint). In complete mode Spark never evicts window
    state, so the module docstring's bounded-state claim does NOT apply
    to this runner — it exists so tests can assert streamed == batch on
    the full history. The production shape is
    ``run_windowed_counts_to_files`` below (append mode: the watermark
    actually bounds state)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream, **agg_kwargs)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_windowed_counts_to_files(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema,
    **agg_kwargs,
):
    """PRODUCTION wiring: readStream(parquet) -> watermarked windowed
    agg -> append-mode parquet sink. A window row is emitted exactly
    once, when the watermark passes the window end; its state is then
    evicted, so state really is bounded by (watermark horizon x key
    cardinality). Rows later than the watermark are dropped."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream, **agg_kwargs)
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    hash_col: str = "text_hash",
) -> DataFrame:
    """Stateful streaming exact-dedup via applyInPandasWithState: emit
    each distinct `hash_col` ONCE (the min `id_col` of its first
    micro-batch); later occurrences — same batch or any later batch —
    are dropped. State per hash is a single counter.

    Output/state types follow the INPUT schema (id/hash may be long
    64-bit keys or the wide 128-bit hex STRING keys the pipeline
    recommends at 10^12 docs — hardcoded LongType would fail the
    streaming query at the Arrow boundary for string ids)."""
    in_fields = {f.name: f.dataType for f in stream.schema.fields}
    out_type = StructType(
        [
            StructField(id_col, in_fields[id_col]),
            StructField(hash_col, in_fields[hash_col]),
        ]
    )
    state_type = StructType([StructField("seen", LongType())])
    id_is_long = in_fields[id_col].typeName() in ("long", "integer", "short")

    def dedupe(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (h,) = key
        seen = state.get[0] if state.exists else 0
        first_id = None
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            # dropna: a chunk whose ids are all null (or an empty Arrow
            # chunk) makes pandas .min() return NaN — int(NaN) raised
            # and killed the whole streaming query on one poisoned row
            # (r5 review). Null ids can't win "first id" anyway.
            ids = pdf[id_col].dropna()
            if ids.empty:
                continue
            batch_min = ids.min()
            if first_id is None or batch_min < first_id:
                first_id = int(batch_min) if id_is_long else batch_min
        state.update((seen + n,))
        if seen == 0 and first_id is not None:
            yield pd.DataFrame({id_col: [first_id], hash_col: [h]})

    return stream.groupBy(hash_col).applyInPandasWithState(
        dedupe,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema,
    **kwargs,
):
    """File-to-file wiring (the production shape — an append-mode memory
    sink cannot recover from a checkpoint): readStream(parquet) ->
    stateful dedup -> parquet sink, availableNow trigger."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = streaming_exact_dedup(stream, **kwargs)
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
