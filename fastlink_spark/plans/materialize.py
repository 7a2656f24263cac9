"""Injectable stage materialization for operator-internal lineage cuts.

Iterative operators (CC rounds, the greedy 1:1 fixpoint) and
HOF-expression producers (minhash band arrays, gram sets, simhash
fingerprints) must cut lineage mid-operator: the plan would otherwise
grow unboundedly / re-inline generator expressions pathologically (see
functions/minhash.py plan-size note). HOW that cut happens is a
deployment decision, so every operator takes an optional
``materializer`` callback instead of hard-coding one:

- ``disk_only`` (the default): ``localCheckpoint(eager=True,
  storageLevel=DISK_ONLY)``. The DEFAULT deserialized
  (MEMORY_AND_DISK) localCheckpoint measurably ANTI-SCALES in a
  many-thread local block manager (132-145 s vs 45.5 s parquet for the
  same 16.7M-row stage — BENCH/BASELINE.md forensics), and pins large
  intermediates in executor memory; DISK_ONLY serialized blocks avoid
  both. Still NOT fault-tolerant on a real cluster (executor loss loses
  the block) — fine for test/bench scale.
- ``parquet_materializer(root)``: writes each cut to a parquet subdir
  and reads it back — the production shape (an Iceberg table write on a
  real cluster): fault-tolerant, splittable, off-heap. The pipeline's
  CheckpointManager passes this through to the operators it calls.

Signature: ``materializer(df, name) -> DataFrame`` where ``name`` is a
short stage hint (unique-ified by the parquet materializer).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame

Materializer = Callable[[DataFrame, str], DataFrame]


def disk_only(df: DataFrame, name: str = "") -> DataFrame:
    """Default lineage cut: serialized DISK_ONLY localCheckpoint."""
    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)


def parquet_materializer(root: str, keep_per_name: int = 2) -> Materializer:
    """Production-shape cut: parquet write + read-back under ``root``.
    Repeated cuts with the same name get an incrementing suffix (an
    operator may cut several rounds under one hint).

    Retention: only the newest ``keep_per_name`` cuts of each name are
    kept on disk — when cut N is written, cut N-keep is deleted. An
    iterative operator's round N-2 data fed round N-1's write and
    nothing reads it afterwards, so without this a 15-round CC would
    hold 15 full edge-set copies of dead scratch. Contract: a cut's
    returned DataFrame must not be re-read after ``keep_per_name``
    newer cuts of the SAME name (iterative operators never do)."""
    counts: dict[str, int] = {}

    def mat(df: DataFrame, name: str = "") -> DataFrame:
        base = name or "stage"
        idx = counts.get(base, 0)
        counts[base] = idx + 1
        path = os.path.join(root, f"{base}_{idx:03d}")
        df.write.mode("overwrite").parquet(path)
        out = df.sparkSession.read.parquet(path)
        old = idx - keep_per_name
        if old >= 0:
            import shutil

            shutil.rmtree(os.path.join(root, f"{base}_{old:03d}"), ignore_errors=True)
        return out

    return mat


def resolve(materializer: Materializer | None) -> Materializer:
    return materializer if materializer is not None else disk_only
