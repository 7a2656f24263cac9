"""Control experiment for the 8->32 scaling-gate shortfall.

Hypothesis (SCALE.md / BENCH/BASELINE.md): the 8->32 pair fails the
0.8 efficiency gate because all 32 local threads share ONE socket's
DRAM bandwidth — a resource a real 4x-node cluster multiplies — not
because of any serialization in this engine. Falsifiable prediction:
a COMPUTE-bound task (tiny working set, pure FP arithmetic) pushed
through the IDENTICAL machinery (same session factory, same Arrow
pandas-UDF path, separate process per width) must scale 8->32 near
1.0, while the DRAM-heavy gamma workload does not.

Usage: python BENCH/membus_probe.py            # runs 8 and 32, prints JSON
       python BENCH/membus_probe.py <cpus>     # one width (child mode)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_width(cpus: int) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from fastlink_spark.session import get_spark

    spark = get_spark(
        app_name="membus_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    @F.pandas_udf("double")
    def burn(x: pd.Series) -> pd.Series:
        # ~16k FLOPs per row over the batch's own 80 KB working set
        # (L1/L2-resident, zero DRAM streaming) — pure ALU through the
        # same Arrow pandas-UDF path as the gamma kernel. If THIS
        # doesn't scale, the harness serializes; if it does and the
        # DRAM-heavy gamma workload doesn't, the shared memory bus is
        # the limiter.
        out = x.to_numpy(dtype=np.float64).copy()
        for _ in range(8000):
            out = out * 1.0000001 + 0.5
        return pd.Series(out)

    n_rows = 8_000_000
    df = spark.range(n_rows, numPartitions=cpus * 4).select(
        F.col("id").cast("double").alias("x")
    )
    # warm: compile + spin up Python workers
    df.limit(50_000).select(burn("x").alias("y")).agg(F.sum("y")).collect()
    walls = []
    for _ in range(3):
        t = time.time()
        df.select(burn("x").alias("y")).agg(F.sum("y")).collect()
        walls.append(round(time.time() - t, 3))
    walls.sort()
    return {"cpus": cpus, "walls": walls, "median": walls[1], "rows": n_rows}


def main() -> None:
    if len(sys.argv) > 1:
        print("RESULT " + json.dumps(run_width(int(sys.argv[1]))))
        return
    res = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cpus)],
            capture_output=True,
            text=True,
            timeout=1200,
            cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")][-1]
        res[cpus] = json.loads(line.removeprefix("RESULT "))
    thru8 = res[8]["rows"] / res[8]["median"]
    thru32 = res[32]["rows"] / res[32]["median"]
    eff = (thru32 / thru8) / 4
    print(
        json.dumps(
            {
                "probe": "compute_bound_pandas_udf",
                "wall8_median": res[8]["median"],
                "wall32_median": res[32]["median"],
                "walls8": res[8]["walls"],
                "walls32": res[32]["walls"],
                "efficiency_8_to_32": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
