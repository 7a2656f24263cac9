"""Headline benchmark — prints ONE JSON line:
{"metric": "candidate_pairs_scored_per_sec", "value": N, "unit": "pairs/sec",
 "queries": {name: seconds, ...}, "sf": ..., ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_PAGES_NBASE    pages-fixture base size for the linkage workload
                       (default 4000 -> ~12k pages)
  BENCH_MAX_ATTEMPTS   attempt cap (default 5; BENCH/run.py pins 1)
  BENCH_TARGET_CLEAN   clean attempts to median over (default 3)
  BENCH_TIME_BUDGET_SEC wall budget for the attempt loop (default 1200)
  BENCH_CALIB_PAIRS    fixed-work calibration size (default 3M; 0 off)

The headline metric is the gamma-scoring throughput (vectorized JW +
exact ladders over blocked candidate pairs) — BASELINE.json:2. Per-query
walls cover the flagship pipeline and the operator battery at the sf
dir. BENCH/run.py runs this at local[8] vs local[32] for the N->4N
scaling-efficiency gate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_scratch_dirs: list = []


def _track(d: str) -> str:
    _scratch_dirs.append(d)
    return d


# --- contention sentinel (VERDICT r4 "What's wrong #1") -----------------
# A single-shot BENCH_r{N}.json cannot distinguish a code regression from
# VM contention (r4's uniform ~20% drag on untouched queries). Three
# environment signals are embedded in the output so the artifact is
# self-diagnosing:
#   alu_mflops_pre/post  fixed-work pure-ALU multiprocessing probe (no
#                        Spark, L1-resident) run before and after the
#                        bench; sustained steal/contention depresses it.
#   steal_pct            hypervisor steal share of all jiffies across the
#                        WHOLE bench window (/proc/stat delta).
#   foreign_busy_pct     busy jiffies NOT attributable to this process
#                        tree (total busy − our own subtree CPU) — catches
#                        a concurrent pytest/Spark run on the same box.
# Interpretation rule (also in BENCH/BASELINE.md): if contended=true,
# compare against the median-of-3 sweep (BENCH/run.py), not this run.
# References pinned from an idle-box calibration on 2026-08-17 (32
# workers -> ~37 GFLOP/s aggregate); the ALU reference is PER-WORKER so
# the BENCH/run.py sweep widths (4/8/16 workers) get a proportionate
# floor — per-worker throughput only rises at low widths (turbo
# headroom), making the linear floor conservative there. Turbo/freq
# noise on this VM spans ~±20%, hence the loose 0.65 factor.
_ALU_REF_MFLOPS_PER_WORKER = 37_000.0 / 32
# --- Spark-shaped calibration reference (VERDICT r6 "Next round #1") ----
# The r6 cross-day control proved clean sentinels do NOT make absolute
# pairs/s comparable: bit-identical code drifted 2.0x between clean
# windows, concentrated in the 32-thread pandas-UDF gamma stage (the
# ALU probe is pure-numpy fork workers and misses that regime). So
# every bench run now executes a FIXED-WORK calibration stage with the
# exact same shape as the headline stage — pinned-derivation synthetic
# pair table (md5-of-row-id strings, zero RNG), parquet scan -> JW
# pandas-UDF gammas -> groupBy pattern counts, same Arrow batch size,
# same partition fan-out — and the artifact carries
#   value_calibrated = value * (calib_ref / calib_measured)
# next to the raw value. Cross-round comparisons read the CALIBRATED
# number; the raw number remains the measurement of record for gates
# computed within one run (the sweep's N->4N ratio needs no
# calibration — both widths share the window). References pinned from
# low-steal micro-windows on 2026-08-18 (see BENCH/BASELINE.md
# "Calibration reference" + notes_r7 for the pinning protocol and its
# caveat); keyed by worker count because the 2-threads/core regime
# only exists at 32.
_CALIB_REF_PAIRS_PER_SEC = {32: 900_000.0}
_CALIB_PAIRS_DEFAULT = 3_000_000
_CALIB_KEYSPACE = 300_000  # 5x duplication at the default size keeps
# the JW kernel's unique-pair factorization window exercised (the
# production pair table repeats each record across many pairs)
# fixture_gen reference is pinned at the DRIVER config (nbase=4000)
# only — other fixture sizes emit drift=None rather than a number
# computed against the wrong baseline
_FIXTURE_GEN_REF_SEC = 6.0
_FIXTURE_GEN_REF_NBASE = 4_000
_PROBE_ITERS = 9_000
_PROBE_N = 65_536


def _alu_worker(_arg: int) -> float:
    import numpy as np

    x = np.arange(_PROBE_N, dtype=np.float64)
    for _ in range(_PROBE_ITERS):
        x = x * 1.0000001 + 0.5
    return float(x[0])


def _alu_probe(nproc: int, reps: int) -> float:
    """Best-of-reps aggregate MFLOP/s of nproc fork'd pure-ALU workers.

    Best-of (not median): a transient hiccup in one rep should not flag
    the whole bench; SUSTAINED contention depresses every rep.
    """
    import multiprocessing as mp

    ctx = mp.get_context("fork")  # children never touch the py4j gateway
    best = 0.0
    for _ in range(reps):
        t = time.time()
        with ctx.Pool(nproc) as pool:
            pool.map(_alu_worker, range(nproc))
        wall = time.time() - t
        best = max(best, nproc * _PROBE_ITERS * _PROBE_N * 2 / wall / 1e6)
    return best


def _proc_stat() -> list[int]:
    with open("/proc/stat") as f:
        return [int(v) for v in f.readline().split()[1:]]


def _tree_cpu_sec() -> float:
    """CPU seconds attributable to this process tree, from /proc —
    getrusage(RUSAGE_CHILDREN) misses live children, which is exactly
    what the Spark JVM is at sentinel time. Counts utime+stime of every
    LIVE tree member PLUS cutime+cstime (CPU of already-reaped
    children, e.g. a respawned UDF worker — their time exists only in
    the surviving parent's counters; live descendants are NOT in any
    parent's cutime until reaped, so nothing double-counts)."""
    hz = os.sysconf("SC_CLK_TCK")
    ppid: dict[int, int] = {}
    cpu: dict[int, float] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
            # comm may contain spaces/parens: fields after the LAST ')'
            rest = raw[raw.rindex(")") + 2 :].split()
            pid = int(d)
            ppid[pid] = int(rest[1])  # field 4
            # utime+stime+cutime+cstime (fields 14-17)
            cpu[pid] = (
                int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
            ) / hz
        except (OSError, ValueError):
            continue  # raced with process exit
    mine = {os.getpid()}
    grew = True
    while grew:
        grew = False
        for pid, par in ppid.items():
            if par in mine and pid not in mine:
                mine.add(pid)
                grew = True
    return sum(cpu.get(pid, 0.0) for pid in mine)


def _sentinel_close(
    pre: dict, fixture_gen_sec: float, cpus: int, n_base: int
) -> dict:
    hz = os.sysconf("SC_CLK_TCK")
    # snapshot the window BEFORE the post-probe runs, so the probe's own
    # CPU (fork children, dead before _tree_cpu_sec could see them) is
    # not misattributed to "foreign" busy
    stat1 = _proc_stat()
    wall = time.time() - pre["t0"]
    own_sec = _tree_cpu_sec() - pre["own_sec"]
    alu_post = _alu_probe(cpus, reps=2)
    d = [b - a for a, b in zip(pre["stat"], stat1)]
    total = max(sum(d), 1)
    # fields: user nice system idle iowait irq softirq steal guest gn
    busy = d[0] + d[1] + d[2] + d[5] + d[6]
    steal_pct = 100.0 * d[7] / total
    # capacity denominator = MACHINE cores (busy jiffies span all of
    # them), never the SPARK_GRAFT_CPUS knob — at cpus=4 on a 32-core
    # box the knob would inflate background daemons 8x into a false flag
    ncores = os.cpu_count() or cpus
    foreign_busy_pct = max(
        0.0, 100.0 * (busy / hz - own_sec) / max(wall * ncores, 1e-9)
    )
    alu_ref = _ALU_REF_MFLOPS_PER_WORKER * cpus
    fixture_drift = (
        round(fixture_gen_sec / _FIXTURE_GEN_REF_SEC, 2)
        if n_base == _FIXTURE_GEN_REF_NBASE
        else None
    )
    contended = (
        steal_pct > 2.0
        or foreign_busy_pct > 5.0
        or max(pre["alu_pre"], alu_post) < 0.65 * alu_ref
    )
    return {
        "alu_mflops_pre": round(pre["alu_pre"], 0),
        "alu_mflops_post": round(alu_post, 0),
        "alu_mflops_ref": round(alu_ref, 0),
        "steal_pct": round(steal_pct, 2),
        "foreign_busy_pct": round(foreign_busy_pct, 2),
        "fixture_gen_drift": fixture_drift,
        "contended": contended,
    }


def _calibration_stage(spark, cpus: int) -> "dict | None":
    """Fixed-work Spark-shaped calibration (see _CALIB_REF_PAIRS_PER_SEC).

    Work is a pure function of the row id — every run on every box
    computes byte-identical inputs — so its throughput measures the
    BOX-in-this-window, not the data. Shape parity with the headline
    gamma stage is deliberate and total: parquet scan (cpus*4 files),
    the same DEFAULT_FIELDS spec (two JW pandas-UDF ladders + one
    exact JVM ladder), the same 50k Arrow batches (caller holds the
    conf), the same pattern_counts groupBy shuffle, the same
    warm-then-best-of-2 timing protocol. ~1/3 of pairs agree on url,
    ~1/3 near-agree on title (shared 24-char prefix -> the partial
    band), ~1/2 agree on text_hash — the gamma ladder takes every
    branch. BENCH_CALIB_PAIRS=0 disables; a non-default size emits the
    measurement but no factor (wrong baseline otherwise, same rule as
    fixture_gen_drift)."""
    n = int(os.environ.get("BENCH_CALIB_PAIRS", str(_CALIB_PAIRS_DEFAULT)))
    if n <= 0:
        return None
    import tempfile

    from pyspark.sql import functions as F

    from fastlink_spark.operators import gammas
    from fastlink_spark.plans.pipeline import DEFAULT_FIELDS

    fields = list(DEFAULT_FIELDS)
    pid = F.col("id") % _CALIB_KEYSPACE
    h1 = F.md5(pid.cast("string"))
    h2 = F.md5(F.concat(pid.cast("string"), F.lit(":b")))
    h3 = F.md5(F.concat(pid.cast("string"), F.lit(":t")))
    a_url = F.concat(
        F.lit("https://site-"), F.substring(h1, 1, 8), F.lit(".example/"), F.substring(h1, 9, 16)
    )
    b_url_diff = F.concat(
        F.lit("https://site-"), F.substring(h2, 1, 8), F.lit(".example/"), F.substring(h2, 9, 16)
    )
    a_title = F.concat(F.substring(h1, 1, 24), F.lit(" "), F.substring(h3, 1, 16))
    b_title_near = F.concat(F.substring(h1, 1, 24), F.lit(" "), F.substring(h2, 1, 16))
    b_title_diff = F.concat(F.substring(h2, 1, 24), F.lit(" "), F.substring(h3, 1, 16))
    df = spark.range(0, n, 1, cpus * 4).select(
        a_url.alias("a_url_norm"),
        F.when(pid % 3 == 0, a_url).otherwise(b_url_diff).alias("b_url_norm"),
        a_title.alias("a_title"),
        F.when(pid % 3 == 0, b_title_near).otherwise(b_title_diff).alias("b_title"),
        F.substring(h1, 1, 16).alias("a_text_hash"),
        F.when(pid % 2 == 0, F.substring(h1, 1, 16))
        .otherwise(F.substring(h2, 1, 16))
        .alias("b_text_hash"),
    )
    calib_dir = os.path.join(_track(tempfile.mkdtemp(prefix="flbench_calib_")), "pairs")
    df.write.mode("overwrite").parquet(calib_dir)
    calib = spark.read.parquet(calib_dir)
    # warm pass: codegen for THIS plan + page cache (the UDF workers are
    # already warm from the headline stage); discarded per protocol
    gammas.pattern_counts(gammas.with_gammas(calib.limit(60_000), fields), fields).collect()
    wall = float("inf")
    for _rep in range(2):
        t = time.time()
        gammas.pattern_counts(gammas.with_gammas(calib, fields), fields).collect()
        wall = min(wall, time.time() - t)
    pps = n / wall if wall > 0 else 0.0
    ref = _CALIB_REF_PAIRS_PER_SEC.get(cpus) if n == _CALIB_PAIRS_DEFAULT else None
    return {
        "pairs": n,
        "wall_sec": round(wall, 3),
        "pairs_per_sec": round(pps, 1),
        "ref_pairs_per_sec": ref,
        "factor": round(ref / pps, 4) if ref and pps > 0 else None,
    }


def run_once() -> dict:
    """One full bench pass; returns the result dict (sentinel included)
    without printing. main() wraps this in the retry-until-clean loop."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_base = int(os.environ.get("BENCH_PAGES_NBASE", "4000"))

    # pre-bench environment snapshot (see sentinel block above): probe
    # BEFORE the window snapshot so its fork-children CPU (dead before
    # _tree_cpu_sec could see them) isn't misread as foreign busy, and
    # before Spark starts so the number reflects the box, not us
    alu_pre = _alu_probe(cpus, reps=3)
    sentinel_pre = {
        "t0": time.time(),
        "stat": _proc_stat(),
        "own_sec": _tree_cpu_sec(),
        "alu_pre": alu_pre,
    }

    import __spark_entry__ as entry_mod
    from fastlink_spark.operators import gammas
    from fastlink_spark.plans.pipeline import LinkageConfig, link_dedupe, prepare_pages, _blocked_records
    from fastlink_spark.operators.pairs import candidate_pairs
    from fastlink_spark.session import get_spark
    from fastlink_spark.sources.fixtures import generate_pages

    # shuffle partitions default 2x cores: at partitions == cores each
    # reduce task of the pair-dedup exchange holds 1/cpus of the pair
    # stream in its hash map — at 32 threads sharing one local-mode heap
    # that spills/GCs; 2x halves per-task state and lets AQE coalesce
    # back when small (measured: fixes the 16->32 candidate_pairs
    # regression, see BENCH/BASELINE.md)
    shuffle = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", str(2 * cpus)))
    spark = get_spark(
        app_name="fastlink_bench", master=f"local[{cpus}]", shuffle_partitions=shuffle
    )

    queries: dict[str, float] = {}
    t0_all = time.time()

    # --- linkage workload on the scaled pages fixture -------------------
    t = time.time()
    fx = generate_pages(n_base=n_base)
    pages = spark.createDataFrame(fx.pages).repartition(cpus).localCheckpoint(eager=True)
    queries["fixture_gen"] = round(time.time() - t, 3)

    cfg = LinkageConfig()

    # warm-up (discarded, BASELINE.md protocol): compiles the whole-stage
    # codegen for the minhash/regex expressions and spins up the Python
    # UDF workers so the timed stages measure steady-state throughput
    warm = pages.limit(400).localCheckpoint(eager=True)
    warm_rec = prepare_pages(warm, cfg).localCheckpoint(eager=True)
    warm_cand = candidate_pairs(_blocked_records(warm_rec, cfg)).localCheckpoint(eager=True)
    gammas.pattern_counts(
        gammas.with_gammas(warm_cand, list(cfg.fields)), list(cfg.fields)
    ).collect()

    t = time.time()
    records = prepare_pages(pages, cfg).localCheckpoint(eager=True)
    n_records = records.count()
    queries["normalize_block_keys"] = round(time.time() - t, 3)

    # candidate_pairs timed as the stage + its PRODUCTION-shape
    # materialization (parquet checkpoint write, like CheckpointManager
    # with a root). r1 folded repartition(4x)+deserialized localCheckpoint
    # into this wall, and that block-manager write — not the join — was the
    # whole 16->32-core "regression": measured at 32 cores the pure stage
    # is 17.7 s, +parquet 45.5 s, +DISK_ONLY localCheckpoint 60.8 s,
    # +default localCheckpoint 132-145 s (block-store lock/GC contention).
    import tempfile

    pairs_dir = os.path.join(_track(tempfile.mkdtemp(prefix="flbench_")), "pairs")
    t = time.time()
    cand_stage = candidate_pairs(
        _blocked_records(records, cfg),
        skew_threshold=cfg.skew_threshold,
        target_block=cfg.target_block,
    )
    cand_stage.write.mode("overwrite").parquet(pairs_dir)
    n_pairs = spark.read.parquet(pairs_dir).count()
    queries["candidate_pairs"] = round(time.time() - t, 3)

    t = time.time()
    # 4x cores: smooth per-partition JW-content skew into the UDF stage
    # (task tail dominates otherwise); parquet re-write, NOT
    # localCheckpoint — the local-mode block store anti-scales at many
    # threads (measured 132-145 s deserialized / 60.8 s DISK_ONLY vs
    # 45.5 s parquet at 32 cores), and on a real cluster the parquet
    # (Iceberg) checkpoint is the fault-tolerant production shape anyway
    rep_dir = os.path.join(_track(tempfile.mkdtemp(prefix="flbench_")), "pairs_rep")
    spark.read.parquet(pairs_dir).repartition(cpus * 4).write.mode("overwrite").parquet(rep_dir)
    cand = spark.read.parquet(rep_dir)
    queries["pairs_materialize"] = round(time.time() - t, 3)

    fields = list(cfg.fields)
    # 50k-row Arrow batches for the scoring stage: amortizes per-batch
    # UDF overhead and widens the unique-pair factorization window of
    # the JW kernel (measured: ~7% faster at BOTH 4 and 16 cores vs the
    # 10k default; a few MB per batch for these slim string columns)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
    # warm the Python UDF workers + page cache on a slice of the REAL
    # pair table (the 400-page warm-up above compiles codegen but leaves
    # the per-worker Arrow pipelines cold for this data shape); warm-up
    # discarded per the BASELINE.md protocol
    gammas.pattern_counts(
        gammas.with_gammas(cand.limit(60_000).repartition(cpus * 2), fields), fields
    ).collect()
    gamma_wall = float("inf")
    for _rep in range(2):  # best-of-2: damp cloud-VM noise on the headline
        t = time.time()
        gammas.pattern_counts(gammas.with_gammas(cand, fields), fields).collect()
        gamma_wall = min(gamma_wall, time.time() - t)
    queries["gamma_scoring"] = round(gamma_wall, 3)
    pairs_per_sec = n_pairs / gamma_wall if gamma_wall > 0 else 0.0

    # fixed-work calibration probe, same window + same Arrow batch conf
    # as the headline stage it normalizes (see _calibration_stage)
    calib = _calibration_stage(spark, cpus)
    if calib is not None:
        queries["calibration"] = calib["wall_sec"]
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")

    # e2e in PRODUCTION shape: parquet checkpoint per stage (an Iceberg
    # table on a real cluster); fresh dir => no resume, full recompute
    e2e_cfg = LinkageConfig(checkpoint_dir=_track(tempfile.mkdtemp(prefix="flbench_e2e_")))
    t = time.time()
    res = link_dedupe(spark, pages, e2e_cfg)
    res.entities.count()
    queries["pipeline_e2e"] = round(time.time() - t, 3)

    # wide-key (128-bit hex rec_id) e2e variant: exercises the
    # dense_long_ids mapping inside the clusters stage (the 10^12-key
    # story end-to-end). Enabled for the headline/driver-config run;
    # the scaling sweep skips it (BENCH_WIDE_E2E=0) to keep per-width
    # reps affordable.
    if os.environ.get("BENCH_WIDE_E2E", "1") == "1":
        wide_cfg = LinkageConfig(
            wide_rec_id=True, checkpoint_dir=_track(tempfile.mkdtemp(prefix="flbench_wide_"))
        )
        t = time.time()
        res_w = link_dedupe(spark, pages, wide_cfg)
        res_w.entities.count()
        queries["pipeline_e2e_wide_id"] = round(time.time() - t, 3)

    # --- operator battery at the sf dir ---------------------------------
    battery = [
        "q05_pricing_summary",
        "q07_band_join",
        "q08_sessionization",
        "q10_ngram_jaccard",
        "q11_embedding_topk",
        "q15_minhash_candidates",
        "q20_connected_components",
        "q25_corpus_dedup",
        # r3-added operators, benched since r4 so regressions in them
        # are caught by the same per-round diff that caught simhash
        "q27_name_reweight",
        "q30_cluster_match",
    ]
    qmap = entry_mod.queries()
    for name in battery:
        t = time.time()
        qmap[name](spark, sf_dir).count()
        queries[name] = round(time.time() - t, 3)

    # simhash timed on the PRODUCTION path (xxhash64/64-bit); q16's
    # md5-twin fingerprint exists for the DuckDB oracle, not for speed
    from fastlink_spark.operators.dedup import simhash_pairs_multi

    t = time.time()
    simhash_pairs_multi(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", "text", max_hamming=3
    ).count()
    queries["simhash_dedup"] = round(time.time() - t, 3)

    # adversarial skew row (r7 verdict item 5): one block key owns ~31%
    # of all rows (boilerplate-corpus shape, ~3.2M pairs). Fixed work,
    # pinned shape — a salting regression (one unsalted reduce task
    # doing n^2/2) shows up here as a multi-x wall jump long before the
    # randomized tests would drift.
    from pyspark.sql import functions as _F

    t = time.time()
    skew_df = spark.range(8_000).select(
        _F.col("id").alias("rec_id"),
        _F.when(_F.col("id") < 2_500, _F.lit("hot"))
        .otherwise(_F.concat(_F.lit("k"), (_F.col("id") % 550).cast("string")))
        .alias("block_key"),
    )
    candidate_pairs(skew_df, dedupe_pairs=False).count()
    queries["skew_stress_pairs"] = round(time.time() - t, 3)

    import shutil

    for d in _scratch_dirs:
        shutil.rmtree(d, ignore_errors=True)

    out = {
        "metric": "candidate_pairs_scored_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec",
        # raw value normalized by the fixed-work probe: cross-round
        # comparable where the raw value is window-bound (r6 control:
        # same code, 2.0x raw drift between clean windows)
        "value_calibrated": (
            round(pairs_per_sec * calib["factor"], 1)
            if calib is not None and calib.get("factor")
            else None
        ),
        "calibration": calib,
        "queries": queries,
        "sf": sf_dir,
        "cpus": cpus,
        "n_pages": n_records,
        "n_candidate_pairs": n_pairs,
        "total_sec": round(time.time() - t0_all, 3),
        "sentinel": _sentinel_close(
            sentinel_pre, queries["fixture_gen"], cpus, n_base
        ),
    }
    if out["sentinel"]["contended"]:
        # calibration corrects STEADY window drift (same-code 2.0x
        # between clean windows, the r6 phenomenon); bursty contention
        # hits the ~60s headline window and the ~4s probe window
        # differently (measured r7: raw/calib ratio swung 0.37-0.85
        # across contended attempts), so a calibrated number on a
        # contended run is noise — suppressed. The raw probe stays in
        # `calibration` for the record.
        out["value_calibrated"] = None
    return out


# unique child-result sentinel: taking "the last '{'-prefixed stdout
# line" would json.loads any post-result '{'-prefixed Spark/py4j
# shutdown log line instead of the bench dict (ADVICE r6 #3)
_RESULT_PREFIX = "BENCH_RESULT "


def _attempt() -> dict:
    """One bench attempt in a FRESH subprocess (cold JVM/JIT/codegen —
    see main()'s docstring). The child is this script re-exec'd with
    BENCH_EMIT_RAW=1; its result is the stdout line tagged with
    _RESULT_PREFIX (exactly one is printed)."""
    env = dict(os.environ)
    env["BENCH_EMIT_RAW"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True,
        text=True,
        env=env,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith(_RESULT_PREFIX)]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench attempt subprocess failed (rc={proc.returncode}):\n"
            + proc.stderr[-2000:]
        )
    return json.loads(lines[-1][len(_RESULT_PREFIX) :])


def main() -> None:
    """Retry-until-clean (VERDICT r5 "What's wrong #1" → "Next round
    #2"): BENCH_r04 and BENCH_r05 were both contention-contaminated,
    making the per-round diff signal unusable two rounds running. The
    sentinel DIAGNOSES contention; this loop REPAIRS the artifact: on
    contended=true the whole bench re-runs (fresh sentinel window each
    attempt, short cool-down between) up to BENCH_MAX_ATTEMPTS times
    and the FIRST CLEAN attempt is the emitted JSON line. If every
    attempt is contended the least-contended one is emitted with an
    explicit ``all_attempts_contended: true`` marker. All attempts'
    sentinels ride along in ``attempts`` either way, so the artifact
    records what it took. BENCH/run.py sets BENCH_MAX_ATTEMPTS=1 — the
    sweep's median-of-reps is its own (pinned) contention estimator and
    a per-rep retry would bias it.

    Multi-attempt runs execute EVERY attempt in a fresh subprocess
    (``_attempt``): a retry inside the warm process would reuse the
    JVM's JIT/codegen caches and read systematically faster than a
    cold first attempt, quietly biasing exactly the cross-round diff
    signal this loop exists to protect (r6 review). The single-attempt
    path stays in-process — it IS the fresh process (the driver or
    BENCH/run.py just spawned it)."""
    if os.environ.get("BENCH_EMIT_RAW") == "1":
        # child mode for _attempt(): one cold pass, tagged dict on stdout
        print(_RESULT_PREFIX + json.dumps(run_once()))
        sys.stdout.flush()
        return
    import statistics

    max_attempts = max(1, int(os.environ.get("BENCH_MAX_ATTEMPTS", "5")))
    # median-of-clean (VERDICT r6 "Next round #6"): with attempts in
    # fresh subprocesses, the driver snapshot takes the MEDIAN of up to
    # BENCH_TARGET_CLEAN clean attempts instead of first-clean, damping
    # single-window variance. A wall-clock budget bounds the driver's
    # wait: stop collecting when the next attempt would overshoot it
    # and emit the median of whatever clean attempts exist.
    target_clean = max(1, int(os.environ.get("BENCH_TARGET_CLEAN", "3")))
    budget_sec = float(os.environ.get("BENCH_TIME_BUDGET_SEC", "1200"))
    t0 = time.time()
    attempts: list[dict] = []
    clean: list[dict] = []
    cooldown = float(os.environ.get("BENCH_RETRY_COOLDOWN_SEC", "20"))
    for i in range(max_attempts):
        out = run_once() if max_attempts == 1 else _attempt()
        attempts.append(out)
        if not out["sentinel"]["contended"]:
            clean.append(out)
            if len(clean) >= target_clean:
                break
        else:
            print(
                f"bench: attempt {i + 1}/{max_attempts} contended "
                f"(steal {out['sentinel']['steal_pct']}%, foreign "
                f"{out['sentinel']['foreign_busy_pct']}%)",
                file=sys.stderr,
            )
        if i < max_attempts - 1:
            est_next = max(a.get("total_sec", 0.0) for a in attempts) + cooldown
            if time.time() - t0 + est_next > budget_sec:
                print(
                    f"bench: stopping after {i + 1} attempts "
                    f"({len(clean)} clean) — time budget {budget_sec:.0f}s",
                    file=sys.stderr,
                )
                break
            if out["sentinel"]["contended"]:
                time.sleep(cooldown)
    if clean:
        # median_low keeps a REAL attempt (value + queries + calibration
        # stay mutually consistent); with an odd count it IS the median
        med = statistics.median_low([a["value"] for a in clean])
        chosen = next(a for a in clean if a["value"] == med)
        chosen["clean_attempts"] = len(clean)
    else:
        # least-contended fallback: minimize the two direct foreign-load
        # signals (ALU ratio is the noisiest of the three — turbo spread)
        chosen = min(
            attempts,
            key=lambda o: o["sentinel"]["steal_pct"] + o["sentinel"]["foreign_busy_pct"],
        )
        chosen["all_attempts_contended"] = True
    # each attempt rides along with its headline values so the artifact
    # shows the spread the median damped
    chosen["attempts"] = [
        {
            "value": a["value"],
            "value_calibrated": a.get("value_calibrated"),
            "calib_pairs_per_sec": (a.get("calibration") or {}).get("pairs_per_sec"),
            **a["sentinel"],
        }
        for a in attempts
    ]
    print(json.dumps(chosen))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
