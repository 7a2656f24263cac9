"""Round-7 regression tests: the r6 ADVICE items and the r7 verdict
work list (compact retention, skew stress, LSAP oracle twin)."""

from __future__ import annotations

import os

import numpy as np
import pytest


def _page_rows(n_base: int, seed: int):
    from fastlink_spark.sources.fixtures import generate_pages

    fx = generate_pages(n_base=n_base, seed=seed)
    pdf = fx.pages.reset_index(drop=True)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    rows = [
        (r["url"], r["warc_ts"].to_pydatetime(), r["html"], r["text"], r["lang"])
        for _, r in pdf.iterrows()
    ]
    return rows, schema


# --------------------------- verdict item 4: compact() retention grace


def test_compact_keep_generations_retention(spark, tmp_path):
    """r7 verdict item 4: keep_generations=1 lets a frame obtained
    BEFORE compact() still read afterwards (its segments ride in the
    manifest's retained history), while a second compaction rolls the
    generation off and GC eventually removes the dirs — retention is a
    grace period, not a leak."""
    from fastlink_spark.plans.pipeline import LinkageConfig, link_dedupe
    from fastlink_spark.streaming.incremental import IncrementalLinker

    rows, schema = _page_rows(30, 17)
    batch = link_dedupe(spark, spark.createDataFrame(rows, schema), LinkageConfig())
    linker = IncrementalLinker(
        spark, str(tmp_path / "st"), batch.em, LinkageConfig(), keep_generations=1
    )
    half = len(rows) // 2
    frame0 = linker.process_batch(spark.createDataFrame(rows[:half], schema), batch_id=0)
    n0 = frame0.count()
    gen0_dirs = set(linker._load_manifest()["records"]) | set(
        linker._load_manifest()["entities"]
    )
    linker.compact()
    # grace: pre-compact frame still reads, byte-for-byte row count
    assert frame0.count() == n0
    m = linker._load_manifest()
    assert len(m["retained"]) == 1
    assert all(os.path.isdir(tmp_path / "st" / d) for d in gen0_dirs)
    # a BATCH commit must carry the retained history through unchanged
    linker.process_batch(spark.createDataFrame(rows[half:], schema), batch_id=1)
    assert len(linker._load_manifest()["retained"]) == 1
    assert all(os.path.isdir(tmp_path / "st" / d) for d in gen0_dirs)
    # second compact: gen-0 rolls off (keep_generations=1) and its
    # dirs are GC'd — eventual cleanup still holds
    linker.compact()
    m2 = linker._load_manifest()
    assert len(m2["retained"]) == 1
    assert not any(os.path.isdir(tmp_path / "st" / d) for d in gen0_dirs)


def test_compact_default_contract_unchanged(spark, tmp_path):
    """keep_generations=0 (default): the strict VACUUM contract — the
    superseded segments are gone right after compact()."""
    from fastlink_spark.plans.pipeline import LinkageConfig, link_dedupe
    from fastlink_spark.streaming.incremental import IncrementalLinker

    rows, schema = _page_rows(20, 23)
    batch = link_dedupe(spark, spark.createDataFrame(rows, schema), LinkageConfig())
    linker = IncrementalLinker(spark, str(tmp_path / "st0"), batch.em, LinkageConfig())
    linker.process_batch(spark.createDataFrame(rows, schema), batch_id=0)
    gen0_dirs = set(linker._load_manifest()["records"])
    linker.compact()
    assert "retained" not in linker._load_manifest()
    assert not any(os.path.isdir(tmp_path / "st0" / d) for d in gen0_dirs)
    with pytest.raises(ValueError):
        IncrementalLinker(
            spark, str(tmp_path / "neg"), batch.em, LinkageConfig(), keep_generations=-1
        )


# --------------------------- verdict item 5: adversarial skew stress


def test_skew_stress_one_hot_block(spark):
    """r7 verdict item 5: pinned adversarial fixture — ONE block key
    owns 30% of all rows (the boilerplate-corpus shape). The grid salt
    must (a) emit exactly the sum-of-triangles pair count, and (b)
    bound every reduce cell to ~target^2 comparisons: the max cell
    load, recomputed from the plan's own salt assignment, stays within
    2x target^2 (hash spread headroom) — vs the ~n^2/2 = 4.5M a single
    unsalted task would take."""
    import math

    from pyspark.sql import functions as F

    from fastlink_spark.operators.pairs import candidate_pairs

    n_total, hot, target = 10_000, 3_000, 500
    df = spark.range(n_total).select(
        F.col("id").alias("rec_id"),
        F.when(F.col("id") < hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 700).cast("string")))
        .alias("block_key"),
    )
    pairs = candidate_pairs(
        df, skew_threshold=1_000, target_block=target, dedupe_pairs=False
    )
    sizes = {r["block_key"]: r["n"] for r in df.groupBy("block_key").agg(F.count("*").alias("n")).collect()}
    expected = sum(n * (n - 1) // 2 for n in sizes.values())
    assert pairs.count() == expected
    # per-cell bound from the plan's own salt assignment
    s_cnt = math.ceil(hot / target)
    per_salt = {
        r["s"]: r["n"]
        for r in df.where(F.col("block_key") == "hot")
        .select(F.pmod(F.xxhash64("rec_id"), F.lit(s_cnt)).alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(per_salt.values()) == hot
    max_cell = 0
    for sa in range(s_cnt):
        for sb in range(sa, s_cnt):
            ca, cb = per_salt.get(sa, 0), per_salt.get(sb, 0)
            load = ca * (ca - 1) // 2 if sa == sb else ca * cb
            max_cell = max(max_cell, load)
    assert max_cell <= 2 * target * target, f"cell load {max_cell} breaks the bound"
    # and the unsalted disaster this prevents, for the record
    assert hot * (hot - 1) // 2 > 15 * max_cell


# --------------------------- verdict item 6: bench median-of-clean


def _fake_out(contended, steal, foreign, value, total_sec=0.0):
    return {
        "metric": "candidate_pairs_scored_per_sec",
        "value": value,
        "total_sec": total_sec,
        "sentinel": {
            "contended": contended,
            "steal_pct": steal,
            "foreign_busy_pct": foreign,
        },
    }


def test_bench_main_median_of_clean(monkeypatch, capsys):
    """r7 verdict item 6: the driver snapshot is the MEDIAN of
    BENCH_TARGET_CLEAN clean attempts (median_low — a real attempt, so
    value/queries/calibration stay mutually consistent); contended
    attempts don't count toward the target but ride in `attempts`."""
    import json

    import bench

    outs = iter(
        [
            _fake_out(False, 0.1, 0.2, 900.0),
            _fake_out(True, 6.0, 1.0, 100.0),
            _fake_out(False, 0.2, 0.1, 700.0),
            _fake_out(False, 0.1, 0.1, 800.0),
        ]
    )
    monkeypatch.setattr(bench, "_attempt", lambda: next(outs))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_MAX_ATTEMPTS", "5")
    monkeypatch.setenv("BENCH_TARGET_CLEAN", "3")
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    got = json.loads(line)
    assert got["value"] == 800.0  # median of {900, 700, 800}
    assert got["clean_attempts"] == 3
    assert len(got["attempts"]) == 4


def test_bench_main_time_budget_stops_early(monkeypatch, capsys):
    """The attempt loop respects BENCH_TIME_BUDGET_SEC: when the next
    attempt would overshoot, it stops and emits the median of the
    clean attempts collected so far."""
    import json

    import bench

    outs = iter(
        [
            _fake_out(False, 0.1, 0.2, 500.0, total_sec=10_000.0),
            _fake_out(False, 0.1, 0.2, 999.0),
        ]
    )
    monkeypatch.setattr(bench, "_attempt", lambda: next(outs))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_MAX_ATTEMPTS", "5")
    monkeypatch.setenv("BENCH_TARGET_CLEAN", "3")
    monkeypatch.setenv("BENCH_TIME_BUDGET_SEC", "1500")
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    got = json.loads(line)
    assert got["value"] == 500.0 and got["clean_attempts"] == 1
    assert len(got["attempts"]) == 1


# --------------------------- ADVICE 2: PPM ambiguous CRLF + trailing ws


def _ppm(header: bytes, w: int, h: int, first_byte: int = 32) -> bytes:
    body = bytes([first_byte]) + bytes((i * 7) % 256 for i in range(w * h * 3 - 1))
    return header + body


def test_decode_ppm_prefers_conforming_reading_when_ambiguous():
    """r7 ADVICE: lone-'\\r' separator, first pixel byte 0x0A, PLUS a
    trailing-whitespace surplus ('\\n'). The old rule (skip whenever a
    surplus byte exists and the \\r\\n pattern matches) ate the real
    0x0A pixel byte and the shifted read passed silently. Now the
    conforming exact-offset reading wins whenever it is self-consistent
    (whitespace-only tail)."""
    from fastlink_spark.multimodal import decode_ppm

    cr = _ppm(b"P6 2 2 255\r", 2, 2, first_byte=0x0A)
    exact = decode_ppm(cr)
    assert exact[0, 0, 0] == 0x0A
    # same file with a final newline appended by text-mode tooling:
    # must decode byte-identical, not shifted
    assert (decode_ppm(cr + b"\n") == exact).all()
    # and a real CRLF writer (non-whitespace last pixel byte -> the
    # conforming reading is inconsistent) still gets the skip
    lf = _ppm(b"P6 2 2 255\n", 2, 2)
    crlf = _ppm(b"P6 2 2 255\r\n", 2, 2)
    assert (decode_ppm(crlf) == decode_ppm(lf)).all()
    assert (decode_ppm(crlf + b"\n") == decode_ppm(lf)).all()


# --------------------------- ADVICE 1: JPEG coef storage is flat int32


def test_jpeg_coef_storage_budget():
    """r7 ADVICE: per-block lists of boxed ints cost ~84+ B/px that the
    80 B/px budget never counted. Decode still works (storage moved to
    a preallocated int32 ndarray) and the dims cap still fires before
    any allocation."""
    from fastlink_spark.jpeg import JPEG_MAX_PIXEL_BYTES, decode_jpeg
    from tests.test_jpeg import encode_color_444  # independent encoder

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    q = np.ones((8, 8), dtype=np.int32)
    payload = encode_color_444(img, q, q)
    out = decode_jpeg(payload)
    assert out.shape == (24, 40, 3)
    # oversized declared dims still rejected pre-allocation
    big = bytearray(payload)
    sof = big.find(b"\xff\xc0")
    h_off = sof + 5
    big[h_off : h_off + 2] = (60_000).to_bytes(2, "big")
    big[h_off + 2 : h_off + 4] = (60_000).to_bytes(2, "big")
    assert 60_000 * 60_000 * 80 > JPEG_MAX_PIXEL_BYTES
    with pytest.raises(ValueError, match="cap"):
        decode_jpeg(bytes(big))
