"""T1: MinHash determinism + LSH banding behavior."""

from pyspark.sql import functions as F

from fastlink_spark.functions.minhash import add_minhash_bands


def _bands(spark, texts, **kw):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    return add_minhash_bands(df, "text", **kw).select("id", "band_keys")


def test_deterministic_across_runs(spark):
    texts = ["the quick brown fox jumps over the lazy dog " * 5, "alpha beta gamma delta " * 10]
    a = {r["id"]: r["band_keys"] for r in _bands(spark, texts).collect()}
    b = {r["id"]: r["band_keys"] for r in _bands(spark, texts).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())


def test_identical_texts_share_all_bands(spark):
    t = "one two three four five six seven eight nine ten " * 8
    rows = _bands(spark, [t, t]).collect()
    assert rows[0]["band_keys"] == rows[1]["band_keys"]


def test_similar_texts_share_some_band(spark):
    base = " ".join(f"tok{i}" for i in range(120))
    trunc = " ".join(f"tok{i}" for i in range(100))  # ~83% prefix overlap
    rows = {r["id"]: set(r["band_keys"]) for r in _bands(spark, [base, trunc]).collect()}
    assert rows[0] & rows[1], "near-duplicates should collide in >=1 band"


def test_dissimilar_texts_share_no_band(spark):
    a = " ".join(f"a{i}" for i in range(100))
    b = " ".join(f"b{i}" for i in range(100))
    rows = {r["id"]: set(r["band_keys"]) for r in _bands(spark, [a, b]).collect()}
    assert not (rows[0] & rows[1])


def test_null_and_short_text(spark):
    rows = _bands(spark, [None, "", "two words"]).collect()
    by_id = {r["id"]: r["band_keys"] for r in rows}
    assert by_id[0] is None and by_id[1] is None
    assert by_id[2] is not None and len(by_id[2]) == 16  # short doc: full-string shingle
