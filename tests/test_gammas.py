"""T2: gamma encoders on crafted pairs incl. NA and band edges.

Mirrors the reference's gammaKpar/gammaCKpar/gammaNUMCKpar agreement
patterns (BASELINE.json north_star test contract)."""

from pyspark.sql import functions as F

from fastlink_spark.operators.gammas import FieldSpec, pattern_counts, with_gammas


def _pairs(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_gamma_exact_levels(spark):
    df = _pairs(
        spark,
        [(1, 2, "x", "x"), (3, 4, "x", "y"), (5, 6, None, "x"), (7, 8, "x", None)],
        "a_rec_id long, b_rec_id long, a_f string, b_f string",
    )
    out = with_gammas(df, [FieldSpec("f", "exact")]).select("gamma_f").collect()
    assert [r[0] for r in out] == [2, 0, None, None]


def test_gamma_string_band_edges(spark):
    # JW('aaaaaaaaab','aaaaaaaaac') = 0.96 >= .94 -> 2
    # JW('the home','te home') = 0.898214 -> partial band [0.88, 0.94) -> 1
    # JW('abc','xyz') = 0 -> 0 ; NA -> null
    df = _pairs(
        spark,
        [
            (1, 2, "aaaaaaaaab", "aaaaaaaaac"),
            (3, 4, "the home", "te home"),
            (5, 6, "abc", "xyz"),
            (7, 8, None, "abc"),
        ],
        "a_rec_id long, b_rec_id long, a_f string, b_f string",
    )
    out = with_gammas(df, [FieldSpec("f", "string")]).select("gamma_f").collect()
    assert [r[0] for r in out] == [2, 1, 0, None]
    # 2-level variant (gammaCK2par): no partial band
    out2 = with_gammas(df, [FieldSpec("f", "string2")]).select("gamma_f").collect()
    assert [r[0] for r in out2] == [2, 0, 0, None]


def test_gamma_exact_cut_boundary(spark):
    # pair at exactly JW == cut_full must be level 2 (>= comparison,
    # matching fastLink's `>= cut.a`)
    df = _pairs(
        spark,
        [(1, 2, "ab", "ab")],
        "a_rec_id long, b_rec_id long, a_f string, b_f string",
    )
    out = with_gammas(df, [FieldSpec("f", "string", cut_full=1.0)]).select("gamma_f").collect()
    assert out[0][0] == 2


def test_gamma_numeric(spark):
    df = _pairs(
        spark,
        [(1, 2, 10.0, 10.5), (3, 4, 10.0, 12.0), (5, 6, 10.0, 99.0), (7, 8, None, 1.0)],
        "a_rec_id long, b_rec_id long, a_f double, b_f double",
    )
    spec = FieldSpec("f", "numeric", cut_full=1.0, cut_partial=3.0)
    out = with_gammas(df, [spec]).select("gamma_f").collect()
    assert [r[0] for r in out] == [2, 1, 0, None]


def test_pattern_counts_sufficient_stats(spark):
    df = _pairs(
        spark,
        [(1, 2, "x", "x", "p", "p")] * 3 + [(3, 4, "x", "y", "p", "p")] * 2 + [(5, 6, None, "y", "p", "q")],
        "a_rec_id long, b_rec_id long, a_f string, b_f string, a_g string, b_g string",
    )
    fields = [FieldSpec("f", "exact"), FieldSpec("g", "exact")]
    pc = pattern_counts(with_gammas(df, fields), fields).toPandas()
    d = {(r["gamma_f"], r["gamma_g"]): r["cnt"] for _, r in pc.iterrows()}
    d = {(None if k0 != k0 else k0, None if k1 != k1 else k1): v for (k0, k1), v in d.items()}
    assert d[(2, 2)] == 3 and d[(0, 2)] == 2 and d[(None, 0)] == 1
