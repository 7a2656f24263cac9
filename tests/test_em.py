"""T3: driver EM on textbook pattern tables with known mixture structure.

Contract mirrored from the reference (``R/emlinkMARmov.R``): defaults
p.m=0.1/tol=1e-5/iter.max=5000, MAR marginalization of null gammas,
monotone log-likelihood, zeta = lam*prod m / (lam*prod m + (1-lam)*prod u).
"""

import numpy as np
import pandas as pd
import pytest

from fastlink_spark.em import EMResult, apply_em, emlink_mar


def _mixture_table(lam=0.2, m=(0.9, 0.85, 0.95), u=(0.05, 0.1, 0.02), n=200_000, seed=5):
    """Generate exact expected counts of a 3-field binary-agreement FS
    mixture (levels {0,2}) — the EM should recover the parameters."""
    rows = []
    for g1 in (0, 2):
        for g2 in (0, 2):
            for g3 in (0, 2):
                pm = lam
                pu = 1 - lam
                for g, mk, uk in zip((g1, g2, g3), m, u):
                    pm *= mk if g == 2 else (1 - mk)
                    pu *= uk if g == 2 else (1 - uk)
                rows.append({"gamma_1": g1, "gamma_2": g2, "gamma_3": g3, "cnt": (pm + pu) * n})
    return pd.DataFrame(rows)


def test_em_recovers_known_mixture():
    lam, m, u = 0.2, (0.9, 0.85, 0.95), (0.05, 0.1, 0.02)
    patt = _mixture_table(lam, m, u)
    res = emlink_mar(patt, ["gamma_1", "gamma_2", "gamma_3"])
    assert res.converged
    assert res.lam == pytest.approx(lam, abs=0.01)
    for i, c in enumerate(["gamma_1", "gamma_2", "gamma_3"]):
        # level order is [0, 2]; P(agree|match) is the last entry
        assert res.m[c][-1] == pytest.approx(m[i], abs=0.02)
        assert res.u[c][-1] == pytest.approx(u[i], abs=0.02)


def test_loglik_monotone():
    patt = _mixture_table()
    res = emlink_mar(patt, ["gamma_1", "gamma_2", "gamma_3"])
    ll = np.array(res.loglik)
    assert (np.diff(ll) >= -1e-6).all(), "EM log-likelihood must be monotone"


def test_mar_null_marginalization():
    # identical tables except field 3 entirely null => same lambda as a
    # 2-field fit; null gammas must contribute factor 1
    patt2 = _mixture_table()
    patt_null = patt2.groupby(["gamma_1", "gamma_2"], as_index=False)["cnt"].sum()
    patt_null["gamma_3"] = None
    cols = ["gamma_1", "gamma_2", "gamma_3"]
    r_null = emlink_mar(patt_null, cols)
    r_2f = emlink_mar(
        patt2.groupby(["gamma_1", "gamma_2"], as_index=False)["cnt"].sum(),
        ["gamma_1", "gamma_2"],
    )
    assert r_null.lam == pytest.approx(r_2f.lam, abs=1e-6)


def test_zeta_formula_and_apply():
    patt = _mixture_table()
    cols = ["gamma_1", "gamma_2", "gamma_3"]
    res = emlink_mar(patt, cols)
    scored = apply_em(patt, res)
    # manual zeta for the all-agree pattern
    row = scored[(scored.gamma_1 == 2) & (scored.gamma_2 == 2) & (scored.gamma_3 == 2)].iloc[0]
    pm = res.lam
    pu = 1 - res.lam
    for c in cols:
        pm *= res.m[c][-1]
        pu *= res.u[c][-1]
    assert row["zeta"] == pytest.approx(pm / (pm + pu), abs=1e-9)
    # all-agree should be a near-certain match; all-disagree near-certain non-match
    assert row["zeta"] > 0.99
    row0 = scored[(scored.gamma_1 == 0) & (scored.gamma_2 == 0) & (scored.gamma_3 == 0)].iloc[0]
    assert row0["zeta"] < 0.01


def test_em_json_roundtrip():
    patt = _mixture_table()
    cols = ["gamma_1", "gamma_2", "gamma_3"]
    res = emlink_mar(patt, cols)
    back = EMResult.from_json(res.to_json())
    assert back.lam == pytest.approx(res.lam)
    s1 = apply_em(patt, res)["zeta"].to_numpy()
    s2 = apply_em(patt, back)["zeta"].to_numpy()
    np.testing.assert_allclose(s1, s2, atol=1e-12)


def test_three_level_fields():
    # 3-level gammas (0/1/2) with a partial band
    rng = np.random.default_rng(11)
    lam, n = 0.15, 100_000
    m = np.array([0.05, 0.15, 0.8])
    u = np.array([0.9, 0.08, 0.02])
    rows = []
    for g1 in (0, 1, 2):
        for g2 in (0, 1, 2):
            pm = lam * m[g1] * m[g2]
            pu = (1 - lam) * u[g1] * u[g2]
            rows.append({"g1": g1, "g2": g2, "cnt": (pm + pu) * n})
    res = emlink_mar(pd.DataFrame(rows), ["g1", "g2"])
    assert res.converged
    assert res.lam == pytest.approx(lam, abs=0.02)
    assert res.m["g1"][2] == pytest.approx(0.8, abs=0.05)
    assert res.u["g1"][0] == pytest.approx(0.9, abs=0.05)
    _ = rng


def test_no_phantom_nan_levels_from_float_columns():
    # pattern tables arriving from Spark toPandas have float64 gamma
    # columns with NaN; levels must be pure ints with NO NaN entry
    # (regression: list reassignment re-coerced None back to NaN)
    patt = pd.DataFrame(
        {
            "g1": [0.0, 1.0, 2.0, np.nan, 2.0],
            "g2": [0, 1, 2, 0, None],
            "cnt": [100, 50, 20, 10, 30],
        }
    )
    res = emlink_mar(patt, ["g1", "g2"])
    assert res.levels == {"g1": [0, 1, 2], "g2": [0, 1, 2]}
    assert all(len(res.m[c]) == 3 for c in ("g1", "g2"))
    import json as _json

    _json.loads(res.to_json())  # strict-JSON safe (no NaN tokens)
