"""T1: Jaro-Winkler batch kernel vs published stringdist/classic values.

Golden values are the standard published examples (Winkler 1990 /
stringdist docs); semantics asserted: p=0.1, prefix cap 4, bonus
applied unconditionally (no 0.7 boost threshold) — SURVEY.md F1.
"""

import numpy as np
import pandas as pd
import pytest

from fastlink_spark.functions.jw import jaro_winkler_np, jaro_winkler_series

GOLDENS = [
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("abcdef", "abcdef", 1.0),
    ("abc", "xyz", 0.0),
    ("", "", 1.0),
    ("a", "", 0.0),
    ("", "a", 0.0),
    ("aaaaaaaaab", "aaaaaaaaac", 0.96),
    ("abc", "bca", 0.0),  # window=0: no matches
]


@pytest.mark.parametrize("a,b,exp", GOLDENS)
def test_goldens(a, b, exp):
    got = jaro_winkler_np(np.array([a], dtype=object), np.array([b], dtype=object))[0]
    assert got == pytest.approx(exp, abs=1e-12)


def test_unconditional_prefix_bonus():
    # jaro('ab','axyzzzzz') = 0.541666..; stringdist applies prefix bonus
    # even below 0.7 => 0.5875 (DuckDB-style boost-threshold would give 0.5417)
    got = jaro_winkler_np(np.array(["ab"], dtype=object), np.array(["axyzzzzz"], dtype=object))[0]
    assert got == pytest.approx(0.5416666667 + 0.1 * (1 - 0.5416666667), abs=1e-9)


def test_symmetry_and_batch_consistency():
    rng = np.random.default_rng(3)
    letters = np.array(list("abcdefg "))
    strs = ["".join(rng.choice(letters, rng.integers(0, 15))) for _ in range(300)]
    a = np.array(strs, dtype=object)
    b = np.array(strs[::-1], dtype=object)
    ab = jaro_winkler_np(a, b)
    ba = jaro_winkler_np(b, a)
    np.testing.assert_allclose(ab, ba, atol=1e-12)
    # scalar == batch
    for i in [0, 7, 131]:
        one = jaro_winkler_np(a[i : i + 1], b[i : i + 1])[0]
        assert one == pytest.approx(ab[i], abs=1e-12)


def test_textbook_equivalence_fuzz():
    def jaro_ref(s1, s2):
        if not s1 and not s2:
            return 1.0
        if not s1 or not s2:
            return 0.0
        d = max(max(len(s1), len(s2)) // 2 - 1, 0)
        m2 = [False] * len(s2)
        m1 = [False] * len(s1)
        m = 0
        for i, c in enumerate(s1):
            for j in range(max(0, i - d), min(len(s2), i + d + 1)):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        sa = [c for i, c in enumerate(s1) if m1[i]]
        sb = [c for j, c in enumerate(s2) if m2[j]]
        t = sum(x != y for x, y in zip(sa, sb)) / 2.0
        return (m / len(s1) + m / len(s2) + (m - t) / m) / 3.0

    rng = np.random.default_rng(9)
    letters = np.array(list("abcdeXY "))
    A = ["".join(rng.choice(letters, rng.integers(0, 14))) for _ in range(800)]
    B = ["".join(rng.choice(letters, rng.integers(0, 14))) for _ in range(800)]
    got = jaro_winkler_np(np.array(A, dtype=object), np.array(B, dtype=object), winkler=False)
    exp = np.array([jaro_ref(x, y) for x, y in zip(A, B)])
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_series_null_propagation_and_factorization():
    s = jaro_winkler_series(
        pd.Series(["abc", None, "x", "abc"]), pd.Series(["abd", "y", None, "abd"])
    )
    assert np.isnan(s[1]) and np.isnan(s[2])
    assert s[0] == s[3] > 0.8
