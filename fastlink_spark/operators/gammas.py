"""Per-field agreement (gamma) encoders over candidate-pair rows.

Reference analogues (SURVEY.md §2.8):
  - gamma_exact    <- ``R/gammaKpar.R • gammaKpar``       (gamma in {0,2,NA})
  - gamma_string   <- ``R/gammaCKpar.R • gammaCKpar``     ({0,1,2,NA}, JW cuts)
                      / ``R/gammaCK2par.R`` when cut_partial is None
  - gamma_numeric  <- ``R/gammaNUMCKpar.R • gammaNUMCKpar`` (abs-diff cuts)

fastLink default cuts (``R/fastLink.R`` signature): cut.a=0.94,
cut.p=0.88. Encoding: 2 full agree, 1 partial, 0 disagree, null = NA
(either side missing) — MAR fields marginalize out of the EM.

The JW ladder runs one vectorized pandas UDF per string field (Arrow
batches, unique-pair factorized — functions/jw.py); exact and numeric
gammas are pure JVM ``F.when`` ladders inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..functions.jw import jaro_winkler_series

CUT_FULL = 0.94
CUT_PARTIAL = 0.88


@F.pandas_udf(DoubleType())
def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized Jaro-Winkler (stringdist jw, p=0.1) — SURVEY.md U1/F1."""
    return jaro_winkler_series(a, b)


@F.pandas_udf(DoubleType())
def dl_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Normalized Damerau-Levenshtein/OSA similarity (stringdist dl,
    restricted transpositions) — SURVEY.md F2; functions/dl.py."""
    from ..functions.dl import osa_sim_series

    return osa_sim_series(a, b)


def gamma_exact(a: Column, b: Column) -> Column:
    """gammaKpar: 2 if equal, 0 if not, null if either side NA."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None))
        .when(a == b, F.lit(2))
        .otherwise(F.lit(0))
        .cast("int")
    )


def gamma_from_sim(sim: Column, cut_full: float = CUT_FULL, cut_partial: float | None = CUT_PARTIAL) -> Column:
    """Similarity score -> gamma level ladder (gammaCKpar / gammaCK2par)."""
    g = F.when(sim.isNull(), F.lit(None)).when(sim >= F.lit(cut_full), F.lit(2))
    if cut_partial is not None:
        g = g.when(sim >= F.lit(cut_partial), F.lit(1))
    return g.otherwise(F.lit(0)).cast("int")


def gamma_string(
    a: Column, b: Column, cut_full: float = CUT_FULL, cut_partial: float | None = CUT_PARTIAL
) -> Column:
    """gammaCKpar: JW-based 3-level (or 2-level) string agreement."""
    return gamma_from_sim(jw_udf(a, b), cut_full, cut_partial)


def gamma_numeric(
    a: Column, b: Column, cut_full: float, cut_partial: float | None = None
) -> Column:
    """gammaNUMCKpar: |a-b| <= cut_full -> 2; <= cut_partial -> 1; else 0.

    NA handling matches the reference's coercion semantics: a value
    that is null, fails numeric coercion (``try_cast`` — a placeholder
    string like 'unknown' is MAR-missing, not a hard disagreement; a
    plain cast under Spark 4 ANSI would THROW on it), or is NaN yields
    gamma null. Checking the DISTANCE for null (not the raw inputs)
    covers all three in one predicate (r5 review finding: the old
    input-null check let coercion failures fall through to 0,
    biasing the EM's u-probabilities on dirty numeric fields)."""
    d = F.abs(a.try_cast("double") - b.try_cast("double"))
    g = F.when(d.isNull() | F.isnan(d), F.lit(None)).when(
        d <= F.lit(cut_full), F.lit(2)
    )
    if cut_partial is not None:
        g = g.when(d <= F.lit(cut_partial), F.lit(1))
    return g.otherwise(F.lit(0)).cast("int")


def levenshtein_sim(a: Column, b: Column) -> Column:
    """Normalized Levenshtein similarity 1 - lev/max(len) — the
    'lv' stringdist.method of the reference (``R/fastLink.R`` arg
    validation, SURVEY.md F2). JVM built-in F.levenshtein."""
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(a.isNull() | b.isNull(), F.lit(None)).when(mx == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / mx
    )


def gamma_soundex(a: Column, b: Column) -> Column:
    """Binary soundex agreement (stringdist.method='soundex',
    ``R/gammaCK2par.R`` dispatch, SURVEY.md F3). JVM built-in."""
    return gamma_exact(F.soundex(a), F.soundex(b))


@dataclass(frozen=True)
class FieldSpec:
    """One linkage field: how to compare a_<name> vs b_<name>.

    kind: 'exact' | 'string' (JW 3-level) | 'string2' (JW 2-level) |
          'levenshtein' | 'dl' (Damerau-Levenshtein/OSA) | 'soundex' |
          'numeric'
    Mirrors fastLink's varnames + stringdist.match/partial.match/
    numeric.match argument triple and stringdist.method dispatch
    (``R/fastLink.R`` signature).
    """

    name: str
    kind: str = "string"
    cut_full: float | None = None  # None -> CUT_FULL for similarity kinds
    cut_partial: float | None = CUT_PARTIAL

    def _cut_full(self) -> float:
        """Resolved full cut. Similarity kinds default to CUT_FULL
        (0.94 JW). Numeric kinds get NO default: their cut is an
        absolute-DISTANCE window, and silently reinterpreting the
        similarity default as |a-b| <= 0.94 is a misconfiguration that
        degenerates to exact-match on integer fields (r5 review
        finding — same trap class _numeric_partial guards)."""
        if self.cut_full is not None:
            return self.cut_full
        if self.kind == "numeric":
            raise ValueError(
                f"FieldSpec({self.name!r}, 'numeric') requires an explicit "
                "cut_full distance window (the shared similarity default "
                "0.94 is a JW threshold, not a distance)"
            )
        return CUT_FULL

    def _numeric_partial(self) -> float | None:
        """Numeric cuts are DISTANCE windows (partial must be WIDER
        than full — the opposite ordering of similarity cuts), so the
        shared cut_partial default (0.88, a JW threshold) would make
        level 1 unreachable for any cut_full >= 0.88. Treat a partial
        window not strictly wider than full as 'no partial level'."""
        if self.cut_partial is not None and self.cut_partial > self._cut_full():
            return self.cut_partial
        return None

    def _similarity_partial(self) -> float | None:
        """Symmetric guard for SIMILARITY cuts (ADVICE r4): level 1 is
        [cut_partial, cut_full), reachable only when cut_partial <
        cut_full (the full cut is checked first). A partial cut at or
        above full is 'no partial level' — advertising it would be
        exactly the phantom-universe hazard the numeric guard closes."""
        if self.cut_partial is not None and self.cut_partial < self._cut_full():
            return self.cut_partial
        return None

    def possible_levels(self) -> list[int]:
        """The complete gamma-level universe this spec can emit (null
        excluded). Lets a sample-based EM fit (emlinkRS) model levels
        the sample happened to miss instead of silently treating them
        as MAR-missing at apply time — and must advertise NO phantom
        levels (a universe level that can never occur would soak up
        Dirichlet pseudo-count mass for nothing)."""
        if self.kind in ("exact", "string2", "soundex"):
            return [0, 2]
        if self.kind == "numeric":
            return [0, 1, 2] if self._numeric_partial() is not None else [0, 2]
        if self.kind in ("string", "levenshtein", "dl"):
            return [0, 1, 2] if self._similarity_partial() is not None else [0, 2]
        raise ValueError(f"unknown field kind: {self.kind}")

    def gamma(self) -> Column:
        a, b = F.col(f"a_{self.name}"), F.col(f"b_{self.name}")
        if self.kind == "exact":
            return gamma_exact(a, b)
        if self.kind == "string":
            return gamma_string(a, b, self._cut_full(), self._similarity_partial())
        if self.kind == "string2":
            return gamma_string(a, b, self._cut_full(), None)
        if self.kind == "levenshtein":
            return gamma_from_sim(
                levenshtein_sim(a, b), self._cut_full(), self._similarity_partial()
            )
        if self.kind == "dl":
            return gamma_from_sim(dl_udf(a, b), self._cut_full(), self._similarity_partial())
        if self.kind == "soundex":
            return gamma_soundex(a, b)
        if self.kind == "numeric":
            return gamma_numeric(a, b, self._cut_full(), self._numeric_partial())
        raise ValueError(f"unknown field kind: {self.kind}")


def with_gammas(pairs: DataFrame, fields: list[FieldSpec]) -> DataFrame:
    """Append gamma_<field> columns to candidate-pair rows."""
    out = pairs
    for f in fields:
        out = out.withColumn(f"gamma_{f.name}", f.gamma())
    return out


def pattern_counts(pairs_with_gammas: DataFrame, fields: list[FieldSpec]) -> DataFrame:
    """tableCounts (``R/tableCounts.R``): the EM's sufficient statistic —
    one row per distinct gamma vector with its pair count (<= 3^K + NA
    combos; tiny). partial+final hash agg, map-side combined by Spark."""
    gcols = [f"gamma_{f.name}" for f in fields]
    return pairs_with_gammas.groupBy(*gcols).agg(F.count("*").alias("cnt"))
