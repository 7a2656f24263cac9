"""Driver-side Fellegi-Sunter EM over aggregated gamma-pattern counts.

Reference: ``R/emlinkMARmov.R • emlinkMARmov(patterns, nobs.a, nobs.b,
p.m=0.1, iter.max=5000, tol=1e-5, ...)``. The EM's sufficient statistic
is the tiny pattern-count table (<= 3^K + NA combos, hundreds of rows —
SURVEY.md D5/X2), so the loop runs in NumPy on the driver in
microseconds per iteration regardless of data scale; this is exactly
the "driver-coordinated EM loop over aggregated gamma-pattern counts"
of BASELINE.json north_star.

Semantics reproduced:
  - two-class mixture (match / non-match), conditional independence
    across fields (emlinkMARmov; the log-linear variant ``emlinklog``
    relaxes this — v2);
  - MAR missingness: a null gamma contributes factor 1 to both class
    likelihoods (the field marginalizes out);
  - defaults p.m=0.1, tol=1e-5, iter.max=5000;
  - optional Beta/Dirichlet pseudo-count priors (lambda.prior via
    w.lambda — ``R/calcMoversPriors.R`` feeds these; scalar knobs here);
  - per-pattern posterior zeta_j = lambda*prod m / (lambda*prod m +
    (1-lambda)*prod u)  (``R/getPosterior.R``).

``apply_em`` re-scores any pattern table with fitted params — the
estimate-then-apply big-data path (``R/emlinkRS.R • emlinkRS``,
SURVEY.md §3.3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

_EPS = 1e-12


@dataclass
class EMResult:
    gamma_cols: list[str]
    levels: dict[str, list[int]]
    lam: float
    m: dict[str, list[float]]  # P(gamma_k = level | match), indexed like levels[k]
    u: dict[str, list[float]]  # P(gamma_k = level | non-match)
    iterations: int
    converged: bool
    loglik: list[float] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "gamma_cols": self.gamma_cols,
                "levels": self.levels,
                "lambda": self.lam,
                "m": self.m,
                "u": self.u,
                "iterations": self.iterations,
                "converged": self.converged,
                "loglik_final": self.loglik[-1] if self.loglik else None,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "EMResult":
        d = json.loads(s)
        return cls(
            gamma_cols=d["gamma_cols"],
            levels={k: list(v) for k, v in d["levels"].items()},
            lam=d["lambda"],
            m={k: list(v) for k, v in d["m"].items()},
            u={k: list(v) for k, v in d["u"].items()},
            iterations=d["iterations"],
            converged=d["converged"],
            loglik=[d["loglik_final"]] if d.get("loglik_final") is not None else [],
        )


def _class_lik(
    patt: pd.DataFrame, gamma_cols: list[str], levels: dict[str, list[int]],
    probs: dict[str, list[float]],
) -> np.ndarray:
    """prod_k P(gamma_k | class) with MAR nulls contributing factor 1."""
    lik = np.ones(len(patt), dtype=np.float64)
    for c in gamma_cols:
        g = patt[c].to_numpy(dtype=object)
        p = np.ones(len(patt), dtype=np.float64)
        for li, lv in enumerate(levels[c]):
            mask = np.array([x is not None and x == lv for x in g])
            p[mask] = max(probs[c][li], _EPS)
        lik *= p
    return lik


def emlink_mar(
    patterns: pd.DataFrame,
    gamma_cols: list[str],
    *,
    p_m: float = 0.1,
    tol: float = 1e-5,
    iter_max: int = 5000,
    lambda_prior_w: float = 0.0,
    lambda_prior: float = 0.0,
) -> EMResult:
    """Fit the FS mixture by EM over a pattern-count table.

    `patterns`: columns = gamma_cols (nullable int) + 'cnt' (long).
    """
    patt = patterns.copy()
    # normalize null representations to Python None
    for c in gamma_cols:
        patt[c] = patt[c].astype(object).where(pd.notna(patt[c]), None)
        # dtype=object is load-bearing: a bare list of ints+None would be
        # re-coerced by pandas to float64, turning None back into NaN and
        # leaking a phantom NaN 'level' into the model
        patt[c] = pd.Series(
            [None if v is None else int(v) for v in patt[c]],
            dtype=object,
            index=patt.index,
        )
    n = patt["cnt"].to_numpy(dtype=np.float64)
    N = n.sum()
    if N <= 0:
        raise ValueError("empty pattern table")

    levels: dict[str, list[int]] = {}
    for c in gamma_cols:
        obs = sorted({v for v in patt[c] if v is not None})
        levels[c] = obs if obs else [0]

    # deterministic init (fastLink-like): match class loads the top level
    m: dict[str, list[float]] = {}
    u: dict[str, list[float]] = {}
    for c in gamma_cols:
        L = len(levels[c])
        if L == 1:
            m[c], u[c] = [1.0], [1.0]
            continue
        lo = 0.15 / (L - 1)
        m[c] = [lo] * (L - 1) + [0.85]
        # u init: marginal frequencies over observed patterns
        tot = 0.0
        cnts = np.zeros(L)
        for li, lv in enumerate(levels[c]):
            mask = np.array([x == lv for x in patt[c]])
            cnts[li] = n[mask].sum()
        tot = cnts.sum()
        u[c] = list((cnts + 1.0) / (tot + L))  # +1 smoothing

    lam = p_m
    loglik_trace: list[float] = []
    converged = False
    it = 0
    for it in range(1, iter_max + 1):
        fm = _class_lik(patt, gamma_cols, levels, m)
        fu = _class_lik(patt, gamma_cols, levels, u)
        wm = lam * fm
        wu = (1.0 - lam) * fu
        denom = np.maximum(wm + wu, _EPS)
        zeta = wm / denom
        ll = float((n * np.log(denom)).sum())
        loglik_trace.append(ll)

        # M-step
        new_lam = float(
            (n * zeta).sum() + lambda_prior_w * lambda_prior
        ) / (N + lambda_prior_w)
        new_m: dict[str, list[float]] = {}
        new_u: dict[str, list[float]] = {}
        for c in gamma_cols:
            gl = patt[c]
            obs_mask = np.array([x is not None for x in gl])
            denom_m = max((n * zeta)[obs_mask].sum(), _EPS)
            denom_u = max((n * (1 - zeta))[obs_mask].sum(), _EPS)
            mm, uu = [], []
            for lv in levels[c]:
                mask = np.array([x == lv for x in gl])
                mm.append(max((n * zeta)[mask].sum() / denom_m, _EPS))
                uu.append(max((n * (1 - zeta))[mask].sum() / denom_u, _EPS))
            new_m[c] = list(np.array(mm) / np.sum(mm))
            new_u[c] = list(np.array(uu) / np.sum(uu))

        delta = abs(new_lam - lam)
        for c in gamma_cols:
            delta = max(
                delta,
                float(np.max(np.abs(np.array(new_m[c]) - np.array(m[c])))),
                float(np.max(np.abs(np.array(new_u[c]) - np.array(u[c])))),
            )
        lam, m, u = new_lam, new_m, new_u
        if delta < tol:
            converged = True
            break

    return EMResult(
        gamma_cols=list(gamma_cols),
        levels=levels,
        lam=lam,
        m=m,
        u=u,
        iterations=it,
        converged=converged,
        loglik=loglik_trace,
    )


def apply_em(patterns: pd.DataFrame, em: EMResult) -> pd.DataFrame:
    """Score a pattern table with fitted params -> + 'zeta' column.

    This is getPosterior / the apply half of emlinkRS: EM fit on a
    sample, parameters applied to the full pattern table (SURVEY.md G8/G9).
    """
    patt = patterns.copy()
    for c in em.gamma_cols:
        patt[c] = patt[c].astype(object).where(pd.notna(patt[c]), None)
        # dtype=object is load-bearing: a bare list of ints+None would be
        # re-coerced by pandas to float64, turning None back into NaN and
        # leaking a phantom NaN 'level' into the model
        patt[c] = pd.Series(
            [None if v is None else int(v) for v in patt[c]],
            dtype=object,
            index=patt.index,
        )
    fm = _class_lik(patt, em.gamma_cols, em.levels, em.m)
    fu = _class_lik(patt, em.gamma_cols, em.levels, em.u)
    wm = em.lam * fm
    wu = (1.0 - em.lam) * fu
    patt["zeta"] = wm / np.maximum(wm + wu, _EPS)
    return patt
