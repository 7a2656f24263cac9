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


def normalize_gamma_nulls(patt: pd.DataFrame, gamma_cols: list[str]) -> pd.DataFrame:
    """Normalize every null representation (NaN/pd.NA/None) to Python
    None, values to int, IN PLACE on a copy the caller owns. The
    dtype=object Series rebuild is load-bearing: a bare list of
    ints+None would be re-coerced by pandas to float64, turning None
    back into NaN and leaking a phantom NaN 'level' into the model.
    ONE definition shared by emlink_mar / apply_em / emlink_log (three
    verbatim copies previously — the exact bug class the comment warns
    about would have to be re-fixed per copy)."""
    for c in gamma_cols:
        col = patt[c].astype(object).where(pd.notna(patt[c]), None)
        patt[c] = pd.Series(
            [None if v is None else int(v) for v in col],
            dtype=object,
            index=patt.index,
        )
    return patt


def _level_masks(
    patt: pd.DataFrame, gamma_cols: list[str], levels: dict[str, list[int]]
) -> dict[str, list[np.ndarray]]:
    """Per-field, per-level boolean row masks. Iteration-invariant —
    computed ONCE and reused across every EM iteration (rebuilding them
    per iteration was O(iters·fields·levels·rows) interpreted Python,
    the dominant fit cost). dtype=bool is load-bearing: an empty
    comprehension otherwise yields float64, which numpy rejects as an
    index."""
    out: dict[str, list[np.ndarray]] = {}
    for c in gamma_cols:
        g = patt[c].to_numpy(dtype=object)
        out[c] = [
            np.array([x is not None and x == lv for x in g], dtype=bool)
            for lv in levels[c]
        ]
    return out


def _class_lik_masks(
    n_rows: int,
    gamma_cols: list[str],
    masks: dict[str, list[np.ndarray]],
    probs: dict[str, list[float]],
) -> np.ndarray:
    """prod_k P(gamma_k | class) with MAR nulls contributing factor 1,
    from precomputed level masks."""
    lik = np.ones(n_rows, dtype=np.float64)
    for c in gamma_cols:
        p = np.ones(n_rows, dtype=np.float64)
        for li, mask in enumerate(masks[c]):
            p[mask] = max(probs[c][li], _EPS)
        lik *= p
    return lik


def _class_lik(
    patt: pd.DataFrame, gamma_cols: list[str], levels: dict[str, list[int]],
    probs: dict[str, list[float]],
) -> np.ndarray:
    """One-shot variant (apply_em): builds the masks and evaluates."""
    return _class_lik_masks(
        len(patt), gamma_cols, _level_masks(patt, gamma_cols, levels), probs
    )


def emlink_mar(
    patterns: pd.DataFrame,
    gamma_cols: list[str],
    *,
    p_m: float = 0.1,
    tol: float = 1e-5,
    iter_max: int = 5000,
    lambda_prior_w: float = 0.0,
    lambda_prior: float = 0.0,
    level_universe: dict[str, list[int]] | None = None,
    dirichlet_w: float = 0.0,
) -> EMResult:
    """Fit the FS mixture by EM over a pattern-count table.

    `patterns`: columns = gamma_cols (nullable int) + 'cnt' (long).

    ``level_universe``: optional per-field COMPLETE level sets (e.g.
    from FieldSpec.possible_levels()). Essential when fitting on a
    SAMPLE that will be applied to the full table (emlinkRS): a rare
    level absent from the sample would otherwise be missing from the
    model and apply_em would score it as MAR-missing — dropping the
    field's strongest evidence exactly on the rarest (most
    informative) agreements. Pair it with ``dirichlet_w``.

    ``dirichlet_w``: Dirichlet pseudo-count weight toward each class's
    INIT distribution in the M-step (the reference's prior machinery,
    ``R/emlinkMARmov.R`` psi/mu knobs, reduced to one scalar). With 0
    (default) a universe level with zero sample counts collapses to
    m≈u≈eps — ratio ~1, i.e. no evidence, barely better than MAR. A
    small weight (1.0 = one pseudo-pair) keeps the init's ORDERING of
    levels alive for unseen cells (the match class loads agreement),
    so a rare level still carries match evidence at apply time, while
    real counts swamp the pseudo-count wherever they exist. Negligible
    when every level is observed.
    """
    patt = normalize_gamma_nulls(patterns.copy(), gamma_cols)
    n = patt["cnt"].to_numpy(dtype=np.float64)
    N = n.sum()
    if N <= 0:
        raise ValueError("empty pattern table")

    levels: dict[str, list[int]] = {}
    for c in gamma_cols:
        obs = {v for v in patt[c] if v is not None}
        if level_universe is not None:
            obs |= set(level_universe.get(c, []))
        levels[c] = sorted(obs) if obs else [0]

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
            mask = np.array([x == lv for x in patt[c]], dtype=bool)
            cnts[li] = n[mask].sum()
        tot = cnts.sum()
        u[c] = list((cnts + 1.0) / (tot + L))  # +1 smoothing

    # iteration-invariant row masks, built once (see _level_masks)
    masks = _level_masks(patt, gamma_cols, levels)
    obs_masks = {
        c: np.array([x is not None for x in patt[c]], dtype=bool) for c in gamma_cols
    }
    n_rows = len(patt)
    # Dirichlet pseudo-counts anchored at the init distributions
    m_init = {c: list(m[c]) for c in gamma_cols}
    u_init = {c: list(u[c]) for c in gamma_cols}

    lam = p_m
    loglik_trace: list[float] = []
    converged = False
    it = 0
    for it in range(1, iter_max + 1):
        fm = _class_lik_masks(n_rows, gamma_cols, masks, m)
        fu = _class_lik_masks(n_rows, gamma_cols, masks, u)
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
            obs_mask = obs_masks[c]
            denom_m = max((n * zeta)[obs_mask].sum() + dirichlet_w, _EPS)
            denom_u = max((n * (1 - zeta))[obs_mask].sum() + dirichlet_w, _EPS)
            mm, uu = [], []
            for li, mask in enumerate(masks[c]):
                pc_m = dirichlet_w * m_init[c][li]
                pc_u = dirichlet_w * u_init[c][li]
                mm.append(max(((n * zeta)[mask].sum() + pc_m) / denom_m, _EPS))
                uu.append(max(((n * (1 - zeta))[mask].sum() + pc_u) / denom_u, _EPS))
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
    if len(patt) == 0:
        patt["zeta"] = pd.Series([], dtype=np.float64)
        return patt
    patt = normalize_gamma_nulls(patt, em.gamma_cols)
    fm = _class_lik(patt, em.gamma_cols, em.levels, em.m)
    fu = _class_lik(patt, em.gamma_cols, em.levels, em.u)
    wm = em.lam * fm
    wu = (1.0 - em.lam) * fu
    patt["zeta"] = wm / np.maximum(wm + wu, _EPS)
    return patt
