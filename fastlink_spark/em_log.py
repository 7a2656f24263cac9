"""emlinklog — EM with log-linear (two-way interaction) class models.

Reference: ``R/emlinklog.R • emlinklog()`` (the ``cond.indep=FALSE``
path of ``fastLink()``): relaxes emlinkMARmov's conditional-independence
assumption by letting each class distribution P(gamma | class) carry
two-way field interactions. Driver-side NumPy over the tiny pattern
table, like em.py (SURVEY.md G7).

Implementation: classic EM over the complete-pattern grid.
  - E-step: zeta per OBSERVED pattern; MAR nulls marginalize (class
    likelihood = sum of the class joint over grid cells consistent with
    the observed pattern).
  - M-step: expected complete-data counts per grid cell (missing fields
    distributed proportionally to the current class joint), then the
    class joint is re-fit as a hierarchical log-linear model via IPF
    over the model's generating class — all pairwise margins by default,
    or an arbitrary ``interactions`` list of field tuples (pairs,
    triples, …, saturated), covering the reference's richer
    ``cond.indep=FALSE`` structures.
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd

_EPS = 1e-12


def _ipf(
    target: np.ndarray,
    shape: tuple[int, ...],
    margins: list[tuple[int, ...]],
    iters: int = 25,
) -> np.ndarray:
    """Fit a hierarchical log-linear distribution to ``target`` (joint
    over the grid, reshaped to ``shape``) by iterative proportional
    fitting over the given ``margins`` (tuples of axis indices — the
    model's generating class). IPF converges to the unique maximum-
    likelihood distribution in the log-linear family spanned by those
    margins (Deming-Stephan); the saturated margin (all axes) converges
    in one sweep to target itself, and singleton-only margins give the
    independence fit."""
    t = target.reshape(shape)
    q = np.full(shape, 1.0 / t.size)
    K = len(shape)
    if K == 1:
        s = t.sum()
        return (t / s if s > 0 else np.full(shape, 1.0 / t.size)).reshape(-1)
    for _ in range(iters):
        for keep in margins:
            axes = tuple(a for a in range(K) if a not in keep)
            tm = t.sum(axis=axes) if axes else t
            qm = q.sum(axis=axes) if axes else q
            ratio = np.where(qm > _EPS, tm / np.maximum(qm, _EPS), 0.0)
            # build broadcastable ratio
            r = ratio
            for a in range(K):
                if a not in keep:
                    r = np.expand_dims(r, axis=a)
            q = q * r
            s = q.sum()
            if s > 0:
                q = q / s
    return q.reshape(-1)


def _resolve_margins(
    gamma_cols: list[str], interactions: list[tuple[str, ...]] | None
) -> list[tuple[int, ...]]:
    """Field-name interaction sets -> axis-index margins for IPF.
    None keeps emlinklog's default (ALL two-way pairs — the reference's
    ``cond.indep=FALSE`` baseline); an explicit list may hold pairs,
    triples, … up to the saturated set. Singleton margins are always
    included so every main effect is fit even when a field appears in
    no interaction."""
    pos = {c: i for i, c in enumerate(gamma_cols)}
    if interactions is None:
        pairs = list(itertools.combinations(range(len(gamma_cols)), 2))
    else:
        pairs = []
        for tup in interactions:
            unknown = [c for c in tup if c not in pos]
            if unknown:
                raise ValueError(f"unknown interaction fields: {unknown}")
            if len(tup) < 2:
                raise ValueError(f"interaction needs >=2 fields: {tup!r}")
            pairs.append(tuple(sorted(pos[c] for c in tup)))
    singles = [(i,) for i in range(len(gamma_cols))]
    # drop singletons subsumed by a higher-order margin (harmless but
    # redundant IPF sweeps)
    covered = {i for tup in pairs for i in tup}
    return [s for s in singles if s[0] not in covered] + pairs


def emlink_log(
    patterns: pd.DataFrame,
    gamma_cols: list[str],
    *,
    p_m: float = 0.1,
    tol: float = 1e-5,
    iter_max: int = 200,
    ipf_iters: int = 20,
    interactions: list[tuple[str, ...]] | None = None,
    level_universe: dict[str, list[int]] | None = None,
) -> pd.DataFrame:
    """Fit the interaction EM; returns the observed pattern table with
    'zeta' plus attrs (lam, iterations, converged) in ``.attrs``.

    ``interactions``: log-linear generating class as field-name tuples
    (pairs, triples, …, up to the saturated set) — the reference's
    richer ``cond.indep=FALSE`` structures. None = all two-way pairs
    (the default model this module always had).

    ``level_universe``: complete per-field level sets for sample fits
    (same contract as em.emlink_mar — a level absent from the fit
    sample must still have a grid cell, or applying the fit to the
    full table mis-scores it)."""
    from .em import normalize_gamma_nulls

    patt = normalize_gamma_nulls(patterns.copy(), gamma_cols)
    n = patt["cnt"].to_numpy(dtype=np.float64)
    N = n.sum()
    if N <= 0:
        # match emlink_mar's contract — silently returning NaN zetas
        # (the pre-r4 behavior) propagates NaN downstream
        raise ValueError("empty pattern table")

    levels = {
        c: sorted(
            {v for v in patt[c] if v is not None}
            | set((level_universe or {}).get(c, []))
        )
        or [0]
        for c in gamma_cols
    }
    shape = tuple(len(levels[c]) for c in gamma_cols)
    # Python-int product: np.prod(dtype=int64) wraps silently past 2^63
    # (~40 three-level fields), sneaking a huge grid under the cap below
    # (r6 ADVICE)
    G = math.prod(len(levels[c]) for c in gamma_cols)
    # the joint grid is EXPONENTIAL in field count (G = prod of level
    # counts); masks is R x G and the E-step builds R x G float
    # temporaries — at 12 three-level fields that is driver-OOM
    # territory even though the observed table stays tiny (r5 review).
    # Fail loudly instead of thrashing: the MAR model (em.emlink_mar)
    # handles the same field count in O(R * fields), and smaller
    # interaction sets don't shrink the grid (the log-linear model is
    # still over the full joint).
    if G > 300_000:
        raise ValueError(
            f"emlink_log joint grid has {G} cells "
            f"({' x '.join(str(s) for s in shape)}) — the interaction "
            "EM materializes the full grid and does not scale past "
            "~12 three-level fields; drop fields or use the MAR model "
            "(em.emlink_mar)"
        )
    grid = np.array(list(itertools.product(*[range(s) for s in shape])))  # level indices

    # consistency matrix: obs pattern row -> bool mask over grid cells
    masks = np.ones((len(patt), G), dtype=bool)
    for k, c in enumerate(gamma_cols):
        lv_index = {lv: i for i, lv in enumerate(levels[c])}
        col = patt[c]
        for r, v in enumerate(col):
            if v is not None:
                masks[r] &= grid[:, k] == lv_index[v]

    # init: independent distributions (same as emlinkMARmov init)
    pm_joint = np.ones(G)
    pu_joint = np.ones(G)
    for k, c in enumerate(gamma_cols):
        L = shape[k]
        m1 = np.array([0.15 / max(L - 1, 1)] * (L - 1) + [0.85]) if L > 1 else np.array([1.0])
        u1 = np.ones(L) / L
        pm_joint *= m1[grid[:, k]]
        pu_joint *= u1[grid[:, k]]
    pm_joint /= pm_joint.sum()
    pu_joint /= pu_joint.sum()

    margins = _resolve_margins(gamma_cols, interactions)
    lam = p_m
    converged = False
    it = 0
    for it in range(1, iter_max + 1):
        fm = masks @ pm_joint
        fu = masks @ pu_joint
        wm = lam * fm
        wu = (1 - lam) * fu
        zeta = wm / np.maximum(wm + wu, _EPS)

        new_lam = float((n * zeta).sum() / N)
        # expected complete-data counts per grid cell, per class
        # (distribute each observed row over its consistent cells
        # proportionally to the current class joint)
        with np.errstate(invalid="ignore", divide="ignore"):
            wcell_m = (masks * pm_joint).T
            wcell_m = wcell_m / np.maximum(wcell_m.sum(axis=0), _EPS)
            wcell_u = (masks * pu_joint).T
            wcell_u = wcell_u / np.maximum(wcell_u.sum(axis=0), _EPS)
        tgt_m = wcell_m @ (n * zeta)
        tgt_u = wcell_u @ (n * (1 - zeta))
        new_pm = _ipf(np.maximum(tgt_m, _EPS), shape, margins, ipf_iters)
        new_pu = _ipf(np.maximum(tgt_u, _EPS), shape, margins, ipf_iters)

        delta = max(
            abs(new_lam - lam),
            float(np.max(np.abs(new_pm - pm_joint))),
            float(np.max(np.abs(new_pu - pu_joint))),
        )
        lam, pm_joint, pu_joint = new_lam, new_pm, new_pu
        if delta < tol:
            converged = True
            break

    fm = masks @ pm_joint
    fu = masks @ pu_joint
    patt["zeta"] = (lam * fm) / np.maximum(lam * fm + (1 - lam) * fu, _EPS)
    patt.attrs["lam"] = lam
    patt.attrs["iterations"] = it
    patt.attrs["converged"] = converged
    return patt
