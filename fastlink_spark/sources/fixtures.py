"""Deterministic synthetic fixtures (seed-fixed, no wall clock).

Mirrors the role of the reference's bundled ``data/samplematch.RData``
golden fixture (SURVEY.md §5.1) at web-page shape: a `pages` table with
the exact input schema of BASELINE.json input_hint
``(url, warc_ts, html, text, lang)``, ground-truth entity clusters, and
labeled pairs for the pairwise-F1 gate (FIXTURES.md §1-2), plus the
persons_a/persons_b samplematch analogue (FIXTURES.md §3).

Duplicate injection per FIXTURES.md: each base page spawns 0-4 variants
(url scheme/www/slash/utm_ tweaks, 1-2 QWERTY-adjacent title edits, text
truncation to 80-95%, ~3% NA injection) + ~10% adversarial same-host
near-miss NON-matches. Hosts are Zipf(s~1.1) so blocking skew is real.

The generated ``text`` column is byte-identical to what
functions/normalize.html_to_text extracts from ``html`` (golden
invariant, tests/test_normalize.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

SEED = 42
_QWERTY_ADJ = {
    "a": "qwsz", "b": "vghn", "c": "xdfv", "d": "serfcx", "e": "wsdr",
    "f": "drtgvc", "g": "ftyhbv", "h": "gyujnb", "i": "ujko", "j": "huikmn",
    "k": "jiolm", "l": "kop", "m": "njk", "n": "bhjm", "o": "iklp",
    "p": "ol", "q": "wa", "r": "edft", "s": "awedxz", "t": "rfgy",
    "u": "yhji", "v": "cfgb", "w": "qase", "x": "zsdc", "y": "tghu",
    "z": "asx",
}
_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _word(rng: np.random.Generator, lo: int = 4, hi: int = 9) -> str:
    n = int(rng.integers(lo, hi + 1))
    return "".join(_LETTERS[i] for i in rng.integers(0, 26, n))


def _qwerty_perturb(rng: np.random.Generator, s: str, n_edits: int) -> str:
    chars = list(s)
    for _ in range(n_edits):
        if len(chars) < 2:
            break
        i = int(rng.integers(0, len(chars)))
        op = rng.random()
        c = chars[i]
        if op < 0.5 and c in _QWERTY_ADJ:
            adj = _QWERTY_ADJ[c]
            chars[i] = adj[int(rng.integers(0, len(adj)))]
        elif i + 1 < len(chars):
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
    return "".join(chars)


def _mk_html(title: str | None, text: str | None) -> bytes:
    t = title or ""
    b = text or ""
    return f"<html><head><title>{t}</title></head><body>{b}</body></html>".encode()


@dataclass
class PagesFixture:
    pages: pd.DataFrame  # url, warc_ts, html, text, lang
    entities_truth: pd.DataFrame  # url, cluster_id
    labeled_pairs: pd.DataFrame  # url_a, url_b, block_key, is_match


def generate_pages(n_base: int = 2000, seed: int = SEED) -> PagesFixture:
    rng = np.random.default_rng(seed)
    n_hosts = max(n_base // 20, 5)
    hosts = [f"{_word(rng, 4, 8)}{i}.example.com" for i in range(n_hosts)]
    # Zipf(s=1.1) host popularity — exercises skew splitting
    w = 1.0 / np.arange(1, n_hosts + 1) ** 1.1
    w /= w.sum()

    vocab_title = [_word(rng, 4, 9) for _ in range(400)]
    vocab_text = [_word(rng, 3, 8) for _ in range(200)]
    base_ts = np.datetime64("2026-07-01T00:00:00")

    rows: list[dict] = []
    truth: list[tuple[str, int]] = []
    pos_pairs: list[tuple[str, str, str]] = []  # (url_a, url_b, host)
    neg_pairs: list[tuple[str, str, str]] = []
    seen_urls: set[str] = set()

    def add_page(url: str, title: str | None, text: str | None, lang: str, cluster: int) -> bool:
        if url in seen_urls:
            return False
        seen_urls.add(url)
        ts = base_ts + np.timedelta64(int(rng.integers(0, 30 * 24 * 3600)), "s")
        rows.append(
            {
                "url": url,
                "warc_ts": pd.Timestamp(ts),
                "html": _mk_html(title, text),
                "text": text,
                "lang": lang,
            }
        )
        truth.append((url, cluster))
        return True

    for b in range(n_base):
        host = hosts[int(rng.choice(n_hosts, p=w))]
        slug = "-".join(rng.choice(vocab_title, 2)) + f"-{b}"
        base_url = f"https://www.{host}/{slug}"
        title = " ".join(rng.choice(vocab_title, int(rng.integers(2, 7))))
        n_tok = int(rng.integers(50, 401))
        text = " ".join(rng.choice(vocab_text, n_tok))
        lang = "en" if rng.random() < 0.95 else ("de" if rng.random() < 0.5 else "fr")
        add_page(base_url, title, text, lang, b)

        n_var = int(rng.integers(0, 5))
        var_urls = [base_url]
        for v in range(n_var):
            u = base_url
            if rng.random() < 0.5:
                u = u.replace("https://", "http://")
            if rng.random() < 0.5:
                u = u.replace("://www.", "://")
            if rng.random() < 0.3:
                u = u + "/"
            if rng.random() < 0.4:
                u = u + f"?utm_source=v{v}"
            if u == base_url:
                u = u + f"?utm_campaign=c{v}"
            # title perturbation: mostly 1-2 edits (JW >= .94 mostly, some
            # in the .88-.94 partial band, a few below)
            r = rng.random()
            n_edits = 1 if r < 0.6 else (2 if r < 0.9 else 3)
            vtitle: str | None = _qwerty_perturb(rng, title, n_edits)
            keep = rng.uniform(0.8, 0.95)
            toks = text.split(" ")
            vtext: str | None = " ".join(toks[: max(int(len(toks) * keep), 5)])
            if rng.random() < 0.03:
                if rng.random() < 0.5:
                    vtitle = None
                else:
                    vtext = None
            if add_page(u, vtitle, vtext, lang, b):
                for prev in var_urls:
                    a_, b_ = sorted((prev, u))
                    pos_pairs.append((a_, b_, host))
                var_urls.append(u)

        # ~10% adversarial near-miss non-match: same host, similar title,
        # different entity (different text)
        if rng.random() < 0.10:
            nm_slug = "-".join(rng.choice(vocab_title, 2)) + f"-nm{b}"
            nm_url = f"https://www.{host}/{nm_slug}"
            nm_title = _qwerty_perturb(rng, title, int(rng.integers(3, 6)))
            nm_text = " ".join(rng.choice(vocab_text, int(rng.integers(50, 401))))
            if add_page(nm_url, nm_title, nm_text, lang, n_base + b):
                a_, b_ = sorted((base_url, nm_url))
                neg_pairs.append((a_, b_, host))

    # extra sampled same-host negatives (random distinct entities)
    urls_by_host: dict[str, list[str]] = {}
    cluster_of = dict(truth)
    for (u, _c) in truth:
        h = u.split("://")[1].split("/")[0].removeprefix("www.")
        urls_by_host.setdefault(h, []).append(u)
    for h, us in urls_by_host.items():
        if len(us) < 2:
            continue
        k = min(len(us), 20)
        for _ in range(k):
            i, j = rng.integers(0, len(us), 2)
            if i == j:
                continue
            a_, b_ = sorted((us[int(i)], us[int(j)]))
            if cluster_of[a_] != cluster_of[b_]:
                neg_pairs.append((a_, b_, h))

    pages = pd.DataFrame(rows)
    entities = pd.DataFrame(truth, columns=["url", "cluster_id"])
    lp = pd.concat(
        [
            pd.DataFrame(pos_pairs, columns=["url_a", "url_b", "block_key"]).assign(is_match=True),
            pd.DataFrame(neg_pairs, columns=["url_a", "url_b", "block_key"]).assign(is_match=False),
        ],
        ignore_index=True,
    )
    lp["block_key"] = "h:" + lp["block_key"].str.removeprefix("www.")
    lp = lp.drop_duplicates(subset=["url_a", "url_b"], keep="first").reset_index(drop=True)
    return PagesFixture(pages=pages, entities_truth=entities, labeled_pairs=lp)


def generate_persons(seed: int = SEED) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """fastLink samplematch analogue: (persons_a ~500, persons_b ~350,
    true_links) with typo/NA perturbations — FIXTURES.md §3."""
    rng = np.random.default_rng(seed + 1)
    first = [_word(rng, 4, 8) for _ in range(120)]
    last = [_word(rng, 5, 9) for _ in range(200)]
    streets = [_word(rng, 6, 10) for _ in range(60)]
    cities = [_word(rng, 5, 9) for _ in range(15)]

    def mk(n: int, start_id: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pid": np.arange(start_id, start_id + n),
                "firstname": rng.choice(first, n),
                "middlename": [
                    None if rng.random() < 0.3 else _word(rng, 3, 7) for _ in range(n)
                ],
                "lastname": rng.choice(last, n),
                "housenum": [
                    None if rng.random() < 0.1 else int(rng.integers(1, 9999)) for _ in range(n)
                ],
                "streetname": rng.choice(streets, n),
                "city": rng.choice(cities, n),
                "birthyear": rng.integers(1930, 2005, n),
            }
        )

    a = mk(500, 0)
    b = mk(300, 10_000)
    # 50 true matches: rows of A copied into B with perturbations
    match_idx = rng.choice(500, 50, replace=False)
    linked = a.iloc[match_idx].copy()
    linked["pid"] = np.arange(20_000, 20_050)
    fn = []
    for s in linked["firstname"]:
        fn.append(_qwerty_perturb(rng, s, 1) if rng.random() < 0.5 else s)
    linked["firstname"] = fn
    linked.loc[linked.sample(frac=0.2, random_state=7).index, "middlename"] = None
    by = linked["birthyear"].to_numpy().copy()
    flip = rng.random(50) < 0.2
    by[flip] = by[flip] + rng.integers(-1, 2, flip.sum())
    linked["birthyear"] = by
    b = pd.concat([b, linked], ignore_index=True)
    true_links = pd.DataFrame({"pid_a": a.iloc[match_idx]["pid"].to_numpy(), "pid_b": linked["pid"].to_numpy()})
    return a, b, true_links
