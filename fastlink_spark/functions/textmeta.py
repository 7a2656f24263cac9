"""Text-analysis column functions for training-data pipelines:
language-ID (stopword heuristic), quality scoring, token counting,
rolling-hash document fingerprinting.

All pure JVM column expressions (split/transform/aggregate/size) —
whole-stage codegen, no UDFs, trivially SQL-oracle-able. These are the
"text analysis" operators the 100TB pipeline needs beyond the
reference's scope (driver mandate); the reference has no analogue.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .minhash import tokens

# Tiny deterministic stopword lists (top function words) per language.
STOPWORDS = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "zu", "ein", "ist", "nicht", "mit", "von"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"],
}


def token_count(text: Column) -> Column:
    """Whitespace/punct token count (lowercased alnum tokenizer)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper bound: word tokens + ceil(chars/4) for long words —
    a cheap deterministic proxy for subword token counts."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.greatest(F.ceil(F.length(t) / 4.0).cast("long"), F.lit(1).cast("long")),
    )


def stopword_count(text: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def langid_scores(text: Column) -> Column:
    """struct<en:int, de:int, fr:int> of stopword hits per language."""
    return F.struct(
        *[stopword_count(text, lg).alias(lg) for lg in ("en", "de", "fr")]
    )


def langid(text: Column) -> Column:
    """Heuristic language id: argmax stopword hits, ties broken
    en > de > fr; all-zero -> 'und' (undetermined)."""
    s = langid_scores(text)
    en, de, fr = s["en"], s["de"], s["fr"]
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality signals (C4/Gopher-style cheap filters):
    n_chars, n_tokens, mean token length x100 (int), alpha ratio x10000
    (int), stopword ratio x10000 (int). Integer-scaled so oracle
    comparison is exact."""
    t = F.coalesce(text, F.lit(""))
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(F.lower(t), r"[^a-z]", ""))
    mean_len = F.when(
        n_tok > 0,
        (F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) * 100 / n_tok).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    stop = stopword_count(text, "en")
    stop_ratio = F.when(n_tok > 0, (stop * 10000 / n_tok).cast("long")).otherwise(F.lit(0).cast("long"))
    alpha_ratio = F.when(n_chars > 0, (alpha * 10000 / n_chars).cast("long")).otherwise(F.lit(0).cast("long"))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_token_len_x100": mean_len,
        "alpha_ratio_x10000": alpha_ratio,
        "stopword_ratio_x10000": stop_ratio,
    }


def quality_score(text: Column) -> Column:
    """Composite 0..100 quality score from the integer features
    (documented formula; deterministic)."""
    f = quality_features(text)
    len_ok = F.when((f["n_tokens"] >= 50) & (f["n_tokens"] <= 100_000), 40).otherwise(
        F.when(f["n_tokens"] >= 10, 20).otherwise(0)
    )
    alpha_ok = F.when(f["alpha_ratio_x10000"] >= 6000, 30).otherwise(
        F.when(f["alpha_ratio_x10000"] >= 3000, 15).otherwise(0)
    )
    stop_ok = F.when(f["stopword_ratio_x10000"] >= 100, 30).otherwise(10)
    return (len_ok + alpha_ok + stop_ok).cast("int")


def rolling_fingerprints(
    text: Column, w: int = 8, keep_mod: int = 8, *, hash_impl: str = "xxhash64"
) -> Column:
    """Document fingerprints: hash of each w-token window, keeping
    hashes ≡ 0 (mod keep_mod) — a deterministic winnowing-style sketch
    (MOSS-like 0-mod-p selection). array<bigint>.

    hash_impl='xxhash64' (production, one JVM op per window) or 'md5'
    (60-bit md5-prefix — the oracle-twin hash DuckDB reproduces
    bit-exactly; see simhash.md5_hash60)."""
    from .simhash import md5_hash60

    hash_fn = F.xxhash64 if hash_impl == "xxhash64" else md5_hash60
    toks = tokens(text)
    n = F.size(toks)
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(n - F.lit(w), F.lit(0))),
        lambda i: hash_fn(F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(w)))),
    )
    sel = F.filter(wins, lambda h: F.pmod(h, F.lit(keep_mod)) == 0)
    return F.when(n > 0, sel)
