"""Corpus deduplication operators for training-data pipelines:
exact (hash groupBy), MinHash-LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup. Driver-mandated first-class components
beyond the reference's ER scope.

Scale notes: exact dedupe is one hash aggregation (map-side combined);
MinHash-LSH is explode→shuffle-on-band→within-bucket pairs (bounded by
bucket size, same salted-join machinery available via operators.pairs);
n-gram Jaccard / cosine verify ONLY candidate pairs, never the cross
product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import minhash as mh
from ..functions import simhash as sh
from ..functions.textmeta import tokens


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicates by full-text hash: (text_hash, n_dups, doc_ids).
    One shuffle; at 100TB use the 128-bit variant (xxhash64 two seeds)."""
    h = df.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("text_hash")).where(
        F.col(text_col).isNotNull()
    )
    return (
        h.groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_dups") > 1)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    w: int = mh.DEFAULT_SHINGLE_W,
    bands: int = mh.DEFAULT_BANDS,
    rows_per_band: int = mh.DEFAULT_ROWS_PER_BAND,
) -> DataFrame:
    """Near-dup candidate pairs (id_a < id_b) colliding in >=1 LSH band.
    shingle→minhash→band→bucket-join; pair space bounded by bucket
    sizes, deduped across bands."""
    # repartition: small parquet inputs arrive as 1 partition — spread the
    # (CPU-heavy) signature computation across cores; then EAGERLY
    # materialize before explode (HOF arrays inlined into Generate are
    # evaluated pathologically — see minhash.py plan-size note).
    src = df.select(id_col, text_col).repartition(df.sparkSession.sparkContext.defaultParallelism)
    keyed = mh.add_minhash_bands(src, text_col, "bk", w=w, bands=bands, rows_per_band=rows_per_band).localCheckpoint(eager=True)
    exploded = keyed.select(F.col(id_col).alias("id"), F.explode("bk").alias("band"))
    a = exploded.select(F.col("band"), F.col("id").alias("id_a"))
    b = exploded.select(F.col("band").alias("band_b"), F.col("id").alias("id_b"))
    return (
        a.join(b, (a["band"] == b["band_b"]) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram (token shingle) Jaccard.
    Output: (id_a, id_b, n_inter, n_union, jaccard). Set sizes are
    integers so correctness oracles compare exactly."""
    grams = (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select(
            "id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(tokens(F.col("__t"))) - F.lit(n), F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice(tokens(F.col("__t")), i + F.lit(1), F.lit(n))),
                )
            ).alias("grams"),
        )
        .localCheckpoint(eager=True)
    )
    ga = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b"))
    out = (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("grams_a", "grams_b")).cast("long"))
        .withColumn(
            "n_union",
            (F.size("grams_a") + F.size("grams_b") - F.col("n_inter")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.when(F.col("n_union") > 0, F.col("n_inter") / F.col("n_union")).otherwise(F.lit(0.0)),
        )
        .select("id_a", "id_b", "n_inter", "n_union", "jaccard")
    )
    if min_jaccard > 0:
        out = out.where(F.col("jaccard") >= min_jaccard)
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """SimHash near-dups: block on the top `prefix_bits` of the
    fingerprint (cheap LSH for small Hamming radii), verify exact
    Hamming <= max_hamming. Output (id_a, id_b, hamming).

    NOTE single-prefix blocking misses pairs differing within the
    prefix; the standard multi-table rotation (4 tables of 16 bits for
    r<=3) is exposed via `n_tables` in simhash_pairs_multi below."""
    fp = (
        df.select(id_col, text_col)
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(F.col(id_col).alias("id"), sh.simhash(F.col(text_col)).alias("fp"))
        .where(F.col("fp").isNotNull())
        .localCheckpoint(eager=True)
    )
    keyed = fp.withColumn("blk", F.shiftrightunsigned("fp", 64 - prefix_bits))
    a = keyed.select(F.col("blk"), F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = keyed.select(
        F.col("blk").alias("blk_b"), F.col("id").alias("id_b"), F.col("fp").alias("fp_b")
    )
    return (
        a.join(b, (a["blk"] == b["blk_b"]) & (F.col("id_a") < F.col("id_b")))
        .withColumn("hamming", sh.hamming64(F.col("fp_a"), F.col("fp_b")).cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    n_tables: int = 4,
) -> DataFrame:
    """Rotation-table SimHash LSH: block on each of n_tables 16-bit
    slices; a pair within Hamming r < n_tables collides in >=1 table
    (pigeonhole). Exact-verify then dedupe."""
    fp = (
        df.select(id_col, text_col)
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(F.col(id_col).alias("id"), sh.simhash(F.col(text_col)).alias("fp"))
        .where(F.col("fp").isNotNull())
        .localCheckpoint(eager=True)
    )
    bits = 64 // n_tables
    # per-table keys built explicitly: n_tables is tiny, the union is
    # cheap and the plan stays small
    parts = []
    for t in range(n_tables):
        key = F.concat_ws(
            ":",
            F.lit(str(t)),
            F.shiftrightunsigned(F.col("fp"), t * bits).bitwiseAND(F.lit((1 << bits) - 1)).cast("string"),
        )
        parts.append(fp.select("id", "fp", key.alias("blk")))
    tabs = parts[0]
    for p in parts[1:]:
        tabs = tabs.unionByName(p)
    a = tabs.select("blk", F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = tabs.select(
        F.col("blk").alias("blk_b"), F.col("id").alias("id_b"), F.col("fp").alias("fp_b")
    )
    return (
        a.join(b, (a["blk"] == b["blk_b"]) & (F.col("id_a") < F.col("id_b")))
        .withColumn("hamming", sh.hamming64(F.col("fp_a"), F.col("fp_b")).cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_sim(a: Column, b: Column) -> Column:
    na = F.sqrt(_dot(a, a))
    nb = F.sqrt(_dot(b, b))
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def embedding_dup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    min_cosine: float = 0.95,
    n_buckets_hint: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH bucketing +
    exact cosine verify. Deterministic hyperplanes (xxhash64-seeded
    signs over dimension index). Output (id_a, id_b, cosine)."""
    planes = 12 if n_buckets_hint is None else n_buckets_hint
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    # sign bit p of vector x: sum_d sign_hash(p,d) * x_d  > 0
    def bucket_bits(vec: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(planes - 1)),
            F.lit(0).cast("long"),
            lambda acc, p: acc.bitwiseOR(
                F.when(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.sequence(F.lit(0), F.size(vec) - 1),
                            lambda x, d: x
                            * F.when(F.pmod(F.xxhash64(p, d), F.lit(2)) == 0, 1.0).otherwise(-1.0),
                        ),
                        F.lit(0.0),
                        lambda a2, x: a2 + x,
                    )
                    > 0,
                    F.call_function("shiftleft", F.lit(1).cast("long"), p),
                ).otherwise(F.lit(0).cast("long"))
            ),
        )

    keyed = (
        v.repartition(emb.sparkSession.sparkContext.defaultParallelism)
        .withColumn("bkt", bucket_bits(F.col("vec")))
        .localCheckpoint(eager=True)
    )
    a = keyed.select("bkt", F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = keyed.select(
        F.col("bkt").alias("bkt_b"), F.col("id").alias("id_b"), F.col("vec").alias("vec_b")
    )
    return (
        a.join(b, (a["bkt"] == b["bkt_b"]) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine", cosine_sim(F.col("vec_a"), F.col("vec_b")))
        .where(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
