"""Wave-3 driver queries: pairwise near-duplicate detection modalities.

Completes the dedup family (exact + MinHash bands + SimHash are in the
other modules): n-gram Jaccard pair scoring, MinHash-LSH candidate pairs
(the band buckets turned into actual pairs), and embedding-cosine
near-duplicates via quantized integer math.

Pair-generation strategy at 100 TB: never all-pairs — candidates come
from an equi-join on a bucket key (band signature / simhash / LSH bucket),
which LSH keeps small per bucket; the expensive exact score runs only on
candidates.  At the driver's sf the candidate sets are small enough to
verify against DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import q_dedup_minhash_bands
from .driver_queries_ext import _quantize


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- MinHash-LSH candidate pairs ---------------------------------------------------


def q_minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-join the band signatures into unordered candidate pairs with
    the number of agreeing bands (more bands = higher estimated Jaccard)."""
    bands = q_dedup_minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.signature") == F.col("b.signature"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands_agree"))
    )
    return pairs


def _minhash_pairs_sql() -> str:
    from .driver_queries import _MINHASH_SQL

    return f"""
WITH bands AS ({_MINHASH_SQL})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       COUNT(*) AS n_bands_agree
FROM bands a JOIN bands b
  ON a.band = b.band AND a.signature = b.signature AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


# --- n-gram Jaccard pair scoring ------------------------------------------------------

_NGRAM = 5
_MIN_BANDS_AGREE = 3  # score only candidates agreeing on >=3/8 bands —
# the LSH contract: cheap signatures prune the pair space (2.9M -> 36k at
# sf0.1 on this template-heavy corpus) before the exact O(|grams|) check


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard on MinHash candidates: distinct char-5-grams
    per doc, pairs from the band buckets (>= _MIN_BANDS_AGREE bands),
    |A∩B|/|A∪B| as an integer percentage (floor), computed via array ops —
    exact in both engines."""
    docs = _docs(spark, sf_dir)
    n = F.greatest(F.length("text") - F.lit(_NGRAM - 1), F.lit(1))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.col("text").substr(i + 1, F.lit(_NGRAM)),
        )
    )
    gram_sets = docs.select("doc_id", grams.alias("grams"))

    candidates = (
        q_minhash_candidate_pairs(spark, sf_dir)
        .where(F.col("n_bands_agree") >= _MIN_BANDS_AGREE)
        .select("doc_a", "doc_b")
    )
    a = gram_sets.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    b = gram_sets.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    joined = candidates.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return joined.select(
        "doc_a",
        "doc_b",
        inter.cast("long").alias("n_common_grams"),
        union.cast("long").alias("n_total_grams"),
        F.floor(inter * 100 / union).cast("long").alias("jaccard_pct"),
    )


def _ngram_jaccard_sql() -> str:
    return f"""
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(0, GREATEST(LENGTH(text) - {_NGRAM - 1}, 1)),
             i -> substring(text, i + 1, {_NGRAM}))) AS g
  FROM documents
), pairs AS (
  SELECT * FROM ({_minhash_pairs_sql()})
  WHERE n_bands_agree >= {_MIN_BANDS_AGREE}
)
SELECT p.doc_a, p.doc_b,
       len(list_intersect(a.g, b.g)) AS n_common_grams,
       len(list_distinct(list_concat(a.g, b.g))) AS n_total_grams,
       CAST(FLOOR(len(list_intersect(a.g, b.g)) * 100.0 /
            len(list_distinct(list_concat(a.g, b.g)))) AS BIGINT) AS jaccard_pct
FROM pairs p
JOIN grams a ON p.doc_a = a.doc_id
JOIN grams b ON p.doc_b = b.doc_id
"""


# --- embedding-cosine near-duplicates --------------------------------------------------

def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: all vector pairs with quantized cosine above a threshold (0.4 here — the synthetic embeddings are near-orthogonal random vectors; a production near-dup run would use ~0.95).

    Threshold as a pure integer cross-multiplication — no division, no
    floats, so Spark and DuckDB agree bit-for-bit:
        cos > T  <=>  dot > 0  AND  10000*dot^2 > (10000*T^2)*|a|^2*|b|^2

    All-pairs is quadratic, so the exact check runs on a deterministic 1/3
    sample (vec_id % 3 == 0) here; the production path prunes candidates
    with the sign-LSH buckets (q_ann_lsh_bucketed) before the exact check.
    """
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") % 3 == 0)
        .select("vec_id", _quantize(F.col("embedding")).alias("qv"))
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("qv").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("qv").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))

    def dec_sum(arr_col):
        return F.aggregate(
            arr_col,
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, x: acc + x.cast("decimal(38,0)"),
        )

    dot = dec_sum(F.zip_with("va", "vb", lambda x, y: x * y))
    na = dec_sum(F.transform("va", lambda x: x * x))
    nb = dec_sum(F.transform("vb", lambda x: x * x))
    scored = pairs.select(
        "id_a", "id_b", dot.alias("dot"), na.alias("na"), nb.alias("nb")
    )
    return scored.where(
        (F.col("dot") > 0)
        & (F.col("dot") * F.col("dot") * 10000 > F.col("na") * F.col("nb") * 1600)
    ).select("id_a", "id_b", F.col("dot").cast("long").alias("dot_q"))


def _embedding_neardup_sql() -> str:
    return """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id % 3 = 0
), scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_dot_product(a.qv, b.qv) AS HUGEINT) AS dot,
         CAST(list_dot_product(a.qv, a.qv) AS HUGEINT) AS na,
         CAST(list_dot_product(b.qv, b.qv) AS HUGEINT) AS nb
  FROM q a JOIN q b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, CAST(dot AS BIGINT) AS dot_q
FROM scored
WHERE dot > 0 AND 10000 * dot * dot > 1600 * na * nb
"""


# --- the curation funnel (composition of the training-data ops) -------------------------

_FUNNEL_JACCARD_MIN = 80  # near-dup drop threshold (percent)


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — what the dedup/quality operators exist
    for: quality gate -> exact dedup (keep min-doc_id representative) ->
    near-dup removal (drop the larger doc_id of any >=80% Jaccard pair).
    Emits the per-stage survivor counts as one row, each stage a pure
    composition of the already-verified operators."""
    from .driver_queries import q_dedup_exact
    from .driver_queries_ext import q_language_quality

    docs = _docs(spark, sf_dir).select("doc_id")
    quality = (
        q_language_quality(spark, sf_dir)
        .where(F.col("is_quality"))
        .select("doc_id")
    )
    exact_reps = q_dedup_exact(spark, sf_dir).select(
        F.col("representative_doc_id").alias("doc_id")
    )
    neardup_losers = (
        q_ngram_jaccard_pairs(spark, sf_dir)
        .where(F.col("jaccard_pct") >= _FUNNEL_JACCARD_MIN)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    surviving_exact = quality.join(exact_reps, "doc_id", "left_semi")
    final = surviving_exact.join(neardup_losers, "doc_id", "left_anti")
    return (
        docs.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(quality.agg(F.count(F.lit(1)).alias("n_quality")))
        .crossJoin(surviving_exact.agg(F.count(F.lit(1)).alias("n_after_exact_dedup")))
        .crossJoin(final.agg(F.count(F.lit(1)).alias("n_curated")))
    )


def _curation_funnel_sql() -> str:
    from .driver_queries import _DEDUP_EXACT_SQL
    from .driver_queries_ext import _language_quality_sql

    return f"""
WITH quality AS (
  SELECT doc_id FROM ({_language_quality_sql()}) WHERE is_quality
), reps AS (
  SELECT representative_doc_id AS doc_id FROM ({_DEDUP_EXACT_SQL})
), losers AS (
  SELECT DISTINCT doc_b AS doc_id FROM ({_ngram_jaccard_sql()})
  WHERE jaccard_pct >= {_FUNNEL_JACCARD_MIN}
), surviving AS (
  SELECT q.doc_id FROM quality q WHERE q.doc_id IN (SELECT doc_id FROM reps)
), final AS (
  SELECT s.doc_id FROM surviving s
  WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)
)
SELECT (SELECT COUNT(*) FROM documents) AS n_total,
       (SELECT COUNT(*) FROM quality) AS n_quality,
       (SELECT COUNT(*) FROM surviving) AS n_after_exact_dedup,
       (SELECT COUNT(*) FROM final) AS n_curated
"""


QUERIES_DEDUP = {
    "curation_funnel": q_curation_funnel,
    "minhash_candidate_pairs": q_minhash_candidate_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "embedding_neardup": q_embedding_neardup,
}

ORACLES_DEDUP = {
    "curation_funnel": _curation_funnel_sql(),
    "minhash_candidate_pairs": _minhash_pairs_sql(),
    "ngram_jaccard_pairs": _ngram_jaccard_sql(),
    "embedding_neardup": _embedding_neardup_sql(),
}
