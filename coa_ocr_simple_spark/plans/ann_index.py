"""Persisted IVF-PQ index: build-once / search-many.

The oracle-checked ANN queries (driver_queries_ext) rebuild centroids,
codebook and codes inline from the embeddings table on every call —
right for a self-contained query, wrong for production, where the index
is built once and amortized over every search.  This module splits the
two halves around a stored layout:

- ``centroids``  (centroid_id, cv)           — coarse quantizer, tiny
- ``codebook``   (m, code, cwv)              — Lloyd-refined, M*K rows,
                                               _PQ_LLOYD_Q fixed point
- ``codes``      (vec_id, centroid_id, codes) — ONE row per vector,
  the M codebook assignments packed as array<long> ordered by subspace
  (the 16-bytes-per-vector layout that makes PQ worth storing)

Search never touches raw vectors except the optional refine step, which
fetches ONLY the ADC shortlist's rows from a caller-supplied vector
table (FAISS IndexRefineFlat shape, same as ann_ivfpq_rerank).

Scale notes: the centroid set and codebook broadcast; routing is a
bounded per-query rank over |centroids|; candidate scoring is an
equi-join on centroid_id (hot lists excluded by _MAX_IVF_LIST, as in
the inline queries); the packed-code explode is a STORED cheap column,
so the InferFiltersFromGenerate expensive-array hazard does not apply.

Parity: tests/test_ann_index_job.py pins that searching loaded-from-
disk frames equals searching the in-memory frames bit-for-bit, and
that a query present in the index refines to itself at rank 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .driver_queries_ext import (
    _IVF_CENTROID_MOD,
    _MAX_IVF_LIST,
    _PQ_LLOYD_Q,
    _ivf_centroids_lloyd,
    _pq_codebook_lloyd,
    _pq_codes_df,
    _pq_subspace_explode,
    _quantize,
)

# coarse-quantizer flavors a stored index can carry (recorded in the
# meta manifest so `add`/`search` route with the SAME metric the build
# assigned with — mixing metrics silently misroutes):
#   seed_dot — untrained seed centroids (raw quantization units),
#              max-dot-product routing (the original layout)
#   lloyd_l2 — _ivf_centroids_lloyd-trained centroids (_PQ_LLOYD_Q
#              fixed-point units), min-squared-L2 routing (k-means
#              assignment IS min-L2; in-list ceiling 0.20 -> 0.33 at
#              sf0.1 nprobe=2, see driver_queries_ext)
COARSE_KINDS = ("seed_dot", "lloyd_l2")


def quantized(emb_raw: DataFrame) -> DataFrame:
    """(vec_id, qv): the shared integer quantization of an embeddings
    table (round(x*1000), the cross-engine recipe)."""
    return emb_raw.select("vec_id", _quantize(F.col("embedding")).alias("qv"))


def _route(
    frame: DataFrame,
    centroids: DataFrame,
    *,
    coarse: str,
    id_col: str,
    nprobe: int,
) -> DataFrame:
    """(id_col, centroid_id): the frame's ``nprobe`` nearest coarse
    lists under the index's routing metric — shared by encode (nprobe=1
    on vec_id) and search (nprobe=n on query_id)."""
    if coarse not in COARSE_KINDS:
        raise ValueError(f"unknown coarse kind {coarse!r}")
    if coarse == "lloyd_l2":
        score = F.aggregate(
            F.zip_with(
                F.transform("qv", lambda x: x * _PQ_LLOYD_Q),
                F.col("cv"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        order = F.asc("_cscore")
    else:
        score = F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        order = F.desc("_cscore")
    w = Window.partitionBy(id_col).orderBy(order, F.asc("centroid_id"))
    return (
        frame.crossJoin(F.broadcast(centroids))
        .select(id_col, "centroid_id", score.alias("_cscore"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select(id_col, "centroid_id")
    )


def encode_frames(
    emb: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    *,
    coarse: str = "seed_dot",
) -> DataFrame:
    """(vec_id, centroid_id, codes): encode vectors against an EXISTING
    quantizer — the write path shared by the initial build and
    incremental `add` (new vectors are encoded with the stored
    codebook/centroids, never a retrain; FAISS's add() contract)."""
    assigned = _route(
        emb, centroids, coarse=coarse, id_col="vec_id", nprobe=1
    )
    pq = _pq_codes_df(emb, codebook, scale=_PQ_LLOYD_Q).select(
        "vec_id", "m", "code"
    )
    packed = pq.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )
    return assigned.join(packed, "vec_id").select(
        "vec_id", "centroid_id", "codes"
    )


def build_index_frames(
    emb: DataFrame, *, coarse: str = "seed_dot"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(centroids, codebook, codes) from a quantized embeddings frame.

    ``emb`` feeds the seed scan, the Lloyd refinement and the final
    assignment — persist+fill it before calling (the job does).
    ``coarse="lloyd_l2"`` trains the coarse quantizer (full-vector
    exact-integer k-means) and stores Q-unit centroids."""
    if coarse not in COARSE_KINDS:
        raise ValueError(f"unknown coarse kind {coarse!r}")
    if coarse == "lloyd_l2":
        centroids = _ivf_centroids_lloyd(emb).persist()
        centroids.count()  # trained subtree, two consumers
    else:
        centroids = emb.where(
            F.col("vec_id") % _IVF_CENTROID_MOD == 1
        ).select(F.col("vec_id").alias("centroid_id"), F.col("qv").alias("cv"))
    codebook = _pq_codebook_lloyd(emb).persist()
    codebook.count()  # heavy subtree, two consumers (codes + callers)
    return (
        centroids,
        codebook,
        encode_frames(emb, centroids, codebook, coarse=coarse),
    )


def search_index_frames(
    queries: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    codes: DataFrame,
    *,
    nprobe: int = 2,
    topk: int = 5,
    rerank: int = 0,
    vectors: DataFrame | None = None,
    exclude_self: bool = False,
    coarse: str = "seed_dot",
) -> DataFrame:
    """Search a stored IVF-PQ index.

    ``queries``: (vec_id, qv) quantized query vectors.  ``rerank`` > 0
    refines the ADC top-``rerank`` shortlist by exact integer dot
    product against ``vectors`` (vec_id, qv) — the raw-vector table the
    index was built from.  ``exclude_self`` drops candidates whose
    vec_id equals the query's (dedup-style search).  ``coarse`` MUST
    match the kind the index was built with (the job reads it from the
    meta manifest)."""
    if rerank and vectors is None:
        raise ValueError("rerank requires the raw-vector table")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")

    qside = queries.select(F.col("vec_id").alias("query_id"), "qv")
    routed = _route(
        qside, centroids, coarse=coarse, id_col="query_id", nprobe=nprobe
    )

    ok_lists = (
        codes.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("_l_n"))
        .where(F.col("_l_n") <= _MAX_IVF_LIST)
        .select("centroid_id")
    )
    cands = (
        codes.join(ok_lists, "centroid_id", "left_semi")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "centroid_id",
            F.posexplode("codes").alias("m", "code"),
        )
        .select("neighbor_id", "centroid_id", F.col("m").cast("long"), "code")
    )

    qsubs = _pq_subspace_explode(qside.withColumnRenamed("query_id", "vec_id"))
    qd2 = F.aggregate(
        F.zip_with(
            F.transform("sub", lambda x: x * _PQ_LLOYD_Q),
            F.col("cwv"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    lut = (
        qsubs.join(F.broadcast(codebook), "m")
        .select(
            F.col("vec_id").alias("query_id"), "m", "code", qd2.alias("qd2")
        )
    )

    scored = (
        routed.join(cands, "centroid_id")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd2").alias("adc_q"))
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))

    if rerank:
        wa = Window.partitionBy("query_id").orderBy(
            F.asc("adc_q"), F.asc("neighbor_id")
        )
        shortlist = (
            scored.withColumn("arn", F.row_number().over(wa))
            .where(F.col("arn") <= rerank)
            .select("query_id", "neighbor_id")
        )
        nvecs = vectors.select(
            F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("n_vec")
        )
        qvecs = qside.select("query_id", F.col("qv").alias("q_vec"))
        dot = F.aggregate(
            F.zip_with("q_vec", "n_vec", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        exact = (
            shortlist.join(nvecs, "neighbor_id")
            .join(qvecs, "query_id")
            .select("query_id", "neighbor_id", dot.alias("dot_q"))
        )
        wx = Window.partitionBy("query_id").orderBy(
            F.desc("dot_q"), F.asc("neighbor_id")
        )
        return (
            exact.withColumn("rank", F.row_number().over(wx).cast("long"))
            .where(F.col("rank") <= topk)
            .select("query_id", "rank", "neighbor_id", "dot_q")
        )
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("adc_q"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", "neighbor_id", "adc_q")
    )
