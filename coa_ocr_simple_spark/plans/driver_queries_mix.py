"""Wave-7 driver queries: corpus composition + export operators (round 4).

Three operators a production training-data build runs between dedup and
the trainer, each scale-shaped and DuckDB-oracled:

- ``block_dedup_stats``   — ExactSubstr-flavored token-block dedup
  (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better"): hash non-overlapping ``_BLOCK_W``-token blocks, find blocks
  repeated anywhere in the corpus, and mark every non-canonical
  occurrence droppable.  Complements the doc-level families (exact md5,
  MinHash, SimHash): those catch whole-document near-dups; this catches
  a boilerplate paragraph pasted into a million otherwise-distinct docs.
- ``lang_mixture_sample`` — temperature-based language rebalancing
  (the multilingual-pretraining sampler of XLM-R/mT5, alpha = 0.5):
  per-language keep-rate sqrt(n_min / n_lang), so expected kept mass is
  sqrt(n_min * n_lang) — proportional to n_lang^alpha.  Deterministic
  and EXACT in both engines: the keep decision is an integer
  cross-multiplication on a squared md5 prefix, no rand(), no floats.
- ``shard_manifest``      — deterministic shuffle-shard assignment for
  training export: shard = md5-prefix % _N_SHARDS, within-shard order =
  md5 hex of the doc id.  The manifest (counts + integer checksum +
  key range per shard) is the small control table a 10^12-doc export
  job publishes so a trainer can verify shard completeness without
  reading the data.  ``write_sharded`` is the matching writer
  (repartition on shard + sortWithinPartitions — one shuffle, no
  global sort, byte-deterministic output).

Scale notes (100 TB): block_dedup is explode -> one hash aggregation on
the block hash (map-side combine; shuffle carries 1 md5 per 20 tokens,
~1/100th of the text) -> equi-join back.  The mixture sampler is a
broadcast of the per-language counts (|langs| rows) over a scan — zero
windows, zero extra shuffles.  The shard manifest is a single hash
aggregation on a 16-bit-derived key; the writer's only shuffle is the
repartition on shard_id.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# _hexing is a LEAF (no intra-package imports): importing it first
# keeps these registry-build-critical helpers available even while this
# module sits partially initialized inside the package's import cycle
# (see plans/_hexing.py and CLAUDE.md).
from ._hexing import _HEXS, _hex_int_sql, _hex_int_val  # noqa: F401
from .driver_queries import _docs
from .driver_queries_quality import _md5_prefix_sql, _md5_prefix_val

# --- ExactSubstr-style token-block dedup --------------------------------------------------

_BLOCK_W = 20  # tokens per non-overlapping block (production would use ~50)


def block_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, block_idx, bh): every full _BLOCK_W-token block's md5,
    in document order.  Pure stateless per-row ops + one explode — safe
    for BOTH batch and streaming inputs (streaming/block_dedup_stream.py
    consumes it unaggregated).

    SHAPE MATTERS (measured): the obvious form — transform() building
    the md5 array, then explode — is quadratic per document, because
    InferFiltersFromGenerate adds ``size(bs) > 0`` under the Generate
    and predicate pushdown substitutes the WHOLE block expression into
    it, split() inlined INSIDE the transform lambda (re-tokenizing the
    doc once per block: a 64k-token doc hung a probe that finished in
    0.6 s at 32k).  Exploding the cheap INDEX array instead keeps the
    inferred filter O(1) (it only references size(t)), the token array
    rides the Generate as a bound attribute (no copy), and the md5 is
    one O(_BLOCK_W) slice per output row — linear end to end, no
    persist barrier needed, so the same plan serves streaming."""
    pre = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    )
    n_blocks = F.floor(F.size("t") / _BLOCK_W).cast("int")
    idx = F.when(n_blocks > 0, F.sequence(F.lit(0), n_blocks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    # `t` is referenced >= 2x here (passthrough + size inside idx), so
    # CollapseProject cannot inline the split into this projection's
    # consumers (the documented hazard)
    ex = pre.select("doc_id", "t", idx.alias("ix")).select(
        "doc_id", "t", F.explode("ix").alias("block_idx")
    )
    bh = F.md5(
        F.concat_ws(
            " ",
            F.slice(F.col("t"), F.col("block_idx") * _BLOCK_W + 1, F.lit(_BLOCK_W)),
        )
    )
    return ex.select("doc_id", "block_idx", bh.alias("bh"))


def block_dedup_stats(docs: DataFrame) -> DataFrame:
    """Per-doc block-duplication stats: (doc_id, n_blocks,
    n_shared_blocks, n_drop_blocks).

    n_shared_blocks counts blocks whose hash occurs >= 2 times anywhere
    in the corpus (cross-doc boilerplate or in-doc repetition);
    n_drop_blocks counts this doc's occurrences that are NOT the
    canonical first occurrence (lexicographic min over (doc_id,
    block_idx)) — exactly the spans an ExactSubstr pass would cut.
    Docs with fewer than _BLOCK_W tokens emit no row (no full block).
    """
    # exploded occurrences feed TWO independent consumers (the firsts
    # aggregate and the join-back) — persist with an eager fill or the
    # explode + md5 chain executes twice (no cross-branch CSE).
    occ = block_occurrences(docs).persist(StorageLevel.MEMORY_AND_DISK)
    occ.count()

    firsts = occ.groupBy("bh").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "block_idx")).alias("first_occ"),
    )
    is_first = (F.col("first_occ.doc_id") == F.col("doc_id")) & (
        F.col("first_occ.block_idx") == F.col("block_idx")
    )
    return (
        occ.join(firsts, "bh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_blocks"),
            F.sum(F.when(~is_first, 1).otherwise(0))
            .cast("long")
            .alias("n_drop_blocks"),
        )
    )


def q_block_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return block_dedup_stats(_docs(spark, sf_dir))


_BLOCK_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(TRIM(text)), '\\s+') AS t
  FROM documents
), occ AS (
  SELECT doc_id, CAST(i AS INTEGER) AS block_idx,
         md5(array_to_string(
           t[CAST(i * {_BLOCK_W} + 1 AS BIGINT):CAST((i + 1) * {_BLOCK_W} AS BIGINT)],
           ' ')) AS bh
  FROM toks,
       unnest(range(0, CAST(FLOOR(len(t) / {_BLOCK_W}) AS BIGINT))) AS r(i)
), firsts AS (
  SELECT bh, COUNT(*) AS n_occ, MIN(ROW(doc_id, block_idx)) AS first_occ
  FROM occ GROUP BY bh
)
SELECT o.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN f.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_blocks,
       CAST(SUM(CASE WHEN ROW(o.doc_id, o.block_idx) <> f.first_occ
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_blocks
FROM occ o JOIN firsts f USING (bh)
GROUP BY o.doc_id
"""


# --- temperature-based language mixture sampling ------------------------------------------

_MIX_SCALE = 65536  # md5 4-hex-prefix domain (same recipe as source_quota_sample)


# exact integer exponent d for each supported temperature: keep-rate
# (n_min/n_l)^(1-alpha) with 1-alpha = 1/d  ->  keep iff
# p^d * n_l < SCALE^d * n_min  (no float pow anywhere)
_MIX_ALPHAS = {0.5: 2, 0.75: 4}


def lang_mixture_sample(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Deterministic temperature rebalancing across languages: keep each
    doc of language l with rate (n_min / n_l)^(1-alpha), where n_l is
    l's corpus count and n_min the smallest language's.  Expected kept
    count per language is n_min^(1-alpha) * n_l^alpha — proportional to
    n_l^alpha, the XLM-R/mT5-style mixture that keeps all of the
    low-resource languages and downsamples the head language (alpha=0.75
    is the gentler knob: a 16x head language keeps 1/2 instead of 1/4).

    The keep decision is EXACT integer math (mirrored verbatim in the
    DuckDB oracle): with p = the 4-hex md5(doc_id) prefix in [0, 65536)
    and d = 1/(1-alpha) an integer, keep iff

        p^d * n_l < 65536^d * n_min

    which is algebraically p < 65536 * (n_min/n_l)^(1-alpha) without
    ever computing a float root — no rounding-boundary disagreement
    between engines, ever.  Both sides run in DECIMAL (Spark) /
    HUGEINT (DuckDB): at d=4 the worst case is p^4 (< 2^64, 20 digits)
    times a count capped at DECIMAL(17,0) (10^17 docs per language) —
    38 digits, exact in both engines.

    Scale shape: one tiny groupBy(lang) aggregate broadcast back over
    the scan; no window, no extra shuffle, trivially skew-immune.
    """
    if alpha not in _MIX_ALPHAS:
        raise ValueError(f"alpha must be one of {sorted(_MIX_ALPHAS)}, got {alpha}")
    d = _MIX_ALPHAS[alpha]
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("_lang_n"))
    n_min = counts.agg(F.min("_lang_n").alias("_n_min"))
    joined = docs.join(F.broadcast(counts), "lang").crossJoin(F.broadcast(n_min))
    p = _md5_prefix_val(F.col("doc_id")).cast("decimal(5,0)")
    p_d = p
    for _ in range(d - 1):
        p_d = p_d * p
    from decimal import Decimal

    lhs = p_d.cast("decimal(20,0)") * F.col("_lang_n").cast("decimal(17,0)")
    # 65536^4 = 2^64 exceeds a Java long — ship it as a Decimal literal
    rhs = F.lit(Decimal(_MIX_SCALE**d)).cast("decimal(20,0)") * F.col(
        "_n_min"
    ).cast("decimal(17,0)")
    return joined.where(lhs < rhs).select("doc_id", "lang")


def q_lang_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_mixture_sample(_docs(spark, sf_dir), alpha=0.5)


def q_lang_mixture_sample_a75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gentler temperature knob (alpha=0.75), one code path with the
    registered alpha=0.5 entry — extra registry, like ann_ivf_search_p2."""
    return lang_mixture_sample(_docs(spark, sf_dir), alpha=0.75)


def _mixture_sql(alpha: float = 0.5) -> str:
    d = _MIX_ALPHAS[alpha]
    p = _md5_prefix_sql("md5(CAST(d.doc_id AS VARCHAR))")
    # CAST the first factor to HUGEINT so the whole product stays 128-bit
    lhs = " * ".join([f"CAST({p} AS HUGEINT)"] + [p] * (d - 1))
    rhs = " * ".join([f"CAST({_MIX_SCALE} AS HUGEINT)"] + [str(_MIX_SCALE)] * (d - 1))
    return f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS lang_n FROM documents GROUP BY lang
), mn AS (
  SELECT MIN(lang_n) AS n_min FROM counts
)
SELECT d.doc_id, d.lang
FROM documents d JOIN counts c USING (lang), mn
WHERE {lhs} * c.lang_n < {rhs} * mn.n_min
"""


# --- deterministic shard assignment + manifest --------------------------------------------

_N_SHARDS = 64  # a parameter in production (1k-100k shards at 10^12 docs)


def _shard_cols(docs: DataFrame, n_shards: int = _N_SHARDS) -> DataFrame:
    """(doc_id, shard_id, sort_key, _p): the deterministic global
    shuffle.  shard_id spreads docs uniformly (md5 prefix mod), and
    sort_key (the full md5 hex) orders docs WITHIN a shard — together a
    reproducible corpus-wide permutation with no global sort."""
    p = _md5_prefix_val(F.col("doc_id"))
    return docs.select(
        "doc_id",
        (p % n_shards).cast("long").alias("shard_id"),
        F.md5(F.col("doc_id").cast("string")).alias("sort_key"),
        p.cast("long").alias("_p"),
    )


def shard_manifest(docs: DataFrame, n_shards: int = _N_SHARDS) -> DataFrame:
    """Per-shard control row: (shard_id, n_docs, checksum, first_key,
    last_key).  checksum = sum of the 16-bit md5 prefixes (exact
    integer) — a trainer (or a resumed export) verifies a shard file
    against this without re-reading the corpus.  One hash aggregation
    on an n_shards-valued key; output is n_shards rows regardless of
    scale."""
    return (
        _shard_cols(docs, n_shards)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_p").cast("long").alias("checksum"),
            F.min("sort_key").alias("first_key"),
            F.max("sort_key").alias("last_key"),
        )
    )


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_manifest(_docs(spark, sf_dir))


def _manifest_sql() -> str:
    p = _md5_prefix_sql("md5(CAST(doc_id AS VARCHAR))")
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST({p} % {_N_SHARDS} AS BIGINT) AS shard_id,
         md5(CAST(doc_id AS VARCHAR)) AS sort_key,
         CAST({p} AS BIGINT) AS p
  FROM documents
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p) AS BIGINT) AS checksum,
       MIN(sort_key) AS first_key,
       MAX(sort_key) AS last_key
FROM s GROUP BY shard_id
"""


def write_sharded(
    docs: DataFrame, out_path: str, n_shards: int = _N_SHARDS
) -> None:
    """Deterministic sharded export: one shuffle (repartition on
    shard_id), per-partition sort on (sort_key, doc_id) — never a
    global sort — written as shard_id=NN/ parquet directories.  Two
    runs over the same input produce identical shard contents, so a
    trainer's data order is reproducible and shards can be verified
    against shard_manifest().  The shard columns are pure functions of
    doc_id, so they attach as projections — no join, the payload's
    ONLY shuffle is the repartition."""
    p = _md5_prefix_val(F.col("doc_id"))
    (
        docs.withColumn("shard_id", (p % n_shards).cast("long"))
        .withColumn("sort_key", F.md5(F.col("doc_id").cast("string")))
        .repartition(n_shards, "shard_id")
        # shard_id leads the sort: FileFormatWriter requires rows sorted
        # by the partitionBy columns and would otherwise insert its own
        # NON-STABLE Sort(shard_id), destroying the sort_key order
        .sortWithinPartitions("shard_id", "sort_key", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_path)
    )


# --- ExactSubstr proper: sliding-window duplicated-SPAN detection -------------------------

_SPAN_W = 50  # window tokens — the production ExactSubstr length (Lee et al. 2022)
_SPAN_M = 2147483647  # 2^31 - 1: per-plane rolling-hash modulus (long-safe products)
_SPAN_B1 = 1000003  # plane bases (distinct primes); two 31-bit planes
_SPAN_B2 = 999983  #   combined into one 62-bit key: collision ~ n^2 / 2^62


def _span_window_occurrences(docs: DataFrame, w: int) -> DataFrame:
    """(doc_id, pos, wh): a rolling polynomial hash of EVERY w-token
    window (stride 1), the suffix-array-free ExactSubstr occurrence
    surface.  vs block_occurrences (stride-w blocks, md5 strings): the
    shuffle key is ONE long per token position instead of a 32-char
    md5 per w tokens, and the per-window hash is w integer mul-adds,
    not a string concat + md5 — the stride-1 blow-up stays affordable.

    Shape notes (all measured hazards, see block_occurrences): the
    token array is split ONCE with >= 2 lexical references per
    projection hop (CollapseProject inlines single-reference columns
    into HOF lambdas — the O(len^2) re-tokenize bug); the explode is
    over the cheap INDEX sequence so InferFiltersFromGenerate's
    `size(ix) > 0` stays O(1); the code arrays ride the Generate as
    bound attributes and each window slices w codes (O(w), F.slice is
    positional-O(1) on the array, unlike substr on a string).
    """
    p0 = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    )
    # t referenced 2x (size + transform) -> the split is materialized here
    p1 = p0.select(
        "doc_id",
        F.size("t").alias("n"),
        F.transform("t", lambda tok: F.md5(tok)).alias("hs"),
    )
    # hs referenced 2x -> the md5 array is materialized here
    p2 = p1.select(
        "doc_id",
        "n",
        F.transform("hs", lambda h: _hex_int_val(h, 1, 8) % _SPAN_M).alias("c1"),
        F.transform("hs", lambda h: _hex_int_val(h, 9, 8) % _SPAN_M).alias("c2"),
    )
    ix = F.when(F.col("n") >= w, F.sequence(F.lit(0), F.col("n") - w)).otherwise(
        F.array().cast("array<int>")
    )
    ex = p2.select("doc_id", "c1", "c2", ix.alias("ix")).select(
        "doc_id", "c1", "c2", F.explode("ix").alias("pos")
    )

    def _roll(codes: str, base: int):
        # STATICALLY UNROLLED fold of w F.get terms — NOT
        # aggregate(slice(...)): HOFs are CodegenFallback, and the
        # interpreted Slice walks the WHOLE code array per window,
        # turning the stage O(len^2) per doc (measured: 4x16k-token
        # docs 35 s; the unrolled-get form 0.6 s).  get/%/* are all
        # codegen expressions, so the Generate + this projection fuse
        # into one whole-stage-codegen loop and the arrays are read
        # in place, never copied.  Value identical to the fold the
        # DuckDB oracle runs (zero-init == first-element seed: every
        # code is already < M).
        # FLAT sum, not a 50-deep Horner nest: the analyzer resolves a
        # serially-nested unresolved-function chain one level per
        # iteration and a w=50 nest blows the 100-iteration Resolution
        # cap; 50 independent depth-3 terms resolve in one pass.
        # Equal to the oracle's Horner fold: sum_j c[pos+j]*B^(w-1-j)
        # (mod M), with the coefficients precomputed via Python pow.
        # Long-safe: each term < M = 2^31, the 50-term sum < 2^37.
        terms = [
            (
                F.element_at(F.col(codes), F.col("pos") + j + 1)
                * pow(base, w - 1 - j, _SPAN_M)
            )
            % _SPAN_M
            for j in range(w)
        ]
        v = terms[0]
        for t in terms[1:]:
            v = v + t
        return v % _SPAN_M

    wh = _roll("c1", _SPAN_B1) * F.lit(2147483648).cast("long") + _roll(
        "c2", _SPAN_B2
    )
    return ex.select("doc_id", "pos", wh.alias("wh"))


def _dup_spans(docs: DataFrame, w: int) -> DataFrame:
    """(doc_id, s, e): the per-doc MAXIMAL duplicated token spans
    [s, e), keep-first — overlapping/touching duplicated w-windows
    merged into islands.  Spans of one doc are pairwise disjoint with
    >= 1 keeper token between them (two windows merge exactly when
    their token ranges overlap or touch, i.e. pos gap <= w)."""
    occ = _span_window_occurrences(docs, w).persist(StorageLevel.MEMORY_AND_DISK)
    occ.count()  # eager fill: two independent consumers below

    firsts = occ.groupBy("wh").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("fo"),
    )
    is_first = (F.col("fo.doc_id") == F.col("doc_id")) & (
        F.col("fo.pos") == F.col("pos")
    )
    dup = (
        occ.join(firsts, "wh")
        .where((F.col("n_occ") > 1) & ~is_first)
        .select("doc_id", "pos")
    )

    from pyspark.sql.window import Window

    wspec = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(wspec)
    # windows at q and pos overlap-or-touch iff pos - q <= w
    ns = F.when(prev.isNull() | (F.col("pos") - prev > w), 1).otherwise(0)
    sp = dup.select("doc_id", "pos", ns.alias("ns")).select(
        "doc_id", "pos", F.sum("ns").over(wspec).alias("span_id")
    )
    return sp.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + w).alias("e")
    ).select("doc_id", "s", "e")


def exact_substr_spans(docs: DataFrame, w: int = _SPAN_W) -> DataFrame:
    """ExactSubstr proper (Lee et al. 2022 §4.1, suffix-array-free):
    per doc, the MAXIMAL token spans covered by w-token substrings that
    occur elsewhere in the corpus, keep-first semantics.  Output one
    row per doc with >= 1 such span: (doc_id, n_spans, dup_tokens,
    max_span_tokens).

    block_dedup_stats' stride-w blocks miss any duplicated region not
    aligned to a block boundary (a pasted paragraph starting at token
    7 of a block contributes nothing); the stride-1 windows here catch
    every duplicated region of >= w tokens at any offset, and the
    island merge turns overlapping duplicated windows into the exact
    maximal spans an ExactSubstr cut pass would remove.

    Scale: one hash aggregation on the 62-bit window key (map-side
    combine) + equi-join back — the block_dedup shape at stride-1 cost
    (shuffle carries ~8 bytes/token).  The span merge is a per-doc
    window over this doc's DUPLICATED positions only — bounded by doc
    length, like the tfidf per-doc top-k (inherently bounded family).
    """
    return _dup_spans(docs, w).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("dup_tokens"),
        F.max(F.col("e") - F.col("s")).cast("long").alias("max_span_tokens"),
    )


def q_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_substr_spans(_docs(spark, sf_dir))


def exact_substr_cut(docs: DataFrame, w: int = _SPAN_W) -> DataFrame:
    """The ExactSubstr CUT pass (Lee et al. 2022 §4.1): rewrite each
    doc's text with every corpus-duplicated span (see _dup_spans)
    removed, keep-first — the first corpus occurrence of a region
    keeps its copy; all later copies are cut.  Output one row per doc:
    (doc_id, text_clean, n_kept, n_cut) where text_clean is the KEPT
    original-case tokens joined by single spaces (whitespace runs are
    normalized — the tokenization contract of the whole span family)
    and n_kept + n_cut = the doc's token count.

    Reconstruction is LINEAR per doc: the spans of a doc are disjoint
    and sorted, so the kept text is the concatenation of the m+1 gaps
    between/around m spans, each lifted out with one O(gap) F.slice —
    never a per-token `exists(spans, ...)` containment probe, which
    is O(n_tokens * n_spans) and superlinear on span-dense docs.
    Docs with no duplicated span pass through (left join, empty gap
    list degenerates to one full-width slice).
    """
    spans = _dup_spans(docs, w)
    per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("sp")
    )
    # original-case tokens; positions align with the lowercased hash
    # tokens because lowering never changes \s+ boundaries
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    j = toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "t",
        F.coalesce(
            "sp", F.array().cast("array<struct<s:int,e:int>>")
        ).alias("sp"),
    )

    m = F.size("sp")
    n = F.size("t")
    # gap i covers [prev span's e (or 0), next span's s (or n)); the
    # first/last gap may be empty (slice with length 0 -> []), interior
    # gaps never are (islands merged any touching spans)
    gaps = F.transform(
        F.sequence(F.lit(0), m),
        lambda i: F.struct(
            F.when(i == 0, F.lit(0))
            .otherwise(F.get(F.col("sp"), i - 1)["e"])
            .alias("gs"),
            F.when(i == m, n).otherwise(F.get(F.col("sp"), i)["s"]).alias("ge"),
        ),
    )
    kept = F.flatten(
        F.transform(gaps, lambda g: F.slice("t", g["gs"] + 1, g["ge"] - g["gs"]))
    )
    # t: 2 lexical refs (n + kept) so CollapseProject cannot inline the
    # split into the HOF lambdas (the measured re-tokenize-per-element
    # hazard); kept: materialized here, 3 refs downstream
    k = j.select("doc_id", n.alias("n"), kept.alias("kept"))
    return k.select(
        "doc_id",
        F.concat_ws(" ", "kept").alias("text_clean"),
        F.size("kept").cast("long").alias("n_kept"),
        (F.col("n") - F.size("kept")).cast("long").alias("n_cut"),
    )


def q_exact_substr_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_substr_cut(_docs(spark, sf_dir))


def _span_ctes(w: int) -> str:
    """The shared CTE chain `toks .. spans` — per-doc maximal
    duplicated spans [s, e), the SQL mirror of _dup_spans.  toks
    carries BOTH the original-case array `t` (the cut pass slices it)
    and the lowered `tl` the window hashes are computed from."""
    c1 = f"{_hex_int_sql('md5(tok)', 1, 8)} % {_SPAN_M}"
    c2 = f"{_hex_int_sql('md5(tok)', 9, 8)} % {_SPAN_M}"
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(TRIM(text), '\\s+') AS t,
         regexp_split_to_array(lower(TRIM(text)), '\\s+') AS tl
  FROM documents
), codes AS (
  SELECT doc_id, len(tl) AS n,
         list_transform(tl, tok -> {c1}) AS c1,
         list_transform(tl, tok -> {c2}) AS c2
  FROM toks
), occ AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         list_reduce(c1[CAST(i + 1 AS BIGINT):CAST(i + {w} AS BIGINT)],
                     (a, x) -> (a * {_SPAN_B1} + x) % {_SPAN_M}) * 2147483648
       + list_reduce(c2[CAST(i + 1 AS BIGINT):CAST(i + {w} AS BIGINT)],
                     (a, x) -> (a * {_SPAN_B2} + x) % {_SPAN_M}) AS wh
  FROM codes, unnest(range(0, CAST(n - {w} + 1 AS BIGINT))) AS r(i)
  WHERE n >= {w}
), firsts AS (
  SELECT wh, COUNT(*) AS n_occ, MIN(ROW(doc_id, pos)) AS fo
  FROM occ GROUP BY wh
), dup AS (
  SELECT o.doc_id, o.pos
  FROM occ o JOIN firsts f USING (wh)
  WHERE f.n_occ > 1 AND ROW(o.doc_id, o.pos) <> f.fo
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN LAG(pos) OVER w_doc IS NULL
                   OR pos - LAG(pos) OVER w_doc > {w}
              THEN 1 ELSE 0 END AS ns
  FROM dup WINDOW w_doc AS (PARTITION BY doc_id ORDER BY pos)
), sp AS (
  SELECT doc_id, pos,
         SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM isl
), spans AS (
  SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + {w} AS e
  FROM sp GROUP BY doc_id, span_id
)"""


def _span_sql(w: int = _SPAN_W) -> str:
    return (
        _span_ctes(w)
        + """
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(e - s) AS BIGINT) AS dup_tokens,
       CAST(MAX(e - s) AS BIGINT) AS max_span_tokens
FROM spans GROUP BY doc_id
"""
    )


def _cut_sql(w: int = _SPAN_W) -> str:
    # DuckDB reconstructs per-position (NOT EXISTS containment probe —
    # fine at oracle scale; the Spark plan uses the linear gap-slice
    # form instead) and must LEFT JOIN back from toks so fully-cut and
    # untouched docs both still emit a row.
    return (
        _span_ctes(w)
        + """, posz AS (
  SELECT t.doc_id, CAST(i AS INTEGER) AS pos, t.t[CAST(i + 1 AS BIGINT)] AS tok
  FROM toks t, unnest(range(0, CAST(len(t.t) AS BIGINT))) AS r(i)
), agg AS (
  SELECT p.doc_id,
         string_agg(p.tok, ' ' ORDER BY p.pos) AS text_clean,
         COUNT(*) AS n_kept
  FROM posz p
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = p.doc_id
                      AND p.pos >= s.s AND p.pos < s.e)
  GROUP BY p.doc_id
)
SELECT t.doc_id,
       COALESCE(a.text_clean, '') AS text_clean,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(t.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_cut
FROM toks t LEFT JOIN agg a USING (doc_id)
"""
    )


QUERIES_MIX = {
    "block_dedup_stats": q_block_dedup_stats,
    "lang_mixture_sample": q_lang_mixture_sample,
}

ORACLES_MIX = {
    "block_dedup_stats": _BLOCK_SQL,
    "lang_mixture_sample": _mixture_sql(),
}

_BPE_TOP_PAIRS = 20


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training round as an oracle-able query: top-20
    adjacent character pairs by corpus word-frequency weight (the exact
    argmax surface train_bpe iterates on).  The iterative trainer
    itself (plans/bpe.py) is pinned by pytest against an independent
    Python reference; this anchors the family in the DuckDB gate."""
    from .bpe import _adjacent_pairs, word_weights

    wc = word_weights(_docs(spark, sf_dir)).select(
        "weight", F.split(F.col("word"), "").alias("seq")
    )
    return (
        wc.select("weight", F.explode(_adjacent_pairs(F.col("seq"))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("weight").alias("w"))
        .orderBy(F.desc("w"), F.asc("a"), F.asc("b"))
        .limit(_BPE_TOP_PAIRS)
    )


_BPE_PAIRS_SQL = f"""
WITH words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS weight
  FROM (
    SELECT unnest(regexp_split_to_array(lower(TRIM(text)), '\\s+')) AS word
    FROM documents
  )
  WHERE word <> ''
  GROUP BY word
), pairs AS (
  SELECT substring(word, CAST(i AS INTEGER), 1) AS a,
         substring(word, CAST(i AS INTEGER) + 1, 1) AS b,
         weight
  FROM words, unnest(range(1, CAST(length(word) AS BIGINT))) AS r(i)
)
SELECT a, b, CAST(SUM(weight) AS BIGINT) AS w
FROM pairs GROUP BY a, b
ORDER BY w DESC, a ASC, b ASC
LIMIT {_BPE_TOP_PAIRS}
"""


# static parameter merge list for the oracle-checked encode query: the
# merge list is a PARAMETER of the encode operator (the learned list is
# corpus-dependent and so inexpressible in a static oracle; the learned
# path is parity-pinned by tests/test_bpe.py against the driver-side
# reference encoder).  Multi-char chaining (t+h -> th+e) is exercised.
_ENCODE_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("an", "d"),
    ("o", "r"),
    ("r", "e"),
]


def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE ENCODE — the other half of the tokenizer loop
    (train_bpe learns merges; this applies them to every doc as one
    zero-shuffle JVM projection).  Output: (doc_id, tokens, n_tokens)
    with the full ordered token sequence per document."""
    from .bpe import encode_corpus

    return encode_corpus(_docs(spark, sf_dir), _ENCODE_MERGES, engine="fold")


def _encode_sql(merges=tuple(_ENCODE_MERGES)) -> str:
    """DuckDB mirror of the left-to-right non-overlapping merge fold.

    DuckDB 1.0's list_reduce takes no initial accumulator, so the fold
    is expressed per merge round as gaps-and-islands over the exploded
    symbol positions: a position is a merge head iff it starts a pair
    (a, b) and an EVEN number of consecutive pair-starts immediately
    precede it (sel[i] = cand[i] AND NOT sel[i-1] has that closed form;
    runs of consecutive candidates only arise when a == b), and the
    following position is consumed.  One static CTE block per merge."""
    from .bpe import _MAX_BPE_WORD_CHARS

    sql = f"""
WITH w0 AS (
  SELECT doc_id, i AS widx,
         CASE WHEN length(t[i + 1]) <= {_MAX_BPE_WORD_CHARS}
              THEN regexp_split_to_array(t[i + 1], '')
              ELSE [t[i + 1]] END AS seq
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(TRIM(text)), '\\s+'),
                           x -> x != '') AS t
        FROM documents),
       unnest(range(0, len(t))) AS r(i)
)"""
    k = 0
    for a, b in merges:
        k += 1
        sql += f"""
, p{k} AS (
  SELECT doc_id, widx, i, seq[i + 1] AS sym,
         (i + 2 <= len(seq) AND seq[i + 1] = '{a}' AND seq[i + 2] = '{b}')
           AS cand
  FROM w{k - 1}, unnest(range(0, len(seq))) AS r(i)
), g{k} AS (
  SELECT *, CASE WHEN cand THEN i - ROW_NUMBER()
                OVER (PARTITION BY doc_id, widx, cand ORDER BY i) END AS grp
  FROM p{k}
), s{k} AS (
  SELECT *, cand AND ROW_NUMBER()
                OVER (PARTITION BY doc_id, widx, grp ORDER BY i) % 2 = 1
            AS selected
  FROM g{k}
), c{k} AS (
  SELECT *, COALESCE(LAG(selected) OVER (PARTITION BY doc_id, widx ORDER BY i),
                     FALSE) AS consumed
  FROM s{k}
), w{k} AS (
  SELECT doc_id, widx,
         list(CASE WHEN selected THEN '{a + b}' ELSE sym END ORDER BY i) AS seq
  FROM c{k} WHERE NOT consumed
  GROUP BY doc_id, widx
)"""
    sql += f"""
, flat AS (
  SELECT doc_id, widx, i, seq[i + 1] AS tok
  FROM w{k}, unnest(range(0, len(seq))) AS r(i)
), agg AS (
  SELECT doc_id, list(tok ORDER BY widx, i) AS tokens
  FROM flat GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.tokens, CAST([] AS VARCHAR[])) AS tokens,
       CAST(COALESCE(len(a.tokens), 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
    return sql


def q_bpe_vocab_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-usage rollup over the ENCODED corpus — the tokenizer
    health check every vocab build runs (token frequency distribution,
    document frequency, token length for corpus-fertility math).
    Completes the BPE loop's analytics tail: train (bpe_pair_counts /
    plans/bpe.py) -> encode (bpe_encode_corpus) -> THIS.

    Scale shape: the zero-shuffle encode projection -> one explode ->
    a two-level hashAggregate keyed by token (key cardinality ==
    vocabulary size, so partial-agg buffers are tiny and the final
    shuffle moves ~|vocab| rows regardless of corpus size); the exact
    doc-frequency needs the (token, doc_id) pre-distinct, also keyed by
    token."""
    from .bpe import encode_corpus

    from pyspark import StorageLevel

    # persist barrier between the fold and the Generate: exploding the
    # tokens column (or an index array over it) lets alias substitution
    # copy the whole 8-merge fold into the Generate + its inferred
    # filter — measured 481 (direct) / 801 (index-explode) lambda nodes
    # in the physical plan vs the fold's own 160, i.e. the encode ran
    # 3-5x.  The barrier is the winnow-explode recipe: the fold runs
    # exactly once, the rollup reads cached rows.
    enc = encode_corpus(
        _docs(spark, sf_dir), _ENCODE_MERGES, engine="fold"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    occ = enc.select("doc_id", F.explode("tokens").alias("token"))
    # (token, doc_id) partial agg instead of COUNT(DISTINCT …): the
    # distinct would plan an Expand (2x the exploded stream); two
    # map-side-combinable hashAggregates move ~|vocab| rows instead
    per_doc = occ.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    return per_doc.groupBy("token").agg(
        F.sum("c").cast("long").alias("n_occ"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.first(F.length("token")).cast("long").alias("token_chars"),
    )


def _vocab_usage_sql() -> str:
    return f"""
SELECT tok AS token,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(LENGTH(tok) AS BIGINT) AS token_chars
FROM (
  SELECT e.doc_id, unnest(e.tokens) AS tok
  FROM ({_encode_sql()}) e
) u
GROUP BY tok
"""


# --- vocabulary coverage curve (how big a vocab do you actually need) -----------------------
#
# The decision chart behind every vocab-size choice: rank tokens by
# frequency (explicit token tie-break, the cross-engine rank rule) and
# report the cumulative share of the token STREAM covered at each
# power-of-two rank (+ the final rank, so the curve visibly ends at
# 1000 mille).  Same persist-barriered encode as bpe_vocab_usage (the
# Generate-copies hazard); the ranking window's input is |vocab| rows —
# a model-sized table, not a corpus-sized one — which is the same
# bounded-window argument nb_model makes.


def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vrank, token, n_occ, cum_occ, cum_mille) at power-of-two ranks:
    cumulative token-stream coverage by vocabulary rank."""
    from pyspark.sql import Window

    from .bpe import encode_corpus

    enc = encode_corpus(
        _docs(spark, sf_dir), _ENCODE_MERGES, engine="fold"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts = (
        enc.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    w = Window.orderBy(F.desc("n_occ"), F.asc("token"))
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tot = Window.partitionBy()
    return (
        counts.withColumn("vrank", F.row_number().over(w).cast("long"))
        .withColumn("cum_occ", F.sum("n_occ").over(w_cum).cast("long"))
        .withColumn("_tot", F.sum("n_occ").over(w_tot))
        .withColumn("_nv", F.count(F.lit(1)).over(w_tot))
        .where(F.expr("(vrank & (vrank - 1)) = 0 OR vrank = _nv"))
        .select(
            "vrank",
            "token",
            "n_occ",
            "cum_occ",
            F.expr("CAST((cum_occ * 1000) DIV _tot AS BIGINT)").alias("cum_mille"),
        )
    )


def _coverage_sql() -> str:
    return f"""
WITH enc AS ({_encode_sql()}),
occ AS (SELECT unnest(tokens) AS token FROM enc),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occ FROM occ GROUP BY token
), ranked AS (
  SELECT token, n_occ,
         CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, token) AS BIGINT) AS vrank,
         CAST(SUM(n_occ) OVER (ORDER BY n_occ DESC, token
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_occ,
         CAST(SUM(n_occ) OVER () AS BIGINT) AS tot,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_vocab
  FROM counts
)
SELECT vrank, token, n_occ, cum_occ,
       CAST((cum_occ * 1000) // tot AS BIGINT) AS cum_mille
FROM ranked
WHERE (vrank & (vrank - 1)) = 0 OR vrank = n_vocab
"""


# --- CCNet-style corpus-level paragraph dedup ---------------------------------------------

# Wenzek et al. 2020 (CCNet): the dedup unit is the PARAGRAPH —
# normalize each newline-separated paragraph, hash it, and keep exactly
# one occurrence per distinct hash across the WHOLE corpus (the
# canonical = lowest (doc_id, pos) occurrence).  Complements
# block_dedup_stats (fixed 20-token windows, alignment-free) and
# c4_line_filter (within-doc heuristics): this is the cross-document
# boilerplate-paragraph killer CCNet actually ships.


def paragraph_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, line, h): every non-empty paragraph of every doc
    with its normalized-content md5, in document order.  Pure stateless
    per-row ops + one explode — safe for BOTH batch and streaming
    inputs (streaming/paragraph_dedup_stream.py consumes it with a
    dropDuplicates instead of the batch aggs)."""
    raw = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "raw")
    )
    norm = F.regexp_replace(F.lower(F.trim("raw")), r"\s+", " ")
    return (
        raw.select(
            "doc_id",
            "pos",
            F.trim("raw").alias("line"),
            norm.alias("nrm"),
        )
        .where(F.col("nrm") != "")
        .select("doc_id", "pos", "line", F.md5("nrm").alias("h"))
    )


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, n_paragraphs, n_dup_paragraphs, clean_text): corpus-wide
    paragraph dedup with reassembled surviving text.

    Scale shape: one explode (a paragraph row per newline split), md5 on
    the normalized paragraph, then two map-side-combinable hash aggs —
    min(doc_id) per hash and min(pos) per (hash, doc) — joined back on
    their own grouping keys (co-partitioned equi-joins; a boilerplate
    mega-hash skews the d0 join-back, which AQE's skew-join splits, and
    each line still matches exactly one agg row so there is no pair
    fan-out).  Reassembly is a per-doc sort of surviving paragraphs —
    bounded by document length, never cross-doc."""
    lines = paragraph_occurrences(docs).persist(
        StorageLevel.MEMORY_AND_DISK  # 4 consumers: 2 aggs, join, counts
    )
    first_doc = lines.groupBy("h").agg(F.min("doc_id").alias("d0"))
    first_pos = lines.groupBy("h", "doc_id").agg(F.min("pos").alias("p0"))
    keep = (
        lines.join(first_doc, "h")
        .join(first_pos, ["h", "doc_id"])
        .where((F.col("doc_id") == F.col("d0")) & (F.col("pos") == F.col("p0")))
    )
    cnt = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paragraphs")
    )
    kept = keep.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_keep"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
    )
    return (
        docs.select("doc_id")
        .join(cnt, "doc_id", "left")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_paragraphs", F.lit(0))
            .cast("long")
            .alias("n_paragraphs"),
            (F.coalesce("n_paragraphs", F.lit(0)) - F.coalesce("n_keep", F.lit(0)))
            .cast("long")
            .alias("n_dup_paragraphs"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return paragraph_dedup(_docs(spark, sf_dir))


_PARAGRAPH_DEDUP_SQL = r"""
WITH parts AS (
  SELECT doc_id, string_split(text, chr(10)) AS ps FROM documents
), lines0 AS (
  SELECT doc_id, i AS pos, TRIM(ps[i + 1]) AS line,
         regexp_replace(lower(TRIM(ps[i + 1])), '\s+', ' ', 'g') AS nrm
  FROM parts, unnest(range(0, len(ps))) AS r(i)
), lines AS (
  SELECT doc_id, pos, line, md5(nrm) AS h FROM lines0 WHERE nrm != ''
), d0 AS (
  SELECT h, MIN(doc_id) AS d0 FROM lines GROUP BY h
), p0 AS (
  SELECT h, doc_id, MIN(pos) AS p0 FROM lines GROUP BY h, doc_id
), keep AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l JOIN d0 USING (h) JOIN p0 USING (h, doc_id)
  WHERE l.doc_id = d0.d0 AND l.pos = p0.p0
), cnt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paragraphs
  FROM lines GROUP BY doc_id
), ka AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_keep,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM keep GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(c.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,
       CAST(COALESCE(c.n_paragraphs, 0) - COALESCE(k.n_keep, 0) AS BIGINT)
         AS n_dup_paragraphs,
       COALESCE(k.clean_text, '') AS clean_text
FROM documents d
LEFT JOIN cnt c USING (doc_id)
LEFT JOIN ka k USING (doc_id)
"""


# --- token-budget mixture (water-filling across sources) ----------------------------------

# Budget-constrained corpus mixing (the Pile/Dolma composition problem):
# given a total character budget T, allocate it across sources by
# WATER-FILLING — small sources ship whole, large sources are capped at
# a common level λ chosen so the allocations sum to (just under) T:
#
#     quota_s = min(n_s, λ),   λ = max level with Σ_s min(n_s, λ) <= T
#
# the allocation that maximizes the minimum per-source share, i.e. the
# most source-diverse corpus the budget admits.  λ has a closed form
# over the ASCENDING source-size order: with cum_k the running sum and
# m sources, the largest k where cum_k + (m-k)·n_k <= T marks the last
# whole-shipped source, and λ = (T - cum_k) DIV (m - k) spreads the
# remainder over the capped tail.  All integer arithmetic, mirrored
# verbatim in the oracle.
#
# Doc-level application is the repo's deterministic coin: keep iff
# prefix · n_s < 65536 · quota_s (expected kept chars per source
# ≈ quota_s; uncapped sources keep everything — the inequality is
# vacuously true).  DECIMAL cross-mult for headroom at 10^14+ chars
# per source (the lang_mixture recipe).
#
# Scale shape: one tiny groupBy(source) aggregate; ranking/cumsum
# windows run over the PER-SOURCE frame (|sources| rows — thousands at
# worst, one task), never over docs; the plan broadcasts back over the
# scan.  Zero doc-level windows, zero extra shuffles.
_BUDGET_DIV = 4  # ship a quarter of the corpus mass


def token_budget_mixture(
    docs: DataFrame, budget_div: int = _BUDGET_DIV
) -> DataFrame:
    """(doc_id, source, src_chars, quota_chars, is_kept) — water-filled
    character-budget mixture over sources with T = total DIV
    ``budget_div``.  See the block comment for the allocation math;
    src/quota ride along so the allocation itself is oracle-checked,
    not just the verdicts."""
    from decimal import Decimal

    from pyspark.sql import Window

    if budget_div < 1:
        raise ValueError(f"budget_div must be >= 1, got {budget_div}")
    src = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("src_chars")
    )
    tot = src.agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.expr(f"CAST(SUM(src_chars) DIV {budget_div} AS BIGINT)").alias(
            "_t"
        ),
    )
    w = Window.orderBy("src_chars", "source")
    ranked = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("_k", F.row_number().over(w).cast("long"))
        .withColumn(
            "_cum",
            F.sum("src_chars")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    feas = ranked.where(
        F.col("_cum") + (F.col("_m") - F.col("_k")) * F.col("src_chars")
        <= F.col("_t")
    )
    sel = feas.agg(F.max(F.struct("_k", "_cum")).alias("_s")).select(
        F.coalesce(F.col("_s._k"), F.lit(0)).alias("_kstar"),
        F.coalesce(F.col("_s._cum"), F.lit(0)).alias("_cumstar"),
    )
    plan = (
        ranked.crossJoin(F.broadcast(sel))
        .withColumn(
            "_lam",
            F.when(
                F.col("_kstar") < F.col("_m"),
                F.expr("(_t - _cumstar) DIV (_m - _kstar)"),
            ),  # _kstar == _m (budget covers everything): NULL = no cap
        )
        .select(
            "source",
            "src_chars",
            F.when(
                F.col("_lam").isNull() | (F.col("src_chars") <= F.col("_lam")),
                F.col("src_chars"),
            )
            .otherwise(F.col("_lam"))
            .cast("long")
            .alias("quota_chars"),
        )
    )
    p = _md5_prefix_val(F.col("doc_id")).cast("decimal(5,0)")
    lhs = p.cast("decimal(20,0)") * F.col("src_chars").cast("decimal(17,0)")
    rhs = F.lit(Decimal(65536)).cast("decimal(20,0)") * F.col(
        "quota_chars"
    ).cast("decimal(17,0)")
    return docs.join(F.broadcast(plan), "source").select(
        "doc_id",
        "source",
        "src_chars",
        "quota_chars",
        (lhs < rhs).alias("is_kept"),
    )


def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_mixture(_docs(spark, sf_dir))


_BUDGET_SQL = f"""
WITH src AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS src_chars
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(src_chars) // {_BUDGET_DIV} AS BIGINT) AS t
  FROM src
), ranked AS (
  SELECT source, src_chars,
         CAST(ROW_NUMBER() OVER (ORDER BY src_chars, source) AS BIGINT) AS k,
         CAST(SUM(src_chars) OVER (ORDER BY src_chars, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM src
), sel AS (
  SELECT CAST(COALESCE(MAX(k), 0) AS BIGINT) AS kstar,
         CAST(COALESCE(arg_max(cum, k), 0) AS BIGINT) AS cumstar
  FROM ranked, tot WHERE cum + (m - k) * src_chars <= t
), lam AS (
  SELECT CASE WHEN kstar < m
              THEN CAST((t - cumstar) // (m - kstar) AS BIGINT)
              END AS lam
  FROM sel, tot
), plan AS (
  SELECT source, src_chars,
         CAST(CASE WHEN lam IS NULL OR src_chars <= lam
                   THEN src_chars ELSE lam END AS BIGINT) AS quota_chars
  FROM ranked, lam
)
SELECT d.doc_id, d.source, p.src_chars, p.quota_chars,
       {_md5_prefix_sql("md5(CAST(d.doc_id AS VARCHAR))")} * p.src_chars
         < 65536 * p.quota_chars AS is_kept
FROM documents d JOIN plan p USING (source)
"""


# --- corpus snapshot delta (recrawl diff) -------------------------------------------------

# Incremental corpus updates (CommonCrawl-style snapshots) start with a
# diff: which docs were added, removed, or changed between crawl A and
# crawl B?  The two snapshots are synthesized deterministically from the
# one test corpus: A drops doc_id % 11 == 0 (so B has additions), B
# drops doc_id % 7 == 0 (removals) and rewrites the text of doc_id % 5
# == 0 (changes).  Comparison is by content md5, never by text equality
# on the join — at 100 TB the diff join carries (doc_id, 16-byte hash),
# not document bytes, and a co-partitioned full outer join on doc_id is
# one shuffle of hashes on each side (or zero with both snapshots
# bucketed by doc_id at write time, the layout write_sharded already
# produces).  Unchanged docs are filtered OUT before any wide operator.
_DELTA_A_DROP = 11
_DELTA_B_DROP = 7
_DELTA_B_EDIT = 5


def corpus_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, status): 'added' | 'removed' | 'changed' between two
    snapshot frames of (doc_id, text).  Unchanged docs emit no row."""
    a = old.select("doc_id", F.md5("text").alias("h_old"))
    b = new.select("doc_id", F.md5("text").alias("h_new"))
    joined = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
    )
    return (
        joined.select("doc_id", status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def _delta_snapshots(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    old = docs.where(F.col("doc_id") % _DELTA_A_DROP != 0).select(
        "doc_id", "text"
    )
    edited = F.when(
        F.col("doc_id") % _DELTA_B_EDIT == 0,
        F.concat(F.col("text"), F.lit(" [rev2]")),
    ).otherwise(F.col("text"))
    new = docs.where(F.col("doc_id") % _DELTA_B_DROP != 0).select(
        "doc_id", edited.alias("text")
    )
    return old, new


def q_corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _delta_snapshots(_docs(spark, sf_dir))
    return corpus_delta(old, new)


_DELTA_SQL = f"""
WITH old AS (
  SELECT doc_id, md5(text) AS h_old FROM documents
  WHERE doc_id % {_DELTA_A_DROP} != 0
), new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {_DELTA_B_EDIT} = 0
                  THEN text || ' [rev2]' ELSE text END) AS h_new
  FROM documents WHERE doc_id % {_DELTA_B_DROP} != 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.h_old IS NULL THEN 'added'
            WHEN n.h_new IS NULL THEN 'removed'
            WHEN o.h_old != n.h_new THEN 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
WHERE CASE WHEN o.h_old IS NULL THEN 'added'
           WHEN n.h_new IS NULL THEN 'removed'
           WHEN o.h_old != n.h_new THEN 'changed' END IS NOT NULL
"""


# --- tokenizer fertility (chars per token, per source) --------------------------------------
#
# The standard tokenizer-evaluation rollup: how many characters does
# one token buy on each source?  Low fertility on a source means the
# learned merges don't fit its text (wrong domain, wrong language,
# gibberish) — the number teams watch when deciding whether to retrain
# the tokenizer as the corpus mix shifts.  Consumes encode_corpus's
# n_tokens SCALAR only (no explode of the fold-built token array, so
# the bpe_vocab_usage Generate-copies hazard never arises); one
# equi-join + one per-source agg.


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .bpe import encode_corpus

    docs = _docs(spark, sf_dir)
    enc = encode_corpus(docs, _ENCODE_MERGES, engine="fold").select(
        "doc_id", "n_tokens"
    )
    joined = docs.select(
        "doc_id", "source", F.length("text").cast("long").alias("n_chars_t")
    ).join(enc, "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars_t").cast("long").alias("total_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            "total_tokens",
            F.when(F.col("total_tokens") == 0, F.lit(0))
            .otherwise(F.expr("(total_chars * 1000) DIV total_tokens"))
            .cast("long")
            .alias("fertility_milli"),
        )
    )


def _fertility_sql() -> str:
    return f"""
WITH enc AS ({_encode_sql()}),
d AS (
  SELECT doc_id, source, CAST(LENGTH(text) AS BIGINT) AS n_chars_t
  FROM documents
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars_t) AS BIGINT) AS total_chars,
       CAST(SUM(enc.n_tokens) AS BIGINT) AS total_tokens,
       CAST(CASE WHEN SUM(enc.n_tokens) = 0 THEN 0
                 ELSE (CAST(SUM(d.n_chars_t) AS BIGINT) * 1000)
                      // CAST(SUM(enc.n_tokens) AS BIGINT) END AS BIGINT)
         AS fertility_milli
FROM d JOIN enc USING (doc_id)
GROUP BY d.source
"""


EXTRA_QUERIES_MIX = {
    "corpus_delta": q_corpus_delta,  # recrawl snapshot diff
    "shard_manifest": q_shard_manifest,
    "lang_mixture_sample_a75": q_lang_mixture_sample_a75,  # temperature knob
    "bpe_pair_counts": q_bpe_pair_counts,  # BPE round-1 argmax surface
    "bpe_encode_corpus": q_bpe_encode_corpus,  # merge-list application
    "bpe_vocab_usage": q_bpe_vocab_usage,  # encoded-corpus vocab rollup
    "exact_substr_spans": q_exact_substr_spans,  # stride-1 ExactSubstr spans
    "exact_substr_cut": q_exact_substr_cut,  # the span CUT pass (cleaned text)
    "paragraph_dedup": q_paragraph_dedup,  # CCNet corpus-level paragraph dedup
    "token_budget_mixture": q_token_budget_mixture,  # water-filled char budget
    "bpe_fertility": q_bpe_fertility,  # chars/token per source
    "vocab_coverage_curve": q_vocab_coverage_curve,  # vocab-size decision chart
}
EXTRA_ORACLES_MIX = {
    "corpus_delta": _DELTA_SQL,
    "shard_manifest": _manifest_sql(),
    "lang_mixture_sample_a75": _mixture_sql(0.75),
    "bpe_pair_counts": _BPE_PAIRS_SQL,
    "bpe_encode_corpus": _encode_sql(),
    "bpe_vocab_usage": _vocab_usage_sql(),
    "exact_substr_spans": _span_sql(),
    "exact_substr_cut": _cut_sql(),
    "paragraph_dedup": _PARAGRAPH_DEDUP_SQL,
    "token_budget_mixture": _BUDGET_SQL,
    "bpe_fertility": _fertility_sql(),
    "vocab_coverage_curve": _coverage_sql(),
}
