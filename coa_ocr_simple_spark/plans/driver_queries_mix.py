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


EXTRA_QUERIES_MIX = {
    "shard_manifest": q_shard_manifest,
    "lang_mixture_sample_a75": q_lang_mixture_sample_a75,  # temperature knob
    "bpe_pair_counts": q_bpe_pair_counts,  # BPE round-1 argmax surface
    "bpe_encode_corpus": q_bpe_encode_corpus,  # merge-list application
}
EXTRA_ORACLES_MIX = {
    "shard_manifest": _manifest_sql(),
    "lang_mixture_sample_a75": _mixture_sql(0.75),
    "bpe_pair_counts": _BPE_PAIRS_SQL,
    "bpe_encode_corpus": _encode_sql(),
}
