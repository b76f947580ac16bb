"""Sketch operators over the documents corpus: HyperLogLog distinct
estimation, Bloom-filter membership (decontamination probe), Count-Min
frequency estimation.

These are the streaming/mergeable summaries a 100-TB pipeline reaches
for when the exact form stops fitting: a distinct-token count whose
state is 256 integers per source instead of a distinct shuffle of every
token; a membership filter over 10^12 training paragraphs that
broadcasts as a bit array instead of joining the full gram table; a
frequency table in O(d*w) counters instead of O(|vocab|).  No reference
counterpart (net-new training-data-pipeline family, same class as the
dedup/ANN waves).

Cross-engine determinism: every hash is an md5 hex slice turned into an
integer by the shared ``_hex_int_val`` / ``_hex_int_sql`` recipe, every
power of two is an integer left shift (DuckDB errors above ``<< 62``;
all shifts here are <= 40), and the one real-valued constant (the HLL
alpha bias correction) is frozen as a parts-per-million integer literal
so both engines compute bit-identical estimates.  The estimates are
therefore oracle-checked EXACTLY — including the sketches' deliberate
approximation error, which tests then bound against the exact answers.

All three operators are pure JVM-side column expressions (md5 + integer
arithmetic): no UDFs, no driver-side collects, map-side-combinable
aggregates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import _docs
from .driver_queries_mix import _hex_int_sql, _hex_int_val

# --- HyperLogLog distinct-token estimate ----------------------------------------

# m = 2^8 registers from the first 2 md5 hex digits; the next 15 digits
# form a 60-bit value whose leading-zero count feeds the register.  The
# register max is clamped at 40 so 2^(40 - r) stays an exact BIGINT term
# (the clamp fires with probability ~m * 2^-40 — never at any corpus
# size this engine will see, and identically in both engines if it did).
_HLL_M = 256
_HLL_RMAX = 40
# alpha_256 = 0.7213 / (1 + 1.079/256), frozen in parts-per-million so
# the bias-corrected estimate is integer arithmetic end to end
_HLL_ALPHA_PPM = 718272
_HLL_NUM = _HLL_M * _HLL_M * (1 << _HLL_RMAX)  # m^2 * 2^40 = 2^56

# small-range (linear-counting) correction: when the raw estimate is
# below 2.5m and zero registers remain, the standard algorithm switches
# to E = m * ln(m / V).  V has only m possible values, so ln needs no
# floats in either engine: a 256-entry table of round(ln(m/V) * 10^6),
# frozen at import time, indexed by V (1-based, matching element_at /
# DuckDB list indexing).
import math as _math

_HLL_LIN_THRESHOLD = 5 * _HLL_M // 2  # 2.5 m
_HLL_LN_PPM = tuple(
    int(round(_math.log(_HLL_M / v) * 1_000_000)) for v in range(1, _HLL_M + 1)
)


def hll_registers_for(keyed_values: DataFrame) -> DataFrame:
    """(source, reg, r) from any (source, term) frame: the generic
    register builder — hash each term, take max rho per (key, register).
    One map-side-combinable aggregate; the shuffle carries at most 256
    rows per key regardless of input size."""
    h = F.md5("term")
    hashed = keyed_values.select(
        "source",
        _hex_int_val(h, 1, 2).alias("reg"),
        _hex_int_val(h, 3, 15).alias("v"),  # 60-bit hash value
    )
    # length(bin(v)) = floor(log2(v)) + 1 for v > 0, so rho (leading
    # zeros of the 60-bit field + 1) = 61 - bitlen; bin(0) = '0' needs
    # the explicit branch
    rho = F.when(F.col("v") == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin("v"))
    )
    return (
        hashed.select(
            "source",
            "reg",
            F.least(rho, F.lit(_HLL_RMAX)).cast("long").alias("r"),
        )
        .groupBy("source", "reg")
        .agg(F.max("r").alias("r"))
    )


def hll_register_partials(docs: DataFrame) -> DataFrame:
    """(source, reg, r): max-merged HyperLogLog registers over the
    per-source token sets — the mergeable sketch state.  At most 256
    rows per source after the partial agg on every map task, so the
    shuffle carries O(sources * 256) rows regardless of corpus size
    (the whole point vs COUNT(DISTINCT), whose shuffle carries every
    distinct token).  Registers merge by max(): union partials from any
    corpus split — shards, micro-batches, restarts — re-max, and the
    estimate is identical to the single-pass batch answer (pinned by
    tests/test_sketch_stream.py)."""
    return hll_registers_for(
        docs.select(
            "source",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term"),
        )
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(source, m_registers, n_zero_registers, est_distinct) from a
    register table of (source, reg, r) rows — already max-merged per
    (source, reg), e.g. the output of :func:`hll_register_partials`.

    est = alpha_m * m^2 / sum_j 2^-M_j, all integer: terms are
    2^(RMAX - r), absent registers contribute 2^RMAX, the numerator
    m^2 * 2^RMAX = 2^56 fits BIGINT, and alpha is applied as
    (raw * ALPHA_PPM) DIV 10^6 (overflow-safe below ~9*10^12 distinct —
    far above any per-source vocabulary).  Below 2.5m the standard
    linear-counting branch takes over — E = m * ln(m / V) — and stays
    integer-exact because V (the zero-register count) has only 256
    possible values: ln comes from a frozen PPM table, a single
    ArrayType literal in both engines (one Literal node, not 256 —
    the Catalyst expression-size lesson from the PQ codebooks).
    """
    per_src = regs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(F.expr(f"shiftleft(1L, CAST({_HLL_RMAX} - r AS INT))"))
        .cast("long")
        .alias("s_present"),
    ).select(
        "source",
        "n_regs",
        (
            F.col("s_present")
            + (F.lit(_HLL_M) - F.col("n_regs")) * F.lit(1 << _HLL_RMAX)
        ).alias("s_total"),
    )
    raw = per_src.select(
        "source",
        (F.lit(_HLL_M) - F.col("n_regs")).cast("long").alias("v_zero"),
        F.expr(
            f"CAST((CAST({_HLL_NUM} AS BIGINT) DIV s_total) "
            f"* {_HLL_ALPHA_PPM} DIV 1000000 AS BIGINT)"
        ).alias("est_raw"),
    )
    # element_at is 1-based and v_zero = 0 would fault it, so clamp the
    # index; the est branch only reads lin_num when v_zero > 0
    lin = (
        F.lit(_HLL_M)
        * F.element_at(
            F.lit(list(_HLL_LN_PPM)),
            F.greatest(F.col("v_zero"), F.lit(1)).cast("int"),
        )
    ).cast("long")
    est = F.when(
        (F.col("est_raw") < _HLL_LIN_THRESHOLD) & (F.col("v_zero") > 0),
        F.expr("CAST(lin_num DIV 1000000 AS BIGINT)"),
    ).otherwise(F.col("est_raw"))
    return raw.select(
        "source",
        "v_zero",
        "est_raw",
        lin.alias("lin_num"),
    ).select(
        "source",
        F.lit(_HLL_M).cast("long").alias("m_registers"),
        F.col("v_zero").alias("n_zero_registers"),
        est.alias("est_distinct"),
    )


def hll_distinct_terms(docs: DataFrame) -> DataFrame:
    """(source, m_registers, n_zero_registers, est_distinct): per-source
    distinct-token estimate from a 256-register HyperLogLog — the
    single-pass batch composition of :func:`hll_register_partials` (one
    explode + map-side-combinable max agg) and :func:`hll_estimate`."""
    return hll_estimate(hll_register_partials(docs))


def q_hll_distinct_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_distinct_terms(_docs(spark, sf_dir))


def _hll_sql() -> str:
    reg = _hex_int_sql("h", 1, 2)
    v = _hex_int_sql("h", 3, 15)
    return f"""
WITH toks AS (
  SELECT source, md5(t.term) AS h
  FROM documents,
       unnest(regexp_split_to_array(lower(TRIM(text)), '\\s+')) AS t(term)
), rho AS (
  SELECT source, {reg} AS reg,
         LEAST(CASE WHEN {v} = 0 THEN 61
                    ELSE 61 - length(bin({v})) END,
               {_HLL_RMAX}) AS r
  FROM toks
), regs AS (
  SELECT source, reg, MAX(r) AS r FROM rho GROUP BY source, reg
), per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_regs,
         CAST(SUM(CAST(1 AS BIGINT) << CAST({_HLL_RMAX} - r AS INTEGER))
              AS BIGINT) AS s_present
  FROM regs GROUP BY source
), raw AS (
  SELECT source,
         CAST({_HLL_M} - n_regs AS BIGINT) AS v_zero,
         CAST((CAST({_HLL_NUM} AS BIGINT)
               // (s_present + ({_HLL_M} - n_regs) * CAST({1 << _HLL_RMAX} AS BIGINT)))
              * {_HLL_ALPHA_PPM} // 1000000 AS BIGINT) AS est_raw
  FROM per_src
)
SELECT source,
       CAST({_HLL_M} AS BIGINT) AS m_registers,
       v_zero AS n_zero_registers,
       CAST(CASE WHEN est_raw < {_HLL_LIN_THRESHOLD} AND v_zero > 0
                 THEN ({_HLL_M} * ([{", ".join(str(p) for p in _HLL_LN_PPM)}])[v_zero]) // 1000000
                 ELSE est_raw END AS BIGINT) AS est_distinct
FROM raw
"""


# --- Bloom-filter decontamination probe -----------------------------------------

# 2^24 bits in 32-bit words (524288 BIGINT rows, a few MB — explicitly
# broadcast); k = 3 bit positions from three disjoint 32-bit md5 slices.
# At 10^12 training paragraphs the same plan sizes M_BITS up to ~2^36
# (8 GiB of words) before the broadcast strategy needs to change — and
# the bloom build itself stays one map-side-combinable bit_or aggregate.
_BLOOM_BITS = 1 << 24
_BLOOM_K_SLICES = (1, 9, 17)  # md5 hex offsets of the three 32-bit slices


def _paragraph_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h): md5 of each normalized non-empty paragraph —
    the paragraph_dedup normalization (trim, lower, whitespace fold)."""
    raw = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "raw")
    )
    nrm = F.regexp_replace(F.lower(F.trim("raw")), r"\s+", " ")
    return (
        raw.select("doc_id", "pos", nrm.alias("nrm"))
        .where(F.col("nrm") != "")
        .select("doc_id", "pos", F.md5("nrm").alias("h"))
    )


def bloom_decontaminate(docs: DataFrame) -> DataFrame:
    """(doc_id, n_paragraphs, n_flagged): eval docs (doc_id % 10 == 0)
    probed against a Bloom filter of every training-split (doc_id % 10
    != 0) paragraph hash.

    The constant-memory sibling of gram_decontamination: instead of
    joining eval grams against a persisted train-gram table (a shuffle
    proportional to the TRAINING corpus), the training side collapses to
    a 2^24-bit array — one bit_or aggregate, 524288 rows, broadcast —
    and the probe is a broadcast-hash-join of the eval side only.
    False-positive rate at load n/m: (1 - e^(-3n/m))^3 — ~0.1% at the
    bench corpus; deterministic, identical in both engines, and bounded
    by tests against the exact join.  No false negatives by
    construction (test-pinned).
    """
    train = _paragraph_lines(docs.where(F.col("doc_id") % 10 != 0))
    ev = _paragraph_lines(docs.where(F.col("doc_id") % 10 == 0))

    def bits(df: DataFrame) -> DataFrame:
        pos_arr = F.array(
            *[
                (_hex_int_val(F.col("h"), s, 8) % _BLOOM_BITS).cast("long")
                for s in _BLOOM_K_SLICES
            ]
        )
        return df.select(
            "doc_id", "pos", F.explode(pos_arr).alias("b")
        ).select(
            "doc_id",
            "pos",
            F.expr("CAST(b DIV 32 AS BIGINT)").alias("word"),
            F.expr("shiftleft(1L, CAST(b % 32 AS INT))").alias("mask"),
        )

    bloom = (
        bits(train)
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    probe = (
        bits(ev)
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("doc_id", "pos")
        .agg(
            F.min(
                F.when(
                    F.col("bits").bitwiseAND(F.col("mask")) != 0, F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("hit")
        )
    )
    per_doc = probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paragraphs"),
        F.sum("hit").cast("long").alias("n_flagged"),
    )
    ev_docs = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    return ev_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_paragraphs", F.lit(0)).cast("long").alias("n_paragraphs"),
        F.coalesce("n_flagged", F.lit(0)).cast("long").alias("n_flagged"),
    )


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_decontaminate(_docs(spark, sf_dir))


def _bloom_bits_sql(src: str) -> str:
    """CTE body: (doc_id, pos, word, mask) probe rows for split `src`."""
    slices = ", ".join(
        f"({_hex_int_sql('h', s, 8)} % {_BLOOM_BITS})" for s in _BLOOM_K_SLICES
    )
    return f"""
  SELECT doc_id, pos,
         CAST(b // 32 AS BIGINT) AS word,
         CAST(1 AS BIGINT) << CAST(b % 32 AS INTEGER) AS mask
  FROM (
    SELECT doc_id, pos, unnest([{slices}]) AS b
    FROM {src}
  )"""


def _bloom_sql() -> str:
    return f"""
WITH parts AS (
  SELECT doc_id, string_split(text, chr(10)) AS ps FROM documents
), lines0 AS (
  SELECT doc_id, i AS pos,
         regexp_replace(lower(TRIM(ps[i + 1])), '\\s+', ' ', 'g') AS nrm
  FROM parts, unnest(range(0, len(ps))) AS r(i)
), lines AS (
  SELECT doc_id, pos, md5(nrm) AS h FROM lines0 WHERE nrm != ''
), train AS (
  SELECT doc_id, pos, h FROM lines WHERE doc_id % 10 != 0
), ev AS (
  SELECT doc_id, pos, h FROM lines WHERE doc_id % 10 = 0
), train_bits AS ({_bloom_bits_sql("train")}
), ev_bits AS ({_bloom_bits_sql("ev")}
), bloom AS (
  SELECT word, bit_or(mask) AS bits FROM train_bits GROUP BY word
), probe AS (
  SELECT e.doc_id, e.pos,
         MIN(CASE WHEN (b.bits & e.mask) != 0 THEN 1 ELSE 0 END) AS hit
  FROM ev_bits e LEFT JOIN bloom b USING (word)
  GROUP BY e.doc_id, e.pos
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paragraphs,
         CAST(SUM(hit) AS BIGINT) AS n_flagged
  FROM probe GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,
       CAST(COALESCE(p.n_flagged, 0) AS BIGINT) AS n_flagged
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
LEFT JOIN per_doc p USING (doc_id)
"""


# --- Count-Min term-frequency estimate -------------------------------------------

# d = 4 counter rows of w = 2^14 columns; the four column indexes are
# the four disjoint 32-bit slices of md5(term).  The probe dictionary is
# the distinct vocabulary of a deterministic thin doc slice — bounded
# output at any corpus size.  exact_count rides along as the committed
# accuracy evidence (CMS never underestimates; tests bound the
# overestimate) — a 100-TB run drops that column, it is the one part of
# the plan that isn't sketch-sized.
_CMS_D = 4
_CMS_W = 1 << 14
_CMS_PROBE_MOD = 100  # probe vocabulary: terms of docs with doc_id % 100 == 7
_CMS_PROBE_RES = 7


def _cms_planes():
    """The d (j, c) sketch cells of the `term` column in scope —
    shared by the grid build, the probe estimate, and the streaming
    twin (streaming/cms_stream.py)."""
    h = F.md5("term")
    return F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                (_hex_int_val(h, 1 + 8 * j, 8) % _CMS_W).cast("long").alias("c"),
            )
            for j in range(_CMS_D)
        ]
    )


def cms_grid_partials(docs: DataFrame) -> DataFrame:
    """(j, c, cnt): the Count-Min grid of a document set — AT MOST
    d * w = 65536 rows no matter the corpus.  Counts are SUM-mergeable
    across document splits (the property the streaming twin stores)."""
    token = F.explode(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    ).alias("term")
    toks = docs.select(F.col("doc_id"), token)
    return (
        toks.select(F.explode(_cms_planes()).alias("p"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.c").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probe: DataFrame) -> DataFrame:
    """(term, est_count): min-over-planes Count-Min estimates of the
    probe terms (a `term` column) against a (j, c, cnt) grid."""
    return (
        probe.select("term", F.explode(_cms_planes()).alias("p"))
        .join(
            F.broadcast(sketch),
            (F.col("p.j") == F.col("j")) & (F.col("p.c") == F.col("c")),
        )
        .groupBy("term")
        .agg(F.min("cnt").alias("est_count"))
    )


def cms_term_counts(docs: DataFrame) -> DataFrame:
    """(term, est_count, exact_count): Count-Min frequency estimates for
    the probe vocabulary, with the exact counts alongside.

    Scale shape: the sketch build is one explode (4 rows per token) into
    one map-side-combinable count aggregate whose result is AT MOST
    d * w = 65536 rows no matter the corpus — that table broadcasts to
    the probe join.  Estimates are min over the d rows per term.
    """
    token = F.explode(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    ).alias("term")
    toks = docs.select(F.col("doc_id"), token)

    sketch = cms_grid_partials(docs)
    probe = (
        toks.where(F.col("doc_id") % _CMS_PROBE_MOD == _CMS_PROBE_RES)
        .select("term")
        .distinct()
    )
    est = cms_estimate(sketch, probe)
    exact = (
        toks.join(F.broadcast(probe), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return est.join(exact, "term")


def q_cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_term_counts(_docs(spark, sf_dir))


# DuckDB's unnest-of-struct-literals is awkward; generate the d planes as
# a UNION ALL instead (each arm is one scan of the toks CTE — the oracle
# runs at sf0.01 only, where four scans of a CTE are immaterial).
def _cms_sql() -> str:
    plane_arms = "\n  UNION ALL\n".join(
        f"  SELECT {j} AS j, {_hex_int_sql('h', 1 + 8 * j, 8)} % {_CMS_W} AS c,"
        f" term FROM toks"
        for j in range(_CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, t.term, md5(t.term) AS h
  FROM documents,
       unnest(regexp_split_to_array(lower(TRIM(text)), '\\s+')) AS t(term)
), planes AS (
{plane_arms}
), sketch AS (
  SELECT j, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM planes GROUP BY j, c
), probe AS (
  SELECT DISTINCT term FROM toks
  WHERE doc_id % {_CMS_PROBE_MOD} = {_CMS_PROBE_RES}
), probe_cells AS (
  SELECT p.term, pl.j, pl.c
  FROM probe p
  JOIN (SELECT DISTINCT j, c, term FROM planes) pl USING (term)
), est AS (
  SELECT term, MIN(s.cnt) AS est_count
  FROM probe_cells pc JOIN sketch s USING (j, c)
  GROUP BY term
), exact AS (
  SELECT t.term, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM toks t JOIN probe USING (term)
  GROUP BY t.term
)
SELECT term, est_count, exact_count
FROM est JOIN exact USING (term)
"""


# --- HLL set algebra: pairwise source vocabulary overlap -----------------------------------
#
# The property that makes HLL worth storing is that registers are an
# ALGEBRA: max-merging two sources' registers gives the union sketch
# without touching tokens again, and inclusion-exclusion then estimates
# the overlap — the "how much vocabulary do these two crawls share"
# question at O(sources^2 * 256) cost instead of a distinct-token join.
# Inclusion-exclusion of three noisy estimates can go negative; the
# overlap clamps at 0 (standard), with the raw signed value alongside.
# Pair fan-out is |sources|^2 — sources are a registry (dozens), not a
# key domain, the same cardinality assumption every per-source rollup
# here makes.

_PAIR_SEP = "|"  # source names must not contain it (asserted nowhere —
# testdata sources are bare words; production would key by struct)


def hll_source_overlap(docs: DataFrame) -> DataFrame:
    """(source_a, source_b, est_a, est_b, est_union, est_overlap) for
    every unordered source pair, all from ONE register build."""
    regs = hll_register_partials(docs).persist()
    regs.count()  # eager fill: singles + pair unions both consume it
    singles = hll_estimate(regs).select(
        "source", F.col("est_distinct").alias("est")
    )
    sources = regs.select("source").distinct()
    pairs = (
        sources.select(F.col("source").alias("source_a"))
        .crossJoin(
            F.broadcast(sources.select(F.col("source").alias("source_b")))
        )
        .where(F.col("source_a") < F.col("source_b"))
    )
    # union sketch per pair: each pair pulls BOTH members' registers and
    # re-maxes — the merge is the whole point, no token is re-read
    members = pairs.select(
        "source_a",
        "source_b",
        F.explode(F.array("source_a", "source_b")).alias("source"),
    )
    union_regs = (
        members.join(regs, "source")
        .groupBy("source_a", "source_b", "reg")
        .agg(F.max("r").alias("r"))
        .select(
            F.concat_ws(
                _PAIR_SEP, F.col("source_a"), F.col("source_b")
            ).alias("source"),
            "reg",
            "r",
        )
    )
    unions = hll_estimate(union_regs).select(
        F.split(F.col("source"), r"\|").getItem(0).alias("source_a"),
        F.split(F.col("source"), r"\|").getItem(1).alias("source_b"),
        F.col("est_distinct").alias("est_union"),
    )
    est_a = singles.select(
        F.col("source").alias("source_a"), F.col("est").alias("est_a")
    )
    est_b = singles.select(
        F.col("source").alias("source_b"), F.col("est").alias("est_b")
    )
    raw = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return (
        unions.join(F.broadcast(est_a), "source_a")
        .join(F.broadcast(est_b), "source_b")
        .select(
            "source_a",
            "source_b",
            "est_a",
            "est_b",
            "est_union",
            F.greatest(raw, F.lit(0)).cast("long").alias("est_overlap"),
        )
    )


def q_hll_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_source_overlap(_docs(spark, sf_dir))


def _hll_est_chain_sql(regs_cte: str, prefix: str) -> str:
    """The estimate arithmetic (raw + linear-counting branch) over a
    (source, reg, r) CTE — the SQL twin of hll_estimate, name-spaced so
    one query can run it twice (singles + pair unions)."""
    return f"""{prefix}per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_regs,
         CAST(SUM(CAST(1 AS BIGINT) << CAST({_HLL_RMAX} - r AS INTEGER))
              AS BIGINT) AS s_present
  FROM {regs_cte} GROUP BY source
), {prefix}raw AS (
  SELECT source,
         CAST({_HLL_M} - n_regs AS BIGINT) AS v_zero,
         CAST((CAST({_HLL_NUM} AS BIGINT)
               // (s_present + ({_HLL_M} - n_regs) * CAST({1 << _HLL_RMAX} AS BIGINT)))
              * {_HLL_ALPHA_PPM} // 1000000 AS BIGINT) AS est_raw
  FROM {prefix}per
), {prefix}est AS (
  SELECT source,
         CAST(CASE WHEN est_raw < {_HLL_LIN_THRESHOLD} AND v_zero > 0
                   THEN ({_HLL_M} * ([{", ".join(str(p) for p in _HLL_LN_PPM)}])[v_zero]) // 1000000
                   ELSE est_raw END AS BIGINT) AS est_distinct
  FROM {prefix}raw
)"""


def _hll_overlap_sql() -> str:
    reg = _hex_int_sql("h", 1, 2)
    v = _hex_int_sql("h", 3, 15)
    return f"""
WITH toks AS (
  SELECT source, md5(t.term) AS h
  FROM documents,
       unnest(regexp_split_to_array(lower(TRIM(text)), '\\s+')) AS t(term)
), rho AS (
  SELECT source, {reg} AS reg,
         LEAST(CASE WHEN {v} = 0 THEN 61
                    ELSE 61 - length(bin({v})) END,
               {_HLL_RMAX}) AS r
  FROM toks
), regs AS (
  SELECT source, reg, MAX(r) AS r FROM rho GROUP BY source, reg
), {_hll_est_chain_sql("regs", "s_")}, srcs AS (
  SELECT DISTINCT source FROM regs
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM srcs a, srcs b WHERE a.source < b.source
), union_regs AS (
  SELECT p.source_a || '{_PAIR_SEP}' || p.source_b AS source, g.reg,
         MAX(g.r) AS r
  FROM pairs p
  JOIN regs g ON g.source = p.source_a OR g.source = p.source_b
  GROUP BY p.source_a, p.source_b, g.reg
), {_hll_est_chain_sql("union_regs", "u_")}
SELECT p.source_a, p.source_b,
       sa.est_distinct AS est_a,
       sb.est_distinct AS est_b,
       u.est_distinct AS est_union,
       CAST(GREATEST(sa.est_distinct + sb.est_distinct - u.est_distinct, 0)
            AS BIGINT) AS est_overlap
FROM pairs p
JOIN s_est sa ON sa.source = p.source_a
JOIN s_est sb ON sb.source = p.source_b
JOIN u_est u ON u.source = p.source_a || '{_PAIR_SEP}' || p.source_b
"""


# --- corpus vocabulary redundancy (global union vs per-source sum) -------------------------
#
# The one-row corpus dashboard number the pair table can't give: how
# much vocabulary do sources SHARE overall?  redundancy = (sum of
# per-source distinct estimates) / (corpus-union distinct estimate) —
# 1.0 means fully disjoint vocabularies, n_sources means every source
# carries the same vocabulary.  Same single register build; the union
# sketch is one more max-merge.


def hll_vocab_redundancy(docs: DataFrame) -> DataFrame:
    """(n_sources, sum_single_est, union_est, redundancy_mille)."""
    regs = hll_registers_for(
        docs.select(
            "source",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term"),
        )
    ).persist()
    regs.count()  # singles + union both consume it
    singles = hll_estimate(regs).agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("est_distinct").cast("long").alias("sum_single_est"),
    )
    union_regs = (
        regs.groupBy("reg")
        .agg(F.max("r").alias("r"))
        .select(F.lit("__all__").alias("source"), "reg", "r")
    )
    union = hll_estimate(union_regs).select(
        F.col("est_distinct").alias("union_est")
    )
    return singles.crossJoin(union).select(
        "n_sources",
        "sum_single_est",
        "union_est",
        F.expr("(sum_single_est * 1000) DIV union_est")
        .cast("long")
        .alias("redundancy_mille"),
    )


def q_hll_vocab_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_vocab_redundancy(_docs(spark, sf_dir))


def _hll_redundancy_sql() -> str:
    reg = _hex_int_sql("h", 1, 2)
    v = _hex_int_sql("h", 3, 15)
    return f"""
WITH toks AS (
  SELECT source, md5(t.term) AS h
  FROM documents,
       unnest(regexp_split_to_array(lower(TRIM(text)), '\\s+')) AS t(term)
), rho AS (
  SELECT source, {reg} AS reg,
         LEAST(CASE WHEN {v} = 0 THEN 61
                    ELSE 61 - length(bin({v})) END,
               {_HLL_RMAX}) AS r
  FROM toks
), regs AS (
  SELECT source, reg, MAX(r) AS r FROM rho GROUP BY source, reg
), {_hll_est_chain_sql("regs", "s_")}, singles AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(est_distinct) AS BIGINT) AS sum_single_est
  FROM s_est
), union_regs AS (
  SELECT '__all__' AS source, reg, MAX(r) AS r FROM regs GROUP BY reg
), {_hll_est_chain_sql("union_regs", "u_")}
SELECT s.n_sources, s.sum_single_est,
       u.est_distinct AS union_est,
       CAST((s.sum_single_est * 1000) // u.est_distinct AS BIGINT)
         AS redundancy_mille
FROM singles s CROSS JOIN u_est u
"""


# --- per-source unique contribution (k-way leave-one-out set algebra) ----------------------
#
# The sourcing-decision dashboard the pair table and the one-row
# redundancy number both miss: what does each crawl UNIQUELY add?
# unique(s) = est(union of all) - est(union of all except s) — the
# k-way leave-one-out, still from ONE register build.  The LOO unions
# are a sources x registers re-max: O(sources^2 * 256) rows into one
# aggregate, register-sized at any corpus scale (sources are a
# registry of dozens, the standing per-source-rollup assumption).
# Register dominance makes est_rest <= est_all by construction (fewer
# sources -> pointwise-smaller registers in BOTH estimate branches),
# so est_unique needs no clamp in theory; it keeps the standard
# greatest(..., 0) anyway for the same reason overlap does.


def hll_source_contribution(docs: DataFrame) -> DataFrame:
    """(source, est_single, est_rest, est_all, est_unique, unique_mille):
    per-source distinct-vocabulary estimate, the leave-one-out union
    estimate, the global union estimate, the unique contribution, and
    its integer per-mille share of the global union."""
    regs = hll_register_partials(docs).persist()
    regs.count()  # eager fill: singles + LOO unions + global union consume it
    singles = hll_estimate(regs).select(
        "source", F.col("est_distinct").alias("est_single")
    )
    sources = regs.select("source").distinct()
    loo_regs = (
        regs.select(F.col("source").alias("member"), "reg", "r")
        .crossJoin(F.broadcast(sources))
        .where(F.col("member") != F.col("source"))
        .groupBy("source", "reg")
        .agg(F.max("r").alias("r"))
    )
    rest = hll_estimate(loo_regs).select(
        "source", F.col("est_distinct").alias("est_rest")
    )
    union_regs = (
        regs.groupBy("reg")
        .agg(F.max("r").alias("r"))
        .select(F.lit("__all__").alias("source"), "reg", "r")
    )
    est_all = hll_estimate(union_regs).select(
        F.col("est_distinct").alias("est_all")
    )
    return (
        singles.join(rest, "source", "left")  # single-source corpus: rest is empty
        .withColumn("est_rest", F.coalesce(F.col("est_rest"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(est_all))
        .withColumn(
            "est_unique",
            F.greatest(F.col("est_all") - F.col("est_rest"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "unique_mille", F.expr("CAST((est_unique * 1000) DIV est_all AS BIGINT)")
        )
    )


def q_hll_source_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_source_contribution(_docs(spark, sf_dir))


def _hll_contribution_sql() -> str:
    reg = _hex_int_sql("h", 1, 2)
    v = _hex_int_sql("h", 3, 15)
    return f"""
WITH toks AS (
  SELECT source, md5(t.term) AS h
  FROM documents,
       unnest(regexp_split_to_array(lower(TRIM(text)), '\\s+')) AS t(term)
), rho AS (
  SELECT source, {reg} AS reg,
         LEAST(CASE WHEN {v} = 0 THEN 61
                    ELSE 61 - length(bin({v})) END,
               {_HLL_RMAX}) AS r
  FROM toks
), regs AS (
  SELECT source, reg, MAX(r) AS r FROM rho GROUP BY source, reg
), {_hll_est_chain_sql("regs", "s_")}, srcs AS (
  SELECT DISTINCT source FROM regs
), loo_regs AS (
  SELECT s.source AS source, g.reg, MAX(g.r) AS r
  FROM srcs s JOIN regs g ON g.source <> s.source
  GROUP BY s.source, g.reg
), {_hll_est_chain_sql("loo_regs", "l_")}, union_regs AS (
  SELECT '__all__' AS source, reg, MAX(r) AS r FROM regs GROUP BY reg
), {_hll_est_chain_sql("union_regs", "a_")}
SELECT se.source,
       se.est_distinct AS est_single,
       CAST(COALESCE(le.est_distinct, 0) AS BIGINT) AS est_rest,
       ae.est_distinct AS est_all,
       CAST(GREATEST(ae.est_distinct - COALESCE(le.est_distinct, 0), 0)
            AS BIGINT) AS est_unique,
       CAST((GREATEST(ae.est_distinct - COALESCE(le.est_distinct, 0), 0) * 1000)
            // ae.est_distinct AS BIGINT) AS unique_mille
FROM s_est se
LEFT JOIN l_est le ON le.source = se.source
CROSS JOIN a_est ae
"""


EXTRA_QUERIES_SKETCH = {
    "hll_distinct_terms": q_hll_distinct_terms,
    "bloom_decontaminate": q_bloom_decontaminate,
    "cms_term_counts": q_cms_term_counts,
    "hll_source_overlap": q_hll_source_overlap,
    "hll_vocab_redundancy": q_hll_vocab_redundancy,
    "hll_source_contribution": q_hll_source_contribution,
}

EXTRA_ORACLES_SKETCH = {
    "hll_distinct_terms": _hll_sql(),
    "bloom_decontaminate": _bloom_sql(),
    "cms_term_counts": _cms_sql(),
    "hll_source_overlap": _hll_overlap_sql(),
    "hll_vocab_redundancy": _hll_redundancy_sql(),
    "hll_source_contribution": _hll_contribution_sql(),
}
