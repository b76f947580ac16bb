"""Wave-4 driver queries: relational breadth + the flagship pipeline.

- ``extract_pipeline``: the full interleaved-span extraction pipeline over
  a spans-ified documents table, verified end-to-end by a real DuckDB
  oracle (round-2 verdict item 1): the oracle reassembles each document's
  text from the deterministic spansification — pdf docs get the reference's
  OCR page headers (app.py:425/803 semantics, core/decode.py) over the two
  text halves, image/text docs pass through — then reapplies the proven
  classify / fingerprint SQL formulations over that reassembled text.
  The entities/test_results maps stay out of this projection (Python regex
  discovery + dict-merge semantics, not SQL-expressible over arbitrary
  prose); they are driver-checked by ``entity_counts`` over the synthesized
  corpus (driver_queries_core) and pinned span-for-span by the live-
  reference parity pytest.
- ``regional_revenue``: TPC-H Q5-shaped 5-way join + rollup, decimal-exact.
- ``event_props_extract``: JSON column extraction (get_json_object /
  json_extract) with integer outputs.
- ``order_priority_counts``: date-range filter (pushed to the scan) +
  count rollup, TPC-H Q4-flavored, via a semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --- flagship pipeline (oracle-checked; see module docstring) ------------------------


def q_extract_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import __spark_entry__ as entrymod
    from .extract_plan import ExtractOptions, build_extract_plan

    docs = _read(spark, sf_dir, "documents")
    spans_df, media_df = entrymod._spansify(docs)
    result = build_extract_plan(
        spans_df, media_df, options=ExtractOptions(run_id="driver-q")
    )
    return result.select(
        "doc_id",
        "doc_type",
        F.round(F.col("confidence") * 100).cast("long").alias("confidence_pct"),
        "n_spans",
        "fingerprint",
    )


def _extract_pipeline_oracle_sql() -> str:
    """DuckDB oracle for the full pipeline's SQL-expressible projection.

    Mirrors, in order: ``__spark_entry__._spansify`` (doc_id % 10 == 0 ->
    2-page scanned pdf over the text halves, % 10 == 5 -> image whose OCR
    is the full text, else a single text span), the decode semantics of
    core/decode.py (pdf: empty direct text layer -> OCR path, page header
    ``--- Page {n} ---\\n`` + page + ``\\n\\n`` per app.py:425/803; image:
    ocr_pages[0]), the SPAN_JOIN reassembly (one span -> identity), then
    the proven classify + fingerprint SQL over the reassembled text.
    LENGTH//2 reproduces Spark's ``(length/2).cast("int")`` truncation.
    """
    from .driver_queries import _classify_oracle_sql

    page = (
        "'--- Page 1 ---' || chr(10) || substring(text, 1, LENGTH(text) // 2)"
        " || chr(10) || chr(10) || "
        "'--- Page 2 ---' || chr(10) ||"
        " substring(text, (LENGTH(text) // 2) + 1, LENGTH(text))"
        " || chr(10) || chr(10)"
    )
    return f"""
WITH assembled AS (
  SELECT 'doc-' || printf('%08d', doc_id) AS doc_id,
         CASE WHEN doc_id % 10 = 0 THEN {page} ELSE text END AS text
  FROM documents
),
classified AS ({_classify_oracle_sql("assembled")}),
fp AS (
  SELECT doc_id,
    CASE WHEN text IS NULL OR text = '' THEN '' ELSE
      array_to_string(
        list_transform(
          list_filter(string_split(text, chr(10)), l -> LENGTH(TRIM(l)) > 0)[1:20],
          l -> substring(TRIM(l), 1, 2)),
        '') || '_L' || CAST(LENGTH(text) // 100 AS VARCHAR)
    END AS fingerprint
  FROM assembled
)
SELECT a.doc_id AS doc_id,
       c.doc_type AS doc_type,
       CAST(c.confidence_pct AS BIGINT) AS confidence_pct,
       CAST(1 AS INTEGER) AS n_spans,
       f.fingerprint AS fingerprint
FROM assembled a
JOIN classified c USING (doc_id)
JOIN fp f USING (doc_id)
"""


# --- TPC-H Q5-shaped multi-join ------------------------------------------------------


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem revenue rollup.

    Join order: small dims broadcast (region, nation), the two fact
    tables shuffle on their keys once each; revenue in exact decimal cents.
    """
    region = _read(spark, sf_dir, "region")
    nation = _read(spark, sf_dir, "nation")
    customer = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")

    dec = lambda c: F.col(c).cast("decimal(18,2)")
    revenue = (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    ).cast("decimal(28,4)")

    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            (F.sum(revenue) * 10000).cast("long").alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_REGIONAL_REVENUE_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(28,4))) * 10000 AS BIGINT) AS revenue_c4,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- JSON props extraction -------------------------------------------------------------


def q_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event JSON field extraction + per-type rollup of the extracted
    key — the semi-structured projection every event pipeline needs."""
    events = _read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


_EVENT_PROPS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
"""


# --- date-filtered semi-join rollup (Q4-flavored) ----------------------------------------


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in a date window having at least one lineitem shipped after
    the order date — EXISTS as a left-semi join, then a priority rollup.
    The date filter reaches the parquet scan (PushedFilters)."""
    orders = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    lineitem = _read(spark, sf_dir, "lineitem")
    matching = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matching.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


QUERIES_REL = {
    "extract_pipeline": q_extract_pipeline,
    "regional_revenue": q_regional_revenue,
    "event_props": q_event_props,
    "order_priority_counts": q_order_priority_counts,
}

ORACLES_REL = {
    "extract_pipeline": _extract_pipeline_oracle_sql(),
    "regional_revenue": _REGIONAL_REVENUE_SQL,
    "event_props": _EVENT_PROPS_SQL,
    "order_priority_counts": _ORDER_PRIORITY_SQL,
}


# --- grouping-sets rollup (net-new vs reference; SURVEY §2.7 "absent") -------------------


def q_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (o_orderstatus, o_orderpriority): subtotal + grand-total
    rows with explicit grouping indicators, decimal-exact totals."""
    orders = _read(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("total_price_c"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n_orders",
            "total_price_c",
        )
    )


_ORDER_ROLLUP_SQL = """
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_price_c
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --- set operators (net-new vs reference) --------------------------------------------------


def q_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both 1996 and 1997 (INTERSECT) vs those who
    churned after 1996 (EXCEPT), as one labeled rollup — set-operator
    coverage (absent in the reference, SURVEY §2.7)."""
    orders = _read(spark, sf_dir, "orders")
    y96 = orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    y97 = orders.where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    # intersect/subtract carry set (DISTINCT) semantics, matching the
    # DISTINCT CTEs + INTERSECT/EXCEPT in the oracle
    both = y96.intersect(y97).withColumn("cohort", F.lit("retained"))
    churned = y96.subtract(y97).withColumn("cohort", F.lit("churned"))
    return both.unionByName(churned).groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_REPEAT_CUSTOMERS_SQL = """
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01'),
     y97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-01-01'
               AND o_orderdate < TIMESTAMP '1998-01-01'),
     labeled AS (
       SELECT o_custkey, 'retained' AS cohort FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
       UNION ALL
       SELECT o_custkey, 'churned' AS cohort FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
     )
SELECT cohort, COUNT(*) AS n_customers FROM labeled GROUP BY cohort
"""


# --- deterministic sampling -------------------------------------------------------------


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/16 deterministic sample of documents via a hash-prefix predicate
    (md5(doc_id) starts with '0') — reproducible across engines and runs,
    unlike rand()-based sampling; the standard trick for stable eval sets."""
    docs = _read(spark, sf_dir, "documents")
    sampled = docs.where(F.md5(F.col("doc_id").cast("string")).startswith("0"))
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").cast("long").alias("sampled_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_HASH_SAMPLE_SQL = """
SELECT COUNT(*) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) LIKE '0%'
"""


QUERIES_REL.update(
    {
        "order_rollup": q_order_rollup,
        "repeat_customers": q_repeat_customers,
    }
)

ORACLES_REL.update(
    {
        "order_rollup": _ORDER_ROLLUP_SQL,
        "repeat_customers": _REPEAT_CUSTOMERS_SQL,
    }
)

# Demoted from the driver registry (round-3 verdict item 1: the driver
# gate caps at 50 entries; hash_sample is the single-rate special case of
# the registered stratified_sample — same md5-prefix mechanism).  Still
# public API, oracle-green via check_oracles.py / test_extra_oracles.py.
EXTRA_QUERIES_REL = {"hash_sample": q_hash_sample}
EXTRA_ORACLES_REL = {"hash_sample": _HASH_SAMPLE_SQL}
