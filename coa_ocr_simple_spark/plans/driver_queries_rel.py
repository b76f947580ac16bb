"""Wave-4 driver queries: relational breadth + the flagship pipeline.

- ``extract_pipeline``: the full interleaved-span extraction pipeline over
  a spans-ified documents table — not SQL-expressible (vectorized regex
  banks, discovery, table recovery), so the driver records the weaker
  rows-only check; the strong invariant (span-sequence + entity equality
  vs the single-node oracle AND vs a live run of the reference) is
  enforced by pytest instead.
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


# --- flagship pipeline (rows-only; see module docstring) ---------------------------


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
        F.size("entities").cast("long").alias("n_entities"),
        F.size("test_results").cast("long").alias("n_test_results"),
    )


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
    # extract_pipeline intentionally absent -> driver rows-only check
    "regional_revenue": _REGIONAL_REVENUE_SQL,
    "event_props": _EVENT_PROPS_SQL,
    "order_priority_counts": _ORDER_PRIORITY_SQL,
}
