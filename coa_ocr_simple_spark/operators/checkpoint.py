"""Checkpoint / lineage / resume (SURVEY.md §4.2.2).

Resumability model for a 10^12-doc run:
- the extracted table carries lineage columns ``_run_id`` and
  ``_partition_id`` (written per task via spark_partition_id());
- the checkpoint table holds per-partition, per-doc-type metrics rows
  (run_id, partition_id, doc_type, n_docs, n_spans, status);
- a resume run anti-joins the input against the extracted table's doc_ids,
  so only unfinished documents are processed.  Appends are idempotent at
  the document level because each doc_id is processed exactly once per
  final table state (re-running a partially-completed run adds only the
  missing documents).

With an Iceberg catalog the append is snapshot-isolated; with the Parquet
fallback the job-level output committer gives all-or-nothing per write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINEAGE_RUN = "_run_id"
LINEAGE_PARTITION = "_partition_id"


def with_lineage(results: DataFrame, run_id: str) -> DataFrame:
    return results.withColumn(LINEAGE_RUN, F.lit(run_id)).withColumn(
        LINEAGE_PARTITION, F.spark_partition_id()
    )


def resume_filter(docs: DataFrame, done: DataFrame | None) -> DataFrame:
    """Anti-join the input against already-extracted doc_ids.

    ``done`` is the extracted table (any subset of columns including
    doc_id) or None for a fresh run.  Broadcast is left to AQE: at small
    completed-set sizes it becomes a broadcast anti-join, at large sizes a
    shuffle join — both correct.
    """
    if done is None:
        return docs
    return docs.join(done.select("doc_id").distinct(), on="doc_id", how="left_anti")


def partition_metrics(results_with_lineage: DataFrame, status: str = "ok") -> DataFrame:
    """Per-partition, per-doc-type lineage metrics for the checkpoint table."""
    return results_with_lineage.groupBy(
        F.col(LINEAGE_RUN).alias("run_id"),
        F.col(LINEAGE_PARTITION).alias("partition_id"),
        F.col("doc_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.lit(status).alias("status"),
    )
