"""Table IO — Iceberg when a catalog is configured, Parquet fallback.

The production target is an Iceberg table of interleaved text+media spans
(BASELINE.json north_rule).  The sandbox has no iceberg-spark-runtime jar,
so ``TableIO`` resolves the format at runtime: identifiers that look like
catalog tables (``db.table``) go through the Iceberg DataFrameWriterV2
(``writeTo(...).append()``), bare paths read/write Parquet.  Either way
the plan above it is identical — the scan still gets column pruning and
filter pushdown from the DataSource V2 interface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _is_path(identifier: str) -> bool:
    return "/" in identifier or identifier.endswith(".parquet")


class TableIO:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def read(self, identifier: str, schema=None) -> DataFrame:
        """Parquet by default; ``.jsonl``/``.json`` paths read as JSON
        Lines (the common raw-ingest format of a training-data pipeline).
        Pass ``schema`` for JSON at scale — schema inference scans the
        data once, which is fine for a sample and wrong for 100 TB."""
        if identifier.endswith((".jsonl", ".json")):
            # DROPMALFORMED: a corrupt line must neither kill a 10^12-doc
            # job nor become a phantom all-null document (PERMISSIVE's
            # default does the latter — caught by probe).  Real clusters
            # wanting an audit trail add badRecordsPath instead.
            reader = self.spark.read.option("mode", "DROPMALFORMED")
            if schema is not None:
                reader = reader.schema(schema)
            return reader.json(identifier)
        if _is_path(identifier):
            return self.spark.read.parquet(identifier)
        return self.spark.read.table(identifier)

    def append(self, df: DataFrame, identifier: str) -> None:
        if _is_path(identifier):
            df.write.mode("append").parquet(identifier)
        else:
            try:
                df.writeTo(identifier).append()
            except Exception:
                # table does not exist yet: create-or-replace v2 path
                df.writeTo(identifier).createOrReplace()

    def overwrite(self, df: DataFrame, identifier: str) -> None:
        """Replace the target's contents.  The right mode for re-runnable
        control outputs (manifests, reports): append-on-rerun accumulates
        stale rows alongside the new ones in a path-based parquet target,
        which breaks any consumer that reads the whole directory."""
        if _is_path(identifier):
            df.write.mode("overwrite").parquet(identifier)
        else:
            df.writeTo(identifier).createOrReplace()

    def exists(self, identifier: str) -> bool:
        if _is_path(identifier):
            return os.path.exists(identifier) and any(
                name.endswith(".parquet") or name.startswith("part-")
                for name in os.listdir(identifier)
            ) if os.path.isdir(identifier) else os.path.exists(identifier)
        return self.spark.catalog.tableExists(identifier)

    def read_if_exists(self, identifier: str) -> DataFrame | None:
        return self.read(identifier) if self.exists(identifier) else None
