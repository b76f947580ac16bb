"""Downstream-sink payload projection (SURVEY.md §2.1 S7).

The reference POSTs one fixed-shape JSON record per document to the
Alchemy API (/root/reference/app.py:1351-1414): four properties
(RecordName / CasNumber / Purity / LotNumber), each a single row-0 value
with defaults ``("Unknown Product", "", "", "")``.

Here the same projection is a pure DataFrame transform over the extracted
table: a typed payload column (exact same nesting) that any HTTP/queue
sink can serialize with ``to_json``.  At 10^12 docs the POST loop becomes
a partitioned writer over this column — the payload shape is the parity
surface, the transport is pluggable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RECORD_TEMPLATE = "exampleParsing"  # app.py:1354

_FIELDS = [
    # (identifier, entities key, default)  — app.py:1336-1339
    ("RecordName", "product_name", "Unknown Product"),
    ("CasNumber", "cas_number", ""),
    ("Purity", "purity", ""),
    ("LotNumber", "lot_number", ""),
]


def _property(identifier: str, value: Column) -> Column:
    return F.struct(
        F.lit(identifier).alias("identifier"),
        F.array(
            F.struct(
                F.lit(0).alias("row"),
                F.array(
                    F.struct(value.alias("value"), F.lit("").alias("valuePreview"))
                ).alias("values"),
            )
        ).alias("rows"),
    )


def alchemy_payload(extracted: DataFrame) -> DataFrame:
    """extracted(doc_id, entities, ...) -> (doc_id, payload, payload_json)."""
    def field(key: str, default: str) -> Column:
        return F.coalesce(F.col("entities").getItem(key), F.lit(default))

    payload = F.struct(
        F.lit(None).cast("string").alias("processId"),
        F.lit(RECORD_TEMPLATE).alias("recordTemplate"),
        F.array(
            *[_property(ident, field(key, default)) for ident, key, default in _FIELDS]
        ).alias("properties"),
    )
    return extracted.select(
        "doc_id", payload.alias("payload"), F.to_json(payload).alias("payload_json")
    )
