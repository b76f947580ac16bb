"""End-to-end extraction plan builder (SURVEY.md §3.1 Spark lifecycle).

    read documents ──> resume anti-join ──> explode spans
        ──> skew spread (hash repartition on (doc_id, offset))
        ──> media join + vectorized decode (pdf/image/html UDFs, text JVM-side)
        ──> groupBy(doc_id) reassembly (the one wide shuffle)
        ──> extractor pandas UDF (classify/sections/entities/tables/discovery)
        ──> extracted rows (+ lineage columns)

Everything before the groupBy is narrow except the explicit skew-spread
repartition; Catalyst prunes the parquet scan to (doc_id, spans) and
pushes the resume anti-join below the explode.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.config import EMPTY_CONFIG, ModelConfig
from ..functions.udfs import make_extractor_udf
from ..operators.assemble import decode_spans, explode_spans, reassemble_documents
from ..operators.checkpoint import resume_filter, with_lineage


@dataclass
class ExtractOptions:
    config: ModelConfig = EMPTY_CONFIG
    spread_partitions: int | None = None  # skew spread for exploded spans
    broadcast_media: bool | None = None  # None -> AQE decides
    include_full_text: bool = False  # full_text is big; opt-in (result
    # carries out_spans already, so text is reconstructible)
    run_id: str = "run-0"


def build_extract_plan(
    docs: DataFrame,
    media: DataFrame | None,
    *,
    options: ExtractOptions | None = None,
    done: DataFrame | None = None,
) -> DataFrame:
    """Return the extracted-results DataFrame (unwritten; caller sinks it)."""
    options = options or ExtractOptions()

    todo = resume_filter(docs, done)
    spans = explode_spans(todo)
    decoded = decode_spans(
        spans,
        media,
        spread_partitions=options.spread_partitions,
        broadcast_media=options.broadcast_media,
    )
    assembled = reassemble_documents(decoded)

    extract = make_extractor_udf(options.config.to_json())
    extracted = assembled.withColumn("result", extract(F.col("text")))

    columns = [
        "doc_id",
        "out_spans",
        F.col("result.doc_type").alias("doc_type"),
        F.col("result.confidence").alias("confidence"),
        F.col("result.entities").alias("entities"),
        F.col("result.hazard_codes").alias("hazard_codes"),
        F.col("result.cas_numbers").alias("cas_numbers"),
        F.col("result.test_results").alias("test_results"),
        F.col("result.sections").alias("sections"),
        F.col("result.fingerprint").alias("fingerprint"),
        "n_spans",
    ]
    if options.include_full_text:
        columns.append(F.col("text").alias("full_text"))

    return with_lineage(extracted.select(*columns), options.run_id)
