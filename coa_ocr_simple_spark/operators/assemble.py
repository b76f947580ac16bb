"""Span assembly — the Spark-native replacement of the reference's
sequential per-page loop (/root/reference/app.py:798-803; SURVEY.md §2.7).

Shape of the plan (one wide shuffle, skew-spread before it):

  documents(doc_id, spans)
    -> posexplode_outer(spans)                       [narrow]
    -> repartition(hash(doc_id, offset))             [skew spread: a fat
       multi-media doc's spans decode on many partitions — SURVEY §4.2.1]
    -> left join media store on media_ref            [broadcast when small,
       else shuffle hash join; AQE decides]
    -> decoded = CASE kind WHEN text  -> coalesce(text,'')   [pure JVM]
                          WHEN html  -> strip_html UDF
                          ELSE       -> decode_media UDF
    -> groupBy(doc_id).agg(sort_array(collect_list(struct(offset, ...))))
                                                     [the one wide shuffle]
    -> out_spans (offset re-normalized to rank) + assembled doc text

The per-document span order is restored by ``sort_array`` on the original
``offset`` inside each group — a within-group sort, never a global one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.pipeline import SPAN_JOIN
from ..functions.udfs import make_decode_media_udf, make_strip_html_udf

MEDIA_KINDS = ("pdf", "image")
TEXT_KINDS = ("text", "html")


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents -> one row per span (zero-span docs kept with null span)."""
    return docs.select(
        "doc_id", F.posexplode_outer("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def decode_spans(
    spans: DataFrame,
    media: DataFrame | None,
    *,
    spread_partitions: int | None = None,
    broadcast_media: bool | None = None,
) -> DataFrame:
    """Resolve media refs and decode every span to text.

    spread_partitions: explicit salt-free skew spread — hash-repartition the
    *exploded* spans on (doc_id, offset) so one hot document's media spans
    decode across many partitions (the later groupBy reunifies them).
    broadcast_media: force/forbid a broadcast join of the media store;
    None lets Catalyst/AQE decide from stats.
    """
    if spread_partitions:
        spans = spans.repartition(spread_partitions, "doc_id", "offset")

    if media is not None:
        media_side = F.broadcast(media) if broadcast_media else media
        spans = spans.join(media_side, on="media_ref", how="left")
    else:
        spans = spans.withColumn("pages", F.lit(None).cast("array<string>")).withColumn(
            "ocr_pages", F.lit(None).cast("array<string>")
        )

    decode_media_udf = make_decode_media_udf()
    strip_html_udf = make_strip_html_udf()

    decoded: Column = (
        F.when(F.col("kind") == "text", F.coalesce(F.col("text"), F.lit("")))
        .when(F.col("kind") == "html", strip_html_udf(F.col("text")))
        .when(
            F.col("kind").isin(*MEDIA_KINDS),
            decode_media_udf(F.col("kind"), F.col("pages"), F.col("ocr_pages")),
        )
        .otherwise(F.lit(""))
    )
    return spans.select(
        "doc_id", "kind", "media_ref", "offset", decoded.alias("decoded")
    )


def reassemble_documents(decoded: DataFrame) -> DataFrame:
    """Regroup decoded spans per document: ordered out_spans + joined text.

    Output: (doc_id, out_spans array<struct<kind,text,media_ref,offset>>,
             text, n_spans).
    """
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("offset").alias("offset"),
                F.col("kind").alias("kind"),
                F.col("decoded").alias("text"),
                F.col("media_ref").alias("media_ref"),
            )
        )
    )
    grouped = decoded.where(F.col("kind").isNotNull()).groupBy("doc_id").agg(
        ordered.alias("ordered")
    )
    # zero-span docs (null kind after outer-explode) -> empty ordered array
    empties = (
        decoded.where(F.col("kind").isNull())
        .select("doc_id")
        .withColumn("ordered", F.array().cast(grouped.schema["ordered"].dataType))
    )
    grouped = grouped.unionByName(empties)

    out_spans = F.transform(
        F.col("ordered"),
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),  # re-normalized rank (FIXTURES.md §5)
        ),
    )
    text = F.array_join(F.transform(F.col("ordered"), lambda s: s["text"]), SPAN_JOIN)
    return grouped.select(
        "doc_id",
        out_spans.alias("out_spans"),
        text.alias("text"),
        F.size("ordered").alias("n_spans"),
    )
