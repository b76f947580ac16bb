"""spark-submit entry point for the extraction pipeline.

Usage (cluster):
  spark-submit --py-files dist/coa_ocr_simple_spark.zip \\
      -m coa_ocr_simple_spark.jobs.extract \\
      --input db.documents --media db.media --output db.extracted \\
      --checkpoint db.checkpoint --config model_config.json \\
      --run-id run-2026-08-16 --resume

Sandbox (paths instead of catalog identifiers):
  python -m coa_ocr_simple_spark.jobs.extract --input /tmp/docs.parquet ...

Scale knobs map 1:1 to SURVEY.md §4.2: --spread-partitions (skew spread of
exploded spans), --broadcast-media (force broadcast of the media store),
AQE on by default (post-shuffle coalesce + skew-join splitting).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

import os

from ..core.config import EMPTY_CONFIG, ModelConfig
from ..operators.checkpoint import partition_metrics
from ..plans.extract_plan import (
    ExtractOptions,
    build_extract_plan,
    build_multi_tenant_plan,
)
from ..sources.tables import TableIO


def tenant_config_path(config_dir: str, tenant: str) -> str:
    """Reference naming convention: {tenant_id}_model_state.pkl
    (app.py:261-301) -> the frozen-JSON equivalent."""
    return os.path.join(config_dir, f"{tenant}_model_config.json")


def load_tenant_configs(
    config_dir: str,
    tenants: list[str],
    default: ModelConfig = EMPTY_CONFIG,
) -> dict[str, ModelConfig]:
    """Missing file -> ``default``, mirroring the reference's fresh
    default processor for an unseen tenant — but never SILENTLY (round-2
    advice): a typo'd tenant id or wrong --config-dir must not quietly
    degrade a 10^12-doc run to empty-config extraction, so each missing
    file is named on stderr (the reference at least logs 'No saved model
    state found', app.py:272-276), and an explicitly passed --config
    survives as the fallback instead of being discarded."""
    import sys

    out = {}
    for tenant in tenants:
        path = tenant_config_path(config_dir, tenant)
        if os.path.exists(path):
            out[tenant] = ModelConfig.load(path)
        else:
            print(
                f"warning: no config for tenant {tenant!r} at {path}; "
                + (
                    "falling back to the --config model"
                    if default is not EMPTY_CONFIG
                    else "falling back to the empty default config"
                ),
                file=sys.stderr,
            )
            out[tenant] = default
    return out


def make_session(
    app: str,
    master: str | None,
    shuffle_partitions: int | None,
    extra_conf: list[str] | None = None,
):
    builder = SparkSession.builder.appName(app)
    if master:
        builder = builder.master(master)
    for kv in extra_conf or []:
        key, sep, value = kv.partition("=")
        if not sep or not key:
            raise SystemExit(f"--conf expects key=value, got: {kv!r}")
        builder = builder.config(key, value)
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # extraction stages are CPU-bound pandas UDFs over few bytes; AQE's
        # size-based coalescing would serialize them (see bench.py)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return builder.getOrCreate()


def run(args: argparse.Namespace, spark: SparkSession) -> dict:
    io = TableIO(spark)
    docs = io.read(args.input)
    media = io.read_if_exists(args.media) if args.media else None
    config = ModelConfig.load(args.config) if args.config else EMPTY_CONFIG

    done = io.read_if_exists(args.output) if args.resume else None

    tenants = [t.strip() for t in (args.tenants or "").split(",") if t.strip()]
    if len(tenants) > 1 and args.tenant_column not in docs.columns:
        raise SystemExit(
            f"--tenants given but input has no '{args.tenant_column}' column "
            "(use --tenant-column, or a single tenant to apply one config "
            "to the whole input)"
        )
    if len(tenants) == 1 and args.tenant_column not in docs.columns:
        # single-tenant invocation (the reference's one-request-one-tenant
        # shape): that tenant's config applies to the whole input; an
        # explicit --config is the fallback when the tenant file is absent
        config = load_tenant_configs(args.config_dir or ".", tenants, default=config)[
            tenants[0]
        ]

    options = ExtractOptions(
        config=config,
        spread_partitions=args.spread_partitions,
        broadcast_media=args.broadcast_media or None,
        include_full_text=args.include_full_text,
        run_id=args.run_id,
    )
    if tenants and args.tenant_column in docs.columns:
        results = build_multi_tenant_plan(
            docs,
            media,
            tenant_configs=load_tenant_configs(
                args.config_dir or ".", tenants, default=config
            ),
            options=options,
            done=done,
            tenant_column=args.tenant_column,
        )
    else:
        results = build_extract_plan(docs, media, options=options, done=done)

    if args.output_buckets:
        # file-count / layout control for the sink: hash-bucket by doc_id so
        # a resume anti-join and downstream per-doc lookups stay pruned.
        # (With an Iceberg catalog the table's own bucket(doc_id) partition
        # spec replaces this explicit repartition.)
        results = results.repartition(args.output_buckets, "doc_id")

    io.append(results, args.output)

    written = io.read(args.output).where(f"_run_id = '{args.run_id}'")
    metrics = partition_metrics(written)
    if args.checkpoint:
        io.append(metrics, args.checkpoint)

    n_docs = written.count()
    return {"run_id": args.run_id, "docs_written": n_docs}


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="COA span-extraction pipeline")
    p.add_argument("--input", required=True, help="documents table/path")
    p.add_argument("--media", default=None, help="media store table/path")
    p.add_argument("--output", required=True, help="extracted table/path")
    p.add_argument("--checkpoint", default=None, help="checkpoint metrics table/path")
    p.add_argument("--config", default=None, help="frozen model_config.json")
    p.add_argument(
        "--tenants",
        default=None,
        help="comma-separated tenant ids; each resolves "
        "{config-dir}/{tenant}_model_config.json (missing -> default config)",
    )
    p.add_argument("--config-dir", default=None, help="directory of per-tenant configs")
    p.add_argument("--tenant-column", default="tenant_id")
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--resume", action="store_true", help="anti-join completed doc_ids")
    p.add_argument("--spread-partitions", type=int, default=None)
    p.add_argument("--output-buckets", type=int, default=None)
    p.add_argument("--broadcast-media", action="store_true")
    p.add_argument("--include-full-text", action="store_true")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra spark conf key=value (repeatable), as with spark-submit",
    )
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    spark = make_session(
        "coa-extract", args.master, args.shuffle_partitions, args.conf
    )
    summary = run(args, spark)
    print(summary)


if __name__ == "__main__":
    main()
