from __future__ import annotations

import pytest

from coa_ocr_simple_spark.fixtures.generate import (
    build_parity_corpus,
    media_lookup,
    write_corpus,
)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("coa-ocr-simple-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def parity_corpus(tmp_path_factory):
    builder = build_parity_corpus()
    root = tmp_path_factory.mktemp("parity")
    docs_path = str(root / "documents.parquet")
    media_path = str(root / "media.parquet")
    write_corpus(builder, docs_path, media_path)
    return {
        "builder": builder,
        "docs_path": docs_path,
        "media_path": media_path,
        "lookup": media_lookup(builder),
    }
