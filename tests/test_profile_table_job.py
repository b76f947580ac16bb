"""profile_table job: exact stats (rows/nulls/min/max) are exact, the
HLL distinct estimate tracks true cardinality per column, non-atomic
columns are skipped, and the control output is re-runnable."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.jobs.profile_table import parse_args, run


def test_profile_orders_table(spark, tmp_path):
    out = str(tmp_path / "profile")
    summary = run(
        parse_args(
            [
                "--input",
                "/root/testdata/sf0.001/orders.parquet",
                "--output",
                out,
            ]
        ),
        spark,
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n = orders.count()
    assert summary["n_rows"] == n
    assert summary["n_columns_profiled"] == len(orders.columns)

    prof = {r["column"]: r for r in spark.read.parquet(out).collect()}
    assert set(prof) == set(orders.columns)
    from pyspark.sql import functions as F

    for c in orders.columns:
        row = prof[c]
        exact = orders.agg(
            F.sum(F.col(c).isNull().cast("long")).alias("nn"),
            F.min(F.col(c)).cast("string").alias("mn"),
            F.max(F.col(c)).cast("string").alias("mx"),
            F.count_distinct(F.col(c)).alias("d"),
        ).collect()[0]
        assert row["n_rows"] == n
        assert row["n_null"] == (exact["nn"] or 0)
        assert row["min_value"] == exact["mn"]
        assert row["max_value"] == exact["mx"]
        d = exact["d"]
        assert abs(row["n_distinct_est"] - d) <= max(2, 0.15 * d), (
            c,
            row["n_distinct_est"],
            d,
        )


def test_nulls_skipped_columns_and_rerun(spark, tmp_path):
    rows = [
        {
            "k": i,
            "s": None if i % 3 == 0 else f"v{i % 7}",
            "arr": [i, i + 1],
        }
        for i in range(90)
    ]
    path = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    out = str(tmp_path / "profile")

    args = parse_args(["--input", path, "--output", out])
    summary = run(args, spark)
    assert summary["skipped_columns"] == ["arr"]  # non-atomic skipped
    prof = {r["column"]: r for r in spark.read.parquet(out).collect()}
    assert set(prof) == {"k", "s"}
    assert prof["s"]["n_null"] == 30
    assert prof["s"]["n_distinct_est"] == 7  # nulls excluded, small range exact-ish
    assert prof["k"]["n_null"] == 0
    assert prof["k"]["min_value"] == "0" and prof["k"]["max_value"] == "89"

    # overwrite semantics: a re-run leaves exactly one row per column
    run(args, spark)
    assert spark.read.parquet(out).count() == 2


def test_column_selection_validation(spark, tmp_path):
    import pytest

    rows = [{"k": 1, "arr": [1]}]
    path = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    out = str(tmp_path / "p")
    with pytest.raises(ValueError, match="unknown columns"):
        run(parse_args(["--input", path, "--output", out, "--columns", "zz"]), spark)
    with pytest.raises(ValueError, match="non-atomic"):
        run(parse_args(["--input", path, "--output", out, "--columns", "arr"]), spark)
