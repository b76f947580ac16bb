"""The EXTRA registry (parameter variants demoted from the 50-entry
driver registry — round-3 verdict item 1) is held to the same bar as
queries(): value-level DuckDB parity, just enforced here instead of by
the driver."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.check_oracles import TABLES, canon

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(entrymod.extra_queries()))
def test_extra_query_matches_oracle(spark, name):
    spark.catalog.clearCache()
    spark_df = entrymod.extra_queries()[name](spark, SF).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    duck_df = con.execute(entrymod.extra_oracle_sql()[name]).df()
    assert len(spark_df) == len(duck_df)
    a, b = canon(spark_df), canon(duck_df)
    assert list(a.columns) == list(b.columns)
    assert a.equals(b)


def test_extras_disjoint_from_registry():
    assert set(entrymod.extra_queries()) & set(entrymod.queries()) == set()
    assert set(entrymod.extra_oracle_sql()) == set(entrymod.extra_queries())
