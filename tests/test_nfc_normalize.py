"""NFC normalization: branch liveness + the dedup-enabling property.

DuckDB value parity (native nfc_normalize vs the Python unicodedata
UDF) is enforced by the extra oracle gate; these pin what that diff
can't: every injection branch is live with its expected shape (the
Angstrom singleton changes WITHOUT shrinking — catches length-only
shortcuts), and byte-different spellings of the same text hash equal
after normalization (the reason the operator exists: un-normalized
text defeats exact dedup).
"""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from coa_ocr_simple_spark.plans.driver_queries_corpus import _nfc_udf

SF = "/root/testdata/sf0.001"


def test_nfc_branches_live_with_expected_shapes(spark):
    rows = entrymod.extra_queries()["nfc_normalize"](spark, SF).collect()
    spark.catalog.clearCache()
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for r in rows:
        a = agg[r["doc_id"] % 4]
        a[0] += r["is_changed"]
        a[1] += r["n_before"] - r["n_after"]
        a[2] += 1
    assert sorted(agg) == [0, 1, 2, 3]
    assert agg[0][0] == 0 and agg[0][1] == 0  # untouched
    assert agg[1][0] == agg[1][2] and agg[1][1] == agg[1][2]  # acute: -1 each
    assert agg[2][0] == agg[2][2] and agg[2][1] > agg[2][2]  # 1-2 rings
    # the compatibility singleton changes the text but NOT its length
    assert agg[3][0] == agg[3][2] and agg[3][1] == 0


def test_nfc_makes_spellings_hash_equal(spark):
    composed = "café Ångström"
    decomposed = "café Ångström"
    assert composed != decomposed
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed)], ["doc_id", "text"]
    ).select("doc_id", F.md5(_nfc_udf(F.col("text"))).alias("h"))
    h = {r["doc_id"]: r["h"] for r in df.collect()}
    assert h[1] == h[2]
