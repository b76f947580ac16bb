"""pii_scan: independent Python reference agreement + proof that every
validity branch (bad octet, bad SSN area/group/serial, Luhn reject) is
actually exercised by the synthesized corpus."""

from __future__ import annotations

import hashlib
import re


def _luhn_ok(s: str) -> bool:
    tot = 0
    for j, ch in enumerate(reversed(s)):
        d = int(ch)
        if j % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        tot += d
    return tot % 10 == 0


def _ssn_ok(s: str) -> bool:
    area, group, serial = int(s[0:3]), int(s[4:6]), int(s[7:11])
    return area not in (0, 666) and area < 900 and group != 0 and serial != 0


def _ipv4_ok(s: str) -> bool:
    return all(int(o) <= 255 for o in s.split("."))


def _reference(doc_id: int) -> dict:
    from coa_ocr_simple_spark.plans.driver_queries_corpus import (
        _CC,
        _IPV4,
        _SCAN_TMPL,
        _SSN,
    )

    text = _SCAN_TMPL % (
        doc_id % 256,
        180 + doc_id % 120,
        doc_id % 300,
        doc_id,
        doc_id % 1000,
        doc_id % 100,
        doc_id % 10000,
        (4532000000000000 + doc_id * 99991) % 10**16,
        doc_id,
    )
    ips = re.findall(_IPV4, text)
    ssns = re.findall(_SSN, text)
    ccs = re.findall(_CC, text)
    red = re.sub(
        _IPV4, "<IP>", re.sub(_SSN, "<SSN>", re.sub(_CC, "<CC>", text))
    )
    return {
        "n_ipv4": len(ips),
        "n_ipv4_valid": sum(_ipv4_ok(s) for s in ips),
        "n_ssn": len(ssns),
        "n_ssn_valid": sum(_ssn_ok(s) for s in ssns),
        "n_cc": len(ccs),
        "n_cc_luhn_valid": sum(_luhn_ok(s) for s in ccs),
        "redacted_md5": hashlib.md5(red.encode()).hexdigest(),
    }


def test_pii_scan_matches_python_reference(spark):
    from coa_ocr_simple_spark.plans.driver_queries_corpus import pii_scan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r["doc_id"]: r.asDict() for r in pii_scan(docs).collect()}
    assert out
    for doc_id, row in out.items():
        ref = _reference(doc_id)
        got = {k: row[k] for k in ref}
        assert got == ref, (doc_id, got, ref)


def test_every_validity_branch_fires_at_sf0001(spark):
    """The synthesized corpus must exercise accept AND reject on all
    three validity checks, or the oracle match proves nothing."""
    from pyspark.sql import functions as F

    from coa_ocr_simple_spark.plans.driver_queries_corpus import pii_scan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    agg = (
        pii_scan(docs)
        .agg(
            F.sum("n_ipv4").alias("ip"),
            F.sum("n_ipv4_valid").alias("ipv"),
            F.sum("n_ssn").alias("ssn"),
            F.sum("n_ssn_valid").alias("ssnv"),
            F.sum("n_cc").alias("cc"),
            F.sum("n_cc_luhn_valid").alias("ccv"),
        )
        .collect()[0]
    )
    assert agg["ip"] > 0 and 0 < agg["ipv"] < agg["ip"]
    assert agg["ssn"] > 0 and 0 < agg["ssnv"] < agg["ssn"]
    assert agg["cc"] > 0 and 0 < agg["ccv"] < agg["cc"]
