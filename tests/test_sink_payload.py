"""Sink payload projection matches the reference's Alchemy record shape
(app.py:1351-1414) including the default-value rules."""

from __future__ import annotations

import json

from coa_ocr_simple_spark.operators.sink_payload import alchemy_payload


def test_payload_shape_and_defaults(spark):
    extracted = spark.createDataFrame(
        [
            (
                "doc-1",
                {
                    "product_name": "Acetone",
                    "cas_number": "67-64-1",
                    "purity": "99.8%",
                    "lot_number": "AB123",
                },
            ),
            ("doc-2", {}),  # all defaults
        ],
        "doc_id string, entities map<string,string>",
    )
    rows = {r["doc_id"]: r for r in alchemy_payload(extracted).collect()}

    p1 = json.loads(rows["doc-1"]["payload_json"])
    assert p1["recordTemplate"] == "exampleParsing"
    props = {p["identifier"]: p for p in p1["properties"]}
    assert list(props) == ["RecordName", "CasNumber", "Purity", "LotNumber"]
    assert props["RecordName"]["rows"][0]["values"][0]["value"] == "Acetone"
    assert props["CasNumber"]["rows"][0]["values"][0]["value"] == "67-64-1"
    assert props["Purity"]["rows"][0]["row"] == 0
    assert props["LotNumber"]["rows"][0]["values"][0]["valuePreview"] == ""

    p2 = json.loads(rows["doc-2"]["payload_json"])
    props2 = {p["identifier"]: p for p in p2["properties"]}
    assert props2["RecordName"]["rows"][0]["values"][0]["value"] == "Unknown Product"
    # to_json drops null processId and empty-string defaults remain
    assert props2["CasNumber"]["rows"][0]["values"][0]["value"] == ""
