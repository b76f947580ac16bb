"""config_cli end-to-end (no Spark): train -> add-rule -> auto-train ->
info/history -> export/import -> reset."""

from __future__ import annotations

from coa_ocr_simple_spark.core.config import ModelConfig
from coa_ocr_simple_spark.jobs.config_cli import main

NOW = ["--now", "2026-01-01 00:00:00"]


def test_cli_roundtrip(tmp_path, capsys):
    config_path = str(tmp_path / "c.json")
    example = tmp_path / "ex.txt"
    example.write_text(
        "Certificate of Analysis\npH Value: 6.8\nLot Number: L1\n" + "x" * 60
    )

    assert main(["train", "--config", config_path, "--doc-type", "coa",
                 "--field", "ph_value", "--text-file", str(example),
                 "--value", "6.8", *NOW]) == 0
    assert main(["add-rule", "--config", config_path, "--doc-type", "coa",
                 "--field", "color", "--pattern", r"(?i)Color\s*[:.]\s*(\w+)",
                 *NOW]) == 0
    assert main(["auto-train", "--config", config_path, "--doc-type", "coa",
                 "--text-file", str(example), *NOW]) == 0

    config = ModelConfig.load(config_path)
    required = config.document_schemas["coa"]["required_fields"]
    assert "ph_value" in required and "color" in required
    assert "lot_number" in required  # auto-trained
    assert config.field_patterns["coa"]["color"] == r"(?i)Color\s*[:.]\s*(\w+)"
    assert len(config.training_history) >= 3

    main(["info", "--config", config_path])
    out = capsys.readouterr().out
    assert "coa" in out and "ph_value" in out

    main(["history", "--config", config_path, "--last", "2"])
    out = capsys.readouterr().out
    assert "coa" in out

    export_path = str(tmp_path / "dump.json")
    assert main(["export", "--config", config_path, "--out", export_path]) == 0
    config2_path = str(tmp_path / "c2.json")
    assert main(["import", "--config", config2_path, "--from", export_path]) == 0
    assert ModelConfig.load(config2_path).field_patterns == config.field_patterns

    assert main(["reset", "--config", config_path, "--doc-type", "coa", *NOW]) == 0
    config = ModelConfig.load(config_path)
    assert "coa" not in config.document_schemas
    assert config.training_history[-1]["action"] == "reset_schema"
