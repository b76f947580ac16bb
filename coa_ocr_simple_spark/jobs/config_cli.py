"""Model-config CLI — the engine's counterpart of the reference's
model_manager.py (/root/reference/model_manager.py:208-255), operating on
the frozen JSON config (core/config.py) instead of a mutable pickle.

  python -m coa_ocr_simple_spark.jobs.config_cli info      --config c.json
  python -m coa_ocr_simple_spark.jobs.config_cli export    --config c.json --out dump.json
  python -m coa_ocr_simple_spark.jobs.config_cli import    --config c.json --from dump.json
  python -m coa_ocr_simple_spark.jobs.config_cli reset     --config c.json --doc-type coa
  python -m coa_ocr_simple_spark.jobs.config_cli add-rule  --config c.json --doc-type coa \
         --field ph_value --pattern '(?i)pH\\s*[:.]\\s*([\\d.]+)'
  python -m coa_ocr_simple_spark.jobs.config_cli train     --config c.json --doc-type coa \
         --field ph_value --text-file example.txt --value 6.8
  python -m coa_ocr_simple_spark.jobs.config_cli auto-train --config c.json --doc-type coa \
         --text-file example.txt
  python -m coa_ocr_simple_spark.jobs.config_cli history   --config c.json [--last 3]

Note: the reference's ``add-rule`` dispatches to a method that does not
exist (model_manager.py:159 -> AIDocumentProcessor.add_extraction_rule,
a latent AttributeError); here it implements the working TR8 semantics
(app.py:923-931).  Timestamps come from --now or the wall clock at the
CLI boundary only — the emitted config itself is frozen.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timezone

from ..core.config import EMPTY_CONFIG, ModelConfig
from ..core.training import (
    auto_train_all_fields,
    reset_document_schema,
    set_field_pattern,
    train_from_field_value,
)


def _load(path: str) -> ModelConfig:
    return ModelConfig.load(path) if os.path.exists(path) else EMPTY_CONFIG


def cmd_info(config: ModelConfig, args) -> None:
    print(f"Document types: {len(config.document_schemas)}")
    for doc_type, schema in sorted(config.document_schemas.items()):
        required = schema.get("required_fields", [])
        auto = schema.get("auto_trained", [])
        print(f"  {doc_type}: {len(required)} fields ({len(auto)} auto-trained)")
        for f in required:
            marker = "*" if f in auto else " "
            print(f"    {marker} {f}")
    print(f"Training events: {len(config.training_history)}")


def cmd_history(config: ModelConfig, args) -> None:
    events = list(config.training_history)
    by_type: dict[str, int] = {}
    for e in events:
        by_type[e.get("doc_type", "?")] = by_type.get(e.get("doc_type", "?"), 0) + 1
    for doc_type in sorted(by_type):
        print(f"{doc_type}: {by_type[doc_type]} events")
    for e in events[-args.last :]:
        print(json.dumps(e, sort_keys=True))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="frozen model-config utility")
    p.add_argument("command", choices=[
        "info", "export", "import", "reset", "add-rule", "train", "auto-train",
        "history",
    ])
    p.add_argument("--config", default=None)
    p.add_argument(
        "--tenant",
        default=None,
        help="resolve --config as {config-dir}/{tenant}_model_config.json "
        "(reference get_tenant_processor naming, app.py:261-301)",
    )
    p.add_argument("--config-dir", default=".")
    p.add_argument("--out")
    p.add_argument("--from", dest="from_path")
    p.add_argument("--doc-type")
    p.add_argument("--field")
    p.add_argument("--pattern")
    p.add_argument("--text-file")
    p.add_argument("--value")
    p.add_argument("--last", type=int, default=3)
    p.add_argument("--now", help="override timestamp (reproducible builds)")
    args = p.parse_args(argv)

    if args.tenant:
        from .extract import tenant_config_path

        args.config = tenant_config_path(args.config_dir, args.tenant)
    if not args.config:
        p.error("--config or --tenant is required")

    now = args.now or datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    config = _load(args.config)

    def text() -> str:
        with open(args.text_file, "r", encoding="utf-8") as f:
            return f.read()

    if args.command == "info":
        cmd_info(config, args)
        return 0
    if args.command == "history":
        cmd_history(config, args)
        return 0
    if args.command == "export":
        config.save(args.out or "model_config_export.json")
        print(f"exported to {args.out or 'model_config_export.json'}")
        return 0
    if args.command == "import":
        ModelConfig.load(args.from_path).save(args.config)
        print(f"imported {args.from_path} -> {args.config}")
        return 0
    if args.command == "reset":
        config = reset_document_schema(config, args.doc_type, now)
    elif args.command == "add-rule":
        config = set_field_pattern(config, args.doc_type, args.field, args.pattern, now)
    elif args.command == "train":
        config = train_from_field_value(
            config, args.doc_type, args.field, text(), args.value, now
        )
    elif args.command == "auto-train":
        config = auto_train_all_fields(config, text(), args.doc_type, now)
    config.save(args.config)
    print(f"updated {args.config}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
