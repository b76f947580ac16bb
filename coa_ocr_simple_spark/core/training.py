"""Offline training — config-version builder (SURVEY.md §2.8, TR1-TR8).

The reference trains *in-place* on a mutable singleton and pickles it
(/root/reference/ai_document_processor.py:958-1126, 820-891).  Here every
training operation is a pure function ``ModelConfig -> ModelConfig`` run
by a driver-side utility (training data is tiny); the extract job pins one
config version, keeping distributed runs deterministic and resumable.

Timestamps are injected by the caller (``now`` parameter) so config
building is reproducible — never wall-clock inside.
"""

from __future__ import annotations

import re

from .config import ModelConfig
from .entities import discover_fields
from .fingerprint import document_fingerprint


def _copy(config: ModelConfig) -> dict:
    import copy

    return {
        "document_schemas": copy.deepcopy(config.document_schemas),
        "field_patterns": copy.deepcopy(config.field_patterns),
        "auto_trained_fields": {
            k: set(v) for k, v in config.auto_trained_fields.items()
        },
        "document_examples": copy.deepcopy(config.document_examples),
        "training_history": list(config.training_history),
    }


def _freeze(state: dict) -> ModelConfig:
    return ModelConfig(
        document_schemas=state["document_schemas"],
        field_patterns=state["field_patterns"],
        auto_trained_fields={
            k: sorted(v) for k, v in state["auto_trained_fields"].items()
        },
        document_examples=state["document_examples"],
        training_history=tuple(state["training_history"]),
    )


def _or_combine(old: str, new: str) -> str:
    """OR-combine two field patterns (TR2 retrain semantics, ai:1100-1104).

    The reference emits ``(?:old)|(?:new)`` verbatim, which is an *invalid*
    regex on Python >= 3.11 whenever the operands carry inline ``(?i)``
    flags (global flags must lead the expression) — a latent reference bug.
    We hoist the flag: strip leading ``(?i)`` from both operands and prefix
    it once.  Match semantics are equivalent and the pattern compiles.
    """

    def bare(p: str) -> str:
        return p[4:] if p.startswith("(?i)") else p

    return "(?i)(?:" + bare(old) + ")|(?:" + bare(new) + ")"


def create_context_pattern(text: str, field_name: str, value: str) -> str | None:
    """Context-aware pattern synthesis (TR3; ai:662-710): locate the value,
    capture up to 100 chars of left context, prefer the field name inside
    it, fall back to trailing-separator context, else the generic
    ``field name: value`` pattern."""
    if not text or not value:
        return None

    value_pos = text.find(value)
    if value_pos == -1:
        value_pos = text.lower().find(value.lower())
        if value_pos == -1:
            return r"(?i)" + field_name.replace("_", r"\s+") + r"\s*[:.]\s*([^\n]+)"

    context_before = text[max(0, value_pos - 100) : value_pos].strip()
    field_text = field_name.replace("_", " ")

    pattern_parts = []
    field_pos = context_before.lower().find(field_text.lower())
    if field_pos >= 0:
        pattern_parts.append(re.escape(context_before[field_pos:].strip()))
    else:
        for sep in (":", "-", "="):
            if context_before.endswith(sep):
                pattern_parts.append(re.escape(context_before[-20:].strip()))
                break

    if pattern_parts:
        return "(?i)" + pattern_parts[0] + r"\s*([^\n]+)"
    return "(?i)" + field_name.replace("_", r"\s+") + r"\s*[:.=]\s*([^\n]+)"


def create_extraction_pattern(
    text: str, value: str, context_before: str = "", context_after: str = ""
) -> str | None:
    """Line-bounded before/after context pattern synthesis (TR4;
    ai:1128-1191)."""
    if not text or not value:
        return None

    value_pos = text.find(value)
    if value_pos == -1:
        value_pos = text.lower().find(value.lower())
        if value_pos == -1:
            return r"([^\n]+)"

    if not context_before:
        start = text.rfind("\n", 0, value_pos)
        start = 0 if start == -1 else start + 1
        context_before = text[start:value_pos]
    if not context_after:
        end = text.find("\n", value_pos + len(value))
        end = len(text) if end == -1 else end
        context_after = text[value_pos + len(value) : end]

    before = re.escape(context_before.strip()) if context_before.strip() else ""
    after = re.escape(context_after.strip()) if context_after.strip() else ""

    if before and after:
        pattern = before + r"\s*([^\n]+?)\s*" + after
    elif before:
        pattern = before + r"\s*([^\n]+)"
    elif after:
        pattern = r"([^\n]+?)\s*" + after
    else:
        pattern = r"([^\n]+)"
    return "(?i)" + pattern


def train_from_annotations(
    config: ModelConfig, text: str, doc_type: str, annotations: dict, now: str
) -> ModelConfig:
    """TR1 (ai:958-1039): custom extraction patterns + context patterns from
    field mappings + stored fingerprinted examples + history event."""
    if not text or not doc_type:
        return config
    state = _copy(config)
    fingerprint = document_fingerprint(text)

    record = {
        "timestamp": now,
        "doc_type": doc_type,
        "annotation_count": len(annotations.get("field_mappings", {})),
        "fields": list(annotations.get("field_mappings", {}).keys()),
        "document_fingerprint": fingerprint,
    }

    for field_name, pattern in annotations.get("extraction_patterns", {}).items():
        state["field_patterns"].setdefault(doc_type, {})[field_name] = pattern
        schema = state["document_schemas"].get(doc_type)
        if schema and field_name not in schema["required_fields"]:
            schema["required_fields"].append(field_name)

    for field_name, value in annotations.get("field_mappings", {}).items():
        if not value or len(value) <= 3:
            continue
        pattern = create_context_pattern(text, field_name, value)
        if pattern:
            state["field_patterns"].setdefault(doc_type, {})[field_name] = pattern
        schema = state["document_schemas"].get(doc_type)
        if schema and field_name not in schema["required_fields"]:
            schema["required_fields"].append(field_name)
        examples = state["document_examples"].setdefault(doc_type, {}).setdefault(
            field_name, []
        )
        examples.append({"value": value, "fingerprint": fingerprint, "timestamp": now})

    if doc_type not in state["document_schemas"]:
        state["document_schemas"][doc_type] = {
            "sections": [],
            "required_fields": list(annotations.get("field_mappings", {}).keys()),
        }
        record["new_doc_type"] = True

    state["training_history"].append(record)
    return _freeze(state)


def train_from_field_value(
    config: ModelConfig,
    doc_type: str,
    field_name: str,
    text_example: str,
    value: str,
    now: str,
    context_before: str = "",
    context_after: str = "",
) -> ModelConfig:
    """TR2 (ai:1041-1126): synthesize an extraction pattern from one example;
    OR-combine ``(?:old)|(?:new)`` with any existing pattern."""
    if not doc_type or not field_name or not text_example:
        return config
    state = _copy(config)
    field_name = field_name.lower().strip()

    schema = state["document_schemas"].setdefault(
        doc_type,
        {"required_fields": [], "auto_trained": [], "field_patterns": {}, "sections": []},
    )
    if field_name not in schema["required_fields"]:
        schema["required_fields"].append(field_name)

    pattern = create_extraction_pattern(text_example, value, context_before, context_after)
    fingerprint = document_fingerprint(text_example)
    state["document_examples"].setdefault(doc_type, {}).setdefault(field_name, []).append(
        {
            "text": text_example,
            "value": value,
            "pattern": pattern,
            "context_before": context_before,
            "context_after": context_after,
            "fingerprint": fingerprint,
            "timestamp": now,
        }
    )

    patterns = state["field_patterns"].setdefault(doc_type, {})
    if field_name in patterns:
        patterns[field_name] = _or_combine(patterns[field_name], pattern)
    else:
        patterns[field_name] = pattern

    state["training_history"].append(
        {
            "timestamp": now,
            "doc_type": doc_type,
            "field": field_name,
            "action": "manual_train",
            "pattern": pattern,
            "value": value,
        }
    )
    return _freeze(state)


def auto_train_all_fields(
    config: ModelConfig, text: str, doc_type: str, now: str
) -> ModelConfig:
    """TR5 (ai:820-891) as an *offline* step: discover fields, extend the
    schema, synthesize context patterns.  Never runs mid-extract
    (SURVEY.md §4.3.1)."""
    if not text or not doc_type:
        return config
    state = _copy(config)

    existing = set(
        state["document_schemas"].get(doc_type, {}).get("required_fields", [])
    )
    auto_fields = discover_fields(text, doc_type, existing)
    if not auto_fields:
        return config

    schema = state["document_schemas"].setdefault(
        doc_type, {"sections": [], "required_fields": [], "auto_trained": []}
    )
    schema.setdefault("auto_trained", [])

    for field_name, value in auto_fields.items():
        if field_name in schema["required_fields"]:
            continue
        schema["required_fields"].append(field_name)
        schema["auto_trained"].append(field_name)
        pattern = create_context_pattern(
            text, field_name, value if isinstance(value, str) else ""
        )
        state["field_patterns"].setdefault(doc_type, {})[field_name] = pattern
        state["auto_trained_fields"].setdefault(doc_type, set()).add(field_name)
        state["training_history"].append(
            {
                "timestamp": now,
                "doc_type": doc_type,
                "field": field_name,
                "action": "auto_train",
                "pattern": pattern,
                "value": value if isinstance(value, str) else "<table>",
            }
        )
    return _freeze(state)


def reset_document_schema(config: ModelConfig, doc_type: str, now: str) -> ModelConfig:
    """TR7 (ai:1270-1301): drop a doc type from all four stores + history."""
    state = _copy(config)
    state["document_schemas"].pop(doc_type, None)
    state["field_patterns"].pop(doc_type, None)
    state["document_examples"].pop(doc_type, None)
    state["auto_trained_fields"].pop(doc_type, None)
    state["training_history"].append(
        {"timestamp": now, "doc_type": doc_type, "action": "reset_schema"}
    )
    return _freeze(state)


def set_field_pattern(
    config: ModelConfig, doc_type: str, field_name: str, pattern: str, now: str
) -> ModelConfig:
    """TR8 (app.py:883-963): direct pattern upsert + history event."""
    state = _copy(config)
    state["field_patterns"].setdefault(doc_type, {})[field_name] = pattern
    schema = state["document_schemas"].setdefault(
        doc_type, {"sections": [], "required_fields": []}
    )
    if field_name not in schema["required_fields"]:
        schema["required_fields"].append(field_name)
    state["training_history"].append(
        {
            "timestamp": now,
            "doc_type": doc_type,
            "field": field_name,
            "action": "update_pattern",
            "pattern": pattern,
        }
    )
    return _freeze(state)
