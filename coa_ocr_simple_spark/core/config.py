"""Frozen model configuration.

The reference keeps trainable state in a mutable, pickled singleton
(/root/reference/ai_document_processor.py:45-49, 94-126) and *mutates it
mid-request* (ai:1249-1250) — order-dependent and unreproducible at scale
(SURVEY.md §4.3.1).  Our engine pins one immutable config per job run: the
driver loads it once, broadcasts it, and every partition sees identical
state.  Training (see ``training.py``) emits a *new* config version —
never a mid-job mutation — so re-running a partition is idempotent, which
checkpoint-resume requires.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ModelConfig:
    """Immutable per-job model state.

    document_schemas: doc_type -> {"sections": [...], "required_fields": [...],
                                   "auto_trained": [...]}           (ai:45)
    field_patterns:   doc_type -> field -> regex                     (ai:48)
    auto_trained_fields: doc_type -> sorted list of field names      (ai:49)
    document_examples: doc_type -> field -> [{"value", "fingerprint", ...}]
                                                                     (ai:47)
    """

    document_schemas: dict = field(default_factory=dict)
    field_patterns: dict = field(default_factory=dict)
    auto_trained_fields: dict = field(default_factory=dict)
    document_examples: dict = field(default_factory=dict)
    training_history: tuple = ()

    def auto_trained(self, doc_type: str) -> frozenset:
        return frozenset(self.auto_trained_fields.get(doc_type, ()))

    def to_json(self) -> str:
        return json.dumps(
            {
                "document_schemas": self.document_schemas,
                "field_patterns": self.field_patterns,
                "auto_trained_fields": {
                    k: sorted(v) for k, v in self.auto_trained_fields.items()
                },
                "document_examples": self.document_examples,
                "training_history": list(self.training_history),
            },
            indent=2,
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, payload: str) -> "ModelConfig":
        raw = json.loads(payload)
        return cls(
            document_schemas=raw.get("document_schemas", {}),
            field_patterns=raw.get("field_patterns", {}),
            auto_trained_fields=raw.get("auto_trained_fields", {}),
            document_examples=raw.get("document_examples", {}),
            training_history=tuple(raw.get("training_history", ())),
        )

    @classmethod
    def load(cls, path: str) -> "ModelConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_json(f.read())

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_json())


EMPTY_CONFIG = ModelConfig()
