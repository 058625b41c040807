"""Flat INI hyperparameter config (SURVEY §1 row 8).

Reference parity: ``src/parameters.ini`` + ``src/main.py ::
load_parameters`` (≈L65–180) — a flat key set with string coercion and
compatibility checks. Keys the inference-first engine does not use
(optimizer, learning rate, dropout, patience…) are accepted and
recorded but ignored, so an existing reference parameters.ini loads
unchanged.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field

# reference defaults (public parameters.ini)
_DEFAULTS = {
    "character_embedding_dimension": "25",
    "character_lstm_hidden_state_dimension": "25",
    "token_embedding_dimension": "100",
    "token_lstm_hidden_state_dimension": "100",
    "use_character_lstm": "true",
    "use_crf": "true",
    "tagging_format": "bioes",
    "tokenizer": "regex",
    "main_evaluation_mode": "conll",
    "remap_unknown_tokens_to_unk": "true",
    "remap_to_unk_count_threshold": "1",
    "seed": "42",
}

_BOOL = {"use_character_lstm", "use_crf", "remap_unknown_tokens_to_unk"}
_INT = {
    "character_embedding_dimension",
    "character_lstm_hidden_state_dimension",
    "token_embedding_dimension",
    "token_lstm_hidden_state_dimension",
    "remap_to_unk_count_threshold",
    "seed",
}


@dataclass
class EngineConfig:
    use_crf: bool = True
    tagging_format: str = "bioes"
    tokenizer: str = "regex"
    main_evaluation_mode: str = "conll"
    remap_unknown_tokens_to_unk: bool = True
    remap_to_unk_count_threshold: int = 1
    seed: int = 42
    character_embedding_dimension: int = 25
    character_lstm_hidden_state_dimension: int = 25
    token_embedding_dimension: int = 100
    token_lstm_hidden_state_dimension: int = 100
    extra: dict = field(default_factory=dict)

    def check(self) -> None:
        """``check_parameter_compatibility`` analog — the model module
        is generated at the reference's fixed dimensions."""
        if self.tagging_format not in ("bio", "bioes"):
            raise ValueError(f"tagging_format must be bio|bioes, got {self.tagging_format}")
        if self.main_evaluation_mode not in ("conll", "token", "binary"):
            raise ValueError(f"bad main_evaluation_mode {self.main_evaluation_mode}")
        fixed = {
            "character_embedding_dimension": 25,
            "character_lstm_hidden_state_dimension": 25,
            "token_embedding_dimension": 100,
            "token_lstm_hidden_state_dimension": 100,
        }
        for k, v in fixed.items():
            if getattr(self, k) != v:
                raise ValueError(f"{k}={getattr(self, k)} unsupported (engine is built at {v})")


def load_parameters(path: str | None = None, overrides: dict | None = None) -> EngineConfig:
    """INI -> EngineConfig with type coercion; CLI overrides win
    (reference ``main.py`` behavior)."""
    raw = dict(_DEFAULTS)
    if path:
        cp = configparser.ConfigParser()
        cp.read(path)
        for section in cp.sections():
            raw.update(dict(cp[section]))
    raw.update({k: str(v) for k, v in (overrides or {}).items()})
    known = {f.name for f in EngineConfig.__dataclass_fields__.values()} - {"extra"}
    kwargs, extra = {}, {}
    for k, v in raw.items():
        if k in _BOOL:
            v = str(v).strip().lower() in ("1", "true", "yes")
        elif k in _INT:
            v = int(v)
        (kwargs if k in known else extra)[k] = v
    cfg = EngineConfig(**kwargs, extra=extra)
    cfg.check()
    return cfg
