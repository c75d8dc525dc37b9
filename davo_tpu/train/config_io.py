"""Declarative YAML experiment configs.

The reference drives experiments from ``configurations/*.yaml`` through a
bare ``LightningCLI`` (``lightning_cli.py:4-9``).  Here a YAML file selects
a named preset and overrides dataclass fields (including the nested
``solver:`` and ``scene:`` blocks), so the four canonical experiments ship
as editable files under ``configurations/`` while staying plain dataclasses
underneath:

.. code-block:: yaml

    preset: calibration_from_oracle_matches
    epochs: 100
    head: transformer
    solver:
      iterations: 20
      line_search_iterations: 30
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

__all__ = ["load_config_yaml", "apply_config_mapping"]

_RESERVED = {"preset"}


def _replace_nested(obj: Any, updates: Mapping[str, Any]) -> Any:
    if not dataclasses.is_dataclass(obj):
        raise TypeError(
            f"cannot apply a mapping to non-dataclass field value {obj!r}"
        )
    names = {f.name for f in dataclasses.fields(obj)}
    resolved = {}
    for key, value in updates.items():
        if key not in names:
            raise KeyError(
                f"unknown config field {key!r} for {type(obj).__name__}; "
                f"valid fields: {sorted(names)}"
            )
        current = getattr(obj, key)
        if isinstance(value, Mapping):
            value = _replace_nested(current, value)
        resolved[key] = value
    return dataclasses.replace(obj, **resolved)


def apply_config_mapping(config: Any, mapping: Mapping[str, Any]) -> Any:
    """Apply a (possibly nested) mapping of overrides to an experiment
    dataclass, validating every key against the dataclass fields."""
    payload = {k: v for k, v in mapping.items() if k not in _RESERVED}
    return _replace_nested(config, payload)


def load_config_yaml(path: str, base: Any = None) -> Any:
    """Build an experiment config from a YAML file.

    The optional top-level ``preset:`` key picks the starting preset
    (ignored when ``base`` is given); every other key overrides a field,
    with nested mappings recursing into nested dataclasses (``solver:``,
    ``scene:``).  Unknown keys raise.
    """
    import yaml

    with open(path) as f:
        mapping = yaml.safe_load(f) or {}
    if not isinstance(mapping, Mapping):
        raise TypeError(f"{path} must contain a YAML mapping, got {mapping!r}")
    if base is None:
        from .presets import get_preset

        base = get_preset(
            mapping.get("preset", "calibration_from_oracle_matches")
        )
    return apply_config_mapping(base, mapping)
