"""Pipeline-spec file loading (SURVEY §2.A1).

The reference parses its procedure-definition XML from HDFS or the
local filesystem (``OpContainer.java:226-262``,
``OpContainerTest.java:176-191``). The engine's spec is a plain dict;
this module loads it from JSON (and YAML when available) files — XML
was an accident of the reference, not a capability (SURVEY §2.A1).
"""

from __future__ import annotations

import json
import os


def load_spec(path: str) -> dict:
    """Load a pipeline spec from a .json / .yaml / .yml file."""
    ext = os.path.splitext(path)[1].lower()
    with open(path) as fh:
        if ext == ".json":
            return json.load(fh)
        if ext in (".yaml", ".yml"):
            try:
                import yaml
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "YAML spec requires pyyaml; use JSON in this environment"
                ) from exc
            return yaml.safe_load(fh)
    raise ValueError(f"unsupported spec format: {path!r} (use .json/.yaml)")


def dump_spec(spec: dict, path: str) -> None:
    """Write a pipeline spec as JSON (round-trips with load_spec)."""
    with open(path, "w") as fh:
        json.dump(spec, fh, indent=2)
