"""Config system: JSON file + environment overrides.

Mirrors the reference's pattern (src/iceberg_explorer/config.py:20-169):
a JSON file named by ``ICEBERG_EXPLORER_SPARK_CONFIG`` merged with
env-var overrides using ``__`` section nesting
(``IES_QUERY__MAX_ROWS=5000`` → query.max_rows), without the pydantic
dependency. The reference's ``duckdb`` section maps to ``spark`` conf here.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, fields
from typing import Any, Optional

ENV_CONFIG_PATH = "ICEBERG_EXPLORER_SPARK_CONFIG"
ENV_PREFIX = "IES_"


@dataclass
class CatalogConfig:
    name: str = "lake"
    type: str = "hadoop"  # hadoop | rest  (reference config.py:20-24)
    uri: Optional[str] = None
    warehouse: Optional[str] = None


@dataclass
class QueryConfig:
    max_rows: int = 10_000  # reference declares 10k but never enforces it
    default_timeout: float = 300.0
    min_timeout: float = 10.0
    max_timeout: float = 3600.0


@dataclass
class SparkConfig:
    master: Optional[str] = None
    shuffle_partitions: Optional[int] = None
    extra: dict[str, str] = field(default_factory=dict)


@dataclass
class ExportConfig:
    max_size_bytes: int = 1_073_741_824  # 1 GB, reference config.py:110-114


@dataclass
class Settings:
    catalog: CatalogConfig = field(default_factory=CatalogConfig)
    query: QueryConfig = field(default_factory=QueryConfig)
    spark: SparkConfig = field(default_factory=SparkConfig)
    export: ExportConfig = field(default_factory=ExportConfig)


def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, dict):
        return json.loads(value)
    return value


def load_settings(
    path: Optional[str] = None, env: Optional[dict[str, str]] = None
) -> Settings:
    """JSON file (optional) + env overrides (reference config.py:134-169)."""
    env = env if env is not None else dict(os.environ)
    settings = Settings()

    cfg_path = path or env.get(ENV_CONFIG_PATH)
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            data = json.load(fh)
        for section_field in fields(settings):
            section = getattr(settings, section_field.name)
            for key, value in (data.get(section_field.name) or {}).items():
                if hasattr(section, key):
                    setattr(section, key, value)

    for raw_key, value in env.items():
        if not raw_key.startswith(ENV_PREFIX) or "__" not in raw_key:
            continue
        section_name, _, attr = raw_key[len(ENV_PREFIX):].partition("__")
        section = getattr(settings, section_name.lower(), None)
        if section is None or not hasattr(section, attr.lower()):
            continue
        current = getattr(section, attr.lower())
        setattr(section, attr.lower(), _coerce(value, current))
    return settings
