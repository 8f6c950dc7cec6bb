"""Connection registry: typed endpoints built from YAML config.

Parity with the reference's transport discovery (`plan.rb:24-44` +
`base/connection.rb:3-33`): configs live at
``config/connections/<type>/<name>.yml`` (``${ENV_VAR}`` interpolated,
the analog of the reference's ERB pass), are auto-discovered, and become
typed Connection objects addressable as ``engine.connections[type][name]``.
Files named ``example.yml`` are skipped and a bad config logs an error
instead of raising, so a step's error handler owns the failure
(`plan.rb:39-42` semantics).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any

import yaml

from forklift_spark.connections.base import Connection
from forklift_spark.connections.columnar import AvroConnection, OrcConnection
from forklift_spark.connections.csvfile import CsvConnection
from forklift_spark.connections.jdbc import JdbcConnection
from forklift_spark.connections.manifest import ManifestConnection
from forklift_spark.connections.jsonl import JsonlConnection
from forklift_spark.connections.parquet import ParquetConnection
from forklift_spark.connections.deltalite import DeltaLiteConnection
from forklift_spark.connections.elasticsearch import ElasticsearchConnection
from forklift_spark.connections.iceberglite import IcebergLiteConnection
from forklift_spark.connections.pgwire import PostgresConnection

CONNECTION_TYPES: dict[str, type[Connection]] = {
    "delta": DeltaLiteConnection,
    "iceberg": IcebergLiteConnection,
    "postgres": PostgresConnection,
    "parquet": ParquetConnection,
    "manifest": ManifestConnection,
    "csv": CsvConnection,
    "jsonl": JsonlConnection,
    "orc": OrcConnection,
    "avro": AvroConnection,
    "jdbc": JdbcConnection,
    "mysql": JdbcConnection,  # alias: reference's mysql transport -> JDBC
    "elasticsearch": ElasticsearchConnection,
}

_ENV_RE = re.compile(r"\$\{(\w+)(?::-([^}]*))?\}")


def _interpolate(text: str) -> str:
    def sub(m: re.Match) -> str:
        return os.environ.get(m.group(1), m.group(2) or "")

    return _ENV_RE.sub(sub, text)


def load_config(path: str) -> dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(_interpolate(f.read())) or {}


def discover(engine, project_root: str) -> dict[str, dict[str, Connection]]:
    """Scan config/connections/<type>/<name>.yml into typed connections."""
    out: dict[str, dict[str, Connection]] = {}
    pattern = os.path.join(project_root, "config", "connections", "*", "*.yml")
    for path in sorted(glob.glob(pattern)):
        name = os.path.splitext(os.path.basename(path))[0]
        ctype = os.path.basename(os.path.dirname(path))
        if name == "example":
            continue
        cls = CONNECTION_TYPES.get(ctype)
        if cls is None:
            engine.logger.error(f"unknown connection type {ctype!r} at {path}")
            continue
        try:
            conn = cls(load_config(path), engine, name=name)
            out.setdefault(ctype, {})[name] = conn
        except Exception as exc:  # log, don't raise (plan.rb:39-42)
            engine.logger.error(f"cannot connect {ctype}/{name}: {exc}")
    return out


__all__ = [
    "Connection",
    "ParquetConnection",
    "CsvConnection",
    "JsonlConnection",
    "OrcConnection",
    "AvroConnection",
    "JdbcConnection",
    "DeltaLiteConnection",
    "ElasticsearchConnection",
    "PostgresConnection",
    "CONNECTION_TYPES",
    "discover",
    "load_config",
]
