"""Engine: session + config + connection registry (reference O1).

``Plan.new(config)`` in the reference merges user config over defaults
(`plan.rb:6-14,145-155`); Engine does the same and owns the SparkSession.
``batch_size`` has no engine meaning anymore (Spark sizes partitions) but
is accepted and surfaced for JDBC fetch/batch sizing.
"""

from __future__ import annotations

import os
from typing import Any

from forklift_spark.logger import EngineLogger
from forklift_spark.session import get_spark

DEFAULTS: dict[str, Any] = {
    "project_root": ".",
    "batch_size": 10_000,  # JDBC fetchsize/batchsize hint only
    "logger": {"stdout": True, "debug": False},
}


class Engine:
    def __init__(self, config: dict[str, Any] | None = None, spark=None):
        self.config = {**DEFAULTS, **(config or {})}
        log_cfg = {**DEFAULTS["logger"], **(self.config.get("logger") or {})}
        self.logger = EngineLogger(
            debug=log_cfg["debug"],
            stdout=log_cfg["stdout"],
            file_path=log_cfg.get("file"),
        )
        self._spark = spark
        self.connections: dict[str, dict[str, Any]] = {}

    @property
    def spark(self):
        if self._spark is None:
            self._spark = get_spark()
        return self._spark

    @property
    def project_root(self) -> str:
        return os.path.abspath(self.config["project_root"])

    # -- connections (O2 connect!) ----------------------------------------
    def connect_all(self) -> None:
        from forklift_spark.connections import discover

        self.connections = discover(self, self.project_root)

    def connection(self, ctype: str, name: str):
        return self.connections[ctype][name]

    def add_connection(self, ctype: str, name: str, conn) -> None:
        self.connections.setdefault(ctype, {})[name] = conn

    def disconnect_all(self) -> None:
        for group in self.connections.values():
            for conn in group.values():
                conn.disconnect()
