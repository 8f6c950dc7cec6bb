"""Transformation hooks (reference U1-U3, `base/connection.rb:35-58`).

- ``.py`` file: must define ``do(connection, engine, args)`` (the analog
  of the reference's ``do!(connection, forklift, args)`` class contract,
  README.md:385-392) — full PySpark power inside.
- ``.sql`` file: delimiter-aware multi-statement script executed one
  ``spark.sql`` at a time, honoring ``DELIMITER x`` redefinitions
  (`transports/mysql.rb:234-249`). Statements the Spark catalog cannot
  express (CREATE INDEX, ...) warn-and-skip instead of failing
  (SURVEY §7 hard-part 6).
"""

from __future__ import annotations

import importlib.util
import os
import re

_UNSUPPORTED = re.compile(r"^\s*(create\s+(unique\s+)?index|drop\s+index)\b", re.IGNORECASE)


def split_sql_script(text: str) -> list[str]:
    """Split a SQL script into statements, honoring DELIMITER lines."""
    delimiter = ";"
    statements: list[str] = []
    buf: list[str] = []

    def flush():
        stmt = "\n".join(buf).strip()
        if stmt:
            statements.append(stmt)
        buf.clear()

    for line in text.splitlines():
        m = re.match(r"^\s*DELIMITER\s+(\S+)\s*$", line, re.IGNORECASE)
        if m:
            flush()
            delimiter = m.group(1)
            continue
        while delimiter in line:
            head, line = line.split(delimiter, 1)
            buf.append(head)
            flush()
        buf.append(line)
    flush()
    return statements


def run_sql_script(spark, path: str, logger=None, sql_fn=None) -> int:
    """``sql_fn`` overrides the statement runner — connections that
    expose richer SQL (ManifestConnection's time-travel rewrite) plug it
    in here so scripts can query their tables directly."""
    runner = sql_fn or spark.sql
    with open(path) as f:
        text = f.read()
    n = 0
    for stmt in split_sql_script(text):
        if _UNSUPPORTED.match(stmt):
            if logger:
                logger.log(f"skipping unsupported DDL: {stmt.splitlines()[0][:80]}")
            continue
        runner(stmt)
        n += 1
    return n


def run_py_transformation(connection, engine, path: str, *args) -> None:
    name = os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(f"forklift_transform_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not hasattr(mod, "do"):
        raise AttributeError(f"{path} must define do(connection, engine, *args)")
    mod.do(connection, engine, *args)


def run_transformation(connection, path: str, *args) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".py",):
        run_py_transformation(connection, connection.engine, path, *args)
    elif ext in (".sql",):
        run_sql_script(
            connection.engine.spark,
            path,
            logger=connection.engine.logger,
            sql_fn=getattr(connection, "sql", None),
        )
    else:
        raise ValueError(f"unknown transformation type {ext!r} ({path})")
