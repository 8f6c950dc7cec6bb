"""Transformation hooks (U1-U3): SQL script splitter with DELIMITER,
.py do() contract, unsupported-DDL skip."""

from __future__ import annotations

import pytest

from forklift_spark.connections.parquet import ParquetConnection
from forklift_spark.engine import Engine
from forklift_spark.transform import run_sql_script, split_sql_script


def test_split_basic():
    assert split_sql_script("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]


def test_split_delimiter_redefinition():
    # `transports/mysql.rb:236-248`: DELIMITER $$ blocks keep inner `;`
    text = """
DELIMITER $$
CREATE PROCEDURE p()
BEGIN
  SELECT 1;
  SELECT 2;
END$$
DELIMITER ;
SELECT 3;
"""
    stmts = split_sql_script(text)
    assert len(stmts) == 2
    assert "SELECT 1;" in stmts[0] and "SELECT 2;" in stmts[0]
    assert stmts[1] == "SELECT 3"


def test_split_multiline_statement():
    stmts = split_sql_script("SELECT\n  1\n;\nSELECT 2;")
    assert len(stmts) == 2


def test_run_sql_script_skips_unsupported_ddl(spark, tmp_path):
    # CREATE INDEX (combined_name.sql:7) must warn-and-skip, not fail
    p = tmp_path / "t.sql"
    p.write_text(
        "CREATE TEMP VIEW _fs_t AS SELECT 1 AS a;\n"
        "CREATE INDEX idx ON t (a);\n"
        "SELECT * FROM _fs_t;\n"
    )
    n = run_sql_script(spark, str(p))
    assert n == 2  # index statement skipped
    assert spark.sql("SELECT * FROM _fs_t").collect()[0]["a"] == 1


def test_py_transformation_do_contract(spark, tmp_path):
    eng = Engine({"project_root": str(tmp_path)}, spark=spark)
    conn = ParquetConnection({"path": str(tmp_path / "wh")}, eng)
    p = tmp_path / "add_table.py"
    p.write_text(
        "def do(connection, engine, *args):\n"
        "    df = engine.spark.range(5).withColumnRenamed('id', 'n')\n"
        "    connection.write(df, 'five', mode='overwrite')\n"
    )
    conn.exec_strict(str(p))
    assert conn.count("five") == 5


def test_exec_swallows_exec_strict_raises(spark, tmp_path):
    # exec logs + continues, exec! raises (`base/connection.rb:35-51`)
    eng = Engine({"project_root": str(tmp_path)}, spark=spark)
    conn = ParquetConnection({"path": str(tmp_path / "wh")}, eng)
    p = tmp_path / "boom.py"
    p.write_text("def do(connection, engine, *args):\n    raise ValueError('boom')\n")
    assert conn.exec(str(p)) is False
    with pytest.raises(ValueError):
        conn.exec_strict(str(p))
    bad = tmp_path / "no_do.py"
    bad.write_text("x = 1\n")
    with pytest.raises(AttributeError):
        conn.exec_strict(str(bad))
