"""Emulate the driver's correctness gate locally.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on a PLAIN
SparkSession (no forklift_spark.session configs — this emulation gap is
how round 1's red rows shipped) and compares against ``oracle_sql()``
in DuckDB **through pandas**, the way the driver does it: Spark side via
``toPandas()``, DuckDB side via ``.df()``, both canonicalized by sorting
columns by name, ``sort_values`` over all columns, then a repr-exact
value hash. This reproduces the driver's failure modes that a
collect()/fetchall() repr-compare hides:

- dtype drift (DuckDB HUGEINT -> pandas float64 vs Spark int64 showed
  ``99111.0`` vs ``99111`` — r1/r2 ``q_json_extract`` red),
- unhashable cells (list-valued columns kill pandas sort_values — r2
  ``q_array_agg`` ERR).

Usage:
    python scripts/verify_driver.py            # all queries
    python scripts/verify_driver.py q1 q_hwm   # subset (prefix match ok)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(pdf):
    """Driver-style canonical frame: columns sorted by name, rows sorted
    by every column (this is the call that raises on unhashable cells).

    Date normalization: Spark DateType reaches pandas as object-dtype
    ``datetime.date`` while DuckDB DATE arrives as datetime64 — the r2
    driver hash-MATCHED date-keyed queries (q_date_funcs), so its compare
    does not distinguish these; convert date objects to datetime64 here
    to match that observed behavior (values still compared exactly)."""
    import datetime

    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype == object:
            vals = pdf[c].dropna()
            if len(vals) and all(
                isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
                for v in vals
            ):
                pdf = pdf.assign(**{c: pd.to_datetime(pdf[c])})
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _value_hash(pdf):
    """Repr-exact hash over the canonical frame — float64 1.0 vs int64 1
    hash differently, as they do for the driver."""
    lines = (
        "".join(repr(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _first_diff(a, b):
    """Human-readable first differing row between two canonical frames.
    itertuples, not .iloc — a row Series upcasts mixed dtypes and can
    repr-equal rows whose native cells differ."""
    for i, (ra, rb) in enumerate(
        zip(a.itertuples(index=False, name=None), b.itertuples(index=False, name=None))
    ):
        ra = tuple(repr(v) for v in ra)
        rb = tuple(repr(v) for v in rb)
        if ra != rb:
            return f"row {i}: {ra} vs {rb}"
    return f"length {len(a)} vs {len(b)}"


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    only = sys.argv[1:]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if any(k.startswith(o) for o in only)}

    results = {}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            if name in oracles:
                opdf = con.execute(oracles[name]).df()
                ok_rows = len(spdf) == len(opdf)
                ok_schema = sorted(spdf.columns) == sorted(opdf.columns)
                detail = ""
                ok_vals = False
                if ok_schema:
                    ca, cb = _canon(spdf), _canon(opdf)
                    ok_vals = _value_hash(ca) == _value_hash(cb)
                    if ok_rows and not ok_vals:
                        detail = _first_diff(ca, cb)
                status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
                if not ok_rows:
                    detail = f"rows {len(spdf)} vs {len(opdf)}"
                elif not ok_schema:
                    detail = f"schema {sorted(spdf.columns)} vs {sorted(opdf.columns)}"
                if status == "PASS":
                    n_pass += 1
                else:
                    n_fail += 1
                results[name] = {"status": status, "rows": len(spdf), "detail": detail}
            else:
                n_rows_only += 1
                results[name] = {"status": "ROWS_ONLY", "rows": len(spdf), "detail": ""}
        except Exception:
            n_fail += 1
            results[name] = {
                "status": "ERROR",
                "rows": None,
                "detail": traceback.format_exc().strip().splitlines()[-1],
            }
        results[name]["sec"] = round(time.time() - t0, 2)
        r = results[name]
        print(f"{r['status']:9s} {name:32s} rows={r['rows']} {r['sec']}s {r['detail'][:160]}", flush=True)

    print(
        json.dumps(
            {"pass": n_pass, "fail": n_fail, "rows_only": n_rows_only, "total": len(qs)}
        )
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
