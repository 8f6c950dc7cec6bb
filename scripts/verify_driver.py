"""Emulate the driver's correctness gate locally.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on a PLAIN
SparkSession (no forklift_spark.session configs — this emulation gap is
how round 1's red rows shipped) and compares against ``oracle_sql()``
in DuckDB: row count, sorted column names, and order-insensitive
repr-exact values, like the driver's hash compare.

Usage:
    python scripts/verify_driver.py            # all queries
    python scripts/verify_driver.py q1 q_hwm   # subset (prefix match ok)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _rows_key(cols, rows):
    """Order-insensitive, column-name-sorted, repr-exact row multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


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
            scols = sdf.columns
            srows = sdf.collect()
            if name in oracles:
                odf = con.execute(oracles[name]).fetchall()
                ocols = [d[0] for d in con.description]
                ok_rows = len(srows) == len(odf)
                ok_schema = sorted(scols) == sorted(ocols)
                ok_vals = ok_schema and _rows_key(scols, srows) == _rows_key(ocols, odf)
                status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
                detail = ""
                if not ok_rows:
                    detail = f"rows {len(srows)} vs {len(odf)}"
                elif not ok_schema:
                    detail = f"schema {sorted(scols)} vs {sorted(ocols)}"
                elif not ok_vals:
                    a, b = _rows_key(scols, srows), _rows_key(ocols, odf)
                    diff = next(
                        (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                    )
                    if diff is not None:
                        detail = f"value diff at sorted row {diff}: {a[diff]} vs {b[diff]}"
                    else:
                        detail = "value diff (length mismatch after zip?)"
                if status == "PASS":
                    n_pass += 1
                else:
                    n_fail += 1
                results[name] = {"status": status, "rows": len(srows), "detail": detail}
            else:
                n_rows_only += 1
                results[name] = {"status": "ROWS_ONLY", "rows": len(srows), "detail": ""}
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
