"""Capture .explain("formatted") for named catalog queries into
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit (judge checks plan claims against these).

Usage: python scripts/capture_plans.py <tag> <before|after> q1 q2 ...
Builds each query at $PLAN_SF_DIR (default sf0.001 — plan SHAPE is
scale-independent; building at sf0.001 keeps side-effect queries cheap)
and writes the formatted plan of the RETURNED DataFrame.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from forklift_spark import queries as Q
    from forklift_spark.session import get_spark

    spark = get_spark(app_name=f"capture_plans_{tag}")
    cat = Q.catalog()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in cat:
            print(f"SKIP unknown {name}")
            continue
        try:
            df = cat[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"WROTE {path}")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")


if __name__ == "__main__":
    main()
