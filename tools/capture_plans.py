"""Capture explain('formatted') for a list of queries to plans/<dir>.

Usage: python tools/capture_plans.py <outdir> <suffix> <query> [query ...]
Measurement-only helper for the optimization rounds (guide §1/§7.2).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crick_spark.plans import QUERIES  # noqa: E402
from crick_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("crick-spark-plans")
    for name in names:
        buf = io.StringIO()
        with redirect_stdout(buf):
            QUERIES[name].fn(spark, SF_DIR).explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
