"""Time a subset of registry queries bench-style (2 passes, per-query
min, run-private shared store cleared between passes). Usage:

    python tools/time_subset.py [sf_dir] name1 name2 ...

Prints per-query seconds per pass plus the min — the local A/B loop
for chasing bench regressions without paying the full 183-query run.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_SHARED_DIR"] = tempfile.mkdtemp(
    prefix="spark_graft_subset_store_"
)

from instacart_medallion_lakehouse_spark import queries as q  # noqa: E402
from instacart_medallion_lakehouse_spark.session import build_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    spark = build_session("subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reg = q.queries()
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    mins: dict[str, float] = {}
    for p in range(2):
        q.clear_shared_store()
        for n in names:
            t0 = time.perf_counter()
            mat(reg[n](spark, sf_dir))
            dt = time.perf_counter() - t0
            q.release_pins()
            mins[n] = min(dt, mins.get(n, dt))
            sys.stderr.write(f"RESULT pass{p} {n}: {dt:.3f}s\n")
    sys.stderr.write("RESULT --- min ---\n")
    for n, v in mins.items():
        sys.stderr.write(f"RESULT {n}: {v:.3f}s\n")
    sys.stderr.write(f"RESULT total_min: {sum(mins.values()):.3f}s\n")
    spark.stop()
    q.clear_shared_store()


if __name__ == "__main__":
    main()
