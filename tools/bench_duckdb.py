"""Time each oracle_sql() query in DuckDB at a given sf dir — the
effective performance baseline (BASELINE.md: the reference publishes no
timings, so the bar is 2x DuckDB on identical SQL).

Usage: python tools/bench_duckdb.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

from instacart_medallion_lakehouse_spark import queries as q  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings = {}
    total = 0.0
    for name, sql in q.oracle_sql().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
    print(json.dumps({"total": round(total, 3), "queries": timings}))


if __name__ == "__main__":
    main()
