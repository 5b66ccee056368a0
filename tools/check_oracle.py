"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
against the same sf dir, then compares row count + column names + an
order-insensitive multiset of stringified rows (exact value equality —
stricter than any hash the driver could use).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, ".")

from instacart_medallion_lakehouse_spark import queries as q  # noqa: E402
from instacart_medallion_lakehouse_spark.session import build_session  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Type-STRICT canonicalization: an int and an int-valued float canon
    differently ('5' vs '5.0'), mirroring the driver's type-sensitive
    value hash. Round-1 lesson: the old int-valued-float normalization
    hid the DuckDB HUGEINT (-> Arrow double) vs Spark BIGINT mismatch
    that failed 9 queries at the driver (VERDICT.md r1 #1)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        # DuckDB HUGEINT (un-CAST sum of integers) crosses Arrow as
        # decimal128(38,0) -> Python Decimal. The driver's hash is
        # type-sensitive, so Decimal('5') must NOT canon equal to int 5
        # — that exact blindness shipped two red oracles in r11
        # (VERDICT r11 #1: k_anonymity_profile, stream_window_topk).
        return f"DECIMAL:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 9)
        if r == 0.0:
            r = 0.0  # collapse -0.0
        return repr(r)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def df_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_PLAIN"):
        # driver-replica mode: a PLAIN session (no tuned factory), the
        # way the driver actually runs queries — catches accidental
        # dependencies on build_session's conf choices
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    else:
        spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = q.queries(), q.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            rows = fn(spark, sf_dir).count()
            print(f"{name:28s} ROWS-ONLY rows={rows}")
            n_skip += 1
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            # Fetch through Arrow, like the driver: DuckDB HUGEINT has no
            # Arrow integer type and degrades to double, so an un-CAST
            # sum(INTEGER) oracle surfaces here as 5.0 vs Spark's 5.
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            d_cols = list(tbl.column_names)
            d_pylist = tbl.to_pylist()
            d_rows = [tuple(d[c] for c in d_cols) for d in d_pylist]
        except Exception as e:
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            ms, md = df_to_multiset(s_cols, s_rows), df_to_multiset(d_cols, d_rows)
            if ms != md:
                extra_s = list((ms - md).items())[:3]
                extra_d = list((md - ms).items())[:3]
                problems.append(f"values spark-only={extra_s} duck-only={extra_d}")
        if problems:
            print(f"{name:28s} FAIL  " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"{name:28s} PASS  rows={len(s_rows)}")
            n_pass += 1
    # Post-sweep cache audit (VERDICT r7 #8): after releasing the last
    # query's registered pins, NOTHING may remain in executor storage.
    # pinned_count() must be 0 (registry drained) AND the Spark storage
    # listing must be empty — the latter catches an operator that
    # cached WITHOUT registering through pins.pin, which a long sweep
    # would silently re-accumulate until executors spill or OOM.
    from instacart_medallion_lakehouse_spark.pins import (
        pinned_count,
        release_pins,
    )

    release_pins()
    leaked_pins = pinned_count()
    leaked_rdds = [
        f"{i.name()} ({i.memSize()}b)"
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only; "
          f"post-release pins={leaked_pins} cached_rdds={len(leaked_rdds)}")
    if leaked_rdds:
        print("CACHE LEAK (cached outside the pin registry): "
              + "; ".join(leaked_rdds[:5]))
    spark.stop()
    sys.exit(1 if (n_fail or leaked_pins or leaked_rdds) else 0)


if __name__ == "__main__":
    main()
