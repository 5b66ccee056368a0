"""Benchmark harness: run the engine's queries at $SPARK_GRAFT_SF_DIR.

Prints ONE compact JSON line LAST on stdout:
  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The driver's stdout capture keeps only the last 2000 characters, so the
stdout line is kept under a hard char budget: ``value`` is the total
over ALL queries, but the inline ``queries`` map holds only the most
expensive queries that fit the budget. The FULL per-query map, the
round-over-round diff, and the same-host DuckDB baseline totals go to
``BENCH_DETAIL.json`` next to this file (VERDICT r2 #3/#10).

Materialization uses the noop sink (full execution, zero serialization
to the driver) so we measure the plan, not collect() transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instacart_medallion_lakehouse_spark import queries as q
from instacart_medallion_lakehouse_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))
# stdout line budget: the driver tails 2000 chars; leave headroom.
STDOUT_BUDGET = 1600


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # run-private derived-table store: clearing the host-global default
    # between passes would race any concurrent session (their in-flight
    # scans lose files; their rebuilds pollute our timings) — the bench
    # must own the store it measures
    import tempfile

    os.environ["SPARK_GRAFT_SHARED_DIR"] = tempfile.mkdtemp(
        prefix="spark_graft_bench_store_"
    )
    # wall-clock breakdown (VERDICT r10 #3): stamp every non-query
    # phase so the wall-vs-query-sum gap is itemized in BENCH_DETAIL —
    # a regression in session bring-up or store ordering cannot hide
    # in an unexplained residual.
    wall_t0 = time.perf_counter()
    wall: dict[str, float] = {}

    def _stamp(key: str, t0: float) -> None:
        wall[key] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    _stamp("session_init", t0)
    # JVM/codegen warmup on a trivial job so the first query isn't taxed
    t0 = time.perf_counter()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _stamp("jvm_warmup", t0)
    # Streaming-engine warmup: the FIRST streaming query in a session
    # pays one-time micro-batch engine + state-store classloading that
    # would otherwise land on whichever stream_* entry runs first —
    # drain one throwaway stateful rate-source query so every stream_*
    # timing measures its plan, not engine bring-up (VERDICT r3 #10).
    from instacart_medallion_lakehouse_spark.streaming.events import (
        drain_to_batch,
    )

    def _tiny_stream():
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "10")
            .load()
            .groupBy("value")
            .count()
        )

    t0 = time.perf_counter()
    drain_to_batch(_tiny_stream(), output_mode="complete", timeout_sec=60)
    _stamp("streaming_warmup", t0)
    # Steady-state streaming drain floor (VERDICT r10 #8): a SECOND
    # minimal drain, after engine bring-up, measures the fixed
    # micro-batch + state-store checkpoint cost EVERY stream_* query
    # pays regardless of its plan. BENCH_DETAIL reports stream_*
    # ratios both raw and with this floor subtracted
    # (ratios_stream_adjusted) — comparing a streaming drain against a
    # batch DuckDB GROUP BY without the floor reports engine topology,
    # not plan cost.
    t0 = time.perf_counter()
    drain_to_batch(_tiny_stream(), output_mode="complete", timeout_sec=60)
    stream_floor = round(time.perf_counter() - t0, 3)
    wall["stream_floor_probe"] = stream_floor

    # Representative warmup, untimed: range() warms the JVM but not the
    # parquet reader, broadcast machinery, window codegen, or the Python
    # worker pool — the fixed costs that otherwise land on whichever
    # early query first touches each path and show up as round-over-
    # round "regressions" on plan-unchanged queries (VERDICT r7 #5).
    # One star join (scan + broadcast + agg) and one Arrow GEMM query
    # (Python worker pool + Arrow serde) cover those paths; pins and any
    # store asset they build are dropped before the timed passes.
    reg = q.queries()
    t0 = time.perf_counter()
    materialize(reg["region_performance"](spark, SF_DIR))
    materialize(reg["ann_topk"](spark, SF_DIR))
    q.release_pins()
    # Parquet-WRITE path warmup (r11, guide §1 — measured: the FIRST
    # parquet write of a session pays ~4.5s of one-time committer /
    # writer / codec classloading; warm writes are ~0.4s). The store
    # build entries (image_dhash_table, shingle_index_table, ...) write
    # parquet + bucketed catalog tables inside their timed window, so
    # without this the session's whole write-classloading bill lands on
    # whichever build entry runs first in pass 0. One 2-row synthetic
    # write of each flavor (plain parquet + bucketed saveAsTable) warms
    # the path; nothing derived from the dataset is kept.
    import shutil
    import tempfile as _tf

    wtmp = _tf.mkdtemp(prefix="bench_write_warmup_")
    # DROP upfront too: a previous bench killed mid-warmup leaves the
    # catalog entry + bucketed files behind, and the overwrite write
    # would race the stale entry (ADVICE r11)
    spark.sql("DROP TABLE IF EXISTS _bench_write_warmup")
    try:
        tiny = spark.range(2).selectExpr("id", "id * 2 AS v")
        tiny.write.mode("overwrite").parquet(os.path.join(wtmp, "p"))
        (
            tiny.write.mode("overwrite")
            .bucketBy(2, "id")
            .sortBy("id")
            .saveAsTable("_bench_write_warmup")
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS _bench_write_warmup")
        shutil.rmtree(wtmp, ignore_errors=True)
    _stamp("representative_warmup", t0)

    # Two passes, per-query MIN: pass 1 doubles as warmup (JIT, python
    # worker pool, page cache — this host faults memory lazily and
    # stalls unpredictably, so any single observation can be 10x off);
    # the min over passes is the steady-state cost of the plan.
    timings: dict[str, float] = {}
    pass_totals: list[float] = []
    for _pass in range(2):
        pass_t0 = time.perf_counter()
        # wipe the persisted derived-table store so each pass pays the
        # shared signature-layer build exactly once (in its first
        # consumer) — sharing within a pass is the architecture under
        # test; sharing ACROSS passes would hide the build cost from
        # the per-query min entirely
        q.clear_shared_store()
        for name, fn in q.queries().items():
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            timings[name] = round(min(dt, timings.get(name, dt)), 3)
            # this harness KNOWS the query is consumed here, so it
            # releases the query's internal pins (LSH band tables,
            # shingle tables, ...) through the documented library API —
            # OUTSIDE the timer. Leaving them to the next registry
            # invocation's automatic release (the library's safety net)
            # would bill the async unpersist churn to the next query's
            # measured window.
            q.release_pins()
        pass_totals.append(round(time.perf_counter() - pass_t0, 3))
    total = round(sum(timings.values()), 3)
    t0 = time.perf_counter()
    spark.stop()
    q.clear_shared_store()  # drop the run-private store directory
    _stamp("teardown", t0)

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": timings,
        # noise bounds (VERDICT r9 #9): wall-clock per full pass over
        # the registry. value = sum of per-query MIN over the passes;
        # the pass-total spread is this host's observed variance band —
        # judge a single-shot driver total against it, not against
        # value alone. pass 0 additionally pays each store-asset build
        # (the store is wiped between passes, so each pass's FIRST
        # consumer rebuilds; build entries run first by window order).
        "runs": {
            "pass_wall_seconds": pass_totals,
            "spread_pct": round(
                100.0 * (max(pass_totals) - min(pass_totals))
                / max(min(pass_totals), 1e-9), 1,
            ),
        },
    }
    vs_prev = _compare_to_previous_round(timings, total, sf)
    if vs_prev:
        detail["vs_prev"] = vs_prev
    t0 = time.perf_counter()
    duck = _bench_duckdb_baseline()
    _stamp("duckdb_baseline", t0)
    if duck:
        detail["duckdb"] = duck
        # per-query spark/duckdb ratio (<1 = Spark faster) so the 2x
        # baseline bar is auditable per query from this artifact alone;
        # only meaningful where a DuckDB twin exists and took >= 50ms
        # (below that the ratio measures scheduling floors, not plans)
        dq = duck.get("queries") or {}
        # ratio over the MATCHED query set (both engines timed it):
        # summing the no-oracle queries into the numerator only would
        # overstate the ratio (conservative but wrong as a statement)
        matched = [n for n in timings if n in dq]
        m_spark = sum(timings[n] for n in matched)
        m_duck = sum(dq[n] for n in matched)
        detail["ratio_total"] = round(m_spark / m_duck, 3) if m_duck else None
        detail["ratio_matched_seconds"] = {
            "spark": round(m_spark, 3),
            "duckdb": round(m_duck, 3),
            "n": len(matched),
        }
        detail["ratios"] = {
            name: round(t / dq[name], 2)
            for name, t in timings.items()
            if dq.get(name, 0) >= 0.05
        }
        # streaming-shaped floor adjustment (VERDICT r10 #8): stream_*
        # queries drain a micro-batch engine with state-store
        # checkpoints; their raw ratio against a batch DuckDB GROUP BY
        # measures that topology, not the plan. The adjusted ratio
        # subtracts the measured per-drain floor (stream_floor_probe:
        # a minimal post-warmup stateful drain) from each stream_*
        # timing — what remains is the plan-shaped cost on the same
        # footing as the batch queries.
        detail["stream_drain_floor_sec"] = stream_floor
        detail["ratios_stream_adjusted"] = {
            name: round(max(t - stream_floor, 0.0) / dq[name], 2)
            for name, t in timings.items()
            if name.startswith("stream_") and dq.get(name, 0) >= 0.05
        }
        if matched and m_duck:
            adj_spark = sum(
                max(timings[n] - stream_floor, 0.0)
                if n.startswith("stream_")
                else timings[n]
                for n in matched
            )
            detail["ratio_total_stream_adjusted"] = round(
                adj_spark / m_duck, 3
            )

    # itemized wall clock: everything outside the timed queries, plus
    # the residual the breakdown does NOT explain (import time, python
    # interpreter startup, JSON IO). Keep residual under ~10s or find
    # out why (VERDICT r10 #3).
    wall_total = round(time.perf_counter() - wall_t0, 3)
    accounted = round(sum(wall.values()) + sum(pass_totals), 3)
    detail["wall_breakdown"] = {
        **wall,
        "timed_pass_walls": pass_totals,
        "wall_total": wall_total,
        "residual_unexplained": round(wall_total - accounted, 3),
    }

    with open(os.path.join(HERE, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # Compact stdout line, printed LAST: total over ALL queries, inline
    # per-query map limited to the most expensive ones that fit.
    headline: dict[str, float] = {}
    base = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": headline,
        "sf": sf,
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
    }
    for name, t in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        headline[name] = t
        if len(json.dumps(base)) > STDOUT_BUDGET:
            del headline[name]
            break
    base["queries_omitted"] = len(timings) - len(headline)
    print(json.dumps(base), flush=True)


def _bench_duckdb_baseline():
    """Same-host DuckDB totals over the oracle SQL (the BASELINE.md 2x
    bar), run sequentially AFTER the Spark pass so neither measurement
    contends with the other. Opt out with SPARK_GRAFT_BENCH_DUCKDB=0.
    Never fails the bench."""
    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") == "0":
        return None
    try:
        import duckdb

        con = duckdb.connect()
        tables = (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
        for t in tables:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        timings = {}
        for name, sql in q.oracle_sql().items():
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            timings[name] = round(time.perf_counter() - t0, 3)
        return {
            "total": round(sum(timings.values()), 3),
            "n_queries": len(timings),
            "queries": timings,
        }
    except Exception as e:  # noqa: BLE001 — baseline is best-effort
        return {"error": f"{type(e).__name__}: {e}"}


def _compare_to_previous_round(timings, total, sf):
    """Diff against the latest driver-recorded BENCH_r{N}.json (same sf)
    so regressions are visible round over round. Returns None quietly if
    no comparable record exists — bench must never fail on metadata."""
    import glob
    import re

    rounds = []
    for path in glob.glob(os.path.join(HERE, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    if not rounds:
        return None
    n, path = max(rounds)
    # Prefer the previous run's FULL per-query map: BENCH_DETAIL.json is
    # written by the last bench run and read here BEFORE this run
    # overwrites it. The stdout-parsed BENCH_r{N} map is truncated to
    # the most expensive ~50 queries, which made every out-of-headline
    # query show up as "new" and hid their regressions.
    prev_total, prev_q, source = None, {}, None
    try:
        with open(os.path.join(HERE, "BENCH_DETAIL.json")) as f:
            d = json.load(f)
        if d.get("sf") == sf and isinstance(d.get("value"), (int, float)):
            prev_total, prev_q = d["value"], d.get("queries") or {}
            source = "BENCH_DETAIL.json (previous run)"
    except (OSError, ValueError):
        pass
    if prev_total is None:
        try:
            with open(path) as f:
                prev = json.load(f).get("parsed") or {}
            prev_total = prev.get("value")
            prev_q = prev.get("queries") or {}
            source = f"BENCH_r{n:02d}.json (truncated stdout map)"
            if prev.get("sf") != sf or not isinstance(
                prev_total, (int, float)
            ):
                return None
        except (OSError, ValueError):
            return None
    regressions = {
        name: {"prev": prev_q[name], "now": t}
        for name, t in timings.items()
        if name in prev_q and t > prev_q[name] * 1.2 and t - prev_q[name] > 0.2
    }
    return {
        "round": n,
        "source": source,
        "prev_total": prev_total,
        "delta_sec": round(total - prev_total, 3),
        "delta_pct": round((total - prev_total) / prev_total * 100, 1),
        "regressions": regressions,
        "new_queries": sorted(set(timings) - set(prev_q)),
    }


if __name__ == "__main__":
    main()
