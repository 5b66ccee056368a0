"""band_join (operators/rangejoin.py) guards: equivalence to the
brute-force inequality join, no nested-loop physical plan, and the
bin-width safety contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instacart_medallion_lakehouse_spark.operators.rangejoin import band_join


def _events(spark, sf_dir):
    from instacart_medallion_lakehouse_spark.io import read_events

    return read_events(spark, sf_dir)


class TestBandJoin:
    def test_matches_bruteforce_inequality_join(self, spark, sf_dir):
        ev = _events(spark, sf_dir)
        err = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("e_id"), "user_id", "ts"
        )
        clk = ev.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
        )
        delta = 6 * 3600 * 1_000_000
        got = {
            (r.e_id, r.c_id)
            for r in band_join(
                err, clk, on=["user_id"], left_ts="ts", right_ts="c_ts",
                delta_us=delta,
            ).collect()
        }
        # brute force on collected rows (sf0.001 is small)
        errs = err.collect()
        clks = clk.collect()
        by_user = {}
        for c in clks:
            by_user.setdefault(c.user_id, []).append(c)
        want = set()
        for e in errs:
            for c in by_user.get(e.user_id, []):
                gap = abs(
                    (c.c_ts - e.ts).total_seconds() * 1_000_000
                )
                if round(gap) <= delta:
                    want.add((e.e_id, c.c_id))
        assert got == want
        assert want, "degenerate fixture: no pairs within the band"

    def test_no_nested_loop_in_plan(self, spark, sf_dir):
        ev = _events(spark, sf_dir)
        err = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("e_id"), "user_id", "ts"
        )
        clk = ev.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("c_ts")
        )
        df = band_join(
            err, clk, on=["user_id"], left_ts="ts", right_ts="c_ts",
            delta_us=3_600_000_000,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_wider_bins_give_identical_pairs(self, spark, sf_dir):
        ev = _events(spark, sf_dir)
        err = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("e_id"), "user_id", "ts"
        )
        clk = ev.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
        )
        delta = 2 * 3600 * 1_000_000

        def pairs(width):
            return {
                (r.e_id, r.c_id)
                for r in band_join(
                    err, clk, on=["user_id"], left_ts="ts", right_ts="c_ts",
                    delta_us=delta, bin_width_us=width,
                ).collect()
            }

        assert pairs(delta) == pairs(3 * delta)

    def test_narrow_bin_width_rejected(self, spark, sf_dir):
        ev = _events(spark, sf_dir)
        with pytest.raises(ValueError):
            band_join(
                ev, ev.select(F.col("ts").alias("c_ts"), "user_id"),
                on=["user_id"], left_ts="ts", right_ts="c_ts",
                delta_us=1000, bin_width_us=999,
            )
