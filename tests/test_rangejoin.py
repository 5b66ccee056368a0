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


class TestBinExactness:
    def test_bin_expression_is_exact_for_huge_longs(self, spark):
        """The bin id must be exact integer floor division at ANY long
        magnitude — floor(double/double) loses precision above 2^53 and
        would put within-band pairs 2 bins apart. Pin the operator's
        (x - pmod(x, w)) div w formula against Python // on adversarial
        magnitudes, negatives included."""
        from pyspark.sql import functions as F

        width = 14_400_000_000
        # values one microsecond below a bin boundary at ~2^62, where
        # the double rounds UP across the boundary
        edge = (2**62 // width) * width
        vals = [
            2**62, 2**62 + 1, -(2**62), -(2**62) - 1,
            2**53 + 1, -(2**53) - 1, 0, -1, 1,
            width, width - 1, -width, -width - 1,
            edge - 1, edge + width - 1, -(edge - 1),
        ]
        df = spark.createDataFrame([(v,) for v in vals], ["x"]).select(
            "x",
            F.expr(f"(x - pmod(x, {width}L)) div {width}L").alias("got"),
            F.floor(F.col("x") / F.lit(width)).alias("naive"),
        )
        rows = {r.x: (r.got, r.naive) for r in df.collect()}
        for v in vals:
            assert rows[v][0] == v // width, (v, rows[v])
        # and document WHY: the naive double path really does diverge
        # just below huge bin boundaries
        assert rows[edge - 1][1] != (edge - 1) // width

    def test_zero_delta_matches_equal_microseconds_only(self, spark, sf_dir):
        from pyspark.sql import functions as F

        ev = _events(spark, sf_dir)
        a = ev.select(F.col("event_id").alias("a_id"), "user_id", "ts")
        b = ev.select(
            "user_id", F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
        )
        got = {
            (r.a_id, r.b_id)
            for r in band_join(
                a, b, on=["user_id"], left_ts="ts", right_ts="b_ts", delta_us=0
            ).collect()
        }
        # every event matches at least itself, and any (x, y) pair in
        # the result shares an exact timestamp
        ids = {r.a_id for r in a.collect()}
        assert {(i, i) for i in ids} <= got
        ts_of = {r.a_id: r.ts for r in a.collect()}
        for x, y in got:
            assert ts_of[x] == ts_of[y]
