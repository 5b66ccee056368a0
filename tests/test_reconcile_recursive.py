"""Known-answer guards for the round-10 recursive-CTE and full-outer
reconciliation queries against pure-Python replays on tiny hand-built
tables — shared-mistake insurance the cross-engine oracle cannot give
(both engines could misread the same recurrence or gate).
"""

from __future__ import annotations

import datetime

import pytest

from instacart_medallion_lakehouse_spark.queries_analytics import (
    decayed_monthly_revenue,
    snapshot_reconcile_diff,
)


def _write_orders(spark, path: str, rows) -> None:
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


class TestDecayedMonthlyRevenue:
    def test_matches_integer_recurrence_replay(self, spark, tmp_path):
        rows = []
        k = 0
        for m, (month, prices) in enumerate(
            [
                ("2020-01", [10.00, 5.25]),
                ("2020-02", [0.01]),
                ("2020-03", [99.99, 0.02, 1.00]),
                ("2020-05", [7.77]),  # gap month: sequence skips 2020-04
            ]
        ):
            y, mo = month.split("-")
            for p in prices:
                rows.append(
                    (k, p, datetime.datetime(int(y), int(mo), 1 + k % 27))
                )
                k += 1
        _write_orders(spark, str(tmp_path), rows)
        got = {
            r["month"]: r["w_cents"]
            for r in decayed_monthly_revenue(spark, str(tmp_path)).collect()
        }
        # replay: w(t) = w(t-1) // 2 + rev_cents(t) over PRESENT months
        rev = {"2020-01": 1525, "2020-02": 1, "2020-03": 10101, "2020-05": 777}
        w, want = 0, {}
        for month in sorted(rev):
            w = w // 2 + rev[month]
            want[month] = w
        assert got == want
        # the floor division is what makes this non-associative: the
        # final value depends on the order of months, not just the set
        assert want["2020-05"] == ((1525 // 2 + 1) // 2 + 10101) // 2 + 777

    # NB: no sf_dir-sized test — Spark 4.1's UnionLoopExec runs one job
    # per iteration (~0.9s each locally), so an 80-month recursion is a
    # ~40s test that times the scheduler; the replay above proves the
    # semantics on a 4-month corpus. Same reason the query is not a
    # registry/bench entry (see its docstring).


class TestSnapshotReconcileDiff:
    def test_hand_gated_classification(self, spark, tmp_path):
        """Keys planted on each gate: 97-multiples are 'added' (absent
        from the old snapshot), 101-multiples 'removed', 89-multiples
        'changed' (+150 cents), everything else absent from the diff."""
        keys = [1, 2, 89, 97, 101, 89 * 2, 97 * 101]
        _write_orders(
            spark,
            str(tmp_path),
            [(k, 10.00, datetime.datetime(2021, 1, 1)) for k in keys],
        )
        got = {
            r["o_orderkey"]: (r["change"], r["old_cents"], r["new_cents"])
            for r in snapshot_reconcile_diff(spark, str(tmp_path)).collect()
        }
        assert got == {
            89: ("changed", 1000, 1150),
            97: ("added", None, 1000),
            101: ("removed", 1000, None),
            178: ("changed", 1000, 1150),
            # 97*101 trips BOTH drop gates -> in neither snapshot ->
            # absent from the diff entirely (not 'added'/'removed')
        }
        assert 1 not in got and 2 not in got and 97 * 101 not in got


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
