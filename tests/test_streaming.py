"""Streaming-vs-batch equivalence: the watermarked streaming plans,
drained with Trigger.AvailableNow, must produce exactly the batch
results; streaming dedup must drop in-horizon duplicates.
"""

from __future__ import annotations

from instacart_medallion_lakehouse_spark import queries as q
from instacart_medallion_lakehouse_spark.streaming import events as se


def _rows_set(df, cols):
    return {tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()}


class TestStreamBatchEquivalence:
    def test_tumbling_agg_equals_batch(self, spark, sf_dir):
        batch = q.queries()["windowed_events"](spark, sf_dir)
        stream = se.drain_to_batch(
            se.tumbling_counts_stream(se.read_events_stream(spark, sf_dir)),
            output_mode="complete",
        )
        cols = ["window_start", "event_type", "n_events", "total_value", "avg_value"]
        assert _rows_set(batch, cols) == _rows_set(stream, cols)

    def test_session_windows_equal_batch_islands(self, spark, sf_dir):
        batch = q.queries()["sessionize"](spark, sf_dir)
        stream = se.drain_to_batch(
            se.session_windows_stream(se.read_events_stream(spark, sf_dir)),
            output_mode="complete",
        )
        # batch keys sessions by seq, stream by window bounds; compare on
        # the session content signature (user, start, end, n, value)
        bcols = ["user_id", "session_start", "session_end", "n_events", "session_value"]
        batch_sessions = batch.selectExpr(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "session_value",
        )
        assert _rows_set(batch_sessions, bcols) == _rows_set(stream, bcols)


class TestStreamingDedup:
    def test_drop_duplicates_within_watermark(self, spark, sf_dir):
        stream = se.read_events_stream(spark, sf_dir)
        total = se.drain_to_batch(stream, output_mode="append").count()
        deduped = se.drain_to_batch(se.dedup_stream(stream), output_mode="append")
        n_ids = deduped.select("event_id").distinct().count()
        assert deduped.count() == n_ids  # no duplicate event_ids survive
        assert 0 < n_ids <= total
