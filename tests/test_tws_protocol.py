"""transformWithStateInPandas PROTOCOL coverage over the vendored
protobuf shim (r11): beyond the value-state twin equivalence
(test_streaming.py), exercise the remaining StateMessage surfaces the
shim implements — ListState (ListStateCall/ListStatePut/AppendValue),
MapState (MapStateCall/UpdateValue/Iterator keys), and processing-time
timers (RegisterTimer/ListTimers/ExpiryTimerRequest +
StateResponseWithTimer) — end to end against the JVM state server.
A wire bug in any of those message families fails these, not just a
unit vector."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from instacart_medallion_lakehouse_spark.streaming import events as se

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@pytest.fixture()
def rocksdb_conf(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


class TestTwsProtocolSurfaces:
    def test_list_and_map_state(self, spark, sf_dir, rocksdb_conf):
        """Per-user: ListState accumulates values, MapState counts
        value buckets — final emission must match a batch restatement."""

        class P(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._seen = handle.getListState("seen", "v DOUBLE")
                self._buckets = handle.getMapState(
                    "buckets", "b BIGINT", "n BIGINT"
                )

            def handleInputRows(self, key, rows, timerValues):
                for pdf in rows:
                    for v in pdf["value"]:
                        self._seen.appendValue((float(v),))
                        b = int(v) % 3
                        cur = (
                            self._buckets.getValue((b,))[0]
                            if self._buckets.containsKey((b,))
                            else 0
                        )
                        self._buckets.updateValue((b,), (cur + 1,))
                n = sum(1 for _ in self._seen.get())
                per_bucket = {
                    k[0]: v[0] for k, v in self._buckets.iterator()
                }
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_seen": [n],
                        "b0": [per_bucket.get(0, 0)],
                        "b1": [per_bucket.get(1, 0)],
                        "b2": [per_bucket.get(2, 0)],
                    }
                )

            def close(self) -> None:
                pass

        stream = se.read_events_stream(spark, sf_dir)
        out = (
            stream.withWatermark("ts", "2 hours")
            .groupBy("user_id")
            .transformWithStateInPandas(
                P(),
                outputStructType=(
                    "user_id long, n_seen long, b0 long, b1 long, b2 long"
                ),
                outputMode="Update",
                timeMode="None",
            )
        )
        drained = se.drain_to_batch(out, output_mode="update")
        final = {}
        for r in drained.collect():
            cur = final.get(r["user_id"])
            if cur is None or r["n_seen"] > cur["n_seen"]:
                final[r["user_id"]] = r
        from instacart_medallion_lakehouse_spark.io import read_events

        batch = {
            r["user_id"]: r
            for r in read_events(spark, sf_dir)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_seen"),
                *[
                    F.sum(
                        (
                            (F.col("value").cast("long") % 3) == b
                        ).cast("long")
                    ).alias(f"b{b}")
                    for b in range(3)
                ],
            )
            .collect()
        }
        assert final.keys() == batch.keys()
        for uid, b in batch.items():
            f = final[uid]
            assert f["n_seen"] == b["n_seen"]
            assert (f["b0"], f["b1"], f["b2"]) == (
                b["b0"], b["b1"], b["b2"],
            )

    def test_processing_time_timers_fire(self, tmp_path):
        """Timers: register a processing-time timer on first input;
        handleExpiredTimer must fire for every key (exercises
        RegisterTimer, GetProcessingTime/batch-timestamp, the
        expiry-timer iterator protocol and StateResponseWithTimer).

        Runs in a SUBPROCESS with its own SparkSession: starting a
        second continuous (rate-source) streaming query on the shared
        test session intermittently hits a Spark-internal planning NPE
        ("SparkPlan.session() is null" inside MicroBatchExecution) that
        is unrelated to the protocol under test — the same code passes
        standalone every time. The availableNow drains used everywhere
        else don't trigger it."""
        import subprocess
        import sys as _sys

        script = tmp_path / "tws_timer_probe.py"
        script.write_text(
            """
import sys, tempfile, time
sys.path.insert(0, %r)
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle)
from instacart_medallion_lakehouse_spark.session import build_session

spark = build_session("tws-timer-probe", master="local[4]",
                      shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set(
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider")

class P(StatefulProcessor):
    def init(self, handle):
        self._n = handle.getValueState("n", "n BIGINT")
        self._handle = handle
    def handleInputRows(self, key, rows, timerValues):
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._n.update((n,))
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + 1)
        return iter(())
    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        n = self._n.get()[0] if self._n.exists() else 0
        yield pd.DataFrame({"k": [key[0]], "n": [n], "fired": [True]})
    def close(self):
        pass

sdf = (spark.readStream.format("rate")
       .option("rowsPerSecond", "50").load()
       .selectExpr("CAST(value %% 4 AS LONG) AS k", "value"))
out = sdf.groupBy("k").transformWithStateInPandas(
    P(), outputStructType="k long, n long, fired boolean",
    outputMode="Update", timeMode="ProcessingTime")
q = (out.writeStream.format("memory").queryName("t")
     .option("checkpointLocation", tempfile.mkdtemp())
     .outputMode("update").start())
t0 = time.time()
fired = 0
while time.time() - t0 < 90:
    time.sleep(3)
    fired = spark.sql(
        "SELECT count(DISTINCT k) FROM t WHERE fired").collect()[0][0]
    if fired >= 4:
        break
q.stop()
spark.stop()
print("TIMERS_OK" if fired >= 4 else f"TIMERS_FIRED_ONLY {fired}")
"""
            % (str(__import__("pathlib").Path(__file__).parent.parent),)
        )
        proc = subprocess.run(
            [_sys.executable, str(script)],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert "TIMERS_OK" in proc.stdout, (
            proc.stdout[-2000:] + proc.stderr[-2000:]
        )
