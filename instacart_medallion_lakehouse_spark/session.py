"""SparkSession factory with scale-aware defaults.

Local test runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same builder config applies unchanged (AQE, skew-join handling, UTC
session timezone, Arrow transfer for the few pandas-interop points).

Reference parity: the reference configures 200 shuffle partitions and a
10 MB auto-broadcast threshold (configs/pipeline_config.yml:28-29). We
keep the broadcast threshold and let AQE coalesce shuffle partitions
instead of hard-coding 200 — at 100 TB a fixed 200 is wrong in both
directions, while AQE right-sizes per stage from map output statistics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

# A long-lived session compiles one codegen'd class per stage; the JVM's
# default reserved code cache (240m) fills after a few dozen distinct
# queries, silently DISABLING the JIT — hot loops (regex, interpreted
# expression eval) then run 10-50x slower. These flags must reach the
# driver JVM at LAUNCH: in local pyspark the JVM is started from
# PYSPARK_SUBMIT_ARGS before any builder .config() is read, so
# spark.driver.extraJavaOptions set via the builder is too late.
_JVM_OPTS = "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing"


def ensure_vendored_protobuf() -> None:
    """transformWithStateInPandas' state-server workers import
    ``google.protobuf``; this container ships no protobuf wheel, so the
    repo vendors a MINIMAL runtime covering exactly the
    StateMessage.proto subset (vendor/google/protobuf/_shim.py, r11).
    Prepend it to PYTHONPATH (inherited by every python worker a LATER
    JVM spawns — must run before the gateway launches) and sys.path,
    ONLY when the real package is absent: an installed wheel always
    wins. Called from _ensure_jvm_opts AND at package import (the
    driver/plain-session path builds its own SparkSession without
    build_session, but imports the package first)."""
    import sys as _sys

    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    _vendor = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vendor",
    )
    if not os.path.isdir(os.path.join(_vendor, "google", "protobuf")):
        return
    if _vendor not in _sys.path:
        _sys.path.insert(0, _vendor)
    pp = os.environ.get("PYTHONPATH", "")
    if _vendor not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = _vendor + (os.pathsep + pp if pp else "")



def _ensure_jvm_opts() -> None:
    """Inject launch-time process settings before the gateway starts the
    JVM. No-op if a JVM is already up (they can't apply retroactively)."""
    from pyspark import SparkContext

    # glibc mmap()s every allocation above 128K and returns it to the OS
    # on free, so each large numpy temporary in a python worker is
    # fresh, lazily-faulted memory — on virtualized hosts with on-demand
    # paging that costs ~1ms/page (a 32 MB cosine matrix ≈ seconds of
    # faults PER BATCH). Raising the threshold keeps big buffers in the
    # reusable arena: first use pays, the rest run warm. Exported here so
    # the JVM and every python worker it spawns inherit it.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    ensure_vendored_protobuf()

    if SparkContext._jvm is not None:  # JVM already launched
        return
    existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
    if "ReservedCodeCacheSize" in existing:
        return
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f'--driver-java-options "{_JVM_OPTS}" ' + existing
    )


def build_session(
    app_name: str = "instacart-medallion-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    Scale posture:
    - AQE on: runtime partition coalescing + skew-join splitting means the
      same plan survives a 100x scale-up without retuning.
    - ``autoBroadcastJoinThreshold=10m`` mirrors the reference; small dims
      (region/nation/part at any SF, aisles/departments/products in the
      reference) broadcast instead of shuffling the fact side.
    - UTC session timezone so timestamp semantics match the DuckDB oracle
      and are cluster-timezone-independent.
    """
    _ensure_jvm_opts()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Join strategy: preferSortMergeJoin and the AQE SMJ->SHJ
        # rewrite threshold were A/B'd per-query in round 11 (q8,
        # q21, dim_parts, top_brands, snapshot_reconcile — 3 reps,
        # min): every delta inside noise, because AQE already
        # broadcast-rewrites the small sides at runtime and the
        # surviving SMJ inputs are exchange-floor-bound here. Left at
        # defaults; see OPTIMIZATION_r11.md.
        .config("spark.sql.autoBroadcastJoinThreshold", "10m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
