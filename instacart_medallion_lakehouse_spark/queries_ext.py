"""Query registry, part 3: multimodal (mapInPandas) + Structured
Streaming, drained to batch results so even these are oracle-checked.

Imported for its registration side effects at the bottom of queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.multimodal import extract_media_features, with_media
from .queries import _register, _t
from .streaming.events import (
    drain_to_batch,
    read_events_stream,
    session_windows_stream,
    tumbling_counts_stream,
)

# ---------------------------------------------------------------------------
# Multimodal: binary payload + metadata through Arrow-batched mapInPandas.
# The stub decode computes deterministic features, so the full Python-batch
# path (schema, batching, Arrow transfer) is verified against SQL.
# ---------------------------------------------------------------------------


@_register(
    "media_features",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum,
           CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
           CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS fake_height,
           CAST(CASE WHEN CAST(doc_id % 3 AS INT) = 2
                     THEN octet_length(encode(text)) % 30
                     ELSE 1 END AS INT) AS fake_n_frames
    FROM documents
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: fabricate (doc_id, media_type,
    payload binary), extract features via mapInPandas. The oracle
    recomputes the stub features in SQL — proving the Arrow round-trip
    is lossless and deterministic."""
    docs = _t(spark, sf_dir, "documents")
    return extract_media_features(with_media(docs))


# ---------------------------------------------------------------------------
# Structured Streaming, drained with Trigger.AvailableNow to a memory sink.
# The streaming plans are the real watermarked operators; draining yields a
# batch DataFrame the driver can collect and hash against the oracle.
# ---------------------------------------------------------------------------


@_register(
    "stream_windowed_events",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           round(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) * 1.0
                 / count(value) / 100.0, 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation over readStream, run to
    completion — must equal the batch windowed_events byte for byte."""
    stream = read_events_stream(spark, sf_dir)
    return drain_to_batch(tumbling_counts_stream(stream), output_mode="complete")


@_register(
    "stream_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30' MINUTE
                  THEN 1 ELSE 0 END AS _new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *, sum(_new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM sessions GROUP BY user_id, session_seq
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native stateful session windows (F.session_window, 30-min gap),
    drained to batch. The oracle is the gaps-and-islands formulation with
    the session_window boundary rule (a gap of EXACTLY the timeout starts
    a new session, hence >= not >)."""
    stream = read_events_stream(spark, sf_dir)
    return drain_to_batch(session_windows_stream(stream), output_mode="complete")
