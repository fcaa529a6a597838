"""Watermarked tumbling-window aggregation — the streaming rollup.

The reference's scheduled status report (O22, EN/watcher.py:163-199)
and day-grained export loop are batch re-scans over wall-clock
windows; the Structured-Streaming-native restatement is an event-time
tumbling window with a watermark bounding how long state waits for
late rows.  The batch twin (`windowed_counts` over a static frame) is
the oracle: run the same frame through the stream in micro-batches and
the closed windows must match (tests/test_skew_window.py), which is
exactly the stream/batch equivalence contract SURVEY §2.2 sets for
streaming operators.

Scale posture: groupBy(window, key) is one shuffle; state per open
window×key only (watermark evicts closed windows), so state size is
bounded by (lateness / window) × |keys|, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enexory_parquet_export_spark.streaming._event_time import as_event_time

#: late rows older than this past the max seen event time are dropped
DEFAULT_LATENESS = "30 minutes"
DEFAULT_WINDOW = "1 hour"


def _rollup(df: DataFrame, window: str, slide: str | None = None) -> DataFrame:
    # per-row micro-units BEFORE the sum: bigint addition is exact and
    # associative, so stream (incremental) and batch (one-shot) sums
    # agree bit-for-bit — a double sum would depend on add order.
    micro = F.floor(F.col("value") * F.lit(1e6)).cast("bigint")
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (df.groupBy(win.alias("win"), "event_type")
              .agg(F.count("*").cast("bigint").alias("n_events"),
                   F.sum(micro).alias("sum_value_micro"))
              .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                       .alias("win_start"),
                      "event_type", "n_events", "sum_value_micro"))


def windowed_counts(events: DataFrame, *,
                    window: str = DEFAULT_WINDOW,
                    slide: str | None = None) -> DataFrame:
    """Batch twin: tumbling (or, with ``slide``, hopping) window
    counts/sums over a static frame (declared forms: x50 / x70)."""
    return _rollup(events, window, slide)


def windowed_counts_stream(stream: DataFrame, *,
                           window: str = DEFAULT_WINDOW,
                           slide: str | None = None,
                           lateness: str = DEFAULT_LATENESS) -> DataFrame:
    """Streaming rollup: same plan over ``readStream`` input, with an
    event-time watermark so window state is evicted once closed and
    rows later than ``lateness`` are dropped (documented divergence
    from the batch twin, which sees everything)."""
    stream = as_event_time(stream, "ts")
    return _rollup(stream.withWatermark("ts", lateness), window, slide)


# -- session windows (dynamic gap) ------------------------------------------

SESSION_GAP = "30 minutes"


def _session_rollup(df: DataFrame, key: str, gap: str) -> DataFrame:
    # session_window start/end are data-determined (first event / last
    # event + gap), identical for batch and stream; counts are exact.
    return (df.groupBy(F.session_window("ts", gap).alias("w"), key)
              .agg(F.count("*").cast("bigint").alias("n_events"))
              .select(F.col(key),
                      F.unix_micros("w.start").alias("sess_start_us"),
                      "n_events"))


def session_counts(events: DataFrame, *, key: str = "user_id",
                   gap: str = SESSION_GAP) -> DataFrame:
    """Batch twin: per-key session counts over a static frame (the
    declared-query form is x71, which also proves the operator against
    the gaps-and-islands oracle)."""
    return _session_rollup(events, key, gap)


def session_counts_stream(stream: DataFrame, *, key: str = "user_id",
                          gap: str = SESSION_GAP,
                          lateness: str = DEFAULT_LATENESS) -> DataFrame:
    """Streaming session windows: state holds one open session per
    (key, window-chain); a session closes — and emits, in append
    mode — once the watermark passes its end (last event + gap).
    Unlike tumbling/hopping windows whose state is bounded by
    (lateness / window) × |keys|, session state is bounded by the
    number of concurrently-open sessions, i.e. |active keys| — the
    natural unit for an unbounded per-user event stream."""
    stream = as_event_time(stream, "ts")
    return _session_rollup(stream.withWatermark("ts", lateness), key, gap)
