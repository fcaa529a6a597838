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


def _rollup(df: DataFrame, window: str) -> DataFrame:
    # per-row micro-units BEFORE the sum: bigint addition is exact and
    # associative, so stream (incremental) and batch (one-shot) sums
    # agree bit-for-bit — a double sum would depend on add order.
    micro = F.floor(F.col("value") * F.lit(1e6)).cast("bigint")
    return (df.groupBy(F.window("ts", window).alias("win"), "event_type")
              .agg(F.count("*").cast("bigint").alias("n_events"),
                   F.sum(micro).alias("sum_value_micro"))
              .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                       .alias("win_start"),
                      "event_type", "n_events", "sum_value_micro"))


def windowed_counts(events: DataFrame, *,
                    window: str = DEFAULT_WINDOW) -> DataFrame:
    """Batch twin: tumbling-window counts/sums over a static frame."""
    return _rollup(events, window)


def windowed_counts_stream(stream: DataFrame, *,
                           window: str = DEFAULT_WINDOW,
                           lateness: str = DEFAULT_LATENESS) -> DataFrame:
    """Streaming rollup: same plan over ``readStream`` input, with an
    event-time watermark so window state is evicted once closed and
    rows later than ``lateness`` are dropped (documented divergence
    from the batch twin, which sees everything)."""
    stream = as_event_time(stream, "ts")
    return _rollup(stream.withWatermark("ts", lateness), window)
