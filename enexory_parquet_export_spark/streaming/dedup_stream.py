"""Streaming exact dedup — dropDuplicatesWithinWatermark.

Batch exact dedup (q27, `operators/dedup.py:exact_dedup`) keeps the
first row per content key with one hash aggregation.  On an unbounded
stream the same contract needs bounded state: keys older than the
watermark can never collide with a future arrival (any such arrival
would itself be dropped as late), so their dedup state is safe to
evict.  ``dropDuplicatesWithinWatermark`` is exactly that operator —
state size tracks the key cardinality of one lateness window, not of
the stream's history, which is what makes exact dedup viable on an
unbounded 100 TB/day ingest.

Divergence from the batch twin, by design: two duplicates separated by
MORE than the lateness window are both emitted (the first's state was
already evicted).  The batch path, which sees all data at once, drops
the second.  Pipelines needing absolute uniqueness run the batch dedup
as a daily compaction behind the stream — the same layering the
reference uses for its daily refetch (db_extractor.py:284-291).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from enexory_parquet_export_spark.streaming._event_time import as_event_time

DEFAULT_LATENESS = "30 minutes"


def dedup_stream(stream: DataFrame, keys: list[str], *,
                 event_time_col: str = "ts",
                 lateness: str = DEFAULT_LATENESS) -> DataFrame:
    """First-arrival-wins exact dedup over ``keys`` with state bounded
    by the watermark.  ``keys`` should be the content identity (e.g. a
    text hash), never include the event time itself."""
    stream = as_event_time(stream, event_time_col)
    return (stream.withWatermark(event_time_col, lateness)
                  .dropDuplicatesWithinWatermark(keys))
