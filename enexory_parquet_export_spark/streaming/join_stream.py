"""Stream-stream interval join with watermark-bounded state.

The batch range join (q17, `operators/range_join.py`) pairs rows whose
event times fall within an interval.  The streaming form joins two
UNBOUNDED streams under the same predicate; what makes it tractable is
the pair of watermarks plus the time-range condition, from which Spark
derives how long each side's rows can still find a partner and evicts
join state past that horizon.  Without the interval bound the state
would grow with the stream; with it, state is O(rate × window) on each
side — the property that lets, e.g., a 100 TB/day click stream join a
view stream continuously.

Inner-join semantics: a match is emitted as soon as both rows have
arrived (no watermark wait); the watermark only garbage-collects
state, so the emitted set equals the batch join over the same data
whenever no row is dropped as late — the equivalence the test
asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enexory_parquet_export_spark.streaming._event_time import as_event_time

DEFAULT_LATENESS = "30 minutes"


def interval_join_stream(left: DataFrame, right: DataFrame, *,
                         key: str = "user_id",
                         left_ts: str = "l_ts", right_ts: str = "r_ts",
                         window: str = "10 minutes",
                         lateness: str = DEFAULT_LATENESS) -> DataFrame:
    """Inner-join two streams on ``key`` where ``right_ts`` falls in
    ``[left_ts, left_ts + window]``.  Both inputs must already carry
    distinct timestamp column names (rename before calling)."""
    lw = as_event_time(left, left_ts).withWatermark(left_ts, lateness)
    rw = as_event_time(right, right_ts).withWatermark(right_ts, lateness)
    cond = ((lw[key] == rw[key])
            & (F.col(right_ts) >= F.col(left_ts))
            & (F.col(right_ts) <= F.col(left_ts)
               + F.expr(f"INTERVAL {window}")))
    return lw.join(rw, cond, "inner").drop(rw[key])
