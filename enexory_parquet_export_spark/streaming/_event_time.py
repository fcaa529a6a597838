"""Event-time column normalization for watermarked operators.

The fixture parquet stores `timestamp[us]` with isAdjustedToUTC=false,
which Spark 4 infers as TIMESTAMP_NTZ — but `withWatermark` requires
TIMESTAMP_LTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).  With
the session timezone pinned to UTC (session.py) the NTZ→LTZ cast is a
pure re-tagging of the same wall-clock instant, so batch twins that
group/format the NTZ column and streams that watermark the LTZ cast of
it render identical window strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def as_event_time(df: DataFrame, col: str) -> DataFrame:
    """Cast ``col`` to TIMESTAMP_LTZ iff it is TIMESTAMP_NTZ (no-op
    otherwise) so it is legal as a watermark event-time column."""
    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is not None and isinstance(field.dataType, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
