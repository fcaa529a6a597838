"""Datetime scalar battery (reference operators O5, O7, O8).

The reference stores both domain time (``date_time``) and row-version
time (``ts``) as 19-char ``YYYY-MM-DD HH:MM:SS`` *strings* because its
pandas path cannot represent pre-1677 years
(Parquet Export/db_extractor.py:56,206,245).  Spark's TimestampType is
µs-precision and handles year 1 fine, so internally we use real
timestamps and only render strings at the storage boundary.

All built-in JVM expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the reference's unparseable-datetime sentinel
#: (Parquet Export/db_extractor.py:56,206,245)
SENTINEL_DT = "0001-01-01 00:00:00"

#: row-validation pattern (Parquet Export/db_extractor.py:14)
DT_PATTERN = r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"

DT_FORMAT = "yyyy-MM-dd HH:mm:ss"

#: lax-parse fallback chain, tried in order (ADVICE r2): the reference
#: normalizes through ``pd.to_datetime(errors="coerce")``
#: (db_extractor.py:242-245), whose dateutil path also accepts
#: date-only and slash-separated inputs.  An EXPLICIT format list keeps
#: the engine deterministic (dateutil's full grammar is unspecifiable
#: cross-engine) while covering the shapes the reference's feeds
#: actually produce; anything else still → sentinel.
LAX_DT_FORMATS: tuple[str, ...] = (
    DT_FORMAT,                  # canonical 19-char
    "yyyy-MM-dd'T'HH:mm:ss",    # ISO-8601 'T' separator
    "yyyy-MM-dd",               # date-only → midnight
    "yyyy/MM/dd HH:mm:ss",
    "yyyy/MM/dd",
)

#: the same chain for the DuckDB oracle side (strptime dialect)
LAX_DT_FORMATS_STRPTIME: tuple[str, ...] = (
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d",
    "%Y/%m/%d %H:%M:%S",
    "%Y/%m/%d",
)


def normalize_datetime(col: Column) -> Column:
    """string → timestamp → canonical 19-char string, sentinel on failure.

    Spark-first restatement of the reference's ``pd.to_datetime(...,
    errors="coerce") → strftime → fillna(sentinel)``
    (Parquet Export/db_extractor.py:242-245): each ``try_to_timestamp``
    in :data:`LAX_DT_FORMATS` is tried in order (ANSI-safe — malformed
    input yields NULL, not an error), so date-only ``2024-01-05``
    normalizes to ``2024-01-05 00:00:00`` exactly as pandas' lax parser
    does, and only genuinely unparseable input collapses to the
    sentinel.  Downstream row VALIDATION (O6, db_extractor.py:14,119)
    still enforces the strict 19-char pattern — lax on ingest,
    strict on audit, the reference's own split.
    """
    parsed = F.coalesce(
        *[F.try_to_timestamp(col, F.lit(f)) for f in LAX_DT_FORMATS])
    return F.coalesce(F.date_format(parsed, DT_FORMAT), F.lit(SENTINEL_DT))


def day_key(col: Column) -> Column:
    """Partition key: ``substr(date_time, 1, 10)`` — string prefix, as
    in consolidate.cpp:66 / db_extractor.py:209."""
    return F.substring(col, 1, 10)


def utc2_render(epoch_col: Column) -> Column:
    """Unix epoch → fixed UTC+2 wall-clock 19-char string.

    The reference formats CDC ``ts`` epochs at a hard +2h offset with
    no DST rules (consolidate.cpp:45-53); with the session pinned to
    UTC this is an explicit shift, never a zone lookup.
    """
    return F.date_format(F.timestamp_seconds(epoch_col + F.lit(7200)), DT_FORMAT)
