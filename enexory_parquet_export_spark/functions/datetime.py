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


def normalize_datetime(col: Column) -> Column:
    """string → timestamp → canonical 19-char string, sentinel on failure.

    Spark-first restatement of the reference's ``pd.to_datetime(...,
    errors="coerce") → strftime → fillna(sentinel)``
    (Parquet Export/db_extractor.py:242-245).  ``try_to_timestamp``
    keeps ANSI mode happy on malformed input.

    INTENTIONALLY STRICTER than the reference at the normalization
    boundary: pandas' dateutil fallback also accepts laxer inputs
    (date-only ``2024-01-05``, ``2024/01/05``, …) which this engine
    sentinels instead.  The single canonical format is the contract
    both the storage layer (19-char validation, db_extractor.py:14,119)
    and the DuckDB oracle (``try_strptime`` with the same one format,
    declared query q04) enforce — accepting more here would make the
    engine's output depend on a parser quirk the rest of the reference
    pipeline itself rejects.
    """
    parsed = F.try_to_timestamp(col, F.lit(DT_FORMAT))
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
