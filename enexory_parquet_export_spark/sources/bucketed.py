"""Bucketed tables: shuffle-free co-located joins.

The engine's hottest join is CDC changes ⋈ base mirror on ``pk``
(O13/O14, Parquet Export/consolidate.cpp:164-214), repeated every
merge cycle.  At 100 TB both sides of a sort-merge join shuffle ~the
full table each cycle; pre-bucketing both tables by ``pk`` into the
same bucket count makes the join's distribution requirement already
satisfied at read time — Catalyst plans the join with NO Exchange on
either side (tests/test_bucketed_compact.py asserts this on the
physical plan).  This is Spark's storage-level answer to the
reference's persistent ``unordered_map<pk, row>`` probe structure: the
hash layout lives in the table format instead of executor memory.

Bucketing requires the table-catalog write path (``saveAsTable``);
plain ``.parquet(path)`` writes no bucket metadata.  Tables are
written as EXTERNAL (caller-owned path) so the data outlives the
catalog entry and stays readable as plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(df: DataFrame, table: str, *, path: str,
                   bucket_col: str = "pk",
                   n_buckets: int = DEFAULT_BUCKETS,
                   sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as an external bucketed table.

    ``sort_col`` additionally sorts within buckets, letting a
    sort-merge join skip its per-partition sort too (plan shows
    neither Exchange nor Sort).  ``n_buckets`` must match on both
    sides of a join to co-locate; pick it like a shuffle partition
    count — ≈ table_bytes / 128MB at production scale.
    """
    w = df.write.mode(mode).option("path", path)
    if sort_col is not None:
        w = w.bucketBy(n_buckets, bucket_col).sortBy(sort_col)
    else:
        w = w.bucketBy(n_buckets, bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (must go
    through the catalog — ``spark.read.parquet`` on the same path
    would see the rows but lose the bucketing and re-shuffle)."""
    return spark.table(table)
