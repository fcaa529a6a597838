"""Day-partitioned parquet writer — the reference's partition contract.

The reference writes one snappy parquet file per day named
``YYYY-MM-DD.parquet`` (Parquet Export/db_extractor.py:15,211,247;
consolidate.cpp:116,375) and uses whole-partition rewrite as its only
update primitive.  We adopt the idiomatic Hive layout
(``day=YYYY-MM-DD/part-*.parquet``) and preserve the *contract*, not
the file shape (SURVEY.md §7 risk register):

- per-day overwrite is idempotent → dynamic partition overwrite;
- a day whose merged result is empty disappears entirely
  (consolidate.cpp:226-238) → ``remove_empty_days`` deletes partitions
  that were touched by a merge but produced zero rows.

Scale posture: dynamic partition overwrite only rewrites touched
partitions, so a 100 TB mirror with a 3-day CDC window rewrites 3
partitions, never the table.  ``remove_empty_days`` is a driver-side
metadata operation on the partition *list*, never a data scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_day_partitioned(df: DataFrame, path: str,
                          mode: str = "overwrite",
                          day_col: str = "day") -> None:
    """Write partitioned by day with dynamic partition overwrite.

    ``mode="overwrite"`` + partitionOverwriteMode=dynamic rewrites only
    the day-partitions present in ``df`` — the Spark-native equivalent
    of the reference's per-day file overwrite
    (Parquet Export/db_extractor.py:247-248).
    """
    (df.repartition(day_col)  # one shuffle → at most one writer task per day
       .write.mode(mode)
       .partitionBy(day_col)
       .parquet(path))


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jvm, jpath


def list_days(spark: SparkSession, path: str) -> list[str]:
    """Partition values present under ``path`` (metadata only)."""
    fs, jvm, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return []
    days = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("day="):
            days.append(name[len("day="):])
    return sorted(days)


def remove_empty_days(spark: SparkSession, path: str,
                      touched_days: list[str],
                      surviving_days: list[str]) -> list[str]:
    """Delete day-partitions a merge touched but left empty.

    Dynamic partition overwrite cannot delete a partition for which
    the merge produced zero rows (no rows → partition not in the write
    set), so the reference's delete-file-when-empty behavior
    (consolidate.cpp:226-238) needs this explicit cleanup.
    """
    doomed = sorted(set(touched_days) - set(surviving_days))
    fs, jvm, _ = _hadoop_fs(spark, path)
    removed = []
    for day in doomed:
        part = jvm.org.apache.hadoop.fs.Path(f"{path}/day={day}")
        if fs.exists(part):
            fs.delete(part, True)
            removed.append(day)
    return removed


def read_day_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the mirror back; ``day`` comes from the directory layout,
    so day-filters become partition pruning (no data scan)."""
    return spark.read.parquet(path).withColumn("day", F.col("day").cast("string"))
