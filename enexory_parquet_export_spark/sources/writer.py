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
                          day_col: str = "day",
                          file_format: str = "parquet") -> None:
    """Write partitioned by day with dynamic partition overwrite.

    ``mode="overwrite"`` + partitionOverwriteMode=dynamic rewrites only
    the day-partitions present in ``df`` — the Spark-native equivalent
    of the reference's per-day file overwrite
    (Parquet Export/db_extractor.py:247-248).

    ``file_format`` selects the columnar sink: ``parquet`` (the
    reference's mirror format, snappy by session conf) or ``orc``
    (same partition contract, same pushdown/pruning story).
    """
    (df.repartition(day_col)  # one shuffle → at most one writer task per day
       .write.mode(mode)
       .partitionBy(day_col)
       .format(file_format)
       .save(path))


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


def read_day_partitioned(spark: SparkSession, path: str,
                         file_format: str = "parquet") -> DataFrame:
    """Read the mirror back; ``day`` comes from the directory layout,
    so day-filters become partition pruning (no data scan)."""
    return (spark.read.format(file_format).load(path)
                 .withColumn("day", F.col("day").cast("string")))


def write_clustered(df: DataFrame, path: str, cluster_cols: list[str], *,
                    n_files: int | None = None,
                    mode: str = "overwrite") -> None:
    """Range-cluster ``df`` on ``cluster_cols`` so parquet min/max
    footer statistics prune scans.

    ``repartitionByRange`` gives each output file a disjoint key range
    and ``sortWithinPartitions`` tightens every row group's min/max to
    a narrow slice — a point or range predicate on the cluster key
    then skips whole files (and row groups within them) from the
    footer alone, before any data IO.  At 100 TB this is the
    difference between a key lookup scanning the table and scanning
    one file; it is the flat-file analog of the reference's
    one-day-per-file layout (db_extractor.py:211), generalized to any
    key.  Cost: one range shuffle (sampling pass + exchange) at write
    time — paid once, saved on every subsequent selective read.
    """
    part = (df.repartitionByRange(n_files, *cluster_cols)
            if n_files is not None else df.repartitionByRange(*cluster_cols))
    (part.sortWithinPartitions(*cluster_cols)
         .write.mode(mode).parquet(path))


#: production parquet sweet spot; tests pass something tiny
DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def day_file_stats(spark: SparkSession, path: str) -> dict[str, tuple[int, int]]:
    """``{day: (n_files, total_bytes)}`` — pure file-listing metadata."""
    fs, jvm, jpath = _hadoop_fs(spark, path)
    out: dict[str, tuple[int, int]] = {}
    if not fs.exists(jpath):
        return out
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith("day=")):
            continue
        n, total = 0, 0
        for f in fs.listStatus(status.getPath()):
            if f.isFile() and not f.getPath().getName().startswith(("_", ".")):
                n += 1
                total += f.getLen()
        out[name[len("day="):]] = (n, total)
    return out


def compact_days(spark: SparkSession, path: str, *,
                 target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
                 days: list[str] | None = None) -> dict[str, int]:
    """Rewrite fragmented day-partitions to ≈``target_file_bytes`` files.

    Long-running CDC merges leave each hot day with one small file per
    merge batch; at 100 TB the resulting listing/open overhead (and
    scan tasks per file) dominates read cost.  This is the maintenance
    twin of the reference's one-file-per-day invariant
    (Parquet Export/db_extractor.py:211) expressed as an explicit,
    idempotent operator: per fragmented day, read → ``repartition(n)``
    with n = ceil(bytes/target) → dynamic-overwrite THAT partition
    only.  Days already at their target count are skipped without
    reading data (``day_file_stats`` is listing-only), so the cost is
    proportional to fragmentation, not table size.

    Returns ``{day: new_file_count}`` for the rewritten days.
    """
    stats = day_file_stats(spark, path)
    rewritten: dict[str, int] = {}
    todo = []
    for day, (n_files, total) in sorted(stats.items()):
        if days is not None and day not in days:
            continue
        want = max(1, -(-total // target_file_bytes))
        if n_files > want:
            todo.append((day, want))
    if not todo:
        return rewritten
    df = read_day_partitioned(spark, path)
    for day, want in todo:
        (df.filter(F.col("day") == day)   # partition-pruned scan
           .repartition(want)
           .write.mode("overwrite").partitionBy("day").parquet(path))
        rewritten[day] = want
    return rewritten


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of ``cols`` as one BIGINT sort key.

    Each column must already be a non-negative integer rank in
    ``[0, 2^bits)`` (use ``ntile``/width bucketing or a rank window to
    get one); the key interleaves their bits so that sorting by it
    keeps EVERY input dimension locally clustered — per-file min/max
    footer ranges stay narrow on all dimensions at once, where a
    lexicographic sort only tightens the leading column.  Pure
    shift/or expression tree: stays in whole-stage codegen, no UDF.

    This is the standard multi-dimensional data-skipping layout
    (Morton curves; the technique behind OPTIMIZE ZORDER in
    lakehouse table formats), applied to plain parquet.

    ``len(cols) * bits`` must fit below the BIGINT sign bit (≤ 63):
    a top bit at position 63 would make half the keys negative and
    sort BEFORE all positive ones, silently destroying the clustering
    (ADVICE r2).  Each column is masked to ``bits`` wide so an
    out-of-range rank corrupts only its own key, never a neighbor's
    interleave lanes.
    """
    from functools import reduce
    from operator import add

    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"zorder_key: {n} cols × {bits} bits = {n * bits} bits "
            f"overflows the BIGINT sign bit (max 63); lower bits to "
            f"{63 // n} or rank fewer columns")
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            # bit b of col i lands at interleaved position b*n + i;
            # the mask clamps ranks outside [0, 2^bits) to their low
            # `bits` bits instead of bleeding into other lanes
            col = F.col(c) if isinstance(c, str) else c
            masked = col.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
            bit = F.shiftright(masked, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    return reduce(add, terms)


def write_zordered(df: DataFrame, path: str, rank_cols: list[str], *,
                   bits: int = 16, n_files: int | None = None,
                   mode: str = "overwrite") -> None:
    """Cluster ``df`` on the Z-order interleave of ``rank_cols``
    (each pre-ranked to ``[0, 2^bits)``): one range shuffle on the
    Morton key, then a within-partition sort — every dimension's
    footer min/max stays narrow, so selective predicates on ANY of
    the clustered columns prune files, not just the leading one.
    """
    z = zorder_key(list(rank_cols), bits).alias("_z")
    part = df.withColumn("_z", z)
    part = (part.repartitionByRange(n_files, "_z")
            if n_files is not None else part.repartitionByRange("_z"))
    (part.sortWithinPartitions("_z").drop("_z")
         .write.mode(mode).parquet(path))


def write_reference_layout(df: DataFrame, path: str, *,
                           day_col: str = "day") -> list[str]:
    """Export in the REFERENCE'S file layout: one snappy parquet file
    per day named ``YYYY-MM-DD.parquet`` flat under ``path`` — exactly
    what ``db_extractor.py:15,211,247`` writes and what its repair pass
    parses back out of the filename (db_extractor.py:160-163).

    The engine's native mirror keeps the Hive ``day=`` layout; this
    compat mode lets reference tooling (row_integrity.py, the repair
    walk, downstream consumers globbing ``*.parquet``) consume the
    mirror unchanged during a migration.  The ``day`` column lives in
    the FILENAME only, matching the reference (its per-day files don't
    carry the day as a column).

    Mechanics: one day-partitioned write (one file per day via the
    partition repartition), then a driver-side FS rename per day —
    bounded by day count, metadata-only, the same class of operation
    as :func:`list_days`.  Idempotent: an existing ``<day>.parquet``
    is replaced atomically-per-day (delete + rename).

    Returns the day keys written.
    """
    spark = df.sparkSession
    tmp = path.rstrip("/") + "/_ref_export_tmp"
    fs, jvm, _ = _hadoop_fs(spark, path)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(path))
    (df.repartition(day_col)
       .write.mode("overwrite").partitionBy(day_col).parquet(tmp))
    written = []
    try:
        for day in list_days(spark, tmp):
            part_dir = jvm.org.apache.hadoop.fs.Path(f"{tmp}/day={day}")
            parts = [s.getPath() for s in fs.listStatus(part_dir)
                     if s.getPath().getName().endswith(".parquet")]
            if len(parts) != 1:  # repartition(day) guarantees one file
                raise RuntimeError(
                    f"expected exactly one part file for day {day}, "
                    f"got {len(parts)}")
            dest = jvm.org.apache.hadoop.fs.Path(f"{path}/{day}.parquet")
            if fs.exists(dest):
                fs.delete(dest, False)
            fs.rename(parts[0], dest)
            written.append(day)
    finally:
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    return sorted(written)


def read_reference_layout(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-layout export back, deriving ``day`` from the
    ``YYYY-MM-DD.parquet`` filename — the inverse of
    :func:`write_reference_layout` and the same filename-as-date parse
    the reference's repair pass performs (db_extractor.py:160-163)."""
    return (spark.read.parquet(path.rstrip("/") + "/*.parquet")
            .withColumn("day", F.regexp_extract(
                F.col("_metadata.file_path"),
                r"(\d{4}-\d{2}-\d{2})\.parquet$", 1)))


def mirror_to_replica(spark: SparkSession, primary: str, replica: str, *,
                      days: list[str] | None = None) -> list[str]:
    """Second-target mirror sink (O27): copy day-partitions
    byte-for-byte from the primary mirror to a replica path.

    The reference rsyncs its freshly-written day files to a second
    mirror after every merge (parse_binlogs.sh:146-151); a byte copy of
    the already-written partitions preserves that exactly — the replica
    is a verbatim clone (hash-identical files), not a re-encode, and
    re-running the copy for a day is idempotent (delete + copy).

    ``days=None`` copies every partition; pass the touched-day list
    after a merge for the reference's incremental behavior.  Driver-side
    FS operation bounded by day count — the data bytes move through the
    filesystem layer, never through Spark.
    """
    fs, jvm, _ = _hadoop_fs(spark, primary)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(replica))
    copied = []
    for day in (days if days is not None else list_days(spark, primary)):
        src = jvm.org.apache.hadoop.fs.Path(f"{primary}/day={day}")
        if not fs.exists(src):
            continue
        dst = jvm.org.apache.hadoop.fs.Path(f"{replica}/day={day}")
        if fs.exists(dst):
            fs.delete(dst, True)
        jvm.org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst,
                                               False, True, hconf)
        copied.append(day)
    # a day deleted on the primary disappears from the replica too
    for day in list_days(spark, replica):
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{primary}/day={day}")):
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{replica}/day={day}"),
                      True)
    return sorted(copied)
