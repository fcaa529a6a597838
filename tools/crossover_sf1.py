"""sf1 crossover experiment: window/CDC family, Spark vs DuckDB.

VERDICT r1 graded the window family (q19/q20/q21) and CDC merge
`weak`: 3-4 s wall at sf0.1 vs DuckDB's 0.05-0.26 s.  BASELINE.md
argues those ratios measure Spark's fixed per-job floor, not
throughput — this experiment tests that claim by scaling events 10×
(≈ sf1, ~6M rows) and re-timing the same four query shapes on both
engines.  If the floor argument is right, the ratio must collapse
toward ≤2× as real work swamps the constant.

The scaled table derives deterministically from the sf0.1 fixture
(10 copies, event_id/user_id offset per copy so keys stay unique and
key cardinality grows 10×) and is cached under ``.scratch/`` (git-
ignored).  Usage::

    python tools/crossover_sf1.py [--copies N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch")

#: the four r1-`weak` shapes, as SQL both engines run verbatim on the
#: scaled events table (identical text → identical work)
QUERIES = {
    "rank_lastwins": """
        SELECT user_id, event_id, event_type FROM (
          SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events_sf1) t WHERE rn = 1""",
    "lag_changes": """
        SELECT user_id, event_id FROM (
          SELECT user_id, event_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events_sf1) t WHERE prev IS NOT NULL AND prev <> event_type""",
    "frame_movsum": """
        SELECT user_id, event_id,
               CAST(floor(sum(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 1e6) AS BIGINT)
               AS mov_micro
        FROM events_sf1""",
    "hash_agg": """
        SELECT user_id, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sv
        FROM events_sf1 GROUP BY user_id, event_type""",
}


def build_scaled(spark, copies: int) -> str:
    path = os.path.join(SCRATCH, f"events_x{copies}.parquet")
    if os.path.exists(path):
        return path
    from pyspark.sql import functions as F

    from enexory_parquet_export_spark.sources.tables import load_table
    ev = load_table(spark, SF_DIR, "events")
    parts = [
        ev.select((F.col("event_id") + i * 1_000_000_000).alias("event_id"),
                  "ts",
                  (F.col("user_id") + i * 1_000).alias("user_id"),
                  "event_type", "value")
        for i in range(copies)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    copies = 10
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])

    from enexory_parquet_export_spark.session import get_spark
    spark = get_spark("crossover")
    spark.sparkContext.setLogLevel("ERROR")
    path = build_scaled(spark, copies)

    spark.read.parquet(path).createOrReplaceTempView("events_sf1")
    # warm both engines on a throwaway full pass
    spark.sql("SELECT count(*) FROM events_sf1").collect()

    import duckdb
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events_sf1 AS SELECT * FROM read_parquet('{path}/*.parquet')")
    con.execute("SELECT count(*) FROM events_sf1").fetchall()

    n = spark.sql("SELECT count(*) FROM events_sf1").collect()[0][0]
    print(f"rows: {n:,} ({copies}× sf0.1)")
    print(f"| query | duckdb sec | spark sec | ratio |")
    print(f"|---|---|---|---|")
    for name, sql in QUERIES.items():
        t0 = time.perf_counter()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        # .arrow(): near-zero-copy columnar export — python-object
        # fetchall() would bill DuckDB millions of row conversions
        # that Spark's noop sink doesn't pay
        con.execute(sql).arrow()
        td = time.perf_counter() - t0
        print(f"| {name} | {td:.2f} | {ts:.2f} | {ts/td:.2f}× |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
