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
    # --- round-2 additions: the remaining r1-`weak` shapes ---------------
    # enrich join: big fact ⋈ per-key dim derived from itself (the
    # changes⋈base shape of q13/q24 at fact scale)
    "join_enrich": """
        SELECT e.user_id, e.event_id, d.first_ts
        FROM events_sf1 e
        JOIN (SELECT user_id, min(ts) AS first_ts
              FROM events_sf1 GROUP BY user_id) d
          ON e.user_id = d.user_id
        WHERE e.event_type = 'purchase'""",
    # CDC consolidation core: last-event-wins per (day, pk) in one
    # hash agg — the q24 merge's dominant stage (consolidate.cpp:56-109)
    "cdc_consolidate": """
        SELECT CAST(ts AS DATE) AS day, user_id,
               max_by(event_type, event_id) AS last_op,
               max_by(value, event_id) AS last_value,
               max(event_id) AS max_seq
        FROM events_sf1 GROUP BY CAST(ts AS DATE), user_id""",
    # exact dedup keep-first by content key (q27 at fact scale)
    "dedup_keepfirst": """
        SELECT user_id, ts, value, event_id FROM (
          SELECT user_id, ts, value, event_id,
                 row_number() OVER (PARTITION BY user_id, ts, value
                                    ORDER BY event_id) AS rn
          FROM events_sf1) t WHERE rn = 1""",
    # global top-k by measure (q22's orderBy().limit() shape)
    "topk_global": """
        SELECT event_id, user_id, value FROM events_sf1
        WHERE value IS NOT NULL
        ORDER BY value DESC, event_id LIMIT 100""",
    # sessionization islands (x45/x71's shape: lag + running sum + agg)
    "sessionize": """
        SELECT user_id, snum, CAST(count(*) AS BIGINT) AS n_events FROM (
          SELECT user_id, sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS snum
          FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM (SELECT user_id, ts, event_id,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_ts
                  FROM events_sf1) t) t2) t3
        GROUP BY user_id, snum""",
    # time-based RANGE frame (x75's shape: trailing-hour count per key)
    "time_range_frame": """
        SELECT user_id, event_id,
               CAST(count(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_1h
        FROM events_sf1""",
}


def build_scaled(spark, copies: int) -> str:
    path = os.path.join(SCRATCH, f"events_x{copies}.parquet")
    if os.path.exists(path):
        return path
    from pyspark.sql import functions as F

    from enexory_parquet_export_spark.sources.tables import load_table
    ev = load_table(spark, SF_DIR, "events")
    # one crossJoin with a copy-index relation instead of a
    # copies-way union: the plan stays O(1) in `copies`
    idx = spark.range(copies).select(F.col("id").alias("_i"))
    out = ev.crossJoin(F.broadcast(idx)).select(
        (F.col("event_id") + F.col("_i") * 1_000_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_i") * 1_000).alias("user_id"),
        "event_type", "value")
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    copies = 10
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

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
        if only is not None and name not in only:
            continue
        # best-of-2 per engine: first Spark execution pays one-off
        # whole-stage-codegen JIT and first DuckDB execution pays OS
        # page-cache fill — steady-state is the number that scales
        ts = min(_timed(lambda: spark.sql(sql).write.format("noop")
                        .mode("overwrite").save()) for _ in range(2))
        # .arrow(): near-zero-copy columnar export — python-object
        # fetchall() would bill DuckDB millions of row conversions
        # that Spark's noop sink doesn't pay
        td = min(_timed(lambda: con.execute(sql).arrow())
                 for _ in range(2))
        print(f"| {name} | {td:.2f} | {ts:.2f} | {ts/td:.2f}× |")
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
