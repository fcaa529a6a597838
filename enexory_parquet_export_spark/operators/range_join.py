"""Banded (bucketed) range join — scalable non-equi time-window joins.

The reference's only range scan is the binlog time window (O16,
Parquet Export/parse_binlogs.sh:77-124).  Restated as a general
pattern: "for each probe row, aggregate the rows of the same key whose
time falls in [probe − w, probe)".

A naive equi-join on the key followed by a range filter materializes
every same-key pair — O(n²) per key, fatal at 100 TB.  Banding bounds
it: bucket both sides by ``floor(epoch / w)``; a row in the window of
a probe at bucket h can only live in buckets {h−1, h}, so the probe
side explodes into exactly two (key, bucket) probes and the join is
equi on (key, bucket).  Pair count drops from O(per-key²) to
O(per-key-per-window²) — and Catalyst still sees a plain shuffled
equi-join it can plan (broadcast/SMJ/AQE-skew as appropriate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_prior_count(events: DataFrame, *, window_seconds: int = 3600,
                       probe_filter: str = "event_type = 'error'") -> DataFrame:
    """Per probe event: count same-user events in [ts − w, ts).

    Returns ``event_id, prior_cnt`` for every probe row (zero-filled).
    """
    w = window_seconds
    ts_us = F.unix_micros(F.col("ts"))
    bucket = F.floor(ts_us / F.lit(w * 1_000_000))

    cand = events.select(
        F.col("user_id").alias("c_user"),
        ts_us.alias("c_us"),
        F.col("event_id").alias("c_id"),
        bucket.alias("c_bucket"))
    probes = (events.filter(probe_filter)
              .select(F.col("user_id").alias("p_user"),
                      ts_us.alias("p_us"),
                      F.col("event_id").alias("p_id"),
                      bucket.alias("p_bucket"))
              .withColumn("b", F.explode(F.array(F.col("p_bucket") - 1,
                                                 F.col("p_bucket")))))
    matched = (probes.join(
                   cand,
                   (F.col("p_user") == F.col("c_user"))
                   & (F.col("b") == F.col("c_bucket"))
                   & (F.col("c_us") >= F.col("p_us") - F.lit(w * 1_000_000))
                   & (F.col("c_us") < F.col("p_us")),
                   "inner")
               .groupBy("p_id").agg(F.count("*").alias("cnt")))
    all_probes = events.filter(probe_filter).select(
        F.col("event_id"))
    return (all_probes.join(matched, all_probes.event_id == matched.p_id, "left")
            .select("event_id", F.coalesce("cnt", F.lit(0)).alias("prior_cnt")))
