"""Salted-join equivalence and streaming windowed-rollup contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enexory_parquet_export_spark.operators.skew import salted_join
from enexory_parquet_export_spark.sources.tables import load_table
from enexory_parquet_export_spark.streaming.windowed import (
    windowed_counts,
    windowed_counts_stream,
)


def _fact_dim(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    fact = ev.select(
        "event_id",
        F.when(F.col("event_type") == "click", F.lit(0))
         .otherwise(F.col("user_id")).alias("k"),
        "value")
    dim = (fact.select("k").distinct()
               .withColumn("label", F.concat(F.lit("node-"),
                                             F.col("k").cast("string"))))
    return fact, dim


def test_salted_join_row_identical_to_plain(spark, sf_dir):
    fact, dim = _fact_dim(spark, sf_dir)
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", n_salts=8,
                         salt_src=F.col("event_id"))
    key = lambda r: (r["k"], r["event_id"])  # noqa: E731
    assert sorted(map(tuple, salted.collect())) \
        == sorted(map(tuple, plain.select(*salted.columns).collect()))


def test_salted_join_left_keeps_unmatched(spark, sf_dir):
    fact, dim = _fact_dim(spark, sf_dir)
    # drop key 0 from dim: the hot key must survive a left join as null
    dim0 = dim.filter(F.col("k") != 0)
    out = salted_join(fact, dim0, "k", n_salts=4,
                      salt_src=F.col("event_id"), how="left")
    assert out.count() == fact.count()
    assert out.filter(F.col("label").isNull()).count() \
        == fact.filter(F.col("k") == 0).count()


def test_salted_join_requires_salt_src(spark, sf_dir):
    fact, dim = _fact_dim(spark, sf_dir)
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k")


@pytest.mark.slow
def test_stream_rollup_equals_batch(spark, sf_dir, tmp_path):
    """Drain events through the watermarked streaming rollup in
    micro-batches; closed-window output must equal the batch twin
    (no late rows in replay order by construction: the watermark
    only drops rows arriving after later event times, and we feed
    files whole)."""
    ev = (load_table(spark, sf_dir, "events")
          .select("ts", "event_type", "value").limit(3000))
    expected = sorted(map(tuple, windowed_counts(ev).collect()))

    src = str(tmp_path / "src")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = (windowed_counts_stream(stream)
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    # append mode emits only windows the watermark has closed; the
    # final windows stay open, so compare on the emitted subset and
    # require it to be a prefix-consistent subset of the batch rows
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got, "stream emitted no closed windows"
    assert set(got) <= set(expected)
    # every batch row not emitted must be within lateness of max ts —
    # i.e. a still-open window, not a lost one
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts.timestamp() - 30 * 60
    import datetime
    for row in set(expected) - set(got):
        ws = datetime.datetime.fromisoformat(row[0]).timestamp()
        assert ws + 3600 > horizon, f"closed window lost: {row}"


@pytest.mark.slow
def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Duplicates across micro-batches within the lateness window are
    dropped (first arrival wins); the surviving key set equals the
    batch dropDuplicates result."""
    from enexory_parquet_export_spark.streaming.dedup_stream import (
        dedup_stream,
    )

    ev = (load_table(spark, sf_dir, "events")
          .select("ts", "event_type", "value").limit(1000))
    # content key = event_type+floor(value): coarse → real duplicates
    keyed = ev.withColumn("ckey", F.concat("event_type",
                                           F.floor("value").cast("string")))
    n_unique = keyed.dropDuplicates(["ckey"]).count()
    assert n_unique < keyed.count()  # fixture genuinely has dups

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    keyed.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(keyed.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    # lateness covers the whole fixture span: no row is late, no state
    # evicted → stream output must equal the batch dropDuplicates set
    q = (dedup_stream(stream, ["ckey"], lateness="365 days")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == n_unique
    assert got.select("ckey").distinct().count() == n_unique


@pytest.mark.slow
def test_stream_dedup_state_evicted_past_watermark(spark, tmp_path):
    """A duplicate arriving after the key's state expired (watermark
    passed first_seen + lateness) is emitted again — the documented,
    bounded-state divergence from batch dedup."""
    from enexory_parquet_export_spark.streaming.dedup_stream import (
        dedup_stream,
    )

    def frame(rows):
        return (spark.createDataFrame(rows, "ts_s string, ckey string")
                .select(F.to_timestamp("ts_s").alias("ts"), "ckey"))

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    batches = [
        [("2024-01-01 01:00:00", "k1")],
        [("2024-01-01 05:00:00", "adv")],   # advances event time…
        [("2024-01-01 05:30:00", "adv2")],  # …wm (05:00-10m) applied a
                                            # batch later evicts k1's
                                            # 01:10-expiry state here
        [("2024-01-01 06:00:00", "k1")],    # state gone → emitted
    ]
    import time
    for rows in batches:
        frame(rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.1)  # distinct modtimes → deterministic file order

    stream = (spark.readStream.schema(frame(batches[0]).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dedup_stream(stream, ["ckey"], lateness="10 minutes")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = sorted((r["ckey"], str(r["ts"])) for r in
                 spark.read.parquet(out).collect())
    assert [k for k, _ in got].count("k1") == 2, got


@pytest.mark.slow
def test_stream_rollup_drops_late_rows(spark, tmp_path):
    """A row older than the watermark at its arrival must be dropped:
    feed one file that advances event time, then one with a too-late
    row, one file per trigger."""
    import time

    rows1 = [("2024-01-01 00:10:00", "click", 1.0),
             ("2024-01-01 05:00:00", "click", 1.0)]
    rows2 = [("2024-01-01 00:20:00", "click", 1.0),  # 4h40m late > 30m
             ("2024-01-01 05:10:00", "click", 1.0)]

    def frame(rows):
        return (spark.createDataFrame(rows, "ts_s string, event_type string, "
                                            "value double")
                .select(F.to_timestamp("ts_s").alias("ts"),
                        "event_type", "value"))

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    frame(rows1).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(frame(rows1).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (windowed_counts_stream(stream)
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 120
        # wait until the first file is fully processed (watermark set)
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["stateOperators"] and \
                    p["stateOperators"][0]["numRowsTotal"] >= 1 and \
                    p["batchId"] >= 1:
                break
            time.sleep(0.5)
        frame(rows2).coalesce(1).write.mode("append").parquet(src)
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= 3:
                break
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    # the 00:00 window contains ONLY the on-time 00:10 row: the 00:20
    # arrival came after the watermark passed 04:30 and was dropped
    w0 = [r for r in got if r[0] == "2024-01-01 00:00:00"]
    assert w0 and w0[0][2] == 1, f"late row not dropped: {got}"


@pytest.mark.slow
def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    """Views joined to clicks within [view_ts, view_ts + 10m] per user:
    the streaming inner join must emit exactly the batch join's rows
    (inner matches emit on arrival; watermarks only bound state)."""
    from enexory_parquet_export_spark.streaming.join_stream import (
        interval_join_stream,
    )

    ev = load_table(spark, sf_dir, "events").limit(4000)
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("l_ts"),
                     F.col("event_id").alias("view_id")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("r_ts"),
                      F.col("event_id").alias("click_id")))
    cond = ((views["user_id"] == clicks["user_id"])
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 minutes")))
    expected = sorted(map(tuple,
                          views.join(clicks, cond, "inner")
                               .drop(clicks["user_id"])
                               .select("user_id", "view_id", "click_id")
                               .collect()))
    assert expected, "fixture produced no interval matches"

    vsrc, csrc, out, ckpt = (str(tmp_path / d)
                             for d in ("v", "c", "sink", "ckpt"))
    views.repartition(3).write.mode("overwrite").parquet(vsrc)
    clicks.repartition(3).write.mode("overwrite").parquet(csrc)
    vs = (spark.readStream.schema(views.schema)
          .option("maxFilesPerTrigger", 1).parquet(vsrc))
    cs = (spark.readStream.schema(clicks.schema)
          .option("maxFilesPerTrigger", 1).parquet(csrc))
    q = (interval_join_stream(vs, cs, lateness="365 days")
         .select("user_id", "view_id", "click_id")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == expected


@pytest.mark.slow
def test_stream_session_windows_equal_batch(spark, sf_dir, tmp_path):
    """Sessions closed by the watermark must match the batch twin's
    sessions exactly; still-open sessions may be withheld but never
    wrong.  Feeding files whole in event-time-ish order keeps every
    emitted session final."""
    from enexory_parquet_export_spark.streaming.windowed import (
        session_counts,
        session_counts_stream,
    )

    ev = (load_table(spark, sf_dir, "events")
          .select("ts", "user_id").limit(3000))
    expected = sorted(map(tuple, session_counts(ev).collect()))

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = (session_counts_stream(stream)
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got, "stream emitted no closed sessions"
    assert set(got) <= set(expected), \
        "stream emitted a session the batch twin does not have"


@pytest.mark.slow
def test_stream_hopping_rollup_equals_batch(spark, sf_dir, tmp_path):
    """Hopping (1h window / 30m slide) streaming rollup: every closed
    window emitted must match the batch twin (x70's shape)."""
    ev = (load_table(spark, sf_dir, "events")
          .select("ts", "event_type", "value").limit(2000))
    expected = sorted(map(tuple,
                          windowed_counts(ev, slide="30 minutes").collect()))

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = (windowed_counts_stream(stream, slide="30 minutes")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got, "stream emitted no closed windows"
    assert set(got) <= set(expected)


@pytest.mark.slow
def test_stream_rollup_recovery_from_checkpoint(spark, sf_dir, tmp_path):
    """Kill-and-resume for the watermarked windowed aggregate: part 2
    arrives only after the first query terminated, the restart resumes
    from checkpoint, and windows SPANNING the restart boundary must be
    emitted exactly once with their full (part1 + part2) counts."""
    ev = (load_table(spark, sf_dir, "events")
          .select("ts", "event_type", "value")
          .orderBy("ts").limit(3000))
    rows = ev.collect()
    cut = len(rows) // 2
    expected = sorted(map(tuple, windowed_counts(ev).collect()))

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))

    def run_once():
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", 2).parquet(src))
        q = (windowed_counts_stream(stream)
             .writeStream.format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    spark.createDataFrame(rows[:cut], ev.schema) \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame(rows[cut:], ev.schema) \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()

    got_rows = [tuple(r) for r in spark.read.parquet(out).collect()]
    # exactly-once: no (window, event_type) key emitted twice across
    # the restart
    keys = [(r[0], r[1]) for r in got_rows]
    assert len(keys) == len(set(keys)), "window emitted twice"
    got = set(got_rows)
    assert got, "stream emitted no closed windows"
    # every emitted row carries the FULL cross-restart aggregate
    assert got <= set(expected), got - set(expected)
    # the boundary window (containing rows[cut]) must close and match
    # once part 2 advances the watermark past it
    max_ts = rows[-1]["ts"].timestamp()
    horizon = max_ts - 30 * 60
    import datetime
    for row in set(expected) - got:
        ws = datetime.datetime.fromisoformat(row[0]).timestamp()
        assert ws + 3600 > horizon, f"closed window lost: {row}"
