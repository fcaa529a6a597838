"""Streaming-surface throughput/latency bench (r4 verdict item 5).

Measures the three stateful/merging streaming operators over file
sources derived from the sf fixtures, in ONE SparkSession:

- ``cdc_stream``: foreachBatch consolidate+merge into a day-partitioned
  mirror (the reference's cron-batch path, O12/O13, run continuously);
- ``neardup_stream``: stateful MinHash-LSH near-dup candidates (x88's
  engine side), including the state-size-vs-stream-length series that
  demonstrates the ``#buckets × cap × k`` state bound empirically;
- ``pack_stream``: stateful sequence packing (x77's streaming twin).

Each run reports drained input rows, wall seconds, sustained rows/s,
micro-batch count, and mean/max batch duration from the query's
progress events; stateful runs add the final state row count.  Output:
a markdown table (paste into BASELINE.md) plus one JSON line.

``--sweep`` (r6 verdict item 6) instead runs a BATCH-SIZE sweep for
cdc_merge_stream and neardup_stream: the same input stream re-split
into files of 500 → 20k rows, one file per trigger, so rows/s vs
batch size exposes the per-micro-batch floor directly (each trigger
pays fixed plan/commit/state-store overhead; throughput scales until
batches are large enough to amortize it).

State-store note: the stateful operators (neardup/pack/change-detect)
use Spark's default HDFS-backed in-memory state store, whose per-
executor state must fit in heap.  On a cluster with large state, set
``spark.sql.streaming.stateStore.providerClass`` to
``org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
(RocksDB spills to local disk, keeps heap flat; supported by every
``applyInPandasWithState`` operator here unchanged) — pass
``--rocksdb`` to this bench to measure under it.

Usage::

    python tools/bench_streaming.py [sf_dir] [--batches N] [--sweep]
        [--rocksdb]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_progress(prog: list, true_rows=None):
    """Pure accounting over a streaming query's progress list —
    split from :func:`_drain` so the two metric traps the r6 sweep
    found stay PINNED by pytest (tests/test_streaming.py):

    - ``recentProgress`` retains only the last ~100 entries, so the
      batch count must come from the last ``batchId``, not
      ``len(prog)`` (batch durations stay a recent-window sample);
    - ``numInputRows`` counts source SCANS — a foreachBatch body that
      runs two actions over the micro-batch doubles it — so when the
      caller knows the true source row count it passes ``true_rows``.
    """
    prog = [p for p in (prog or []) if p]
    durs = [p["batchDuration"] / 1000.0 for p in prog
            if p.get("batchDuration") and p.get("numInputRows")]
    rows = (true_rows if true_rows is not None
            else sum(p.get("numInputRows", 0) for p in prog))
    nb = (prog[-1]["batchId"] + 1) if prog else 0
    state = None
    for p in reversed(prog):
        ops = p.get("stateOperators") or []
        if ops:
            state = ops[0].get("numRowsTotal")
            break
    return rows, nb, durs, state


def _drain(query, timeout=1800, true_rows=None):
    query.awaitTermination(timeout)
    return summarize_progress(query.recentProgress, true_rows)


def flatten_parts(src_dir: str, dest: str) -> str:
    """Flatten ``_f=N`` partition dirs into ``NNNNN.parquet`` append
    files in NUMERIC partition order.  A lexicographic dir sort puts
    ``_f=10`` before ``_f=2`` once there are ≥10 files, scrambling the
    file-source arrival order the sweep's per-batch workload depends
    on (r6 ADVICE) — last-applied-wins CDC state then reflects a
    permuted changelog and batch-size points stop being comparable."""
    os.makedirs(dest, exist_ok=True)
    i = 0
    dirs = [d for d in os.listdir(src_dir) if d.startswith("_f=")]
    for d in sorted(dirs, key=lambda d: int(d.split("=", 1)[1])):
        for f in sorted(os.listdir(os.path.join(src_dir, d))):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src_dir, d, f),
                            os.path.join(dest, f"{i:05d}.parquet"))
                i += 1
    return dest


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    n_files = 20
    if "--batches" in sys.argv:
        n_files = int(sys.argv[sys.argv.index("--batches") + 1])

    from pyspark.sql import functions as F

    from enexory_parquet_export_spark.operators.cdc import derive_changelog
    from enexory_parquet_export_spark.session import get_spark
    from enexory_parquet_export_spark.sources.tables import load_table
    from enexory_parquet_export_spark.streaming.cdc_stream import (
        CHANGELOG_SCHEMA,
        start_cdc_merge_stream,
        stream_changelog,
    )
    from enexory_parquet_export_spark.streaming.neardup_stream import (
        neardup_stream,
    )
    from enexory_parquet_export_spark.streaming.packing import pack_stream

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rocksdb" in sys.argv:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    work = tempfile.mkdtemp(prefix="bench_stream_")
    results = {}

    def report(name, rows, nb, durs, state, wall):
        mean_d = sum(durs) / len(durs) if durs else 0.0
        max_d = max(durs) if durs else 0.0
        results[name] = {
            "rows": rows, "wall_s": round(wall, 2),
            "rows_per_s": round(rows / wall, 0) if wall else 0,
            "micro_batches": nb,
            "mean_batch_s": round(mean_d, 3), "max_batch_s": round(max_d, 3),
            "state_rows": state,
        }
        print(f"{name:24s} rows={rows} wall={wall:.1f}s "
              f"rate={rows/wall:,.0f}/s batches={nb} "
              f"batch mean/max={mean_d:.2f}/{max_d:.2f}s state={state}")

    flat_files = flatten_parts          # numeric partition order

    def row_split(df, order_col: str, per_file: int, path: str) -> str:
        """Split df into files of exactly per_file rows in order_col
        order — the batch-size knob for the sweep (one file per
        trigger = per_file rows per micro-batch)."""
        from pyspark.sql import Window

        w = Window.orderBy(order_col)
        parts = path + "_parts"
        (df.withColumn("_f", ((F.row_number().over(w) - 1)
                              / per_file).cast("int"))
           .repartition("_f").write.partitionBy("_f")
           .mode("overwrite").parquet(parts))
        return flat_files(parts, path)

    # ---- source prep: changelog (events-derived) in n_files pieces ----
    log = derive_changelog(load_table(spark, sf_dir, "events"))
    log_rows = log.count()

    if "--sweep" in sys.argv:
        sizes = (500, 2000, 8000, 20000)
        for bs in sizes:
            src_b = row_split(log, "seq", bs,
                              os.path.join(work, f"cl_b{bs}"))
            t0 = time.time()
            q = start_cdc_merge_stream(
                stream_changelog(spark, src_b, max_files_per_trigger=1),
                os.path.join(work, f"mirror_b{bs}"),
                os.path.join(work, f"ckpt_cdc_b{bs}"))
            rows, nb, durs, state = _drain(q, true_rows=log_rows)
            report(f"cdc_merge_b{bs}", rows, nb, durs, state,
                   time.time() - t0)

        docs = (load_table(spark, sf_dir, "documents")
                .select("doc_id", "text"))
        n_docs = docs.count()
        mult = max(1, (max(sizes) + n_docs - 1) // n_docs)
        parts = [docs.select((F.col("doc_id") + m * 10_000_000)
                             .alias("doc_id"), "text")
                 for m in range(mult)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        schema = "doc_id bigint, text string"
        for bs in sizes:
            src_b = row_split(big, "doc_id", bs,
                              os.path.join(work, f"nd_b{bs}"))
            t0 = time.time()
            q = (neardup_stream(
                    spark.readStream.schema(schema)
                         .option("maxFilesPerTrigger", "1").parquet(src_b)
                         .select("doc_id", "text"))
                 .writeStream.format("noop")
                 .option("checkpointLocation",
                         os.path.join(work, f"ckpt_nd_b{bs}"))
                 .outputMode("append").trigger(availableNow=True).start())
            rows, nb, durs, state = _drain(q, true_rows=n_docs * mult)
            report(f"neardup_b{bs}", rows, nb, durs, state,
                   time.time() - t0)

        shutil.rmtree(work, ignore_errors=True)
        print("\n| operator@batch | input rows | wall s | rows/s "
              "| batches | batch mean/max s | state rows |")
        print("|---|---|---|---|---|---|---|")
        for name, r in results.items():
            print(f"| {name} | {r['rows']} | {r['wall_s']} "
                  f"| {r['rows_per_s']:,.0f} | {r['micro_batches']} "
                  f"| {r['mean_batch_s']}/{r['max_batch_s']} "
                  f"| {r['state_rows']} |")
        print()
        print(json.dumps({"metric": "streaming_batch_sweep",
                          "results": results}))
        return 0

    if "--semdedup-kernel" in sys.argv:
        # r12 VERDICT #8: the default x1/x2 series reads 193/391
        # rows/s at fixture size — that is the per-micro-batch
        # dispatch floor (2 tiny files per trigger), not the gram
        # kernel's throughput.  This mode feeds batches large enough
        # that the kernel dominates: mult id-shifted copies split into
        # batch-rows-sized files, one file per trigger.  Reports
        # sustained rows/s and µs per arrival (wall and kernel-side
        # from the batch-duration mean).
        mult = 20
        if "--mult" in sys.argv:
            mult = int(sys.argv[sys.argv.index("--mult") + 1])
        bs = 10_000
        if "--batch-rows" in sys.argv:
            bs = int(sys.argv[sys.argv.index("--batch-rows") + 1])
        from enexory_parquet_export_spark.streaming.semdedup_stream import (
            quantize_codebook,
            semdedup_stream,
        )
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"))
        n_vec = emb.count()
        cb = quantize_codebook(emb, k_clusters=32)
        parts = [emb.select((F.col("vec_id") + m * 10_000_000)
                            .alias("vec_id"), "embedding")
                 for m in range(mult)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        src_b = row_split(big, "vec_id", bs,
                          os.path.join(work, f"sdk_b{bs}"))
        vschema = "vec_id bigint, embedding array<double>"
        t0 = time.time()
        q = (semdedup_stream(
                spark.readStream.schema(vschema)
                     .option("maxFilesPerTrigger", "1").parquet(src_b),
                cb, thresh_micro=995_000, cluster_cap=64)
             .writeStream.format("noop")
             .option("checkpointLocation",
                     os.path.join(work, "ckpt_sdk"))
             .outputMode("append").trigger(availableNow=True).start())
        rows, nb, durs, state = _drain(q, true_rows=n_vec * mult)
        wall = time.time() - t0
        report(f"semdedup_kernel_b{bs}_x{mult}", rows, nb, durs, state,
               wall)
        mean_d = sum(durs) / len(durs) if durs else 0.0
        out = {"metric": "semdedup_kernel", "batch_rows": bs,
               "mult": mult, "rows": rows, "wall_s": round(wall, 2),
               "rows_per_s": round(rows / wall, 0) if wall else 0,
               "us_per_arrival_wall": round(wall / rows * 1e6, 1)
               if rows else None,
               "us_per_arrival_kernel": round(mean_d / bs * 1e6, 1)
               if bs else None,
               "micro_batches": nb, "state_rows": state}
        shutil.rmtree(work, ignore_errors=True)
        print(json.dumps(out))
        return 0

    log_src = os.path.join(work, "changelog")
    per = (log_rows + n_files - 1) // n_files
    (log.withColumn("_f", F.expr(f"seq DIV {per}"))
        .repartition("_f").write.partitionBy("_f")
        .mode("overwrite").parquet(log_src))
    # flatten the partition dirs into plain append files
    flat = flatten_parts(log_src, os.path.join(work, "changelog_flat"))

    # ---- 1. CDC merge stream (2 files per trigger) ----
    mirror = os.path.join(work, "mirror")
    t0 = time.time()
    q = start_cdc_merge_stream(
        stream_changelog(spark, flat, max_files_per_trigger=2),
        mirror, os.path.join(work, "ckpt_cdc"))
    rows, nb, durs, state = _drain(q, true_rows=log_rows)
    report("cdc_merge_stream", rows, nb, durs, state, time.time() - t0)

    # ---- 2/3. documents-derived sources for neardup + packing ----
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text",
                    F.size(F.split("text", r"\s+")).cast("bigint")
                     .alias("n_tokens")))
    n_docs = docs.count()

    def doc_source(mult: int) -> str:
        """mult deterministic id-shifted copies, doc_id-ordered files —
        same text set, so the LSH bucket-key domain is IDENTICAL across
        mults (the state-bound series isolates stream LENGTH)."""
        path = os.path.join(work, f"docs_x{mult}")
        parts = [docs.select((F.col("doc_id") + m * 10_000_000)
                             .alias("doc_id"), "text", "n_tokens")
                 for m in range(mult)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        per_d = (n_docs * mult + n_files - 1) // n_files
        # rank by doc_id so file k holds the k-th id range (arrival order)
        (u.withColumn("_f", F.expr(f"(doc_id % 10000000) DIV {max(per_d // mult, 1)}"))
          .repartition("_f").write.partitionBy("_f")
          .mode("overwrite").parquet(path))
        return flatten_parts(path, path + "_flat")

    schema = "doc_id bigint, text string, n_tokens bigint"
    for mult in (1, 2, 3):
        src = doc_source(mult)
        t0 = time.time()
        q = (neardup_stream(
                spark.readStream.schema(schema)
                     .option("maxFilesPerTrigger", "2").parquet(src)
                     .select("doc_id", "text"))
             .writeStream.format("noop")
             .option("checkpointLocation",
                     os.path.join(work, f"ckpt_nd{mult}"))
             .outputMode("append").trigger(availableNow=True).start())
        rows, nb, durs, state = _drain(q, true_rows=n_docs * mult)
        report(f"neardup_stream_x{mult}", rows, nb, durs, state,
               time.time() - t0)

    src = doc_source(1)
    t0 = time.time()
    q = (pack_stream(spark.readStream.schema(schema)
                     .option("maxFilesPerTrigger", "2").parquet(src)
                     .select("doc_id", "n_tokens"))
         .writeStream.format("noop")
         .option("checkpointLocation", os.path.join(work, "ckpt_pack"))
         .outputMode("append").trigger(availableNow=True).start())
    rows, nb, durs, state = _drain(q, true_rows=n_docs)
    report("pack_stream", rows, nb, durs, state, time.time() - t0)

    # ---- 4. embeddings-derived source for streaming SemDeDup ----
    # state bound is k_clusters × cluster_cap members regardless of
    # stream length — the x1/x2 series shows saturation, like neardup
    from enexory_parquet_export_spark.streaming.semdedup_stream import (
        quantize_codebook,
        semdedup_stream,
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    n_vec = emb.count()
    cb = quantize_codebook(emb, k_clusters=32)

    def vec_source(mult: int) -> str:
        path = os.path.join(work, f"vecs_x{mult}")
        parts = [emb.select((F.col("vec_id") + m * 10_000_000)
                            .alias("vec_id"), "embedding")
                 for m in range(mult)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        per_v = (n_vec * mult + n_files - 1) // n_files
        (u.withColumn("_f", F.expr(
            f"(vec_id % 10000000) DIV {max(per_v // mult, 1)}"))
          .repartition("_f").write.partitionBy("_f")
          .mode("overwrite").parquet(path))
        return flatten_parts(path, path + "_flat")

    vschema = "vec_id bigint, embedding array<double>"
    for mult in (1, 2):
        src = vec_source(mult)
        t0 = time.time()
        q = (semdedup_stream(
                spark.readStream.schema(vschema)
                     .option("maxFilesPerTrigger", "2").parquet(src),
                cb, thresh_micro=995_000, cluster_cap=64)
             .writeStream.format("noop")
             .option("checkpointLocation",
                     os.path.join(work, f"ckpt_sd{mult}"))
             .outputMode("append").trigger(availableNow=True).start())
        rows, nb, durs, state = _drain(q, true_rows=n_vec * mult)
        report(f"semdedup_stream_x{mult}", rows, nb, durs, state,
               time.time() - t0)

    # ---- 5. stateless decontamination scrub (r9) ----
    # no state: the number that matters is sustained docs/s against a
    # bounded probe suite (corpus/100 here).  x3 stream length shows
    # throughput flat vs length — the stateless contract, empirically.
    from enexory_parquet_export_spark.streaming.decon_stream import (
        decon_stream,
    )
    probes = (docs.filter(F.col("doc_id") % 100 == 0)
              .select(F.col("doc_id").alias("probe_id"), "text"))
    for mult in (1, 3):
        src = doc_source(mult)
        t0 = time.time()
        q = (decon_stream(
                spark.readStream.schema(schema)
                     .option("maxFilesPerTrigger", "2").parquet(src)
                     .select("doc_id", "text"),
                probes, k=5)
             .writeStream.format("noop")
             .option("checkpointLocation",
                     os.path.join(work, f"ckpt_decon{mult}"))
             .outputMode("append").trigger(availableNow=True).start())
        rows, nb, durs, state = _drain(q, true_rows=n_docs * mult)
        report(f"decon_stream_x{mult}", rows, nb, durs, state,
               time.time() - t0)

    shutil.rmtree(work, ignore_errors=True)

    print("\n| operator | input rows | wall s | rows/s | batches "
          "| batch mean/max s | state rows |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['rows']} | {r['wall_s']} "
              f"| {r['rows_per_s']:,.0f} | {r['micro_batches']} "
              f"| {r['mean_batch_s']}/{r['max_batch_s']} "
              f"| {r['state_rows']} |")
    print()
    print(json.dumps({"metric": "streaming_bench", "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
