"""quota_select at 100M rows under a one-hot source (r9, VERDICT #6).

``operators/mixing.py`` documents the trade: exact mode's
``row_number`` window puts an entire source in ONE task (fine for
modest alphabets, a straggler when one source is most of the corpus),
threshold mode's percentile_approx sketch partial-aggregates map-side
and the cut is a map-side filter — skew-immune, approximate within
grid + sketch error.  This experiment measures both modes on a
100M-row corpus whose hottest source holds 95% of rows, records the
worst heavy stage's max/median task time from the UI REST API (the
straggler evidence), and checks the threshold mode's per-source quota
error bound.  Usage::

    python tools/quota_scale.py [--copies N] [--hot-pct P]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch")
UI_PORT = 4048


def stage_summaries() -> list[dict]:
    base = f"http://localhost:{UI_PORT}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{base}/applications/{app}/stages?status=complete"))
    out = []
    for st in stages:
        sid, att = st["stageId"], st["attemptId"]
        try:
            q = json.load(urllib.request.urlopen(
                f"{base}/applications/{app}/stages/{sid}/{att}/taskSummary"
                f"?quantiles=0.5,1.0"))
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        out.append({"stage": sid, "tasks": st["numCompleteTasks"],
                    "median_ms": med, "max_ms": mx})
    return out


def main() -> int:
    copies = 1000
    hot_pct = 95
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    if "--hot-pct" in sys.argv:
        hot_pct = int(sys.argv[sys.argv.index("--hot-pct") + 1])
    src = os.path.join(SCRATCH, f"fixture_events_x{copies}")
    if not os.path.isdir(src):
        print(f"missing fixture {src}", file=sys.stderr)
        return 1

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from enexory_parquet_export_spark.operators.mixing import quota_select
    from enexory_parquet_export_spark.session import configure

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", str(UI_PORT))
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    configure(spark)

    docs = (spark.read.parquet(os.path.join(src, "events.parquet"))
            .select(F.col("event_id").alias("doc_id"),
                    F.when(F.col("event_id") % 100 < hot_pct, "hot")
                     .otherwise(F.concat(F.lit("src"),
                                         (F.col("event_id") % 5)
                                         .cast("string")))
                     .alias("source")))
    quota = (docs.groupBy("source")
             .agg(F.count("*").cast("bigint").alias("n"))
             .withColumn("quota",
                         F.floor(F.col("n") / 2).cast("bigint")))
    quota.cache()
    n_rows = docs.count()
    qrows = {r["source"]: (r["n"], r["quota"]) for r in quota.collect()}
    print(f"corpus: {n_rows:,} rows, {len(qrows)} sources, "
          f"hot share {qrows['hot'][0] / n_rows:.2%}", flush=True)

    results = {}
    seen: set[int] = {s["stage"] for s in stage_summaries()}
    for mode in ("threshold", "exact"):
        t0 = time.perf_counter()
        quota_select(docs, quota, mode=mode) \
            .write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 1)
        stages = [s for s in stage_summaries() if s["stage"] not in seen]
        seen |= {s["stage"] for s in stages}
        heavy = [s for s in stages if s["median_ms"] >= 500]
        worst = max(heavy, key=lambda s: s["max_ms"] / max(s["median_ms"], 1),
                    default=None)
        w = worst or {"stage": "-", "tasks": "-", "median_ms": 0, "max_ms": 0}
        ratio = (w["max_ms"] / w["median_ms"]) if w["median_ms"] else 0.0
        results[mode] = {"wall_s": wall, "worst": worst}
        print(f"| {mode} | {wall} s | worst heavy stage {w['stage']} "
              f"({w['tasks']} tasks): max {w['max_ms']/1e3:.1f} s / "
              f"median {w['median_ms']/1e3:.1f} s = {ratio:.2f}× |",
              flush=True)

    # threshold-mode quota error per source (ppm of quota)
    sel = (quota_select(docs, quota, mode="threshold")
           .groupBy("source").agg(F.count("*").alias("got")).collect())
    errs = {}
    for r in sel:
        n, q = qrows[r["source"]]
        errs[r["source"]] = round((r["got"] - q) * 1e6 / max(q, 1))
    worst_ppm = max(abs(v) for v in errs.values())
    print(f"threshold quota error: worst {worst_ppm} ppm "
          f"({dict(sorted(errs.items()))})", flush=True)

    print(json.dumps({"metric": "quota_scale", "rows": n_rows,
                      "hot_pct": hot_pct, "worst_err_ppm": worst_ppm,
                      **{m: results[m] for m in results}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
