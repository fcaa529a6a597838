"""x32 variance collar (r11 VERDICT #7): 3.5–6.7 s across same-tree
sf0.1 readings is the largest single-query spread in the set.  This
harness runs x32 N times in one session with per-rep host controls
and per-rep stage-metric deltas (AppStatusStore), so the spread can be
attributed: one skewed/bimodal stage (its run_ms variance dominates),
GC (gc_ms tracks the slow reps), or plain host noise (controls inflate
with the slow reps).

Run from the REPO ROOT (Python workers resolve the package through
the driver's cwd in local mode)::

    python tools/x32_band.py [--reps 6] [--sf-dir DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from decon_profile import stage_metrics  # noqa: E402


def main() -> int:
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]

    import __spark_entry__ as entrymod
    from enexory_parquet_export_spark.session import get_spark

    spark = get_spark("x32-band")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    fn = qs["x32_ngram_jaccard_dup"]

    def control() -> float:
        t0 = time.perf_counter()
        spark.range(400_000_000).selectExpr("sum(id)").collect()
        return round(time.perf_counter() - t0, 3)

    print(f"controls: {control()}, {control()}", flush=True)
    walls, summaries = [], []
    for rep in range(reps):
        seen = {s["stage"] for s in stage_metrics(spark)}
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        stages = [s for s in stage_metrics(spark)
                  if s["stage"] not in seen and s["tasks"]]
        stages.sort(key=lambda s: -s["run_ms"])
        gc_total = sum(s["gc_ms"] or 0 for s in stages)
        run_total = sum(s["run_ms"] for s in stages)
        walls.append(wall)
        summaries.append(stages)
        top = ", ".join(f"s{s['stage']}={s['run_ms'] / 1000:.2f}s"
                        for s in stages[:5])
        print(f"rep{rep}: wall {wall}s run-total {run_total / 1000:.1f}s "
              f"gc {gc_total / 1000:.2f}s control {control()} | {top}",
              flush=True)
    print(f"\nband: {min(walls)}–{max(walls)} s "
          f"({max(walls) / min(walls):.2f}x) over {reps} reps")
    # per-rep top-stage table for attribution: stage ids are stable
    # within one session for an unchanged plan
    print(json.dumps({"metric": "x32_band", "walls": walls,
                      "stages": summaries}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
