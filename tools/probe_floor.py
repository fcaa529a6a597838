"""Per-query dispatch-floor probe: how much of a small declared
query's steady time is AQE re-planning vs raw job dispatch.

Runs a handful of sub-second declared queries N times each with AQE on
and off (runtime-settable, flipped between executions in ONE session),
plus a bare ``spark.range`` noop write as the absolute job floor.
Prints per-query medians.  Usage::

    python tools/probe_floor.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = ["q01_scan_project", "q08_agg_max_min", "q13_join_inner",
         "q20_window_lag_changes", "q22_topk", "x47_json_extract",
         "x50_window_rollup", "x34_lang_id"]
REPS = 5


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entrymod
    from enexory_parquet_export_spark.session import get_spark

    spark = get_spark("floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def floor_job():
        t0 = time.time()
        spark.range(0, 1000).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm everything once
    for name in SMALL:
        run(name)
    floor_job()

    print(f"{'query':28s} {'aqe_on':>8s} {'aqe_off':>8s}")
    for name in SMALL:
        med = {}
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            med[aqe] = statistics.median(run(name) for _ in range(REPS))
        print(f"{name:28s} {med['true']:8.3f} {med['false']:8.3f}")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    fl = statistics.median(floor_job() for _ in range(REPS))
    print(f"{'<range-noop job floor>':28s} {fl:8.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
