"""Per-query optimization profile: construction vs execution split.

For each declared query, measures what bench.py's steady number is
made of:

- ``build``  — wall time of plan construction (``qs[name](spark, dir)``),
  which for stable_sort/materialize call sites includes Catalyst
  planning forced by ``Dataset.localCheckpoint`` and any driver-side
  training jobs (collects, loops);
- ``run``    — wall time of the noop-sink action on the built plan;
- ``jobs``   — number of Spark jobs the run dispatched (AQE stage
  waves + sampling jobs + broadcast jobs): each wave pays the
  driver's scheduling floor, so this is the dispatch-overhead proxy;
- ``reps``   — repeated build+run samples (median reported) so one
  GC pause does not masquerade as a regression.

Usage::

    python tools/opt_profile.py [sf_dir] [query ...] [--reps N]

Prints one line per query sorted by median total, plus a JSON tail.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]

    import __spark_entry__ as entrymod
    from enexory_parquet_export_spark.session import get_spark

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    qs = entrymod.queries()
    if names:
        sel = {}
        for n in names:
            hits = [k for k in qs if k == n or k.split("_")[0] == n]
            for h in hits:
                sel[h] = qs[h]
        qs = sel

    # warm the session: one query + the Arrow worker pool
    first = sorted(qs)[0]
    qs[first](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for name in sorted(qs):
        samples = []
        for rep in range(reps):
            g = f"prof-{name}-{rep}"
            sc.setJobGroup(g + "-build", name)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            build_jobs = len(tracker.getJobIdsForGroup(g + "-build"))
            sc.setJobGroup(g + "-run", name)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            run_jobs = len(tracker.getJobIdsForGroup(g + "-run"))
            samples.append((t1 - t0, t2 - t1, build_jobs, run_jobs))
            del df
            gc.collect()
        b = statistics.median(s[0] for s in samples)
        r = statistics.median(s[1] for s in samples)
        out[name] = {
            "build": round(b, 3), "run": round(r, 3),
            "total": round(b + r, 3),
            "build_jobs": samples[-1][2], "run_jobs": samples[-1][3],
            "all": [(round(s[0], 3), round(s[1], 3)) for s in samples],
        }

    width = max(len(n) for n in out)
    print(f"{'query':{width}s} {'build':>7s} {'run':>7s} {'total':>7s} "
          f"{'bjobs':>5s} {'rjobs':>5s}")
    for name, d in sorted(out.items(), key=lambda kv: -kv[1]["total"]):
        print(f"{name:{width}s} {d['build']:7.3f} {d['run']:7.3f} "
              f"{d['total']:7.3f} {d['build_jobs']:5d} {d['run_jobs']:5d}")
    tot_b = sum(d["build"] for d in out.values())
    tot_r = sum(d["run"] for d in out.values())
    print(f"{'TOTAL':{width}s} {tot_b:7.2f} {tot_r:7.2f} "
          f"{tot_b + tot_r:7.2f}")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "OPT_PROFILE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
