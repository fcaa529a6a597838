"""Per-stage attribution of the decon/containment superlinearity
(r11 VERDICT #2): per-doc cost grew 1.79 → 1.97 µs from 13.5M → 40.5M
docs while DuckDB went sublinear; the 1024-partition hypothesis was
measured-and-rejected in r11.  This harness runs ONE decontaminate leg
per fixture scale under a dedicated job group and reads the JVM
AppStatusStore afterwards, printing each stage's task count, executor
run/CPU time, input and shuffle volumes — the stage whose time grows
faster than the fixture's BYTE growth is the superlinear component.

Context (measured r12, recorded in BASELINE.md): the perturbed
fixture's ``~{copy}`` token suffix is 1 char longer for every 10× in
the copy index, so bytes/doc itself grows with N (545.6 → 560.4 B/doc
from 2700 → 8100 copies, +2.7%) — per-DOC normalization overstates the
superlinearity; per-BYTE cost is the honest metric and the residual
after byte normalization is what this tool attributes.

Usage::

    python tools/decon_profile.py [--copies-list 2700,8100] [--op decon]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decon_crossover import build_fixture, spark_decon, spark_cont  # noqa: E402


def _stage_seq(store, gw):
    """``AppStatusStore.stageList`` across Spark minor versions (r12
    ADVICE: hardcoding the private 5-arg 4.x arity makes both
    attribution tools fail opaquely on a minor upgrade).  Tries the
    known signatures newest-first; the caller handles total failure
    with a statusTracker fallback."""
    attempts = (
        # 4.x: stageList(statuses, details, withSummaries,
        #               unsortedQuantiles, taskStatus)
        lambda: store.stageList(gw.jvm.java.util.ArrayList(), False, False,
                                gw.new_array(gw.jvm.double, 0),
                                gw.jvm.java.util.ArrayList()),
        # 3.x-era: no details flag
        lambda: store.stageList(gw.jvm.java.util.ArrayList(), False,
                                gw.new_array(gw.jvm.double, 0),
                                gw.jvm.java.util.ArrayList()),
        lambda: store.stageList(gw.jvm.java.util.ArrayList()),
    )
    last: Exception | None = None
    for a in attempts:
        try:
            return a()
        except Exception as exc:
            last = exc
    raise last  # type: ignore[misc]


def stage_metrics(spark) -> list[dict]:
    """All completed stages from the AppStatusStore (py4j walk of the
    v1 StageData seq — local mode, so 'executor' = the local JVM).
    Falls back to the public ``sc.statusTracker()`` stage info (ids +
    task counts only, zero byte/time columns) when no known
    ``stageList`` arity matches — degraded attribution beats an opaque
    crash at attribution time."""
    sc = spark.sparkContext
    try:
        store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        seq = _stage_seq(store, gw)
    except Exception as exc:
        print(f"decon_profile: AppStatusStore.stageList arity mismatch "
              f"on Spark {spark.version} ({exc!r}); falling back to "
              f"statusTracker (no time/byte columns)", file=sys.stderr)
        tracker = sc.statusTracker()
        out = []
        for sid in tracker.getActiveStageIds():
            info = tracker.getStageInfo(sid)
            if info is None:
                continue
            out.append({"stage": sid, "name": str(info.name)[:80],
                        "tasks": info.numCompletedTasks, "run_ms": 0,
                        "cpu_ms": 0, "input_mb": 0.0, "sh_read_mb": 0.0,
                        "sh_write_mb": 0.0, "gc_ms": None})
        return out
    out = []
    it = seq.iterator()
    while it.hasNext():
        s = it.next()
        out.append({
            "stage": s.stageId(),
            "name": str(s.name())[:80],
            "tasks": s.numCompleteTasks(),
            "run_ms": s.executorRunTime(),
            "cpu_ms": s.executorCpuTime() // 1_000_000,
            "input_mb": round(s.inputBytes() / 1e6, 1),
            "sh_read_mb": round(s.shuffleReadBytes() / 1e6, 1),
            "sh_write_mb": round(s.shuffleWriteBytes() / 1e6, 1),
            "gc_ms": s.jvmGcTime() if hasattr(s, "jvmGcTime") else None,
        })
    return out


def main() -> int:
    copies_list = [2700, 8100]
    if "--copies-list" in sys.argv:
        copies_list = [int(c) for c in sys.argv[
            sys.argv.index("--copies-list") + 1].split(",")]
    op = "decon"
    if "--op" in sys.argv:
        op = sys.argv[sys.argv.index("--op") + 1]
    build = spark_decon if op == "decon" else spark_cont

    from enexory_parquet_export_spark.session import get_spark

    spark = get_spark("decon-profile")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for copies in copies_list:
        fdir = build_fixture(spark, copies)
        doc_path = os.path.join(fdir, "documents.parquet", "*.parquet")
        seen = {s["stage"] for s in stage_metrics(spark)}
        t0 = time.perf_counter()
        rows = build(spark, doc_path).collect()
        wall = round(time.perf_counter() - t0, 2)
        stages = [s for s in stage_metrics(spark) if s["stage"] not in seen]
        stages.sort(key=lambda s: -s["run_ms"])
        print(f"\n=== {op} copies={copies}: wall {wall}s, "
              f"{len(rows)} rows ===")
        for s in stages:
            print(f"  stage {s['stage']:>4} run {s['run_ms']/1000:7.1f}s "
                  f"cpu {s['cpu_ms']/1000:7.1f}s gc {s['gc_ms']} "
                  f"tasks {s['tasks']:>4} in {s['input_mb']:>9} MB "
                  f"shR {s['sh_read_mb']:>7} shW {s['sh_write_mb']:>7} "
                  f"| {s['name']}")
        results[copies] = {"wall": wall, "rows": len(rows),
                           "stages": stages}
    if len(copies_list) == 2:
        a, b = copies_list
        print(f"\nwall growth {results[b]['wall'] / results[a]['wall']:.2f}x "
              f"for {b / a:.2f}x copies")
    print(json.dumps({"metric": "decon_profile", "op": op,
                      "results": {str(k): v for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
