"""Benchmark harness — declared query set on Spark, one JSON line out.

Runs every declared query from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) inside ONE
SparkSession on ``local[$SPARK_GRAFT_CPUS]``, amortizing JVM startup
(BASELINE.md: startup must not be billed per-query).  Each query is
fully executed via a ``noop``-format write (materializes every row
through the physical plan, including sorts, without driver collection
— the honest engine-throughput measure at scale).

Output: one JSON line
``{"metric": "declared_set_wall", "value": <total sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": <sf>,
   "queries_steady": {...}, "value_steady": <total sec>}``

``value``/``queries`` bill each query's FIRST run — Python plan
construction plus execution including its one-off whole-stage-codegen
JIT (~0.3-1 s per unique plan), costs that exist once per plan
regardless of data volume.  ``value_steady``/``queries_steady`` bill a
complete SECOND run: the DataFrame is rebuilt from scratch and fully
re-executed (re-running the same DataFrame object would silently skip
its localCheckpointed prefix and under-report).  ``queries_build`` /
``value_build`` decompose the steady run's construction phase for the
analysis: for most queries it is pure py4j Column-building chatter
(median ~0.1 s — the prepared-statement cost a production pipeline
pays once), but for eager-checkpoint and iterative operators (x32,
x59/x82, q24, …) construction legitimately executes data jobs, which
is why build stays INSIDE the steady total instead of being excluded.
The headline metric remains the first-run total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = None
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    import __spark_entry__ as entrymod
    from enexory_parquet_export_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warmup: touch every table + JIT the whole pipeline once
    warm = sorted(qs)[0]
    qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # prime the Arrow Python worker pool (reused across queries via
    # spark.python.worker.reuse) so the first pandas-UDF query isn't
    # billed the fork/import cost — startup, like JVM startup, is
    # amortized per BASELINE.md's definition
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _warm(s):
        return s * 1.0

    (spark.range(32 * 32).repartition(32)
          .select(_warm(F.col("id").cast("double")))
          .write.format("noop").mode("overwrite").save())

    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    build: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)   # plan construction billed here
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record failures as negative sentinel
            print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0
            steady[name] = -1.0
            continue
        # steady: rebuild the plan FRESH (any localCheckpoint prefix
        # re-materializes inside the timed run); construction is timed
        # into its own informational column but stays in the total
        t0 = time.perf_counter()
        df2 = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        build[name] = round(t1 - t0, 3)
        df2.write.format("noop").mode("overwrite").save()
        steady[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    total_steady = round(sum(t for t in steady.values() if t >= 0), 3)
    total_build = round(sum(t for t in build.values() if t >= 0), 3)
    print(json.dumps({"metric": "declared_set_wall", "value": total,
                      "unit": "sec", "queries": timings, "sf": sf,
                      "queries_steady": steady,
                      "value_steady": total_steady,
                      "queries_build": build,
                      "value_build": total_build}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
