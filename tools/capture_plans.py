"""Capture .explain('formatted') for declared queries into plans/<tag>/.

Usage::

    python tools/capture_plans.py <tag> <suffix> [sf_dir] [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` (e.g. tag=r13,
suffix=before).  Uses the same full-lineage mode as explain_audit
(unpinned materializations disabled) so the plan shows the complete
query shape, not the post-checkpoint suffix.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_NO_MATERIALIZE", "1")


def main() -> int:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    names = rest[1:]

    import __spark_entry__ as entrymod
    from enexory_parquet_export_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if names:
        qs = {k: v for k, v in qs.items()
              if k in names or k.split("_")[0] in names}

    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in sorted(qs):
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
