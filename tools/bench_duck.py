"""Time every oracle SQL query on DuckDB over the same fixture dir.

The DuckDB half of the BASELINE.md measured table: one connection,
one warmup pass of the first query, then each query timed
(fetchall — DuckDB's materialization analog of the Spark side's
noop write).  Output: one JSON line {"queries": {name: sec}}.

Usage:  python tools/bench_duck.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entrymod
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    con.execute("PRAGMA threads=%d" % os.cpu_count())

    names = sorted(oracles)
    con.execute(oracles[names[0]]).fetchall()  # warmup
    out = {}
    for name in names:
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        out[name] = round(time.time() - t0, 3)
    print(json.dumps({"metric": "duckdb_oracle_wall",
                      "value": round(sum(out.values()), 3),
                      "unit": "sec", "queries": out, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
