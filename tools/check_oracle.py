"""Local replica of the driver's correctness gate.

Runs every declared query on Spark AND its oracle SQL on DuckDB over
the same fixture dir, normalizes both results (columns sorted by name,
rows sorted, cells canonicalized), and diffs them.  Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    try:  # numpy scalars → python
        import numpy as np
        if isinstance(v, np.generic):
            return canon_cell(v.item())
    except ImportError:
        pass
    import datetime
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    return f"{type(v).__name__}:{v}"


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from enexory_parquet_export_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    failed, passed, weak = [], [], []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failed.append((name, f"SPARK ERROR: {exc}"))
            print(f"✗ {name}: spark error: {str(exc)[:500]}")
            continue
        if name not in oracles:
            weak.append(name)
            print(f"~ {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as exc:
            failed.append((name, f"ORACLE ERROR: {exc}"))
            print(f"✗ {name}: oracle error: {str(exc)[:500]}")
            continue
        if sorted(scols) != sorted(dcols):
            failed.append((name, f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}"))
            print(f"✗ {name}: column mismatch {sorted(scols)} vs {sorted(dcols)}")
            continue
        sn, dn = normalize(scols, srows), normalize(dcols, drows)
        if len(sn) != len(dn):
            failed.append((name, f"row count {len(sn)} vs {len(dn)}"))
            print(f"✗ {name}: row count {len(sn)} vs {len(dn)}")
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
        if diffs:
            failed.append((name, f"{len(diffs)} differing rows"))
            i, a, b = diffs[0]
            print(f"✗ {name}: {len(diffs)} diffs; first at sorted-row {i}:\n"
                  f"    spark={a}\n    duck ={b}")
            continue
        passed.append(name)
        print(f"✓ {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(weak)} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
