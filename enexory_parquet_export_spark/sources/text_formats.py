"""CSV / JSON-lines sources with explicit schemas and corrupt capture.

The reference ingests exactly one MySQL table, and its row validation
(O6, Parquet Export/db_extractor.py:78-149) aborts on the first
malformed row.  File-based ingest at 100 TB needs the distributed
version of that contract:

- **never infer schemas** — ``inferSchema`` is a full extra pass over
  the data before the real read; callers pass the schema;
- **malformed rows are data, not exceptions** — PERMISSIVE mode routes
  them to a ``_corrupt_record`` column, and :func:`split_corrupt`
  turns one read into (clean, quarantine) DataFrames so the pipeline's
  validation relation (q25) can report them; FAILFAST remains one
  option away for the reference's abort-on-first-violation behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(list(schema.fields)
                      + [StructField(CORRUPT_COL, StringType(), True)])


def read_source_csv(spark: SparkSession, path: str, schema: StructType, *,
                    header: bool = True, sep: str = ",",
                    mode: str = "PERMISSIVE") -> DataFrame:
    """Schema-enforced CSV read; malformed rows land in
    ``_corrupt_record`` instead of failing the job (PERMISSIVE) or
    abort the read (FAILFAST — the reference's O6 posture)."""
    return (spark.read.format("csv")
            .option("header", str(header).lower())
            .option("sep", sep)
            .option("mode", mode)
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .schema(_with_corrupt(schema))
            .load(path))


def read_source_jsonl(spark: SparkSession, path: str, schema: StructType, *,
                      mode: str = "PERMISSIVE") -> DataFrame:
    """Schema-enforced JSON-lines read, same corrupt-record contract."""
    return (spark.read.format("json")
            .option("mode", mode)
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .schema(_with_corrupt(schema))
            .load(path))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean drops the corrupt column; quarantine
    keeps the raw line plus whatever fields did parse.

    The quarantine projection deliberately references the typed
    columns too: Spark rejects a query that reads ONLY the corrupt
    column from a raw CSV/JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    documented alternative, caching the scan, is not an option at
    ingest scale."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    others = [c for c in df.columns if c != CORRUPT_COL]
    quarantine = (df.filter(F.col(CORRUPT_COL).isNotNull())
                    .select(F.col(CORRUPT_COL).alias("raw_line"), *others))
    return clean, quarantine
