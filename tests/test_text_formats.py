"""CSV/JSON-lines sources: schema enforcement + corrupt quarantine."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from enexory_parquet_export_spark.sources.text_formats import (
    CORRUPT_COL,
    read_source_csv,
    read_source_jsonl,
    split_corrupt,
)

SCHEMA = StructType([
    StructField("id", LongType(), True),
    StructField("date_time", StringType(), True),
    StructField("value", DoubleType(), True),
])


def test_csv_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,date_time,value\n"
                 "1,2024-01-05 10:00:00,3.5\n"
                 "not-a-number,2024-01-05 11:00:00,oops\n"
                 "2,2024-01-05 12:00:00,\n")
    df = read_source_csv(spark, str(p), SCHEMA)
    clean, quarantine = split_corrupt(df)
    rows = {r["id"]: (r["date_time"], r["value"]) for r in clean.collect()}
    assert rows == {1: ("2024-01-05 10:00:00", 3.5),
                    2: ("2024-01-05 12:00:00", None)}  # empty → null, valid
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert bad == ["not-a-number,2024-01-05 11:00:00,oops"]
    assert CORRUPT_COL not in clean.columns


def test_csv_failfast_aborts(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,date_time,value\nxxx,yyy,zzz\n")
    with pytest.raises(Exception):
        read_source_csv(spark, str(p), SCHEMA, mode="FAILFAST").collect()


def test_jsonl_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "date_time": "2024-01-05 10:00:00", "value": 3.5}\n'
                 'this is not json\n'
                 '{"id": 2, "value": null}\n')
    clean, quarantine = split_corrupt(
        read_source_jsonl(spark, str(p), SCHEMA))
    rows = {r["id"]: (r["date_time"], r["value"]) for r in clean.collect()}
    assert rows == {1: ("2024-01-05 10:00:00", 3.5), 2: (None, None)}
    assert [r["raw_line"] for r in quarantine.collect()] \
        == ["this is not json"]
