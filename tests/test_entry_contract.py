"""Driver-contract tests for __spark_entry__ and the writer layer."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def test_entry_runs_and_has_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"day", "id", "date_time", "value", "ts"}


def test_every_query_has_oracle_or_is_flagged(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 42
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle entries without queries: {missing}"
    # every declared query has an oracle unless it is on the explicit
    # rows-only allowlist (genuinely non-cross-engine-comparable output;
    # each entry must document its alternative correctness check)
    ROWS_ONLY_OK = {
        # HLL++ registers are engine-private; 3σ error bound vs exact
        # counts is pytest'd (test_functions.test_approx_distinct_...)
        "x53_approx_distinct",
        # quantile-sketch internals are engine-private; rank-error
        # bound vs exact order statistics is pytest'd
        # (test_functions.test_approx_percentile_error_bound)
        "x74_approx_percentiles",
    }
    weak = set(qs) - set(oracles) - ROWS_ONLY_OK
    assert not weak, f"queries without oracle SQL: {weak}"


def test_queries_return_lazy_dataframes(spark, sf_dir):
    # spot-check a fast pair: callable → DataFrame with named columns
    qs = entrymod.queries()
    df = qs["q01_scan_project"](spark, sf_dir)
    assert df.columns  # analysis succeeded without execution


def test_day_partitioned_roundtrip(spark, tmp_path):
    from enexory_parquet_export_spark.sources.writer import (
        list_days,
        read_day_partitioned,
        remove_empty_days,
        write_day_partitioned,
    )

    df = spark.createDataFrame(
        [("2024-01-01", 1, "2024-01-01 00:00:01", 1.0, 100),
         ("2024-01-02", 2, "2024-01-02 00:00:02", None, 200)],
        "day string, pk bigint, date_time string, value double, ts_epoch bigint")
    path = str(tmp_path / "mirror")
    write_day_partitioned(df, path)
    assert sorted(list_days(spark, path)) == ["2024-01-01", "2024-01-02"]

    back = read_day_partitioned(spark, path)
    assert back.count() == 2
    # dynamic partition overwrite: rewriting one day leaves the other intact
    upd = df.filter(F.col("day") == "2024-01-01").withColumn("value", F.lit(9.0))
    write_day_partitioned(upd, path)
    back2 = read_day_partitioned(spark, path)
    assert back2.count() == 2
    assert back2.filter(F.col("day") == "2024-01-01").collect()[0]["value"] == 9.0


def test_day_partitioned_orc_roundtrip(spark, tmp_path):
    """Same partition contract over the ORC sink: dynamic per-day
    overwrite, partition listing, and pruning-compatible layout."""
    from enexory_parquet_export_spark.sources.writer import (
        list_days,
        read_day_partitioned,
        write_day_partitioned,
    )

    df = spark.createDataFrame(
        [("2024-01-01", 1, "2024-01-01 00:00:01", 1.0, 100),
         ("2024-01-02", 2, "2024-01-02 00:00:02", None, 200)],
        "day string, pk bigint, date_time string, value double, ts_epoch bigint")
    path = str(tmp_path / "mirror_orc")
    write_day_partitioned(df, path, file_format="orc")
    assert sorted(list_days(spark, path)) == ["2024-01-01", "2024-01-02"]

    upd = df.filter(F.col("day") == "2024-01-01").withColumn("value", F.lit(9.0))
    write_day_partitioned(upd, path, file_format="orc")
    back = read_day_partitioned(spark, path, file_format="orc")
    assert back.count() == 2
    assert back.filter(F.col("day") == "2024-01-01").collect()[0]["value"] == 9.0


def test_driver_window_covers_contract_core():
    """The driver's correctness check hashes only the FIRST 50 entries
    of queries() in iteration order (round-2 verdict).  The window must
    contain every reference-anchored op (x39–x43) and the core
    LLM-pipeline battery — not whatever decorator order happens to be."""
    first50 = list(entrymod.queries())[:50]
    window = set(first50)
    must = {f"q{i:02d}" for i in range(1, 30)}
    must |= {f"x{i}" for i in range(30, 44)}
    prefixes = {n.split("_")[0] for n in window}
    missing = must - prefixes
    assert not missing, f"driver window misses contract core: {sorted(missing)}"
    # rows-only sketches must NOT waste window slots
    assert "x53_approx_distinct" not in window
    assert "x74_approx_percentiles" not in window


def test_typed_divergence_detector_catches_uncast_window_sum():
    """tools/check_oracle.py must fail on oracle SQL whose DuckDB type
    diverges from Spark's even when every value is equal — the class
    that kept q21 driver-red for two rounds (HUGEINT vs BIGINT)."""
    import duckdb
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from check_oracle import type_mismatches
    from pyspark.sql.types import LongType, StructField, StructType

    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT * FROM range(10) r(v)")
    schema = StructType([StructField("s", LongType())])
    uncast = "SELECT sum(v) OVER () AS s FROM t"       # DuckDB → HUGEINT
    cast = "SELECT CAST(sum(v) OVER () AS BIGINT) AS s FROM t"
    assert type_mismatches(schema, con, uncast), \
        "un-cast window sum (HUGEINT) must be flagged"
    assert not type_mismatches(schema, con, cast)
