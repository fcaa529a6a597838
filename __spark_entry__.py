"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship CDC merge (Q24) at sf0.001;
``queries()``/``oracle_sql()`` expose the declared inventory from
``enexory_parquet_export_spark.queries`` (+ extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from enexory_parquet_export_spark.session import configure  # noqa: E402
from enexory_parquet_export_spark import queries as _q  # noqa: E402
from enexory_parquet_export_spark import queries_ext as _qx  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q24 CDC merge) on /root/testdata/sf0.001."""
    configure(spark)
    return _q.SPARK_QUERIES["q24_cdc_merge"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(_q.SPARK_QUERIES)
    out.update(_qx.SPARK_QUERIES)

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)
        return run

    return {name: _wrap(fn) for name, fn in out.items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_q.ORACLE_SQL)
    out.update(_qx.ORACLE_SQL)
    return out
