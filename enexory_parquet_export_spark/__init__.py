"""enexory_parquet_export_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference toolkit ``barshanhassan/enexory-parquet-export`` (a
MySQL→Parquet day-partitioned mirror with a binlog CDC merge path; see
SURVEY.md).  Everything here is declarative DataFrame/SQL so Catalyst
owns the physical plan; Python/pandas UDFs are an escape hatch only.

Layout
------
- ``session``     SparkSession builder + runtime conf pinning
- ``sources``     table loaders (parquet/JDBC), day-partitioned writer
- ``functions``   scalar function batteries (datetime, validation,
                  text, vectors, portable hashing)
- ``operators``   relational operators: CDC merge (flagship), as-of
                  join, dedup family, similarity search, set ops,
                  audit/reconciliation, multimodal plumbing
- ``plans``       plan-inspection helpers (pushdown assertions)
- ``streaming``   Structured Streaming variants (CDC foreachBatch,
                  stateful change detection)
- ``queries``     the declared query inventory (SURVEY.md §2.2) with
                  DuckDB oracle SQL for the correctness gate
"""

__version__ = "0.1.0"
