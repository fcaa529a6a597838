"""Extension query inventory — training-data-pipeline operators.

Dedup family (MinHash/SimHash/n-gram Jaccard/embedding near-dup),
text analysis (language-ID, quality score, token counting,
fingerprinting), ANN, multimodal plumbing.  Registered separately so
the core relational battery stays readable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def declared(name: str, oracle: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco
