"""As-of join — latest event at-or-before each probe time.

The reference's resume-point scan (O5, Parquet Export/
db_extractor.py:51-76) is exactly "as-of the newest file, what is the
latest valid timestamp".  Generalized here as a distributed as-of join.

Implementation: the union-sort trick, not a join.  Probes and events
are unioned, sorted within each key by (time, kind, seq), and the last
non-null event payload is carried forward to each probe row with
``last(ignorenulls) over rowsBetween(unboundedPreceding, current)``.
One shuffle on the key, no pair blow-up — at 100 TB this behaves like
a single sort-merge pass, versus O(|probes|·|events-per-key|) for the
naive join+filter formulation.

Ties: an event at exactly the probe time is *included* (kind sorts
events before probes at equal times); among equal event times the
highest ``seq`` wins — deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probes: DataFrame, events: DataFrame, *, key: str,
              probe_time: str, event_time: str, seq: str,
              payload_cols: Sequence[str]) -> DataFrame:
    """For each probe row, attach the latest event (by time, then
    ``seq``) of the same ``key`` with event_time <= probe_time.

    Probes with no matching event keep null payloads (left semantics).
    Returns probe columns + payload_cols.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    ev = events.select(
        F.col(key),
        F.col(event_time).alias("_t"),
        F.lit(0).alias("_kind"),
        F.col(seq).alias("_seq"),
        payload.alias("_payload"),
        *[F.lit(None).alias(f"_p_{i}") for i in range(0)],
    ).withColumn("_probe", F.lit(None).cast(
        probes.schema[probe_time].dataType))
    pr = probes.select(
        F.col(key),
        F.col(probe_time).alias("_t"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast("long").alias("_seq"),
        F.lit(None).cast(ev.schema["_payload"].dataType).alias("_payload"),
        F.col(probe_time).alias("_probe"),
    )
    unioned = ev.unionByName(pr)
    w = (Window.partitionBy(key)
               .orderBy(F.col("_t").asc(), F.col("_kind").asc(),
                        F.col("_seq").asc_nulls_first())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "_last", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_kind") == 1).select(
        F.col(key),
        F.col("_probe").alias(probe_time),
        *[F.col(f"_last.{c}").alias(c) for c in payload_cols],
    )
    return out
