"""Stateful change detection — the replication watcher's anomaly diff
(Email Node Status/watcher.py:234-266) as a custom stateful streaming
operator.

The reference polls per-node status every 5 s and compares each poll
to the previous one, alerting on: online flip, lag crossing the 600 s
threshold (watcher_config.py:24), IO/SQL thread state change, new
error text.  That per-key compare-to-previous is exactly
``applyInPandasWithState``: state = last seen status per node; each
micro-batch emits only the transitions.

The batch twin (same semantics over a bounded poll log) is
``detect_changes_batch`` — a ``lag()`` window, used by the declared
query q21/q20 family and by the equivalence test in
tests/test_streaming.py.

Scale posture: state is one tiny row per key (node), partitioned by
key across executors — a million monitored keys is still nothing; the
GroupState timeout evicts keys that stop reporting.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LAG_THRESHOLD_SECONDS = 600.0  # watcher_config.py:24

#: input: one poll row per (node, poll_seq)
POLL_SCHEMA = StructType([
    StructField("node", StringType(), False),
    StructField("poll_seq", LongType(), False),
    StructField("is_online", BooleanType(), False),
    StructField("lag_seconds", DoubleType(), True),
    StructField("last_error", StringType(), True),
])

#: output: one row per detected transition
CHANGE_SCHEMA = StructType([
    StructField("node", StringType(), False),
    StructField("poll_seq", LongType(), False),
    StructField("change_kind", StringType(), False),
    StructField("detail", StringType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("is_online", BooleanType(), True),
    StructField("lag_alert", BooleanType(), True),
    StructField("last_error", StringType(), True),
])


def _diff_one(prev: dict[str, Any], row: dict[str, Any]) -> list[tuple]:
    """Pure transition rules (watcher.py:234-266), shared by the
    streaming state handler and unit tests."""
    out = []
    node, seq = row["node"], row["poll_seq"]
    lag = row["lag_seconds"]
    lag_alert = (lag is not None and not pd.isna(lag)
                 and lag >= LAG_THRESHOLD_SECONDS)
    if prev.get("is_online") is not None and row["is_online"] != prev["is_online"]:
        # lower-case bool rendering matches Spark's cast-to-string
        out.append((node, seq, "online_flip",
                    f"{str(prev['is_online']).lower()}->"
                    f"{str(row['is_online']).lower()}"))
    if bool(prev.get("lag_alert")) != lag_alert:
        # NaN and SQL NULL both mean "no measurement" and BOTH render
        # as 'null': Arrow hands the stream a float64 frame where a
        # NULL lag is indistinguishable from NaN, so the batch twin
        # collapses them identically (ADVICE r2)
        lag_txt = "null" if (lag is None or pd.isna(lag)) else str(lag)
        out.append((node, seq, "lag_threshold", f"lag={lag_txt}"))
    err = row["last_error"]
    if err and err != prev.get("last_error"):
        out.append((node, seq, "new_error", err))
    return out


def _apply_state(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        prev_online, prev_alert, prev_err = state.get
    else:
        prev_online, prev_alert, prev_err = None, None, None
    prev = {"is_online": prev_online, "lag_alert": prev_alert,
            "last_error": prev_err}
    changes: list[tuple] = []
    # concat + sort ONCE: a node's micro-batch rows can span multiple
    # Arrow chunks, and transition detection must replay them in global
    # poll_seq order (same defect class as neardup_stream's matcher)
    chunks = [p for p in pdfs if len(p)]
    rows = (pd.concat(chunks, ignore_index=True).sort_values("poll_seq")
            if chunks else pd.DataFrame())
    for row in rows.to_dict("records"):
        changes.extend(_diff_one(prev, row))
        lag = row["lag_seconds"]
        prev = {
            "is_online": bool(row["is_online"]),
            "lag_alert": bool(lag is not None
                              and not pd.isna(lag)
                              and lag >= LAG_THRESHOLD_SECONDS),
            # '' normalizes to "no error" and carries the previous
            # error forward — the batch twin mirrors this with
            # nullif(last_error, '') before last(ignorenulls)
            "last_error": row["last_error"] or prev["last_error"],
        }
    state.update((prev["is_online"], prev["lag_alert"], prev["last_error"]))
    yield pd.DataFrame(changes,
                       columns=["node", "poll_seq", "change_kind", "detail"])


def detect_changes_stream(polls: DataFrame) -> DataFrame:
    """Streaming per-node transition detector (state = last status)."""
    return (polls.groupBy("node")
            .applyInPandasWithState(
                _apply_state,
                outputStructType=CHANGE_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def detect_changes_batch(polls: DataFrame) -> DataFrame:
    """Batch twin: identical transitions via lag() over the poll log —
    the equivalence oracle for the stateful stream."""
    w = Window.partitionBy("node").orderBy("poll_seq")
    lag_alert = (F.col("lag_seconds").isNotNull()
                 & ~F.isnan("lag_seconds")
                 & (F.col("lag_seconds") >= LAG_THRESHOLD_SECONDS))
    cur = (polls
           .withColumn("_alert", lag_alert)
           .withColumn("_prev_online", F.lag("is_online").over(w))
           .withColumn("_prev_alert", F.lag("_alert").over(w))
           # '' is "no error": normalize to null so last(ignorenulls)
           # carries the previous real error, matching the stream's
           # `row['last_error'] or prev` state fold
           .withColumn("_prev_err",
                       F.last(F.nullif("last_error", F.lit("")),
                              ignorenulls=True)
                       .over(w.rowsBetween(Window.unboundedPreceding, -1))))
    online_flip = (F.col("_prev_online").isNotNull()
                   & (F.col("is_online") != F.col("_prev_online")))
    alert_flip = (F.coalesce(F.col("_prev_alert"), F.lit(False))
                  != F.col("_alert"))
    new_err = (F.col("last_error").isNotNull() & (F.col("last_error") != "")
               & ~F.col("last_error").eqNullSafe(F.col("_prev_err")))
    kinds = F.array_compact(F.array(
        F.when(online_flip, F.struct(
            F.lit("online_flip").alias("change_kind"),
            F.concat(F.col("_prev_online").cast("string"), F.lit("->"),
                     F.col("is_online").cast("string")).alias("detail"))),
        F.when(alert_flip, F.struct(
            F.lit("lag_threshold").alias("change_kind"),
            # NaN collapses to 'null' exactly like SQL NULL — the
            # stream side cannot tell them apart post-Arrow
            F.concat(F.lit("lag="),
                     F.coalesce(F.nanvl("lag_seconds", F.lit(None))
                                 .cast("string"),
                                F.lit("null"))).alias("detail"))),
        F.when(new_err, F.struct(
            F.lit("new_error").alias("change_kind"),
            F.col("last_error").alias("detail"))),
    ))
    return (cur.select("node", "poll_seq", F.explode(kinds).alias("c"))
               .select("node", "poll_seq", "c.change_kind", "c.detail"))
