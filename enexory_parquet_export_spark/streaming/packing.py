"""Stateful streaming sequence packing — the training-data assembly
twin of the batch packer (queries_ext x77 + shard router x79).

A pretraining exporter consumes documents as they are produced and
must assign each one a (shard, bin, offset) slot in fixed-capacity
token bins WITHOUT re-scanning the corpus.  That is a per-shard
running token count: documents hash-route to shards (same portable
md5-60bit router as x79, so batch and stream agree on placement), and
each shard's packer keeps ONE number of state — the next free global
token position in that shard.  ``applyInPandasWithState`` with a
per-shard state row is exactly that operator.

Ordering contract: within a shard, documents must be packed in
``doc_id`` order.  Each micro-batch is sorted per shard before
packing, and cross-batch order holds when the source delivers batches
in ``doc_id`` order (an append-only export log does; the equivalence
test drives one file per doc_id range).  This is the same
batch-boundary contract as the reference's sequential binlog apply —
the stream's guarantee comes from the source's append order plus
checkpointed offsets.

Scale posture: state is one BIGINT per shard (thousands of shards at
most); each micro-batch shuffles only its own rows, once, on the
shard key.  The mirror of this operator in batch is a two-level
prefix sum (x77) — identical outputs when the stream drains the same
corpus in order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from ..functions.hashing import portable_hash60

#: output: one packed-slot assignment per document
PACK_SCHEMA = StructType([
    StructField("shard", LongType(), False),
    StructField("doc_id", LongType(), False),
    StructField("n_tokens", LongType(), False),
    StructField("bin_first", LongType(), False),
    StructField("bin_offset", LongType(), False),
    StructField("bins_spanned", LongType(), False),
])

_STATE_SCHEMA = StructType([StructField("next_start", LongType(), True)])


def with_shard(docs: DataFrame, *, n_shards: int = 16,
               id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic shard key (the x79 router)."""
    return docs.withColumn(
        "shard",
        (portable_hash60(F.concat(F.lit("doc:"),
                                  F.col(id_col).cast("string")))
         % n_shards).cast("bigint"))


def _packer(capacity: int):
    def pack(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (shard,) = key
        start = state.get[0] if state.exists else 0
        out = []
        # one group arrives as an iterator of Arrow chunks: packing
        # order must be GLOBAL doc_id order within the micro-batch, so
        # concat + sort once (a per-chunk sort deviates whenever a
        # shard's micro-batch volume exceeds arrow.maxRecordsPerBatch —
        # the same defect class as neardup_stream's matcher)
        chunks = [p for p in pdfs if len(p)]
        rows = (pd.concat(chunks, ignore_index=True).sort_values("doc_id")
                if chunks else pd.DataFrame(columns=["doc_id", "n_tokens"]))
        for row in rows.itertuples(index=False):
            n = int(row.n_tokens)
            first, off = divmod(start, capacity)
            last = start + n - 1
            out.append((int(shard), int(row.doc_id), n, first, off,
                        last // capacity - first + 1))
            start += n
        state.update((start,))
        yield pd.DataFrame(out, columns=[f.name for f in PACK_SCHEMA.fields])

    return pack


def pack_stream(docs: DataFrame, *, capacity: int = 256,
                n_shards: int = 16) -> DataFrame:
    """Streaming packer: ``docs(doc_id, n_tokens)`` (unbounded) →
    per-document slot assignments, one BIGINT of state per shard."""
    return (with_shard(docs, n_shards=n_shards)
            .groupBy("shard")
            .applyInPandasWithState(
                _packer(capacity),
                outputStructType=PACK_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def pack_batch(docs: DataFrame, *, capacity: int = 256,
               n_shards: int = 16) -> DataFrame:
    """Batch twin: identical assignments via a per-shard prefix-sum
    window — the equivalence oracle for the stateful stream."""
    w = (Window.partitionBy("shard").orderBy("doc_id")
               .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    c = with_shard(docs, n_shards=n_shards).withColumn("_start", start)
    cap = F.lit(capacity)
    return c.select(
        "shard", "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr(f"_start DIV {capacity}").alias("bin_first"),
        (F.col("_start") % cap).cast("bigint").alias("bin_offset"),
        (F.expr(f"(_start + n_tokens - 1) DIV {capacity}")
         - F.expr(f"_start DIV {capacity}") + F.lit(1)).cast("bigint")
        .alias("bins_spanned"))
