"""Stateful streaming MinHash-LSH near-dup detection — continuous
ingest dedup, the streaming twin of ``operators/dedup.py``'s batch
pair-finder (x30).

A training-data ingest never sees the whole corpus at once: each
arriving document must be checked against WHAT HAS ALREADY ARRIVED and
either flagged as a near-duplicate or admitted.  The batch operator's
shape (signature → band keys → equi-join) maps onto streaming state
directly: the band key becomes the state KEY, and the state VALUE is
the band bucket's admitted membership — so the stream performs the
same band-bucket collision test as the batch join, incrementally, one
micro-batch at a time.

Operator contract:

* input: an unbounded ``docs(doc_id, text)`` stream delivered in
  ``doc_id`` order across micro-batches (an append-only export log —
  the same source-order contract as ``streaming/packing.py``);
* output: CANDIDATE EVENTS ``(doc_id, nbr_id, est_micro)`` — one per
  (band, earlier-doc) collision with signature-estimated Jaccard ≥
  threshold; a pair agreeing on several bands emits once per band
  (identical payload), and doc-level verdicts are a stateless
  downstream ``dropDuplicates``/max — the same layering the batch
  path uses between candidate generation and verification;
* state: per band bucket, up to ``bucket_cap`` admitted
  ``(doc_id, signature)`` members — the SAME skew/recall trade as
  ``ann_lsh_topk``'s bucket_cap: a hot bucket stops admitting new
  comparison targets at the cap instead of growing O(stream) state.
  State is therefore bounded by ``#buckets × cap × k`` longs at any
  stream length, and hot-bucket comparison cost by ``cap`` per
  arrival.

All signature arithmetic is integer (portable md5-family MinHash
slots; match estimate as ``matches·10⁶ DIV k``), so the stream, the
batch twin, and any other engine agree bit-for-bit — the equivalence
test asserts set equality, not approximate equality.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..operators.dedup import minhash_signatures, row_signature
from ..session import materialize

#: output: one candidate event per (band, earlier admitted member) hit
NEARDUP_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("nbr_id", LongType(), False),
    StructField("est_micro", LongType(), False),
])

#: per band bucket: admitted member ids + their flattened signatures
_STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType()), True),
    StructField("sigs", ArrayType(LongType()), True),   # len = len(ids)·k
])


def _band_keys(sig, *, bands: int, rows_per_band: int):
    """Band-key array — identical construction to the batch
    ``lsh_candidate_pairs`` key (band index prefix, ':'-joined slots)."""
    return F.array(*[
        F.concat_ws(":", F.lit(b),
                    *[sig[b * rows_per_band + r].cast("string")
                      for r in range(rows_per_band)])
        for b in range(bands)
    ])


def _matcher(k: int, threshold_micro: int, bucket_cap: int):
    def match(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, flat = list(state.get[0]), list(state.get[1])
        else:
            ids, flat = [], []
        out = []
        # applyInPandasWithState delivers ONE group as an iterator of
        # Arrow chunks (split at arrow.maxRecordsPerBatch): admission
        # order must be GLOBAL doc_id order within the micro-batch, so
        # materialize the whole group and sort once — a per-chunk sort
        # deviates from the batch twin whenever a hot bucket spans
        # chunks (and can even emit nbr_id > doc_id events).  The
        # materialized size is one bucket's micro-batch volume, which
        # the source contract bounds per trigger.
        chunks = [p for p in pdfs if len(p)]
        rows = (pd.concat(chunks, ignore_index=True)
                  .sort_values("doc_id")
                if chunks else pd.DataFrame(columns=["doc_id", "sig"]))
        for row in rows.itertuples(index=False):
            sig = [int(s) for s in row.sig]
            for j, eid in enumerate(ids):
                m = sum(1 for t in range(k)
                        if flat[j * k + t] == sig[t])
                # integer compare: m/k ≥ t  ⇔  m·10⁶ ≥ t_micro·k
                if m * 1_000_000 >= threshold_micro * k:
                    out.append((int(row.doc_id), int(eid),
                                m * 1_000_000 // k))
            if len(ids) < bucket_cap:
                ids.append(int(row.doc_id))
                flat.extend(sig)
        state.update((ids, flat))
        yield pd.DataFrame(
            out, columns=[f.name for f in NEARDUP_SCHEMA.fields])

    return match


def neardup_stream(docs: DataFrame, *, k: int = 8, bands: int = 4,
                   threshold: float = 0.5,
                   bucket_cap: int = 64) -> DataFrame:
    """``docs(doc_id, text)`` stream → near-dup candidate events.

    Signature and band keys are pure per-row expressions
    (:func:`~..operators.dedup.row_signature` — no aggregation, so the
    stateful operator is the query's only stateful stage); each band
    row shuffles once on its band key to the bucket's state partition.
    """
    rpb = k // bands
    sig = row_signature(F.col("text"), k=k)
    banded = (docs.withColumn("sig", sig)
                  .filter(F.col("sig").isNotNull())
                  .withColumn("band_key",
                              F.explode(_band_keys(F.col("sig"), bands=bands,
                                                   rows_per_band=rpb)))
                  .select("band_key", "doc_id", "sig"))
    return (banded.groupBy("band_key")
            .applyInPandasWithState(
                _matcher(k, int(threshold * 1_000_000), bucket_cap),
                outputStructType=NEARDUP_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def neardup_batch(docs: DataFrame, *, k: int = 8, bands: int = 4,
                  threshold: float = 0.5,
                  bucket_cap: int = 64) -> DataFrame:
    """Batch twin — identical candidate events when the stream drains
    the same corpus in doc_id order: a doc collides with every earlier
    doc that was among the first ``bucket_cap`` arrivals of a shared
    band bucket (arrival order = doc_id order by the source contract).
    One window ranks bucket admissions; one equi-join finds
    collisions; DISTINCT collapses the per-band duplicates exactly as
    a set-compare of the stream's events does.
    """
    rpb = k // bands
    sigs = minhash_signatures(docs, k=k).transform(materialize, eager=True)
    banded = sigs.select(
        "doc_id", "sig",
        F.explode(_band_keys(F.col("sig"), bands=bands,
                             rows_per_band=rpb)).alias("band_key"))
    w = Window.partitionBy("band_key").orderBy("doc_id")
    members = (banded.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") <= bucket_cap)
               .select("band_key", F.col("doc_id").alias("nbr_id"),
                       F.col("sig").alias("nsig")))
    pairs = (banded.join(members, "band_key")
             .filter(F.col("nbr_id") < F.col("doc_id")))
    matches = sum((F.col("sig")[i] == F.col("nsig")[i]).cast("int")
                  for i in range(k))
    return (pairs.withColumn("_m", matches)
            .filter(F.col("_m") * 1_000_000 >= int(threshold * 1e6) * k)
            .select("doc_id", "nbr_id",
                    F.expr(f"CAST(_m * 1000000 AS BIGINT) DIV {k}")
                     .alias("est_micro"))
            .distinct())
