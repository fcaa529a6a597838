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

from ..operators.dedup import minhash_signatures
from ..session import materialize

#: output: one candidate event per (band, earlier admitted member) hit
NEARDUP_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("nbr_id", LongType(), False),
    StructField("est_micro", LongType(), False),
])

#: one bucket's micro-batch rows are materialized in the state task
#: (cross-chunk global admission order requires it); the per-trigger
#: source contract is what bounds that buffer, so crossing this bound
#: logs a loud stderr warning (r5 ADVICE — visible contract violation
#: instead of a silent OOM).  Warn-only: correctness is unaffected.
GROUP_BUFFER_SANITY_ROWS = 250_000

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
        import numpy as np

        if state.exists:
            ids = list(state.get[0])
            flat = state.get[1]
        else:
            ids, flat = [], []
        # member signatures as a preallocated (cap × k) int64 matrix:
        # the per-arrival comparison is ONE vectorized equality against
        # the live slice instead of cap × k interpreted-Python ops
        # (measured ~8-10 ms/doc → sub-ms on hot buckets at cap=64)
        M = np.empty((bucket_cap, k), dtype=np.int64)
        count = len(ids)
        if count:
            M[:count] = np.asarray(flat, dtype=np.int64).reshape(count, k)
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
        n_buffered = sum(len(p) for p in chunks)
        if n_buffered > GROUP_BUFFER_SANITY_ROWS:
            # r5 ADVICE: memory here is bounded ONLY by the per-trigger
            # source contract (maxFilesPerTrigger etc.) — surface a
            # contract violation as a visible warning instead of a
            # silent executor OOM
            import sys
            print(f"neardup_stream: bucket micro-batch of {n_buffered} "
                  f"rows exceeds sanity bound {GROUP_BUFFER_SANITY_ROWS}"
                  f" — throttle the source (maxFilesPerTrigger)",
                  file=sys.stderr)
        rows = (pd.concat(chunks, ignore_index=True)
                  .sort_values("doc_id")
                if chunks else pd.DataFrame(columns=["doc_id", "sig"]))
        doc_ids = rows["doc_id"].to_numpy()
        sigs = (np.stack([np.asarray(s, dtype=np.int64)
                          for s in rows["sig"].to_numpy()])
                if len(rows) else np.empty((0, k), dtype=np.int64))
        for r in range(len(doc_ids)):
            sig = sigs[r]
            if count:
                m = (M[:count] == sig).sum(axis=1)
                # integer compare: m/k ≥ t  ⇔  m·10⁶ ≥ t_micro·k
                for j in np.nonzero(m * 1_000_000
                                    >= threshold_micro * k)[0]:
                    out.append((int(doc_ids[r]), int(ids[j]),
                                int(m[j]) * 1_000_000 // k))
            if count < bucket_cap:
                M[count] = sig
                ids.append(int(doc_ids[r]))
                count += 1
        state.update((ids, M[:count].ravel().tolist()))
        yield pd.DataFrame(
            out, columns=[f.name for f in NEARDUP_SCHEMA.fields])

    return match


def _signatures_arrow(k: int):
    """``mapInPandas`` signature kernel — the Arrow twin of
    :func:`~..operators.dedup.row_signature`, bit-identical by
    construction (same Java-``\\s`` tokenizer class, same 3-shingles,
    same top-60-bit-md5 base, same affine family mod the Mersenne
    prime) but ~10× cheaper on the ingest path: the expression form
    re-evaluates the interpreted md5+conv chain INSIDE each of the k
    array-lambda passes, while this kernel hashes each shingle once
    (hashlib, C speed) and broadcasts the k affine maps as one numpy
    matrix op.  Stateless map → legal before the stateful operator.
    Docs too short for one shingle are dropped, mirroring the
    expression path's NULL-signature filter.
    """
    import hashlib
    import re

    import numpy as np

    from ..functions.hashing import MERSENNE_P

    # Measured Spark semantics this twin must replicate exactly:
    # F.trim strips ONLY ASCII space (tab/newline survive), Java \s is
    # exactly [ \t\n\x0B\f\r], and F.split keeps leading/trailing
    # empty tokens ("\ta b" → ["", "a", "b"]) — Python re.split keeps
    # them too, so str.strip(" ") + re.split is bit-faithful
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    A = np.array([2 * i + 1 for i in range(k)], dtype=np.int64)[:, None]
    B = np.array([7919 * (i + 1) for i in range(k)], dtype=np.int64)[:, None]

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                toks = ws.split(str(text).strip(" "))
                if len(toks) < 3:
                    continue
                bases = np.fromiter(
                    (int(hashlib.md5(
                        " ".join(toks[j:j + 3]).encode()).hexdigest()[:15],
                        16) % MERSENNE_P
                     for j in range(len(toks) - 2)),
                    dtype=np.int64, count=len(toks) - 2)
                sig = ((A * bases + B) % MERSENNE_P).min(axis=1)
                ids.append(int(doc_id))
                sigs.append([int(v) for v in sig])
            # explicit dtypes: an all-filtered chunk must still emit
            # int64/object columns (empty float64 breaks the Arrow
            # list<int64> conversion)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "sig": pd.Series(sigs, dtype="object")})

    return gen


def neardup_stream(docs: DataFrame, *, k: int = 8, bands: int = 4,
                   threshold: float = 0.5,
                   bucket_cap: int = 64) -> DataFrame:
    """``docs(doc_id, text)`` stream → near-dup candidate events.

    Signatures come from the Arrow ``mapInPandas`` kernel
    (:func:`_signatures_arrow` — stateless, so the stateful operator
    is still the query's only stateful stage) and band keys stay pure
    expressions; each band row shuffles once on its band key to the
    bucket's state partition.
    """
    rpb = k // bands
    sigged = (docs.select("doc_id", "text")
                  .mapInPandas(_signatures_arrow(k),
                               "doc_id bigint, sig array<bigint>"))
    banded = (sigged.withColumn("band_key",
                                F.explode(_band_keys(F.col("sig"),
                                                     bands=bands,
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
