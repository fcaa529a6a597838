"""Stateful streaming SemDeDup — continuous-ingest semantic dedup,
the streaming twin of ``operators/similarity.py:semantic_dedup`` (x97)
the way ``neardup_stream`` twins the x30 MinHash-LSH batch operator.

A training-data ingest admits embeddings one micro-batch at a time:
each arriving vector must be scored against what has ALREADY been
admitted to its semantic neighborhood, not against the whole corpus.
SemDeDup's structure maps onto streaming state directly: the coarse
cluster id becomes the state KEY (the codebook is trained offline —
exactly how the paper runs, clustering is never incremental), and the
state VALUE is the cluster's admitted membership up to
``cluster_cap`` — so the stream performs the same within-cluster
cosine test as the batch gram kernel, incrementally.

Operator contract (mirrors ``neardup_stream``):

* input: an unbounded ``vecs(vec_id, embedding array<float>)`` stream
  delivered in ``vec_id`` order across micro-batches (append-only
  export log — the packing/neardup source-order contract);
* codebook: a PRE-TRAINED list of quantized centroid vectors (the
  deterministic first-K-by-vec_id x44/x94 coarse-quantizer idiom, or
  any offline k-means output) — broadcast into the assignment kernel,
  never recomputed per batch;
* output: CANDIDATE EVENTS ``(vec_id, nbr_id, cos_micro)`` — one per
  (arrival, earlier admitted member) with micro-cosine ≥
  ``thresh_micro``; doc-level keep/drop verdicts are a stateless
  downstream max, the same layering as the batch path;
* state: per cluster, up to ``cluster_cap`` admitted
  ``(vec_id, qv, nv)`` members — bounded by
  ``k_clusters × cluster_cap × (dim + 2)`` longs at ANY stream
  length, and per-arrival cost by one ``cap × dim`` BLAS matvec.
  A hot cluster stops admitting comparison targets at the cap
  (the ``ann_lsh_topk`` bucket_cap recall trade); under the batch
  operator's K ~ √N scale contract caps are rarely hit.

All scoring arithmetic is integer-exact (quantized BIGINT components,
every product < 2⁵³) with the SAME IEEE op order as the batch kernel
and the x97 oracle — ``floor((dot·10⁶) / (√na·√nb))`` — so stream,
batch twin, and DuckDB agree bit-for-bit and the equivalence test
asserts set equality.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import artifacts as _artifacts
from ..artifacts import plan_fingerprint
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

#: output: one candidate event per (arrival, earlier admitted member)
SEMDEDUP_EVENT_SCHEMA = StructType([
    StructField("vec_id", LongType(), False),
    StructField("nbr_id", LongType(), False),
    StructField("cos_micro", LongType(), False),
])

#: per cluster: admitted ids, flattened qv matrix (len = len(ids)·dim),
#: and the admitted squared norms
_STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType()), True),
    StructField("qvs", ArrayType(LongType()), True),
    StructField("nvs", ArrayType(LongType()), True),
])

#: same per-trigger buffering contract as neardup_stream — one
#: cluster's micro-batch rows are materialized in the state task for
#: global admission order; the source contract bounds the buffer
GROUP_BUFFER_SANITY_ROWS = 250_000


#: Session-scoped codebook cache (the r10/r11 artifact pattern —
#: quantize_codebook was the last uncached trained-state collect).
#: Keyed per (applicationId, cache_key, k_clusters, scale);
#: cache_key=None bypasses.  Value identity pinned in
#: tests/test_streaming.py.
_CODEBOOKS: dict[tuple, list] = _artifacts.register(
    "stream_quantize_codebooks", {})


def quantize_codebook(vecs: DataFrame, *, k_clusters: int,
                      scale: int = 1000,
                      cache_key: str | None = None) -> list[list[int]]:
    """Offline codebook: quantized first ``k_clusters`` vectors by
    ``vec_id`` (the deterministic x44/x94 coarse-quantizer idiom the
    batch ``semantic_dedup`` uses).  Driver state is O(K·dim) — the
    codebook-collect boundedness argument.  ``cache_key`` memoizes the
    trained codebook for the session (see :data:`_CODEBOOKS`)."""
    ck = (None if cache_key is None else
          (vecs.sparkSession.sparkContext.applicationId, cache_key,
           k_clusters, scale, plan_fingerprint(vecs)))
    hit = _artifacts.get(_CODEBOOKS, ck)
    if hit is not None:
        return hit
    rows = (vecs.select("vec_id",
                        F.transform(F.col("embedding").cast("array<double>"),
                                    lambda x: F.floor(x * scale)
                                    .cast("bigint")).alias("qv"))
                .orderBy("vec_id").limit(k_clusters).collect())
    out = [list(r["qv"]) for r in rows]
    if ck is not None:
        _artifacts.put(_CODEBOOKS, ck, out,
                       supersede_prefix=len(ck) - 1)
    return out


def _quantize_assign(codebook: Sequence[Sequence[int]], scale: int):
    """``mapInPandas`` kernel shared by the stream and the batch twin:
    quantize ``embedding`` → ``qv`` (``floor(x·scale)`` in float64 —
    the same IEEE ops as the expression form and the oracle), compute
    ``nv = Σqvᵢ²``, and assign the nearest codebook cluster by
    integer-exact squared distance (argmin first-occurrence = lowest
    cid, matching ``row_number() OVER (ORDER BY dd, cid)``).
    Stateless map, so the stateful operator stays the query's only
    stateful stage."""
    import numpy as np

    C = np.asarray(codebook, dtype=np.float64)
    cn2 = (C * C).sum(axis=1)

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                yield pd.DataFrame({
                    "cluster": pd.Series([], dtype="int64"),
                    "vec_id": pd.Series([], dtype="int64"),
                    "qv": pd.Series([], dtype="object"),
                    "nv": pd.Series([], dtype="int64")})
                continue
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["embedding"].to_numpy()])
            Q = np.floor(V * scale)
            nv = (Q * Q).sum(axis=1)
            dd = nv[:, None] - 2.0 * (Q @ C.T) + cn2[None, :]
            cid = np.argmin(dd, axis=1).astype(np.int64)
            yield pd.DataFrame({
                "cluster": pd.Series(cid, dtype="int64"),
                "vec_id": pd.Series(pdf["vec_id"].to_numpy(),
                                    dtype="int64"),
                "qv": pd.Series([[int(x) for x in row] for row in Q],
                                dtype="object"),
                "nv": pd.Series(nv.astype(np.int64), dtype="int64")})

    return gen


_ASSIGNED = "cluster bigint, vec_id bigint, qv array<bigint>, nv bigint"


def _matcher(dim: int, thresh_micro: int, cluster_cap: int):
    def match(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            ids = list(state.get[0])
            flat = state.get[1]
            nvs = list(state.get[2])
        else:
            ids, flat, nvs = [], [], []
        M = np.empty((cluster_cap, dim), dtype=np.float64)
        count = len(ids)
        if count:
            M[:count] = np.asarray(flat,
                                   dtype=np.float64).reshape(count, dim)
        sn = np.empty(cluster_cap, dtype=np.float64)
        if count:
            sn[:count] = np.sqrt(np.asarray(nvs, dtype=np.float64))
        # global vec_id admission order within the micro-batch — the
        # same materialize-and-sort the neardup matcher documents
        chunks = [p for p in pdfs if len(p)]
        n_buffered = sum(len(p) for p in chunks)
        if n_buffered > GROUP_BUFFER_SANITY_ROWS:
            import sys
            print(f"semdedup_stream: cluster micro-batch of {n_buffered} "
                  f"rows exceeds sanity bound {GROUP_BUFFER_SANITY_ROWS}"
                  f" — throttle the source (maxFilesPerTrigger)",
                  file=sys.stderr)
        rows = (pd.concat(chunks, ignore_index=True)
                  .sort_values("vec_id")
                if chunks else pd.DataFrame(
                    columns=["cluster", "vec_id", "qv", "nv"]))
        out = []
        n = len(rows)
        if n:
            # BATCHED kernel (r9 VERDICT #7): one np.stack + two gram
            # matmuls replace the per-row iterrows loop.  Admission is
            # order-deterministic WITHOUT scanning: members are
            # admitted while count < cap regardless of scores, so the
            # admitted batch rows are exactly the first
            # (cap − count) arrivals in vec_id order.  Every entry of
            # both grams is an exact integer (products/sums of
            # integer-valued doubles < 2⁵³), so any BLAS summation
            # order reproduces the per-row fold bit-for-bit, and the
            # floor((g·1e6)/(sn·sq)) per entry is unchanged.
            QB = np.stack([np.asarray(q, dtype=np.float64)
                           for q in rows["qv"].to_numpy()])
            vids = rows["vec_id"].to_numpy()
            nvb = rows["nv"].to_numpy()
            sqs = np.sqrt(nvb.astype(np.float64))
            count0 = count
            n_adm = min(n, cluster_cap - count0)
            if count0:
                # every arrival vs the pre-batch admitted state
                G = QB @ M[:count0].T
                CM = np.floor((G * 1e6)
                              / (sn[:count0][None, :] * sqs[:, None]))
                for i in range(n):
                    for j in np.nonzero(CM[i] >= thresh_micro)[0]:
                        out.append((int(vids[i]), int(ids[j]),
                                    int(CM[i, j])))
            if n_adm:
                # arrivals vs same-batch members admitted BEFORE them
                QA = QB[:n_adm]
                GB = QB @ QA.T
                CMB = np.floor((GB * 1e6)
                               / (sqs[:n_adm][None, :] * sqs[:, None]))
                for i in range(1, n):
                    jmax = min(i, n_adm)
                    hit = np.nonzero(CMB[i, :jmax] >= thresh_micro)[0]
                    for j in hit:
                        out.append((int(vids[i]), int(vids[j]),
                                    int(CMB[i, j])))
                M[count0:count0 + n_adm] = QA
                sn[count0:count0 + n_adm] = sqs[:n_adm]
                ids.extend(int(v) for v in vids[:n_adm])
                nvs.extend(int(x) for x in nvb[:n_adm])
                count = count0 + n_adm
        state.update((ids,
                      [int(x) for x in M[:count].ravel().tolist()],
                      nvs))
        yield pd.DataFrame(
            out, columns=[f.name for f in SEMDEDUP_EVENT_SCHEMA.fields])

    return match


def semdedup_stream(vecs: DataFrame, codebook: Sequence[Sequence[int]],
                    *, thresh_micro: int = 995_000,
                    cluster_cap: int = 64,
                    scale: int = 1000) -> DataFrame:
    """``vecs(vec_id, embedding)`` stream → semantic near-dup events.

    One stateless Arrow quantize+assign pass (codebook broadcast in
    the closure), one shuffle on the cluster id to the state
    partition, one stateful gram compare per arrival.
    """
    dim = len(codebook[0])
    assigned = (vecs.select("vec_id", "embedding")
                    .mapInPandas(_quantize_assign(codebook, scale),
                                 _ASSIGNED))
    return (assigned.groupBy("cluster")
            .applyInPandasWithState(
                _matcher(dim, thresh_micro, cluster_cap),
                outputStructType=SEMDEDUP_EVENT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def semdedup_batch(vecs: DataFrame, codebook: Sequence[Sequence[int]],
                   *, thresh_micro: int = 995_000,
                   cluster_cap: int = 64,
                   scale: int = 1000) -> DataFrame:
    """Batch twin — identical event set when the stream drains the
    same corpus in vec_id order: within each cluster, the admitted
    membership is the first ``cluster_cap`` arrivals, and every vector
    scores against the admitted members that arrived BEFORE it.  One
    grouped numpy kernel per cluster (members ship once, scores live
    in one gram matrix — the ``semantic_dedup`` shape with the
    admission-order mask instead of the full triangle)."""
    import numpy as np

    dim = len(codebook[0])
    assigned = (vecs.select("vec_id", "embedding")
                    .mapInPandas(_quantize_assign(codebook, scale),
                                 _ASSIGNED))

    def _events_block(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = {"vec_id": "int64", "nbr_id": "int64", "cos_micro": "int64"}
        if len(pdf) < 2:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        Q = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf["qv"].to_numpy()])
        sq = np.sqrt(pdf["nv"].to_numpy(dtype=np.float64))
        cap = min(cluster_cap, len(ids))
        G = Q @ Q[:cap].T
        cm = np.floor((G * 1e6) / (sq[:, None] * sq[None, :cap]))
        # event iff the member was admitted before the arrival:
        # member rank j < min(arrival rank i, cap)
        mask = (cm >= thresh_micro) \
            & (np.arange(len(ids))[:, None] > np.arange(cap)[None, :])
        ii, jj = np.nonzero(mask)
        return pd.DataFrame({
            "vec_id": pd.Series(ids[ii], dtype="int64"),
            "nbr_id": pd.Series(ids[jj], dtype="int64"),
            "cos_micro": pd.Series(cm[ii, jj].astype(np.int64),
                                   dtype="int64")})

    return assigned.groupBy("cluster").applyInPandas(
        _events_block, "vec_id bigint, nbr_id bigint, cos_micro bigint")
