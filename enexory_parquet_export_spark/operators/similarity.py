"""Similarity search over embedding columns (north-star extension).

Exact brute-force cosine top-k as the declared baseline, blocked by a
candidate key (``label``) so the pair space is bounded; an LSH-bucketed
approximate variant as the 100 TB scale path (random-hyperplane
signatures, deterministic planes derived from portable md5 hashing so
the result is engine-reproducible).

All vector math is a FLAT left-associative expression tree
(``v[1]*w[1] + v[2]*w[2] + …``): bit-identical to DuckDB's
``list_dot_product`` left fold (same IEEE operation order), but it
stays inside whole-stage codegen — the equivalent
``aggregate(zip_with(...))`` higher-order formulation is interpreted
per element and measured ~10× slower on the pair joins.  Requires a
known dimension, which embedding columns have by contract.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixture embedding dimension (embeddings.embedding: array<float>[64])
DIM = 64


def _dot(a, b, dim: int = DIM):
    # reduce keeps the addition left-associative → same rounding as a
    # strict fold; element_at is 1-based like DuckDB lists
    return reduce(operator.add,
                  (F.element_at(a, i) * F.element_at(b, i)
                   for i in range(1, dim + 1)))


def _norm(v, dim: int = DIM):
    return F.sqrt(reduce(operator.add,
                         (F.element_at(v, i) * F.element_at(v, i)
                          for i in range(1, dim + 1))))


def _dot_lit(plane: list, v, dim: int = DIM):
    """Dot of a Python literal coefficient vector with an array column
    — constant multipliers fold straight into codegen."""
    return reduce(operator.add,
                  (F.lit(plane[i]) * F.element_at(v, i + 1)
                   for i in range(dim)))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return emb.select("vec_id", "label", v.alias("v")) \
              .withColumn("nrm", _norm(F.col("v")))


def cosine_topk_blocked(emb: DataFrame, *, k: int = 3,
                        block_col: str = "label") -> DataFrame:
    """Exact top-k cosine neighbours within each block.

    Block-local self-join: pair count is Σ_block n_b², bounded by the
    blocking key's cardinality design.  For unblocked corpora use
    :func:`ann_lsh_topk` (bucketed candidates) instead.
    """
    n = with_norm(emb)
    a = n.select(F.col("vec_id"), F.col(block_col).alias("_blk"),
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("nbr_id"), F.col(block_col).alias("_blkb"),
                 F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = (a.join(b, (F.col("_blk") == F.col("_blkb"))
                    & (F.col("vec_id") != F.col("nbr_id")))
             .withColumn("cos", _dot(F.col("va"), F.col("vb"))
                         / (F.col("na") * F.col("nb"))))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("nbr_id"))
    return (pairs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
                 .filter(F.col("rnk") <= k)
                 .select("vec_id", "nbr_id",
                         F.col("cos").cast("decimal(18,6)").alias("cos_sim"),
                         "rnk"))


def sign_bucket(v) -> "F.Column":
    """Component-sign fingerprint of a vector ('1'/'0' per dim).

    Invariant under positive scaling — parallel vectors always share
    it; random high-dim vectors collide with probability 2^-dim.  The
    exact-candidate generator for scale-perturbed near-dup detection.
    """
    return F.array_join(
        F.transform(v, lambda x: F.when(x >= 0, F.lit("1"))
                                  .otherwise(F.lit("0"))), "")


def lsh_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random-hyperplane coefficients in [−1, 1],
    derived from md5(plane_dim) — reproducible in any engine with no
    RNG state (the oracle embeds the same literals)."""
    import hashlib

    def coeff(p: int, d: int) -> float:
        h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
        return (h % 2001 - 1000) / 1000.0

    return [[coeff(p, d) for d in range(dim)] for p in range(n_planes)]


def ann_lsh_topk(emb: DataFrame, *, k: int = 3, n_planes: int = 4,
                 dim: int = 64, vec_col: str = "embedding") -> DataFrame:
    """Approximate NN: random-hyperplane LSH bucketing + exact rerank.

    Buckets = sign pattern of ``n_planes`` deterministic hyperplanes.
    Candidates share a bucket; exact cosine reranks within the bucket.
    Scale path: bucket count ~2^n_planes keeps each bucket's self-join
    tiny; tune n_planes to corpus size (4 for the small fixture).
    """
    planes = lsh_planes(n_planes, dim)
    vv = F.col("v")  # resolved against the select below, not the input
    sign_bits = [
        F.when(_dot_lit(plane, vv) >= 0,
               F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    keyed = (emb.select("vec_id", "label",
                        F.col(vec_col).cast("array<double>").alias("v"))
                .withColumn("bucket", F.concat(*sign_bits))
                .withColumn("nrm", _norm(F.col("v"))))
    a = keyed.select("vec_id", F.col("bucket"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"))
    b = keyed.select(F.col("vec_id").alias("nbr_id"), F.col("bucket").alias("bucketb"),
                     F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = (a.join(b, (F.col("bucket") == F.col("bucketb"))
                    & (F.col("vec_id") != F.col("nbr_id")))
             .withColumn("cos", _dot(F.col("va"), F.col("vb"))
                         / (F.col("na") * F.col("nb"))))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("nbr_id"))
    return (pairs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
                 .filter(F.col("rnk") <= k)
                 .select("vec_id", "nbr_id",
                         F.col("cos").cast("decimal(18,6)").alias("cos_sim"),
                         "rnk"))
