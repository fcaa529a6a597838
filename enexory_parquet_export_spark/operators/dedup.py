"""Deduplication family — north-star extension operators.

Exact (hash-groupBy), MinHash + LSH banding, SimHash, and n-gram
Jaccard near-dup detection over a document corpus.  All token/shingle
and signature math uses built-in higher-order array functions (JVM
whole-stage codegen; zero Python in the hot path), and all hashing is
the portable md5-based family from ``functions.hashing`` so results
are engine-reproducible (the DuckDB oracle computes identical
signatures).

Scale shape:
- signatures are per-row array computations — embarrassingly parallel,
  no shuffle;
- candidate generation is an equi-join on band keys (MinHash) or
  shared shingles (Jaccard) — the only shuffles, and both keys are
  high-cardinality so the join stays balanced (no O(n²) pair scan);
- the reference's only dedup is keyed last-event-wins
  (PE/consolidate.cpp:56-109); this module generalizes it to content
  dedup for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, hash_family, portable_hash60

#: whitespace tokenizer shared with the oracle (regexp_split_to_array)
TOKEN_RE = r"\s+"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), TOKEN_RE)


def shingles(toks: Column, n: int = 3) -> Column:
    """n-token shingles as strings; [] when the doc is too short.

    1-based ``element_at`` indexing matches DuckDB's ``t[i]``.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)])
    return F.when(F.size(toks) >= n, F.transform(idx, mk)) \
            .otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep-first exact dedup: one hash aggregation on the content key."""
    aggs = [F.min(order_col).alias(order_col)]
    return df.groupBy(*keys).agg(*aggs, F.count("*").alias("group_sz"))


def minhash_signatures(docs: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: array<bigint> of length k.

    min over shingles of each universal hash — computed entirely
    inside one ``transform``/``array_min`` per row (no explode, no
    shuffle).
    """
    sh = shingles(tokens(F.col(text_col)), shingle_n)
    # NB: the per-hash closure must stay a ONE-parameter lambda —
    # PySpark treats two-parameter lambdas as (element, index).
    def _one_arg(h):
        return lambda s: h(s)

    sig = F.array(*[
        F.array_min(F.transform(sh, _one_arg(h)))
        for h in _hash_lambdas(k)
    ])
    return docs.select(F.col(id_col).alias("doc_id"),
                       sh.alias("sh"), sig.alias("sig"))


def _hash_lambdas(k: int):
    def mk(i):
        a, b = 2 * i + 1, 7919 * (i + 1)
        return lambda s: (F.lit(a) * (portable_hash60(s) % F.lit(MERSENNE_P))
                          + F.lit(b)) % F.lit(MERSENNE_P)
    return [mk(i) for i in range(k)]


def lsh_candidate_pairs(sigs: DataFrame, *, bands: int = 4,
                        rows_per_band: int = 2) -> DataFrame:
    """Banded LSH: docs agreeing on any full band become candidates.

    Equi-join on band keys; key = (band index, the band's signature
    slice) so collisions across bands cannot alias.
    """
    keys = F.explode(F.array(*[
        F.concat_ws(":", F.lit(b),
                    *[F.col("sig")[b * rows_per_band + r].cast("string")
                      for r in range(rows_per_band)])
        for b in range(bands)
    ])).alias("band_key")
    keyed = sigs.select("doc_id", keys)
    a = keyed.select(F.col("doc_id").alias("id_a"), "band_key")
    b = keyed.select(F.col("doc_id").alias("id_b"), "band_key")
    return (a.join(b, ["band_key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())


def minhash_dup_pairs(docs: DataFrame, *, threshold: float = 0.5,
                      k: int = 8, bands: int = 4) -> DataFrame:
    """LSH candidates → signature-estimated Jaccard ≥ threshold.

    Returns ``id_a, id_b, est_sim DECIMAL(18,6)``.
    """
    sigs = minhash_signatures(docs, k=k)
    cand = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=k // bands)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (F.aggregate(
               F.zip_with("sig_a", "sig_b",
                          lambda x, y: (x == y).cast("int")),
               F.lit(0), lambda acc, x: acc + x)
           / F.lit(float(k)))
    return (cand.join(sa, "id_a").join(sb, "id_b")
                .withColumn("est_sim", est.cast("decimal(18,6)"))
                .filter(F.col("est_sim") >= threshold)
                .select("id_a", "id_b", "est_sim"))


def simhash_signatures(docs: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", bits: int = 60) -> DataFrame:
    """60-bit SimHash per doc: bit b is set iff at least half the
    token hashes have bit b set (majority vote per bit).

    Nested higher-order expression (aggregate over bit positions, each
    folding the token-hash array) — no explode, no shuffle; the DuckDB
    oracle computes the identical value with list_transform/list_sum.
    """
    df = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("_t"),
    ).withColumn(
        "_th",
        F.expr("transform(_t, x -> "
               "CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT))"),
    ).withColumn("_n", F.size("_t"))
    sim = F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), (acc, b) -> "
        f"acc + IF(2 * aggregate(_th, CAST(0 AS BIGINT), "
        f"(a, hh) -> a + (shiftright(hh, b) & CAST(1 AS BIGINT))) >= _n, "
        f"shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))")
    return df.select("doc_id", sim.alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, *, threshold: float = 0.6,
                        shingle_n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    Candidate generation by shared-shingle equi-join (docs sharing no
    shingle are never paired — the scalable trick vs. all-pairs), then
    |A∩B| / (|A| + |B| − |A∩B|) ≥ threshold.
    Returns ``id_a, id_b, jac DECIMAL(18,6)``.
    """
    sh = (docs.select(F.col("doc_id"),
                      F.array_distinct(
                          shingles(tokens(F.col("text")), shingle_n))
                       .alias("s"))
              .withColumn("nsh", F.size("s")))
    exploded = sh.select("doc_id", "nsh", F.explode("s").alias("sh"))
    a = exploded.select(F.col("doc_id").alias("id_a"),
                        F.col("nsh").alias("na"), "sh")
    b = exploded.select(F.col("doc_id").alias("id_b"),
                        F.col("nsh").alias("nb"), "sh")
    shared = (a.join(b, ["sh"])
               .filter(F.col("id_a") < F.col("id_b"))
               .groupBy("id_a", "id_b", "na", "nb")
               .agg(F.count("*").alias("shared")))
    jac = (F.col("shared") * 1.0
           / (F.col("na") + F.col("nb") - F.col("shared")))
    return (shared.withColumn("jac", jac.cast("decimal(18,6)"))
                  .filter(F.col("jac") >= threshold)
                  .select("id_a", "id_b", "jac"))
