"""End-to-end training-data pipeline composition (r4 verdict item 6).

Every stage of the curation pipeline is individually oracle-green
(x78, x30/x59/x82, x55, x83, x89, x77, x79); this test runs them as
ONE composed job graph over the sf0.1 documents fixture — quality
filter → near-dup candidate pairs → connected components → cluster
resolution → decontamination → mixture sampling → deterministic
shuffle → sequence packing → shard routing — checking cross-stage ROW
ACCOUNTING at every hand-off.  The multi-consumer materialization
idiom (operators checkpoint relations read by several downstream
branches) is exactly the kind of thing that only breaks in
composition, which is what this exercises.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from enexory_parquet_export_spark.functions.hashing import portable_hash60
from enexory_parquet_export_spark.operators import dedup as D
from enexory_parquet_export_spark.operators.components import (
    connected_components,
)
from enexory_parquet_export_spark.operators.dedup import minhash_dup_pairs
from enexory_parquet_export_spark.sources.tables import load_table
from enexory_parquet_export_spark.streaming.packing import (
    pack_batch,
    with_shard,
)

SF_DIR = "/root/testdata/sf0.01"
_MIX_RATE = {"web": 80, "books": 100}  # keep-% per source, default 60


@pytest.mark.slow
def test_pipeline_end_to_end(spark):
    t_start = time.perf_counter()
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()

    # ---- stage 1: quality filter (the x78 cascade, gating predicate) ----
    toks = D.tokens(F.col("text"))
    filtered = (docs.filter((F.col("n_chars") >= 20) & (F.size(toks) >= 5))
                    .select("doc_id", "text", "source"))
    n_filtered = filtered.count()
    assert 0 < n_filtered <= n_docs

    # ---- stage 2: derived twins + near-dup candidate pairs (x30) ----
    twins = (filtered.filter(F.col("doc_id") % 50 == 0)
             .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                     F.concat("text", F.lit(" zz0 zz1 zz2")).alias("text"),
                     "source"))
    n_twins = twins.count()
    corpus = filtered.unionByName(twins)
    pairs = minhash_dup_pairs(corpus.select("doc_id", "text"),
                              threshold=0.5)

    # ---- stage 3+4: components (x59) → canonical-per-cluster (x82) ----
    labels = connected_components(pairs)
    # no twin may be its own canonical: its origin has the smaller id
    assert labels.filter((F.col("node") >= 1_000_000)
                         & (F.col("node") == F.col("label"))).count() == 0
    non_canon = labels.filter(F.col("node") != F.col("label")) \
                      .select(F.col("node").alias("doc_id"))
    n_non_canon = non_canon.count()
    resolved = corpus.join(non_canon, "doc_id", "left_anti")
    n_resolved = resolved.count()
    # exact conservation: kept = corpus − demoted duplicates
    assert n_resolved == n_filtered + n_twins - n_non_canon
    # every injected twin pair must have been found and demoted
    assert n_non_canon >= n_twins

    # ---- stage 5: decontamination vs a probe set (x55 shape) ----
    # near-dups are gone after stage 4, so contamination is injected
    # HERE (benchmark leaks arrive independently of dedup): corpus-side
    # near-copies of every probe doc, which the shingle join must flag
    probe_docs = resolved.filter(F.col("doc_id") % 97 == 0)
    contam = probe_docs.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat("text", F.lit(" leaked benchmark suffix")).alias("text"),
        "source")
    n_contam = contam.count()
    assert n_contam > 0
    pool = resolved.unionByName(contam)
    sh = (D._exploded_shingles(pool, id_col="doc_id", text_col="text",
                               shingle_n=3, distinct=True)
          .select("doc_id", F.xxhash64("s").alias("h")))
    probe_sh = (sh.join(F.broadcast(probe_docs.select("doc_id")), "doc_id")
                  .select(F.col("doc_id").alias("probe_id"), "h"))
    flagged = (sh.join(F.broadcast(probe_sh), "h")
                 .filter(F.col("doc_id") != F.col("probe_id"))
                 .groupBy("doc_id", "probe_id")
                 .agg(F.count("*").alias("shared"))
                 .filter(F.col("shared") >= 5)
                 .select("doc_id").distinct())
    n_flagged = flagged.count()
    # every injected leak shares all its probe's shingles → all flagged
    assert n_flagged >= n_contam
    clean = pool.join(flagged, "doc_id", "left_anti")
    n_clean = clean.count()
    assert n_clean == n_resolved + n_contam - n_flagged

    # ---- stage 6: mixture sampling by source (x83 shape) ----
    rate = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(r))
          for s, r in _MIX_RATE.items()], F.lit(60))
    keep = (portable_hash60(F.concat(F.lit("mix:"),
                                     F.col("doc_id").cast("string")))
            % 100) < rate
    mixed = clean.filter(keep)
    n_mixed = mixed.count()
    # the keep predicate is deterministic: recount must agree exactly
    assert n_mixed == clean.filter(keep).count()
    assert 0 < n_mixed <= n_clean

    # ---- stage 7: deterministic global shuffle (x89 idiom) ----
    h = portable_hash60(F.concat(F.lit("shuf:"),
                                 F.col("doc_id").cast("string")))
    b = (h % 64).cast("bigint")
    withb = mixed.withColumn("_h", h).withColumn("_b", b)
    sizes = withb.groupBy("_b").agg(F.count("*").alias("_n"))
    woff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_b", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"))
    wrank = Window.partitionBy("_b").orderBy("_h", "doc_id")
    perm = (withb.join(F.broadcast(offsets), "_b")
            .withColumn("pos", F.row_number().over(wrank) - 1 + F.col("_off")))
    stats = perm.agg(F.countDistinct("pos").alias("d"),
                     F.min("pos").alias("lo"),
                     F.max("pos").alias("hi")).collect()[0]
    # pos is a permutation of 0..n_mixed-1 — no collisions, no gaps
    assert (stats["d"], stats["lo"], stats["hi"]) == (n_mixed, 0, n_mixed - 1)

    # ---- stage 8: sequence packing (x77 batch twin) ----
    sized = perm.select("doc_id",
                        F.size(D.tokens(F.col("text"))).cast("bigint")
                         .alias("n_tokens"))
    packed = pack_batch(sized, capacity=256, n_shards=16)
    agg = packed.agg(F.count("*").alias("n"),
                     F.sum("n_tokens").alias("tok"),
                     F.max("bin_offset").alias("maxoff"),
                     F.min("bins_spanned").alias("minspan")).collect()[0]
    want_tok = sized.agg(F.sum("n_tokens")).collect()[0][0]
    # token conservation + slot invariants
    assert agg["n"] == n_mixed and agg["tok"] == want_tok
    assert agg["maxoff"] < 256 and agg["minspan"] >= 1

    # ---- stage 9: shard routing (x79 router) + final materialization ----
    shards = with_shard(packed, n_shards=16)
    final = shards.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens")).collect()
    assert sum(r["n_docs"] for r in final) == n_mixed
    assert sum(r["n_tokens"] for r in final) == want_tok
    assert 1 <= len(final) <= 16

    wall = time.perf_counter() - t_start
    print(f"\npipeline e2e @ sf0.1: docs={n_docs} filtered={n_filtered} "
          f"twins={n_twins} resolved={n_resolved} flagged={n_flagged} "
          f"clean={n_clean} mixed={n_mixed} wall={wall:.1f}s")
    assert wall < 600


@pytest.mark.slow
def test_tokenizer_training_pipeline(spark):
    """Round-5 composition: the tokenizer-training path — quality
    filter → temporal-novelty pruning (x93 shape) → word-frequency
    table → BPE merge induction (x95) → post-merge vocabulary (x96)
    — as one job graph with row accounting at every hand-off."""
    from enexory_parquet_export_spark.queries_ext import (
        bpe_merges,
        kmeans_assign,
    )
    from enexory_parquet_export_spark.session import materialize

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()

    # stage 1: quality gate
    filtered = (docs.filter(F.col("n_chars") >= 20)
                    .select("doc_id", "text"))
    n_filtered = filtered.count()
    assert 0 < n_filtered <= n_docs

    # stage 2: novelty pruning — keep documents contributing at least
    # one first-seen shingle over ingest order (the x93 metric)
    sh = (D._exploded_shingles(filtered, id_col="doc_id",
                               text_col="text", shingle_n=3,
                               distinct=True)
          .select("doc_id", F.xxhash64("s").alias("h"))
          .transform(materialize, eager=False))
    firsts = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel_docs = (sh.join(firsts, "h")
                    .filter(F.col("first_doc") == F.col("doc_id"))
                    .select("doc_id").distinct())
    survivors = filtered.join(novel_docs, "doc_id", "left_semi")
    n_survivors = survivors.count()
    assert 0 < n_survivors <= n_filtered

    # stage 3: word-frequency table from survivors only
    wc = (survivors.select(F.explode(D.tokens(F.col("text")))
                            .alias("word"))
                   .filter(F.col("word") != "")
                   .groupBy("word")
                   .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    total_words = wc.agg(F.sum("cnt")).collect()[0][0]
    assert total_words > 0

    # stage 4+5: merges and the post-merge vocabulary from ONE core
    merges = bpe_merges(wc).collect()
    assert [m["step"] for m in merges] == [1, 2, 3]
    sym = bpe_merges(wc, return_symbols=True)
    vocab = (sym.groupBy("s")
                .agg(F.sum("cnt").cast("bigint").alias("occurrences")))
    # accounting: total post-merge symbol mass = total pre-merge chars
    # minus one per applied merge occurrence; every merge strictly
    # reduces mass, and every merged pair token exists in the vocab
    pre_mass = (wc.select(F.sum(F.length("word") * F.col("cnt")))
                  .collect()[0][0])
    post = {r["s"]: r["occurrences"] for r in vocab.collect()}
    post_mass = sum(len(s) * n for s, n in post.items())
    assert post_mass == pre_mass  # merges concatenate, chars conserved
    assert sum(post.values()) < pre_mass  # at least one merge applied
    first_merge = merges[0]
    assert (first_merge["left_sym"] + first_merge["right_sym"]) in post

    # stage 6: cluster the embedding table with the same-round k-means
    emb = load_table(spark, SF_DIR, "embeddings")
    n_vec = emb.count()
    asg = kmeans_assign(emb).collect()
    assert len(asg) == n_vec
    assert len({r["cluster"] for r in asg}) <= 8
    assert all(r["dist_q"] >= 0 for r in asg)
