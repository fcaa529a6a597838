"""Connected components: correctness + integration with real pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enexory_parquet_export_spark.operators.components import (
    connected_components,
)
from enexory_parquet_export_spark.operators.dedup import minhash_dup_pairs
from enexory_parquet_export_spark.sources.tables import load_table


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")


def labels_of(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_components_basic_shapes(spark):
    # two triangles bridged by a chain + one separate pair
    got = labels_of(connected_components(edges_df(spark, [
        (1, 2), (2, 3), (1, 3),          # triangle
        (3, 4), (4, 5),                  # chain to...
        (5, 6), (6, 7), (5, 7),          # ...second triangle
        (100, 200),
    ])))
    assert {got[n] for n in (1, 2, 3, 4, 5, 6, 7)} == {1}
    assert got[100] == got[200] == 100


def test_components_long_chain_converges(spark):
    # pathological diameter: 0-1-2-...-30 (needs multiple rounds) —
    # force the DISTRIBUTED loop (local_bound=0); the default path
    # would take the union-find shortcut
    got = labels_of(connected_components(
        edges_df(spark, [(i, i + 1) for i in range(30)]),
        local_bound=0))
    assert set(got.values()) == {0} and len(got) == 31


def test_components_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        connected_components(
            edges_df(spark, [(i, i + 1) for i in range(30)]),
            max_iter=2, local_bound=0)


def test_components_local_fast_path_identical(spark):
    """The size-gated union-find shortcut must be value-identical to
    the distributed pointer-jumping loop on an adversarial mix of
    shapes (deep chain + stars + dupes + both edge orders)."""
    edges = ([(i, i + 1) for i in range(0, 40)]            # chain
             + [(1000 + i % 7, 2000 + i) for i in range(30)]  # stars
             + [(2, 1), (5, 4)]                            # reversed dupes
             + [(9999, 9998)])
    df = edges_df(spark, edges)
    local = labels_of(connected_components(df))
    dist = labels_of(connected_components(df, local_bound=0))
    assert local == dist and len(local) > 0


def test_components_of_real_minhash_pairs(spark, sf_dir):
    """End-to-end dedup pipeline: derived corpus (doc ∪ twin) →
    MinHash pairs → components = exactly one 2-doc cluster per twin,
    labeled by the original doc id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text") \
        .limit(120)
    twins = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                        F.concat("text", F.lit(" zz0 zz1 zz2")).alias("text"))
    pairs = minhash_dup_pairs(docs.unionByName(twins), threshold=0.5)
    comp = connected_components(pairs)
    labels = {r["node"]: r["label"] for r in comp.collect()}
    assert labels, "no near-dup clusters found"
    # every original's twin lands in the SAME cluster (their pair is
    # always ≥ threshold); clusters may be larger than 2 when distinct
    # fixture docs are genuinely similar — but twins must never split
    originals = [n for n in labels if n < 1_000_000]
    assert originals
    for n in originals:
        assert labels.get(n + 1_000_000) == labels[n], n


def test_components_reliable_checkpoint_identical(spark, sf_dir,
                                                  tmp_path, monkeypatch):
    """SPARK_GRAFT_CHECKPOINT_DIR routes every session.materialize
    call site through RELIABLE df.checkpoint() (fault-tolerant on a
    cluster, where localCheckpoint's executor-resident blocks are
    not).  The x59 components loop — the deepest materialize user —
    must be value-identical under it."""
    from enexory_parquet_export_spark import session as S
    from enexory_parquet_export_spark.queries_ext import SPARK_QUERIES

    base = {tuple(r) for r in
            SPARK_QUERIES["x59_dedup_clusters"](spark, sf_dir).collect()}
    # the env var (not the lingering context checkpoint dir) gates the
    # reliable path, so monkeypatch's teardown restores localCheckpoint
    # behavior for every later test
    monkeypatch.setenv(S.CHECKPOINT_DIR_ENV, str(tmp_path / "ck"))
    reliable = {tuple(r) for r in
                SPARK_QUERIES["x59_dedup_clusters"](spark,
                                                    sf_dir).collect()}
    assert reliable == base
