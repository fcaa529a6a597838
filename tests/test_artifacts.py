"""Bounded session-artifact registry (r11 VERDICT #3 / ADVICE):
supersede-on-change eviction, the global LRU key cap, and the
corpus-fingerprint key component — each with the value-identity
contract (an evicted entry rebuilds to identical values)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from enexory_parquet_export_spark import artifacts as A


@pytest.fixture()
def clean_registry():
    """Snapshot-and-restore every registered family around a test."""
    snaps = {fid: dict(fam) for fid, (_, fam) in A._FAMILIES.items()}
    lru = dict(A._LRU)
    for _, fam in A._FAMILIES.values():
        fam.clear()
    A._LRU.clear()
    yield
    for fid, (_, fam) in A._FAMILIES.items():
        fam.clear()
        fam.update(snaps.get(fid, {}))
    A._LRU.clear()
    A._LRU.update(lru)


def _vec_df(spark, n=40, dim=8, seed=0):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(dim)),
                    lambda i: (F.pmod(F.col("id") * 131 + i * 17
                                      + F.lit(seed), F.lit(97))
                               .cast("double") / 10.0)
        ).alias("embedding"))


def _quant(df):
    return (df.select("vec_id",
                      F.transform(F.col("embedding").cast("array<double>"),
                                  lambda x: F.floor(x * 1000)
                                  .cast("bigint")).alias("qv"))
              .withColumn("nv", F.aggregate(
                  "qv", F.lit(0).cast("bigint"), lambda a, x: a + x * x)))


def test_corpus_fingerprint_shares_identical_derivations(spark,
                                                         clean_registry):
    """Two structurally-identical corpus derivations under one
    cache_key share ONE trained entry (the x97/x103 shared-index win
    must survive the fingerprint), while a DIFFERENT corpus under the
    SAME cache_key keys fresh state and SUPERSEDES the stale entry
    instead of silently serving it (r11 ADVICE)."""
    from enexory_parquet_export_spark.operators import similarity as S

    qa1 = _quant(_vec_df(spark, seed=0))
    qa2 = _quant(_vec_df(spark, seed=0))      # same derivation, new plan
    qb = _quant(_vec_df(spark, seed=5))       # different corpus
    ra1 = sorted(tuple(r) for r in S.semantic_dedup(
        qa1, k_clusters=3, thresh_micro=0, cache_key="shared").collect())
    n_after_first = len(S._SEM_ARTIFACTS)
    ra2 = sorted(tuple(r) for r in S.semantic_dedup(
        qa2, k_clusters=3, thresh_micro=0, cache_key="shared").collect())
    assert ra2 == ra1
    assert len(S._SEM_ARTIFACTS) == n_after_first, \
        "identical derivation must HIT, not key a second entry"

    # corpus B reuses the cache_key (caller contract violation the
    # fingerprint now defends): fresh values, stale entry superseded
    rb = sorted(tuple(r) for r in S.semantic_dedup(
        qb, k_clusters=3, thresh_micro=0, cache_key="shared").collect())
    rb_plain = sorted(tuple(r) for r in S.semantic_dedup(
        qb, k_clusters=3, thresh_micro=0).collect())
    assert rb == rb_plain, "stale index must never serve a new corpus"
    assert len(S._SEM_ARTIFACTS) == n_after_first, \
        "the superseded entry must be evicted, not accumulated"


def test_supersede_releases_pinned_encoded_relation(spark,
                                                    clean_registry):
    """A retrained PQ codebook under the same cache_key must evict the
    superseded encoded relation (the r11 ADVICE leak: the stale-guard
    path used to leave BOTH pinned relations held for the session)."""
    from enexory_parquet_export_spark.operators import similarity as S

    q = _quant(_vec_df(spark, n=24, dim=8))
    probes = [(0, [float(i) for i in range(8)])]
    cb1 = S.pq_codebooks(q, n_codes=4, n_sub=4, cache_key="t-sup")
    S.pq_adc_topk(q, probes, codebooks=cb1, k=2,
                  cache_key="t-sup").collect()
    enc_keys = [k for k in S._PQ_ARTIFACTS if k[1] == "pq_enc"]
    assert len(enc_keys) == 1
    # retrain with different n_codes trains a DIFFERENT codebook VALUE
    # but the encoded-relation identity prefix only matches when
    # (n_sub, n_codes) match — so force a value change at the same
    # params by retraining on a shifted corpus under the same key
    q2 = _quant(_vec_df(spark, n=24, dim=8, seed=9))
    cb2 = S.pq_codebooks(q2, n_codes=4, n_sub=4, cache_key="t-sup")
    assert (cb1 != cb2).any()
    out2 = S.pq_adc_topk(q2, probes, codebooks=cb2, k=2,
                         cache_key="t-sup")
    got = sorted(tuple(r) for r in out2.collect())
    want = sorted(tuple(r) for r in S.pq_adc_topk(
        q2, probes, codebooks=cb2, k=2).collect())
    assert got == want
    enc_keys = [k for k in S._PQ_ARTIFACTS if k[1] == "pq_enc"]
    assert len(enc_keys) == 1, \
        "superseded encoded relation must be evicted, not accumulated"


def test_lru_cap_evicts_and_rebuilds_value_identical(spark,
                                                     clean_registry,
                                                     monkeypatch):
    """Past ARTIFACT_KEY_CAP the least-recently-used entry is evicted;
    a later call rebuilds it (first-build billing) to IDENTICAL values
    — the cap trades rebuild cost for bounded memory, never
    correctness."""
    from enexory_parquet_export_spark.operators import similarity as S

    monkeypatch.setattr(A, "ARTIFACT_KEY_CAP", 3)
    ref = {}
    for seed in range(3):
        q = _quant(_vec_df(spark, seed=seed))
        ref[seed] = sorted(tuple(r) for r in S.semantic_dedup(
            q, k_clusters=3, thresh_micro=0,
            cache_key=f"t-lru-{seed}").collect())
    total = sum(len(f) for _, f in A._FAMILIES.values())
    assert total <= 3, f"cap must bound total keys, held {total}"
    # seed 0 was evicted (LRU); rebuilding must bill a fresh build and
    # produce the same values
    q0 = _quant(_vec_df(spark, seed=0))
    again = sorted(tuple(r) for r in S.semantic_dedup(
        q0, k_clusters=3, thresh_micro=0, cache_key="t-lru-0").collect())
    assert again == ref[0]
    assert sum(len(f) for _, f in A._FAMILIES.values()) <= 3


def test_registry_tolerates_out_of_band_clear(spark, clean_registry):
    """Tests .clear() the family dicts directly; the LRU sidecar must
    prune those entries lazily instead of KeyErroring or evicting live
    state on the next put."""
    from enexory_parquet_export_spark.operators import similarity as S

    q = _quant(_vec_df(spark))
    S.semantic_dedup(q, k_clusters=3, thresh_micro=0,
                     cache_key="t-oob").collect()
    S._SEM_ARTIFACTS.clear()          # out-of-band, the test idiom
    out = sorted(tuple(r) for r in S.semantic_dedup(
        q, k_clusters=3, thresh_micro=0, cache_key="t-oob").collect())
    plain = sorted(tuple(r) for r in S.semantic_dedup(
        q, k_clusters=3, thresh_micro=0).collect())
    assert out == plain
    assert len(S._SEM_ARTIFACTS) == 1
