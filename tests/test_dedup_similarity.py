"""Dedup family + similarity search operators (north-star extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from enexory_parquet_export_spark.operators import dedup as D
from enexory_parquet_export_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk_blocked,
)
from enexory_parquet_export_spark.sources.tables import load_table


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shingles_short_doc_empty(spark):
    df = docs_df(spark, [(1, "a b"), (2, "a b c d")])
    out = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", D.shingles(D.tokens(F.col("text"))).alias("s")).collect()}
    assert out[1] == []
    assert out[2] == ["a b c", "b c d"]


def test_exact_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "x", 1.0), (3, "y", 2.0)],
        "id bigint, k string, v double")
    out = {(r["k"], r["v"]): (r["id"], r["group_sz"])
           for r in D.exact_dedup(df, ["k", "v"], "id").collect()}
    assert out == {("x", 1.0): (1, 2), ("y", 2.0): (3, 1)}


def test_minhash_identical_docs_perfect_sim(spark):
    text = "the quick brown fox jumps over the lazy dog today"
    df = docs_df(spark, [(1, text), (2, text), (3, "completely different words here entirely now")])
    pairs = {(r["id_a"], r["id_b"]): r["est_micro"] / 1e6
             for r in D.minhash_dup_pairs(df, threshold=0.5).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_near_dup(spark):
    a = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    b = a + " extra"            # high overlap
    df = docs_df(spark, [(1, a), (2, b), (3, "x0 x1 x2 x3 x4")])
    pairs = {(r["id_a"], r["id_b"]): r["jac_micro"] / 1e6
             for r in D.ngram_jaccard_pairs(df, threshold=0.6).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8
    assert all(3 not in p for p in pairs)


def test_ngram_jaccard_class_collapse_paths(spark):
    """Pin the r9 class-collapse pair emitter on its three paths:
    intra-class (identical shingle sets ⇒ J = 1.0, no verification),
    cross-class expansion (every member pair of a qualifying class
    pair scores the class Jaccard), and their disjointness (no pair
    emitted twice)."""
    a = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    b = a + " extra"
    # docs 1/2/5 identical (one class of 3), 3/4 identical near-dups
    # of that class, 6 unrelated
    df = docs_df(spark, [(1, a), (2, a), (5, a), (3, b), (4, b),
                         (6, "x0 x1 x2 x3 x4")])
    rows = D.ngram_jaccard_pairs(df, threshold=0.6).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jac_micro"] for r in rows}
    assert len(rows) == len(pairs), "pair emitted twice"
    # intra-class: C(3,2) + C(2,2) pairs at exactly 1e6
    for p in [(1, 2), (1, 5), (2, 5), (3, 4)]:
        assert pairs[p] == 1_000_000
    # cross-class: all 3x2 member pairs, identical score
    cross = {p: v for p, v in pairs.items()
             if p in [(1, 3), (1, 4), (2, 3), (2, 4), (3, 5), (4, 5)]}
    assert len(cross) == 6
    assert len(set(cross.values())) == 1
    assert 600_000 <= next(iter(cross.values())) < 1_000_000
    assert all(6 not in p for p in pairs)


def test_ngram_jaccard_all_identical_corpus(spark):
    """Degenerate corpus: every doc identical — one class, zero
    cross-class candidates, output = all C(m,2) pairs at J = 1.0."""
    text = "t0 t1 t2 t3 t4 t5"
    df = docs_df(spark, [(i, text) for i in range(1, 6)])
    rows = D.ngram_jaccard_pairs(df, threshold=0.6).collect()
    got = {(r["id_a"], r["id_b"]): r["jac_micro"] for r in rows}
    want = {(i, j): 1_000_000 for i in range(1, 6)
            for j in range(i + 1, 6)}
    assert got == want


def test_simhash_stability_and_locality(spark):
    df = docs_df(spark, [(1, "alpha beta gamma delta"),
                         (2, "alpha beta gamma delta"),
                         (3, "epsilon zeta eta theta")])
    sig = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(df).collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[3]
    assert all(0 <= s < 2 ** 60 for s in sig.values())


def test_simhash_lane_packed_equals_general(spark, sf_dir):
    """The 12-accumulator lane-packed aggregation must be bit-identical
    to the 60-sum general path on real data (including docs whose token
    count ties the majority threshold exactly)."""
    docs = load_table(spark, sf_dir, "documents").limit(400)
    general = {r["doc_id"]: r["simhash"]
               for r in D.simhash_signatures(docs).collect()}
    packed = {r["doc_id"]: r["simhash"]
              for r in D.simhash_signatures(docs, max_tokens=4095).collect()}
    assert packed == general


def test_cosine_topk_self_excluded_and_ranked(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    out = cosine_topk_blocked(emb, k=3)
    rows = out.collect()
    assert all(r["vec_id"] != r["nbr_id"] for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["vec_id"], []).append((r["rnk"], r["cos_micro"] / 1e6))
    for ranked in by_q.values():
        ranked.sort()
        assert len(ranked) <= 3
        sims = [s for _, s in ranked]
        assert sims == sorted(sims, reverse=True)


def test_cosine_topk_class_collapse_on_duplicated_corpus(spark, sf_dir):
    """The r10 class collapse (pair matrix over bit-identical-vector
    class representatives) must be value-invisible: a corpus where
    every vector has exact copies (the paired_sf1 10×-copy shape) must
    produce exactly the naive full-pair-matrix answer, intra-class
    pairs, cross-class exact ties and rank order included."""
    import numpy as np

    base = load_table(spark, sf_dir, "embeddings").limit(40)
    copies = 3
    scaled = base
    for i in range(1, copies):
        scaled = scaled.unionByName(base.select(
            (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
            "label", "embedding"))
    k = 3
    got = {(r["vec_id"], r["rnk"]): (r["nbr_id"], r["cos_micro"]) for r in
           cosine_topk_blocked(scaled, k=k).collect()}

    # independent naive reference: full pair matrix per label block,
    # same ordered fold and (cos DESC, nbr_id) tie-break
    rows = scaled.select("vec_id", "label",
                         F.col("embedding").cast("array<double>")
                          .alias("v")).collect()
    blocks: dict = {}
    for r in rows:
        blocks.setdefault(r["label"], []).append(
            (r["vec_id"], np.array(r["v"], dtype=np.float64)))
    want = {}
    for mem in blocks.values():
        ids = np.array([i for i, _ in mem])
        A = np.stack([v for _, v in mem])
        n, dim = A.shape
        dots = np.zeros((n, n))
        for i in range(dim):
            dots += np.multiply.outer(A[:, i], A[:, i])
        nrm = np.zeros(n)
        for i in range(dim):
            nrm += A[:, i] * A[:, i]
        cos = dots / np.multiply.outer(np.sqrt(nrm), np.sqrt(nrm))
        np.fill_diagonal(cos, -np.inf)
        for r_i in range(n):
            order = np.lexsort((ids, -cos[r_i]))[:k]
            for rnk, c_idx in enumerate(order, 1):
                if c_idx != r_i:
                    want[(ids[r_i], rnk)] = (
                        ids[c_idx], int(np.floor(cos[r_i, c_idx] * 1e6)))
    assert got == want
    # the duplicated corpus must actually exercise intra-class pairs
    assert any(abs(v - q) == 1_000_000 or abs(v - q) == 2_000_000
               for (q, _), (v, _) in got.items())


def test_cosine_topk_collapse_boundary_ties(spark):
    """Adversarial tie fixture for the class-collapse expansion: axis
    vectors make EXACT cross-class cosine ties (cos = 0.0 between
    orthogonal classes, 1.0 within), so the k-th slot lands inside a
    tie set spanning several classes and the boundary-tie inclusion +
    per-member (cos DESC, nbr_id) resolution must reproduce the naive
    full-matrix answer exactly."""
    import numpy as np

    dim, k = 8, 3
    rows = []
    # 4 orthogonal axis classes × 3 duplicates each + one lone axis:
    # for a query in class a, the m−1 twins score 1.0 and EVERY other
    # class scores exactly 0.0 — the rank-2..k slots are one big tie
    # across classes, resolved only by nbr_id.  id = copy·10 + axis
    # INTERLEAVES the tie set across classes so the id order mixes
    # classes, not blocks of one class.
    for axis in range(4):
        v = [0.0] * dim
        v[axis] = 2.0
        for copy in range(3):
            rows.append((copy * 10 + axis, 0, list(v)))
    v = [0.0] * dim
    v[5] = 7.0
    rows.append((999, 0, v))
    emb = spark.createDataFrame(
        [(i, lbl, vec) for i, lbl, vec in rows],
        "vec_id bigint, label int, embedding array<double>")
    got = {(r["vec_id"], r["rnk"]): (r["nbr_id"], r["cos_micro"]) for r in
           cosine_topk_blocked(emb, k=k).collect()}

    ids = np.array([i for i, _, _ in rows])
    A = np.stack([np.array(v, dtype=np.float64) for _, _, v in rows])
    n, d = A.shape
    dots = np.zeros((n, n))
    for i in range(d):
        dots += np.multiply.outer(A[:, i], A[:, i])
    nrm = np.sqrt(np.sum(A * A, axis=1))
    cos = dots / np.multiply.outer(nrm, nrm)
    np.fill_diagonal(cos, -np.inf)
    want = {}
    for r_i in range(n):
        order = np.lexsort((ids, -cos[r_i]))[:k]
        for rnk, c in enumerate(order, 1):
            if c != r_i:
                want[(ids[r_i], rnk)] = (ids[c],
                                         int(np.floor(cos[r_i, c] * 1e6)))
    assert got == want
    # sanity: the fixture really has cross-class zero ties at rank 2+
    assert any(v_cos == 0 for (_, rnk), (_, v_cos) in want.items()
               if rnk >= 2)


def test_cosine_topk_collapse_property(spark):
    """Property sweep for the class collapse: random small-integer
    vector sets (dim 3) with forced duplication — integer components
    make exact ties common, INCLUDING cos = 1.0 between different
    classes (v and its scalar multiple collapse to different classes
    but tie exactly against every query).  Kernel must equal the
    naive full-matrix fold on every draw."""
    import random

    import numpy as np

    rng = random.Random(1029)
    for _trial in range(6):
        base = [[rng.randint(-2, 2) for _ in range(3)] for _ in range(8)]
        base = [v if any(v) else [1, 0, 0] for v in base]   # no zero norm
        vecs = []
        for v in base:
            vecs.append(v)
            if rng.random() < 0.5:
                vecs.append(list(v))                        # exact dup
            if rng.random() < 0.3:
                vecs.append([2 * x for x in v])             # scaled twin
        perm = list(range(len(vecs)))
        rng.shuffle(perm)                 # ids scrambled vs class order
        rows = [(perm[i] * 7, 0, [float(x) for x in v])
                for i, v in enumerate(vecs)]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, label int, embedding array<double>")
        k = 3
        got = {(r["vec_id"], r["rnk"]): (r["nbr_id"], r["cos_micro"])
               for r in cosine_topk_blocked(emb, k=k).collect()}
        ids = np.array([i for i, _, _ in rows])
        A = np.stack([np.array(v, dtype=np.float64) for _, _, v in rows])
        n, d = A.shape
        dots = np.zeros((n, n))
        nrm2 = np.zeros(n)
        for i in range(d):                                  # ordered fold
            dots += np.multiply.outer(A[:, i], A[:, i])
            nrm2 += A[:, i] * A[:, i]
        cos = dots / np.multiply.outer(np.sqrt(nrm2), np.sqrt(nrm2))
        np.fill_diagonal(cos, -np.inf)
        want = {}
        for r_i in range(n):
            order = np.lexsort((ids, -cos[r_i]))[:k]
            for rnk, c in enumerate(order, 1):
                if c != r_i:
                    want[(ids[r_i], rnk)] = (
                        ids[c], int(np.floor(cos[r_i, c] * 1e6)))
        assert got == want, f"trial {_trial} diverged"


def test_ann_lsh_is_subset_of_bucket_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(80)
    out = ann_lsh_topk(emb, k=3, n_planes=4).collect()
    # every neighbor pair must share the LSH bucket by construction;
    # sanity: ranks are 1..k and cos within [-1, 1]
    assert all(1 <= r["rnk"] <= 3 for r in out)
    assert all(-1.0001 <= r["cos_micro"] / 1e6 <= 1.0001 for r in out)


def test_ivf_flat_invariants_and_recall_floor(spark, sf_dir):
    from enexory_parquet_export_spark.operators.similarity import ivf_flat_topk
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_flat_topk(emb, k=3, centroid_stride=7, nprobe=2).collect()
    assert out, "IVF produced no neighbors"
    assert all(r["vec_id"] != r["nbr_id"] for r in out)
    assert all(1 <= r["rnk"] <= 3 for r in out)
    assert all(-1_000_001 <= r["cos_micro"] <= 1_000_001 for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r["vec_id"], []).append((r["rnk"], r["cos_micro"]))
    for ranked in by_q.values():
        ranked.sort()
        sims = [s for _, s in ranked]
        assert sims == sorted(sims, reverse=True)  # rank order = cos order


def test_ivf_flat_codebook_cache_value_identity(spark, sf_dir):
    """The session-scoped coarse-quantizer cache (cache_key=...) must
    be value-invisible and actually reused on repeat calls."""
    from enexory_parquet_export_spark.operators import similarity as S
    emb = load_table(spark, sf_dir, "embeddings")
    S._IVF_CODEBOOKS.clear()
    try:
        plain = sorted(map(tuple, S.ivf_flat_topk(
            emb, k=3, centroid_stride=7, nprobe=2).collect()))
        cached = sorted(map(tuple, S.ivf_flat_topk(
            emb, k=3, centroid_stride=7, nprobe=2,
            cache_key="test-ivf").collect()))
        assert cached == plain
        assert len(S._IVF_CODEBOOKS) == 1
        hit = next(iter(S._IVF_CODEBOOKS.values()))
        again = sorted(map(tuple, S.ivf_flat_topk(
            emb, k=3, centroid_stride=7, nprobe=2,
            cache_key="test-ivf").collect()))
        assert again == plain
        assert next(iter(S._IVF_CODEBOOKS.values())) is hit  # pure hit
        # distinct parameters must not share a codebook entry
        S.ivf_flat_topk(emb, k=3, centroid_stride=9, nprobe=2,
                        cache_key="test-ivf").collect()
        assert len(S._IVF_CODEBOOKS) == 2
    finally:
        S._IVF_CODEBOOKS.clear()


def test_ivf_flat_chunked_path_identical(spark, sf_dir):
    """Hot-list chunking (max_block < corpus) must be result-invariant:
    the (cid, qchunk, mchunk) spread visits every (qid, nbr) pair
    exactly once, so the fused single-pass assignment (r8) + chunked
    rerank must reproduce the unchunked output byte-for-byte."""
    from enexory_parquet_export_spark.operators.similarity import ivf_flat_topk
    emb = load_table(spark, sf_dir, "embeddings")
    plain = sorted(map(tuple, ivf_flat_topk(
        emb, k=3, centroid_stride=7, nprobe=2).collect()))
    chunked = sorted(map(tuple, ivf_flat_topk(
        emb, k=3, centroid_stride=7, nprobe=2, max_block=5).collect()))
    assert plain == chunked


def test_ivf_probe_suite_matches_all_n_restricted(spark, sf_dir):
    """The probe-suite entry point (the production ANN query shape —
    r12 crossover watch item) must equal the all-N operator restricted
    to the probe ids: same shared index, same scoring folds, same
    tie-breaks — on BOTH the unchunked and the hot-list-chunked path,
    and with the cached index serving both workloads."""
    from enexory_parquet_export_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    probe_ids = [r["vec_id"] for r in
                 emb.select("vec_id").orderBy("vec_id").collect()][::7]
    probes = [(r["vec_id"], list(r["embedding"]))
              for r in emb.filter(F.col("vec_id").isin(probe_ids))
                          .select("vec_id", "embedding").collect()]
    for mb in (4096, 5):          # unchunked + chunked
        full = sorted(map(tuple, S.ivf_flat_topk(
            emb, k=3, centroid_stride=7, nprobe=2,
            max_block=mb).collect()))
        want = [t for t in full if t[0] in set(probe_ids)]
        got = sorted(map(tuple, S.ivf_flat_probe_topk(
            emb, probes, k=3, centroid_stride=7, nprobe=2,
            max_block=mb).collect()))
        assert got == want, f"probe-suite mismatch at max_block={mb}"
    # shared-index contract: one cache_key serves both entry points
    S._IVF_CODEBOOKS.clear()
    try:
        S.ivf_flat_topk(emb, k=3, centroid_stride=7, nprobe=2,
                        max_block=5, cache_key="t-probe").collect()
        n_keys = len(S._IVF_CODEBOOKS)
        got = sorted(map(tuple, S.ivf_flat_probe_topk(
            emb, probes, k=3, centroid_stride=7, nprobe=2,
            max_block=5, cache_key="t-probe").collect()))
        assert len(S._IVF_CODEBOOKS) == n_keys, \
            "probe suite must HIT the all-N index, not key new state"
        full = sorted(map(tuple, S.ivf_flat_topk(
            emb, k=3, centroid_stride=7, nprobe=2,
            max_block=5).collect()))
        assert got == [t for t in full if t[0] in set(probe_ids)]
    finally:
        S._IVF_CODEBOOKS.clear()


# ---------------------------------------------------------------------------
# Property-based: the PPJoin prefix/length/positional pruning must be
# LOSSLESS — on ANY corpus, ngram_jaccard_pairs returns exactly the
# pairs a brute-force shingle-set Jaccard finds above threshold, with
# identical micro-unit scores.  Hypothesis drives token overlap, doc
# length (including sub-shingle docs), duplicate docs, and threshold.
# ---------------------------------------------------------------------------
import math  # noqa: E402
from itertools import combinations  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402

from enexory_parquet_export_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)

_doc = st.lists(st.sampled_from("abcd"), min_size=0, max_size=8)
_corpus = st.lists(_doc, min_size=2, max_size=7)


def _brute(doc_tokens, t, n=3):
    sh = {i: {" ".join(tk[j:j + n]) for j in range(len(tk) - n + 1)}
          if len(tk) >= n else set()
          for i, tk in enumerate(doc_tokens)}
    out = {}
    for a, b in combinations(sorted(sh), 2):
        A, B = sh[a], sh[b]
        if not A or not B:
            continue
        inter = len(A & B)
        j = inter / (len(A) + len(B) - inter)
        if j >= t:
            out[(a, b)] = math.floor(j * 1e6)
    return out


@settings(max_examples=6, deadline=None, derandomize=True)
@given(_corpus, st.sampled_from([0.4, 0.6, 0.8]))
def test_ppjoin_lossless_property(spark, corpus, threshold):
    docs = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(corpus)],
        "doc_id bigint, text string")
    got = {(r["id_a"], r["id_b"]): r["jac_micro"]
           for r in ngram_jaccard_pairs(docs,
                                        threshold=threshold).collect()}
    assert got == _brute(corpus, threshold)


def test_ann_bucket_cap_bounds_and_subset(spark, sf_dir):
    from enexory_parquet_export_spark.operators.similarity import (
        ann_lsh_topk,
        lsh_bucket_udf,
        lsh_planes,
    )
    from enexory_parquet_export_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    # pick a cap below the largest bucket so truncation actually bites
    src = emb.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v")) \
             .withColumn("_blk", lsh_bucket_udf(lsh_planes(4, 64))("v"))
    sizes = {r["_blk"]: r["n"] for r in
             src.groupBy("_blk").agg(F.count("*").alias("n")).collect()}
    cap = max(sizes.values()) // 2
    assert cap >= 1

    capped = ann_lsh_topk(emb, k=3, n_planes=4, bucket_cap=cap).collect()
    full = {(r["vec_id"], r["nbr_id"]): r["cos_micro"]
            for r in ann_lsh_topk(emb, k=3, n_planes=4).collect()}
    # survivors per bucket = the cap lowest vec_ids — recompute and
    # check every capped pair is between survivors and scores agree
    # with the uncapped run (the rerank math is untouched)
    from pyspark.sql import Window
    surv = {r["vec_id"] for r in
            src.withColumn("_r", F.row_number().over(
                Window.partitionBy("_blk").orderBy("vec_id")))
               .filter(F.col("_r") <= cap).collect()}
    assert capped, "capped run must still produce neighbors"
    for r in capped:
        assert r["vec_id"] in surv and r["nbr_id"] in surv
        if (r["vec_id"], r["nbr_id"]) in full:
            assert full[(r["vec_id"], r["nbr_id"])] == r["cos_micro"]


def test_ivf_codebook_capped(spark, sf_dir):
    """The coarse-quantizer collect must be O(codebook_cap), not
    O(N/stride): with a cap smaller than N/stride the stride widens so
    at most ~cap centroids are materialized (VERDICT r2)."""
    from enexory_parquet_export_spark.operators.similarity import (
        effective_stride,
        ivf_flat_topk,
    )

    assert effective_stride(500, 17, 4096) == 17          # cap not binding
    assert effective_stride(10_000_000, 17, 4096) == 2442  # widened
    assert 10_000_000 // effective_stride(10_000_000, 17, 4096) <= 4096
    assert effective_stride(10**12, 17, 4096) >= 10**12 // 4097

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cap = 5
    out = ivf_flat_topk(emb, k=2, centroid_stride=1, nprobe=2,
                        codebook_cap=cap)
    # every pr=1 list id is a centroid vec_id: distinct cids ≤ ~cap
    stride = effective_stride(n, 1, cap)
    n_cent = len([i for i in range(n) if i % stride == 0])
    assert n_cent <= cap + 1
    assert out.count() > 0


def _sem_input(spark, n=60, dim=8, seed=7):
    """Deterministic BIGINT-quantized vectors with planted near-dup
    twins (scaled copies — cosine-invariant, the x97 fixture idiom)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rng.randint(-1000, 1000) for _ in range(dim)]
        if all(x == 0 for x in v):
            v[0] = 1
        rows.append((i, v))
        if i % 5 == 0:                       # twin: exact scaled copy
            rows.append((i + 10_000, [x * 2 for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, qv array<bigint>")
    return df.withColumn("nv", F.aggregate(
        "qv", F.lit(0).cast("bigint"), lambda a, x: a + x * x))


def _sem_brute(rows, k, thresh):
    """Driver-side reference: same codebook/assignment/score rules."""
    import math

    rows = sorted(rows, key=lambda r: r[0])
    cents = [r[1] for r in rows[:k]]
    out = []
    asg = {}
    for vid, qv, nv in rows:
        dds = [(sum((x - c) ** 2 for x, c in zip(qv, cv)), cid)
               for cid, cv in enumerate(cents)]
        asg[vid] = (min(dds)[1], qv, nv)
    for (ida, (ca, qa, na)) in asg.items():
        for (idb, (cb, qb, nb)) in asg.items():
            if ida < idb and ca == cb:
                dot = sum(x * y for x, y in zip(qa, qb))
                cm = math.floor((dot * 1e6) / (math.sqrt(na) * math.sqrt(nb)))
                if cm >= thresh:
                    out.append((ca, ida, idb, cm))
    return sorted(out)


def test_semantic_dedup_matches_bruteforce(spark):
    from enexory_parquet_export_spark.operators.similarity import (
        semantic_dedup,
    )

    df = _sem_input(spark)
    rows = [(r["vec_id"], r["qv"], r["nv"]) for r in df.collect()]
    want = _sem_brute(rows, k=4, thresh=995_000)
    got = sorted(tuple(r) for r in semantic_dedup(
        df, k_clusters=4, thresh_micro=995_000).collect())
    assert got == want
    # every planted twin pair must be found (cos == 1 ⇒ micro 1e6 or
    # 999999 after floor; ≥ threshold either way)
    found = {(a, b) for _, a, b, _ in got}
    assert all((i, i + 10_000) in found for i in range(0, 60, 5))


def test_semantic_dedup_chunked_value_identical(spark):
    """Hot-cluster chunking (max_block smaller than every cluster)
    must reproduce the bare per-cluster kernel exactly — every pair
    meets once, whichever chunk pair it lands in."""
    from enexory_parquet_export_spark.operators.similarity import (
        semantic_dedup,
    )

    df = _sem_input(spark, n=80)
    base = sorted(tuple(r) for r in semantic_dedup(
        df, k_clusters=3, thresh_micro=900_000).collect())
    chunked = sorted(tuple(r) for r in semantic_dedup(
        df, k_clusters=3, thresh_micro=900_000, max_block=7).collect())
    assert chunked == base
    assert len(base) > 0


def test_semantic_dedup_cache_value_identity(spark):
    """The session-scoped SemDeDup trained-state cache (r10 VERDICT
    #5) must be value-invisible on BOTH shapes — the codebook-only
    unchunked path and the chunked path whose cached value is the
    materialized assignment index — and actually reused on repeat
    calls.  thresh_micro is kernel state, not index state: a second
    threshold must reuse the same entries."""
    from enexory_parquet_export_spark.operators import similarity as S

    df = _sem_input(spark, n=80)
    S._SEM_ARTIFACTS.clear()
    try:
        # unchunked: cache holds (n_rows, C, cn2) only
        plain = sorted(tuple(r) for r in S.semantic_dedup(
            df, k_clusters=3, thresh_micro=900_000).collect())
        cached = sorted(tuple(r) for r in S.semantic_dedup(
            df, k_clusters=3, thresh_micro=900_000,
            cache_key="t-sem").collect())
        assert cached == plain
        assert len(S._SEM_ARTIFACTS) == 1
        hit = next(iter(S._SEM_ARTIFACTS.values()))
        again = sorted(tuple(r) for r in S.semantic_dedup(
            df, k_clusters=3, thresh_micro=900_000,
            cache_key="t-sem").collect())
        assert again == plain
        assert next(iter(S._SEM_ARTIFACTS.values())) is hit  # pure hit
        # a different threshold reuses the SAME trained index
        S.semantic_dedup(df, k_clusters=3, thresh_micro=999_999,
                         cache_key="t-sem").collect()
        assert len(S._SEM_ARTIFACTS) == 1

        # chunked (max_block < corpus): the assignment index caches too
        S._SEM_ARTIFACTS.clear()
        pchunk = sorted(tuple(r) for r in S.semantic_dedup(
            df, k_clusters=3, thresh_micro=900_000,
            max_block=7).collect())
        cchunk = sorted(tuple(r) for r in S.semantic_dedup(
            df, k_clusters=3, thresh_micro=900_000, max_block=7,
            cache_key="t-sem").collect())
        assert cchunk == pchunk == plain
        asg_keys = [k for k in S._SEM_ARTIFACTS if "asg" in k]
        assert len(asg_keys) == 1, "chunking must cache the assignment"
        a_hit = S._SEM_ARTIFACTS[asg_keys[0]]
        again2 = sorted(tuple(r) for r in S.semantic_dedup(
            df, k_clusters=3, thresh_micro=900_000, max_block=7,
            cache_key="t-sem").collect())
        assert again2 == plain
        assert S._SEM_ARTIFACTS[asg_keys[0]] is a_hit      # pure hit
        # distinct k_clusters must never share trained state
        S.semantic_dedup(df, k_clusters=4, thresh_micro=900_000,
                         cache_key="t-sem").collect()
        assert len([k for k in S._SEM_ARTIFACTS
                    if "asg" not in k]) == 2
    finally:
        S._SEM_ARTIFACTS.clear()


def test_pq_artifact_cache_value_identity(spark, sf_dir):
    """The session-scoped PQ trained-state cache (r10 VERDICT #3) must
    be value-invisible for all four artifacts — codebooks, coarse
    centroids, and both encoded index relations — and the encoded keys
    must fingerprint the codebook VALUES: a different codebook under
    the same cache_key must never serve stale codes."""
    import numpy as np

    from enexory_parquet_export_spark.operators import similarity as S

    q = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .select("vec_id",
                 F.transform(F.col("embedding").cast("array<double>"),
                             lambda x: F.floor(x * 1000).cast("bigint"))
                  .alias("qv")))
    probes = [(r["vec_id"], list(r["qv"]))
              for r in q.filter(F.col("vec_id") % 11 == 0).collect()]
    S._PQ_ARTIFACTS.clear()
    try:
        cb_plain = S.pq_codebooks(q, n_codes=4, n_sub=4)
        cb = S.pq_codebooks(q, n_codes=4, n_sub=4, cache_key="t-pq")
        assert np.array_equal(cb, cb_plain)
        assert S.pq_codebooks(q, n_codes=4, n_sub=4,
                              cache_key="t-pq") is cb      # pure hit
        co_plain = np.array(
            [r["qv"] for r in q.orderBy("vec_id").limit(4).collect()],
            dtype=np.float64)
        co = S.coarse_codebook(q, n=4, cache_key="t-pq")
        assert np.array_equal(co, co_plain)
        assert S.coarse_codebook(q, n=4, cache_key="t-pq") is co

        adc_plain = sorted(tuple(r) for r in S.pq_adc_topk(
            q, probes, codebooks=cb, k=3).collect())
        adc_cached = sorted(tuple(r) for r in S.pq_adc_topk(
            q, probes, codebooks=cb, k=3, cache_key="t-pq").collect())
        assert adc_cached == adc_plain
        enc_keys = [k for k in S._PQ_ARTIFACTS if k[1] == "pq_enc"]
        assert len(enc_keys) == 1
        assert sorted(tuple(r) for r in S.pq_adc_topk(
            q, probes, codebooks=cb, k=3,
            cache_key="t-pq").collect()) == adc_plain
        assert len([k for k in S._PQ_ARTIFACTS
                    if k[1] == "pq_enc"]) == 1              # pure hit

        ivf_plain = sorted(tuple(r) for r in S.ivf_pq_topk(
            q, probes, coarse=co, codebooks=cb, nprobe=2, k=3).collect())
        ivf_cached = sorted(tuple(r) for r in S.ivf_pq_topk(
            q, probes, coarse=co, codebooks=cb, nprobe=2, k=3,
            cache_key="t-pq").collect())
        assert ivf_cached == ivf_plain

        # stale-state guard: a DIFFERENT codebook under the SAME key
        # must key a fresh encoded relation and return ITS values
        cb2 = S.pq_codebooks(q, n_codes=8, n_sub=4)
        adc2_plain = sorted(tuple(r) for r in S.pq_adc_topk(
            q, probes, codebooks=cb2, k=3).collect())
        adc2_cached = sorted(tuple(r) for r in S.pq_adc_topk(
            q, probes, codebooks=cb2, k=3, cache_key="t-pq").collect())
        assert adc2_cached == adc2_plain != adc_plain
        assert len([k for k in S._PQ_ARTIFACTS
                    if k[1] == "pq_enc"]) == 2
    finally:
        S._PQ_ARTIFACTS.clear()


def test_pq_adc_topk_matches_numpy_reference(spark, sf_dir):
    """pq_adc_topk's two-pass (encode → local-top-k scan → global
    window) plan must equal a single-process numpy ADC over the same
    collected corpus — including the partition-local TopK pushdown
    (any dropped local candidate must be outside the global top-k),
    the self-exclusion rule, and (adc_dist, vec_id) tie order."""
    import numpy as np

    from enexory_parquet_export_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
    )

    q = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .select("vec_id",
                 F.transform(F.col("embedding").cast("array<double>"),
                             lambda x: F.floor(x * 1000).cast("bigint"))
                  .alias("qv")))
    cb = pq_codebooks(q, n_codes=4, n_sub=4)
    rows = sorted((r["vec_id"], list(r["qv"])) for r in q.collect())
    probes = [rows[i] for i in range(0, len(rows), 7)]

    got = sorted(tuple(r) for r in
                 pq_adc_topk(q, probes, codebooks=cb, k=3)
                 .repartition(8).collect())

    ids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.array([r[1] for r in rows], dtype=np.float64)
    n_sub, n_codes, d_sub = cb.shape
    X = Q.reshape(len(Q), n_sub, d_sub)
    cn2 = (cb * cb).sum(axis=2)
    dd = ((X * X).sum(axis=2)[:, :, None]
          - 2.0 * np.einsum("psd,scd->psc", X, cb) + cn2[None, :, :])
    codes = np.argmin(dd, axis=2)
    want = []
    for pid, pqv in probes:
        p = np.asarray(pqv, dtype=np.float64).reshape(n_sub, d_sub)
        lut = ((p * p).sum(axis=1)[:, None]
               - 2.0 * np.einsum("sd,scd->sc", p, cb) + cn2)
        adc = lut[np.arange(n_sub)[None, :], codes].sum(axis=1)
        order = sorted((int(adc[i]), int(ids[i]))
                       for i in range(len(ids)) if ids[i] != pid)
        for rnk, (d, v) in enumerate(order[:3], start=1):
            want.append((pid, v, d, rnk))
    assert got == sorted(want)
    assert len(got) == 3 * len(probes)


def test_ivf_pq_full_probe_equals_flat_pq_scan(spark, sf_dir):
    """With nprobe = every coarse list, IVF-PQ must return EXACTLY the
    flat PQ-ADC top-k (coarse routing changes which vectors are
    scanned, never their ADC distance) — pins the routing, the
    per-list kernel, and the merge window against the already
    reference-pinned pq_adc_topk.  A decimated nprobe must return a
    per-probe subset of the flat scan's candidate distances or worse,
    never better (IVF trades recall, not correctness)."""
    import numpy as np

    from enexory_parquet_export_spark.operators.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
        pq_codebooks,
    )

    q = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .select("vec_id",
                 F.transform(F.col("embedding").cast("array<double>"),
                             lambda x: F.floor(x * 1000).cast("bigint"))
                  .alias("qv")))
    n_coarse = 4
    coarse = np.array([r["qv"] for r in
                       q.orderBy("vec_id").limit(n_coarse).collect()],
                      dtype=np.float64)
    cb = pq_codebooks(q, n_codes=4, n_sub=4)
    probes = [(r["vec_id"], list(r["qv"]))
              for r in q.filter(F.col("vec_id") % 11 == 0).collect()]

    flat = sorted(tuple(r) for r in
                  pq_adc_topk(q, probes, codebooks=cb, k=3).collect())
    full = sorted(tuple(r) for r in
                  ivf_pq_topk(q, probes, coarse=coarse, codebooks=cb,
                              nprobe=n_coarse, k=3).collect())
    assert full == flat and len(flat) == 3 * len(probes)

    part = {(r["probe_id"], r["rnk"]): r["adc_dist"] for r in
            ivf_pq_topk(q, probes, coarse=coarse, codebooks=cb,
                        nprobe=1, k=3).collect()}
    best = {(r[0], r[3]): r[2] for r in flat}
    for key, d in part.items():
        assert d >= best.get(key, -1)       # recall trade, never better


def test_pq_probe_dataframe_path_equals_list_path(spark, sf_dir):
    """r9 (VERDICT #3): the DataFrame probe paths must be
    value-identical to the bounded list paths — pq_adc_topk's guarded
    limit(cap+1) collect, and ivf_pq_topk's DISTRIBUTED route/LUT/
    cogroup pipeline (nothing probe-sized on the driver).  The cap
    guard must raise loudly past the bounded-suite contract."""
    import numpy as np
    import pytest

    from enexory_parquet_export_spark.operators.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
        pq_codebooks,
    )

    q = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .select("vec_id",
                 F.transform(F.col("embedding").cast("array<double>"),
                             lambda x: F.floor(x * 1000).cast("bigint"))
                  .alias("qv")))
    n_coarse = 4
    coarse = np.array([r["qv"] for r in
                       q.orderBy("vec_id").limit(n_coarse).collect()],
                      dtype=np.float64)
    cb = pq_codebooks(q, n_codes=4, n_sub=4)
    probes_df = (q.filter(F.col("vec_id") % 11 == 0)
                 .select(F.col("vec_id").alias("probe_id"), "qv"))
    probes = [(r["probe_id"], list(r["qv"])) for r in probes_df.collect()]

    adc_list = sorted(tuple(r) for r in
                      pq_adc_topk(q, probes, codebooks=cb, k=3).collect())
    adc_df = sorted(tuple(r) for r in
                    pq_adc_topk(q, probes_df, codebooks=cb, k=3).collect())
    assert adc_df == adc_list and len(adc_list) == 3 * len(probes)

    ivf_list = sorted(tuple(r) for r in
                      ivf_pq_topk(q, probes, coarse=coarse, codebooks=cb,
                                  nprobe=2, k=3).collect())
    ivf_df = sorted(tuple(r) for r in
                    ivf_pq_topk(q, probes_df.repartition(8), coarse=coarse,
                                codebooks=cb, nprobe=2, k=3).collect())
    assert ivf_df == ivf_list and len(ivf_list) > 0

    # the bounded-suite contract is loud, both input forms
    with pytest.raises(ValueError, match="bounded-suite"):
        pq_adc_topk(q, probes_df, codebooks=cb, k=3,
                    probe_cap=len(probes) - 1).collect()
    with pytest.raises(ValueError, match="bounded-suite"):
        pq_adc_topk(q, probes, codebooks=cb, k=3,
                    probe_cap=len(probes) - 1)


def test_semdedup_batch_uncapped_equals_semantic_dedup(spark, sf_dir):
    """With cluster_cap ≥ corpus, the ingest twin's event set (every
    arrival × every EARLIER admitted member) is exactly the full
    within-cluster triangle — so it must equal semantic_dedup's pairs
    under (id_a, id_b) = (min, max) renaming, same codebook, same
    threshold.  Cross-pins the streaming family's batch anchor against
    the independently oracle-verified x97 operator (including the two
    paths' independent quantize/assign kernels)."""
    from enexory_parquet_export_spark.operators.similarity import (
        semantic_dedup,
    )
    from enexory_parquet_export_spark.streaming.semdedup_stream import (
        quantize_codebook,
        semdedup_batch,
    )

    base = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id",
                    F.col("embedding").cast("array<double>")
                     .alias("embedding")))
    # scaled twins guarantee pairs above the threshold (cos = 1)
    twins_df = base.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                           F.transform("embedding", lambda x: x * 1.1)
                            .alias("embedding"))
    vecs = base.unionByName(twins_df)
    k_clusters, thresh = 3, 900_000
    cb = quantize_codebook(vecs, k_clusters=k_clusters)

    twin = {(min(a, b), max(a, b), cm) for a, b, cm in
            semdedup_batch(vecs, cb, thresh_micro=thresh,
                           cluster_cap=10_000_000).collect()}

    q = (vecs.select("vec_id",
                     F.transform("embedding", lambda x:
                                 F.floor(x * 1000).cast("bigint"))
                      .alias("qv"))
             .withColumn("nv", F.aggregate(
                 "qv", F.lit(0).cast("bigint"), lambda a, x: a + x * x)))
    full = {(r["id_a"], r["id_b"], r["cos_micro"]) for r in
            semantic_dedup(q, k_clusters=k_clusters,
                           thresh_micro=thresh).collect()}
    assert twin == full and len(full) > 0


def test_exploded_shingle_hashes_matches_string_shingles(spark):
    """The zero-shuffle hashed-shingle build (r8, x55/x85) must agree
    with the string-shingle window build on every per-doc distinct
    SET relation: same shingle count per doc, and two docs share a
    shingle string iff they share a shingle hash (64-bit collisions
    aside).  Includes sub-shingle docs, duplicate shingles inside one
    doc, irregular whitespace, and identical docs."""
    rows = [
        (1, "a b c d e"),
        (2, "a b c a b c a b"),          # internal duplicate shingles
        (3, "  a   b    c "),            # irregular whitespace
        (4, "x y"),                      # sub-shingle: no rows
        (5, "a b c d e"),                # exact twin of doc 1
        (6, ""),                         # empty
    ]
    df = docs_df(spark, rows)
    hashed = (D._exploded_shingle_hashes(df, id_col="doc_id",
                                         text_col="text", shingle_n=3)
              .distinct())
    strings = (D._exploded_shingles(df, id_col="doc_id", text_col="text",
                                    shingle_n=3, distinct=True))
    hs = {}
    for r in hashed.collect():
        hs.setdefault(r["doc_id"], set()).add(r["h"])
    ss = {}
    for r in strings.collect():
        ss.setdefault(r["doc_id"], set()).add(r["s"])
    assert set(hs) == set(ss)            # same docs yield shingles
    for d in ss:
        assert len(hs[d]) == len(ss[d]), d
    # shared-set relations agree pairwise
    docs = sorted(ss)
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            assert (len(ss[a] & ss[b])
                    == len(hs[a] & hs[b])), (a, b)
    # r9: the in-row distinct variant (array_distinct before the
    # explode — no exchange) must emit exactly the distinct set of
    # the plain build, already deduped per (doc, h)
    inrow = (D._exploded_shingle_hashes(df, id_col="doc_id",
                                        text_col="text", shingle_n=3,
                                        distinct_in_row=True))
    rows_inrow = [(r["doc_id"], r["h"]) for r in inrow.collect()]
    assert len(rows_inrow) == len(set(rows_inrow))   # no dups emitted
    assert set(rows_inrow) == {(d, h) for d, s in hs.items() for h in s}


def test_decontaminate_containment_match_bruteforce(spark):
    """The r9 operator APIs (decontaminate / containment) against a
    pure-Python shingle-set reference on a corpus exercising every
    branch: exact contamination, partial overlap below/above k and
    the threshold, sub-shingle docs, duplicate probes (class
    collapse + multiplicity), and a stop-shingle above the df cap."""
    base = "the quick brown fox jumps over the lazy dog tonight"
    hot = " ".join(f"w{i % 2}" for i in range(6))    # shared boilerplate
    corpus_rows = [
        (1, base + " extra tail words here"),        # contaminated
        (2, base),                                   # exact probe copy
        (3, "totally different text with no overlap at all right"),
        (4, "the quick brown cat sits under the lazy dog tonight"),
        (5, "xx yy"),                                # sub-shingle
        (6, hot + " unique6 suffix6 token6"),
        (7, hot + " unique7 suffix7 token7"),
    ]
    probe_rows = [(100, base), (101, base),          # duplicate class
                  (102, "another probe body entirely distinct from corpus")]
    corpus = docs_df(spark, corpus_rows)
    probes = (docs_df(spark, probe_rows)
              .select(F.col("doc_id").alias("probe_id"), "text"))
    k, cap_min, cap_div = 3, 2, 2   # df cap = max(2, 7//2) = 3

    def sh(text):
        t = text.split()
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    csh = {d: sh(t) for d, t in corpus_rows}
    psh = {p: sh(t) for p, t in probe_rows}
    dfreq = {}
    for s in (s for ss in csh.values() for s in ss):
        dfreq[s] = dfreq.get(s, 0) + 1
    cap = max(cap_min, len(corpus_rows) // cap_div)
    kept = {d: {s for s in ss if dfreq[s] <= cap} for d, ss in csh.items()}

    want_dec = {}
    for d, ss in kept.items():
        hits = {p: len(ss & ps) for p, ps in psh.items()}
        hits = {p: n for p, n in hits.items() if n >= k}
        if hits:
            want_dec[d] = (len(hits), max(hits.values()))
    got_dec = {r["doc_id"]: (r["n_probes_hit"], r["max_shared"])
               for r in D.decontaminate(corpus, probes, k=k,
                                        df_cap_min=cap_min,
                                        df_cap_div=cap_div).collect()}
    assert got_dec == want_dec and 1 in want_dec and 2 in want_dec
    assert want_dec[1][0] == 2        # duplicate probes both counted

    thresh = 600_000
    want_cont = {}
    for p, ps in psh.items():
        for d, ss in kept.items():
            shr = len(ss & ps)
            cont = shr * 1_000_000 / len(ps) if ps else 0
            if ps and cont >= thresh:
                want_cont[(p, d)] = int(cont)
    got_cont = {(r["snip_id"], r["doc_id"]): r["cont_micro"]
                for r in D.containment(corpus, probes.withColumnRenamed(
                    "probe_id", "snip_id"), thresh_micro=thresh,
                    df_cap_min=cap_min, df_cap_div=cap_div).collect()}
    assert got_cont == want_cont and len(want_cont) >= 4
