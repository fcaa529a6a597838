"""Edge-case fixtures for the newest declared queries (round-3 verdict
item 8): branches the sf fixtures never reach.

- x81's degenerate dimension (``mn == mx`` → qv must be 0, not a
  divide-by-zero NaN) — the sf embeddings have no constant dimension.
- x77's bucket boundary: the two-level prefix sum partitions doc_ids
  into ``_PACK_BUCKET``-wide buckets, but sf0.001–0.1 fixtures hold
  < 10 000 docs, so the cross-bucket offset path (and empty-bucket
  gaps) never executes there.
- x80's 1-token document (round-3 advice): ``sequence(1, 0)`` steps
  backwards in Spark, so an unguarded plan throws at runtime while the
  oracle emits zero bigrams.

Each test writes a tiny parquet table into a tmp dir shaped exactly
like a fixture dir and calls the DECLARED query black-box — the same
code path the driver exercises, no internals duplicated.
"""

from __future__ import annotations

import pytest

from enexory_parquet_export_spark import queries_ext as qx


def _write(spark, tmp_path, name, rows, schema) -> str:
    (spark.createDataFrame(rows, schema)
     .coalesce(1).write.mode("overwrite")
     .parquet(str(tmp_path / f"{name}.parquet")))
    return str(tmp_path)


def test_x81_degenerate_constant_dimension(spark, tmp_path):
    # dim 0 is constant across the corpus (mn == mx): every quantized
    # value must be exactly 0, never NaN/divide-by-zero; dim 1 varies.
    rows = [(0, [5.0, 0.0], 1), (1, [5.0, 1.0], 1), (2, [5.0, 2.0], 1)]
    d = _write(spark, tmp_path, "embeddings", rows,
               "vec_id bigint, embedding array<float>, label int")
    out = {r["vec_id"]: r for r in
           qx.SPARK_QUERIES["x81_embedding_quantize"](spark, d).collect()}
    # q_first is dim 0 → the degenerate branch → 0 for every vector
    assert [out[i]["q_first"] for i in (0, 1, 2)] == [0, 0, 0]
    # dim 1 spans [0, 2] → quantized 0 / 127 / 255
    assert [out[i]["q_max"] for i in (0, 1, 2)] == [0, 127, 255]
    assert all(out[i]["dims"] == 2 for i in (0, 1, 2))


def test_x81_single_vector_all_dims_degenerate(spark, tmp_path):
    # one vector: every dimension has mn == mx == x → all-zero output
    d = _write(spark, tmp_path, "embeddings", [(7, [3.5, -1.0, 0.0], 0)],
               "vec_id bigint, embedding array<float>, label int")
    row = qx.SPARK_QUERIES["x81_embedding_quantize"](spark, d).collect()[0]
    assert (row["q_sum"], row["q_min"], row["q_max"], row["q_first"]) \
        == (0, 0, 0, 0)


def _doc(doc_id: int, n_tokens: int):
    return (doc_id, " ".join("w" for _ in range(n_tokens)),
            "en", "synth", 2 * n_tokens - 1)


def test_x77_token_run_crosses_pack_bucket_edge(spark, tmp_path):
    """Docs on both sides of the 10 000-doc_id bucket edge, with a full
    empty-bucket gap before the next occupied bucket: the cross-bucket
    offset join must reproduce the single-window global prefix sum."""
    cap, bucket = qx._PACK_C, qx._PACK_BUCKET
    docs = [
        _doc(bucket - 2, 100),       # last-but-one id of bucket 0
        _doc(bucket - 1, 200),       # last id of bucket 0
        _doc(bucket, 300),           # first id of bucket 1
        _doc(bucket + 1, 57),
        _doc(3 * bucket + 5, 40),    # bucket 3 — bucket 2 entirely empty
    ]
    d = _write(spark, tmp_path, "documents", docs,
               "doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")
    got = {r["doc_id"]: r for r in
           qx.SPARK_QUERIES["x77_sequence_pack"](spark, d).collect()}
    # oracle: plain running start positions in doc_id order
    start, expect = 0, {}
    for doc_id, text, *_ in docs:
        n = len(text.split(" "))
        expect[doc_id] = (start, start // cap, start % cap,
                          (start + n - 1) // cap - start // cap + 1)
        start += n
    for doc_id, (_, bin_first, bin_offset, spanned) in expect.items():
        r = got[doc_id]
        assert (r["bin_first"], r["bin_offset"], r["bins_spanned"]) \
            == (bin_first, bin_offset, spanned), f"doc {doc_id}"


def test_x77_doc_ending_exactly_at_bin_edge(spark, tmp_path):
    # 256 tokens fill bin 0 exactly: bins_spanned == 1, and the next
    # doc starts at offset 0 of bin 1 (no off-by-one at the capacity)
    cap = qx._PACK_C
    d = _write(spark, tmp_path, "documents",
               [_doc(0, cap), _doc(1, 1)],
               "doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")
    got = {r["doc_id"]: r for r in
           qx.SPARK_QUERIES["x77_sequence_pack"](spark, d).collect()}
    assert (got[0]["bin_first"], got[0]["bin_offset"],
            got[0]["bins_spanned"]) == (0, 0, 1)
    assert (got[1]["bin_first"], got[1]["bin_offset"],
            got[1]["bins_spanned"]) == (1, 0, 1)


def test_x80_one_token_document_yields_no_bigrams(spark, tmp_path):
    # 'solo' has no space → zero bigram rows for it, not a runtime
    # element_at(ws, 0) error; the two-token doc scores normally
    d = _write(spark, tmp_path, "documents",
               [(0, "solo", "en", "synth", 4),
                (1, "a b", "en", "synth", 3)],
               "doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")
    rows = qx.SPARK_QUERIES["x80_bigram_lm_score"](spark, d).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_bigrams"] == 1 and rows[0]["mean_p_micro"] == 1000000


@pytest.mark.parametrize("n_vec", [30])
def test_x44_require_stride_raises_when_cap_binds(spark, n_vec):
    # require_stride must fail LOUDLY when codebook_cap widens the
    # stride (round-3 advice: the declared oracle hardcodes % 17)
    from enexory_parquet_export_spark.operators.similarity import (
        ivf_flat_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(n_vec)],
        "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="widened the stride"):
        ivf_flat_topk(emb, k=1, centroid_stride=2, nprobe=2,
                      codebook_cap=5, require_stride=2)


def test_x90_uniform_length_collapses_to_top_bin(spark, tmp_path):
    # every doc has the same token count: one CDF step straight to 1.0
    # → a single bin (10) holding the whole corpus, no divide-by-zero
    d = _write(spark, tmp_path, "documents",
               [_doc(i, 7) for i in range(5)],
               "doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")
    rows = qx.SPARK_QUERIES["x90_length_bins"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["bin"], r["n_docs"], r["min_toks"], r["max_toks"],
            r["avg_toks_micro"]) == (10, 5, 7, 7, 7_000_000)


def test_x90_heavy_tie_mass_shares_one_bin(spark, tmp_path):
    # 8 docs of length 1 (80% of the mass) and 2 of length 2: ties
    # share a bin by construction, so the corpus lands in exactly two
    # bins — ceil(0.8*10)=8 and ceil(1.0*10)=10 — with gaps elsewhere
    # (the behavior ntile(10) cannot reproduce deterministically).
    docs = [_doc(i, 1) for i in range(8)] + [_doc(8, 2), _doc(9, 2)]
    d = _write(spark, tmp_path, "documents", docs,
               "doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")
    got = {r["bin"]: r for r in
           qx.SPARK_QUERIES["x90_length_bins"](spark, d).collect()}
    assert sorted(got) == [8, 10]
    assert (got[8]["n_docs"], got[8]["min_toks"], got[8]["max_toks"]) \
        == (8, 1, 1)
    assert (got[10]["n_docs"], got[10]["avg_toks_micro"]) == (2, 2_000_000)


def test_x91_mad_zero_falls_back_to_any_deviation(spark, tmp_path):
    # >half the docs sit exactly at the median → MAD = 0: the fence
    # 20000*d > 44478*0 degrades to "any deviation is an outlier",
    # consistently on both engines (no divide, no NaN)
    docs = ([_doc(i, 5) for i in range(3)] + [_doc(3, 9)])
    d = _write(spark, tmp_path, "documents", docs,
               "doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")
    r = qx.SPARK_QUERIES["x91_robust_outlier"](spark, d).collect()[0]
    # n_chars = 2n-1: three docs at 9, one at 17 → med2=18, mad4=0
    assert (r["n_docs"], r["med2"], r["mad4"], r["n_outliers"]) \
        == (4, 18, 0, 1)


def test_x91_even_count_half_integer_median(spark, tmp_path):
    # even doc count with distinct central values: median interpolates
    # at .5 — med2 must stay integer-exact (no float drift in the gate)
    docs = [_doc(0, 1), _doc(1, 2), _doc(2, 3), _doc(3, 4)]
    d = _write(spark, tmp_path, "documents", docs,
               "doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")
    r = qx.SPARK_QUERIES["x91_robust_outlier"](spark, d).collect()[0]
    # n_chars = 1,3,5,7 → median 4 → med2 8; d = 6,2,2,6 → mad4 8
    # fence: 20000*d > 44478*8 = 355824 → d > 17.79 → none
    assert (r["n_docs"], r["med2"], r["mad4"], r["n_outliers"]) \
        == (4, 8, 8, 0)


_DOC_SCHEMA = ("doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")


def _duck_docs(sf_dir: str):
    import duckdb
    con = duckdb.connect()
    # Spark writes a part-file directory, not a single file
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    return con


def test_x55_hot_shingle_df_cap(spark, tmp_path):
    """An injected stop-shingle present in EVERY corpus doc (df 41 >
    cap 32) is dropped from the inverted index on both engines: corpus
    docs sharing ONLY boilerplate stay clean, the true contamination
    twin is still flagged on its rare shingles, and the engine/oracle
    outputs stay hash-identical with the cap active (the r4 weak-flag
    fix — one hot key may no longer fan the equi-join out)."""
    probe = ("alpha bravo charlie delta echo foxtrot golf hotel "
             "common boiler plate")
    docs = [(0, probe, "en", "synth", len(probe))]
    for i in range(1, 41):
        t = f"filler{i} junk{i} common boiler plate more{i} stuff{i}"
        docs.append((i, t, "en", "synth", len(t)))
    d = _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    got = sorted((r["doc_id"], r["n_probes_hit"], r["max_shared"])
                 for r in qx.SPARK_QUERIES["x55_decontaminate"](
                     spark, d).collect())
    # only the derived twin of probe doc 0 is flagged: 9 shared
    # shingles minus the capped stop-shingle = 8 ≥ _DECON_K; the 40
    # boilerplate-only corpus docs share nothing after the cap
    assert got == [(1000001, 1, 8)]
    want = sorted(tuple(r) for r in _duck_docs(d).execute(
        qx.ORACLE_SQL["x55_decontaminate"]).fetchall())
    assert got == want


def test_x85_irregular_whitespace_and_hot_shingle(spark, tmp_path):
    """Two r4 advice items at once: (a) leading/double whitespace must
    tokenize identically on both engines (the old oracle split on a
    single literal space and kept empty tokens); (b) a stop-shingle in
    40/41 docs exceeds the df cap, so a snippet made ONLY of
    boilerplate matches nothing while a snippet of rare text still
    scores containment 1.0 — engine and oracle agree exactly."""
    base = ("alpha  bravo charlie  delta echo foxtrot golf hotel "
            "india juliet")
    docs = [(0, " " + base, "en", "synth", len(base))]
    for i in range(1, 41):
        if i == 14:  # snip source (14 % 7 == 0) that is PURE boilerplate
            t = "common boiler plate common boiler plate common boiler plate"
        else:
            t = f"filler{i}  junk{i} common boiler plate  more{i}"
        docs.append((i, t, "en", "synth", len(t)))
    d = _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    got = sorted((r["snip_id"], r["doc_id"], r["cont_micro"])
                 for r in qx.SPARK_QUERIES["x85_containment"](
                     spark, d).collect())
    want = sorted(tuple(r) for r in _duck_docs(d).execute(
        qx.ORACLE_SQL["x85_containment"]).fetchall())
    assert got == want
    # rare-text snippet 0 self-matches at exactly 1.0 despite the
    # irregular whitespace; the boilerplate snippet 14 is suppressed by
    # the cap (2/3 < 0.8 once its hot shingle leaves the index)
    assert got == [(2000000, 0, 1000000)]


# ---- x94 integer-exact k-means ------------------------------------------


def test_x94_kmeans_fewer_points_than_k(spark, tmp_path):
    # 3 distinct vectors < K=8: init yields 3 centroids, every round
    # must survive the "empty cluster id" path without crashing and
    # assignments must be the identity (each point is its own centroid)
    rows = [(0, [0.0, 0.0], 0), (1, [10.0, 0.0], 0), (2, [0.0, 10.0], 0)]
    d = _write(spark, tmp_path, "embeddings", rows,
               "vec_id bigint, embedding array<float>, label int")
    out = {r["vec_id"]: r for r in
           qx.SPARK_QUERIES["x94_kmeans"](spark, d).collect()}
    assert [out[i]["cluster"] for i in (0, 1, 2)] == [0, 1, 2]
    assert [out[i]["dist_q"] for i in (0, 1, 2)] == [0, 0, 0]


def test_x94_kmeans_duplicate_points_tie_break(spark, tmp_path):
    # vec 0 and 1 are identical → centroids 0 and 1 coincide → every
    # equidistant point must deterministically pick the SMALLER cid
    rows = [(0, [1.0, 1.0], 0), (1, [1.0, 1.0], 0), (2, [1.0, 1.0], 0),
            (3, [9.0, 9.0], 0)]
    d = _write(spark, tmp_path, "embeddings", rows,
               "vec_id bigint, embedding array<float>, label int")
    out = {r["vec_id"]: r["cluster"] for r in
           qx.SPARK_QUERIES["x94_kmeans"](spark, d).collect()}
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert out[3] == 3  # its own (identical) centroid, dist 0


# ---- x95 BPE merge induction --------------------------------------------


def _bpe_reference(word_counts: dict, iters: int):
    """Sennrich-style BPE: positional (overlapping) pair counts,
    greedy left-to-right non-overlapping merge, argmax ties broken
    by lexicographic pair."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(iters):
        stats: dict = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] = \
                    stats.get((syms[i], syms[i + 1]), 0) + c
        if not stats:
            break
        (a, b), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_x95_bpe_matches_reference_on_overlap_runs(spark, tmp_path):
    # the adversarial cases the gaps-and-islands parity exists for:
    # - "aaaa"/"aaa": runs of overlapping (a,a) matches → merge ranks
    #   1 and 3 only (string replace would be wrong on "aaa")
    # - "xaab": after 'a a'→'aa', symbol 'aa' next to 'b' must NOT
    #   false-match a later ('a','b') merge mid-symbol
    texts = ["aaaa aaa aaaa ab xaab", "aaaa ab ab xaab aaa",
             "ab aaaa xaab aaa ab"]
    rows = [(i, t, "en", "synth", len(t)) for i, t in enumerate(texts)]
    d = _write(spark, tmp_path, "documents", rows,
               "doc_id bigint, text string, lang string, source string,"
               " n_chars bigint")
    wc: dict = {}
    for t in texts:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1
    want = _bpe_reference(wc, 3)
    got = [(r["left_sym"], r["right_sym"], r["pair_count"])
           for r in qx.SPARK_QUERIES["x95_bpe_merges"](spark, d).collect()]
    assert got == want


def test_x95_bpe_merged_symbol_participates(spark, tmp_path):
    # after merge 1 the MERGED symbol must itself be pair-countable
    # (classic BPE builds multi-char symbols iteratively): corpus is
    # dominated by "abc" so merges go a+b → ab+c
    texts = ["abc abc abc abc", "abc abc abc", "xy"]
    rows = [(i, t, "en", "synth", len(t)) for i, t in enumerate(texts)]
    d = _write(spark, tmp_path, "documents", rows,
               "doc_id bigint, text string, lang string, source string,"
               " n_chars bigint")
    wc = {"abc": 7, "xy": 1}
    want = _bpe_reference(wc, 3)
    got = [(r["left_sym"], r["right_sym"], r["pair_count"])
           for r in qx.SPARK_QUERIES["x95_bpe_merges"](spark, d).collect()]
    assert got == want
    assert got[0][:2] == ("a", "b") and got[1][:2] == ("ab", "c")


def _bpe_reference_vocab(word_counts: dict, iters: int):
    """Final symbol vocabulary with corpus-weighted occurrences after
    the reference merges."""
    merges = _bpe_reference(word_counts, iters)
    # replay merges on a fresh vocab (reference impl mutates its own)
    vocab = {w: list(w) for w in word_counts}
    for a, b, _ in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    counts: dict = {}
    for w, syms in vocab.items():
        for s in syms:
            counts[s] = counts.get(s, 0) + word_counts[w]
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def test_x96_vocab_matches_reference(spark, tmp_path):
    texts = ["aaaa aaa aaaa ab xaab", "aaaa ab ab xaab aaa",
             "ab aaaa xaab aaa ab"]
    rows = [(i, t, "en", "synth", len(t)) for i, t in enumerate(texts)]
    d = _write(spark, tmp_path, "documents", rows,
               "doc_id bigint, text string, lang string, source string,"
               " n_chars bigint")
    wc: dict = {}
    for t in texts:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1
    want = _bpe_reference_vocab(wc, 3)
    got = [(r["token"], r["occurrences"]) for r in
           qx.SPARK_QUERIES["x96_bpe_vocab"](spark, d).collect()]
    assert got == want


def test_x105_vote_signs_and_selection(spark, tmp_path):
    # ct(good)=2 cb=0, ct(bad)=0 cb=1, ct(shared)=1 cb=1; Nt=3 Nb=2 V=3
    # votes: good +1 (3/6 > 1/5), bad -1 (1/6 < 2/5),
    # shared -1 (2/6 < 2/5 — proportionally rarer in target)
    rows = [(0, "good good shared", "en", "s0", 16),
            (1, "bad shared", "de", "s0", 10)]
    d = _write(spark, tmp_path, "documents", rows,
               "doc_id bigint, text string, lang string, source string,"
               " n_chars bigint")
    out = {r["doc_id"]: r for r in
           qx.SPARK_QUERIES["x105_dsir_importance"](spark, d).collect()}
    assert out[0]["score"] == 2 - 1 and out[0]["selected"] is True
    assert out[1]["score"] == -2 and out[1]["selected"] is False
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 2


def test_x105_all_target_corpus_no_division_blowup(spark, tmp_path):
    # Nb = 0: background ratio degrades to 1/V smoothing, never 0/0
    rows = [(0, "a b", "en", "s0", 3), (1, "a", "en", "s0", 1)]
    d = _write(spark, tmp_path, "documents", rows,
               "doc_id bigint, text string, lang string, source string,"
               " n_chars bigint")
    out = {r["doc_id"]: r for r in
           qx.SPARK_QUERIES["x105_dsir_importance"](spark, d).collect()}
    # a: 3/5 > 1/2 -> +1; b: 2/5 < 1/2 -> -1
    assert out[0]["score"] == 0 and out[1]["score"] == 1


def test_x106_apportionment_exact_and_sqrt_damped(spark, tmp_path):
    # src a: 9 docs (w=3000), src b: 1 doc (w=1000); T = 10//2 = 5
    # base a=3 rem 3000, base b=1 rem 1000 -> one +1 goes to a
    rows = [(i, f"t{i}", "en", "a", 2) for i in range(9)]
    rows.append((9, "t9", "en", "b", 2))
    d = _write(spark, tmp_path, "documents", rows,
               "doc_id bigint, text string, lang string, source string,"
               " n_chars bigint")
    out = {r["source"]: r for r in
           qx.SPARK_QUERIES["x106_source_mixing"](spark, d).collect()}
    assert out["a"]["quota"] == 4 and out["b"]["quota"] == 1
    # budget exact, selection fills every quota
    assert sum(r["quota"] for r in out.values()) == 5
    for r in out.values():
        assert r["n_selected"] == r["quota"]
    # temperature damping: head share shrinks, tail share grows
    assert out["a"]["quota"] / 5 < 9 / 10
    assert out["b"]["quota"] / 5 > 1 / 10


def test_x107_cube_margins_reconcile(spark, tmp_path):
    rows = [(0, "t", "en", "a", 10), (1, "t", "en", "b", 20),
            (2, "t", "de", "a", 30)]
    d = _write(spark, tmp_path, "documents", rows,
               "doc_id bigint, text string, lang string, source string,"
               " n_chars bigint")
    out = qx.SPARK_QUERIES["x107_corpus_cube"](spark, d).collect()
    cells = {(r["lang_all"], r["source_all"], r["lang"], r["source"]): r
             for r in out}
    # 2x2 leaf cells - one combo absent (de, b) - + 2 + 2 margins + total
    assert len(out) == 3 + 2 + 2 + 1
    assert cells[(1, 1, "<all>", "<all>")]["n_docs"] == 3
    assert cells[(1, 1, "<all>", "<all>")]["chars"] == 60
    assert cells[(0, 1, "en", "<all>")]["n_docs"] == 2
    assert cells[(1, 0, "<all>", "a")]["chars"] == 40
    assert cells[(0, 0, "de", "a")]["mean_chars_micro"] == 30_000_000
    # margins reconcile with leaves
    leaf_total = sum(r["n_docs"] for r in out
                     if (r["lang_all"], r["source_all"]) == (0, 0))
    assert leaf_total == 3


def test_x108_funnel_strict_ordering_and_empty_step(spark, tmp_path):
    # user 1: view(t1) -> click(t2) -> purchase(t3): full conversion
    # user 2: click BEFORE view -> never reaches step 2
    # user 3: view only
    rows = [(1, "2024-01-01 00:00:01", 1, "view", 0.0, "{}"),
            (2, "2024-01-01 00:00:02", 1, "click", 0.0, "{}"),
            (3, "2024-01-01 00:00:03", 1, "purchase", 0.0, "{}"),
            (4, "2024-01-01 00:00:01", 2, "click", 0.0, "{}"),
            (5, "2024-01-01 00:00:02", 2, "view", 0.0, "{}"),
            (6, "2024-01-01 00:00:01", 3, "view", 0.0, "{}")]
    d = _write(spark, tmp_path, "events",
               [(e, __import__("datetime").datetime.fromisoformat(t),
                 u, ty, v, p) for e, t, u, ty, v, p in rows],
               "event_id bigint, ts timestamp, user_id bigint,"
               " event_type string, value double, props string")
    out = {r["step"]: r for r in
           qx.SPARK_QUERIES["x108_event_funnel"](spark, d).collect()}
    assert out[1]["n_users"] == 3 and out[1]["conversion_micro"] == 1000000
    assert out[2]["n_users"] == 1          # only user 1 clicks after view
    assert out[2]["conversion_micro"] == 1000000 // 3
    assert out[3]["n_users"] == 1 and out[3]["conversion_micro"] == 1000000


def test_x108_emptied_step_yields_zero_not_div_by_zero(spark, tmp_path):
    import datetime as dt
    rows = [(1, dt.datetime(2024, 1, 1), 1, "view", 0.0, "{}")]
    d = _write(spark, tmp_path, "events", rows,
               "event_id bigint, ts timestamp, user_id bigint,"
               " event_type string, value double, props string")
    out = {r["step"]: r for r in
           qx.SPARK_QUERIES["x108_event_funnel"](spark, d).collect()}
    assert out[2]["n_users"] == 0 and out[2]["conversion_micro"] == 0
    assert out[3]["n_users"] == 0 and out[3]["conversion_micro"] == 0


def test_load_table_nanos_and_int96_timestamps_agree(spark, tmp_path):
    """load_table's ns->us conversion must fire ONLY for INT64
    TIMESTAMP(NANOS) storage (driver fixtures), never for Spark-written
    timestamps that pyarrow also reports as ns (INT96) — the latter
    already surface as TIMESTAMP and a second convert corrupts them."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from enexory_parquet_export_spark.sources.tables import load_table

    instants = [dt.datetime(2024, 1, 1, 0, 0, 1),
                dt.datetime(2024, 6, 15, 12, 30, 45)]

    ns_dir = tmp_path / "ns_fixture"; ns_dir.mkdir()
    pq.write_table(
        pa.table({"event_id": pa.array([1, 2], pa.int64()),
                  "ts": pa.array(instants, pa.timestamp("ns"))}),
        str(ns_dir / "events.parquet"))

    sp_dir = tmp_path / "spark_fixture"
    (spark.createDataFrame(list(zip([1, 2], instants)),
                           "event_id bigint, ts timestamp")
     .coalesce(1).write.mode("overwrite")
     .parquet(str(sp_dir / "events.parquet")))

    a = {r["event_id"]: r["ts"]
         for r in load_table(spark, str(ns_dir), "events").collect()}
    b = {r["event_id"]: r["ts"]
         for r in load_table(spark, str(sp_dir), "events").collect()}
    assert a == b and a[1] == instants[0] and a[2] == instants[1]


def test_x46_integral_position_and_single_row_groups(spark, tmp_path):
    """r9: x46 moved to the percentile AGGREGATE with an oracle that
    mirrors Spark Percentile's interpolation branch.  Pin the branch
    edges the sf fixtures may never hit: an INTEGRAL position (n=3,
    p50 → pos exactly 1.0 → the lower value outright, no weighted
    form), a single-row group (every quantile = the row), and a tied
    group — against a pure-Python IEEE reference of the same
    branch."""
    import math

    def pct_micro(vals, q):
        v = sorted(vals)
        pos = q * (len(v) - 1)
        lo_i, hi_i = math.floor(pos), math.ceil(pos)
        if lo_i == hi_i:
            val = v[int(pos)]
        else:
            val = v[lo_i] * (hi_i - pos) + v[hi_i] * (pos - lo_i)
        return math.floor(val * 1000000.0)

    groups = {"a": [1.0, 2.0, 3.0],        # p50 pos = 1.0, integral
              "b": [41.25],                # single row
              "c": [5.0, 5.0, 7.0, 5.0]}   # ties at the selected ranks
    rows = [(g, v, i) for g, vs in groups.items()
            for i, v in enumerate(vs)]
    d = _write(spark, tmp_path, "events", rows,
               "event_type string, value double, event_id bigint")
    out = {r["event_type"]: r for r in
           qx.SPARK_QUERIES["x46_percentiles"](spark, d).collect()}
    for g, vs in groups.items():
        assert out[g]["n_rows"] == len(vs)
        for tag, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            assert out[g][f"{tag}_micro"] == pct_micro(vs, q), (g, tag)
    # the integral-position branch really is integral here
    assert out["a"]["p50_micro"] == 2_000_000
    assert out["b"]["p99_micro"] == 41_250_000
