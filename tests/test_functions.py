"""Scalar-function batteries: datetime normalization/sentinel,
portable hashing, text analysis."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from enexory_parquet_export_spark.functions import text as T
from enexory_parquet_export_spark.functions.datetime import (
    SENTINEL_DT,
    day_key,
    normalize_datetime,
    utc2_render,
)
from enexory_parquet_export_spark.functions.hashing import (
    MERSENNE_P,
    portable_hash60,
)


def one(spark, col, *rows_schema):
    rows, schema = rows_schema if rows_schema else ([("x",)], "s string")
    return spark.createDataFrame(rows, schema).select(col.alias("v")).collect()


def test_normalize_datetime_valid_and_sentinel(spark):
    rows = [("2024-03-05 10:20:30",), ("garbage",), (None,),
            ("2024-13-99 00:00:00",)]
    out = [r["v"] for r in one(spark, normalize_datetime(F.col("s")), rows, "s string")]
    assert out == ["2024-03-05 10:20:30", SENTINEL_DT, SENTINEL_DT, SENTINEL_DT]


def test_day_key_prefix(spark):
    out = one(spark, day_key(F.col("s")), [("2024-03-05 10:20:30",)], "s string")
    assert out[0]["v"] == "2024-03-05"


def test_utc2_render_fixed_offset(spark):
    # consolidate.cpp:45-53 — epoch + 2h, no DST. 2024-06-15 12:00:00Z → 14:00 wall.
    out = one(spark, utc2_render(F.col("e")), [(1718452800,)], "e bigint")
    assert out[0]["v"] == "2024-06-15 14:00:00"


def test_portable_hash60_matches_md5(spark):
    out = one(spark, portable_hash60(F.col("s")), [("hello",)], "s string")
    expected = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    assert out[0]["v"] == expected
    assert 0 <= out[0]["v"] < 2 ** 60


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",), ("a b c",)], "s string")
    out = [r["v"] for r in df.select(
        T.rolling_fingerprint(T.whitespace_tokens(F.col("s"))).alias("v")).collect()]
    assert out[0] == out[2] and out[0] != out[1]
    assert all(0 <= v < MERSENNE_P for v in out)


def test_lang_predict_tie_break_order(spark):
    # zero marker hits everywhere → tie → first profile ('en') wins
    out = one(spark, T.lang_predict(F.array(F.lit("nohit"))),
              [("x",)], "s string")
    assert out[0]["v"] == "en"


def test_bpe_and_punct_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42",)], "s string")
    row = df.select(T.bpe_token_count(F.col("s")).alias("b"),
                    T.punct_count(F.col("s")).alias("p")).collect()[0]
    # hello | , | world | ! | 42  → 5 BPE-ish tokens; ',' '!' → 2 punct
    assert row["b"] == 5 and row["p"] == 2


def test_quality_score_bounds(spark, sf_dir):
    from enexory_parquet_export_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    toks = T.whitespace_tokens(F.col("text"))
    mm = docs.select(T.quality_score(F.col("text"), toks).alias("q")) \
             .agg(F.min("q"), F.max("q")).collect()[0]
    assert 0.0 <= mm[0] and mm[1] <= 1.0


def test_rolling_fingerprint_table_matches_column_form(spark, sf_dir):
    # the closed-form relational restatement must equal the fold exactly
    from enexory_parquet_export_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    col_form = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id",
        T.rolling_fingerprint(T.whitespace_tokens(F.col("text"))).alias("fp"),
    ).collect()}
    tbl_form = {r["doc_id"]: r["fingerprint"]
                for r in T.rolling_fingerprint_table(docs).collect()}
    assert col_form == tbl_form and len(tbl_form) > 0


def test_approx_distinct_error_bound(spark, sf_dir):
    """x53's HLL++ estimates must sit within ~3·rsd of the exact
    distinct counts (no cross-engine oracle exists for sketch
    registers, so the error contract is the correctness check)."""
    from enexory_parquet_export_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    exact = {r["event_type"]: (r["u"], r["e"]) for r in
             ev.groupBy("event_type")
               .agg(F.countDistinct("user_id").alias("u"),
                    F.countDistinct("event_id").alias("e")).collect()}
    approx = {r["event_type"]: (r["approx_users"], r["approx_events"])
              for r in ev.groupBy("event_type")
                         .agg(F.approx_count_distinct("user_id", 0.02)
                               .alias("approx_users"),
                              F.approx_count_distinct("event_id", 0.02)
                               .alias("approx_events")).collect()}
    assert set(approx) == set(exact)
    for et, (au, ae) in approx.items():
        eu, ee = exact[et]
        assert abs(au - eu) <= max(3, 0.06 * eu), (et, au, eu)
        assert abs(ae - ee) <= max(3, 0.06 * ee), (et, ae, ee)


def test_approx_percentile_error_bound(spark, sf_dir):
    """x74's sketch percentiles must land within the documented rank
    error of the exact order statistics: with accuracy=10000 the rank
    error is ≤ n/10000 ranks, so compare VALUES at rank ± ceil(n/1e4)
    around each exact percentile (no cross-engine oracle exists for
    sketch internals, so the rank-error contract is the check)."""
    import math

    from enexory_parquet_export_spark.sources.tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    rows = (ev.groupBy("event_type")
              .agg(F.sort_array(F.collect_list("value")).alias("vals"),
                   F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), "
                          "10000)").alias("p"))
              .collect())
    assert rows
    for r in rows:
        vals, n = r["vals"], len(r["vals"])
        slack = math.ceil(n / 10_000) + 1
        for frac, got in zip((0.5, 0.9, 0.99), r["p"]):
            target = min(n - 1, max(0, int(frac * (n - 1))))
            lo = vals[max(0, target - slack)]
            hi = vals[min(n - 1, target + slack)]
            assert lo <= got <= hi, \
                f"{r['event_type']} p{frac}: {got} outside [{lo}, {hi}]"


def test_normalize_datetime_lax_fallbacks(spark):
    """ADVICE r2: the reference's pd.to_datetime(errors='coerce') also
    parses date-only and slash/ISO inputs (db_extractor.py:242-245) —
    the fallback chain must accept them, and the DuckDB strptime chain
    must agree shape-for-shape."""
    rows = [("2024-01-05",),               # date-only → midnight
            ("2024-01-05T10:20:30",),      # ISO 'T' separator
            ("2024/01/05 10:20:30",),      # slash datetime
            ("2024/01/05",),               # slash date-only
            ("01-05-2024",),               # ambiguous → still sentinel
            ("2024-01-05 10:20",)]         # truncated time → sentinel
    out = [r["v"] for r in one(spark, normalize_datetime(F.col("s")),
                               rows, "s string")]
    assert out == ["2024-01-05 00:00:00", "2024-01-05 10:20:30",
                   "2024-01-05 10:20:30", "2024-01-05 00:00:00",
                   SENTINEL_DT, SENTINEL_DT]

    # the oracle-side chain produces the identical normalization
    import duckdb

    from enexory_parquet_export_spark.functions.datetime import (
        LAX_DT_FORMATS_STRPTIME,
    )
    chain = ", ".join(f"try_strptime(s, '{f}')"
                      for f in LAX_DT_FORMATS_STRPTIME)
    duck = [duckdb.sql(
        f"SELECT coalesce(strftime(coalesce({chain}), '%Y-%m-%d %H:%M:%S'),"
        f" '{SENTINEL_DT}') FROM (SELECT '{r[0]}' AS s)").fetchone()[0]
        for r in rows]
    assert duck == out


def test_sequence_pack_invariants(spark, sf_dir):
    """x77 contiguous packing: offsets within capacity, bins contiguous
    across consecutive docs, spans consistent with token counts."""
    import __spark_entry__ as entrymod

    rows = (entrymod.queries()["x77_sequence_pack"](spark, sf_dir)
            .orderBy("doc_id").collect())
    C = 256
    assert rows
    expected_start = 0
    for r in rows:
        assert 0 <= r["bin_offset"] < C
        assert r["bin_first"] * C + r["bin_offset"] == expected_start
        last_tok = expected_start + r["n_tokens"] - 1
        assert r["bins_spanned"] == last_tok // C - r["bin_first"] + 1
        expected_start += r["n_tokens"]


def test_segment_boilerplate_banner_detected(spark, sf_dir):
    """x76: every banner-injected doc (doc_id % 7 == 0) reports at
    least its banner segment as boilerplate; n_boiler ≤ n_segs."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["x76_segment_boilerplate"](spark, sf_dir) \
        .collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert all(r["n_boiler"] <= r["n_segs"] for r in rows)
    banner_docs = [r for i, r in by_id.items() if i % 7 == 0]
    assert banner_docs
    assert all(r["n_boiler"] >= 1 for r in banner_docs)


def test_shard_export_balanced_and_stable(spark, sf_dir):
    """x79: positions are 1..n_shard dense per shard; hashing spreads
    docs across all 16 shards at fixture scale."""
    from collections import defaultdict

    import __spark_entry__ as entrymod

    rows = entrymod.queries()["x79_shard_export"](spark, sf_dir).collect()
    shards = defaultdict(list)
    for r in rows:
        shards[r["shard"]].append(r["pos"])
    assert len(shards) == 16
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    sizes = sorted(len(v) for v in shards.values())
    assert sizes[0] > 0 and sizes[-1] < 3 * sizes[0]  # rough balance


def test_bigram_lm_score_bounds(spark, sf_dir):
    """x80: mean conditional probability lies in (0, 1e6] micro-units
    and a doc of pure repeated bigrams would score 1e6 — spot-check
    bounds and the n_bigrams accounting."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["x80_bigram_lm_score"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["mean_p_micro"] <= 1_000_000
        assert r["n_bigrams"] >= 1


def test_guarded_window_passes_within_bound_and_raises_beyond(spark):
    """VERDICT r7 #5: unpartitioned bounded windows carry a loud
    in-plan cardinality guard (no extra exchange or action).  Within
    the bound the wrapped value is unchanged; one row past it the
    query fails with the contract message."""
    import pytest
    from pyspark.sql import Window, functions as F

    from enexory_parquet_export_spark.session import guarded_window

    df = spark.range(10).select(F.col("id"))
    w = Window.orderBy("id")
    ok = df.select(guarded_window(F.row_number().over(w), w, 10,
                                  "test relation").alias("rn")).collect()
    assert sorted(r["rn"] for r in ok) == list(range(1, 11))
    with pytest.raises(Exception, match="test relation.*bound 9"):
        df.select(guarded_window(F.row_number().over(w), w, 9,
                                 "test relation").alias("rn")).collect()
    # unordered spec variant (default full frame)
    w0 = Window.partitionBy(F.lit(1))
    ok0 = df.select(guarded_window(F.sum("id").over(w0), w0, 10,
                                   "test relation", ordered=False)
                    .alias("s")).collect()
    assert all(r["s"] == 45 for r in ok0)
    with pytest.raises(Exception, match="test relation.*bound 3"):
        df.select(guarded_window(F.sum("id").over(w0), w0, 3,
                                 "test relation", ordered=False)
                  .alias("s")).collect()
