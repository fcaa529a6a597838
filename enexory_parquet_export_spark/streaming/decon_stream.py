"""Streaming benchmark decontamination — continuous ingest scrub.

The batch operator (``operators/dedup.py:decontaminate``, x55) scrubs
a finished corpus against a bounded benchmark suite.  A training-data
ingest wants the same verdict PER ARRIVING DOCUMENT, before the doc
is admitted — and unlike near-dup detection, decontamination needs no
memory of what already arrived: the reference set is the bounded,
static probe suite.  The streaming form is therefore STATELESS, which
is its whole scale story:

* the probe suite packs into ONE broadcast row of per-class
  ``(mult, hs)`` structs (classes of identical shingle sets, the
  x55/x85 collapse — bounded by the probe-suite contract, the same
  bound that justifies ``F.broadcast(probe)`` in the batch path);
* each arriving doc folds its distinct shingle hashes IN-ROW (the
  zero-shuffle ``_shingle_hash_expr`` build shared with every batch
  shingle consumer) and intersects against the class arrays with
  native array expressions — no shuffle, no state store, no Python;
* a cheap ``arrays_overlap`` reject against the flattened key set
  skips the per-class scan for the (dominant) clean-doc case.

Per-doc cost is ``O(|doc| + C·|intersect|)`` with ``C`` = probe class
count — bounded by contract, independent of stream length.  State is
ZERO, so there is no recovery surface: a restart re-processes only
the source's unread offsets (exactly-once comes from the sink/source
pair, not from operator state), which is why this family has no
kill-and-resume test where the stateful families do.

Divergence from the batch twin, by design: ``decontaminate``'s
hot-shingle df-cap is a CORPUS statistic (drop shingles appearing in
more than ``max(df_cap_min, ndocs/df_cap_div)`` corpus docs) — a
stream has no corpus-wide df.  Production computes stop-shingles
offline and subtracts them from the PROBE side
(``array_except(hs, stop)`` per class) before packing, which yields
the same shared counts as the batch cap dropping those match rows.
The equivalence test pins the uncapped cores against each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _shingle_hash_expr


def pack_probe_classes(probes: DataFrame, *,
                       probe_id_col: str = "probe_id",
                       shingle_n: int = 3) -> DataFrame:
    """ONE-ROW static relation carrying the probe suite: ``_cls`` =
    array of ``(mult, hs)`` per distinct shingle set (probes sharing a
    set share one class — every member scores identically, so only the
    multiplicity survives), ``_keys`` = flattened distinct hash set
    for the overlap reject.  Probe docs with fewer than ``shingle_n``
    tokens contribute nothing, mirroring the batch operator."""
    base, zh = _shingle_hash_expr(
        probes.select(F.col(probe_id_col).alias("probe_id"), "text"),
        id_col="probe_id", text_col="text", shingle_n=shingle_n,
        distinct_in_row=True)
    per = (base.filter(F.size("_t") >= shingle_n)
               .select(F.sort_array(zh).alias("hs")))
    classes = per.groupBy("hs").agg(
        F.count("*").cast("bigint").alias("mult"))
    return classes.agg(
        F.collect_list(F.struct("mult", "hs")).alias("_cls"),
        F.array_distinct(F.flatten(F.collect_list("hs"))).alias("_keys"))


def decon_stream(docs: DataFrame, probes: DataFrame, *, k: int,
                 shingle_n: int = 3,
                 probe_id_col: str = "probe_id") -> DataFrame:
    """``docs(doc_id, text)`` stream → ``(doc_id, n_probes_hit,
    max_shared)`` for every doc sharing ≥ ``k`` distinct
    ``shingle_n``-token shingles with any probe — the x55 verdict,
    emitted per arrival.  ``probes`` is a BATCH relation (the static
    side); ``docs`` may be streaming or batch (the plan is pure
    per-row projection either way)."""
    packed = pack_probe_classes(probes, probe_id_col=probe_id_col,
                                shingle_n=shingle_n)
    base, zh = _shingle_hash_expr(docs, id_col="doc_id", text_col="text",
                                  shingle_n=shingle_n,
                                  distinct_in_row=True)
    withhs = (base.filter(F.size("_t") >= shingle_n)
                  .select("doc_id", zh.alias("hs")))
    joined = (withhs.join(F.broadcast(packed), F.lit(True), "inner")
                    .filter(F.arrays_overlap("hs", "_keys")))
    matched = F.filter(
        F.transform(
            F.col("_cls"),
            lambda c: F.struct(
                c["mult"].alias("mult"),
                F.size(F.array_intersect(F.col("hs"), c["hs"]))
                 .cast("bigint").alias("shared"))),
        lambda s: s["shared"] >= F.lit(k))
    return (joined.withColumn("_m", matched)
                  .filter(F.size("_m") > 0)
                  .select("doc_id",
                          F.aggregate(
                              "_m", F.lit(0).cast("bigint"),
                              lambda acc, s: acc + s["mult"])
                           .alias("n_probes_hit"),
                          F.array_max(F.col("_m.shared"))
                           .alias("max_shared")))


def decon_batch(docs: DataFrame, probes: DataFrame, *, k: int,
                shingle_n: int = 3,
                probe_id_col: str = "probe_id") -> DataFrame:
    """Batch twin — literally the same plan (the stream operator is
    stateless per-row projection, so the twin is the identity).  The
    equivalence that needs PROVING is against the independent batch
    formulation ``operators/dedup.py:decontaminate`` with its df-cap
    disabled — pinned by ``tests/test_streaming.py``."""
    return decon_stream(docs, probes, k=k, shingle_n=shingle_n,
                        probe_id_col=probe_id_col)


def _pack_snippet_classes(snippets: DataFrame, *, snip_id_col: str,
                          shingle_n: int) -> DataFrame:
    """Like :func:`pack_probe_classes` but keeping the MEMBER ID LIST
    per class (containment reports per-snippet rows, not a count)."""
    base, zh = _shingle_hash_expr(
        snippets.select(F.col(snip_id_col).alias("snip_id"), "text"),
        id_col="snip_id", text_col="text", shingle_n=shingle_n,
        distinct_in_row=True)
    per = (base.filter(F.size("_t") >= shingle_n)
               .select("doc_id", F.sort_array(zh).alias("hs")))
    classes = per.groupBy("hs").agg(
        F.sort_array(F.collect_list("doc_id")).alias("members"))
    return classes.agg(
        F.collect_list(F.struct("members", "hs")).alias("_cls"),
        F.array_distinct(F.flatten(F.collect_list("hs"))).alias("_keys"))


def containment_stream(docs: DataFrame, snippets: DataFrame, *,
                       thresh_micro: int, shingle_n: int = 3,
                       snip_id_col: str = "snip_id") -> DataFrame:
    """``docs(doc_id, text)`` stream → ``(snip_id, doc_id,
    cont_micro)`` for every (snippet, arriving doc) pair where the
    fraction of the snippet's distinct shingles found in the doc
    reaches ``thresh_micro`` micro-units — the x85 verdict per
    arrival.  Same stateless posture as :func:`decon_stream`; the
    containment fraction is computed per CLASS (identical snippet
    shingle sets score identically) and expanded to members in-row.
    The micro-unit rendering matches the batch operator expression
    for expression (``shared * 1000000.0 / n`` in double, floored)."""
    packed = _pack_snippet_classes(snippets, snip_id_col=snip_id_col,
                                   shingle_n=shingle_n)
    base, zh = _shingle_hash_expr(docs, id_col="doc_id", text_col="text",
                                  shingle_n=shingle_n,
                                  distinct_in_row=True)
    withhs = (base.filter(F.size("_t") >= shingle_n)
                  .select("doc_id", zh.alias("hs")))
    joined = (withhs.join(F.broadcast(packed), F.lit(True), "inner")
                    .filter(F.arrays_overlap("hs", "_keys")))
    cont_of = lambda c: (  # noqa: E731
        F.size(F.array_intersect(F.col("hs"), c["hs"]))
         .cast("double") * F.lit(1000000.0)
        / F.size(c["hs"]).cast("double"))
    matched = F.filter(
        F.transform(
            F.col("_cls"),
            lambda c: F.struct(c["members"].alias("members"),
                               cont_of(c).alias("cont"))),
        lambda s: s["cont"] >= F.lit(float(thresh_micro)))
    return (joined.select("doc_id", F.explode(matched).alias("_m"))
                  .select("doc_id", F.col("_m.cont").alias("_cont"),
                          F.explode("_m.members").alias(snip_id_col))
                  .select(snip_id_col, "doc_id",
                          F.floor("_cont").cast("bigint")
                           .alias("cont_micro")))


def containment_batch(docs: DataFrame, snippets: DataFrame, *,
                      thresh_micro: int, shingle_n: int = 3,
                      snip_id_col: str = "snip_id") -> DataFrame:
    """Batch twin of :func:`containment_stream` (identity — see
    :func:`decon_batch`); pinned against
    ``operators/dedup.py:containment`` with the df-cap disabled."""
    return containment_stream(docs, snippets, thresh_micro=thresh_micro,
                              shingle_n=shingle_n,
                              snip_id_col=snip_id_col)
