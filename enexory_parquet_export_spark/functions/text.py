"""Text-analysis scalar battery (north-star extension).

Language-ID (marker-set scorer), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document
fingerprinting.  Everything is built-in expression trees (codegen'd,
no Python UDFs) and every formula has an exact DuckDB twin so the
declared queries hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import MERSENNE_P

#: deterministic marker-word profiles for the language scorer.
#: Real-world deployments would load per-language stopword lists; the
#: fixture corpus shares one synthetic vocabulary across langs, so the
#: profiles are fixed marker sets — the *operator* (score + argmax with
#: deterministic tie-break) is what matters.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("table", "row", "window", "group"),
    "es": ("data", "value", "part", "key"),
    "fr": ("query", "join", "merge", "filter"),
    "zh": ("spark", "stream", "batch", "column"),
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

PUNCT = ".,!?;:"


def whitespace_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def lang_scores(toks_distinct: Column) -> dict[str, Column]:
    """Marker-hit count per language profile."""
    return {
        lang: F.size(F.array_intersect(
            toks_distinct, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_PROFILES.items()
    }


def lang_predict(toks_distinct: Column) -> Column:
    """argmax of marker hits; ties broken by profile-declaration order
    (the CASE-chain order — identical in the oracle SQL)."""
    scores = lang_scores(toks_distinct)
    best = F.greatest(*scores.values())
    expr = None
    for lang, s in scores.items():
        cond = s == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr


def quality_score(text: Column, toks: Column) -> Column:
    """Composite [0,1] quality heuristic: length, stopword ratio,
    mean token length — the standard cheap pre-filter for training
    corpora.  Pure double math (deterministic IEEE on both engines),
    decimal-cast at the boundary by the caller."""
    n_tok = F.size(toks)
    stop_ratio = (F.size(F.filter(toks, lambda x: x.isin("the", "a")))
                  * 1.0 / n_tok)
    avg_len = (F.length(text) * 1.0) / n_tok
    return (F.lit(0.4) * F.least(n_tok * 1.0 / 100.0, F.lit(1.0))
            + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
            + F.lit(0.3) * F.least(avg_len / 8.0, F.lit(1.0)))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_RE), 0))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.translate(text, PUNCT, ""))


def rolling_fingerprint(toks: Column) -> Column:
    """Order-sensitive rolling polynomial hash over token hashes,
    mod 2^31−1 — a document fingerprint that distinguishes
    permutations (unlike set-based MinHash).

    Column-expression form: higher-order ``aggregate``/``transform``
    are interpreted per element (outside whole-stage codegen) — fine
    for ad-hoc use on small arrays, but the hot path is
    :func:`rolling_fingerprint_table` (same value, explode + codegen
    md5 + one hash aggregation)."""
    return F.aggregate(
        F.transform(
            toks,
            lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10)
                       .cast("bigint") % F.lit(MERSENNE_P)),
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(MERSENNE_P))


#: two-level modular power tables: 31^j mod P = _POW_HI[j//256]·_POW_LO[j%256]
#: (mod P) — 2×256 literals instead of a 65536-row relation, so the whole
#: weight lookup stays inside whole-stage codegen with no driver-built
#: DataFrame and no broadcast join.
_POW_LO = [pow(31, j, MERSENNE_P) for j in range(256)]
_POW_HI = [pow(31, 256 * j, MERSENNE_P) for j in range(256)]
MAX_FINGERPRINT_TOKENS = 256 * 256


def rolling_fingerprint_table(docs, *, id_col: str = "doc_id",
                              text_col: str = "text"):
    """``(doc_id, fingerprint)`` — same value as
    :func:`rolling_fingerprint`, restated for scale.

    The left fold ``a ← (a·31 + h) mod P`` has the closed form
    ``Σ hᵢ·31^(n−i) mod P``, which turns the interpreted per-element
    lambda into relational shape: posexplode tokens → ONE codegen'd
    md5 per token → literal-array modular-power lookup → one hash
    aggregation with map-side partial sums.  Each modular product
    keeps operands < 2^31 so intermediates stay < 2^62 — exact BIGINT
    on any engine.  Docs longer than ``MAX_FINGERPRINT_TOKENS``
    (65536) raise at runtime rather than fingerprint incorrectly.
    """
    ex = (docs.select(F.col(id_col).alias("doc_id"),
                      whitespace_tokens(F.col(text_col)).alias("_t"))
              .select("doc_id", F.size("_t").alias("_n"),
                      F.posexplode("_t").alias("_pos", "_tok")))
    h = (F.conv(F.substring(F.md5("_tok"), 1, 15), 16, 10)
          .cast("bigint") % F.lit(MERSENNE_P))
    j = F.col("_n") - 1 - F.col("_pos")
    guarded_j = F.when(
        j >= MAX_FINGERPRINT_TOKENS,
        F.raise_error(F.lit(
            "rolling_fingerprint_table: doc exceeds "
            f"{MAX_FINGERPRINT_TOKENS} tokens"))).otherwise(j)
    # ONE py4j call per lookup table (F.expr over a SQL array literal
    # with L-suffixed bigints), not 256 F.lit roundtrips each — the
    # starred form (and F.lit(list), which per-element-lits
    # internally) cost ~0.5 s of client-side plan construction PER
    # BUILD of any fingerprint plan (profiled at sf0.1)
    lo = F.element_at(
        F.expr("array(" + ",".join(f"{v}L" for v in _POW_LO) + ")"),
        (guarded_j % 256 + 1).cast("int"))
    hi = F.element_at(
        F.expr("array(" + ",".join(f"{v}L" for v in _POW_HI) + ")"),
        (guarded_j / 256 + 1).cast("int"))
    w = (lo * hi) % F.lit(MERSENNE_P)          # < 2^62 intermediate
    term = (h * w) % F.lit(MERSENNE_P)
    return (ex.withColumn("_term", term)
              .groupBy("doc_id")
              .agg((F.sum("_term") % F.lit(MERSENNE_P)).alias("fingerprint")))
