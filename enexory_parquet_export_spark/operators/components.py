"""Connected components over a pair list — dedup cluster assembly.

Near-dup detection (MinHash/LSH, PPJoin, SimHash, embedding buckets)
emits PAIRS; the pipeline needs CLUSTERS: every transitively-connected
group collapses to one canonical document.  That closure is
``connected_components``: label propagation where each node repeatedly
adopts the minimum label among itself and its neighbors until
fixpoint.

Scale shape: each round is two joins + a hash agg over the edge list
(fully distributed) — neighbor-min propagation followed by a pointer
jump (label ← label-of-label), so convergence is O(log diameter)
rounds, not O(diameter): a 10⁶-long chain needs ~20 rounds, and
dedup-shaped graphs (dense little clusters) finish in 2-3.  The
driver's only involvement is the loop and a per-round changed-count
scalar; raises if ``max_iter`` rounds don't reach fixpoint.  This is
min-label propagation with path shortening — the practical core of
the MapReduce connected-components family (cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..session import materialize


#: edge-count bound for the single-process fast path.  The fetch it
#: gates is BOUNDED BY THE GATE (the codebook-collect argument):
#: limit(bound+1) caps driver transfer by construction, so driver
#: memory is O(bound) at ANY corpus size.  2M edges ≈ 32 MB as two
#: Arrow int64 columns (the fetch is toPandas, not row-object
#: collect — row objects are ~200 B each and would dominate past
#: ~500k); union-find on 2M edges runs in ~1 s driver-side, against
#: ~0.5 s/round × O(log d) rounds + eager checkpoints distributed.
LOCAL_EDGE_BOUND = 2_000_000


def _local_components(rows) -> list[tuple[int, int]]:
    """Driver-side union-find (path-halving + union-by-min) over a
    bounded edge list — exact same (node, min-id label) semantics as
    the distributed loop."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]   # path halving
            r = parent[r]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the final root IS the min label
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return sorted((n, find(n)) for n in parent)


def connected_components(edges: DataFrame, *,
                         src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 20,
                         local_bound: int = LOCAL_EDGE_BOUND) -> DataFrame:
    """``(node, label)`` with label = min node id of the component.

    ``edges`` is an undirected pair list (each pair once, either
    order).  Isolated nodes don't appear (no pairs → no cluster).

    ADAPTIVE STRATEGY (the broadcast-join idiom, size decides): a
    dedup candidate graph after banding is usually FAR smaller than
    the corpus, and the distributed loop's price at small size is
    pure dispatch — O(log d) rounds × (2 joins + agg + eager
    checkpoint + convergence count) ≈ 0.5 s/round regardless of data.
    So when the deduplicated adjacency (counted on its checkpoint —
    one cheap job) fits ``local_bound`` edges, the closure runs as
    driver-side union-find in milliseconds and ships back as one
    bounded createDataFrame; past the bound, the distributed
    pointer-jumping loop below is the only shape that scales.
    Value-identical by construction (union-by-min root = min-label
    fixpoint); pinned by tests/test_components.py.
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if local_bound > 0:
        # ONE bounded, SHUFFLE-FREE action decides strategy AND
        # fetches the data: limit(bound+1) over the RAW directed pair
        # list caps driver transfer by construction — if it returns
        # ≤ bound rows it returned every edge (union-find needs
        # neither the undirected doubling nor the distinct; it
        # absorbs duplicates and direction natively).  The over-bound
        # case wastes one short-circuited narrow job and falls
        # through to the loop.
        pdf = fwd.limit(local_bound + 1).toPandas()  # Arrow columnar fetch
        if len(pdf) <= local_bound:
            labeled = _local_components(
                zip(pdf["a"].tolist(), pdf["b"].tolist()))
            return edges.sparkSession.createDataFrame(
                labeled, "node bigint, label bigint")
    und = fwd.unionByName(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # adjacency is reused every round: materialize once
    adj = und.distinct().transform(materialize, eager=True, pinned=True)

    # round 0 fused into initialization: label = min(self, neighbors)
    # directly from the adjacency — one fewer full round in the loop
    labels = (adj.groupBy(F.col("a").alias("node"))
                 .agg(F.least(F.min("b"), F.first("a")).alias("label")))
    for it in range(max_iter):
        # candidate label per node: min over self and neighbors' labels
        nbr = (adj.join(labels.withColumnRenamed("node", "b")
                              .withColumnRenamed("label", "_nl"), "b")
                  .groupBy("a").agg(F.min("_nl").alias("_minnbr")))
        prop = (labels.withColumnRenamed("label", "_old")
                .join(nbr.withColumnRenamed("a", "node"), "node", "left")
                .select("node", "_old",
                        F.least("_old", F.coalesce("_minnbr", "_old"))
                         .alias("_p")))
        # pointer jump: follow one hop through the label graph
        # (label ← label(label)) — collapses chains logarithmically.
        # The changed flag rides along so convergence costs a count on
        # the checkpointed result, not a fresh old⋈new join per round.
        # The checkpoint must be EAGER — both single-job alternatives
        # measured WORSE at sf0.1: a lazy localCheckpoint lets the next
        # round's two consumers race the first materialization and
        # recompute the full lineage (2.7 s → 24 s); persist() keeps
        # the full nested lineage alive so each round re-analyzes a
        # growing tree and reads columnar cache (1.4 s → 2.5 s).
        lut = prop.select(F.col("node").alias("_p"),
                          F.col("_p").alias("_ll"))
        new_labels = (prop.join(lut, "_p", "left")
                      .select("node",
                              F.coalesce("_ll", "_p").alias("label"),
                              (F.coalesce("_ll", "_p") != F.col("_old"))
                               .alias("_chg"))
                      .transform(materialize, eager=True, pinned=True))
        labels = new_labels.select("node", "label")
        # skip the round-0 convergence count: with the fused min-label
        # init, a graph that is ALREADY converged after one propagation
        # round is a degenerate edge list (isolated pairs), and dedup
        # graphs take 2-3 rounds — so round 0's count almost always
        # reports "changed" and is a pure extra job.  Worst case
        # (degenerate graph) costs one no-op round, the same price as
        # the count it replaces.
        if it > 0 and new_labels.filter("_chg").count() == 0:
            return labels
    # max_iter exhausted: the loop above never counted round max_iter-1
    # as converged if it==0 was the only round — verify before failing
    if max_iter == 1 and new_labels.filter("_chg").count() == 0:
        return labels
    raise RuntimeError(f"components did not converge in {max_iter} rounds")
