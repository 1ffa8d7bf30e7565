"""Entity canonicalization: connected components over a similarity graph
(north-star generalization of the reference's shared-URI clustering,
xml_utils.py:435-447 — SURVEY A7/J10).

GraphFrames-style label propagation without the GraphFrames dependency:
iterative self-joins to fixpoint, the DataFrame equivalent of a recursive
CTE. Each round: every vertex adopts the minimum component id among itself
and its neighbors. Converges in O(diameter) rounds; bounded by ``max_iter``;
``localCheckpoint`` every few rounds cuts the lineage chain so plans don't
grow exponentially (the classic iterative-join trap).

Skew note: mega-components (hot entities) concentrate edges on few keys —
AQE skew-join splitting handles the joins; the per-round aggregation is a
min(), which partial-aggregates map-side, so hot keys reduce early.
Measured (BENCH/skew_megacomponent.md, round 4): a 1 M-spoke hot-entity
star + 1 M background pairs completes in ~29 s at local[32] with AQE
skew-join ON or OFF — walls equal within noise, i.e. the operator does
not DEPEND on AQE at any scale the sandbox can produce (a ~30 MB hot
partition is sub-second work); AQE's 256 MB-threshold splitting is the
relief valve for the GB-sized hot partitions that only exist at 10^9+
edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 20, checkpoint_every: int = 3) -> DataFrame:
    """edges(src, dst) -> (vertex, component) with component = min vertex id
    (lexicographic) in the component. Undirected."""
    # r6 session 3: both directions in ONE map-side explode instead of a
    # self-union — Spark has no cross-branch CSE, so the union shape
    # evaluated `edges` (here: the whole MinHash-candidates -> Jaccard
    # verification pipeline) TWICE while materializing sym below.
    both = F.explode(F.array(
        F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
        F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
    ))
    sym = edges.select(both.alias("e")).select("e.a", "e.b").distinct()
    # materialize the edge list ONCE before iterating: every round's join
    # references sym twice (neighbor_min + the labels lineage), so an
    # unmaterialized sym re-runs the whole upstream edge pipeline (e.g.
    # MinHash candidates + Jaccard verification) once per reference per
    # round — measured 225 s vs 4 s at sf0.1. At cluster scale this is a
    # store/persist boundary; localCheckpoint is its single-JVM analog.
    sym = sym.localCheckpoint()
    verts = sym.select(F.col("a").alias("vertex")).distinct()
    # r6: self-loops fold the "keep own label" term into the SAME join —
    # min over neighbors ∪ self ≡ least(own, neighbor-min) — so one round
    # is ONE join + ONE partial-agg min instead of join + agg + left-join
    # fold, and `labels` is referenced once per round (the left-join shape
    # referenced it twice, doubling the lazy plan between checkpoints).
    # Every vertex has a loop row, so the groupBy still emits every vertex.
    looped = sym.unionByName(
        verts.select(F.col("vertex").alias("a"), F.col("vertex").alias("b"))
    )
    labels = verts.withColumn("component", F.col("vertex"))
    for i in range(max_iter):
        new_labels = (
            looped.join(labels, looped["b"] == labels["vertex"])
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("component"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "vertex")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels


def mention_similarity_edges(mentions_expanded: DataFrame) -> DataFrame:
    """Similarity graph over mentions: nodes are mention keys
    ``conv_id#eid``; edges between mentions sharing any external reference
    (the reference's only signal) or an identical lowercased surface within
    a document. Shared-ref blocking keys avoid the O(n^2) pair join."""
    node = F.concat_ws("#", "conv_id", "eid")
    by_ref = mentions_expanded.select(
        node.alias("vertex"), F.explode("ext_refs").alias("key")
    )
    by_surface = mentions_expanded.select(
        node.alias("vertex"),
        F.concat_ws("|", "conv_id", F.lower("surface")).alias("key"),
    )
    keyed = by_ref.unionByName(by_surface)
    # star edges: every vertex in a block connects to the block's min vertex
    # (linear in block size, not quadratic pair enumeration)
    hubs = keyed.groupBy("key").agg(F.min("vertex").alias("hub"))
    return (
        keyed.join(hubs, "key")
        .filter(F.col("vertex") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("vertex").alias("dst"))
        .distinct()
    )


def canonical_entities(mentions_expanded: DataFrame) -> DataFrame:
    """(conv_id, eid) -> canonical cluster id via connected components over
    the similarity graph."""
    edges = mention_similarity_edges(mentions_expanded)
    components = connected_components(edges)
    nodes = mentions_expanded.select(
        F.concat_ws("#", "conv_id", "eid").alias("vertex"),
        "conv_id", "eid",
    )
    return (
        nodes.join(components, "vertex", "left")
        .select(
            "conv_id", "eid",
            F.coalesce("component", F.col("vertex")).alias("canonical_id"),
        )
    )
