"""Graph algorithms over KG edge tables: fixed-point PageRank,
synchronous label-propagation community detection, and BFS landmark
distances.

The reference materializes a KG and walks its ontology edges (the closure
in `utils.py:489-569` that operators/ontology.py re-expresses); what it
never answers is "which nodes matter" — the standard KG-construction
follow-up (entity salience, seed ranking for the next crawl round). This
module adds a deterministic PageRank over an ``edges(src, dst)`` table as
pure DataFrame relational algebra: per-iteration join + partial-aggregated
groupBy, lineage truncated with localCheckpoint exactly like the ontology
closure.

Cross-engine determinism (the reason this is *fixed-point*, not float):
ranks are BIGINT in units of 1e-12 (``SCALE``). Each step divides a rank
by an out-degree with INTEGER division and takes the damping factor as the
exact rational 85/100, also in integer ops. Spark's ``div`` and DuckDB's
``//`` agree bit-for-bit on non-negative BIGINTs, and BIGINT sums are
order-independent — so the DuckDB oracle (iterations unrolled as chained
CTEs) hash-matches exactly, with zero float-summation-order risk. This is
the exact-arithmetic sibling of ann_ivf's ``round_to`` pinning; rounding
truncation loses at most outdeg × 1e-12 of mass per node per step, which
is noise relative to rank magnitudes (~1/N) and identical in both engines.

Simplifications (documented, mirrored in the oracle): dangling nodes (no
out-edges) leak their mass instead of redistributing it, and there is no
convergence test — iterations are fixed so the unrolled oracle matches.
Catalog callers symmetrize their edge tables, which removes dangling nodes
entirely.

Scale notes (100 TB): the edge table joins RANKS (node-sized, the small
side as soon as edges >> nodes) once per iteration — shuffle on src — and
the contribution sum is a partial-agg groupBy on dst. The out-degree join
is precomputed once and the iteration count is a constant, so total cost
is n_iters × (one co-partitioned join + one agg). No driver-side state:
the node count enters the plan as a broadcast 1-row frame, the same
pattern the catalog's stats entries use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # rank unit = 1e-12 of total mass
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85 as an exact rational


def _weighted_edges(edges: DataFrame, cluster: str = "src") -> DataFrame:
    """Iteration-invariant (src, dst, outdeg) table, deduped, CLUSTERED by
    ``src`` and cached WITH its partitioning (r6).

    The old shape (``edges.join(deg).localCheckpoint()``) forgot the join's
    hash partitioning (checkpointed RDD scans report UnknownPartitioning),
    so EVERY iteration's ``weighted ⋈ ranks`` re-exchanged and re-sorted
    the edge-sized side. Here the out-degree is a window count over one
    explicit hash(src) repartition — HashPartitioning(src) satisfies the
    groupless window's ClusteredDistribution and the window sort leaves the
    partitions sorted by src — and ``persist()`` keeps plan, partitioning
    and ordering visible to EnsureRequirements: each round's sort-merge
    join now exchanges and sorts ONLY the node-sized rank frame (guide
    §2.4, operations keyed the same way share one exchange). The explicit
    partition count pins the layout so AQE cannot coalesce the rank side
    to a mismatched count.

    ``cluster="dst"`` (r6, for the broadcast-rounds strategy) adds one
    more exchange so the CACHED layout is hash(dst): the per-round
    contribution ``groupBy("dst")`` then rides the cache's partitioning
    and the round needs no exchange at all (the rank side arrives by
    broadcast). The extra build exchange is paid once; the per-round
    exchange it deletes would be paid ``n_iters`` times."""
    from pyspark.sql import Window

    edges = edges.select("src", "dst")
    n = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = (
        # ONE exchange: hash(src) satisfies the (src, dst) dedup's
        # clustering requirement AND the window's, so dedup + out-degree
        # ride the same shuffle (the old distinct-then-join paid separate
        # exchanges for distinct, groupBy and join; map-side pre-dedup
        # bought nothing — measured 11.97M of 12M rows survive distinct
        # on the sf1.0 co-transaction graph)
        edges.repartition(n, F.col("src"))
        .dropDuplicates(["src", "dst"])
        .withColumn(
            "outdeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
    )
    if cluster == "dst":
        out = out.repartition(n, F.col("dst"))
    return out.persist()


def pagerank(edges: DataFrame, n_iters: int = 5,
             all_nodes_receive: bool = False,
             broadcast_ranks: bool = False) -> DataFrame:
    """``edges(src, dst)`` -> ``(node, rank_e12)``; BIGINT fixed-point
    PageRank after ``n_iters`` synchronous iterations.

    r_0(v)     = SCALE div N
    r_{t+1}(v) = (15·(SCALE div N)) div 100
                 + (85·Σ_{(u,v)∈E} r_t(u) div outdeg(u)) div 100

    Duplicate edges are collapsed (set semantics, like the closure's edge
    prep). Nodes = src ∪ dst; dangling nodes contribute nothing (mass
    leak — see module docstring).

    ``all_nodes_receive=True`` asserts every node has at least one
    in-edge — true by construction for ``symmetrize``d edge tables — and
    drops the per-round ``nodes`` left-join (the contribution groupBy
    already emits a row per node), halving the shuffles per iteration:
    join+agg only. Values are identical when the assertion holds; a node
    with no in-edges would silently vanish from the result, so the flag
    stays opt-in.

    ``broadcast_ranks=True`` (r6) asserts the NODE table is small enough
    to broadcast (well under the 8 GB / 512M-row broadcast-relation cap —
    true whenever nodes are bounded by dimension tables while edges scale
    with facts, e.g. the catalog's customer↔supplier co-transaction
    graph) and switches the iteration to zero-shuffle rounds: the edge
    cache is clustered by ``dst`` instead of ``src``, each round's
    ``weighted ⋈ ranks`` is a broadcast hash join (no exchange, no sort
    of either side) and the contribution ``groupBy("dst")`` rides the
    cache's hash(dst) partitioning — the per-round exchange of partial
    aggregates (bounded by nodes × partitions rows, the dominant
    per-round cost measured at 12M edges) disappears entirely. Values
    are bit-identical (same arithmetic, different physical plan); the
    default stays the shuffle shape, whose memory footprint is
    node-count-unbounded.
    """
    # one materialization, reused by every iteration's join — clustered by
    # src so the per-round join only shuffles the rank frame, or by dst so
    # the broadcast-rounds strategy shuffles nothing (_weighted_edges)
    weighted = _weighted_edges(
        edges, cluster="dst" if broadcast_ranks else "src")
    nodes = (
        weighted.select(F.col("src").alias("node"))
        .unionByName(weighted.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # node count as a broadcast 1-row frame: parameterizes the plan
    # without a driver collect
    n1 = F.broadcast(nodes.agg(F.count("*").alias("n_nodes")))
    base = f"({DAMP_DEN - DAMP_NUM}L * ({SCALE}L div n_nodes)) div {DAMP_DEN}L"
    ranks = nodes.crossJoin(n1).select(
        "node", F.expr(f"{SCALE}L div n_nodes").alias("rank_e12")
    )
    for _i in range(n_iters):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        in_mass = (
            weighted.join(rank_side, weighted.src == ranks.node)
            .select(
                F.col("dst"), F.expr("rank_e12 div outdeg").alias("contrib")
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        if all_nodes_receive:
            # symmetrized edges: the groupBy already covers every node
            ranks = in_mass.select(F.col("dst").alias("node"), "in_mass")
        else:
            ranks = nodes.join(in_mass, nodes.node == in_mass.dst, "left")
        ranks = (
            ranks.crossJoin(n1)
            .select(
                "node",
                F.expr(
                    f"{base} + ({DAMP_NUM}L * coalesce(in_mass, 0L)) "
                    f"div {DAMP_DEN}L"
                ).alias("rank_e12"),
            )
        )
        # truncate lineage periodically (closure hygiene); lazy so rounds
        # fuse into one submitted job. r6: every 8 rounds instead of every
        # round — a checkpoint materializes a node-sized RDD AND erases
        # the contribution groupBy's hash(dst) partitioning, which the
        # next round's join can otherwise reuse for its rank side; at the
        # catalog's 5 iterations no intermediate checkpoint fires and the
        # plan stays shallow (linear in rounds).
        if (_i + 1) % 8 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    # materialize the final ranks while `weighted` is cached, then drop the
    # cache: the caller gets a checkpointed RDD scan and a later identical
    # pagerank call (e.g. a bench rep) cannot silently reuse this call's
    # cached edge table — every invocation recomputes from its inputs.
    if n_iters > 0:
        ranks = ranks.localCheckpoint()
    weighted.unpersist(blocking=True)
    return ranks


def label_propagation(edges: DataFrame, n_iters: int = 3,
                      all_nodes_receive: bool = False,
                      broadcast_labels: bool = False) -> DataFrame:
    """``edges(src, dst)`` -> ``(node, label)``: synchronous label
    propagation (community detection), the GraphFrames-style LPA the
    north-star names for entity-canonicalization neighborhoods.

    Deterministic by construction so the unrolled-CTE DuckDB oracle
    hash-matches: every node starts labeled with its own id; each
    synchronous round it adopts the most frequent label among its
    in-neighbors, ties broken by SMALLEST label (GraphFrames leaves the
    tie-break undefined — pinning it is what makes this testable).
    Iterations are fixed (no convergence test). The synchronous update
    shares sync-LPA's documented caveat (GraphFrames docs): bipartite-ish
    regions can oscillate rather than converge — fixed iterations keep
    that deterministic too.

    By default a node with no in-neighbors keeps its current label (one
    extra node-sized left-join per round). ``all_nodes_receive=True``
    asserts every node has in-edges — true by construction for
    ``symmetrize``d edge tables, which is what the catalog callers pass —
    and drops that join, leaving ONE shuffle per round; under the flag a
    node with no in-edges silently vanishes from the result, so it stays
    opt-in (same contract as ``pagerank``).

    Scale notes (100 TB): per round, ONE shuffle — edges ⋈ labels on src
    (labels is node-sized, the small side once edges >> nodes) — then a
    two-level partial-agg count and a struct-min argmin, both map-side
    combinable. localCheckpoint truncates lineage per round exactly like
    pagerank/ontology closure.

    ``broadcast_labels=True`` (r6) is LPA's sibling of pagerank's
    ``broadcast_ranks``: it asserts the node-sized label frame fits the
    broadcast cap, caches the deduped edge table clustered by hash(dst),
    and runs each round as broadcast-join + two aggs that BOTH ride the
    cache's partitioning (hash(dst) satisfies the (dst, label) count's
    clustering requirement — grouping-key superset rule — and the argmin
    groups by the same dst) — zero exchanges per round. Labels are
    bit-identical (the argmin tie-break is value-based, not
    placement-based); default stays the node-count-unbounded shape.
    """
    if broadcast_labels:
        n = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        edges = (
            edges.select("src", "dst")
            .repartition(n, F.col("dst"))
            .dropDuplicates(["src", "dst"])
            .persist()
        )
    else:
        edges = edges.select("src", "dst").distinct().localCheckpoint()
    init = edges.select(F.col("src").alias("node"))
    if not all_nodes_receive:
        # dst-only nodes exist when the input is not symmetrized; they
        # must start labeled too or they could never appear at all
        init = init.unionByName(edges.select(F.col("dst").alias("node")))
    labels = (
        init.distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(n_iters):
        lab_side = F.broadcast(labels) if broadcast_labels else labels
        counts = (
            edges.join(lab_side, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        # argmin of (-cnt, label): struct ordering gives most-frequent
        # label, smallest label on ties — no window, stays a partial agg
        adopted = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg_cnt"),
                        F.col("label").alias("label"),
                    )
                ).alias("m")
            )
            .select("node", F.col("m.label").alias("adopted"))
        )
        if all_nodes_receive:
            labels = adopted.select("node", F.col("adopted").alias("label"))
        else:
            labels = labels.join(adopted, "node", "left").select(
                "node", F.coalesce("adopted", "label").alias("label")
            )
        # same lazy fusing as pagerank
        labels = labels.localCheckpoint(eager=False)
    if broadcast_labels:
        # same cache-hygiene close as pagerank: materialize while the edge
        # cache is alive, then drop it so repeat invocations recompute
        if n_iters > 0:
            labels = labels.localCheckpoint()
        edges.unpersist(blocking=True)
    return labels


def bfs_distances(edges: DataFrame, sources: list[str],
                  max_depth: int = 10,
                  broadcast_frontier: bool = False) -> DataFrame:
    """``edges(src, dst)`` + source node ids -> ``(node, dist)``: shortest
    hop count from the nearest source, breadth-first (GraphFrames
    ``shortestPaths``-style landmark distances, the third of the graph
    trio after centrality and communities).

    Deterministic and oracle-unrollable: distances are BIGINT, each
    synchronous round relaxes ``dist(v) = min(dist(v), min over
    in-neighbors u of dist(u)+1)``, and rounds are fixed at ``max_depth``
    (nodes farther than that, or unreachable, are absent from the
    result — document at call sites). Frontier-only optimization is
    deliberately skipped: the full-relaxation round is one join + one
    partial-agg min per round, the same shuffle count, and keeps the
    DuckDB twin a pure per-round CTE.

    Scale notes (100 TB): per round ONE shuffle (edges ⋈ dist on src)
    plus a map-side-combinable min agg; dist is node-sized, the small
    side once edges >> nodes. Lazy localCheckpoint per round fuses the
    rounds into one submitted job, as in pagerank/LPA.

    ``broadcast_frontier=True`` (r6, the pagerank ``broadcast_ranks``
    contract: the reached-node frame must fit the broadcast cap): the
    "keep the old distance" term of the relaxation is folded into the
    join itself by appending one zero-weight self-loop per node (min over
    self ∪ in-neighbors ≡ the old union-then-min — the connected
    components fold, applied to distances), so a round is broadcast-join
    + one min agg riding the edge cache's hash(dst) clustering: zero
    exchanges per round. Sources absent from the graph get self-loops
    too, so they stay in the result exactly as in the union shape.
    """
    if not sources:
        raise ValueError("bfs_distances needs at least one source node")
    spark = edges.sparkSession
    ntype = dict(edges.dtypes)["src"]
    dist = spark.createDataFrame(
        [(s, 0) for s in sources], f"node {ntype}, dist long"
    )
    if broadcast_frontier:
        return _relax_rounds_broadcast(edges, dist, F.lit(1).cast("long"),
                                       max_depth)
    edges = edges.select("src", "dst").distinct().localCheckpoint()
    for _ in range(max_depth):
        relaxed = (
            edges.join(dist, edges.src == dist.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.lit(1).cast("long")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def _relax_rounds_broadcast(edges: DataFrame, dist: DataFrame, w,
                            n_rounds: int) -> DataFrame:
    """Shared zero-shuffle-round relaxation for BFS/SSSP (r6).

    ``edges`` must carry src/dst (and, for SSSP, a ``w`` column the
    caller folds into the ``w`` expression); ``w`` is the per-edge
    distance increment expression (1 for BFS, ``F.col("w")`` for SSSP).
    Appends a zero-weight self-loop for every node AND every source, so
    ``min(dist(u) + w)`` over the looped in-neighborhood reproduces the
    union-then-min relaxation exactly; the looped table is cached
    clustered by hash(dst) and each round is broadcast-join + one min
    agg riding that clustering — no exchange inside a round."""
    n = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # `weighted` is referenced three times below (nodes twice, looped
    # once) and re-evaluated per reference (no cross-branch CSE) — an
    # eager localCheckpoint here was A/B'd at sf1x and measured SLOWER
    # (bfs 4.30 -> 4.88 s interleaved, BENCH/s3_symmetrize_ab.json): the
    # duplicate branches run concurrently on idle cores while the
    # checkpoint pays a serial 2x-edge-row materialization up front.
    weighted = edges.select("src", "dst", w.alias("_w"))
    zero = F.lit(0).cast("long")
    nodes = (
        weighted.select(F.col("src").alias("v"))
        .unionByName(weighted.select(F.col("dst").alias("v")))
        .unionByName(dist.select(F.col("node").alias("v")))
        .distinct()
    )
    looped = (
        weighted.unionByName(
            nodes.select(F.col("v").alias("src"), F.col("v").alias("dst"),
                         zero.alias("_w"))
        )
        .repartition(n, F.col("dst"))
        .dropDuplicates(["src", "dst", "_w"])
        .persist()
    )
    for _ in range(n_rounds):
        dist = (
            looped.join(F.broadcast(dist), looped.src == dist.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("_w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    dist = dist.localCheckpoint()
    looped.unpersist(blocking=True)
    return dist


def sssp_distances(edges: DataFrame, sources: list[str],
                   n_rounds: int = 4,
                   broadcast_frontier: bool = False) -> DataFrame:
    """Single-source shortest path distances over ``edges(src, dst, w)``
    with non-negative BIGINT weights — the weighted sibling of
    :func:`bfs_distances`. Synchronous Bellman-Ford relaxation for a
    FIXED number of rounds (so the unrolled-CTE DuckDB oracle matches
    bit-for-bit; BIGINT adds are order-independent): per round, every
    edge offers ``dist[src] + w`` to its dst and each node keeps the
    minimum. Nodes not reached within ``n_rounds`` relaxations are
    absent (documented contract — at round k the result equals true
    shortest paths using ≤ k edges). Parallel edges collapse to their
    min weight up front. Same Spark shape as BFS: one shuffle join +
    map-side-combinable min agg per round, lazy localCheckpoint fuses
    rounds into one job. ``broadcast_frontier=True``: zero-shuffle
    rounds via the shared self-loop fold (see
    :func:`_relax_rounds_broadcast`; parallel edges then ride the
    relaxation's min instead of a pre-collapse — same distances)."""
    if not sources:
        raise ValueError("sssp_distances needs at least one source node")
    spark = edges.sparkSession
    ntype = dict(edges.dtypes)["src"]
    dist0 = spark.createDataFrame(
        [(s, 0) for s in sources], f"node {ntype}, dist long"
    )
    if broadcast_frontier:
        return _relax_rounds_broadcast(
            edges, dist0, F.col("w").cast("long"), n_rounds)
    edges = (
        edges.select("src", "dst", F.col("w").cast("long").alias("w"))
        .groupBy("src", "dst").agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    dist = dist0
    for _ in range(n_rounds):
        relaxed = (
            edges.join(dist, edges.src == dist.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph
    (``edges(src, dst)``, any direction; self-loops dropped, duplicate
    directions collapsed). Output: ``(node, n_triangles)`` for nodes in
    at least one triangle.

    Spark shape — the degree-ordered orientation algorithm (the standard
    scale trick, e.g. Suri & Vassilvitskii WWW'11): each edge is directed
    from its (degree, id)-smaller endpoint, so every triangle is counted
    exactly once as x→y1, x→y2, y1→y2 with x < y1 < y2 in that order, and
    the wedge join fans out per-node by min(degree) rather than degree —
    hub nodes never enumerate their quadratic neighbor pairs. Plan:
    canonicalize+distinct (one shuffle), degree agg (partial agg), two
    equi-joins (wedge build on the apex, closing-edge membership on
    (y1, y2)), explode of the TRIANGLE rows only (bounded by the result,
    not the graph), final partial-agg count. All BIGINT/comparison ops —
    bit-exact in DuckDB, no float risk."""
    e = (
        edges.select(F.col("src").alias("s"), F.col("dst").alias("t"))
        .filter(F.col("s") != F.col("t"))
        .select(
            F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b")
        )
        .distinct()
        # materialize ONCE (r6 session 3): `e` is referenced three times
        # below (deg twice, ed once) and `o` three more (e1/e2/closing) —
        # with no materialization the canonicalize+distinct subtree
        # appeared 9x in the physical plan (214 Exchange references
        # at sf0.1, plans/r06/graph_triangles_s3_before.txt) and the
        # scan+exchange+dedup ran once per appearance
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("dg"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("dg").alias("dga")),
               "a")
        .join(deg.select(F.col("n").alias("b"), F.col("dg").alias("dgb")),
              "b")
    )
    fwd = (F.col("dga") < F.col("dgb")) | (
        (F.col("dga") == F.col("dgb")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("x"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("y"),
        F.when(fwd, F.col("dgb")).otherwise(F.col("dga")).alias("yd"),
    ).localCheckpoint()  # referenced 3x below (e1, e2, closing)
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = (
        e1.join(e2, "x")
        .filter(
            (F.col("e1.yd") < F.col("e2.yd"))
            | (
                (F.col("e1.yd") == F.col("e2.yd"))
                & (F.col("e1.y") < F.col("e2.y"))
            )
        )
        .select(
            "x", F.col("e1.y").alias("y1"), F.col("e2.y").alias("y2")
        )
    )
    closing = o.select(F.col("x").alias("y1"), F.col("y").alias("y2"))
    tri = wedges.join(closing, ["y1", "y2"])
    return (
        tri.select(F.explode(F.array("x", "y1", "y2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def symmetrize(pairs: DataFrame) -> DataFrame:
    """``pairs(src, dst)`` -> both directions, for undirected-walk ranking
    (also guarantees no dangling nodes: every node has an out-edge).

    Shape note (r6 session 3, measured): Spark performs no cross-branch
    CSE, so this union evaluates the (join-shaped, for every catalog
    caller) child once PER DIRECTION. A map-side
    ``explode(array(struct(src,dst), struct(dst,src)))`` rewrite that
    evaluates the child once was A/B'd interleaved at sf1x
    (BENCH/s3_symmetrize_ab.json): pagerank 5.59 -> 5.96 s, bfs 4.30 ->
    4.88 s, ppr/lpa/sssp a wash — the union's duplicate branches run as
    INDEPENDENT CONCURRENT stage DAGs that fill otherwise-idle cores
    (guide §2.6), while the fused shape serializes the same bytes through
    one chain. The union shape is kept deliberately."""
    return pairs.select("src", "dst").unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def kcore_nodes(edges: DataFrame, k: int, n_rounds: int = 4) -> DataFrame:
    """k-core peeling over an undirected simple graph (``edges(src,
    dst)``, any direction; self-loops dropped, parallel edges collapsed).
    Output: ``(node, degree)`` — the nodes surviving ``n_rounds`` of
    synchronous peeling, with their degree in the surviving subgraph.

    The k-core (densest-cohesion subgraph where every node keeps ≥ k
    neighbors) is the standard KG-quality filter downstream of
    canonicalization: entity clusters whose mention graph survives a
    2- or 3-core are well-attested, degree-1 tendrils are noise. Each
    synchronous round removes EVERY node whose current degree is < k at
    once; the exact k-core is the fixpoint, and after r rounds the result
    is a sound over-approximation (supersets shrink monotonically, so any
    node removed by round r is provably outside the core). Rounds are
    FIXED, not run to convergence, so the unrolled-CTE DuckDB oracle
    mirrors the partial peel bit-for-bit — the same fixed-round contract
    as :func:`sssp_distances`; call sites pick ``n_rounds`` ≥ the peel
    depth of their graph if they need the exact core (peel depth is
    typically tiny: hub-capped co-occurrence graphs converge in 2-4).

    All ops are integer counts and comparisons — zero float risk.

    Scale notes (100 TB): per round ONE map-side-combinable degree agg
    (shuffle on node) + two left-semi joins of the edge table against the
    node-sized survivor set (broadcastable as soon as edges >> nodes; AQE
    picks that up at runtime). Lineage is truncated per round with lazy
    localCheckpoint like the other fixed-round iterators, so the rounds
    fuse into one submitted job.
    """
    if k < 1:
        raise ValueError("kcore_nodes needs k >= 1")
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    # both directions in one map-side explode (no cross-branch CSE in
    # Spark: the union shape evaluated `und` — scan + exchange + dedup —
    # twice while materializing the checkpoint; see symmetrize)
    both = F.explode(F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
    ))
    sym = und.select(both.alias("e")).select("e.src", "e.dst").localCheckpoint()
    for _ in range(n_rounds):
        keep = (
            sym.groupBy("src")
            .agg(F.count("*").alias("dg"))
            .filter(F.col("dg") >= k)
            .select(F.col("src").alias("node"))
        )
        sym = (
            sym.join(keep, sym.src == keep.node, "left_semi")
            .join(keep, F.col("dst") == keep.node, "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("long").alias("degree"))
    )


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          n_iters: int = 5,
                          broadcast_ranks: bool = False) -> DataFrame:
    """``edges(src, dst)`` + ``seeds(node)`` -> ``(node, rank_e12)``;
    BIGINT fixed-point PERSONALIZED PageRank (Page et al. 1999 §6 /
    Jeh & Widom WWW'03 topic-sensitive variant): the teleport mass
    returns only to the seed set, so ranks measure proximity TO THE SEEDS
    through the graph — the entity-centric relevance score a KG serves
    ("which entities matter around this incident type / this customer
    cohort"), where global PageRank measures importance to everyone.

        r_0(v)     = [v ∈ S] · (SCALE div |S|)
        r_{t+1}(v) = [v ∈ S] · (15·(SCALE div |S|)) div 100
                     + (85·Σ_{(u,v)∈E} r_t(u) div outdeg(u)) div 100

    Same exact-integer discipline as :func:`pagerank` (no float anywhere,
    ``div`` matches DuckDB ``//`` on non-negative BIGINTs), so the
    unrolled-CTE oracle matches bit-for-bit. Seeds outside the graph's
    node set are ignored (semi-join); raises via the 1-row broadcast
    division if the surviving seed set is empty (0 seeds = undefined
    teleport). Same plan shape per round as pagerank: one join + one
    map-side-combinable sum; the seed flag rides the node frame as a
    column, costing nothing extra. ``broadcast_ranks=True`` switches to
    the zero-shuffle-round strategy exactly as in :func:`pagerank` (same
    node-table-fits-broadcast contract; the per-round ``flagged``
    left-join stays — it joins two node-sized frames).
    """
    weighted = _weighted_edges(
        edges, cluster="dst" if broadcast_ranks else "src")
    nodes = (
        weighted.select(F.col("src").alias("node"))
        .unionByName(weighted.select(F.col("dst").alias("node")))
        .distinct()
    )
    flagged = nodes.join(
        seeds.select("node").distinct().withColumn("__s", F.lit(1)),
        "node", "left",
    ).select("node", F.coalesce("__s", F.lit(0)).alias("__s"))
    flagged = flagged.localCheckpoint()
    ns1 = F.broadcast(
        flagged.agg(F.sum("__s").cast("long").alias("n_seeds")))
    base = (f"(__s * {DAMP_DEN - DAMP_NUM}L * ({SCALE}L div n_seeds)) "
            f"div {DAMP_DEN}L")
    ranks = flagged.crossJoin(ns1).select(
        "node",
        F.expr(f"__s * ({SCALE}L div n_seeds)").alias("rank_e12"),
    )
    for _ in range(n_iters):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        in_mass = (
            weighted.join(rank_side, weighted.src == ranks.node)
            .select(
                F.col("dst"), F.expr("rank_e12 div outdeg").alias("contrib")
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = (
            flagged.join(in_mass, flagged.node == in_mass.dst, "left")
            .crossJoin(ns1)
            .select(
                "node",
                F.expr(
                    f"{base} + ({DAMP_NUM}L * coalesce(in_mass, 0L)) "
                    f"div {DAMP_DEN}L"
                ).alias("rank_e12"),
            )
            .localCheckpoint(eager=False)
        )
    # same cache-hygiene close as pagerank: materialize, then drop the
    # edge cache so repeat invocations recompute from their inputs
    if n_iters > 0:
        ranks = ranks.localCheckpoint()
    weighted.unpersist(blocking=True)
    return ranks
