"""Similarity search over an embedding column (``array<float>``).

Two paths over ``embeddings(vec_id bigint, embedding array<float>, label int)``:

- brute-force cosine top-k: the correctness baseline; O(Q×N) pairs via a
  (broadcastable) join, dot products with built-in higher-order functions
  (``zip_with`` + ``aggregate``), rank with a window. No Python.
- LSH-bucketed ANN: sign-bit bucketing (random-hyperplane LSH with axis
  hyperplanes — deterministic, oracle-checkable); candidates join on the
  bucket key so the pair count is O(sum of bucket² ) not O(N²). The 100 TB
  path: buckets shard the shuffle; skewed buckets split by AQE.

For real workloads swap the axis hyperplanes for seeded random projections
(same plan shape: bucket = packed sign bits of ``dot(v, r_i)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: str | Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(u: Column, w: Column) -> Column:
    return F.aggregate(
        F.zip_with(u, w, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(u: Column, w: Column) -> Column:
    return _dot(u, w) / (F.sqrt(_dot(u, u)) * F.sqrt(_dot(w, w)))


def brute_force_topk(
    embeddings: DataFrame, k: int = 5, query_pred: Column | None = None
) -> DataFrame:
    """Exact top-k cosine neighbors for rows matching ``query_pred``.

    Plan: queries × candidates join (broadcast the query side when small —
    the common ANN-serving shape), windowed rank. Similarity rounded to 6
    decimals and tie-broken on neighbor_id for determinism.
    """
    from pyspark.sql import Window

    e = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    q = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    if query_pred is not None:
        q = q.filter(query_pred)
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    pairs = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def sign_bucket(v: Column, n_bits: int = 8) -> Column:
    """Pack sign bits of the first ``n_bits`` dims into a bucket id."""
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(v, i + 1) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket.cast("long")


def lsh_bucketed_topk(
    embeddings: DataFrame, k: int = 3, query_pred: Column | None = None,
    n_bits: int = 8,
) -> DataFrame:
    """ANN: top-k within the query's LSH bucket (approximate, scalable).

    The candidate join is EQUI on bucket — shuffle partitions by bucket id,
    so a 10^9-vector table fans out only within buckets. For higher recall
    at the same plan shape see ``multiprobe_lsh_topk``.
    """
    from pyspark.sql import Window

    e = embeddings.select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("bucket", sign_bucket(F.col("v"), n_bits))
    q = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "bucket",
    )
    if query_pred is not None:
        q = q.filter(query_pred)
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("bucket").alias("c_bucket"),
    )
    pairs = (
        q.join(
            c,
            (F.col("bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("bucket"),
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def multiprobe_lsh_topk(
    embeddings: DataFrame, k: int = 3, query_pred: Column | None = None,
    n_bits: int = 8, n_probes: int = 2,
) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket PLUS its
    ``n_probes`` single-bit-flip neighbor buckets (``bucket XOR 2^i`` — the
    standard multi-probe sequence restricted to Hamming distance 1, and
    deterministic so an exact SQL oracle can mirror it).

    Plan shape is identical to ``lsh_bucketed_topk``: one EQUI join on the
    probed bucket key. The probe fan-out multiplies only the (filtered)
    QUERY side by ``n_probes + 1``; the candidate table is never replicated,
    so at 10^9 vectors the extra cost is a slightly wider query broadcast.
    A (query, neighbor) pair appears at most once — every candidate lives
    in exactly one bucket and the probe keys are distinct — so no dedup
    step is needed before the ranking window.

    Measured recall vs ``brute_force_topk`` on the driver embeddings table
    rises with probes (see BENCH/BASELINE.md, "ANN recall"): flipping the
    lowest sign bits probes the hyperplanes the query is closest to.
    """
    from pyspark.sql import Window

    e = embeddings.select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("bucket", sign_bucket(F.col("v"), n_bits))
    q = e.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    if query_pred is not None:
        q = q.filter(query_pred)
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_probes)],
    )
    q = q.select("query_id", "qv", F.explode(probes).alias("probe"))
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("bucket").alias("c_bucket"),
    )
    pairs = (
        q.join(
            c,
            (F.col("probe") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def assign_cells(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF coarse assignment: each vector joins the (dimension-sized,
    broadcast) centroid table and keeps its nearest cell by cosine — the
    standard O(N x C) inverted-file assign, one narrow pass over the
    vectors, no shuffle of the vector table.

    centroids(cell, centroid array<double>) -> (vec_id, v, cell)."""
    from pyspark.sql import Window

    e = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    c = centroids.select("cell", "centroid")
    scored = e.crossJoin(F.broadcast(c)).select(
        "vec_id", "v", "cell",
        cosine(F.col("v"), F.col("centroid")).alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cell")
    )


def ivf_topk(embeddings: DataFrame, centroids: DataFrame, k: int = 3,
             query_pred: Column | None = None, n_probe: int = 1) -> DataFrame:
    """IVF ANN: vectors are inverted-file-partitioned by nearest centroid
    (``assign_cells``); each query searches its ``n_probe`` nearest cells.

    The candidate join is EQUI on cell — same scale shape as the LSH paths
    (shuffle partitions by cell, skewed cells split by AQE); the centroid
    table is the trained coarse quantizer (``label_centroids`` is the
    sandbox stand-in for a k-means trainer — same output schema).
    Raising ``n_probe`` trades compute for recall exactly like multi-probe
    LSH, but probes are the query's *nearest* cells rather than bit flips,
    which tracks the data distribution instead of the hash geometry.
    """
    from pyspark.sql import Window

    assigned = assign_cells(embeddings, centroids)
    c = centroids.select("cell", "centroid")
    q = assigned.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    if query_pred is not None:
        q = q.filter(query_pred)
    q_cells = (
        q.crossJoin(F.broadcast(c))
        .select(
            "query_id", "qv", "cell",
            cosine(F.col("qv"), F.col("centroid")).alias("csim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("csim"), F.asc("cell")
                )
            ),
        )
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cands = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        "cell",
    )
    pairs = (
        q_cells.join(cands, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label mean vector (the IVF coarse-quantizer training step) —
    output schema (cell, centroid) feeds ``ivf_topk`` directly.

    posexplode → groupBy(label, pos) avg → re-assemble in pos order.
    One shuffle on (label, pos); reassembly is a small second shuffle.
    """
    exploded = embeddings.select(
        "label", F.posexplode(_as_double("embedding")).alias("pos", "x")
    )
    per_dim = exploded.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell"), "centroid")
    )
