"""ANN operator semantics (brief-side training-data components): IVF
(inverted-file) search, multi-probe LSH, and their relation to the exact
brute-force baseline. Synthetic in-memory vectors — no driver testdata."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from multilingual_wiki_event_pipeline_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    """Three well-separated clusters of 4-d vectors, labeled by cluster —
    the label doubles as the IVF training partition."""
    rng = random.Random(7)
    anchors = {0: (1, 0, 0, 0), 1: (0, 1, 0, 0), 2: (0, 0, 1, 1)}
    rows = []
    for vec_id in range(36):
        lab = vec_id % 3
        v = [a + rng.uniform(-0.15, 0.15) for a in anchors[lab]]
        rows.append((vec_id, [float(x) for x in v], lab))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _pairs(df):
    return {(r.query_id, r.neighbor_id): r.sim for r in df.collect()}


def test_assign_cells_nearest_centroid(spark, emb):
    cents = similarity.label_centroids(emb)
    assigned = {r.vec_id: r.cell for r in
                similarity.assign_cells(emb, cents).collect()}
    # clusters are well separated: every vector must land in its own
    # cluster's centroid cell
    assert assigned == {i: i % 3 for i in range(36)}


def test_ivf_full_probe_equals_brute_force(spark, emb):
    """Probing every cell makes IVF exhaustive — it must equal the exact
    brute-force top-k, tie-break and all."""
    cents = similarity.label_centroids(emb)
    bf = _pairs(similarity.brute_force_topk(
        emb, k=3, query_pred=F.col("query_id") < 12))
    ivf = _pairs(similarity.ivf_topk(
        emb, cents, k=3, query_pred=F.col("query_id") < 12, n_probe=3))
    assert ivf == bf


def test_kmeans_trained_ivf_full_probe_equals_brute_force(spark, emb):
    """The UNSUPERVISED coarse quantizer (relational Lloyd over
    assign_cells + per-cell means) must make full-probe IVF exhaustive —
    equal to brute force regardless of where the trained cells landed."""
    cents = similarity.kmeans_centroids(emb, k=3, n_iters=4)
    assert cents.count() == 3  # empty-cell guard keeps k constant
    bf = _pairs(similarity.brute_force_topk(
        emb, k=3, query_pred=F.col("query_id") < 12))
    ivf = _pairs(similarity.ivf_topk(
        emb, cents, k=3, query_pred=F.col("query_id") < 12, n_probe=3))
    assert ivf == bf


def test_kmeans_recovers_separated_clusters(spark, emb):
    """On three well-separated clusters, Lloyd from first-k init must
    converge to one cell per true cluster (cell ids are arbitrary; the
    partition must match the labels)."""
    cents = similarity.kmeans_centroids(emb, k=3, n_iters=5)
    assigned = {r.vec_id: r.cell for r in
                similarity.assign_cells(emb, cents).collect()}
    by_label: dict[int, set[int]] = {}
    for vec_id, cell in assigned.items():
        by_label.setdefault(vec_id % 3, set()).add(cell)
    # each true cluster maps to exactly one cell, and no two share one
    assert all(len(cells) == 1 for cells in by_label.values())
    assert len({next(iter(c)) for c in by_label.values()}) == 3


def test_ivf_single_probe_stays_in_cluster(spark, emb):
    cents = similarity.label_centroids(emb)
    got = similarity.ivf_topk(
        emb, cents, k=3, query_pred=F.col("query_id") < 12, n_probe=1
    ).collect()
    assert got, "single-probe IVF returned nothing"
    for r in got:
        assert r.query_id % 3 == r.neighbor_id % 3, (
            "single-probe candidate escaped the query's cell"
        )


def test_multiprobe_superset_of_single_probe(spark, emb):
    """Multi-probe recall is monotone: every (query, neighbor) the
    single-bucket search finds is also found with probes added, and the
    reported sims agree with the exact cosine."""
    single = _pairs(similarity.lsh_bucketed_topk(emb, k=36, n_bits=4, dim=4))
    multi = _pairs(similarity.multiprobe_lsh_topk(
        emb, k=36, n_bits=4, n_probes=2, dim=4))
    assert set(single) <= set(multi)
    # sims are the exact cosine, rounded — spot-check against a local calc
    rows = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a))
                      * math.sqrt(sum(y * y for y in b)))

    for (q, n), sim in list(multi.items())[:10]:
        assert sim == pytest.approx(cos(rows[q], rows[n]), abs=1e-5)


def test_quantize_embeddings_values_and_zero_vector(spark):
    from multilingual_wiki_event_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )
    e = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in quantize_embeddings(e).collect()}
    # max_abs=1.0: q = round(127*x) = [127, -64, 32] (HALF_UP: -63.5 -> -64)
    assert got[1].qvec == [127, -64, 32]
    assert got[1].qnorm == 127 * 127 + 64 * 64 + 32 * 32
    assert abs(got[1].scale - 1.0 / 127) < 1e-9
    assert got[2].qvec == [0, 0, 0] and got[2].qnorm == 0
    assert got[2].scale == 0.0


def test_quantized_topk_matches_float_ranking_roughly(spark):
    from multilingual_wiki_event_pipeline_spark.operators import similarity
    import pyspark.sql.functions as F
    # 4 well-separated directions: quantized cosine must reproduce the
    # exact ranking (int8 error ~1/127 << the similarity gaps)
    e = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
         (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    qk = similarity.quantized_topk(
        e, k=3, query_pred=F.col("query_id") == 0
    ).collect()
    assert [r.neighbor_id for r in qk] == [1, 2, 3]
    # zero vectors are excluded from both sides, not NaN-ranked
    e2 = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    qk2 = similarity.quantized_topk(
        e2, k=5, query_pred=F.col("query_id") == 0
    ).collect()
    assert [r.neighbor_id for r in qk2] == [2]


def test_semantic_dedup_keep_min_id(spark):
    # two clusters; 10/11 duplicate each other, 12 is their near-dup by a
    # hair less -> within-cluster keep-min-id keeps 10, drops 11
    e = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]),
         (11, [1.0, 0.0, 0.0, 0.0]),
         (12, [0.9, 0.1, 0.0, 0.0]),
         (20, [0.0, 0.0, 1.0, 0.0]),
         (21, [0.0, 0.0, 0.9, 0.1])],
        "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])],
        "cell int, centroid array<double>")
    out = {r["vec_id"]: r
           for r in similarity.semantic_dedup(e, cents, 0.999).collect()}
    assert out[10]["kept"] is True and out[11]["kept"] is False
    assert out[12]["kept"] is True          # cos(12, 10) < 0.999
    assert out[20]["kept"] is True and out[21]["kept"] is True
    assert out[10]["cell"] == 0 and out[20]["cell"] == 1


def test_semantic_dedup_cell_confinement(spark):
    # near-dup vectors that land in DIFFERENT cells never pair: the
    # quadratic term really is confined to cells (the scale contract; at
    # the cell boundary SemDeDup accepts missing cross-cell pairs). Each
    # vector sits exactly on its own centroid; their mutual cosine 0.8776
    # clears the 0.5 threshold, so a join that leaked across cells would
    # drop vec 2.
    import math

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [math.cos(0.5), math.sin(0.5)])],
        "cell int, centroid array<double>")
    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [math.cos(0.5), math.sin(0.5)])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           similarity.semantic_dedup(e, cents, 0.5).collect()}
    assert out[1]["cell"] == 0 and out[2]["cell"] == 1
    assert out[1]["kept"] is True and out[2]["kept"] is True
    # same geometry, one cell: the pair IS checked and 2 drops
    one_cell = cents.filter("cell = 0")
    out1 = {r["vec_id"]: r["kept"] for r in
            similarity.semantic_dedup(e, one_cell, 0.5).collect()}
    assert out1 == {1: True, 2: False}


def test_semantic_dedup_pairwise_not_transitive(spark):
    # V-shape: 3 is near BOTH 1 and 2, but 1 and 2 are not near each
    # other. Pairwise keep-min-id keeps 2 (its only near neighbor has a
    # LARGER id); a connected-components grouping would fold {1,2,3} into
    # one group and drop 2 as well -- the documented deviation.
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    e = spark.createDataFrame(
        [(1, unit(0.0)), (2, unit(1.0)), (3, unit(0.5))],
        "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cell int, centroid array<double>")
    thr = 0.87  # cos(0.5)=0.8776 >= thr, cos(1.0)=0.5403 < thr
    out = {r["vec_id"]: r["kept"]
           for r in similarity.semantic_dedup(e, cents, thr).collect()}
    assert out == {1: True, 2: True, 3: False}


def test_semantic_dedup_buckets_drops_identical(spark):
    # identical vectors always share every projection sign -> same
    # bucket -> keep-min-id fires regardless of the hyperplane draw
    e = spark.createDataFrame(
        [(1, [0.3] * 64), (2, [0.3] * 64), (3, [-0.4] * 64)],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           similarity.semantic_dedup_buckets(e, 0.999, n_bits=6).collect()}
    assert out[1]["kept"] is True and out[2]["kept"] is False
    assert out[1]["cell"] == out[2]["cell"]
    # 3 is the exact negation: opposite side of every hyperplane
    assert out[3]["kept"] is True and out[3]["cell"] != out[1]["cell"]


def test_semantic_dedup_both_tiers_match_pairwise_reference(spark):
    # both tiers must implement the SAME keep rule over whatever cell
    # assignment they produced: recompute the expectation in Python from
    # each tier's OWN reported cells and compare
    import math

    def cos(u, w):
        du = sum(x * y for x, y in zip(u, w))
        return du / math.sqrt(sum(x * x for x in u)) / math.sqrt(
            sum(x * x for x in w))

    vecs = [(i, [math.cos(0.2 * i), math.sin(0.2 * i)] + [0.0] * 62)
            for i in range(8)]
    by_id = dict(vecs)
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    one_cell = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 63)], "cell int, centroid array<double>")

    for out in (
        similarity.semantic_dedup(e, one_cell, 0.9).collect(),
        similarity.semantic_dedup_buckets(e, 0.9, n_bits=2).collect(),
    ):
        cells = {r["vec_id"]: r["cell"] for r in out}
        got = {r["vec_id"]: r["kept"] for r in out}
        expect = {
            i: not any(
                j < i and cells[j] == cells[i]
                and round(cos(by_id[i], by_id[j]), 6) >= 0.9
                for j in by_id)
            for i in by_id
        }
        assert got == expect
