"""Measure recall@k of the shipped ANN operators vs the exact brute-force
baseline on the driver embeddings tables (extends the BENCH/BASELINE.md
"ANN recall" table; round-4: seeded random projections + retuned defaults).

Usage: python tools/ann_recall.py [sf_dir ...]
Prints one JSON line per (sf, operator, config).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from multilingual_wiki_event_pipeline_spark.operators import similarity  # noqa: E402
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402

K = 3
N_QUERIES = 50  # matches the catalog entries' query_pred


def pairs(df) -> set[tuple]:
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="mwep-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pred = F.col("query_id") < N_QUERIES
        truth = pairs(similarity.brute_force_topk(emb, k=K, query_pred=pred))
        configs = [
            ("ann_lsh_bucketed(default)", similarity.lsh_bucketed_topk(
                emb, k=K, query_pred=pred)),
            ("ann_multiprobe(default)", similarity.multiprobe_lsh_topk(
                emb, k=K, query_pred=pred)),
            ("lsh n_bits=2", similarity.lsh_bucketed_topk(
                emb, k=K, query_pred=pred, n_bits=2)),
            ("multiprobe n_bits=4 probes=4", similarity.multiprobe_lsh_topk(
                emb, k=K, query_pred=pred, n_bits=4, n_probes=4)),
            ("ivf kmeans k=8 probe=2", similarity.ivf_topk(
                emb, similarity.kmeans_centroids(emb, k=8, n_iters=4),
                k=K, query_pred=pred, n_probe=2)),
            ("ivf kmeans k=8 probe=4", similarity.ivf_topk(
                emb, similarity.kmeans_centroids(emb, k=8, n_iters=4),
                k=K, query_pred=pred, n_probe=4)),
        ]
        for name, df in configs:
            got = pairs(df)
            recall = len(got & truth) / len(truth)
            print(json.dumps({
                "sf_dir": sf_dir, "operator": name,
                "recall_at_3": round(recall, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
