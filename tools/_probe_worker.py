"""Diagnostic twin of _scaling_worker.py: same job, same confs, plus
-Xlog:gc GC logging and WARN-level Spark logs, to attribute the local[32]
absolute-slowdown anomaly (BENCH/scaling_8v32.json round 5) to GC, task
retries, or scheduler pathology.

Usage: python tools/_probe_worker.py <cpus> <corpus_dir> [gc_log_path]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multilingual_wiki_event_pipeline_spark.plans import pipeline  # noqa: E402
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402
from multilingual_wiki_event_pipeline_spark.sinks import (  # noqa: E402
    CheckpointStore,
    layer_row_counts,
    write_layer_union,
)
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    corpus_dir = sys.argv[2]
    gc_log = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/gc_{cpus}.log"
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    shm = tempfile.mkdtemp(prefix=f"mwep_probe_{cpus}_", dir="/dev/shm")
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"mwep-probe-{cpus}",
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.local.dir": shm,
            "spark.driver.extraJavaOptions": f"-Xlog:gc:{gc_log}",
        },
    )
    spark.sparkContext.setLogLevel("WARN")
    t = CorpusTables(spark, corpus_dir)
    n_turns = t.transcripts.count()

    ckpt = tempfile.mkdtemp(prefix=f"mwep_probeck_{cpus}_", dir="/dev/shm")
    try:
        t0 = time.perf_counter()
        store = CheckpointStore(spark, ckpt)
        o = pipeline.build(t, store=store)
        outs = {
            "mentions": o.mentions,
            "full_triples": o.full_triples,
            "pilot_triples": o.pilot_triples,
            "corefs": o.corefs,
            "srl_links": o.srl_links,
        }
        write_layer_union(store, outs, "out_layers")
        wall = time.perf_counter() - t0
        counts = layer_row_counts(store, "out_layers")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(shm, ignore_errors=True)

    gc_pause_total = 0.0
    gc_events = 0
    if os.path.exists(gc_log):
        pat = re.compile(r"Pause[^\n]*?(\d+\.\d+)ms")
        with open(gc_log) as f:
            for line in f:
                m = pat.search(line)
                if m:
                    gc_pause_total += float(m.group(1)) / 1000.0
                    gc_events += 1

    print(json.dumps({
        "cpus": cpus,
        "n_turns": n_turns,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "counts": counts,
        "gc_pause_total_sec": round(gc_pause_total, 2),
        "gc_events": gc_events,
        "gc_log": gc_log,
    }))


if __name__ == "__main__":
    main()
