"""Subprocess worker for tools/bench_scaling.py: runs the full KG pipeline
once at a given parallelism level and prints one JSON line with wall time,
turns/sec, and per-stage timings (mirroring the reference's stage CSV,
main.py:498-500).

Usage: python tools/_scaling_worker.py <cpus> <corpus_dir>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multilingual_wiki_event_pipeline_spark.plans import pipeline  # noqa: E402
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402
from multilingual_wiki_event_pipeline_spark.sinks import CheckpointStore  # noqa: E402
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    corpus_dir = sys.argv[2]
    # one JVM hosts every "executor" thread in local mode: size the heap
    # like a real executor fleet would be sized (the 8g default starves 32
    # threads of storage memory — task result blocks get evicted =>
    # TaskResultLost — once the relational alignment's token-table shuffle
    # is in the plan). Overridable via SPARK_DRIVER_MEM.
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    # tmpfs for shuffle + checkpoint store: the sandbox has ONE ~76 MB/s
    # sys-CPU-bound block device, a resource that on a real cluster scales
    # with the executor count (HDFS/S3/local NVMe per node). Leaving it in
    # the measurement caps both parallelism levels at the same disk ceiling
    # and measures the disk, not the engine.
    shm = tempfile.mkdtemp(prefix=f"mwep_local_{cpus}_", dir="/dev/shm")
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"mwep-scaling-{cpus}",
        shuffle_partitions=2 * cpus,
        # sandbox-scale analog of sizing spark.sql.files.maxPartitionBytes to
        # the data: the corpus is a few MB, so give the scan row-group-sized
        # splits; at 100 TB the 128 MB default gives the same >=1-split-per-core.
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.local.dir": shm,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = CorpusTables(spark, corpus_dir)
    n_turns = t.transcripts.count()

    ckpt = tempfile.mkdtemp(prefix=f"mwep_scale_{cpus}_", dir="/dev/shm")
    try:
        t0 = time.perf_counter()
        store = CheckpointStore(spark, ckpt)
        o = pipeline.build(t, store=store)
        # materialize every pipeline output (the real workload is writes,
        # not driver-side counts). The five outputs fold into ONE tagged
        # write job (sinks.write_layer_union): one Catalyst analysis, one
        # job schedule, one commit — instead of five serial floors that
        # do not shrink with cores. Row counts come from the recorded
        # lineage footers afterwards — zero extra jobs.
        from multilingual_wiki_event_pipeline_spark.sinks import (
            layer_row_counts,
            write_layer_union,
        )

        outs = {
            "mentions": o.mentions,
            "full_triples": o.full_triples,
            "pilot_triples": o.pilot_triples,
            "corefs": o.corefs,
            "srl_links": o.srl_links,
        }
        # A/B knobs for the output representation: MWEP_PAYLOAD overrides;
        # unset means MEASURE THE SHIPPED DEFAULT (write_layer_union's own
        # default), so the scaling evidence always tracks the config users
        # actually get (round-3 verdict item 1).
        import inspect

        default_payload = inspect.signature(
            write_layer_union
        ).parameters["payload"].default
        payload = os.environ.get("MWEP_PAYLOAD", default_payload)
        codec = os.environ.get("MWEP_CODEC") or None
        write_layer_union(store, outs, "out_layers", payload=payload,
                          compression=codec)
        wall = time.perf_counter() - t0
        counts = layer_row_counts(store, "out_layers")
        import pyarrow.parquet as pq

        stage_wall: dict[str, float] = {}
        ldir = os.path.join(ckpt, "_lineage")
        for fn in os.listdir(ldir):
            lt = pq.read_table(os.path.join(ldir, fn), columns=["stage", "wall_sec"])
            for s, w in zip(lt["stage"].to_pylist(), lt["wall_sec"].to_pylist()):
                stage_wall[s] = w
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(shm, ignore_errors=True)

    print(json.dumps({
        "cpus": cpus,
        "n_turns": n_turns,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "payload": payload,
        "codec": codec or "session-default",
        "counts": counts,
        "stage_wall_sec": stage_wall,
    }))


if __name__ == "__main__":
    main()
