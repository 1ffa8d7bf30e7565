"""Targeted A/B probe for the s03 mention-alignment stage's task grain.

Round-5 scaling diagnosis (tools/diag_scaling.py over the 30k corpus)
showed the mapInPandas alignment stage carrying a ~23 s largest task at
BOTH local[1] and local[4]: the kernel input inherited byte-balanced
shuffle sizing (2x-cores partitions), so one fat Python task capped the
stage speedup at ~2x (the clean 120k 1v4 pair read s03 efficiency 0.51).

This probe times align_mentions alone — reading the REAL s02_pilot_texts
stage output from a kept checkpoint — at one parallelism level, for a
given kernel_partitions setting, with interleaved sentinel-metered reps.

Usage:
  python tools/probe_align.py <cpus> <ckpt_dir> <corpus_dir> \
      <kernel_partitions: int|auto|none> [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentinel import (  # noqa: E402
    REJECT_BW_RATIO, REJECT_P75_RATIO, bandwidth_wall, calibrate,
    calibrate_bandwidth, sentinel_wall,
)

from multilingual_wiki_event_pipeline_spark.operators import mentions as M  # noqa: E402
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    ckpt_dir, corpus_dir, kp_arg = sys.argv[2], sys.argv[3], sys.argv[4]
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    kp = None if kp_arg == "none" else (
        "auto" if kp_arg == "auto" else int(kp_arg))

    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    shm = tempfile.mkdtemp(prefix=f"mwep_probe_{cpus}_", dir="/dev/shm")
    extra_conf = {
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
        "spark.local.dir": shm,
    }
    # hypothesis probes: merge arbitrary confs, e.g.
    # MWEP_PROBE_EXTRA_CONF='{"spark.cleaner.periodicGC.interval":"45s"}'
    extra_conf.update(json.loads(os.environ.get("MWEP_PROBE_EXTRA_CONF", "{}")))
    spark = get_spark(master=f"local[{cpus}]", app_name=f"probe-align-{cpus}",
                      shuffle_partitions=2 * cpus, extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    floor = calibrate()
    bw_floor = calibrate_bandwidth()
    texts = spark.read.parquet(os.path.join(ckpt_dir, "s02_pilot_texts"))
    anns = CorpusTables(spark, corpus_dir).annotations

    walls = []
    n = None
    try:
        for rep in range(reps + 1):  # rep 0 = untimed warm-up
            s0, b0 = sentinel_wall(), bandwidth_wall()
            t0 = time.perf_counter()
            n = M.align_mentions(texts, anns, kernel_partitions=kp).count()
            wall = round(time.perf_counter() - t0, 3)
            s1, b1 = sentinel_wall(), bandwidth_wall()
            scratch_mb = round(sum(
                os.path.getsize(os.path.join(dp, fn))
                for dp, _, fns in os.walk(shm) for fn in fns
            ) / 1e6, 1)
            if rep == 0:
                continue
            ratio = round(max(s0, s1) / floor, 3)
            bw_ratio = round(max(b0, b1) / bw_floor, 3)
            walls.append({"wall_sec": wall, "sentinel_ratio": ratio,
                          "bw_ratio": bw_ratio,
                          "accepted": ratio <= REJECT_P75_RATIO
                          and bw_ratio <= REJECT_BW_RATIO,
                          "scratch_mb_after": scratch_mb})
    finally:
        spark.stop()
        shutil.rmtree(shm, ignore_errors=True)
    accepted = [w["wall_sec"] for w in walls if w["accepted"]]
    print(json.dumps({
        "cpus": cpus, "kernel_partitions": kp_arg, "n_mentions": n,
        "best_accepted": min(accepted) if accepted else None,
        "reps": walls, "sentinel_floor": round(floor, 3),
    }))


if __name__ == "__main__":
    main()
