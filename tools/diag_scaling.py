"""Scaling diagnosis: run the KG pipeline once at a given parallelism with
Spark event-logging on, tag every pipeline phase as a Spark job group, then
aggregate per-phase task metrics from the event log.

Per phase it reports: wall, sum of task run time (task-seconds), sum of
executor CPU time, GC time, python-UDF time, task count, max task wall —
enough to split a poor per-phase speedup into (a) extra work at higher
parallelism (task-seconds grow: contention / memory stalls), (b) idle cores
(task-seconds flat but wall floor: stragglers, low partition counts, serial
driver time between jobs).

Usage: python tools/diag_scaling.py <cpus> <corpus_dir> [out.json]
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
from multilingual_wiki_event_pipeline_spark import sinks  # noqa: E402
from multilingual_wiki_event_pipeline_spark.sinks import CheckpointStore  # noqa: E402
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    corpus_dir = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    shm = tempfile.mkdtemp(prefix=f"mwep_local_{cpus}_", dir="/dev/shm")
    evdir = tempfile.mkdtemp(prefix="mwep_evlog_", dir="/dev/shm")
    extra_conf = {
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
        "spark.local.dir": shm,
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
    }
    spark = get_spark(master=f"local[{cpus}]",
                      app_name=f"mwep-diag-{cpus}",
                      shuffle_partitions=2 * cpus, extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # tag each materialized phase as a job group
    orig_mat = CheckpointStore.materialize

    phase_wall: dict[str, float] = {}

    def tagged_mat(self, df, stage, partition_by=(), compression=None):
        sc.setJobGroup(stage, stage)
        t0 = time.perf_counter()
        try:
            return orig_mat(self, df, stage, partition_by, compression)
        finally:
            phase_wall[stage] = phase_wall.get(stage, 0.0) + (
                time.perf_counter() - t0)
            sc.setJobGroup("untagged", "untagged")

    CheckpointStore.materialize = tagged_mat

    t = CorpusTables(spark, corpus_dir)
    n_turns = t.transcripts.count()
    ckpt = tempfile.mkdtemp(prefix=f"mwep_scale_{cpus}_", dir="/dev/shm")
    try:
        t0 = time.perf_counter()
        store = CheckpointStore(spark, ckpt)
        sc.setJobGroup("untagged", "untagged")
        o = pipeline.build(t, store=store)
        outs = {
            "mentions": o.mentions,
            "full_triples": o.full_triples,
            "pilot_triples": o.pilot_triples,
            "corefs": o.corefs,
            "srl_links": o.srl_links,
        }
        sc.setJobGroup("out_layers", "out_layers")
        tw0 = time.perf_counter()
        sinks.write_layer_union(store, outs, "out_layers")
        phase_wall["out_layers"] = time.perf_counter() - tw0
        wall = time.perf_counter() - t0
    finally:
        CheckpointStore.materialize = orig_mat

    # --- aggregate the event log -------------------------------------------
    applog = None
    for fn in os.listdir(evdir):
        if not fn.startswith("."):
            applog = os.path.join(evdir, fn)
    spark.stop()

    stage_to_group: dict[int, str] = {}
    agg: dict[str, dict] = {}

    def bucket(g):
        return agg.setdefault(g, {
            "task_run_sec": 0.0, "task_cpu_sec": 0.0, "gc_sec": 0.0,
            "python_sec": 0.0, "deser_sec": 0.0, "shuffle_wait_sec": 0.0,
            "write_sec": 0.0, "n_tasks": 0, "max_task_sec": 0.0,
            "n_stages": 0,
        })

    with open(applog) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get(
                    "spark.jobGroup.id", "untagged")
                for si in ev.get("Stage Infos", []):
                    stage_to_group[si["Stage ID"]] = grp
            elif et == "SparkListenerStageCompleted":
                g = stage_to_group.get(
                    ev["Stage Info"]["Stage ID"], "untagged")
                bucket(g)["n_stages"] += 1
            elif et == "SparkListenerTaskEnd":
                g = stage_to_group.get(ev.get("Stage ID", -1), "untagged")
                m = ev.get("Task Metrics") or {}
                b = bucket(g)
                run = m.get("Executor Run Time", 0) / 1e3
                b["task_run_sec"] += run
                b["task_cpu_sec"] += m.get("Executor CPU Time", 0) / 1e9
                b["gc_sec"] += m.get("JVM GC Time", 0) / 1e3
                b["deser_sec"] += m.get(
                    "Executor Deserialize Time", 0) / 1e3
                sr = m.get("Shuffle Read Metrics") or {}
                b["shuffle_wait_sec"] += sr.get("Fetch Wait Time", 0) / 1e3
                ow = m.get("Output Metrics") or {}
                b["write_sec"] += 0.0 if not ow else 0.0
                b["n_tasks"] += 1
                b["max_task_sec"] = max(b["max_task_sec"], run)
                # python udf time lives in accumulables
                ti = ev.get("Task Info") or {}
                for acc in ti.get("Accumulables", []):
                    if acc.get("Name") == "time to run python workers":
                        try:
                            b["python_sec"] += float(acc["Update"]) / 1e3
                        except (TypeError, ValueError):
                            pass

    for g, b in agg.items():
        for k in list(b):
            if isinstance(b[k], float):
                b[k] = round(b[k], 2)
        b["wall_sec"] = round(phase_wall.get(g, 0.0), 2)
        if b["wall_sec"]:
            b["busy_frac"] = round(
                b["task_run_sec"] / (b["wall_sec"] * cpus), 3)

    result = {
        "cpus": cpus, "n_turns": n_turns, "wall_sec": round(wall, 2),
        "phases": agg,
    }
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(shm, ignore_errors=True)
    shutil.rmtree(evdir, ignore_errors=True)
    line = json.dumps(result)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)
    print(line)


if __name__ == "__main__":
    main()
