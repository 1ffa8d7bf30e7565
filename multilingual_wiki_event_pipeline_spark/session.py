"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point, scaled down for local test
runs: AQE on (runtime re-plan + skew-join splitting), Arrow on (all Python
kernels are pandas/Arrow-batched — no per-row Python anywhere), shuffle
partitions sized to the parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "mwep-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to 2x the local core count — on a real
    cluster this would be set to ~2-3x total executor cores and AQE
    coalesces down from there.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        ncores = _core_count(master, cpus)
        shuffle_partitions = max(8, 2 * ncores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime partition coalescing, skew-join splitting, join re-plan.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Keep AQE's parallelism-first coalescing (the default): this
        # workload is CPU-dense but byte-light (compressed text shuffles),
        # so advisory-size-first coalescing starves stages down to 1-2
        # tasks. Parallelism-first keeps >= total-cores partitions; the
        # stage-boundary materialization in sinks.py is what keeps small
        # runs from drowning in re-analysis, not partition-count tuning.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF / mapInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Broadcast threshold: dimension tables (gazetteer, role mappings,
        # sitelinks) are broadcast; raise from default 10 MB.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # commit algorithm 2: task-side output promotion instead of a
        # serial driver-side rename pass per job (matters with many
        # materialized stage boundaries; at 1000 executors the v1 commit
        # is a notorious serial tail).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # zstd for all parquet writes: stage boundaries are URI/text-heavy
        # and highly repetitive — on this sandbox's slow (sys-CPU-bound)
        # block device smaller files beat snappy's faster codec, and at
        # 100 TB zstd is the standard cold-data choice anyway.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Skip Hadoop's checksum LocalFileSystem for local writes: it
        # doubles every create (.crc twin) and, with no native-hadoop lib,
        # falls back to fork/exec'ing `chmod`/`ls` per metadata op — the
        # round-5 probes measured those spawns convoying every executor
        # thread on the JVM's mmap_lock. Real deployments commit through
        # HDFS/S3 committers; RawLocalFileSystem is the faithful local
        # stand-in (parquet bytes are identical, just no .crc siblings).
        .config("spark.hadoop.fs.file.impl",
                "org.apache.hadoop.fs.RawLocalFileSystem")
    )
    # Fix the driver heap (-Xms = -Xmx) and pre-touch it at JVM start —
    # standard fleet practice (executors are sized, not elastic), and on
    # this sandbox it is load-bearing: an Xmx-only G1 heap cycles
    # commit -> GC -> uncommit -> re-fault, and the host backs only
    # ~18 GB of the VM's advertised RAM (tools/page_touch_ceiling.py;
    # BENCH/BASELINE.md "memory-backing cliff"), so a wandering heap
    # intermittently falls off a 100x-slower first-touch path. Opt out
    # with SPARK_HEAP_FIXED=0 (e.g. to run many concurrent sessions).
    merged_java_opts = False
    if os.environ.get("SPARK_HEAP_FIXED", "1") != "0":
        mem = os.environ.get("SPARK_DRIVER_MEM", "8g")
        fixed_opts = f"-Xms{mem} -XX:+AlwaysPreTouch"
        user_opts = (extra_conf or {}).get("spark.driver.extraJavaOptions", "")
        builder = builder.config(
            "spark.driver.extraJavaOptions", f"{fixed_opts} {user_opts}".strip()
        )
        merged_java_opts = True
    for k, v in (extra_conf or {}).items():
        if merged_java_opts and k == "spark.driver.extraJavaOptions":
            continue  # merged above
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _core_count(master: str, default: int) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or default
        try:
            return int(inner)
        except ValueError:
            return default
    return default
