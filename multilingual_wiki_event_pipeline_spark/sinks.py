"""Checkpointed stage materialization, lineage, and the partitioned triple
sink (SURVEY K1/K3/K5 + the north rule's resumability requirement).

The reference wipes its output dirs on every run (main.py:283-288) and keeps
everything in driver memory; a 10^12-turn run cannot do either. Here every
stage boundary is materialized to the checkpoint store (Iceberg when a
catalog is configured, parquet-by-path otherwise — same interface as
sources/tables.py) with:

- **resume**: a stage whose output is already complete (`_SUCCESS`) is NOT
  recomputed — a rerun after executor/driver failure skips finished stages
  and recomputes only the tail. Writes go to a temp dir + atomic rename so a
  killed write never looks complete.
- **lineage**: one row per (stage, output file) with row count and bytes,
  appended to `<root>/_lineage`; per-stage counters (rows in/out, wall
  seconds) appended to `<root>/_counters`. These are the per-partition
  lineage rows + metrics of the north rule — queryable DataFrames, not logs.
- **plan truncation**: reading the boundary back gives downstream stages a
  shallow scan instead of the full upstream lineage — the Spark-native
  equivalent of the reference's per-stage pickle bins (main.py:361-363),
  and what keeps Catalyst analysis cost flat as the DAG grows.

The final triple sink partitions by a salted bucket of the subject so one
hot incident type / mega-conversation cannot produce a straggler partition
file (north rule's explicit skew handling; reference suffers exactly this,
one mega event type = one giant loop iteration).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, file string, n_rows long, n_bytes long, wall_sec double, "
    "run_id string, ts double"
)
COUNTER_SCHEMA = "stage string, metric string, value double, run_id string, ts double"


@dataclass
class CheckpointStore:
    """Stage-boundary materializer with resume + lineage.

    ``materialize(df, stage)`` returns a DataFrame reading the stored
    boundary; the compute is skipped entirely when the boundary is already
    complete (idempotent overwrite-by-stage, reference K6's idempotence
    guard xml_utils.py:364-369 generalized).
    """

    spark: SparkSession
    root: str
    catalog: str | None = None  # Iceberg catalog, e.g. "iceberg_cat.mwep_ckpt"
    run_id: str = ""
    fingerprint: str = ""  # run manifest: hash of (input, params, code rev)

    def __post_init__(self) -> None:
        if not self.run_id:
            self.run_id = uuid.uuid4().hex[:12]
        os.makedirs(self.root, exist_ok=True)

    @staticmethod
    def params_fingerprint(**params) -> str:
        """Stable fingerprint of run parameters (input path, build() args,
        schema/code markers). Rerunning with the same --checkpoint but a
        different fingerprint invalidates every stage instead of silently
        serving stale boundaries."""
        import hashlib
        import json as _json

        blob = _json.dumps(params, sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    # -- stage boundaries ---------------------------------------------------

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._path(stage), "_MWEP_MANIFEST")

    def is_complete(self, stage: str) -> bool:
        if self.catalog:
            tbl = f"{self.catalog}.{stage}"
            if not self.spark.catalog.tableExists(tbl):
                return False
            if not self.fingerprint:
                return True
            # fingerprint lives as a table property (set in _write) so a
            # catalog-backed store invalidates on parameter/code changes
            # exactly like the path store's manifest file does.
            rows = self.spark.sql(
                f"SHOW TBLPROPERTIES {tbl} ('mwep.fingerprint')"
            ).collect()
            return bool(rows) and rows[0]["value"] == self.fingerprint
        if not os.path.exists(os.path.join(self._path(stage), "_SUCCESS")):
            return False
        if not self.fingerprint:
            return True  # unfingerprinted store keeps legacy behavior
        mp = self._manifest_path(stage)
        if not os.path.exists(mp):
            return False  # boundary predates fingerprinting -> recompute
        with open(mp) as f:
            return f.read().strip() == self.fingerprint

    def materialize(self, df: DataFrame, stage: str,
                    partition_by: tuple[str, ...] = (),
                    compression: str | None = None) -> DataFrame:
        if not self.is_complete(stage):
            t0 = time.perf_counter()
            self._write(df, stage, partition_by, compression)
            if self.fingerprint and not self.catalog:
                with open(self._manifest_path(stage), "w") as f:
                    f.write(self.fingerprint)
            self._record(stage, time.perf_counter() - t0)
        return self._read(stage)

    def _write(self, df: DataFrame, stage: str,
               partition_by: tuple[str, ...],
               compression: str | None = None) -> None:
        if self.catalog:
            w = df.writeTo(f"{self.catalog}.{stage}")
            if self.fingerprint:
                w = w.tableProperty("mwep.fingerprint", self.fingerprint)
            if compression:
                w = w.tableProperty("write.parquet.compression-codec", compression)
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        # temp dir + atomic rename: a killed run never leaves a dir that
        # looks complete (parquet _SUCCESS alone is not atomic across the
        # job's final rename on all filesystems).
        final = self._path(stage)
        tmp = final + f".__tmp_{self.run_id}"
        w = df.write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def _read(self, stage: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{stage}")
        return self.spark.read.parquet(self._path(stage))

    # -- lineage + counters (north rule) ------------------------------------

    def _record(self, stage: str, wall_sec: float) -> None:
        # per-partition lineage straight from the parquet footers: driver-side
        # metadata reads, zero Spark jobs — the lineage table costs nothing at
        # any scale (footers are O(files), not O(rows)).
        if self.catalog:
            out = self._read(stage)
            rows = [(stage, f"{self.catalog}.{stage}", out.count(), None)]
        else:
            import pyarrow.parquet as pq

            rows = []
            base = self._path(stage)
            for dirpath, _dirs, files in os.walk(base):
                for fn in files:
                    if not fn.endswith(".parquet"):
                        continue
                    p = os.path.join(dirpath, fn)
                    md = pq.ParquetFile(p).metadata
                    rows.append((stage, p, md.num_rows, os.path.getsize(p)))
        self._append_rows(
            "_lineage",
            [
                (stage_, file_, n_rows, n_bytes, round(wall_sec, 3), self.run_id)
                for (stage_, file_, n_rows, n_bytes) in rows
            ],
            ["stage", "file", "n_rows", "n_bytes", "wall_sec", "run_id"],
        )

    def _append_rows(self, table: str, rows: list[tuple], cols: list[str]) -> None:
        import time as _time

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = os.path.join(self.root, table)
        os.makedirs(d, exist_ok=True)
        data = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
        data["ts"] = [_time.time()] * len(rows)
        t = pa.Table.from_pydict(data)
        pq.write_table(
            t, os.path.join(d, f"part-{self.run_id}-{uuid.uuid4().hex[:8]}.parquet")
        )

    def stage_row_count(self, stage: str) -> int:
        """Row count from recorded lineage (no Spark job).

        Only the LATEST recording of the stage counts: after
        invalidate()+recompute on a reused store the superseded run's rows
        remain in _lineage (append-only) and must not double the total.
        One _record() call = one lineage file, so "latest" = the file with
        the max ts among files mentioning the stage.
        """
        import pyarrow.parquet as pq

        d = os.path.join(self.root, "_lineage")
        best_ts, best_total = -1.0, 0
        for fn in os.listdir(d):
            t = pq.read_table(
                os.path.join(d, fn), columns=["stage", "n_rows", "ts"]
            )
            total, ts = 0, -1.0
            for s, n, row_ts in zip(
                t["stage"].to_pylist(), t["n_rows"].to_pylist(), t["ts"].to_pylist()
            ):
                if s == stage:
                    total += n
                    ts = max(ts, row_ts)
            if ts > best_ts:
                best_ts, best_total = ts, total
        return best_total

    def add_counter(self, stage: str, metric: str, value: float) -> None:
        self._append_rows(
            "_counters",
            [(stage, metric, float(value), self.run_id)],
            ["stage", "metric", "value", "run_id"],
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))

    def counters(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_counters"))

    def invalidate(self, stage: str) -> None:
        """Drop a boundary so the next run recomputes it (and everything
        that reads it downstream of a missing boundary)."""
        if self.catalog:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog}.{stage}")
            return
        p = self._path(stage)
        if os.path.exists(p):
            shutil.rmtree(p)


def write_layer_union(store: CheckpointStore, layers: dict[str, DataFrame],
                      stage: str, payload: str = "typed",
                      compression: str | None = None) -> DataFrame:
    """Fold independent output layers into ONE tagged write job.

    Every extra Spark action pays a serial floor (Catalyst analysis, job
    schedule, commit, broadcast rebuild) that does not shrink with cores —
    N output layers written as N jobs puts N floors on the critical path.
    The layers are unioned under one tag column and written once,
    partitioned by layer, so the whole output block is a single job with a
    single floor. Per-layer row counts come for free from the parquet
    footers via ``layer_row_counts`` (partition dirs carry ``layer=``).

    ``payload`` picks the union representation. BOTH sides of the trade
    are measured (BENCH/payload_ab_8core.md + scaling tables):

    - ``"typed"`` (DEFAULT since round 4): a nullable SUPERSCHEMA — every
      layer keeps its native columns, missing ones null-filled by
      ``unionByName(allowMissingColumns=True)``; a column name claimed by
      an earlier layer with a different type is layer-qualified
      (``name__layer``). Default because it wins every measured axis:
      (1) SCALING — the typed full-pipeline 1→4-core run measured
      efficiency 0.849 (5 reps/level, 15.1 M turns) where json's runs
      measured 0.691/contaminated (BENCH/scaling_1v4.json); (2) READERS —
      stored layers keep column pruning and predicate pushdown, which a
      JSON blob forfeits; (3) WRITE COST — none: the round-4
      contamination-metered A/B measured the payload-touched stage at
      parity (typed 29.3 s vs json 29.7 s out_layers at 8 cores;
      round 3's "typed writes 4.6× slower" was host noise — its clean
      re-measurement collapsed 135.5 s to 29.3 s, see
      BENCH/payload_ab_8core.md).
    - ``"json"``: (layer, to_json(struct)) — one 2-column schema
      regardless of layers, re-parsed by readers via
      ``from_json(payload, schema)``. No longer claimed as a wall-clock
      winner (that round-3 reading did not survive noise-controlled
      re-measurement); kept for sinks that want a fixed 2-column schema
      across heterogeneous layer sets.

    ``compression`` overrides the session parquet codec for this stage
    (e.g. ``"snappy"`` or ``"lz4"`` when write CPU, not storage, is the
    binding resource).
    """
    if payload == "typed":
        seen_types: dict[str, str] = {}
        emitted: set[str] = set()
        qualified: set[str] = set()
        parts = []
        for name, df in layers.items():
            sel = []
            for f in df.schema.fields:
                # up-front schema validation (ADVICE r3): a layer column
                # named like the tag column, or colliding with a qualified
                # alias another layer already claimed, would make the union
                # ambiguous — fail loudly before building it.
                if f.name == "layer":
                    raise ValueError(
                        f"layer {name!r} has a column named 'layer', which "
                        "collides with the union's tag column"
                    )
                t = f.dataType.simpleString()
                out_name = f.name
                if seen_types.get(f.name, t) != t:
                    out_name = f"{f.name}__{name}"
                else:
                    seen_types[f.name] = t
                collides = (
                    (out_name != f.name and out_name in emitted)
                    or (out_name == f.name and out_name in qualified)
                )
                if collides:
                    raise ValueError(
                        f"layer {name!r} column {f.name!r} maps to "
                        f"{out_name!r}, which collides with a column "
                        "another layer already emits under that name"
                    )
                emitted.add(out_name)
                if out_name != f.name:
                    qualified.add(out_name)
                sel.append(F.col(f.name).alias(out_name))
            parts.append(df.select(F.lit(name).alias("layer"), *sel))
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p, allowMissingColumns=True)
    elif payload == "json":
        parts = [
            df.select(
                F.lit(name).alias("layer"),
                F.to_json(F.struct(*df.columns)).alias("payload"),
            )
            for name, df in layers.items()
        ]
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
    else:
        raise ValueError(f"unknown payload mode {payload!r}")
    return store.materialize(union, stage, partition_by=("layer",),
                             compression=compression)


def layer_row_counts(store: CheckpointStore, stage: str) -> dict[str, int]:
    """Per-layer row counts of a write_layer_union stage, from the recorded
    lineage (partition-dir names carry layer=<name>; no Spark job).

    Catalog mode has no per-file lineage paths, so it falls back to one
    grouped count over the stage table — a single metadata-cheap Spark job
    (Iceberg answers partition-level counts from manifests)."""
    import pyarrow.parquet as pq

    if store.catalog:
        return {
            r["layer"]: r["n"]
            for r in store._read(stage).groupBy("layer").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }

    d = os.path.join(store.root, "_lineage")
    best_ts: float = -1.0
    best: dict[str, int] = {}
    for fn in os.listdir(d):
        t = pq.read_table(os.path.join(d, fn), columns=["stage", "file", "n_rows", "ts"])
        counts, ts = {}, -1.0
        for s, f, n, row_ts in zip(
            t["stage"].to_pylist(), t["file"].to_pylist(),
            t["n_rows"].to_pylist(), t["ts"].to_pylist(),
        ):
            if s != stage or "layer=" not in f:
                continue
            layer = f.split("layer=")[1].split(os.sep)[0]
            counts[layer] = counts.get(layer, 0) + n
            ts = max(ts, row_ts)
        if ts > best_ts:
            best_ts, best = ts, counts
    return best


# -- final triple sink (K3) ---------------------------------------------------

DEFAULT_SALT_BUCKETS = 64


def write_triples(triples: DataFrame, path: str,
                  n_buckets: int = DEFAULT_SALT_BUCKETS,
                  n_write_tasks: int | None = None) -> None:
    """Partitioned triple write, salted on the subject hash.

    ``bucket = pmod(hash(subj), n_buckets)`` spreads hot subject RANGES
    (mega-conversation neighborhoods / hot incident types) across output
    partitions instead of partitioning by raw subject or incident_type,
    either of which recreates the reference's one-giant-iteration skew.
    A single mega-subject still lands in one bucket — which is why write
    parallelism is NOT capped at n_buckets: rows are repartitioned by
    (bucket, row hash) into ``n_write_tasks`` tasks (default: the session's
    shuffle parallelism), so one bucket can be written by many tasks and a
    straggler bucket cannot serialize the write. On Iceberg this becomes a
    ``bucket(n, subj)`` partition transform with fanout writers — identical
    layout.
    """
    spark = triples.sparkSession
    if n_write_tasks is None:
        n_write_tasks = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    salted = triples.withColumn(
        "bucket", F.pmod(F.hash(F.col("subj")), F.lit(n_buckets))
    )
    # row-level spread: hash of the full triple, not just subj, so a single
    # hot subject's rows fan out across tasks within its bucket
    salted.repartition(
        n_write_tasks, F.col("bucket"), F.hash("subj", "pred", "obj")
    ).write.mode("overwrite").partitionBy("bucket").parquet(path)


def write_quads(quads: DataFrame, path: str,
                n_buckets: int = DEFAULT_SALT_BUCKETS,
                n_write_tasks: int | None = None) -> None:
    """Partitioned QUAD-store write: ``partitionBy(g, bucket)`` — the
    graph name is the leading partition column, so a ``GRAPH <iri>`` /
    ``FROM`` equality predicate prunes to that graph's directories
    before any row is read (the quads module's whole point), and within
    each graph the subject-hash salting of :func:`write_triples`
    applies unchanged (hot subject ranges spread, one mega-subject
    cannot serialize the write).

    Contract: ``g`` must be LOW-CARDINALITY (collections, sources,
    snapshots — the reference's file-per-collection layout; thousands,
    not millions). A high-cardinality graph term would explode the
    partition directory count — put it in the data, not the layout, and
    write with :func:`write_triples` + a plain column instead. On
    Iceberg this becomes ``(identity(g), bucket(n, subj))`` partition
    transforms — identical pruning."""
    spark = quads.sparkSession
    if n_write_tasks is None:
        n_write_tasks = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    salted = quads.withColumn(
        "bucket", F.pmod(F.hash(F.col("subj")), F.lit(n_buckets))
    )
    salted.repartition(
        n_write_tasks, F.col("g"), F.col("bucket"),
        F.hash("subj", "pred", "obj"),
    ).write.mode("overwrite").partitionBy("g", "bucket").parquet(path)
