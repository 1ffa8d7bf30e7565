"""Corpus table access.

On a production cluster these are Iceberg tables (`spark.read.table`);
the sandbox has no Iceberg runtime jar, so the loader falls back to
parquet-by-path behind one interface — partition pruning / column pruning /
predicate pushdown semantics are identical at the DataFrame level. The
writer side (sinks.py) mirrors this: `writeTo(...).overwritePartitions()`
when a catalog is configured, else parquet `partitionBy` overwrite.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "transcripts conv_meta conv_sources incidents incident_direct_types "
    "incident_roles role_mappings type2mapping entity_labels gazetteer "
    "langlinks wd_sitelinks annotations srl_predicates srl_roles "
    "ontology_edges"
).split()


@dataclass
class CorpusTables:
    """Lazy handles to every corpus input table.

    Handles are memoized per table name: ``spark.read.parquet`` resolves
    the schema EAGERLY (a driver-side footer read + a py4j round trip,
    ~80 ms each), and ``pipeline.build`` touches several tables many
    times — re-reading cost ~2 s of the measured driver-side plan wall
    (round-5 kg attribution). One DataFrame handle per table is also what
    Catalyst wants: identical scan nodes share analysis."""

    spark: SparkSession
    root: str
    catalog: str | None = None  # e.g. "iceberg_cat.mwep" when Iceberg is up

    def table(self, name: str) -> DataFrame:
        cache = self.__dict__.setdefault("_handles", {})
        if name not in cache:
            if self.catalog:
                cache[name] = self.spark.read.table(f"{self.catalog}.{name}")
            else:
                cache[name] = self.spark.read.parquet(
                    f"{self.root}/{name}.parquet"
                )
        return cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)
