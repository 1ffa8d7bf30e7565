"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship triple emitter on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from multilingual_wiki_event_pipeline_spark.catalog import QUERIES
from multilingual_wiki_event_pipeline_spark.oracles import ORACLES, flagship_oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the K3 triple emitter (classes.py:265-353 semantics) over
    sf0.001 events — subject mint, type/actor edges, gYear-ruled literals."""
    return QUERIES["triples_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # kg_pipeline_triples runs the full KG pipeline on the deterministic
    # synthetic transcript corpus generated to a fixed dir; its oracle is
    # DuckDB SQL over that same parquet (flagship_oracle generates the
    # corpus if absent, so the SQL is runnable regardless of which side
    # the driver executes first).
    return {**ORACLES, **flagship_oracle()}
