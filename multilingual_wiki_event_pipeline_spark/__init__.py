"""mwep-spark: a from-scratch PySpark-native event-centric knowledge-graph
construction engine with the capabilities of cltl/multilingual-wiki-event-pipeline.

The reference (/root/reference) is a single-threaded, eager, object-graph
pipeline; this package re-expresses each of its operators (SURVEY.md §2) as
lazy DataFrame transforms + vectorized Arrow/pandas UDFs, designed for a
multi-executor cluster over Iceberg/Parquet tables of conversation
transcripts at 10^12-turn scale.
"""

__version__ = "0.3.0"
