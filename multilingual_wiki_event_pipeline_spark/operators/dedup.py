"""Reference-text deduplication (SURVEY A2/W3).

Reference utils.py:386-398 is O(n^2) per incident: a text is dropped when a
same-language text with *identical content* and a lexicographically *larger
name* exists — i.e. all rows tied for the max name in each
(incident, language, content) group survive. That is a rank() window, not
row_number(): ties on the max name are all kept, exactly as the reference
keeps mutually-non-dominating rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deduplicate_ref_texts(texts: DataFrame) -> DataFrame:
    """texts must carry (incident_id, lang, name, content); returns the
    surviving rows with original columns.

    The group key uses sha2(content) instead of the raw content so multi-KB
    documents never become shuffle keys (at 100 TB the content column
    dominates the row; the 64-char digest keeps the exchange narrow).
    """
    w = (
        Window.partitionBy("incident_id", "lang", F.sha2(F.col("content"), 256))
        .orderBy(F.desc("name"))
    )
    return (
        texts.withColumn("__rnk", F.rank().over(w))
        .filter(F.col("__rnk") == 1)
        .drop("__rnk")
    )
