"""The cross-engine deterministic hash coin shared by every sketch and
sampling operator: first 8 md5 hex digits of the UTF-8 string as a
uniform uint32. DuckDB twin, verbatim in every oracle:
``('0x' || substring(md5(<same string>), 1, 8))::BIGINT``.

Centralized because this IS the bit-exactness contract with the DuckDB
oracles (mixture/stratified/exact sampling, CMS, Bloom) — change it in
one place or not at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_u32(col: Column) -> Column:
    """``col`` (stringified, UTF-8) -> uniform uint32 as LongType."""
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10
    ).cast("long")
