"""Fail-fast guards for data properties the DuckDB oracles rely on
(ADVICE r01): several oracle SQL twins are only equivalent to the Spark
plans under these testdata invariants — if the driver's datagen ever
changes, this fails loudly instead of letting parity silently break.

- c2_url_encode: DuckDB `replace(p_name, ' ', '+')` equals Python
  quote_plus only while p_name is strictly [A-Za-z0-9 ].
- multimodal_frames: char-indexed substr/md5 equals byte windows only
  while documents.text is pure ASCII.
- a3_full_stats / e2_set_difference: lang/source group keys match across
  engines only while lang/source are never NULL.

No Spark session needed — pure pyarrow over the sf0.01 driver tables.
"""

from __future__ import annotations

import os
import re

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_part_p_name_is_alnum_space():
    names = pq.read_table(f"{SF_DIR}/part.parquet", columns=["p_name"])
    pat = re.compile(r"^[A-Za-z0-9 ]*$")
    bad = [n for n in names["p_name"].to_pylist() if n is None or not pat.match(n)]
    assert not bad, f"c2_url_encode oracle precondition broken: {bad[:3]}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_documents_text_is_ascii():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    bad = [s[:40] for s in t["text"].to_pylist() if s is None or not s.isascii()]
    assert not bad, f"multimodal_frames oracle precondition broken: {bad[:3]}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_documents_lang_source_not_null():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["lang", "source"])
    assert t["lang"].null_count == 0 and t["source"].null_count == 0, (
        "a3_full_stats/e2 oracle precondition broken: NULL lang/source"
    )
