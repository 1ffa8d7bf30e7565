"""Raw-RGB image resize (round 5: the resize path is REAL for uncompressed
frames — numpy nearest-neighbor inside mapInPandas; only compressed
formats keep the NotImplementedError escape hatch).

Parity target: a pure-Python reference resize with the same half-pixel
nearest-neighbor convention (src = floor((dst + 0.5) * scale), clamped).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from multilingual_wiki_event_pipeline_spark.operators import multimodal


def _ref_resize(payload: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """Pure-Python nearest-neighbor resize of an h*w*3 RGB byte buffer."""
    out = bytearray()
    for ty in range(th):
        sy = min(int((ty + 0.5) * (h / th)), h - 1)
        for tx in range(tw):
            sx = min(int((tx + 0.5) * (w / tw)), w - 1)
            off = (sy * w + sx) * 3
            out += payload[off:off + 3]
    return bytes(out)


def _ref_payload(text: str, w: int, h: int) -> bytes:
    need = w * h * 3
    pat = hashlib.md5(text.encode()).hexdigest().encode()  # 32 bytes
    reps = (need + 31) // 32
    return (pat * reps)[:need]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta", "nl"), (3, "gamma", "it")],
        "doc_id long, text string, lang string",
    )


def test_raw_image_table_shape(spark, docs):
    t = multimodal.to_raw_image_table(docs, width=16, height=12)
    rows = {r["doc_id"]: r for r in t.collect()}
    assert set(rows) == {1, 2, 3}
    for doc_id, r in rows.items():
        assert r["meta"]["mime"] == multimodal.RAW_RGB_MIME
        assert (r["meta"]["width"], r["meta"]["height"]) == (16, 12)
        assert len(bytes(r["payload"])) == 16 * 12 * 3
    assert bytes(rows[1]["payload"]) == _ref_payload("alpha", 16, 12)


@pytest.mark.parametrize("target", [(4, 4), (32, 32), (16, 12)])
def test_resize_parity_vs_reference(spark, docs, target):
    t = multimodal.to_raw_image_table(docs, width=16, height=12)
    resized = multimodal.resize_images(t, target=target)
    got = {r["doc_id"]: r for r in resized.collect()}
    tw, th = target
    for doc_id, text in [(1, "alpha"), (2, "beta"), (3, "gamma")]:
        src = _ref_payload(text, 16, 12)
        want = _ref_resize(src, 16, 12, tw, th)
        r = got[doc_id]
        assert (r["width"], r["height"]) == (tw, th)
        assert bytes(r["payload"]) == want, f"doc {doc_id} bytes mismatch"


def test_resize_identity_at_same_size(spark, docs):
    t = multimodal.to_raw_image_table(docs, width=8, height=8)
    resized = multimodal.resize_images(t, target=(8, 8))
    src = {r["doc_id"]: bytes(r["payload"]) for r in t.collect()}
    for r in resized.collect():
        assert bytes(r["payload"]) == src[r["doc_id"]]


def test_resize_rejects_compressed_mimes(spark, docs):
    t = multimodal.to_raw_image_table(docs).withColumn(
        "meta",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        multimodal.resize_images(t).collect()
