"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` kernels (one Python worker per partition, whole partitions
streamed as record batches — never per-row Python).

The actual media codecs are NOT available in this container, so
``decode_features`` dispatches on mime type: ``text/*`` gets a real,
deterministic featurizer (byte length + first byte), anything else raises
``NotImplementedError`` at the batch level — the Spark-side plumbing
(schema, batch shape, partition-wise execution) is real and tested.

Scale notes: binary payloads dominate row width, so (1) select the payload
column ONLY into the kernel (column pruning does not reach inside
mapInPandas), (2) cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
batch of blobs fits executor memory, (3) partition by a content-hash bucket
so giant assets spread evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, first_byte long"


def to_binary_table(documents: DataFrame, mime: str = "text/plain") -> DataFrame:
    """documents → (doc_id, payload binary, meta struct<mime,lang>)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(F.lit(mime).alias("mime"), F.col("lang").alias("lang")).alias(
            "meta"
        ),
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Narrow the input to exactly (doc_id, payload, mime) before the kernel —
    mapInPandas sees whole rows, so projection must happen outside.
    """
    narrow = binary_df.select(
        "doc_id", "payload", F.col("meta.mime").alias("mime")
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            bad = pdf.loc[~pdf["mime"].str.startswith("text/"), "mime"]
            if len(bad):
                raise NotImplementedError(
                    f"no codec for mime={bad.iloc[0]!r} in this container; "
                    "plug a real decoder here (image/audio libs)"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "first_byte": pdf["payload"]
                    .map(lambda b: b[0])
                    .astype("int64"),
                }
            )

    return narrow.mapInPandas(kernel, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_bytes long, frame_md5 string"


def frame_sample(binary_df: DataFrame, frame_size: int = 64,
                 stride: int = 256) -> DataFrame:
    """Frame sampling over binary payloads: every ``stride`` bytes emit a
    ``frame_size``-byte window (video frame-sampling plumbing — the real
    decoder is the pluggable part; batch shape, fan-out schema, and
    partition-wise execution are what the engine owns).

    UDTF-shaped (1 row in, N frames out) via mapInPandas. Deterministic:
    frame fingerprint = md5 of the window, so an engine-independent oracle
    can recompute it from substrings.
    """
    import hashlib

    narrow = binary_df.select("doc_id", "payload")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx, off in enumerate(range(0, len(b), stride)):
                    frame = b[off:off + frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return narrow.mapInPandas(kernel, schema=FRAME_SCHEMA)


RAW_RGB_MIME = "image/x-raw-rgb"


def to_raw_image_table(documents: DataFrame, width: int = 16,
                       height: int = 12) -> DataFrame:
    """documents → deterministic raw RGB frames for the resize path.

    Each doc becomes one uncompressed ``width*height*3``-byte RGB payload
    derived from its text (md5-seeded byte pattern, repeated to size) —
    codec-free stand-in for a decoded frame, with the real metadata shape
    a decode stage would emit: ``meta struct<mime,width,height>``.
    """
    pat = F.md5(F.col("text")).cast("binary")  # 32 hex chars = 32 bytes
    need = width * height * 3
    reps = (need + 31) // 32
    payload = F.substring(
        F.concat(*([pat] * reps)).cast("binary"), 1, need
    )
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(RAW_RGB_MIME).alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
        ).alias("meta"),
    )


def resize_images(binary_df: DataFrame,
                  target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Nearest-neighbor image resize over RAW RGB payloads — REAL and
    codec-free: ``numpy.frombuffer → reshape(h, w, 3) → integer index
    gather → tobytes`` inside an Arrow-batched ``mapInPandas`` kernel.
    Compressed formats (image/jpeg, ...) still raise NotImplementedError
    at the batch level: decoding needs codecs this container lacks; plug
    PIL/libvips in front on a real cluster and feed the raw frames here.

    Nearest-neighbor with the half-pixel src-index convention
    (src = floor((dst + 0.5) * scale)) — deterministic, so tests pin
    output bytes against a pure-Python reference implementation.
    """
    tw, th = target
    narrow = binary_df.select(
        "doc_id", "payload",
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            bad = pdf.loc[pdf["mime"] != RAW_RGB_MIME, "mime"]
            if len(bad):
                raise NotImplementedError(
                    f"no codec for mime={bad.iloc[0]!r} in this container; "
                    f"decode to {RAW_RGB_MIME} upstream"
                )
            out = {"doc_id": [], "width": [], "height": [], "payload": []}
            for doc_id, payload, w, h in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                img = np.frombuffer(bytes(payload), dtype=np.uint8)
                img = img.reshape(int(h), int(w), 3)
                ys = np.minimum(
                    ((np.arange(th) + 0.5) * (int(h) / th)).astype(np.int64),
                    int(h) - 1,
                )
                xs = np.minimum(
                    ((np.arange(tw) + 0.5) * (int(w) / tw)).astype(np.int64),
                    int(w) - 1,
                )
                resized = img[ys][:, xs]
                out["doc_id"].append(doc_id)
                out["width"].append(tw)
                out["height"].append(th)
                out["payload"].append(resized.tobytes())
            yield pd.DataFrame(out)

    return narrow.mapInPandas(
        kernel, schema="doc_id long, width int, height int, payload binary"
    )


def resize_stub(binary_df: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Back-compat alias for the pre-round-5 stub name: the resize is now
    REAL for raw RGB payloads (``resize_images``); only compressed formats
    remain behind the NotImplementedError escape hatch."""
    return resize_images(binary_df, target)
