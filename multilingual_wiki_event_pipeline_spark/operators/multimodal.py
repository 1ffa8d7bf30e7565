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


def resize_stub(binary_df: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Image-resize plumbing: the codec isn't in this container, so the
    batch kernel raises NotImplementedError for non-text payloads (same
    contract as decode_features) while the schema and partition-wise
    execution are real. Plug PIL/libvips into ``kernel`` on a real cluster.
    """
    narrow = binary_df.select("doc_id", "payload", F.col("meta.mime").alias("mime"))

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            raise NotImplementedError(
                f"no image codec in this container for resize->{target}; "
                "plug a decoder here"
            )
        yield  # pragma: no cover

    return narrow.mapInPandas(
        kernel, schema="doc_id long, width int, height int, payload binary"
    )
