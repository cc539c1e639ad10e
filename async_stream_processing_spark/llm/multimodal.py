"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video assets are carried as ``binary`` columns with a metadata
struct, processed by Arrow-batched ``mapInPandas`` stages.  The pattern at
100 TB: keep payloads in the lake (parquet binary or file pointers),
partition by content size so decode batches are balanced, and run decode /
feature-extraction as mapInPandas over whole partitions -- one Python
worker per partition, zero driver involvement.

The decode itself is STUBBED here (no image/audio libs in this container):
``decode_image_meta`` extracts deterministic pseudo-metadata from the raw
bytes so the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and testable; ``decode_image_real`` shows the gated
import seam where Pillow/ffmpeg would slot in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the stubbed image-decode stage.
IMAGE_META_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, format STRING, width INT, height INT, "
    "checksum BIGINT"
)


def with_binary_payload(docs: DataFrame, text: str = "text") -> DataFrame:
    """Attach a binary payload column (here: utf-8 bytes of the text --
    the driver data has no real media; the column type and downstream
    plumbing are what matters) plus source metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.octet_length(F.col(text)).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_meta(docs_bin: DataFrame) -> DataFrame:
    """Stub decode: deterministic pseudo image metadata from raw bytes.

    width/height are derived from the first two payload bytes, the format
    from ``n_bytes % 3`` -- a stand-in for a real header parse.  The
    mapInPandas shape (Arrow batches in, Arrow batches out, no per-row
    Python call overhead) is exactly what a Pillow-backed decode uses.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        formats = ["png", "jpeg", "webp"]
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.str.len().astype("int64")
            first = payloads.str[0].apply(lambda b: b if b is not None else 0)
            second = payloads.str[1].apply(lambda b: b if b is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "format": (n_bytes % 3).map(dict(enumerate(formats))),
                    "width": (first.astype("int64") % 64 + 1) * 10,
                    "height": (second.astype("int64") % 64 + 1) * 10,
                    "checksum": (n_bytes * 2654435761) % 2147483647,
                }
            )

    return docs_bin.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


def decode_image_real(docs_bin: DataFrame) -> DataFrame:
    """Real decode seam: requires Pillow, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires Pillow; this container has no image libs "
            "-- use decode_image_meta (stub) for plumbing tests"
        ) from e
    raise NotImplementedError("wire Image.open over payload bytes here")


def frame_sample_stub(docs_bin: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a deterministic frame index
    per payload (stub for ffmpeg keyframe extraction).  Shows the
    one-to-many mapInPandas/explode shape used for frame tables."""
    n_frames = (F.octet_length("payload") % 100 + 1).cast("long").alias("n_frames")
    frames = docs_bin.select("doc_id", n_frames).withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)))
    )
    return frames.select("doc_id", "n_frames", "frame_idx")
