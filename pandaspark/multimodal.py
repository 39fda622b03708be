"""Multimodal columns (SURVEY.md §2.11): image/audio/video as opaque
`binary` columns with typed metadata, processed by Arrow-batched pandas
iterators (`mapInPandas`) — the only place this engine leaves the JVM,
because byte-level media decoding has no Catalyst expression.

The decode kernels themselves are STUBBED: the container ships no
image/audio libraries, so `decode` raises NotImplementedError unless
`deterministic_fake=True`, which produces stable pseudo-metadata from a
content hash. The Spark-side plumbing — schema, binaryFile scan,
mapInPandas batch shape, partition sizing — is real and tested; dropping a
real PIL/ffmpeg kernel into `_decode_batch` is a one-function change.

Scale notes: binaryFile splits per-file (one file = one row); set
`spark.sql.files.maxPartitionBytes` so a partition's worth of media fits in
executor memory; metadata-only transforms stay columnar (the binary column
is pruned away unless referenced).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("modification_time", T.TimestampType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

_KIND_BY_EXT = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_media_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Scan a directory of media files into the canonical media frame.

    Caveat (observed upstream behavior): the binaryFile source silently
    skips zero-byte files — corrupt-empty media never reaches the decode
    stage, so dead-file monitoring must happen at the listing layer.
    """
    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind_map = F.create_map(*[F.lit(x) for kv in _KIND_BY_EXT.items() for x in kv])
    return raw.select(
        F.col("path"),
        F.coalesce(F.element_at(kind_map, ext), F.lit("unknown")).alias("kind"),
        F.col("content"),
        F.col("length"),
        F.col("modificationTime").alias("modification_time"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: stable dims from the content hash.
    Stands in for a real PIL/ffmpeg kernel (not in this container)."""
    h = hashlib.sha256(content).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 + h[2] % 32
    return width, height, n_frames


def decode_media(df: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode binary media to typed metadata via an Arrow-batched pandas
    iterator. Real decode is NotImplemented in this container; the fake
    path exercises the identical batch plumbing."""

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; pass deterministic_fake=True "
                    "for the plumbing path"
                )
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]) if row["content"] is not None else b""
                w, h, nf = _fake_decode(content)
                out.append(
                    {
                        "path": row["path"],
                        "kind": row["kind"],
                        "content_sha256": hashlib.sha256(content).hexdigest(),
                        "n_bytes": len(content),
                        "width": w,
                        "height": h,
                        "n_frames": nf if row["kind"] == "video" else 1,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(_decode_batch, DECODED_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(df: DataFrame, dim: int = 64, deterministic_fake: bool = False) -> DataFrame:
    """Media → embedding column, Arrow-batched (mapInPandas). The model
    forward pass is STUBBED like decode: the fake path derives a stable
    unit-norm vector from the content hash, producing the same
    `array<float>` shape as the `embeddings` table so downstream similarity
    ops (cosine top-k, LSH ANN, near-dup) compose unchanged.

    Scale: embedding extraction is embarrassingly parallel over files; the
    binary column never leaves the task, only `dim` floats shuffle."""

    def _embed_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "feature extraction requires a vision/audio model; pass "
                    "deterministic_fake=True for the plumbing path"
                )
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]) if row["content"] is not None else b""
                h = hashlib.sha256(content).digest()
                raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
                vec = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
                vec = vec / np.linalg.norm(vec)
                out.append(
                    {
                        "path": row["path"],
                        "kind": row["kind"],
                        "embedding": vec.astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.mapInPandas(_embed_batch, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 8) -> DataFrame:
    """Frame-sampling plan for video rows: explodes sampled frame indices
    (decode stubbed; index arithmetic is the real, tested part)."""
    decoded = df.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    return decoded.withColumn("frame_index", F.explode(idx)).select(
        "path", "content_sha256", "n_frames", "frame_index"
    )
