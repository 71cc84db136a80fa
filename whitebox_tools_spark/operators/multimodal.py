"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque `binary` columns + typed metadata. The Spark
side — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested; the actual codec calls are STUBBED (image/audio libs
are not in this container): `decode_image_stub` produces a
deterministic fake raster from the byte content, clearly marked.
Swap `_decode_impl` for a real decoder (PIL/libvips) on a cluster with
the libs installed — nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), False),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media bytes for every media span (media_ref ->
    binary payload). Stands in for an object-store fetch; the payload is
    a pure function of the ref so tests are reproducible."""
    spans = docs.select("doc_id", F.explode("spans").alias("s")).where(
        F.col("s.kind") == "media"
    )
    return spans.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.expr(
            "CAST(CONCAT('IMG:', MD5(s.media_ref), ':', "
            "REPEAT(SUBSTR(MD5(s.media_ref), 1, 8), 16)) AS BINARY)"
        ).alias("media_bytes"),
    )


def _decode_impl(buf: bytes) -> np.ndarray:
    """STUB decoder. Real pipelines replace this with e.g.
    PIL.Image.open(io.BytesIO(buf)). Deterministic fake: an 8x8 'image'
    whose pixels derive from the byte content."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if len(arr) < 64:
        arr = np.pad(arr, (0, 64 - len(arr)))
    return arr[:64].reshape(8, 8).astype(np.float64)


def extract_media_features(media: DataFrame, bytes_col: str = "media_bytes") -> DataFrame:
    """Decode + feature-extract per media blob, Arrow-batched.

    Output adds: width, height, mean_intensity, feature vector (8-dim
    row means of the decoded grid). The decode is a stub (see module
    docstring); the batching/schema/partitioning are production-shaped.
    """
    fields = media.schema.fields + [
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_intensity", DoubleType(), False),
        StructField("feature", ArrayType(DoubleType()), False),
    ]
    schema = StructType(fields)
    in_cols = [f.name for f in media.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ws, hs, mi, feats = [], [], [], []
            for buf in pdf[bytes_col]:
                img = _decode_impl(bytes(buf))
                ws.append(img.shape[1])
                hs.append(img.shape[0])
                mi.append(float(img.mean()))
                feats.append([float(v) for v in img.mean(axis=1)])
            out = pdf[in_cols].copy()
            out["width"] = pd.array(ws, dtype="int32")
            out["height"] = pd.array(hs, dtype="int32")
            out["mean_intensity"] = mi
            out["feature"] = feats
            yield out

    return media.mapInPandas(run, schema=schema)


def resize_media(media: DataFrame, out_h: int = 4, out_w: int = 4,
                 bytes_col: str = "media_bytes") -> DataFrame:
    """Decode + block-average resize, Arrow-batched, one row per OUTPUT
    pixel: input columns + (ry, rx, v). The decode is the module's stub
    (8x8 fake raster); out_h/out_w must divide 8. Real pipelines swap
    `_decode_impl` for a codec and the block-mean below for the
    library's resampler — schema, batching and the exploded-pixel
    output shape are the production plumbing.
    """
    if 8 % out_h or 8 % out_w:
        raise ValueError("out_h/out_w must divide the stub's 8x8 grid")
    bh, bw = 8 // out_h, 8 // out_w
    fields = media.schema.fields + [
        StructField("ry", IntegerType(), False),
        StructField("rx", IntegerType(), False),
        StructField("v", DoubleType(), False),
    ]
    schema = StructType(fields)
    in_cols = [f.name for f in media.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            outs = []
            for i, buf in enumerate(pdf[bytes_col]):
                img = _decode_impl(bytes(buf))
                small = img.reshape(out_h, bh, out_w, bw).mean(axis=(1, 3))
                rows = pdf[in_cols].iloc[[i] * (out_h * out_w)].reset_index(drop=True)
                rows["ry"] = np.repeat(np.arange(out_h, dtype=np.int32), out_w)
                rows["rx"] = np.tile(np.arange(out_w, dtype=np.int32), out_h)
                rows["v"] = small.reshape(-1)
                outs.append(rows)
            yield pd.concat(outs, ignore_index=True)

    return media.mapInPandas(run, schema=schema)


FRAME_BYTES = 32  # stub "video": consecutive 32-byte chunks are frames


def sample_frames(media: DataFrame, every_k: int = 2,
                  bytes_col: str = "media_bytes") -> DataFrame:
    """Frame sampling over the binary payload treated as a fake video
    (full FRAME_BYTES-sized chunks = frames; the trailing partial chunk
    is dropped, as a real demuxer drops a truncated frame). Emits every
    k-th frame: input columns + (frame_idx, frame_mean). Swap the chunk
    walk for a real demuxer (pyav etc.) on a cluster that has one — the
    mapInPandas batching, schema and sampling contract stay.
    """
    fields = media.schema.fields + [
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_mean", DoubleType(), False),
    ]
    schema = StructType(fields)
    in_cols = [f.name for f in media.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            outs = []
            for i, buf in enumerate(pdf[bytes_col]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                n_frames = len(arr) // FRAME_BYTES
                idxs = list(range(0, n_frames, every_k))
                if not idxs:
                    continue
                rows = pdf[in_cols].iloc[[i] * len(idxs)].reset_index(drop=True)
                rows["frame_idx"] = pd.array(idxs, dtype="int32")
                rows["frame_mean"] = [
                    float(arr[j * FRAME_BYTES:(j + 1) * FRAME_BYTES].astype(np.float64).mean())
                    for j in idxs
                ]
                outs.append(rows)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return media.mapInPandas(run, schema=schema)
