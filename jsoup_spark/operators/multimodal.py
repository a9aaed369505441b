"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct. The
Spark-side plumbing (schema, batching, partitioning-by-size, Arrow batch
shapes) is real and tested; the actual codec work is STUBBED — the
container has no image/audio libraries — behind `decode_image`, which
raises NotImplementedError unless `fake=True` produces a deterministic
fake decode (dimensions derived from the payload hash).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("mime", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("source_ref", T.StringType(), True),
])

DECODED = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake binary payload per doc (md5-derived) —
    stands in for fetched image bytes so the pipeline shape is testable."""
    payload = F.to_binary(F.md5(F.col("doc_id")), F.lit("hex"))
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("image/x-fake").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.concat(F.lit("mem://"), F.col("doc_id")).alias("source_ref"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_image(payload: bytes, *, fake: bool = False):
    """Decode an image payload. STUB: real decoding requires an image
    library not present in this container. `fake=True` derives
    deterministic dimensions from the payload hash (for plumbing tests)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (PIL/opencv); "
            "install on the cluster and replace this stub")
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    return width, height


def decode_stage(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas decode/feature-extract stage. Batched over Arrow;
    yields fixed-shape feature vectors (8 floats from payload hash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mtypes, ws, hs, frames, feats = [], [], [], [], [], []
            for doc_id, payload, meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["meta"]):
                w, h = decode_image(bytes(payload), fake=fake)
                digest = hashlib.sha256(bytes(payload)).digest()
                ids.append(doc_id)
                mtypes.append(meta["media_type"])
                ws.append(w)
                hs.append(h)
                frames.append(1)
                feats.append([b / 255.0 for b in digest[:8]])
            yield pd.DataFrame({
                "doc_id": ids,
                "media_type": mtypes,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "n_frames": pd.array(frames, dtype="int32"),
                "feature": feats,
            })

    return media.mapInPandas(run, schema=DECODED)
