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


def decode_audio(payload: bytes, *, fake: bool = False):
    """Decode an audio payload -> (sample_rate, n_samples). STUB: real
    decoding requires an audio library not present in this container;
    `fake=True` derives deterministic values from the payload hash."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library (soundfile/ffmpeg); "
            "install on the cluster and replace this stub")
    h = hashlib.sha256(payload).digest()
    sample_rate = (8000, 16000, 22050, 44100)[h[2] % 4]
    n_samples = sample_rate * (1 + h[3] % 30)
    return sample_rate, n_samples


def decode_video(payload: bytes, *, fake: bool = False):
    """Decode video metadata -> (width, height, n_frames, fps). STUB, as
    above; deterministic fake for plumbing tests."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires ffmpeg/pyav; install on the cluster "
            "and replace this stub")
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 24 * (1 + h[4] % 120), 24


RESIZED = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("payload", T.BinaryType(), False),
])


def resize_stage(media: DataFrame, max_side: int = 128, *,
                 fake: bool = True) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas stage: aspect-
    preserving clamp of the longer side to `max_side`. The geometry is
    real; the pixel resample is the stubbed codec (fake mode re-hashes
    the payload to a size-proportional deterministic blob)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h = decode_image(b, fake=fake)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                blob = hashlib.sha256(b).digest() * (1 + nw * nh // 32)
                ids.append(doc_id)
                ws.append(nw)
                hs.append(nh)
                outs.append(blob[: max(1, nw * nh // 8)])
            yield pd.DataFrame({
                "doc_id": ids,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "payload": outs,
            })

    return media.mapInPandas(run, schema=RESIZED)


FRAMES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_sec", T.DoubleType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def frame_sample_stage(media: DataFrame, n_frames: int = 4, *,
                       fake: bool = True) -> DataFrame:
    """Video frame sampling: emit n_frames evenly-spaced frames per
    payload (one row per frame — the fan-out shape a training pipeline
    feeds to a vision encoder). Frame decode is the stubbed codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, total, fps = decode_video(b, fake=fake)
                step = max(1, total // n_frames)
                for i in range(min(n_frames, total)):
                    fi = i * step
                    ids.append(doc_id)
                    idxs.append(fi)
                    tss.append(fi / fps)
                    frames.append(hashlib.sha256(
                        b + fi.to_bytes(4, "big")).digest())
            yield pd.DataFrame({
                "doc_id": ids,
                "frame_idx": pd.array(idxs, dtype="int32"),
                "ts_sec": pd.array(tss, dtype="float64"),
                "frame": frames,
            })

    return media.mapInPandas(run, schema=FRAMES)
