"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct. The
Spark-side plumbing (schema, batching, partitioning-by-size, Arrow batch
shapes) is real and tested. Codec work is two-tier:

* REAL decode (operators/codecs.py, stdlib zlib/wave + numpy, no
  external libraries): PNG (filters 0-4), uncompressed BMP, binary
  netpbm, baseline JPEG (SOF0 huffman+IDCT, 4:4:4/4:2:2/4:2:0), PCM WAV
  — `decode_image`/`decode_audio` sniff magic bytes and decode these
  natively, `resize_stage` really resamples (area average) and
  re-encodes PNG, and `decode_stage` extracts real per-channel
  mean/std features.
* STUB for formats that need external codec libraries
  (lossless-process JPEG, MP3, H.264, ...):
  NotImplementedError unless `fake=True` produces a deterministic
  hash-derived decode (for plumbing tests) — per the environment
  contract (no PIL/opencv/ffmpeg in this container). Progressive JPEG
  left this tier in r6; WebP left it in r7 — both lossless (VP8L,
  codecs.py) and lossy (VP8 keyframes, operators/vp8.py) decode
  natively, byte-identical to libwebp (tests/test_vp8.py); GIF
  (87a/89a incl. animation, operators/gif.py) decodes natively,
  index-exact vs giflib (tests/test_gif.py); baseline TIFF
  (strips/tiles/planar, None/LZW/Deflate/PackBits, predictor,
  operators/tiff.py) decodes natively, validated both directions vs
  libtiff (tests/test_tiff.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from . import codecs

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
    # double, not float: the feature stats are exactly recomputable from
    # the deterministic synth images, and the driver oracle compares them
    # value-rounded — float32 truncation would straddle rounding boundaries
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def synthesize_media(docs: DataFrame, *, real: bool = False,
                     codec: str | None = None) -> DataFrame:
    """Attach a deterministic binary payload per doc.

    real=False (default): md5-derived opaque bytes, pure Catalyst —
    stands in for fetched bytes so the pipeline shape is testable.
    real=True: genuine decodable payloads (alternating PNG / BMP images
    whose pixels derive from the doc_id hash) built in a mapInPandas
    stage, so the REAL decoders run end-to-end with zero fixtures.
    codec="jpeg" (with real=True): every payload is a baseline JPEG from
    the native encoder instead of the lossless PNG/BMP mix.
    codec="jpeg_arith": arithmetic-coded (SOF9) JPEG from the native QM
    encoder (operators/jpeg_arith.py).
    codec="webp": every payload is a lossless VP8L WebP (predictor +
    subtract-green transforms, color cache) — lossless, so downstream
    features stay pixel-exact through the round trip.
    codec="gif": lossless true-color GIF from the strip encoder
    (operators/gif.py encode_gif) — also pixel-exact downstream.
    codec="tiff": LZW+predictor TIFF (operators/tiff.py encode_tiff) —
    also pixel-exact downstream."""
    if not real:
        payload = F.to_binary(F.md5(F.col("doc_id")), F.lit("hex"))
        meta = F.struct(
            F.lit("image").alias("media_type"),
            F.lit("image/x-fake").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.concat(F.lit("mem://"), F.col("doc_id")).alias("source_ref"),
        )
        return docs.select("doc_id", payload.alias("payload"),
                           meta.alias("meta"))

    out_schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META, False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id in pdf["doc_id"]:
                img = _hash_image(str(doc_id))
                if codec == "jpeg":
                    b, mime = codecs.encode_jpeg(img), "image/jpeg"
                elif codec == "jpeg_arith":
                    from .jpeg_arith import encode_jpeg_arith
                    b = encode_jpeg_arith(img)
                    mime = "image/jpeg"
                elif codec == "webp":
                    b = codecs.encode_webp_lossless(
                        img, predictor=True, subtract_green=True,
                        cache_bits=6)
                    mime = "image/webp"
                elif codec == "gif":
                    from .gif import encode_gif
                    b, mime = encode_gif(img), "image/gif"
                elif codec == "tiff":
                    from .tiff import encode_tiff
                    b = encode_tiff(img.astype("int64"),
                                    compression=5, predictor=2)
                    mime = "image/tiff"
                elif codec == "ccitt":
                    # bilevel fax page: G4 (T.6) TIFF, MinIsWhite;
                    # black iff (x+y+h2) % 5 == 0 — closed-form black
                    # count for the symbolic oracle
                    from .tiff import encode_tiff
                    hd = hashlib.sha256(str(doc_id).encode()).digest()
                    w_, ht_ = 16 + hd[0] % 48, 16 + hd[1] % 48
                    yy, xx = np.mgrid[0:ht_, 0:w_]
                    bits = ((xx + yy + hd[2]) % 5 == 0).astype(np.uint8)
                    b = encode_tiff(bits[:, :, None].astype("int64"),
                                    photometric=0, bit_depth=1,
                                    compression=4)
                    mime = "image/tiff"
                elif int(hashlib.md5(str(doc_id).encode())
                         .hexdigest(), 16) % 2 == 0:
                    b, mime = codecs.encode_png(img), "image/png"
                else:
                    b, mime = codecs.encode_bmp(img), "image/bmp"
                ids.append(doc_id)
                payloads.append(b)
                metas.append({"media_type": "image", "mime": mime,
                              "n_bytes": len(b),
                              "source_ref": f"mem://{doc_id}"})
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "meta": metas})

    return docs.select("doc_id").mapInPandas(run, schema=out_schema)


def _hash_image(doc_id: str) -> "np.ndarray":
    """Deterministic small RGB image from the doc_id hash: size and a
    smooth gradient both derive from the digest."""
    h = hashlib.sha256(doc_id.encode()).digest()
    w, ht = 16 + h[0] % 48, 16 + h[1] % 48
    yy, xx = np.mgrid[0:ht, 0:w]
    r = (xx * 255 // max(w - 1, 1) + h[2]) % 256
    g = (yy * 255 // max(ht - 1, 1) + h[3]) % 256
    b = (xx + yy + h[4]) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def decode_image(payload: bytes, *, fake: bool = False):
    """Decode an image payload -> (width, height). PNG / uncompressed
    BMP / binary netpbm / baseline+progressive+arithmetic JPEG / WebP
    (lossless VP8L and lossy VP8) / GIF / TIFF decode NATIVELY (operators/codecs.py
    + jpeg_arith.py + vp8.py, stdlib + numpy). Other formats need an
    external codec library: NotImplementedError, or a deterministic
    hash-derived fake when `fake=True` (plumbing tests)."""
    arr = decode_image_array(payload)
    if arr is not None:
        return arr.shape[1], arr.shape[0]
    if not fake:
        raise NotImplementedError(
            "payload is not PNG/BMP/netpbm/JPEG/WebP/GIF/TIFF; decoding "
            "other image formats requires an imaging library (PIL/opencv) "
            "on the cluster")
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    return width, height


def decode_image_array(payload: bytes):
    """Real pixel decode for the natively-supported formats; None when
    the format needs an external codec."""
    fmt = codecs.sniff_format(payload)
    try:
        if fmt == "png":
            return codecs.decode_png(payload)
        if fmt == "bmp":
            return codecs.decode_bmp(payload)
        if fmt == "ppm":
            return codecs.decode_ppm(payload)
        if fmt == "jpeg":
            return codecs.decode_jpeg(payload)
        if fmt == "webp":
            return codecs.decode_webp(payload)
        if fmt == "gif":
            from .gif import decode_gif
            return decode_gif(payload)
        if fmt == "tiff":
            from .tiff import decode_tiff
            return decode_tiff(payload)
        if fmt == "ico":
            from .ico import decode_ico
            return decode_ico(payload)
    except ValueError:
        return None  # esoteric/corrupt variant (interlaced/16-bit/...)
    return None


def decode_stage(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas decode/feature-extract stage, batched over Arrow.

    Natively-decodable payloads yield REAL 8-dim features
    ([mean_r, mean_g, mean_b, mean_all, std_r, std_g, std_b, std_all]
    / 255, gray broadcast across channels); stub-tier payloads fall back
    to the deterministic hash feature (fake mode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mtypes, ws, hs, frames, feats = [], [], [], [], [], []
            for doc_id, payload, meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["meta"]):
                b = bytes(payload)
                arr = decode_image_array(b)
                if arr is not None:
                    h_, w = arr.shape[0], arr.shape[1]
                    feats.append(_image_feature(arr))
                else:
                    w, h_ = decode_image(b, fake=fake)
                    digest = hashlib.sha256(b).digest()
                    feats.append([x / 255.0 for x in digest[:8]])
                ids.append(doc_id)
                mtypes.append(meta["media_type"])
                ws.append(w)
                hs.append(h_)
                frames.append(1)
            yield pd.DataFrame({
                "doc_id": ids,
                "media_type": mtypes,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "n_frames": pd.array(frames, dtype="int32"),
                "feature": feats,
            })

    return media.mapInPandas(run, schema=DECODED)


def _image_feature(arr: "np.ndarray") -> list:
    px = arr.astype(np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] >= 3:
        chans = [px[:, :, i] for i in range(3)]
    else:
        chans = [px[:, :, 0]] * 3
    means = [float(c.mean()) for c in chans] + [float(px.mean())]
    stds = [float(c.std()) for c in chans] + [float(px.std())]
    return [v / 255.0 for v in means + stds]


def decode_audio(payload: bytes, *, fake: bool = False):
    """Decode an audio payload -> (sample_rate, n_samples). PCM WAV
    decodes NATIVELY via the stdlib wave module (operators/codecs.py);
    compressed formats (MP3/AAC/...) need an external library:
    NotImplementedError, or deterministic fake when `fake=True`."""
    if codecs.sniff_format(payload) == "wav":
        import wave as _wave
        try:
            rate, n_frames, _samples = codecs.decode_wav(payload)
            return rate, n_frames
        except (ValueError, EOFError, _wave.Error):
            pass  # malformed/unsupported WAV variant -> stub tier
    if not fake:
        raise NotImplementedError(
            "payload is not PCM WAV; decoding compressed audio requires "
            "an audio library (soundfile/ffmpeg) on the cluster")
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
    preserving clamp of the longer side to `max_side`.

    Natively-decodable payloads are REALLY resampled (codecs.resize_area
    box filter) and re-encoded as PNG. Stub-tier payloads keep the real
    geometry but a deterministic hash blob for pixels (fake mode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                arr = decode_image_array(b)
                if arr is not None:
                    small = codecs.resize_area(arr, max_side)
                    nh, nw = small.shape[0], small.shape[1]
                    out = codecs.encode_png(small)
                else:
                    w, h = decode_image(b, fake=fake)
                    scale = min(1.0, max_side / max(w, h))
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    blob = hashlib.sha256(b).digest() * (1 + nw * nh // 32)
                    out = blob[: max(1, nw * nh // 8)]
                ids.append(doc_id)
                ws.append(nw)
                hs.append(nh)
                outs.append(out)
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
