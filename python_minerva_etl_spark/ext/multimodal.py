"""Multimodal columns (EXT-MM-COL): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas stages.

Design (the Spark-side plumbing is real and tested; the codec calls
are stubbed because no image/audio libraries exist in this container):

- a multimodal asset column is ``binary`` + a metadata struct
  (mime, width/height or sample_rate/duration, checksum);
- decode / resize / frame-sample run as ``mapInPandas`` stages: Arrow
  batches of (id, bytes) in, (id, features) out — the only place the
  engine leaves the JVM, amortized over whole record batches;
- relational ops (filter/join/select) never touch the bytes: Parquet
  column pruning keeps binary blobs unread unless projected — at
  100 TB, metadata-only queries cost metadata-only IO.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("checksum", T.StringType()),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_asset_meta(df: DataFrame, binary_col: str, mime: str) -> DataFrame:
    """Wrap a binary column with typed metadata (checksum is computed
    JVM-side; width/height are filled by the decode stage)."""
    return df.withColumn("asset_meta", F.struct(
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.md5(F.col(binary_col)).alias("checksum"),
    ))


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic byte-hash pseudo-decoder for containers the real
    codecs (:mod:`.codecs` — PNG and WAV, stdlib-only) don't cover.

    NOT a decode: derives a stable pseudo-feature from raw bytes so
    batch shapes and partitioning can be exercised on arbitrary
    payloads.  It is never the default — :func:`decode_assets`
    dispatches to the real PNG/WAV decoders and refuses unknown
    containers unless a codec is passed explicitly.
    """
    if payload is None:
        raise NotImplementedError(
            "pseudo-decoder needs bytes; for real formats use the "
            "default sniff_decode (PNG/WAV) or pass codec=")
    out = []
    h = 2166136261
    for i, byte in enumerate(payload[:64] or b"\x00"):
        h = (h ^ byte) * 16777619 % (2 ** 32)
        if i % (max(len(payload[:64]) // dim, 1)) == 0 and len(out) < dim:
            out.append((h % 1000) / 1000.0)
    while len(out) < dim:
        out.append(0.0)
    return out


def decode_assets(df: DataFrame, id_col: str, binary_col: str,
                  dim: int = 8, codec=None) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, feature rows out.

    Runs one python worker per partition, vectorized over record
    batches — the canonical multimodal pattern at scale (the bytes
    never hit the driver).

    ``codec`` is any callable ``(payload: bytes, dim: int) ->
    list[float]``; it is shipped to the executors inside the
    mapInPandas closure, so a production deployment passes its own
    decoder (a PIL/torchaudio/ffmpeg wrapper) without touching this
    module.  The DEFAULT is :func:`.codecs.sniff_decode` — a REAL
    stdlib-only decoder that parses PNG (all five scanline filters)
    and RIFF/WAVE PCM payloads and raises on unknown containers
    (pass ``codec=_fake_decode`` explicitly to pseudo-decode
    arbitrary bytes in plumbing tests).
    """
    if codec is None:
        from .codecs import sniff_decode
        decode = sniff_decode
    else:
        decode = codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "asset_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[binary_col].map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "feature": pdf[binary_col].map(
                    lambda b: decode(bytes(b), dim)
                    if b is not None else [0.0] * dim),
            })

    return df.select(id_col, binary_col).mapInPandas(run, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
])


def _fake_split_frames(payload: bytes, frame_bytes: int,
                       every_n: int) -> list[bytes]:
    """Deterministic stand-in for a container demuxer (ffmpeg): treats
    the payload as fixed-size frames and keeps every ``every_n``-th.
    Swap for a real demuxer in production — the 1:N row shape,
    schema, and batch behavior are what this module exercises."""
    frames = [payload[i:i + frame_bytes]
              for i in range(0, len(payload), frame_bytes)]
    return frames[::every_n]


def sample_frames(df: DataFrame, id_col: str, binary_col: str,
                  frame_bytes: int = 16, every_n: int = 2,
                  splitter=None) -> DataFrame:
    """1:N frame-sampling stage (video/audio → frames/windows):
    mapInPandas where each input row EXPLODES into a variable number
    of output rows — the shape a UDTF would have, kept Arrow-batched.

    Unlike ``explode`` this never materializes the full frame list as
    one array value: frames stream out row-by-row inside the batch,
    so a long video with thousands of frames cannot blow a single
    array cell past Arrow limits.  ``splitter`` is any callable
    ``(payload, frame_bytes, every_n) -> list[bytes]``; production
    passes an ffmpeg wrapper, the default is the documented
    deterministic stub (no media libs in this container)."""
    split = splitter if splitter is not None else _fake_split_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                for i, fr in enumerate(split(bytes(payload),
                                             frame_bytes, every_n)):
                    ids.append(int(aid))
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({
                "asset_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": pd.Series(frames, dtype="object"),
                "n_bytes": pd.Series([len(f) for f in frames],
                                     dtype="int64"),
            })

    return df.select(id_col, binary_col).mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def _resize_pixels(pix: bytes, w: int, h: int, c: int,
                   out_w: int, out_h: int, method: str):
    """Resize a raw pixel buffer with numpy: 'nearest' picks source
    pixel ``floor(i * src / dst)`` (deterministic, oracle-friendly);
    'bilinear' is the standard align-corners=False interpolation."""
    import numpy as np

    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
    if method == "nearest":
        yi = (np.arange(out_h) * h) // out_h
        xi = (np.arange(out_w) * w) // out_w
        out = arr[yi[:, None], xi[None, :], :]
    elif method == "bilinear":
        ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
        wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
        a = arr.astype(np.float64)
        out = ((a[y0[:, None], x0[None, :]] * (1 - wy) * (1 - wx))
               + (a[y1[:, None], x0[None, :]] * wy * (1 - wx))
               + (a[y0[:, None], x1[None, :]] * (1 - wy) * wx)
               + (a[y1[:, None], x1[None, :]] * wy * wx))
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"resize method {method!r} (nearest/bilinear)")
    return np.ascontiguousarray(out)


def resize_images(df: DataFrame, id_col: str, binary_col: str,
                  out_w: int, out_h: int,
                  method: str = "nearest") -> DataFrame:
    """REAL image-resize stage (the brief's decode / feature-extract /
    **resize** / frame-sample quartet): decode each PNG or JPEG
    payload with the stdlib codecs, resize in numpy, re-encode as
    PNG — a full pixel pipeline per Arrow batch, never per row, and
    the bytes never touch the driver.

    'nearest' (default) is bit-deterministic (source index =
    ``floor(i*src/dst)``) so a SQL oracle can recompute the output
    pixels; 'bilinear' for quality.  Unknown containers raise (same
    contract as :func:`decode_assets`)."""
    from .codecs import _PNG_SIG, png_decode, png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import jpeg_decode

        for pdf in batches:
            ids, chans, payloads = [], [], []
            for aid, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                if b[:8] == _PNG_SIG:
                    w, h, c, pix = png_decode(b)
                elif b[:3] == b"\xff\xd8\xff":
                    w, h, c, pix = jpeg_decode(b)
                else:
                    raise ValueError(
                        "resize_images: unknown container "
                        "(PNG/JPEG only)")
                out = _resize_pixels(pix, w, h, c, out_w, out_h, method)
                ids.append(int(aid))
                chans.append(c)
                payloads.append(png_encode(out.tobytes(), out_w,
                                           out_h, c))
            yield pd.DataFrame({
                "asset_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series([out_w] * len(ids), dtype="int32"),
                "height": pd.Series([out_h] * len(ids), dtype="int32"),
                "channels": pd.Series(chans, dtype="int32"),
                "payload": pd.Series(payloads, dtype="object"),
            })

    return df.select(id_col, binary_col).mapInPandas(run, RESIZED_SCHEMA)
