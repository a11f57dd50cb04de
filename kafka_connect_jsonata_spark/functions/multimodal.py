"""Multimodal (image / audio / video) column operators for a training-data
pipeline.

Media travel as opaque ``binary`` payload columns with typed metadata — the
pattern a 100 TB multimodal corpus needs: the payload bytes are never
interpreted by Spark itself, metadata lives in a typed struct column usable
for partition pruning / filtering, and the decode / feature-extract /
resize / frame-sample steps run as Arrow-batched ``mapInPandas`` stages
(one Python process per partition, whole-column batches, no per-row UDF
overhead).

Because real codec libraries (Pillow, soundfile, av) are not installed in
this environment, the decode step is backed by a deterministic toy codec
("RAW1", header + uint8 samples, implemented on numpy) so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is real
and exactly tested. The entry points that would use a real codec
(`decode_real_image`) are import-guarded and raise ``NotImplementedError``
with a clear message when the library is absent.

RAW1 layout (big-endian):
  bytes 1-4   magic  b"RAW1"
  bytes 5-6   uint16 width
  bytes 7-8   uint16 height
  byte  9     uint8  channels
  byte  10    uint8  kind (1=image, 2=audio, 3=video)
  bytes 11-12 uint16 n_frames (1 for image; sample count / frame count)
  bytes 13..  uint8 samples, C-order (frames, height, width, channels)

Reference scope note: the reference SMT (rayokota/kafka-connect-jsonata)
carries BYTES values opaquely through its JSON bridge
(JsonataTransformation.java:233-236, :468-471); these operators are the
scale-out lift of that opaque-bytes column to media processing.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAGIC = b"RAW1"
_HEADER = ">4sHHBBH"  # magic, width, height, channels, kind, n_frames
HEADER_LEN = struct.calcsize(_HEADER)  # 12

KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 1, 2, 3

META_COLS = ("width", "height", "channels", "kind", "n_frames")


# ---------------------------------------------------------------------------
# toy codec (numpy) — deterministic stand-in for PNG/WAV/MP4 decode
# ---------------------------------------------------------------------------

def encode_raw1(arr: np.ndarray, kind: int) -> bytes:
    """Encode a uint8 array of shape (frames, h, w, c) as RAW1 bytes."""
    f, h, w, c = arr.shape
    return struct.pack(_HEADER, _MAGIC, w, h, c, kind, f) + arr.astype(np.uint8).tobytes()


def decode_raw1(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode RAW1 bytes -> (uint8 array (frames, h, w, c), kind)."""
    magic, w, h, c, kind, f = struct.unpack_from(_HEADER, buf, 0)
    if magic != _MAGIC:
        raise ValueError("not a RAW1 payload")
    arr = np.frombuffer(buf, dtype=np.uint8, offset=HEADER_LEN, count=f * h * w * c)
    return arr.reshape(f, h, w, c), kind


def _synth_array(seed: int, kind: int) -> np.ndarray:
    """Deterministic fake media content for a given id (seeded rng)."""
    rng = np.random.default_rng(seed)
    if kind == KIND_IMAGE:
        h, w, c, f = 8 + seed % 7, 8 + seed % 9, 3, 1
    elif kind == KIND_AUDIO:
        h, w, c, f = 1, 1, 1, 64 + seed % 65  # n_frames = sample count
    else:  # video
        h, w, c, f = 8, 8, 3, 4 + seed % 5
    return rng.integers(0, 256, size=(f, h, w, c), dtype=np.uint8)


# ---------------------------------------------------------------------------
# synthesis (mapInPandas): id column -> media envelope rows
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary"
)


def synth_media(df: DataFrame, id_col: str = "doc_id", kind: int = KIND_IMAGE) -> DataFrame:
    """Attach a deterministic fake payload per id — the ingest stand-in.

    Real pipelines read payload bytes straight from parquet/blob storage;
    this stage only exists because the test corpus has no binary column.
    Deterministic in the id, so results are partitioning-invariant.
    """
    mt = {KIND_IMAGE: "image/raw1", KIND_AUDIO: "audio/raw1", KIND_VIDEO: "video/raw1"}[kind]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": mt,
                    "payload": [encode_raw1(_synth_array(int(i), kind), kind) for i in ids],
                }
            )

    return df.select(id_col).mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# metadata: pure-JVM binary header parse (no Python in the path)
# ---------------------------------------------------------------------------

def _be_uint(col: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from `nbytes` bytes of a binary column
    (1-based pos). substring works on binary; hex -> conv stays JVM-side."""
    return F.conv(F.hex(F.substring(col, pos, nbytes)), 16, 10).cast("int")


def media_meta(payload: Column) -> Column:
    """Typed metadata struct parsed from the RAW1 header with built-in
    column functions only — usable in filters/partition pruning without
    ever shipping payload bytes to Python."""
    return F.struct(
        _be_uint(payload, 5, 2).alias("width"),
        _be_uint(payload, 7, 2).alias("height"),
        _be_uint(payload, 9, 1).alias("channels"),
        _be_uint(payload, 10, 1).alias("kind"),
        _be_uint(payload, 11, 2).alias("n_frames"),
        (F.length(payload) - HEADER_LEN).alias("payload_bytes"),
    )


def with_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    return df.withColumn("meta", media_meta(F.col(payload_col)))


# ---------------------------------------------------------------------------
# decode + feature extraction (mapInPandas, Arrow batches)
# ---------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "px_sum long, px_min int, px_max int, px_mean double"
)


def decode_image_payload(buf: bytes) -> np.ndarray:
    """Codec dispatch for image payloads: RAW1 magic -> toy codec, anything
    else -> the Pillow-backed real decode (``decode_real_image``). Keeps
    every downstream operator (stats, resize) codec-agnostic — swapping in
    PNG/JPEG inputs changes nothing in the Spark plans."""
    if buf[: len(_MAGIC)] == _MAGIC:
        arr, _ = decode_raw1(buf)
        return arr
    img = decode_real_image(buf)  # (1, h, w, c) or (1, h, w) grayscale
    if img.ndim == 3:  # grayscale: add a channel axis
        img = img[..., None]
    return img


def image_stats(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Per-image pixel statistics. The decode runs once per Arrow batch in
    a single Python worker per partition; only (id, payload) ship to
    Python — select the two columns before calling so Spark prunes the
    rest out of the Arrow transfer. Payloads dispatch by magic bytes, so
    RAW1 and real-codec images mix freely in one column."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "channels",
                                   "px_sum", "px_min", "px_max", "px_mean")}
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_image_payload(bytes(buf))
                f, h, w, c = arr.shape
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["px_sum"].append(int(arr.sum(dtype=np.int64)))
                out["px_min"].append(int(arr.min()))
                out["px_max"].append(int(arr.max()))
                out["px_mean"].append(float(arr.mean()))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(stats, IMAGE_STATS_SCHEMA)


RESIZE_SCHEMA = "media_id long, payload binary"


def resize_images(
    df: DataFrame, out_w: int, out_h: int,
    id_col: str = "media_id", payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor resize of every frame to (out_h, out_w); emits a
    new RAW1 payload. Real resampling math on the toy codec — swapping in
    Pillow changes only the decode/encode calls, not the Spark plan."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                arr, kind = decode_raw1(bytes(buf))
                f, h, w, c = arr.shape
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = arr[:, ys][:, :, xs]
                ids.append(int(mid))
                payloads.append(encode_raw1(resized, kind))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(rs, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, payload binary"


def sample_frames(
    df: DataFrame, stride: int = 2,
    id_col: str = "media_id", payload_col: str = "payload",
) -> DataFrame:
    """Every stride-th frame of a video payload as its own single-frame
    image row (media_id, frame_idx, payload) — the fan-out shape a frame-
    level training pipeline consumes. One input row -> ceil(f/stride)
    output rows; mapInPandas allows that cardinality change natively."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                arr, _ = decode_raw1(bytes(buf))
                for i in range(0, arr.shape[0], stride):
                    ids.append(int(mid))
                    idxs.append(i)
                    payloads.append(encode_raw1(arr[i : i + 1], KIND_IMAGE))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "payload": payloads})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(fs, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_samples int, rms double, zero_crossings int"
)


def audio_features(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """RMS + zero-crossing count over the (centered) sample stream — real
    DSP on the toy payloads."""

    def af(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_samples", "rms", "zero_crossings")}
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                arr, _ = decode_raw1(bytes(buf))
                samples = arr.reshape(-1).astype(np.float64) - 128.0
                out["media_id"].append(int(mid))
                out["n_samples"].append(int(samples.size))
                out["rms"].append(float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0)
                out["zero_crossings"].append(int(np.count_nonzero(np.diff(np.signbit(samples)))))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(af, AUDIO_FEATURES_SCHEMA)


BYTE_STATS_SCHEMA = "doc_id long, byte_sum long, byte_cnt int"


def text_byte_stats(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Exact per-payload byte sum/count via numpy over Arrow batches —
    the oracle-checkable probe that the binary column round-trips
    byte-exactly through the Arrow boundary (the corpus text is ASCII, so
    DuckDB can recompute the same sums from codepoints)."""

    def bs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "byte_sum": [], "byte_cnt": []}
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                out["doc_id"].append(int(mid))
                out["byte_sum"].append(int(b.sum(dtype=np.int64)))
                out["byte_cnt"].append(int(b.size))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(bs, BYTE_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# real-codec entry point (stub: codec libraries absent in this environment)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - not installed here
    from PIL import Image as _PILImage  # type: ignore[import-not-found]
except ImportError:
    _PILImage = None


def decode_real_image(buf: bytes, mode: str | None = None) -> np.ndarray:
    """Decode a real image format (PNG/JPEG/...) via Pillow into the same
    (frames=1, h, w[, c]) uint8 layout the RAW1 toy codec uses, so every
    downstream operator (stats, resize, frame fan-out) is codec-agnostic.

    ``mode`` optionally converts (e.g. "RGB" to normalize palette/CMYK
    inputs, "L" for grayscale). Import-guarded: in environments without
    Pillow (this container) it raises ``NotImplementedError`` — the
    Spark-side plumbing (schema, mapInPandas batching, payload pruning) is
    identical for the real codec; only this function changes. Where Pillow
    IS installed, `tests/test_multimodal.py` runs a real PNG round-trip
    through the full `image_stats` pipeline (skipped, not failed, here)."""
    if _PILImage is None:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed; "
            "use the RAW1 toy codec (decode_raw1) for plumbing tests"
        )
    import io

    img = _PILImage.open(io.BytesIO(buf))
    if mode is not None and img.mode != mode:
        img = img.convert(mode)
    return np.asarray(img)[None, ...]


def encode_real_image(arr: np.ndarray, format: str = "PNG") -> bytes:
    """Inverse of :func:`decode_real_image`: (1, h, w[, c]) uint8 array ->
    encoded image bytes. Same Pillow guard."""
    if _PILImage is None:
        raise NotImplementedError("real image encode requires Pillow")
    import io

    frame = np.asarray(arr)
    if frame.ndim == 4:
        frame = frame[0]
    if frame.ndim == 3 and frame.shape[-1] == 1:
        frame = frame[..., 0]
    out = io.BytesIO()
    _PILImage.fromarray(frame.astype(np.uint8)).save(out, format=format)
    return out.getvalue()
