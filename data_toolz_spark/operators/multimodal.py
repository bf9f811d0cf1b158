"""Multimodal columns: opaque binary payloads + typed metadata.

Design (the 100 TB shape): media lives in a ``binary`` column (or an
object-store URI column for very large assets) next to a typed metadata
struct.  All pixel/sample-touching work — decode, feature extraction,
resize, frame sampling — runs as Arrow-batched ``mapInPandas`` stages so
bytes move executor-side in columnar batches and never pass through
row-at-a-time Python.  Everything before/after the decode stage is plain
DataFrame code: partition pruning, metadata predicates, joins.

This container has no image/audio codecs, so the real decoders are
gated behind import-tries (``decoder="pil"`` raises a clear
``NotImplementedError`` when Pillow is absent).  The Spark-side plumbing
is exercised for real through a deterministic toy codec (``FAKE``
format, below): schema, batching, UDF signatures, and the
encode→binary→decode round trip are all live code paths the tests and
the driver's DuckDB oracle verify value-for-value.

FAKE format: ``b"FAKE" | u8 version | u32 width | u32 height |
u8 channels | payload`` (big-endian), payload byte ``i`` of blob for
``media_id`` m  =  ``(m*31 + i*7) % 256`` — reproducible in ANSI SQL, so
decoded features are oracle-checkable without shipping binaries to the
oracle engine.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

FAKE_MAGIC = b"FAKE"
FAKE_VERSION = 1
_HEADER_FMT = ">4sBIIB"  # magic, version, width, height, channels
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)

MEDIA_META_FIELDS = (
    "media_type string, format string, width int, height int, "
    "channels int, n_bytes bigint"
)


def fake_blob(media_id: int, width: int, height: int, channels: int) -> bytes:
    """Deterministic FAKE-format blob for ``media_id`` (test/demo data)."""
    n = width * height * channels
    idx = np.arange(n, dtype=np.int64)
    payload = ((media_id * 31 + idx * 7) % 256).astype(np.uint8).tobytes()
    return struct.pack(_HEADER_FMT, FAKE_MAGIC, FAKE_VERSION, width, height, channels) + payload


def _range_partitions(spark, n_rows: int, rows_per_partition: int = 64) -> int:
    """Partition count for a generated table: enough parallelism to use
    the cluster, but never 32 near-empty slices of a 200-row demo table
    (each near-empty partition still costs a Python-worker lease per
    mapInPandas stage — pure overhead)."""
    want = max(1, n_rows // rows_per_partition)
    return min(want, spark.sparkContext.defaultParallelism)


def fake_media_table(
    spark,
    n_rows: int,
    *,
    seed_col: str = "media_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed synthetic media table: (media_id, content, meta).

    Blob generation happens executor-side via ``mapInPandas`` over a
    ``spark.range`` — no driver materialization, so the same code
    builds a 1e9-row table on a cluster.  Dimensions derive from the
    id: width = 16 + id % 48, height = 16 + id % 32, channels = 1 + id % 3.
    ``n_partitions`` defaults to ~64 rows per partition capped at the
    cluster's parallelism.
    """
    out_schema = StructType(
        [
            StructField(seed_col, LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            blobs = [
                fake_blob(
                    int(m), 16 + int(m) % 48, 16 + int(m) % 32, 1 + int(m) % 3
                )
                for m in ids
            ]
            yield pd.DataFrame({seed_col: ids, "content": blobs})

    n_parts = n_partitions or _range_partitions(spark, n_rows)
    return spark.range(n_rows, numPartitions=n_parts).mapInPandas(
        gen, out_schema
    )


def png_media_table(
    spark,
    n_rows: int,
    *,
    seed_col: str = "media_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Like :func:`fake_media_table` but the blobs are REAL PNGs.

    Same ids, dimensions, and deterministic pixel pattern
    (``(id*31 + i*7) % 256``) as the FAKE table, so any oracle written
    against the arithmetic holds unchanged — what changes is the byte
    path: each blob is a spec-compliant 8-bit PNG (gray / gray+alpha /
    RGB by ``1 + id % 3``), scanline filter ``id % 5`` so all five
    unfilter branches of :func:`decode_png` execute in every batch.
    Generation is executor-side ``mapInPandas`` over ``spark.range``,
    no driver materialization.
    """
    out_schema = StructType(
        [
            StructField(seed_col, LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            blobs = []
            for m in ids:
                m = int(m)
                w, h, c = 16 + m % 48, 16 + m % 32, 1 + m % 3
                idx = np.arange(w * h * c, dtype=np.int64)
                px = ((m * 31 + idx * 7) % 256).astype(np.uint8)
                blobs.append(
                    encode_png(px.reshape(h, w, c), filter_type=m % 5)
                )
            yield pd.DataFrame({seed_col: ids, "content": blobs})

    n_parts = n_partitions or _range_partitions(spark, n_rows)
    return spark.range(n_rows, numPartitions=n_parts).mapInPandas(
        gen, out_schema
    )


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# IHDR color type -> channel count (8-bit, non-interlaced support only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for tests/demos (8-bit, one IDAT).

    ``pixels`` is ``(h, w)`` grayscale or ``(h, w, c)`` with c in
    {1, 2, 3, 4} (gray, gray+alpha, RGB, RGBA), dtype uint8.  Pure
    stdlib (zlib + struct) — exists so the real-codec decode branch has
    an executed round-trip test in codec-less environments.

    ``filter_type`` applies one PNG scanline filter (0 None / 1 Sub /
    2 Up / 3 Average / 4 Paeth) to EVERY scanline, so round-trip tests
    and the driver qid can exercise each of the decoder's unfilter
    branches with spec-compliant bytes (filtering is lossless — the
    filtered deltas reconstruct the same pixels).
    """
    import zlib

    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"encode_png: invalid filter_type {filter_type}")
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int32)
    parts = []
    prev = np.zeros(stride, dtype=np.int32)
    fbyte = bytes([filter_type])
    for y in range(h):
        line = flat[y]
        # predictors read RAW (reconstructed) neighbors, which for the
        # encoder are simply the unfiltered pixels
        left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
        if filter_type == 0:
            filt = line
        elif filter_type == 1:  # Sub
            filt = line - left
        elif filter_type == 2:  # Up
            filt = line - prev
        elif filter_type == 3:  # Average
            filt = line - ((left + prev) >> 1)
        else:  # Paeth
            diag = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = left + prev - diag
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - diag)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, diag),
            )
            filt = line - pred
        parts.append(fbyte + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = line
    raw = b"".join(parts)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[dict, np.ndarray] | None:
    """Parse a PNG blob: ``(meta dict, flat uint8 pixel array)``.

    Real-codec reference path, pure stdlib: signature + chunk walk,
    zlib-inflate the IDAT stream, undo scanline filters 0-4 (None/Sub/
    Up/Average/Paeth per the PNG spec).  Supports 8-bit non-interlaced
    gray / gray+alpha / RGB / RGBA — the shapes a training pipeline's
    thumbnails use.  Returns ``None`` for anything else (the caller
    emits nulls, same as a corrupt FAKE blob).

    The unfilter loop is per-scanline Python over numpy rows — fine for
    thumbnail-sized media inside an Arrow batch; a production deployment
    swaps this kernel for Pillow/libvips inside the SAME ``mapInPandas``
    stage, which is the part of the design that carries to 100 TB.
    """
    import zlib

    b = bytes(blob)
    if len(b) < len(PNG_SIGNATURE) + 25 or not b.startswith(PNG_SIGNATURE):
        return None
    pos, width = len(PNG_SIGNATURE), None
    idat = bytearray()
    try:
        while pos + 8 <= len(b):
            (length,) = struct.unpack_from(">I", b, pos)
            tag = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + length]
            pos += 12 + length  # len + tag + data + crc
            if tag == b"IHDR":
                width, height, depth, color, comp, filt, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
                if (
                    depth != 8
                    or color not in _PNG_CHANNELS
                    or comp != 0
                    or filt != 0
                    or interlace != 0
                ):
                    return None
                channels = _PNG_CHANNELS[color]
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
        if width is None or not idat:
            return None
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except (struct.error, zlib.error):
        return None
    stride = width * channels
    if raw.size != height * (stride + 1):
        return None
    raw = raw.reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    c = channels
    for y in range(height):
        line, up = lines[y], out[y - 1] if y else np.zeros(stride, np.int32)
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + up) & 0xFF
        else:  # Sub / Average / Paeth need the in-progress scanline
            cur = out[y]
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                if f == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (line[x] + ((a + up[x]) >> 1)) & 0xFF
                elif f == 4:
                    bb, cc = up[x], (up[x - c] if x >= c else 0)
                    p = a + bb - cc
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    return None
    meta = {
        "media_type": "image",
        "format": "png",
        "width": int(width),
        "height": int(height),
        "channels": int(channels),
        "n_bytes": len(b),
    }
    return meta, out.astype(np.uint8).ravel()


def decode_media(
    df: DataFrame,
    content_col: str = "content",
    *,
    decoder: str = "fake",
) -> DataFrame:
    """Decode header metadata + content features from a binary column.

    Appends a ``meta`` struct (media_type/format/width/height/channels/
    n_bytes) and payload statistics (``mean_byte``, ``max_byte``).
    Arrow-batched ``mapInPandas``: one Python invocation per batch, all
    byte math vectorized in numpy.

    ``decoder="fake"`` parses the FAKE toy format (always available).
    ``decoder="png"`` decodes real 8-bit PNGs via the stdlib-only
    reference codec (:func:`decode_png`) — a genuinely executed
    real-format branch even in this codec-less container.
    ``decoder="pil"`` decodes arbitrary images via Pillow when
    installed; here it raises ``NotImplementedError``.  The surrounding
    plumbing (schema, batching, partitioning) is identical across all
    three, which is the part that matters for the engine.
    """
    if decoder == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='pil' needs Pillow, which is not installed in "
                "this environment; use decoder='fake' for the toy codec "
                "or decoder='png' for the stdlib PNG path"
            ) from exc
    elif decoder not in ("fake", "png"):
        raise ValueError(f"unknown decoder: {decoder!r}")

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("meta", StructType.fromDDL(MEDIA_META_FIELDS)),
            StructField("mean_byte", DoubleType()),
            StructField("max_byte", LongType()),
        ]
    )

    def _parse_fake(blob: bytes):
        if len(blob) < _HEADER_SIZE:
            return None
        magic, ver, w, h, c = struct.unpack_from(_HEADER_FMT, blob[:_HEADER_SIZE])
        if magic != FAKE_MAGIC:
            return None
        payload = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER_SIZE)
        meta = {
            "media_type": "image",
            "format": f"fake_v{ver}",
            "width": w,
            "height": h,
            "channels": c,
            "n_bytes": len(blob),
        }
        return meta, payload

    parse = decode_png if decoder == "png" else _parse_fake

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, means, maxs = [], [], []
            for blob in pdf[content_col]:
                parsed = None if blob is None else parse(bytes(blob))
                if parsed is None:
                    metas.append(None)
                    means.append(None)
                    maxs.append(None)
                    continue
                meta, payload = parsed
                metas.append(meta)
                means.append(float(payload.mean()) if payload.size else None)
                maxs.append(int(payload.max()) if payload.size else None)
            out = pdf.copy()
            out["meta"] = metas
            out["mean_byte"] = means
            out["max_byte"] = maxs
            yield out

    return df.mapInPandas(decode, out_schema)


def resize_media(
    df: DataFrame,
    content_col: str = "content",
    *,
    target_width: int,
    target_height: int,
    decoder: str = "fake",
) -> DataFrame:
    """Re-encode every blob at a new size (nearest-neighbor sampling).

    A real transformation for BOTH codecs: the pixel grid is
    index-resampled in numpy and re-encoded — ``decoder="png"`` (r6)
    decodes/re-encodes genuine PNGs through the stdlib codec, so the
    thumbnailing stage of an image pipeline runs real bytes
    end-to-end; ``"fake"`` re-packs the toy header.  A production
    deployment swaps the kernel for PIL/libvips inside the same
    ``mapInPandas`` stage — the distributed shape does not change.
    """
    if decoder == "pil":
        raise NotImplementedError(
            "decoder='pil' needs Pillow, which is not installed in this "
            "environment; use decoder='png' or 'fake'"
        )
    if decoder not in ("fake", "png"):
        raise ValueError(f"unknown decoder: {decoder!r}")

    def _grid(payload: np.ndarray) -> np.ndarray:
        h, w = payload.shape[:2]
        ys = (np.arange(target_height) * h // target_height).clip(0, h - 1)
        xs = (np.arange(target_width) * w // target_width).clip(0, w - 1)
        return payload[ys][:, xs]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blobs = []
            for blob in pdf[content_col]:
                if blob is None:
                    out_blobs.append(None)
                    continue
                b = bytes(blob)
                if decoder == "png":
                    parsed = decode_png(b)
                    if parsed is None:
                        out_blobs.append(None)
                        continue
                    meta, flat = parsed
                    px = flat.reshape(
                        meta["height"], meta["width"], meta["channels"]
                    )
                    out_blobs.append(encode_png(_grid(px)))
                    continue
                if len(b) < _HEADER_SIZE:
                    out_blobs.append(None)
                    continue
                magic, ver, w, h, c = struct.unpack_from(
                    _HEADER_FMT, b[:_HEADER_SIZE]
                )
                if magic != FAKE_MAGIC or w == 0 or h == 0:
                    out_blobs.append(None)
                    continue
                payload = np.frombuffer(
                    b, dtype=np.uint8, offset=_HEADER_SIZE
                ).reshape(h, w, c)
                out_blobs.append(
                    struct.pack(
                        _HEADER_FMT,
                        FAKE_MAGIC, ver, target_width, target_height, c,
                    )
                    + _grid(payload).tobytes()
                )
            out = pdf.copy()
            out[content_col] = out_blobs
            yield out

    return df.mapInPandas(resize, df.schema)


AUDIO_MAGIC = b"FAKA"
_AUDIO_HEADER_FMT = ">4sBII"  # magic, version, sample_rate, n_samples
_AUDIO_HEADER_SIZE = struct.calcsize(_AUDIO_HEADER_FMT)


def fake_audio_blob(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    """Deterministic FAKA blob: s16be samples, s_i = ((m·131+i·17) mod 2048) − 1024."""
    idx = np.arange(n_samples, dtype=np.int64)
    samples = (((media_id * 131 + idx * 17) % 2048) - 1024).astype(">i2")
    header = struct.pack(
        _AUDIO_HEADER_FMT, AUDIO_MAGIC, FAKE_VERSION, sample_rate, n_samples
    )
    return header + samples.tobytes()


def fake_audio_table(
    spark, n_rows: int, *, n_partitions: int | None = None
) -> DataFrame:
    """Synthetic audio table (media_id, content), generated executor-side.

    sample_rate = 8000 + (id % 3)·4000; n_samples = 800 + (id % 5)·400.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            blobs = [
                fake_audio_blob(
                    int(m), 8000 + (int(m) % 3) * 4000, 800 + (int(m) % 5) * 400
                )
                for m in ids
            ]
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    n_parts = n_partitions or _range_partitions(spark, n_rows)
    return spark.range(n_rows, numPartitions=n_parts).mapInPandas(
        gen, out_schema
    )


def encode_wav(
    samples: np.ndarray, sample_rate: int
) -> bytes:
    """Minimal RIFF/WAVE writer: PCM 16-bit mono little-endian.

    Pure stdlib (struct) — the bytes are a genuine playable .wav, the
    same honest-real-container discipline as :func:`encode_png` and
    :func:`encode_y4m`.
    """
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(blob: bytes):
    """Parse a RIFF/WAVE blob: ``(sample_rate, int16 sample array)``.

    Chunk walk per the spec (unknown chunks skipped, word-aligned);
    PCM 16-bit mono only — anything else returns ``None``, the same
    null-row contract as the other real codecs here.
    """
    b = bytes(blob)
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (length,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if len(body) < length:
            # truncated blob: the DECLARED length exceeds the bytes
            # actually present.  Honor the null-row contract (like
            # decode_png/decode_y4m) instead of letting a short fmt
            # chunk raise struct.error in the executor or a short
            # data chunk yield silently truncated samples (ADVICE r6)
            return None
        if tag == b"fmt ":
            if length < 16:
                return None
            fmt_code, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_code != 1 or channels != 1 or bits != 16:
                return None
        elif tag == b"data":
            data = body
    if rate is None or data is None or len(data) % 2:
        return None
    return rate, np.frombuffer(data, dtype="<i2")


def wav_audio_table(
    spark, n_rows: int, *, n_partitions: int | None = None
) -> DataFrame:
    """Like :func:`fake_audio_table` but each blob is a REAL playable
    .wav (PCM 16-bit mono).  Same ids, rates, and deterministic sample
    pattern, so oracles written against the arithmetic hold unchanged.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            blobs = []
            for m in ids:
                m = int(m)
                rate = 8000 + (m % 3) * 4000
                n = 800 + (m % 5) * 400
                idx = np.arange(n, dtype=np.int64)
                samples = ((m * 131 + idx * 17) % 2048) - 1024
                blobs.append(encode_wav(samples, rate))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    n_parts = n_partitions or _range_partitions(spark, n_rows)
    return spark.range(n_rows, numPartitions=n_parts).mapInPandas(
        gen, out_schema
    )


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    *,
    decoder: str = "fake",
) -> DataFrame:
    """Waveform statistics from a binary audio column.

    Appends sample_rate, n_samples, duration_sec, rms, peak — the
    audio-pipeline decode shape (parse container header → vectorized
    sample math), one numpy pass per blob inside an Arrow batch.
    ``decoder="wav"`` parses real RIFF/WAVE PCM blobs
    (:func:`decode_wav`); ``"fake"`` the toy header.  A real deployment
    swaps in soundfile/ffmpeg in the same ``mapInPandas`` stage.
    """
    if decoder not in ("fake", "wav"):
        raise ValueError(f"unknown audio decoder: {decoder!r}")
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("sample_rate", LongType()),
            StructField("n_samples", LongType()),
            StructField("duration_sec", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("peak", LongType()),
        ]
    )

    def _parse_fake(blob: bytes):
        if len(blob) < _AUDIO_HEADER_SIZE:
            return None
        magic, _ver, rate, n = struct.unpack_from(
            _AUDIO_HEADER_FMT, blob[:_AUDIO_HEADER_SIZE]
        )
        if magic != AUDIO_MAGIC or rate == 0:
            return None
        return rate, n, np.frombuffer(
            blob, dtype=">i2", offset=_AUDIO_HEADER_SIZE
        )

    def _parse_wav(blob: bytes):
        parsed = decode_wav(blob)
        if parsed is None:
            return None
        rate, samples = parsed
        return rate, len(samples), samples

    parse = _parse_wav if decoder == "wav" else _parse_fake

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("sample_rate", "n_samples", "duration_sec", "rms", "peak")}
            for blob in pdf[content_col]:
                parsed = None if blob is None else parse(bytes(blob))
                if parsed is None:
                    for k in cols:
                        cols[k].append(None)
                    continue
                rate, n, raw = parsed
                samples = raw.astype(np.float64)
                cols["sample_rate"].append(rate)
                cols["n_samples"].append(n)
                cols["duration_sec"].append(n / rate)
                cols["rms"].append(
                    float(np.sqrt(np.mean(samples * samples)))
                    if samples.size
                    else None
                )
                cols["peak"].append(
                    int(np.abs(samples).max()) if samples.size else None
                )
            out = pdf.copy()
            for k, v in cols.items():
                out[k] = v
            yield out

    return df.mapInPandas(decode, out_schema)


#: video near-dup grid: 5-frame clips, every 2nd frame sampled (odd
#: sample count → strict bit majorities, no ties)
VFP_N_FRAMES = 5


def _y4m_y_plane(
    g: int, member: int, fi: int, w: int, h: int
) -> np.ndarray:
    """Y plane of the planted video pattern: brightness is constant
    per dHash 8×9 grid cell (hash-mixed per group with a group×cell
    interaction), frames differ by a moving texture that block means
    ignore, and member k > 0 INVERTS the cell pattern of exactly one
    SAMPLED frame — the majority vote must outvote it (measured:
    within-group video-fp Hamming = 0, cross-group ≥ 6)."""
    y, x = np.mgrid[0:h, 0:w]
    cell = ((y * 8) // h) * 9 + (x * 9) // w
    bit = ((g * 2654435761 + cell * 2246822519 + g * cell * 40503)
           % 1009) % 2
    if member > 0 and fi == 2 * (member - 1) % VFP_N_FRAMES:
        bit = 1 - bit
    tex = ((y * w + x) * 7 + fi * 13) % 32
    return (192 * bit + tex).astype(np.uint8)


def y4m_neardup_table(
    spark, n_rows: int, *, group_size: int = 4,
    n_partitions: int | None = None,
) -> DataFrame:
    """Synthetic near-dup video corpus: REAL playable YUV4MPEG2 C444
    blobs in groups of ``group_size`` sharing frame content except one
    inverted sampled frame per non-base member (see
    :func:`_y4m_y_plane`; U = V = 128).  Dims per group:
    w = 24 + 8·(g%3), h = 16 + 8·(g%2); ``VFP_N_FRAMES`` frames."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            blobs = []
            for m in ids:
                m = int(m)
                g, member = m // group_size, m % group_size
                w, h = 24 + 8 * (g % 3), 16 + 8 * (g % 2)
                frames = np.empty(
                    (VFP_N_FRAMES, h, w, 3), dtype=np.uint8
                )
                for fi in range(VFP_N_FRAMES):
                    frames[fi, :, :, 0] = _y4m_y_plane(g, member, fi, w, h)
                    frames[fi, :, :, 1:] = 128
                blobs.append(encode_y4m(frames))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    n_parts = n_partitions or _range_partitions(spark, n_rows)
    return spark.range(n_rows, numPartitions=n_parts).mapInPandas(
        gen, out_schema
    )


def video_fingerprint(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    *,
    every_k: int = 2,
    out_col: str = "vfp",
) -> DataFrame:
    """64-bit video-content fingerprint: dHash of each sampled frame's
    Y plane (the integer-exact image hash,
    ``image_dedup.phash_from_pixels``), MAJORITY-voted per bit across
    the sampled frames — single-frame edits, inserts, or re-encodes of
    a minority of frames cannot change the fingerprint (pinned by
    tests on the planted corpus), which is exactly the video near-dup
    semantics.  Everything stays integer arithmetic from the raw
    bytes, so a SQL oracle rebuilds frame hashes, the vote, and the
    packed value.  One Arrow pass (container walk + per-frame hash +
    vote); undecodable blobs get NULL.  Pick ``every_k`` so the
    sampled count is ODD when possible — strict majorities have no
    tie branch (an even split votes 0, documented).  Mine pairs with
    ``dedup.fingerprint_band_pairs`` like every other fingerprint.
    """
    from data_toolz_spark.operators.image_dedup import phash_from_pixels

    if every_k < 1:
        raise ValueError("video_fingerprint: every_k must be >= 1")
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for blob in pdf[content_col]:
                parsed = None if blob is None else decode_y4m(bytes(blob))
                if parsed is None:
                    fps.append(None)
                    continue
                meta, frames = parsed
                hashes = []
                for fi in range(0, meta["n_frames"], every_k):
                    _ah, dh = phash_from_pixels(frames[fi][:, :, :1])
                    hashes.append(dh & ((1 << 64) - 1))
                n = len(hashes)
                v = 0
                for b in range(64):
                    if 2 * sum((hh >> b) & 1 for hh in hashes) > n:
                        v |= 1 << b
                if v >= 1 << 63:
                    v -= 1 << 64
                fps.append(v)
            out = pdf.copy()
            out[out_col] = pd.array(fps, dtype="Int64")
            yield out

    return df.mapInPandas(kernel, out_schema)


#: audio fingerprint grid: 65 fixed-length frames → 64 energy-delta
#: sign bits (Haitsma & Kalker 2002's bit derivation, simplified to
#: time-domain frame energies so every quantity is EXACT int64
#: arithmetic from the int16 samples — the same integer-portability
#: contract as the image hashes)
AFP_N_FRAMES = 65
AFP_FRAME_LEN = 20


def _afp_pattern(media_id: int, group_size: int):
    """Deterministic near-dup sample pattern for :func:`wav_neardup_table`:
    group members share a frame-amplitude profile (hash-mixed with a
    group×frame interaction so profiles decorrelate across groups) and
    differ by a sparse ±member perturbation far below the inter-frame
    energy gaps — measured margins on this construction: within-group
    Hamming ≤ 6, cross-group ≥ 14."""
    n = AFP_N_FRAMES * AFP_FRAME_LEN
    g, member = media_id // group_size, media_id % group_size
    i = np.arange(n, dtype=np.int64)
    f = i // AFP_FRAME_LEN
    amp = 1 + ((g * 2654435761 + f * 2246822519 + g * f * 40503)
               % 1009) % 5
    base = ((i * 17 + g * 131) % 64) - 32
    noise = np.where((i * 31 + member) % 37 == 0, member, 0)
    return amp * base + noise


def wav_neardup_table(
    spark, n_rows: int, *, group_size: int = 5,
    n_partitions: int | None = None,
) -> DataFrame:
    """Synthetic near-dup audio corpus: REAL playable .wav blobs in
    groups of ``group_size`` sharing content up to a small member
    perturbation (see :func:`_afp_pattern`).  rate = 8000 + (id%3)·4000;
    every blob is exactly ``AFP_N_FRAMES × AFP_FRAME_LEN`` samples."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            blobs = [
                encode_wav(
                    _afp_pattern(int(m), group_size),
                    8000 + (int(m) % 3) * 4000,
                )
                for m in ids
            ]
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    n_parts = n_partitions or _range_partitions(spark, n_rows)
    return spark.range(n_rows, numPartitions=n_parts).mapInPandas(
        gen, out_schema
    )


def audio_fingerprint(
    df: DataFrame,
    content_col: str = "content",
    *,
    decoder: str = "wav",
    frame_len: int = AFP_FRAME_LEN,
    n_frames: int = AFP_N_FRAMES,
    out_col: str = "afp",
) -> DataFrame:
    """64-bit audio-content fingerprint from a binary audio column:
    split the first ``n_frames × frame_len`` samples into fixed
    frames, bit b = [energy(frame b+1) > energy(frame b)] — the
    Haitsma-Kalker sign-of-energy-delta bit, time-domain variant.
    All arithmetic is int64-exact from the int16 samples (energies are
    integer sums of squares), so the fingerprint is engine-portable
    and any SQL oracle rebuilds it from the raw samples.  One Arrow
    pass (decode + energies + pack); blobs that fail to decode or are
    shorter than the grid get NULL.  ``n_frames`` must be 65 for a
    full 64-bit fingerprint; smaller grids leave high bits zero.
    Mine pairs with the generic Hamming banding
    (``dedup.fingerprint_band_pairs`` / ``fingerprint_components``) —
    the same machinery the image hashes ride.
    """
    if decoder != "wav":
        raise ValueError(f"unknown audio decoder: {decoder!r}")
    if not 2 <= n_frames <= 65:
        raise ValueError("audio_fingerprint: n_frames must be in [2, 65]")
    if frame_len < 1:
        raise ValueError("audio_fingerprint: frame_len must be >= 1")
    need = n_frames * frame_len
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for blob in pdf[content_col]:
                parsed = None if blob is None else decode_wav(bytes(blob))
                if parsed is None or len(parsed[1]) < need:
                    fps.append(None)
                    continue
                s = parsed[1][:need].astype(np.int64)
                e = (s * s).reshape(n_frames, frame_len).sum(axis=1)
                v = 0
                for b in range(n_frames - 1):
                    if e[b + 1] > e[b]:
                        v |= 1 << b
                if v >= 1 << 63:
                    v -= 1 << 64
                fps.append(v)
            out = pdf.copy()
            out[out_col] = pd.array(fps, dtype="Int64")
            yield out

    return df.mapInPandas(kernel, out_schema)


Y4M_SIGNATURE = b"YUV4MPEG2 "


def encode_y4m(frames: np.ndarray, *, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Minimal YUV4MPEG2 writer (C444 planar, 8-bit, progressive).

    ``frames`` is ``(n, h, w, 3)`` uint8 — per-frame Y/U/V planes are
    written planar per the spec (each plane ``h*w`` bytes), every frame
    preceded by its ``FRAME\\n`` marker.  Pure stdlib: Y4M is the
    uncompressed interchange container mpv/ffmpeg read directly, which
    makes it the honest "real video container" for a codec-less
    environment — the bytes produced here are playable as-is.
    """
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("encode_y4m: frames must be (n, h, w, 3) uint8")
    n, h, w, _ = arr.shape
    header = (
        Y4M_SIGNATURE
        + f"W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444".encode()
        + b"\n"
    )
    parts = [header]
    for f in range(n):
        # planar: all Y, then all U, then all V
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(arr[f].transpose(2, 0, 1)).tobytes())
    return b"".join(parts)


def decode_y4m(blob: bytes):
    """Parse a YUV4MPEG2 stream: ``(meta dict, (n, h, w, 3) uint8)``.

    Walks the stream header (W/H/F/C tags), then each ``FRAME`` marker
    (optional per-frame params up to the newline are tolerated per the
    spec) followed by one planar C444 frame.  Returns ``None`` for
    non-Y4M input, non-C444 color spaces, or truncated frames — same
    null-row contract as :func:`decode_png`.
    """
    b = bytes(blob)
    if not b.startswith(Y4M_SIGNATURE):
        return None
    nl = b.find(b"\n")
    if nl < 0:
        return None
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "C420jpeg"
    for tag in b[len(Y4M_SIGNATURE) : nl].split(b" "):
        try:
            if tag.startswith(b"W"):
                width = int(tag[1:])
            elif tag.startswith(b"H"):
                height = int(tag[1:])
            elif tag.startswith(b"F"):
                fps_num, fps_den = (int(x) for x in tag[1:].split(b":"))
            elif tag.startswith(b"C"):
                colorspace = tag.decode()
        except (ValueError, UnicodeDecodeError):
            return None
    if not width or not height or colorspace != "C444":
        return None
    frame_bytes = width * height * 3
    frames = []
    pos = nl + 1
    while pos < len(b):
        if not b.startswith(b"FRAME", pos):
            return None
        fnl = b.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_bytes > len(b):
            return None
        planar = np.frombuffer(
            b, dtype=np.uint8, count=frame_bytes, offset=fnl + 1
        )
        frames.append(
            planar.reshape(3, height, width).transpose(1, 2, 0)
        )
        pos = fnl + 1 + frame_bytes
    if not frames:
        return None
    meta = {
        "media_type": "video",
        "format": "y4m",
        "width": int(width),
        "height": int(height),
        "channels": 3,
        "n_bytes": len(b),
        "n_frames": len(frames),
        "fps_num": fps_num,
        "fps_den": fps_den,
    }
    return meta, np.stack(frames)


def y4m_video_table(
    spark,
    n_rows: int,
    *,
    seed_col: str = "media_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Real-container synthetic video table: each blob is a playable
    YUV4MPEG2 stream.  Dimensions/frame count derive from the id
    (width = 8 + id % 24, height = 8 + id % 16, frames = 2 + id % 7);
    pixel ``i`` of frame ``f`` is ``(id*131 + f*17 + i*7) % 256`` —
    deterministic arithmetic an oracle can recompute.  Executor-side
    ``mapInPandas`` generation, like the image/audio tables.
    """
    out_schema = StructType(
        [
            StructField(seed_col, LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            blobs = []
            for m in ids:
                m = int(m)
                w, h, n = 8 + m % 24, 8 + m % 16, 2 + m % 7
                fsz = h * w * 3
                fidx = np.arange(n, dtype=np.int64)[:, None]
                pidx = np.arange(fsz, dtype=np.int64)[None, :]
                px = ((m * 131 + fidx * 17 + pidx * 7) % 256).astype(
                    np.uint8
                )
                # pattern indexes PLANAR bytes (what the container
                # stores); reshape to (n, 3, h, w) then to frame layout
                frames = px.reshape(n, 3, h, w).transpose(0, 2, 3, 1)
                blobs.append(encode_y4m(frames))
            yield pd.DataFrame({seed_col: ids, "content": blobs})

    n_parts = n_partitions or _range_partitions(spark, n_rows)
    return spark.range(n_rows, numPartitions=n_parts).mapInPandas(
        gen, out_schema
    )


def sample_frames_y4m(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    *,
    every_k: int = 2,
) -> DataFrame:
    """Real-container frame sampling: decode each Y4M blob, keep every
    k-th frame, emit per-frame stats — one row per sampled frame
    ``(id, frame_index, width, height, mean_byte, max_byte)``.

    Same generator-``mapInPandas`` shape as :func:`sample_frames` (one
    input row yields many output rows, no driver involvement); the
    container walk replaces the toy fixed-stride slicing.  Undecodable
    blobs contribute no rows.
    """
    out_schema = StructType.fromDDL(
        f"{id_col} bigint, frame_index int, width int, height int, "
        "mean_byte double, max_byte bigint"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, means, maxs = [], [], [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                parsed = None if blob is None else decode_y4m(bytes(blob))
                if parsed is None:
                    continue
                meta, frames = parsed
                for fi in range(0, meta["n_frames"], every_k):
                    fr = frames[fi]
                    ids.append(int(mid))
                    idxs.append(fi)
                    ws.append(meta["width"])
                    hs.append(meta["height"])
                    means.append(float(fr.mean()))
                    maxs.append(int(fr.max()))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_index": idxs,
                    "width": ws,
                    "height": hs,
                    "mean_byte": means,
                    "max_byte": maxs,
                }
            )

    return df.mapInPandas(sample, out_schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    *,
    frame_bytes: int,
    every_k: int = 2,
) -> DataFrame:
    """Treat each payload as a frame sequence; keep every k-th frame.

    Output: one row per sampled frame ``(id, frame_index, frame)`` —
    the video-sampling shape (decode container → iterate frames → emit
    selected) expressed as a generator ``mapInPandas`` so one input row
    can yield many output rows without driver involvement.
    """
    out_schema = StructType.fromDDL(
        f"{id_col} bigint, frame_index int, frame binary"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None or len(blob) < _HEADER_SIZE:
                    continue
                payload = bytes(blob)[_HEADER_SIZE :]
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, every_k):
                    ids.append(int(mid))
                    idxs.append(fi)
                    frames.append(
                        payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_index": idxs, "frame": frames}
            )

    return df.mapInPandas(sample, out_schema)


__all__ = [
    "fake_audio_blob",
    "fake_audio_table",
    "encode_wav",
    "decode_wav",
    "wav_audio_table",
    "audio_features",
    "AUDIO_MAGIC",
    "fake_blob",
    "fake_media_table",
    "png_media_table",
    "decode_media",
    "decode_png",
    "encode_png",
    "PNG_SIGNATURE",
    "Y4M_SIGNATURE",
    "encode_y4m",
    "decode_y4m",
    "y4m_video_table",
    "sample_frames_y4m",
    "resize_media",
    "wav_neardup_table",
    "y4m_neardup_table",
    "video_fingerprint",
    "VFP_N_FRAMES",
    "audio_fingerprint",
    "AFP_N_FRAMES",
    "AFP_FRAME_LEN",
    "sample_frames",
    "FAKE_MAGIC",
    "MEDIA_META_FIELDS",
]
