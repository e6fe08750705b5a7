"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata (MEDIA_SCHEMA), processed by Arrow-batched
``mapInPandas`` operators.

The container has no codec LIBRARIES, so library-backed decodes are
STUBBED: ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (byte-stats
pseudo-features) exercises the full Spark-side path — schema handling,
Arrow batch shapes, partition-parallel execution — which is the part that
must be right at 100 TB. One REAL decoder needs no library at all:
uncompressed 24-bit BMP (``decode_bmp24`` — header parse, row padding,
bottom-up flip, all numpy) — it anchors the honest codec boundary with an
actually-decoded format and is value-oracled end to end
(``multimodal_bmp_decode`` gate query).

Scale notes:
- media rows are large (MBs); keep ``spark.sql.files.maxPartitionBytes``
  at default so scan tasks hold a handful of payloads, and NEVER collect
  payload columns to the driver;
- ``mapInPandas`` streams Arrow batches — peak executor memory is one
  batch of payloads per task, controlled by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it low, e.g. 32,
  for multi-MB payloads);
- feature outputs drop the payload column as early as possible so
  downstream stages shuffle features (KBs), not media (MBs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> list[float]:
    """Decode a media payload into a feature vector.

    Real decoding needs codec libraries not present in this container —
    callers on a real cluster plug in PIL/librosa/ffmpeg here. The
    deterministic fake derives an 8-dim byte-histogram feature so tests
    cover the distributed plumbing end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; pass fake=True "
            "for the deterministic byte-stats decoder"
        )
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    buckets = [0] * 8
    for by in payload:
        buckets[by >> 5] += 1
    n = len(payload)
    return [b / n for b in buckets]


def extract_media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas operator: (media_id, kind, payload) -> features.

    Arrow-batched; each task processes its partition's batches
    independently — embarrassingly parallel, no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, k, fake=fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "byte_mean": [
                        (sum(p) / len(p)) if p is not None and len(p) else 0.0
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, MEDIA_FEATURE_SCHEMA)


# -- real decoder: uncompressed 24-bit BMP (no codec library needed) ---------

BMP_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", LongType()),
        StructField("sum_b", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_r", LongType()),
        StructField("checksum_r", LongType()),
    ]
)


def encode_bmp24(pixels) -> bytes:
    """Minimal BI_RGB 24-bit BMP writer for an (h, w, 3) uint8 array in
    TOP-DOWN row order and BGR channel order. Rows are written bottom-up
    with 4-byte padding, per the format. Test/fixture support for the
    decoder — not an image-processing API."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (3 * w + 3) // 4 * 4
    rows = bytearray()
    pad = b"\x00" * (stride - 3 * w)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += arr[y].tobytes() + pad
    pixel_off = 14 + 40
    size = pixel_off + len(rows)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return bytes(header + info + rows)


def decode_bmp24(payload: bytes):
    """REAL decode of an uncompressed 24-bit BMP: parse the file +
    BITMAPINFOHEADER headers (little-endian), honor the pixel-data
    offset, strip per-row 4-byte padding, and flip the bottom-up row
    order (negative height = already top-down). Returns an (h, w, 3)
    uint8 numpy array in BGR channel order. Pure numpy — this is the one
    genuinely-decoded format in the container; PNG/JPEG stay behind the
    codec-library boundary."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = data.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    return rows if top_down else rows[::-1]


def bmp_features(df: DataFrame) -> DataFrame:
    """mapInPandas: (media_id, payload) -> decoded BMP statistics with
    EXACT integer aggregates (per-channel int64 pixel sums and a
    position-weighted red checksum over top-down raster order — the
    checksum catches a decoder that forgets the bottom-up flip or the
    row padding, which channel means alone cannot). Division to means
    happens in the calling query so both engines divide the same exact
    integers. Embarrassingly parallel, no shuffle; payloads never leave
    the executor."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "n_px",
                                   "sum_b", "sum_g", "sum_r", "checksum_r")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_bmp24(payload)
                h, w, _ = img.shape
                pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
                px = img.astype(np.int64)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(h * w)
                out["sum_b"].append(int(px[:, :, 0].sum()))
                out["sum_g"].append(int(px[:, :, 1].sum()))
                out["sum_r"].append(int(px[:, :, 2].sum()))
                out["checksum_r"].append(int((px[:, :, 2] * pos).sum()))
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(run, BMP_FEATURE_SCHEMA)


def synth_bmp_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic BMP fixture generator AS A DISTRIBUTED OPERATOR:
    for each id, an image of width 4+id%5, height 3+id%4 whose BGR pixel
    at top-down (x, y), channel c is ``(id*31 + y*7 + x*3 + c) % 256`` —
    a closed form a SQL oracle can re-derive. Payload bytes are built
    executor-side per Arrow batch; nothing collects."""
    import numpy as np

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 5, 3 + mid % 4
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                img = ((mid * 31 + y * 7 + x * 3 + c) % 256).astype(np.uint8)
                ids.append(mid)
                payloads.append(encode_bmp24(img))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(run, schema)


# -- real decoder #2: RIFF/WAVE PCM16 audio (no codec library needed) --------

WAV_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_abs", LongType()),
        StructField("sum_sq", LongType()),
        StructField("zero_cross", LongType()),
        StructField("checksum", LongType()),
    ]
)


def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer: PCM (audio format 1), 16-bit
    little-endian, from an (n,) or (n, channels) int16 array. Emits a
    JUNK chunk before ``fmt`` so decoders must genuinely walk the chunk
    list (real-world WAVs carry LIST/INFO chunks there). Test/fixture
    support for the decoder — not an audio-processing API."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    _n, ch = arr.shape
    data = arr.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16
    )
    chunks = b"JUNK" + struct.pack("<I", 4) + b"\x00" * 4
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_pcm16(payload: bytes):
    """REAL decode of a RIFF/WAVE PCM16 file: verify the RIFF/WAVE
    magic, WALK the chunk list (word-aligned sizes, unknown chunks like
    JUNK/LIST skipped), parse the ``fmt `` chunk, and view the ``data``
    chunk as little-endian int16 frames. Returns
    ``((n_frames, n_channels) int16 array, sample_rate)``. Pure numpy —
    the second genuinely-decoded format in the container (with BMP);
    compressed codecs (MP3/AAC/FLAC) stay behind the codec-library
    boundary."""
    import struct

    import numpy as np

    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = bytes(payload[pos : pos + 4])
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _brate, _balign, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "compressed audio stays behind the codec-library boundary"
        )
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, ch), int(rate)


def wav_features(df: DataFrame) -> DataFrame:
    """mapInPandas: (media_id, payload) -> decoded WAV statistics with
    EXACT integer aggregates over channel 0 (|sample| sum, energy as
    sum of squares, zero crossings on the >=0 sign, and a
    position-weighted checksum ``sum(s_i * (i % 97 + 1))`` that catches
    a decoder with wrong sample order, byte order, or chunk offsets —
    means alone cannot). Embarrassingly parallel, no shuffle; payloads
    never leave the executor."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_samples",
                "sum_abs", "sum_sq", "zero_cross", "checksum",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, rate = decode_wav_pcm16(payload)
                s = frames[:, 0].astype(np.int64)
                nonneg = s >= 0
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(frames.shape[1])
                out["n_samples"].append(frames.shape[0])
                out["sum_abs"].append(int(np.abs(s).sum()))
                out["sum_sq"].append(int((s * s).sum()))
                out["zero_cross"].append(int((nonneg[1:] != nonneg[:-1]).sum()))
                out["checksum"].append(
                    int((s * (np.arange(len(s), dtype=np.int64) % 97 + 1)).sum())
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(run, WAV_FEATURE_SCHEMA)


def synth_wav_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic WAV fixture generator AS A DISTRIBUTED OPERATOR:
    for each id, a mono PCM16 clip of ``50 + id % 64`` samples at
    ``8000 + (id % 3) * 4000`` Hz whose sample ``i`` is
    ``(id*37 + i*13) % 4001 - 2000`` — a closed form a SQL oracle can
    re-derive. Payload bytes are built executor-side per Arrow batch;
    nothing collects."""
    import numpy as np

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = 50 + mid % 64
                i = np.arange(n, dtype=np.int64)
                s = ((mid * 37 + i * 13) % 4001 - 2000).astype(np.int16)
                ids.append(mid)
                payloads.append(
                    encode_wav_pcm16(s, sample_rate=8000 + (mid % 3) * 4000)
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(run, schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator shape: passthrough metadata update (the pixel
    transform is part of the stubbed codec layer). Keeps the operator
    surface so pipelines can declare resize steps today and swap in a real
    decoder later."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast(IntegerType()).alias("width"),
            F.lit(height).cast(IntegerType()).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling operator shape: emits (media_id, frame_ts_ms)
    rows from duration metadata — the real frame extraction plugs into the
    codec layer; the row-multiplication plumbing (sequence + explode) is
    real and runs at scale."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
