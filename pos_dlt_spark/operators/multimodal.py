"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata (MEDIA_SCHEMA), processed by Arrow-batched
``mapInPandas`` operators.

The container has no codec LIBRARIES, so library-backed decodes are
STUBBED: ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (byte-stats
pseudo-features) exercises the full Spark-side path — schema handling,
Arrow batch shapes, partition-parallel execution — which is the part that
must be right at 100 TB. THREE real decoders need no library at all,
each value-oracled end to end by a gate query: uncompressed 24-bit BMP
(``decode_bmp24`` — header parse, row padding, bottom-up flip), RIFF/
WAVE PCM16 (``decode_wav_pcm16`` — chunk walk, sample decode), and
non-interlaced 8-bit PNG (``decode_png`` — chunk walk + CRC, stdlib
zlib inflate, all five scanline defilter types incl. paeth). The
remaining stub boundary is JPEG and compressed audio/video, whose
entropy coders genuinely need codec libraries.

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

    Only the library-backed codecs are stubbed — three formats decode
    for REAL with no library at all (BMP24 :func:`decode_bmp24`, WAV
    PCM16 :func:`decode_wav_pcm16`, PNG :func:`decode_png`); the
    remaining boundary is JPEG and compressed audio/video, whose
    entropy coders genuinely need PIL/librosa/ffmpeg — callers on a
    real cluster plug those in here. The deterministic fake derives an
    8-dim byte-histogram feature so tests cover the distributed
    plumbing end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "JPEG/compressed-AV codecs not available in this environment "
            "(BMP/WAV/PNG decode for real via decode_bmp24 / "
            "decode_wav_pcm16 / decode_png); pass fake=True for the "
            "deterministic byte-stats decoder"
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
    uint8 numpy array in BGR channel order. Pure numpy — one of the
    three genuinely-decoded formats in the container (with WAV and PNG);
    JPEG stays behind the codec-library boundary."""
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



# -- real decoder #3: PNG, non-interlaced 8-bit RGB/RGBA (stdlib zlib) --------

PNG_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("sum_a", LongType()),
        StructField("checksum_g", LongType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(left: int, up: int, ul: int) -> int:
    p = left + up - ul
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
    if pa <= pb and pa <= pc:
        return left
    return up if pb <= pc else ul


def encode_png(pixels) -> bytes:
    """Minimal PNG writer for an (h, w, 3|4) uint8 array: 8-bit
    truecolor (color type 2) / truecolor+alpha (6), non-interlaced.
    Row ``y`` uses filter type ``y % 5`` so every defilter path (none /
    sub / up / average / paeth) is exercised by any image taller than 4
    rows; the compressed stream is split across TWO IDAT chunks and a
    tEXt ancillary chunk precedes them, so the decoder's chunk walk and
    IDAT concatenation are exercised too. Test/fixture support for the
    decoder — not an image-processing API."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch not in (3, 4):
        raise ValueError(f"encode_png needs 3 or 4 channels, got {ch}")
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ft = y % 5
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        if ft == 0:
            out = line.copy()
        elif ft == 2:
            out = (line - prev) % 256
        else:
            out = np.zeros(stride, np.int32)
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                out[x] = (int(line[x]) - pred) % 256
        raw.append(ft)
        raw += out.astype(np.uint8).tobytes()
    comp = zlib.compress(bytes(raw), 6)
    half = max(1, len(comp) // 2)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Comment\x00pos_dlt_spark fixture")
        + _png_chunk(b"IDAT", comp[:half])
        + _png_chunk(b"IDAT", comp[half:])
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL decode of a non-interlaced 8-bit truecolor PNG (color type 2
    or 6) with nothing but stdlib ``zlib`` + numpy: verify the
    signature, walk the chunk list (CRC-checking every chunk, skipping
    ancillary ones), parse IHDR, concatenate ALL IDAT payloads, inflate,
    and undo the per-scanline filters (none/sub/up/average/paeth — the
    paeth predictor per the PNG spec, PNG being public W3C format
    documentation). Returns an (h, w, 3|4) uint8 array in RGB(A) channel
    order. The third genuinely-decoded format in the container (with
    BMP and WAV); palette/interlaced/16-bit PNG and JPEG stay behind the
    codec-library boundary."""
    import struct
    import zlib

    import numpy as np

    if payload is None or len(payload) < 8 or bytes(payload[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    saw_idat = False
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = bytes(payload[pos + 4 : pos + 8])
        data = bytes(payload[pos + 8 : pos + 8 + length])
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            saw_idat = True
            idat += data
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped by the walk
    if ihdr is None or not saw_idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); only non-interlaced 8-bit RGB/RGBA "
            "decodes without a codec library"
        )
    ch = 3 if color == 2 else 4
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def png_features(df: DataFrame) -> DataFrame:
    """mapInPandas: (media_id, payload) -> decoded PNG statistics with
    EXACT integer aggregates (per-channel int64 sums, alpha sum 0 for
    RGB, and a position-weighted green checksum over raster order — it
    catches a decoder whose defilter or chunk concatenation is off by
    anything, which channel means alone cannot). Embarrassingly
    parallel, no shuffle; payloads never leave the executor."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "channels", "n_px",
                "sum_r", "sum_g", "sum_b", "sum_a", "checksum_g",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_png(payload)
                h, w, ch = img.shape
                px = img.astype(np.int64)
                pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["n_px"].append(h * w)
                out["sum_r"].append(int(px[:, :, 0].sum()))
                out["sum_g"].append(int(px[:, :, 1].sum()))
                out["sum_b"].append(int(px[:, :, 2].sum()))
                out["sum_a"].append(
                    int(px[:, :, 3].sum()) if ch == 4 else 0
                )
                out["checksum_g"].append(int((px[:, :, 1] * pos).sum()))
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(run, PNG_FEATURE_SCHEMA)


def synth_png_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic PNG fixture generator AS A DISTRIBUTED OPERATOR:
    for each id, an RGB (even id) or RGBA (odd id) image of width
    ``4 + id % 5``, height ``5 + id % 4`` (always >= 5 rows, so every
    filter type 0-4 appears) whose pixel at (x, y), channel c is
    ``(id*41 + y*9 + x*5 + c*17) % 256`` — a closed form a SQL oracle
    can re-derive. Payload bytes are built executor-side per Arrow
    batch; nothing collects."""
    import numpy as np

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h, ch = 4 + mid % 5, 5 + mid % 4, 3 + mid % 2
                y, x, c = np.ogrid[0:h, 0:w, 0:ch]
                img = ((mid * 41 + y * 9 + x * 5 + c * 17) % 256).astype(np.uint8)
                ids.append(mid)
                payloads.append(encode_png(img))
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
