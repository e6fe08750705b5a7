"""Deletion-vector codec for the Delta protocol — pure-Python, built from
the PUBLIC specs only:

- Delta PROTOCOL.md "Deletion Vectors": descriptor schema on the add
  action (``storageType`` u/i/p, ``pathOrInlineDv``, ``offset``,
  ``sizeInBytes``, ``cardinality``), the on-disk DV file layout (1-byte
  format version, then per-DV ``<dataSize: int32 BE><bitmap bytes>
  <CRC-32 of bitmap bytes: int32 BE>``), and Z85 path/inline encoding.
- The RoaringBitmapArray "portable" serialization the bitmap bytes use:
  ``<magic 1681511377: int32 LE><number of 32-bit bitmaps: int64 LE>``
  followed by that many standard portable-format 32-bit Roaring bitmaps,
  one per high-32-bit key in increasing DENSE order (bitmap i holds the
  low 32 bits of values whose high bits equal i).
- The public RoaringFormatSpec for each 32-bit bitmap: cookie 12347
  (run-containers present, container count in the cookie's high 16 bits)
  or 12346 (+ separate count word), descriptive header of (key,
  cardinality-1) pairs, optional offset header, then array (sorted
  uint16 list), bitmap (1024×uint64), or run (count + (start, length)
  pairs) containers.

Everything here is driver-side METADATA work bounded by DV size — the
row-level filtering itself stays a distributed JVM anti-join in
``sources/delta.py`` (no Python touches data rows).
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


class DeletionVectorError(Exception):
    """Malformed or unsupported deletion-vector payload."""


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise DeletionVectorError(f"z85 input must be 4-byte aligned, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise DeletionVectorError(f"z85 text length must be a multiple of 5, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_DECODE[c]
            except KeyError:
                raise DeletionVectorError(f"invalid z85 character {c!r}") from None
        out += struct.pack(">I", v)
    return bytes(out)


# -- 32-bit roaring bitmap (portable format) --------------------------------


def _decode_roaring32(buf: memoryview, pos: int) -> tuple[list[int], int]:
    """Decode one standard portable 32-bit Roaring bitmap starting at
    ``pos``; returns (sorted low-32 values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        run_flags = bytes(buf[pos : pos + (n + 7) // 8])
        pos += (n + 7) // 8
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_flags = b"\x00" * ((n + 7) // 8)
    else:
        raise DeletionVectorError(f"bad roaring cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    has_run = (cookie & 0xFFFF) == _SERIAL_COOKIE
    if (not has_run) or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset header — containers follow sequentially anyway
    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif cards[i] > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
    return values, pos


def _encode_roaring32(values: list[int]) -> bytes:
    """Encode sorted low-32 values as a portable 32-bit Roaring bitmap
    (array/bitmap containers only — always valid, runs are an optional
    optimization)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (mandatory for the no-run cookie)
    offset = len(out) + 4 * n
    for k in keys:
        out += struct.pack("<I", offset)
        offset += 8192 if len(containers[k]) > 4096 else 2 * len(containers[k])
    for k in keys:
        vals = containers[k]
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
        else:
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


# -- 64-bit RoaringBitmapArray (Delta's DV payload) -------------------------


def decode_dv_bitmap(data: bytes) -> list[int]:
    """Serialized RoaringBitmapArray -> sorted list of deleted row
    indices."""
    if len(data) < 12:
        raise DeletionVectorError(f"DV bitmap too short ({len(data)} bytes)")
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != _MAGIC:
        raise DeletionVectorError(f"bad DV magic {magic} (expected {_MAGIC})")
    buf = memoryview(data)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        lows, pos = _decode_roaring32(buf, pos)
        out.extend((high << 32) | lo for lo in lows)
    return out


def encode_dv_bitmap(indices: list[int]) -> bytes:
    """Sorted/unsorted row indices -> serialized RoaringBitmapArray
    (dense high-key order, the portable layout)."""
    idx = sorted(set(int(i) for i in indices))
    if idx and idx[0] < 0:
        raise DeletionVectorError("negative row index")
    n_bitmaps = (idx[-1] >> 32) + 1 if idx else 0
    groups: dict[int, list[int]] = {h: [] for h in range(n_bitmaps)}
    for v in idx:
        groups[v >> 32].append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", _MAGIC, n_bitmaps))
    for h in range(n_bitmaps):
        out += _encode_roaring32(groups[h])
    return bytes(out)


# -- DV file + descriptor ---------------------------------------------------


def write_dv_file(path: str, bitmaps: list[bytes]) -> list[tuple[int, int]]:
    """Write a DV file holding the given serialized bitmaps; returns
    [(offset, sizeInBytes), ...] for the descriptors. Layout per the
    protocol: 1-byte format version, then per DV
    ``<dataSize BE><data><crc32(data) BE>``."""
    entries = []
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        pos = 1
        for data in bitmaps:
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            entries.append((pos, len(data)))
            pos += 4 + len(data) + 4
    return entries


def read_dv_descriptor(table_path: str, dv: dict) -> list[int]:
    """Resolve an add action's deletionVector descriptor to the sorted
    deleted row indices. Supports storageType 'i' (inline z85), 'u'
    (relative UUID file) and 'p' (absolute path); anything else fails
    loudly."""
    import os
    import uuid as _uuid

    st = dv.get("storageType")
    payload = dv.get("pathOrInlineDv", "")
    if st == "i":
        data = z85_decode(payload)[: int(dv["sizeInBytes"])]
    elif st in ("u", "p"):
        if st == "u":
            # last 20 chars: z85 of the 16-byte UUID; anything before is a
            # random path prefix directory
            prefix, enc = payload[:-20], payload[-20:]
            u = _uuid.UUID(bytes=z85_decode(enc))
            fname = f"deletion_vector_{u}.bin"
            fpath = os.path.join(table_path, prefix, fname) if prefix else os.path.join(
                table_path, fname
            )
        else:
            fpath = payload
        offset = int(dv.get("offset") or 0)
        size = int(dv["sizeInBytes"])
        with open(fpath, "rb") as fh:
            fh.seek(offset)
            (declared,) = struct.unpack(">i", fh.read(4))
            if declared != size:
                raise DeletionVectorError(
                    f"DV size mismatch at {fpath}:{offset}: file says {declared}, "
                    f"descriptor says {size}"
                )
            data = fh.read(size)
            (crc,) = struct.unpack(">I", fh.read(4))
            if zlib.crc32(data) & 0xFFFFFFFF != crc:
                raise DeletionVectorError(f"DV checksum mismatch at {fpath}:{offset}")
    else:
        raise DeletionVectorError(f"unsupported DV storageType {st!r}")
    indices = decode_dv_bitmap(data)
    card = dv.get("cardinality")
    if card is not None and int(card) != len(indices):
        raise DeletionVectorError(
            f"DV cardinality mismatch: descriptor {card}, bitmap {len(indices)}"
        )
    return indices


def dv_relative_path(dv: dict) -> str | None:
    """Table-relative sidecar path for a descriptor, or None when the DV
    is inline ('i') or lives at an absolute path ('p' — outside the table
    root, never vacuum's to collect)."""
    import uuid as _uuid

    if dv.get("storageType") != "u":
        return None
    payload = dv.get("pathOrInlineDv", "")
    prefix, enc = payload[:-20], payload[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    fname = f"deletion_vector_{u}.bin"
    return f"{prefix}/{fname}" if prefix else fname


def make_dv_descriptor(
    table_path: str, indices: list[int], inline_threshold: int = 512
) -> dict:
    """Build a descriptor (and sidecar file when above the inline
    threshold) for the given deleted row indices — the writer half."""
    import os
    import uuid as _uuid

    data = encode_dv_bitmap(indices)
    if len(data) <= inline_threshold:
        pad = (-len(data)) % 4
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
            "offset": None,
            "sizeInBytes": len(data),
            "cardinality": len(set(indices)),
        }
    u = _uuid.uuid4()
    fname = f"deletion_vector_{u}.bin"
    entries = write_dv_file(os.path.join(table_path, fname), [data])
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": entries[0][0],
        "sizeInBytes": entries[0][1],
        "cardinality": len(set(indices)),
    }
