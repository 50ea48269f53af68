"""TIFF codec — stdlib+numpy, no image libraries.

Baseline TIFF 6.0 decode: both byte orders (II/MM), IFD walk,
strip-based layout, bilevel/gray/palette/RGB(A), bit depths
1/8/16, and the three fully-specified compressions — none (1),
LZW (5, MSB-first codes WITH the spec's "early change" width bump),
and PackBits (32773). Predictor 2 (horizontal differencing) is
honored for LZW. Tiled TIFFs and JPEG-in-TIFF raise ValueError
(rare in crawl corpora; JPEG-in-TIFF is its own codec).

The encoder writes single-strip uncompressed or PackBits RGB/gray
TIFFs plus an LZW mode — the usual correctness-encoder stance: each
option forces one decoder path and roundtrips bit-exact.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no media surface; this
extends the multimodal family (SURVEY.md §2.13) beside the other
from-scratch codecs (png inline, `jpeg.py`, `vp8l.py`,
`gifanim.py`).
"""

from __future__ import annotations

import struct

__all__ = ["decode_tiff", "encode_tiff", "tiff_dimensions"]

# tag ids (TIFF 6.0)
_WIDTH, _HEIGHT = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR, _PREDICTOR, _COLORMAP = 284, 317, 320
_TILE_TAGS = (322, 323, 324, 325)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes, order: str):
    """First IFD → {tag: [values]}."""
    (off,) = struct.unpack(order + "I", data[4:8])
    (n,) = struct.unpack(order + "H", data[off : off + 2])
    tags = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag, typ, count = struct.unpack(order + "HHI", data[e : e + 8])
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack(order + "I", data[e + 8 : e + 12])
            raw = data[voff : voff + size]
        if typ in (3,):  # SHORT
            vals = list(struct.unpack(order + "H" * count, raw))
        elif typ in (4,):  # LONG
            vals = list(struct.unpack(order + "I" * count, raw))
        elif typ in (1, 6, 7):
            vals = list(raw)
        elif typ == 5:  # RATIONAL
            vals = [
                struct.unpack(order + "II", raw[8 * i : 8 * i + 8])
                for i in range(count)
            ]
        else:
            vals = list(raw)
        tags[tag] = vals
    return tags


def tiff_dimensions(payload: bytes):
    """Header-scale (width, height) or None — probe-path helper."""
    try:
        order = {"II": "<", "MM": ">"}.get(payload[:2].decode("ascii", "ignore"))
        if order is None or struct.unpack(order + "H", payload[2:4])[0] != 42:
            return None
        tags = _read_ifd(payload, order)
        return tags[_WIDTH][0], tags[_HEIGHT][0]
    except Exception:
        return None


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # copy n+1 literals
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW: MSB-first bit packing, 256 literals + CLEAR
    (256) + EOI (257), and the spec's EARLY CHANGE: code width
    bumps when the table reaches 2^w - 1 (one entry before GIF
    would)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    acc = nbits = pos = 0
    prev = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                return bytes(out[:expected])
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:  # early change
            width += 1
    return bytes(out[:expected])


def decode_tiff(payload: bytes):
    """TIFF payload → H×W×3 RGB uint8 (grayscale broadcast, palette
    expanded, 16-bit scaled to 8, alpha dropped). Raises ValueError
    on unsupported layouts (tiles, planar, JPEG compression)."""
    import numpy as np

    order = {"II": "<", "MM": ">"}.get(payload[:2].decode("ascii", "ignore"))
    if order is None or struct.unpack(order + "H", payload[2:4])[0] != 42:
        raise ValueError("not a TIFF")
    tags = _read_ifd(payload, order)
    if any(t in tags for t in _TILE_TAGS):
        raise ValueError("tiled TIFF not supported (strip layout only)")
    if tags.get(_PLANAR, [1])[0] != 1:
        raise ValueError("planar configuration 2 not supported")
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    w = tags[_WIDTH][0]
    h = tags[_HEIGHT][0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [1] * spp)
    if len(set(bits)) != 1 or bits[0] not in (1, 8, 16):
        raise ValueError(f"unsupported bit depths {bits}")
    depth = bits[0]
    photometric = tags.get(_PHOTOMETRIC, [1])[0]
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0] or h
    offsets = tags[_STRIP_OFFSETS]
    counts = tags.get(_STRIP_COUNTS, [len(payload) - offsets[0]])
    row_bytes = (w * spp * depth + 7) // 8
    raw = bytearray()
    for si, off in enumerate(offsets):
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = row_bytes * n_rows
        chunk = payload[off : off + counts[si]]
        if comp == 1:
            raw += chunk[:expected].ljust(expected, b"\x00")
        elif comp == 32773:
            raw += _packbits_decode(chunk, expected)
        else:
            dec = _lzw_decode_tiff(chunk, expected)
            raw += dec.ljust(expected, b"\x00")
    raw = bytes(raw[: row_bytes * h])
    if depth == 1:
        rows = np.frombuffer(raw, np.uint8).reshape(h, row_bytes)
        pix = np.unpackbits(rows, axis=1)[:, :w].astype(np.uint8)
        if photometric == 0:  # WhiteIsZero
            pix = 1 - pix
        arr = (pix * 255).astype(np.uint8)[:, :, None]
        spp = 1
    elif depth == 16:
        dt = np.dtype(order + "u2")
        arr16 = np.frombuffer(raw, dt).reshape(h, w, spp)
        if tags.get(_PREDICTOR, [1])[0] == 2:
            # invert horizontal differencing on the FULL-DEPTH samples
            # (per channel, mod 2^16) before the 8-bit downscale —
            # doing it after would decode to garbage
            arr16 = np.cumsum(arr16.astype(np.int64), axis=1).astype(np.uint16)
        arr = (arr16 >> 8).astype(np.uint8)
    else:
        arr = np.frombuffer(raw, np.uint8).reshape(h, w, spp)
        arr = arr.copy()
        if tags.get(_PREDICTOR, [1])[0] == 2:
            arr = np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)
    if tags.get(_PREDICTOR, [1])[0] == 2 and depth == 1:
        # predictor 2 is defined on integer samples ≥ 8 bits; a 1-bit
        # image claiming it is malformed — raise instead of silently
        # decoding garbage (matches the other unsupported-layout paths)
        raise ValueError("TIFF Predictor=2 unsupported for 1-bit data")
    if photometric == 3:  # palette
        cmap = tags.get(_COLORMAP)
        if cmap is None:
            raise ValueError("palette TIFF without ColorMap")
        n = len(cmap) // 3
        pal = (
            np.array(cmap, np.uint32).reshape(3, n).T >> 8
        ).astype(np.uint8)  # 16-bit colormap entries → 8-bit
        idx = np.minimum(arr[:, :, 0].astype(np.int64), n - 1)
        return pal[idx]
    if photometric == 0 and depth != 1:  # WhiteIsZero grayscale
        arr = 255 - arr
    if spp == 1:
        return np.repeat(arr, 3, axis=2)
    return arr[:, :, :3].copy()


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (the TIFF recommendation: rows don't share
    runs). Simple literal/run splitter."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and row[i + 1] == row[i])
        ):
            i += 1
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Literal-only TIFF LZW (CLEAR before the width would bump,
    honoring early change) — always-valid, non-compressing."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    width = 9
    table_len = 258
    emit(CLEAR, width)
    for byte in data:
        if table_len >= (1 << width) - 2:  # stay clear of early change
            emit(CLEAR, width)
            table_len = 258
        emit(byte, width)
        table_len += 1  # decoder adds one entry per emitted code
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    img,
    compression: str = "none",
    big_endian: bool = False,
) -> bytes:
    """H×W×3 RGB (or H×W gray) uint8 → single-strip TIFF bytes.
    ``compression`` in {"none", "packbits", "lzw"}."""
    import numpy as np

    a = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    gray = a.ndim == 2
    h, w = a.shape[:2]
    spp = 1 if gray else a.shape[2]
    order = ">" if big_endian else "<"
    raw = a.tobytes()
    if compression == "none":
        comp_id, body = 1, raw
    elif compression == "packbits":
        row_bytes = w * spp
        comp_id = 32773
        body = b"".join(
            _packbits_encode(raw[r * row_bytes : (r + 1) * row_bytes])
            for r in range(h)
        )
    elif compression == "lzw":
        comp_id, body = 5, _lzw_encode_tiff(raw)
    else:
        raise ValueError(f"unknown compression {compression!r}")

    header = struct.pack(order + "2sHI", b"II" if order == "<" else b"MM", 42, 8)
    entries = []

    def entry(tag, typ, count, value_bytes):
        if len(value_bytes) <= 4:
            entries.append((tag, typ, count, value_bytes.ljust(4, b"\x00"), None))
        else:
            entries.append((tag, typ, count, None, value_bytes))

    short = lambda v: struct.pack(order + "H", v)  # noqa: E731
    long_ = lambda v: struct.pack(order + "I", v)  # noqa: E731
    entry(_WIDTH, 3, 1, short(w))
    entry(_HEIGHT, 3, 1, short(h))
    entry(_BITS, 3, spp, b"".join(short(8) for _ in range(spp)))
    entry(_COMPRESSION, 3, 1, short(comp_id))
    entry(_PHOTOMETRIC, 3, 1, short(1 if gray else 2))
    entry(_STRIP_OFFSETS, 4, 1, long_(0))  # patched below
    entry(_SPP, 3, 1, short(spp))
    entry(_ROWS_PER_STRIP, 3, 1, short(h))
    entry(_STRIP_COUNTS, 4, 1, long_(len(body)))

    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    ext_off = 8 + ifd_size
    ext = bytearray()
    fixed = []
    for tag, typ, count, inline, extern in sorted(entries, key=lambda e: e[0]):
        if tag == _STRIP_OFFSETS:
            fixed.append((tag, typ, count, None, None))
            continue
        if extern is not None:
            fixed.append((tag, typ, count, long_(ext_off + len(ext)), None))
            ext += extern
        else:
            fixed.append((tag, typ, count, inline, None))
    data_off = ext_off + len(ext)
    out = bytearray(header)
    out += struct.pack(order + "H", n)
    for tag, typ, count, inline, _ in fixed:
        if tag == _STRIP_OFFSETS:
            inline = long_(data_off)
        out += struct.pack(order + "HHI", tag, typ, count) + inline
    out += long_(0)  # next IFD
    out += ext
    out += body
    return bytes(out)


def _read_ifd_at(data: bytes, order: str, off: int):
    """IFD at an explicit offset → ({tag: [values]}, next_ifd_off).
    ASCII (type 2) values decode to stripped strings."""
    (n,) = struct.unpack(order + "H", data[off : off + 2])
    tags = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag, typ, count = struct.unpack(order + "HHI", data[e : e + 8])
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack(order + "I", data[e + 8 : e + 12])
            raw = data[voff : voff + size]
        if typ == 3:
            vals = list(struct.unpack(order + "H" * count, raw))
        elif typ == 4:
            vals = list(struct.unpack(order + "I" * count, raw))
        elif typ == 2:
            vals = [raw.split(b"\x00", 1)[0].decode("ascii", "replace").strip()]
        elif typ == 5:
            vals = [
                struct.unpack(order + "II", raw[8 * i : 8 * i + 8])
                for i in range(count)
            ]
        else:
            vals = list(raw)
        tags[tag] = vals
    (nxt,) = struct.unpack(
        order + "I", data[off + 2 + 12 * n : off + 6 + 12 * n]
    )
    return tags, nxt


#: EXIF tags surfaced by :func:`parse_exif`
_EXIF_SUBIFD = 0x8769
_EXIF_FIELDS = {
    0x0112: "orientation",
    0x010F: "make",
    0x0110: "camera_model",
    0x0132: "datetime",
    0x9003: "datetime_original",
    0x829A: "exposure_time",
    0x8827: "iso",
    0xA002: "pixel_x",
    0xA003: "pixel_y",
}


def parse_exif(payload: bytes):
    """EXIF metadata from a JPEG APP1 segment or a TIFF file →
    dict of the common fields (orientation, make, camera_model,
    datetime, datetime_original, exposure_time, iso, pixel_x,
    pixel_y) — header-scale, no pixel decode; {} when absent or
    malformed. Rationals come back as (num, den) tuples."""
    try:
        tiff_block = None
        if payload[:2] == b"\xff\xd8":  # JPEG: walk to APP1/Exif
            i = 2
            while i + 4 <= len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
                if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
                    tiff_block = payload[i + 10 : i + 2 + seg_len]
                    break
                if marker == 0xDA:  # scan data: nothing after helps
                    break
                i += 2 + seg_len
        elif payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
            tiff_block = payload
        if not tiff_block:
            return {}
        order = {"II": "<", "MM": ">"}.get(
            tiff_block[:2].decode("ascii", "ignore")
        )
        if order is None:
            return {}
        (ifd0_off,) = struct.unpack(order + "I", tiff_block[4:8])
        tags, _ = _read_ifd_at(tiff_block, order, ifd0_off)
        if _EXIF_SUBIFD in tags:
            sub, _ = _read_ifd_at(tiff_block, order, tags[_EXIF_SUBIFD][0])
            tags.update(sub)
        out = {}
        for tag, name in _EXIF_FIELDS.items():
            if tag in tags and tags[tag]:
                v = tags[tag][0]
                out[name] = v
        return out
    except Exception:
        return {}
