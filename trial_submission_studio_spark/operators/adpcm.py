"""Compressed RIFF/WAVE audio — G.711 (µ-law/A-law), IMA ADPCM, and
MS ADPCM — stdlib+numpy, no audio libraries.

The stdlib ``wave`` module only reads PCM (format tag 1); real crawl
corpora carry telephony and legacy-compressed WAV too. This module
parses the RIFF chunks itself and decodes the four classic
compressed tags:

=====  ==================  =========================
tag    name                compression
=====  ==================  =========================
0x02   MS ADPCM            ~4:1, block-adaptive
0x06   G.711 A-law         2:1 companding
0x07   G.711 µ-law         2:1 companding
0x11   IMA/DVI ADPCM       ~4:1, block-adaptive
=====  ==================  =========================

All constants are the published ITU-T G.711 / IMA / Microsoft
tables (step sizes, index adaptation, coefficient pairs) — small,
well-known spec data. Decode output is the package-wide audio
contract: ``(sample_rate, n_channels, float64 mono samples in
[-1, 1])``. Correctness encoders exist for every tag so tests can
roundtrip (G.711 is exactly invertible on its quantization lattice;
ADPCM is checked by SNR); where Python still ships ``audioop``
(< 3.13) the G.711 tables and the IMA core loop are additionally
pinned bit-exact against it.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no media surface; this
belongs to the training-data extension family (SURVEY.md §2.13),
shrinking the round-7 "lossy/compressed codecs" stub list on the
audio side. A full MP3/AAC decode stays a documented stub: their
Huffman code tables are arbitrary published constants unavailable in
this container, and shipping guessed tables would decode garbage.
"""

from __future__ import annotations

__all__ = [
    "decode_wav_compressed",
    "parse_wav_header",
    "ulaw_decode",
    "ulaw_encode",
    "alaw_decode",
    "alaw_encode",
    "ima_adpcm_decode_block",
    "ima_adpcm_encode",
    "ms_adpcm_encode",
    "encode_wav",
]

# ---- published constant tables -------------------------------------------

#: IMA ADPCM step-size table (89 entries)
IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)

#: IMA ADPCM index adaptation (by low 3 bits of the nibble)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)

#: MS ADPCM predictor coefficient pairs (7 standard predictors)
MS_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)

#: MS ADPCM delta adaptation (by 4-bit code)
MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


# ---- G.711 ----------------------------------------------------------------

def _ulaw_decode_table():
    import numpy as np

    out = np.empty(256, dtype=np.int16)
    for byte in range(256):
        u = ~byte & 0xFF
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        mag = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
        out[byte] = -mag if u & 0x80 else mag
    return out


def _alaw_decode_table():
    import numpy as np

    out = np.empty(256, dtype=np.int16)
    for byte in range(256):
        a = byte ^ 0x55
        seg = (a >> 4) & 0x07
        mantissa = a & 0x0F
        if seg == 0:
            mag = (mantissa << 4) + 8
        else:
            mag = ((mantissa << 4) + 0x108) << (seg - 1)
        # G.711 A-law: bit 7 SET (after the 0x55 toggle) is positive
        out[byte] = mag if a & 0x80 else -mag
    return out


def ulaw_decode(data: bytes):
    """µ-law bytes → int16 numpy samples (G.711 decode table)."""
    import numpy as np

    return _ulaw_decode_table()[np.frombuffer(data, dtype=np.uint8)]


def alaw_decode(data: bytes):
    """A-law bytes → int16 numpy samples (G.711 decode table)."""
    import numpy as np

    return _alaw_decode_table()[np.frombuffer(data, dtype=np.uint8)]


def ulaw_encode(samples) -> bytes:
    """int16 samples → µ-law bytes — the CCITT G.711 reference
    algorithm on the 14-bit lattice (bit-exact with classic
    implementations, incl. stdlib ``audioop``)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16).astype(np.int64) >> 2  # 14-bit
    mask = np.where(s < 0, 0x7F, 0xFF)
    mag = np.where(s < 0, -s, s)
    mag = np.minimum(mag, 8159) + 33  # 14-bit clip + bias
    seg = np.zeros_like(mag)
    for end in (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF):
        seg += mag > end
    uval = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
    out = np.where(seg >= 8, 0x7F, uval) ^ mask
    return out.astype(np.uint8).tobytes()


def alaw_encode(samples) -> bytes:
    """int16 samples → A-law bytes — the CCITT G.711 reference
    algorithm on the 13-bit lattice."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16).astype(np.int64) >> 3  # 13-bit
    mask = np.where(s >= 0, 0xD5, 0x55)
    mag = np.where(s >= 0, s, -s - 1)
    seg = np.zeros_like(mag)
    for end in (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF):
        seg += mag > end
    mantissa = np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    aval = (seg << 4) | mantissa
    out = np.where(seg >= 8, 0x7F, aval) ^ mask
    return out.astype(np.uint8).tobytes()


# ---- IMA ADPCM ------------------------------------------------------------

def _ima_step(pred: int, index: int, nibble: int):
    """One IMA ADPCM decode step (the published bit-test method)."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nibble & 7]))
    return pred, index


def ima_adpcm_decode_block(data: bytes, pred: int, index: int, low_first=True):
    """Decode a raw IMA nibble stream with the given initial state →
    (list of int16 samples, (pred, index)). WAV packs the FIRST
    sample of each byte in the LOW nibble; ``low_first=False`` gives
    the high-nibble-first packing some non-WAV containers use."""
    out = []
    for byte in data:
        pair = (byte & 0x0F, byte >> 4) if low_first else (byte >> 4, byte & 0x0F)
        for nib in pair:
            pred, index = _ima_step(pred, index, nib)
            out.append(pred)
    return out, (pred, index)


def _ima_encode_step(sample: int, pred: int, index: int):
    step = IMA_STEP_TABLE[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    pred, index = _ima_step(pred, index, nibble)
    return nibble, pred, index


def ima_adpcm_encode(samples, rate: int, block_align: int = 1024) -> bytes:
    """Mono int16 samples → complete IMA-ADPCM WAV bytes (tag 0x11)
    with proper per-block 4-byte state headers."""
    import struct

    import numpy as np

    s = [int(v) for v in np.asarray(samples, dtype=np.int16)]
    spb = (block_align - 4) * 2 + 1  # samples per block, mono
    blocks = []
    index = 0
    i = 0
    n = len(s)
    while i < n:
        chunk = s[i : i + spb]
        pred = chunk[0]
        hdr = struct.pack("<hBB", pred, index, 0)
        nibbles = []
        p = pred
        for v in chunk[1:]:
            nib, p, index = _ima_encode_step(v, p, index)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        body = bytes(
            (nibbles[k] | (nibbles[k + 1] << 4)) for k in range(0, len(nibbles), 2)
        )
        body = body.ljust(block_align - 4, b"\x00")
        blocks.append(hdr + body)
        i += spb
    data = b"".join(blocks)
    return _wrap_riff(
        data, tag=0x11, rate=rate, channels=1, bits=4,
        block_align=block_align, n_samples=n, extra=struct.pack("<H", spb),
    )


def _ima_decode_wav(data: bytes, block_align: int, channels: int, n_samples: int):
    """IMA blocks (WAV layout: per-channel 4-byte headers, then
    4-byte per-channel sample groups interleaved) → per-channel
    int16 lists."""
    import struct

    chans = [[] for _ in range(channels)]
    off = 0
    while off + 4 * channels <= len(data):
        block = data[off : off + block_align]
        off += block_align
        states = []
        for c in range(channels):
            pred, index, _ = struct.unpack_from("<hBB", block, c * 4)
            index = max(0, min(88, index))
            chans[c].append(pred)
            states.append((pred, index))
        pos = 4 * channels
        while pos < len(block):
            for c in range(channels):
                chunk = block[pos + c * 4 : pos + (c + 1) * 4]
                if not chunk:
                    continue
                dec, states[c] = ima_adpcm_decode_block(chunk, *states[c])
                chans[c].extend(dec)
            pos += 4 * channels
    return [ch[:n_samples] if n_samples else ch for ch in chans]


# ---- MS ADPCM -------------------------------------------------------------

def _ms_decode_block(block: bytes, channels: int):
    import struct

    preds = []
    for c in range(channels):
        p = block[c]
        if p >= len(MS_COEFS):
            raise ValueError("bad MS ADPCM predictor index")
        preds.append(MS_COEFS[p])
    deltas = list(
        struct.unpack_from("<" + "h" * channels, block, channels)
    )
    s1 = list(struct.unpack_from("<" + "h" * channels, block, 3 * channels))
    s2 = list(struct.unpack_from("<" + "h" * channels, block, 5 * channels))
    chans = [[s2[c], s1[c]] for c in range(channels)]
    ci = 0
    for byte in block[7 * channels :]:
        for nib in (byte >> 4, byte & 0x0F):  # high nibble first
            c = ci % channels
            ci += 1
            signed = nib - 16 if nib >= 8 else nib
            coef1, coef2 = preds[c]
            predicted = (s1[c] * coef1 + s2[c] * coef2) >> 8
            sample = max(-32768, min(32767, predicted + signed * deltas[c]))
            s2[c], s1[c] = s1[c], sample
            deltas[c] = max(16, (MS_ADAPT[nib] * deltas[c]) >> 8)
            chans[c].append(sample)
    return chans


def ms_adpcm_encode(samples, rate: int, block_align: int = 1024) -> bytes:
    """Mono int16 samples → complete MS-ADPCM WAV bytes (tag 0x02),
    predictor 0, standard delta adaptation."""
    import struct

    import numpy as np

    s = [int(v) for v in np.asarray(samples, dtype=np.int16)]
    spb = (block_align - 7) * 2 + 2  # samples per block, mono
    blocks = []
    i = 0
    n = len(s)
    while i < n:
        chunk = s[i : i + spb]
        while len(chunk) < 2:
            chunk = chunk + [0]
        coef1, coef2 = MS_COEFS[0]
        s2, s1 = chunk[0], chunk[1]
        delta = max(16, abs(s1 - s2) // 4 or 16)
        hdr = struct.pack("<Bhhh", 0, delta, s1, s2)
        nibbles = []
        for v in chunk[2:]:
            predicted = (s1 * coef1 + s2 * coef2) >> 8
            err = v - predicted
            nib = max(-8, min(7, (err + (delta // 2 if err >= 0 else -delta // 2)) // delta))
            sample = max(-32768, min(32767, predicted + nib * delta))
            nibbles.append(nib & 0x0F)
            s2, s1 = s1, sample
            delta = max(16, (MS_ADAPT[nib & 0x0F] * delta) >> 8)
        if len(nibbles) % 2:
            nibbles.append(0)
        body = bytes(
            ((nibbles[k] << 4) | nibbles[k + 1]) for k in range(0, len(nibbles), 2)
        )
        body = body.ljust(block_align - 7, b"\x00")
        blocks.append(hdr + body)
        i += spb
    data = b"".join(blocks)
    extra = struct.pack("<HH", spb, len(MS_COEFS))
    for c1, c2 in MS_COEFS:
        extra += struct.pack("<hh", c1, c2)
    return _wrap_riff(
        data, tag=0x02, rate=rate, channels=1, bits=4,
        block_align=block_align, n_samples=n, extra=extra,
    )


# ---- RIFF plumbing --------------------------------------------------------

def parse_wav_header(payload: bytes):
    """RIFF/WAVE chunk walk → dict(tag, rate, channels, bits,
    block_align, data, n_samples) or None. ``n_samples`` comes from
    the fact chunk when present (authoritative for compressed WAV)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    info = {}
    n_samples = 0
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            tag, ch, rate, _br, ba, bits = struct.unpack("<HHIIHH", body[:16])
            info.update(
                tag=tag, channels=ch, rate=rate, block_align=ba, bits=bits
            )
        elif cid == b"fact" and len(body) >= 4:
            (n_samples,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            info["data"] = body
        i += 8 + size + (size & 1)
    if "data" not in info or "tag" not in info:
        return None
    info["n_samples"] = n_samples
    return info


def _wrap_riff(data, tag, rate, channels, bits, block_align, n_samples, extra=b""):
    import struct

    avg_bps = rate * block_align // max(
        1, ((block_align - (4 if tag == 0x11 else 7) * channels) * 2 + channels)
    ) if tag in (0x02, 0x11) else rate * channels * (bits // 8 or 1)
    fmt = struct.pack(
        "<HHIIHH", tag, channels, rate, avg_bps, block_align, bits
    ) + (struct.pack("<H", len(extra)) + extra if extra else b"")
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + (b"\x00" if len(fmt) % 2 else b"")
    chunks += b"fact" + struct.pack("<II", 4, n_samples)
    chunks += b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav(samples, rate: int, codec: str = "ulaw") -> bytes:
    """Mono int16 samples → compressed WAV bytes. ``codec`` in
    {"ulaw", "alaw", "ima", "ms"}."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if codec == "ulaw":
        return _wrap_riff(ulaw_encode(s), 0x07, rate, 1, 8, 1, len(s))
    if codec == "alaw":
        return _wrap_riff(alaw_encode(s), 0x06, rate, 1, 8, 1, len(s))
    if codec == "ima":
        return ima_adpcm_encode(s, rate)
    if codec == "ms":
        return ms_adpcm_encode(s, rate)
    raise ValueError(f"unknown codec {codec!r}")


def decode_wav_compressed(payload: bytes):
    """Compressed RIFF/WAVE payload → (rate, channels, float64 mono
    samples in [-1, 1]) — the package audio contract — or None when
    the payload is not a WAV with a tag this module decodes
    (PCM stays with the stdlib ``wave`` path)."""
    import numpy as np

    info = parse_wav_header(payload or b"")
    if info is None:
        return None
    tag, data = info["tag"], info["data"]
    ch = max(1, info["channels"])
    n = info["n_samples"]
    if tag == 0x07:
        x = ulaw_decode(data).astype(np.float64) / 32768.0
    elif tag == 0x06:
        x = alaw_decode(data).astype(np.float64) / 32768.0
    elif tag == 0x11:
        chans = _ima_decode_wav(data, info["block_align"], ch, n)
        x = np.array(chans, dtype=np.float64).mean(axis=0) / 32768.0
        return info["rate"], ch, x
    elif tag == 0x02:
        chans_all = [[] for _ in range(ch)]
        ba = info["block_align"]
        for off in range(0, len(data) - 7 * ch + 1, ba):
            for c, dec in enumerate(_ms_decode_block(data[off : off + ba], ch)):
                chans_all[c].extend(dec)
        if n:
            chans_all = [c[:n] for c in chans_all]
        x = np.array(chans_all, dtype=np.float64).mean(axis=0) / 32768.0
        return info["rate"], ch, x
    else:
        return None
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
    if n:
        x = x[:n]
    return info["rate"], ch, x


def parse_id3v2(payload: bytes):
    """ID3v2.2/2.3/2.4 text metadata from an MP3/AAC payload →
    dict(title, artist, album, year, track, genre) — header-scale
    (frame walk with syncsafe sizes, no audio decode); {} when no
    tag or malformed. The audio twin of `tiff.parse_exif`."""
    try:
        if payload[:3] != b"ID3" or len(payload) < 10:
            return {}
        ver = payload[3]
        size = (
            ((payload[6] & 0x7F) << 21)
            | ((payload[7] & 0x7F) << 14)
            | ((payload[8] & 0x7F) << 7)
            | (payload[9] & 0x7F)
        )
        body = payload[10 : 10 + size]
        if ver == 2:  # v2.2: 3-byte ids, 3-byte sizes
            names = {b"TT2": "title", b"TP1": "artist", b"TAL": "album",
                     b"TYE": "year", b"TRK": "track", b"TCO": "genre"}
            out = {}
            i = 0
            while i + 6 <= len(body) and body[i] != 0:
                fid = body[i : i + 3]
                fsz = int.from_bytes(body[i + 3 : i + 6], "big")
                data = body[i + 6 : i + 6 + fsz]
                if fid in names and data:
                    out[names[fid]] = _id3_text(data)
                i += 6 + fsz
            return out
        names = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
                 b"TYER": "year", b"TDRC": "year", b"TRCK": "track",
                 b"TCON": "genre"}
        out = {}
        i = 0
        while i + 10 <= len(body) and body[i] != 0:
            fid = body[i : i + 4]
            raw_sz = body[i + 4 : i + 8]
            if ver >= 4:  # v2.4 frame sizes are syncsafe
                fsz = (
                    ((raw_sz[0] & 0x7F) << 21)
                    | ((raw_sz[1] & 0x7F) << 14)
                    | ((raw_sz[2] & 0x7F) << 7)
                    | (raw_sz[3] & 0x7F)
                )
            else:
                fsz = int.from_bytes(raw_sz, "big")
            data = body[i + 10 : i + 10 + fsz]
            if fid in names and data:
                out.setdefault(names[fid], _id3_text(data))
            i += 10 + fsz
        return out
    except Exception:
        return {}


def _id3_text(data: bytes) -> str:
    """Frame body → text honoring the encoding byte (latin-1,
    UTF-16 w/ and w/o BOM, UTF-8)."""
    enc = data[0]
    raw = data[1:]
    if enc == 0:
        s = raw.decode("latin-1", "replace")
    elif enc == 1:
        s = raw.decode("utf-16", "replace")
    elif enc == 2:
        s = raw.decode("utf-16-be", "replace")
    else:
        s = raw.decode("utf-8", "replace")
    return s.split("\x00", 1)[0].strip()
