"""Minimal RIFF/AVI (Motion-JPEG) container codec — pure stdlib.

MJPEG-in-AVI is the one video format this environment can decode for
real without ffmpeg: the container is plain RIFF chunk walking
(``struct``), and every frame payload is a baseline JPEG the package
already decodes (:mod:`.jpeg`). That upgrades the video path from
"stub" to REAL end-to-end for MJPEG — container probe → frame select
→ JPEG decode → PNG frame emit — while compressed inter-frame codecs
(H.264/VP9/AV1) remain explicit ffmpeg integration points.

Layout written by :func:`encode_avi_mjpeg` (and accepted, along with
the common variants, by the readers)::

    RIFF('AVI ')
      LIST('hdrl')  avih + LIST('strl'){ strh('vids'/'MJPG'), strf }
      LIST('movi')  '00dc' JPEG chunks (even-padded)
      'idx1'        one entry per frame

All parsing is defensive: corrupt/truncated containers return None /
fewer frames, never raise — a corpus pass must not die on one bad
record.
"""

from __future__ import annotations

import struct

#: flag bits written in avih
_AVIF_HASINDEX = 0x00000010


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(
    frames: list, fps: int = 10, quality: int = 90
) -> bytes:
    """H×W×3 uint8 frames → MJPEG AVI bytes (driver/test-side helper
    and the sink primitive for frame-sampled output). All frames must
    share one shape; each is independently JPEG-encoded (MJPEG has no
    inter-frame prediction — that is what makes it decodable here)."""
    import numpy as np

    from trial_submission_studio_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    a0 = np.asarray(frames[0])
    h, w = a0.shape[0], a0.shape[1]
    payloads = []
    for f in frames:
        fa = np.asarray(f)
        if fa.shape[:2] != (h, w):
            raise ValueError("all frames must share one shape")
        payloads.append(encode_jpeg(fa, quality=quality))

    usec = int(round(1_000_000 / fps))
    n = len(payloads)
    max_size = max(len(p) for p in payloads)

    avih = struct.pack(
        "<10I16x",
        usec, max_size * fps, 0, _AVIF_HASINDEX, n, 0, 1, max_size, w, h,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_size, -1, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    offsets = []  # offset of each chunk relative to 'movi' fourcc
    for p in payloads:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)

    idx = b"".join(
        struct.pack("<4sIII", b"00dc", 0x10, off, len(p))
        for off, p in zip(offsets, payloads)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, lo: int, hi: int):
    """Yield (fourcc, list_type|None, body_lo, body_hi) for each chunk
    in [lo, hi); stops at the first malformed header."""
    i = lo
    while i + 8 <= hi:
        fourcc = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body_lo = i + 8
        body_hi = min(body_lo + size, hi)
        if body_lo > hi:
            return
        if fourcc == b"LIST" and size >= 4:
            yield fourcc, payload[body_lo : body_lo + 4], body_lo + 4, body_hi
        else:
            yield fourcc, None, body_lo, body_hi
        i = body_lo + size + (size % 2)


def parse_avi(payload: bytes | None) -> dict | None:
    """Header-only AVI metadata → ``{width, height, fps, n_frames,
    duration_ms}`` (missing fields None), or None if not an AVI.
    Reads the avih header inside LIST hdrl; never touches frame
    data — probing costs header bytes."""
    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return None
    out = {
        "width": None, "height": None, "fps": None,
        "n_frames": None, "duration_ms": None,
    }
    try:
        for fourcc, ltype, lo, hi in _walk(payload, 12, len(payload)):
            if fourcc == b"LIST" and ltype == b"hdrl":
                for c, _lt, alo, ahi in _walk(payload, lo, hi):
                    if c == b"avih" and ahi - alo >= 40:
                        (usec, _mbps, _pad, _flags, total, _init, _ns,
                         _buf, w, h) = struct.unpack(
                            "<10I", payload[alo : alo + 40]
                        )
                        out["width"] = w or None
                        out["height"] = h or None
                        out["n_frames"] = total
                        if usec:
                            out["fps"] = 1_000_000.0 / usec
                            out["duration_ms"] = int(
                                round(usec * total / 1000.0)
                            )
                        return out
                return out
    except struct.error:
        return None
    return out


def iter_mjpeg_frames(payload: bytes | None):
    """Yield raw JPEG bytes of each video frame ('00dc'/'00db'
    chunks; 'rec ' grouping LISTs are entered). Truncated containers
    yield the frames that parse and stop."""
    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return

    def frames_in(lo: int, hi: int):
        for fourcc, ltype, clo, chi in _walk(payload, lo, hi):
            if fourcc == b"LIST" and ltype == b"rec ":
                yield from frames_in(clo, chi)
            elif fourcc[2:4] in (b"dc", b"db") and chi > clo:
                yield payload[clo:chi]

    try:
        for fourcc, ltype, lo, hi in _walk(payload, 12, len(payload)):
            if fourcc == b"LIST" and ltype == b"movi":
                yield from frames_in(lo, hi)
                return
    except struct.error:
        return
