"""Animated GIF — full multi-frame decode with inter-frame
compositing, stdlib+numpy.

GIF animation IS inter-frame video: each frame is a sub-rectangle
delta over a persistent canvas, with per-frame disposal (keep /
restore-background / restore-previous) and optional transparency
(the "don't touch this pixel" inter-frame mechanism). Decoding it
properly means maintaining the canvas state machine, not just
inflating the first image descriptor — this module does that, so
`sample_frames` / video near-dup work on animated GIFs exactly like
on MJPEG-AVI footage.

The encoder is a correctness encoder (same stance as `vp8l.py`): it
emits real sub-rectangle deltas (bounding box of changed pixels vs
the previous frame, disposal=keep) or full frames, with per-frame
delays and optional transparency-coded unchanged pixels — enough to
roundtrip arbitrary frame stacks through every decoder path.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no media surface; this
extends the multimodal family (SURVEY.md §2.13), converting part of
the round-7 "inter-frame video codecs" stub into a real decoder for
the one inter-frame format whose entropy layer (LZW) is fully
specified without external tables.
"""

from __future__ import annotations

__all__ = [
    "decode_gif_frames",
    "gif_frame_count",
    "encode_gif_anim",
]


def _lzw_decode(data: bytes, min_code: int) -> bytearray:
    """GIF-flavor LZW (LSB-first variable-width codes, CLEAR/EOI)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = [bytes([k]) for k in range(clear)] + [b"", b""]
    acc = nbits = pos = 0
    prev = None
    out = bytearray()
    while True:
        while nbits < width:
            if pos >= len(data):
                break
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = table[: clear + 2]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
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
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _deinterlace(idx, ih):
    order = (
        list(range(0, ih, 8))
        + list(range(4, ih, 8))
        + list(range(2, ih, 4))
        + list(range(1, ih, 2))
    )
    out = idx.copy()
    for src, dst in enumerate(order):
        out[dst] = idx[src]
    return out


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """GIF87a/89a payload → list of ``(delay_ms, frame)`` with each
    frame a fully COMPOSITED H×W×3 RGB uint8 canvas (logical-screen
    sized). Implements the animation state machine: sub-rectangle
    placement, transparency (transparent pixels leave the canvas
    untouched), and disposal methods 0/1 (keep), 2 (restore
    background), 3 (restore previous). Raises ValueError on
    malformed payloads."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, bg_idx, _ = struct.unpack("<HHBBB", payload[6:13])
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    if gct is not None and bg_idx < len(gct):
        background = gct[bg_idx].astype(np.uint8)
    else:
        background = np.zeros(3, np.uint8)
    canvas = np.tile(background, (h, w, 1))
    frames: list[tuple[int, object]] = []
    # pending graphic-control state for the NEXT image descriptor
    delay_ms = 0
    transparent = None
    disposal = 0
    while i < len(payload):
        b0 = payload[i]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[i + 1]
            i += 2
            blocks = []
            while payload[i]:
                sz = payload[i]
                blocks.append(payload[i + 1 : i + 1 + sz])
                i += sz + 1
            i += 1
            if label == 0xF9 and blocks:  # graphic control
                gpk, delay_cs, tidx = struct.unpack("<BHB", blocks[0][:4])
                disposal = (gpk >> 2) & 0x07
                transparent = tidx if gpk & 0x01 else None
                delay_ms = delay_cs * 10
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        ix, iy, iw, ih, ipk = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
        i += 10
        pal = gct
        if ipk & 0x80:
            n = 2 << (ipk & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
            i += n * 3
        interlaced = bool(ipk & 0x40)
        min_code = payload[i]
        i += 1
        data = bytearray()
        while payload[i]:
            sz = payload[i]
            data += payload[i + 1 : i + 1 + sz]
            i += sz + 1
        i += 1
        if pal is None:
            raise ValueError("GIF frame without any palette")
        out = _lzw_decode(bytes(data), min_code)
        if len(out) < iw * ih:
            raise ValueError("GIF frame pixel data truncated")
        idx = np.frombuffer(bytes(out[: iw * ih]), np.uint8).reshape(ih, iw)
        if interlaced:
            idx = _deinterlace(idx, ih)
        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[iy : iy + ih, ix : ix + iw]
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append((delay_ms, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            break
        # apply disposal AFTER the frame is rendered
        if disposal == 2:
            canvas[iy : iy + ih, ix : ix + iw] = background
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        disposal = 0
        transparent = None
        delay_ms = 0
    return frames


def gif_frame_count(payload: bytes) -> int:
    """Header-scale frame count (walks block structure, skips pixel
    decode). Returns 0 for non-GIF payloads instead of raising —
    probe-path semantics."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return 0
    import struct

    i = 13
    packed = payload[10]
    if packed & 0x80:
        i += (2 << (packed & 0x07)) * 3
    count = 0
    try:
        while i < len(payload):
            b0 = payload[i]
            if b0 == 0x3B:
                break
            if b0 == 0x21:
                i += 2
                while payload[i]:
                    i += payload[i] + 1
                i += 1
                continue
            if b0 != 0x2C:
                break
            _, _, iw, ih, ipk = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
            i += 10
            if ipk & 0x80:
                i += (2 << (ipk & 0x07)) * 3
            i += 1  # min code size
            while payload[i]:
                i += payload[i] + 1
            i += 1
            count += 1
    except IndexError:
        pass  # truncated: report the frames seen
    return count


def _lzw_encode_literals(indices, bits: int) -> bytes:
    """Fixed-width literal LZW (CLEAR before the table would widen) —
    the same always-valid scheme as multimodal.encode_gif."""
    clear, eoi = 1 << bits, (1 << bits) + 1
    width = bits + 1
    burst = (1 << width) - eoi - 1
    codes = [clear]
    for k, px in enumerate(indices):
        if k and k % burst == 0:
            codes.append(clear)
        codes.append(int(px))
    codes.append(eoi)
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    blocks = b""
    for k in range(0, len(out), 255):
        chunk = bytes(out[k : k + 255])
        blocks += bytes([len(chunk)]) + chunk
    return blocks + b"\x00"


def encode_gif_anim(
    frames,
    delays_ms=None,
    sub_rect: bool = True,
    transparency: bool = False,
    loop: bool = True,
) -> bytes:
    """List of H×W×3 uint8 frames → animated GIF89a bytes (one
    global palette over all frames, ≤256 distinct colors).

    ``sub_rect=True`` encodes each frame after the first as the
    bounding box of changed pixels (disposal=keep) — real
    inter-frame deltas; ``transparency=True`` additionally codes
    unchanged pixels inside the box with a transparent index.
    Correctness encoder: output composites back bit-exact."""
    import struct

    import numpy as np

    stack = [np.ascontiguousarray(np.asarray(f, dtype=np.uint8)) for f in frames]
    if not stack:
        raise ValueError("need at least one frame")
    h, w = stack[0].shape[:2]
    delays_ms = delays_ms or [100] * len(stack)
    flat = np.concatenate([f.reshape(-1, 3) for f in stack])
    palette, _ = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette) + (1 if transparency else 0)
    if n_colors > 256:
        raise ValueError("animated GIF needs <= 256 distinct colors overall")
    bits = max(2, int(n_colors - 1).bit_length())
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[: len(palette)] = palette
    tindex = len(palette) if transparency else None
    # vectorized color→index: searchsorted over packed 24-bit keys
    pal_packed = (
        (palette[:, 0].astype(np.int64) << 16)
        | (palette[:, 1].astype(np.int64) << 8)
        | palette[:, 2].astype(np.int64)
    )
    order = np.argsort(pal_packed)
    pal_sorted = pal_packed[order]

    def to_idx(img):
        p = (
            (img[:, :, 0].astype(np.int64) << 16)
            | (img[:, :, 1].astype(np.int64) << 8)
            | img[:, :, 2].astype(np.int64)
        )
        return order[np.searchsorted(pal_sorted, p)].astype(np.uint8)

    buf = bytearray()
    buf += b"GIF89a"
    buf += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    buf += pal.tobytes()
    if loop:  # Netscape looping extension
        buf += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    prev = None
    for fi, frame in enumerate(stack):
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share the logical screen size")
        if prev is None or not sub_rect:
            ix = iy = 0
            region = frame
        else:
            changed = (frame != prev).any(axis=2)
            if not changed.any():
                ix = iy = 0
                region = frame[:1, :1]  # 1×1 keep-alive rect
            else:
                ys, xs = np.where(changed)
                iy, ix = int(ys.min()), int(xs.min())
                region = frame[iy : ys.max() + 1, ix : xs.max() + 1]
        idx = to_idx(region)
        if transparency and prev is not None and sub_rect:
            same = (
                region == prev[iy : iy + region.shape[0], ix : ix + region.shape[1]]
            ).all(axis=2)
            idx = np.where(same, tindex, idx).astype(np.uint8)
        # graphic control: disposal=1 (keep), delay, transparency
        gpk = (1 << 2) | (1 if transparency and prev is not None else 0)
        buf += b"\x21\xf9\x04" + struct.pack(
            "<BHB",
            gpk,
            delays_ms[fi] // 10,
            tindex if (transparency and prev is not None) else 0,
        ) + b"\x00"
        buf += b"\x2c" + struct.pack(
            "<HHHHB", ix, iy, region.shape[1], region.shape[0], 0
        )
        buf += bytes([bits])
        buf += _lzw_encode_literals(idx.reshape(-1), bits)
        prev = frame
    buf += b"\x3b"
    return bytes(buf)


def gif_animation_info(payload: bytes):
    """Header-scale ``(n_frames, total_duration_ms)`` — walks block
    structure and GCE delays only, no pixel decode. (0, 0) for
    non-GIF payloads; truncated payloads report what was seen."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return 0, 0
    import struct

    i = 13
    packed = payload[10]
    if packed & 0x80:
        i += (2 << (packed & 0x07)) * 3
    count = 0
    total_ms = 0
    pending_ms = 0
    try:
        while i < len(payload):
            b0 = payload[i]
            if b0 == 0x3B:
                break
            if b0 == 0x21:
                label = payload[i + 1]
                i += 2
                first = payload[i + 1 : i + 1 + payload[i]] if payload[i] else b""
                if label == 0xF9 and len(first) >= 3:
                    (delay_cs,) = struct.unpack("<H", first[1:3])
                    pending_ms = delay_cs * 10
                while payload[i]:
                    i += payload[i] + 1
                i += 1
                continue
            if b0 != 0x2C:
                break
            ipk = payload[i + 9]
            i += 10
            if ipk & 0x80:
                i += (2 << (ipk & 0x07)) * 3
            i += 1
            while payload[i]:
                i += payload[i] + 1
            i += 1
            count += 1
            total_ms += pending_ms
            pending_ms = 0
    except IndexError:
        pass
    return count, total_ms
