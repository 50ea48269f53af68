"""Multimodal (image/audio/video) column operators — north-star
extension (BASELINE.json).

Design for 100 TB: media lives as opaque ``binary`` columns (or
object-store URIs) beside typed metadata columns; every decode /
feature-extract / resize / frame-sample step is an Arrow-batched
``mapInPandas`` operator so bytes stay in columnar batches end to
end and partitioning is inherited from the table.

Codec coverage is explicit about what is REAL and what is stubbed:

- **REAL decoders** (stdlib + numpy, no external codec libs):
  PPM (P6), uncompressed 24-bit BMP, 8-bit non-interlaced PNG
  (zlib inflate + full None/Sub/Up/Average/Paeth filter
  reconstruction; gray/RGB/palette/gray-α/RGBA color types), and
  JPEG — baseline SOF0 AND progressive SOF2 (Huffman, spectral
  selection + successive-approximation refinement, 4:2:0/4:4:4
  subsampling, restart markers — see :mod:`.jpeg`), GIF87a/89a
  (LZW decode, global/local palettes, interlace; full multi-frame
  animation with disposal/transparency via :mod:`.gifanim`), and
  TIFF (both byte orders, strips, none/LZW-early-change/PackBits,
  1/8/16-bit, palette/bilevel — see :mod:`.tiff`) →
  H×W×3 arrays feeding real color/luminance features and
  nearest-neighbor :func:`image_resize`, plus WebP-lossless (VP8L
  prefix codes, LZ77, color cache, all four inverse transforms —
  see :mod:`.vp8l`) incl. ANIMATED WebP (VP8X/ANIM/ANMF
  compositing — :mod:`.webpanim`); RIFF/WAVE PCM audio
  (8/16/32-bit) via the
  stdlib ``wave`` module, compressed WAV — G.711 µ-law/A-law and
  IMA/MS ADPCM (see :mod:`.adpcm`) — AND FLAC (Rice
  residuals, fixed/LPC prediction, stereo decorrelation — see
  :mod:`.flac`) → real sample-rate/RMS/peak/zero-crossing features
  (:func:`audio_features`). VIDEO: MJPEG-in-AVI decodes for real —
  RIFF container walk (:mod:`.avi`) + per-frame baseline-JPEG decode
  — and animated GIF/WebP composite through the same
  :func:`sample_frames` PNG (or zero-transcode JPEG) frame
  output. :func:`encode_png` / :func:`encode_ppm` /
  :func:`encode_gif` / :func:`.jpeg.encode_jpeg` /
  :func:`.tiff.encode_tiff` / :func:`.gifanim.encode_gif_anim` /
  :func:`.webpanim.encode_webp_anim` /
  :func:`.avi.encode_avi_mjpeg` round-trip.
- **REAL container metadata, header-only** (:func:`probe_media`):
  image dims from PPM/PNG-IHDR/JPEG-SOF/GIF-LSD/BMP/TIFF-IFD/
  WebP headers, animation duration from GIF GCE delays / WebP ANMF
  headers, audio duration from the WAV fmt+fact chunks / FLAC
  STREAMINFO, MP4 moov-box walk
  → duration + track dims, AVI avih header → dims + fps + duration,
  MP3 frame header → CBR duration estimate — probing never decodes
  payloads and never raises on corrupt ones.
- **REAL MP3 (MPEG-1 Layer III) decode** (:mod:`.mp3`): every
  algorithmic stage (side info, bit reservoir, scalefactors,
  requantize, MS stereo, alias reduction, IMDCT, synthesis) is
  implemented from the public spec; Huffman coverage is an honest
  registered subset — streams selecting an unregistered table
  quarantine via ``NotImplementedError`` instead of decoding
  garbage (see the mp3 module docstring for the exact boundary).
- **AAC-LC (ADTS) skeleton** (:mod:`.aac`, r12): ADTS framing,
  raw_data_block/ics_info/section parse, the full four-window-shape
  filterbank (PR-tested) — but only ZERO_HCB bands decode (silent
  streams); its scalefactor/spectral Huffman codebooks are the same
  unvalidatable-constants boundary as MP3's absent tables, so any
  nonzero band quarantines by codebook name.
- **Stubbed integration points**: lossy-WebP (VP8 intra), non-zero
  AAC spectra (above), and inter-frame video codecs (H.264/VP9/AV1)
  need PIL/torchaudio/ffmpeg, absent here (their entropy-code tables
  are arbitrary published constants unavailable in this container,
  so a from-scratch decoder cannot be honestly validated) — kernels
  raise ``NotImplementedError`` naming the format, or produce seeded
  reproducible fakes with ``deterministic_fake=True`` so the
  Spark-side plumbing stays fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.partitioning import widen_if_narrow

# The JPEG and FLAC codecs live in their own modules; kernels capture
# their functions in closures, so register the modules for BY-VALUE
# cloudpickle serialization — executors cannot import this package
# (non-repo cwd).
try:  # pragma: no cover - registration is a serialization concern
    from pyspark import cloudpickle as _cloudpickle

    from trial_submission_studio_spark.operators import adpcm as _adpcm_module
    from trial_submission_studio_spark.operators import avi as _avi_module
    from trial_submission_studio_spark.operators import flac as _flac_module
    from trial_submission_studio_spark.operators import gifanim as _gifanim_module
    from trial_submission_studio_spark.operators import jpeg as _jpeg_module
    from trial_submission_studio_spark.operators import tiff as _tiff_module
    from trial_submission_studio_spark.operators import vp8l as _vp8l_module
    from trial_submission_studio_spark.operators import webpanim as _webpanim_module

    _cloudpickle.register_pickle_by_value(_adpcm_module)
    _cloudpickle.register_pickle_by_value(_avi_module)
    _cloudpickle.register_pickle_by_value(_flac_module)
    _cloudpickle.register_pickle_by_value(_gifanim_module)
    _cloudpickle.register_pickle_by_value(_jpeg_module)
    _cloudpickle.register_pickle_by_value(_tiff_module)
    _cloudpickle.register_pickle_by_value(_vp8l_module)
    _cloudpickle.register_pickle_by_value(_webpanim_module)
except Exception:  # noqa: BLE001 - never block import on this
    pass

#: schema for a media table: binary payload + typed metadata
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

IMAGE_FEATURE_SCHEMA = "media_id long, feat array<float>, feat_dim int"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_png binary"


def _make_fake_feature():
    """Deterministic stand-in for an image-embedding kernel: bytes →
    seeded feature vector (stable across runs/partitions). Built as a
    closure so cloudpickle ships it by value — executors cannot
    import this package (the host app controls PYTHONPATH)."""

    def fake_feature(payload: bytes | None, dim: int) -> list[float]:
        import hashlib
        import struct

        h = hashlib.sha256(payload or b"").digest()
        out: list[float] = []
        i = 0
        while len(out) < dim:
            block = hashlib.sha256(h + struct.pack("<I", i)).digest()
            for j in range(0, 32, 4):
                if len(out) >= dim:
                    break
                out.append(struct.unpack("<I", block[j : j + 4])[0] / 2**32)
            i += 1
        return out

    return fake_feature


_fake_feature = _make_fake_feature()


def encode_ppm(img) -> bytes:
    """H×W×3 uint8 array → binary PPM (P6) bytes. Driver/test-side
    helper and the output codec of :func:`image_resize`."""
    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_gif(img, interlaced: bool = False) -> bytes:
    """H×W×3 uint8 array (≤256 distinct colors) → GIF89a bytes.
    Driver/test-side helper; uses the fixed-width LZW literal encoding
    (CLEAR inserted before the code table would widen), which every
    conformant decoder accepts. ``interlaced`` emits the 4-pass row
    order (exercises the decoder's deinterlace path)."""
    import numpy as np

    a = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    h, w = a.shape[0], a.shape[1]
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        a = a[order]
    flat = a.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif supports up to 256 distinct colors")
    bits = max(2, int(len(palette) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[: len(palette)] = palette

    clear, eoi = 1 << bits, (1 << bits) + 1
    width = bits + 1
    # emit CLEAR every (2^width - table_base - 2) literals so the
    # virtual code table never forces a width increase
    burst = (1 << width) - eoi - 1
    codes = [clear]
    for i, px in enumerate(idx):
        if i and i % burst == 0:
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

    import struct as _struct

    data = b""
    for i in range(0, len(out), 255):
        chunk = bytes(out[i : i + 255])
        data += bytes([len(chunk)]) + chunk
    return (
        b"GIF89a"
        + _struct.pack("<HHBBB", w, h, 0x80 | (bits - 1) | ((bits - 1) << 4), 0, 0)
        + pal.tobytes()
        + b"\x2c" + _struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
        + bytes([bits])
        + data
        + b"\x00\x3b"
    )


def _make_png_encoder():
    """Closure factory so the PNG encoder can be captured inside
    executor kernels (:func:`sample_frames`) — a closure-made
    function pickles BY VALUE, a module-level def only by reference
    to a package executors cannot import."""

    def encode_png(img, mixed_filters: bool = False) -> bytes:
        """H×W×3 uint8 array → PNG bytes, pure stdlib (zlib + struct).

        Default emits filter-0 scanlines. ``mixed_filters=True``
        applies filter ``y % 5`` to row ``y``
        (None/Sub/Up/Average/Paeth) — used by the roundtrip tests to
        exercise every reconstruction branch of the decoder with a
        bit-exact expected image."""
        import struct
        import zlib

        import numpy as np

        a = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
        h, w = a.shape[0], a.shape[1]
        bpp = 3
        flat = a.reshape(h, w * bpp).astype(np.int16)

        def paeth(left, up, upleft):
            p = left + up - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
            out = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
            )
            return out

        lines = []
        prev = np.zeros(w * bpp, dtype=np.int16)
        for y in range(h):
            r = flat[y]
            left = np.concatenate([np.zeros(bpp, np.int16), r[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
            f = (y % 5) if mixed_filters else 0
            if f == 0:
                filt = r
            elif f == 1:
                filt = (r - left) & 0xFF
            elif f == 2:
                filt = (r - prev) & 0xFF
            elif f == 3:
                filt = (r - ((left + prev) >> 1)) & 0xFF
            else:
                filt = (r - paeth(left, prev, upleft)) & 0xFF
            lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
            prev = r

        def chunk(ctype: bytes, data: bytes) -> bytes:
            body = ctype + data
            return struct.pack(">I", len(data)) + body + struct.pack(
                ">I", zlib.crc32(body) & 0xFFFFFFFF
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b"")
        )

    return encode_png


encode_png = _make_png_encoder()


def _make_image_decoder():
    """Closure factory: payload bytes → H×W×3 uint8 array for the
    REAL formats (PPM P6, uncompressed 24-bit BMP, WebP-lossless
    (VP8L) via :mod:`.vp8l`, 8-bit
    non-interlaced PNG — stdlib zlib inflate + full filter
    reconstruction, color types gray/RGB/palette/gray-α/RGBA — and
    baseline + progressive JPEG via :mod:`.jpeg`), None otherwise. The PNG unfilter
    loop and the JPEG entropy decoder are pure-Python reference
    implementations — correct and dependency-free; a PIL/torchvision
    kernel is the drop-in for throughput-critical decode at scale.
    Closure-local so cloudpickle ships it by value; the jpeg module
    is registered for by-value pickling at import (executors cannot
    import this package)."""
    from trial_submission_studio_spark.operators.jpeg import decode_jpeg
    from trial_submission_studio_spark.operators.tiff import decode_tiff
    from trial_submission_studio_spark.operators.vp8l import decode_webp
    from trial_submission_studio_spark.operators.webpanim import (
        decode_webp_frames,
        is_animated_webp,
    )

    jpeg_decode = decode_jpeg
    tiff_decode = decode_tiff
    webp_decode = decode_webp
    webp_anim_check = is_animated_webp
    webp_frames = decode_webp_frames

    def decode(payload: bytes | None):
        import numpy as np

        if not payload:
            return None
        if payload[:2] == b"\xff\xd8":
            return jpeg_decode(payload)
        if payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
            try:
                return tiff_decode(payload)
            except Exception:
                return None
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            try:
                if webp_anim_check(payload):
                    # still-image view of animation = first frame
                    frames = webp_frames(payload)
                    return frames[0][1][:, :, :3].copy() if frames else None
                return webp_decode(payload)[:, :, :3].copy()
            except NotImplementedError:
                return None  # lossy VP8: quarantine path
            except Exception:
                return None
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            import struct
            import zlib

            i, w = 8, None
            idat: list[bytes] = []
            plte = None
            while i + 8 <= len(payload):
                (length,) = struct.unpack(">I", payload[i : i + 4])
                ctype = payload[i + 4 : i + 8]
                data = payload[i + 8 : i + 8 + length]
                if ctype == b"IHDR":
                    w, h, bitd, ct, _comp, _filt, interlace = struct.unpack(
                        ">IIBBBBB", data
                    )
                elif ctype == b"PLTE":
                    plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
                elif ctype == b"IDAT":
                    idat.append(data)
                elif ctype == b"IEND":
                    break
                i += 12 + length
            if w is None or bitd != 8 or interlace != 0:
                return None
            nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ct)
            if nch is None or not idat:
                return None
            try:
                raw = zlib.decompress(b"".join(idat))
            except zlib.error:
                return None
            stride = w * nch
            if len(raw) < h * (stride + 1):
                return None
            img = np.empty((h, stride), np.uint8)
            prev = np.zeros(stride, np.int32)
            pos = 0
            for y in range(h):
                f = raw[pos]
                pos += 1
                line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
                pos += stride
                if f == 0:
                    rec = line
                elif f == 2:  # Up — vectorized
                    rec = (line + prev) & 0xFF
                elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential
                    rec = line.copy()
                    for x in range(stride):
                        a = int(rec[x - nch]) if x >= nch else 0
                        if f == 1:
                            rec[x] = (rec[x] + a) & 0xFF
                        elif f == 3:
                            rec[x] = (rec[x] + ((a + int(prev[x])) >> 1)) & 0xFF
                        else:
                            b = int(prev[x])
                            c = int(prev[x - nch]) if x >= nch else 0
                            p = a + b - c
                            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                            rec[x] = (rec[x] + pr) & 0xFF
                else:
                    return None
                img[y] = rec.astype(np.uint8)
                prev = rec
            px = img.reshape(h, w, nch)
            if ct == 2:
                return px.copy()
            if ct == 6:
                return px[:, :, :3].copy()
            if ct == 0:
                return np.repeat(px, 3, axis=2).copy()
            if ct == 4:
                return np.repeat(px[:, :, :1], 3, axis=2).copy()
            if plte is None or int(px.max()) >= len(plte):
                return None
            return plte[px[:, :, 0]].copy()  # ct == 3: palette lookup
        if payload[:2] == b"P6":
            # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw
            i, fields = 2, []
            while len(fields) < 3:
                while i < len(payload) and payload[i : i + 1].isspace():
                    i += 1
                if payload[i : i + 1] == b"#":  # comment to EOL
                    while i < len(payload) and payload[i : i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                fields.append(int(payload[i:j]))
                i = j
            i += 1  # the single whitespace after maxval
            w, h, maxval = fields
            if maxval != 255:
                return None
            raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
            return raw.reshape(h, w, 3).copy()
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            import struct

            w, h, packed = struct.unpack("<HHB", payload[6:11])
            i = 13
            gct = None
            if packed & 0x80:
                n = 2 << (packed & 0x07)
                gct = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            while i < len(payload):
                b0 = payload[i]
                if b0 == 0x3B:  # trailer
                    return None
                if b0 == 0x21:  # extension: label + sub-blocks
                    i += 2
                    while payload[i]:
                        i += payload[i] + 1
                    i += 1
                    continue
                if b0 != 0x2C:
                    return None
                _, _, iw, ih, ipk = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
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
                    return None
                # LZW decode (LSB-first variable-width codes)
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
                if len(out) < iw * ih:
                    return None
                idx = np.frombuffer(bytes(out[: iw * ih]), np.uint8)
                if int(idx.max()) >= len(pal):
                    return None
                px = pal[idx].reshape(ih, iw, 3)
                if interlaced:
                    order = (
                        list(range(0, ih, 8)) + list(range(4, ih, 8))
                        + list(range(2, ih, 4)) + list(range(1, ih, 2))
                    )
                    un = np.empty_like(px)
                    un[order] = px
                    px = un
                return px.copy()  # first frame
        if payload[:2] == b"BM":
            import struct

            data_off = struct.unpack("<I", payload[10:14])[0]
            hdr_size = struct.unpack("<I", payload[14:18])[0]
            if hdr_size < 40:
                return None
            w, h = struct.unpack("<ii", payload[18:26])
            planes, bpp = struct.unpack("<HH", payload[26:30])
            compression = struct.unpack("<I", payload[30:34])[0]
            if bpp != 24 or compression != 0 or w <= 0:
                return None
            flip = h > 0  # positive height = bottom-up row order
            h = abs(h)
            stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=data_off
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            if flip:
                rows = rows[::-1]
            return rows[:, :, ::-1].copy()  # BGR → RGB
        return None

    return decode


_decode_image = _make_image_decoder()


def _make_wav_decoder():
    """Closure factory: RIFF/WAVE PCM payload → (rate, channels,
    float64 mono samples in [-1, 1]) or None."""

    def decode(payload: bytes | None):
        import io
        import wave

        import numpy as np

        if not payload or payload[:4] != b"RIFF":
            return None
        try:
            with wave.open(io.BytesIO(payload), "rb") as wf:
                rate, nch, sw = (
                    wf.getframerate(),
                    wf.getnchannels(),
                    wf.getsampwidth(),
                )
                raw = wf.readframes(wf.getnframes())
        except wave.Error:
            return None
        if sw == 1:  # unsigned 8-bit
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128
        elif sw == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768
        elif sw == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648
        else:
            return None
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return rate, nch, x

    return decode


_decode_wav = _make_wav_decoder()


def _make_container_probes():
    """Closure factory for metadata-only container parsers (no frame
    decode): MP4 box walk → (duration_ms, width, height); MP3 frame
    header → estimated duration_ms (CBR). Parsing the container is
    REAL; media decode for these formats stays a codec-library stub."""

    def mp4_metadata(payload: bytes | None):
        import struct

        if not payload or len(payload) < 16 or payload[4:8] != b"ftyp":
            return None
        dur_ms = width = height = None

        def walk(lo: int, hi: int, depth: int) -> None:
            nonlocal dur_ms, width, height
            i = lo
            while i + 8 <= hi and depth < 8:
                size, btype = struct.unpack(">I4s", payload[i : i + 8])
                body = i + 8
                if size == 1:  # 64-bit extended size
                    size = struct.unpack(">Q", payload[i + 8 : i + 16])[0]
                    body = i + 16
                if size < 8 or i + size > hi:
                    return
                if btype in (b"moov", b"trak", b"mdia"):
                    walk(body, i + size, depth + 1)
                elif btype == b"mvhd":
                    ver = payload[body]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", payload[body + 20 : body + 32]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", payload[body + 12 : body + 20]
                        )
                    if ts:
                        dur_ms = int(round(1000.0 * dur / ts))
                elif btype == b"tkhd":
                    ver = payload[body]
                    off = body + (32 if ver == 1 else 20)
                    # reserved(8) layer(2) alt(2) vol(2) reserved(2)
                    # matrix(36) then width/height as 16.16 fixed
                    wh = off + 4 + 8 + 2 + 2 + 2 + 2 + 36
                    w16, h16 = struct.unpack(">II", payload[wh : wh + 8])
                    if w16 and h16 and not width:
                        width, height = w16 >> 16, h16 >> 16
                i += size

        try:
            walk(0, len(payload), 0)
        except struct.error:
            return None
        return (dur_ms, width, height)

    def mp3_duration_ms(payload: bytes | None):
        if not payload or len(payload) < 4:
            return None
        i = 0
        if payload[:3] == b"ID3":  # syncsafe 28-bit tag size
            if len(payload) < 10:
                return None
            sz = (
                (payload[6] << 21) | (payload[7] << 14)
                | (payload[8] << 7) | payload[9]
            )
            i = 10 + sz
        bitrates = (  # MPEG-1 Layer III, kbit/s
            0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0
        )
        rates = (44100, 48000, 32000, 0)
        while i + 4 <= len(payload):
            if payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0:
                ver = (payload[i + 1] >> 3) & 0x3
                layer = (payload[i + 1] >> 1) & 0x3
                br = bitrates[(payload[i + 2] >> 4) & 0xF]
                sr = rates[(payload[i + 2] >> 2) & 0x3]
                if ver == 3 and layer == 1 and br and sr:  # MPEG-1 L3
                    # VBR: a Xing/Info tag in the first frame carries
                    # the exact frame count (1152 samples per frame)
                    head = payload[i : i + 256]
                    for tag in (b"Xing", b"Info"):
                        t = head.find(tag)
                        if t >= 0 and len(head) >= t + 12:
                            flags = int.from_bytes(head[t + 4 : t + 8], "big")
                            if flags & 1:
                                n_frames = int.from_bytes(
                                    head[t + 8 : t + 12], "big"
                                )
                                return int(round(1000.0 * n_frames * 1152 / sr))
                    # no Xing: exact per-frame header walk (4 header
                    # bytes per frame — still header-only; handles
                    # VBR and trailing-tag streams the filesize/
                    # bitrate CBR estimate gets wrong)
                    try:
                        from trial_submission_studio_spark.operators.mp3 import (
                            mp3_stream_info,
                        )

                        info = mp3_stream_info(payload[i:])
                        if info is not None:
                            return info["duration_ms"]
                    except Exception:
                        pass
                    return int(round((len(payload) - i) * 8.0 / (br * 1000) * 1000))
            i += 1
        return None

    return mp4_metadata, mp3_duration_ms


_mp4_metadata, _mp3_duration_ms = _make_container_probes()


def _make_header_probes():
    """Closure factory: HEADER-ONLY metadata readers for the probe
    path — dimensions/duration come from container headers without
    inflating, entropy-decoding, or reading sample data, so probing a
    100 TB corpus costs header bytes, not decode CPU. (The feature /
    resize operators still run the full decoders.)"""
    from trial_submission_studio_spark.operators.adpcm import (
        parse_wav_header as _parse_wav,
    )
    from trial_submission_studio_spark.operators.tiff import (
        tiff_dimensions as _tiff_dims,
    )

    def image_header(p: bytes | None):
        """→ (mime, width|None, height|None) or None if not an image."""
        import struct

        if not p:
            return None
        if p[:2] == b"P6":
            i, fields = 2, []
            while len(fields) < 3 and i < min(len(p), 256):
                while i < len(p) and p[i : i + 1].isspace():
                    i += 1
                if p[i : i + 1] == b"#":
                    while i < len(p) and p[i : i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < len(p) and not p[j : j + 1].isspace():
                    j += 1
                try:
                    fields.append(int(p[i:j]))
                except ValueError:
                    return ("image/x-portable-pixmap", None, None)
                i = j
            if len(fields) == 3 and fields[0] > 0 and fields[1] > 0:
                return ("image/x-portable-pixmap", fields[0], fields[1])
            return ("image/x-portable-pixmap", None, None)
        if p[:8] == b"\x89PNG\r\n\x1a\n":
            if len(p) >= 24 and p[12:16] == b"IHDR":
                w, h = struct.unpack(">II", p[16:24])
                if 0 < w < 1 << 24 and 0 < h < 1 << 24:
                    return ("image/png", w, h)
            return ("image/png", None, None)
        if p[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(p) and p[i] == 0xFF:
                m = p[i + 1]
                if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                    i += 2
                    continue
                seg = struct.unpack(">H", p[i + 2 : i + 4])[0]
                # any SOFn frame header (C0-CF minus DHT/JPG/DAC)
                if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                    if w and h:
                        return ("image/jpeg", w, h)
                    break
                if m == 0xDA:  # entropy data: no SOF seen
                    break
                i += 2 + seg
            return ("image/jpeg", None, None)
        if p[:4] == b"GIF8" and len(p) >= 10:
            w, h = struct.unpack("<HH", p[6:10])
            return ("image/gif", w or None, h or None)
        if p[:2] == b"BM" and len(p) >= 30:
            w, h = struct.unpack("<ii", p[18:26])
            bpp = struct.unpack("<H", p[28:30])[0]
            if w > 0 and h != 0 and bpp in (1, 4, 8, 16, 24, 32):
                return ("image/bmp", w, abs(h))
            return None
        if p[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
            dims = _tiff_dims(p)
            if dims:
                return ("image/tiff", dims[0], dims[1])
            return ("image/tiff", None, None)
        if p[:4] == b"RIFF" and len(p) >= 30 and p[8:12] == b"WEBP":
            chunk = p[12:16]
            if chunk == b"VP8X":  # extended: canvas dims in the header
                w = 1 + (p[24] | (p[25] << 8) | (p[26] << 16))
                h = 1 + (p[27] | (p[28] << 8) | (p[29] << 16))
                return ("image/webp", w, h)
            if chunk == b"VP8L" and p[20] == 0x2F:
                bits = int.from_bytes(p[21:25], "little")
                return (
                    "image/webp",
                    (bits & 0x3FFF) + 1,
                    ((bits >> 14) & 0x3FFF) + 1,
                )
            if chunk == b"VP8 " and p[23:26] == b"\x9d\x01\x2a":
                w = (p[26] | (p[27] << 8)) & 0x3FFF
                h = (p[28] | (p[29] << 8)) & 0x3FFF
                return ("image/webp", w, h)
            return ("image/webp", None, None)
        return None

    def audio_header(p: bytes | None):
        """→ (mime, duration_ms|None) or None if not WAV/FLAC."""
        import io
        import wave

        if not p:
            return None
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            try:
                with wave.open(io.BytesIO(p), "rb") as wf:
                    rate, n = wf.getframerate(), wf.getnframes()
            except (wave.Error, EOFError):
                # compressed WAV (G.711/ADPCM): the stdlib module is
                # PCM-only, but fmt+fact chunks still give duration
                # (_parse_wav is factory-captured: executors cannot
                # import this package at runtime)
                info = _parse_wav(p)
                if info is None or info["tag"] not in (0x02, 0x06, 0x07, 0x11):
                    return None
                rate, n = info["rate"], info["n_samples"]
                dur = int(round(1000.0 * n / rate)) if rate and n else None
                return ("audio/wav", dur)
            dur = int(round(1000.0 * n / rate)) if rate else None
            return ("audio/wav", dur)
        if p[:4] == b"fLaC":
            # STREAMINFO is the mandatory first metadata block
            if len(p) >= 26 and (p[4] & 0x7F) == 0:
                packed = int.from_bytes(p[18:26], "big")
                rate = packed >> 44
                total = packed & ((1 << 36) - 1)
                dur = int(round(1000.0 * total / rate)) if rate and total else None
                return ("audio/flac", dur)
            return ("audio/flac", None)  # truncated: magic-only
        # AAC in ADTS framing: 12-bit sync + layer '00' (an MPEG
        # audio frame — MP3 — has nonzero layer bits, so the two
        # can't be confused). Header-only frame walk: each ADTS
        # header carries its own 13-bit frame length and every frame
        # decodes to 1024 samples, so duration is exact without
        # touching any payload byte. (AAC PAYLOAD decode remains a
        # documented stub — probing never decodes.)
        if (
            len(p) >= 7
            and p[0] == 0xFF
            and (p[1] & 0xF6) == 0xF0
        ):
            adts_rates = (
                96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
                16000, 12000, 11025, 8000,
            )
            sr_idx = (p[2] >> 2) & 0xF
            if sr_idx >= len(adts_rates):
                return None
            rate = adts_rates[sr_idx]
            i, n = 0, 0
            while i + 7 <= len(p):
                if p[i] != 0xFF or (p[i + 1] & 0xF6) != 0xF0:
                    break
                flen = ((p[i + 3] & 0x03) << 11) | (p[i + 4] << 3) | (
                    p[i + 5] >> 5
                )
                if flen < 7:
                    break
                n += 1
                i += flen
            if n == 0:
                return None
            return ("audio/aac", int(round(1000.0 * n * 1024 / rate)))
        return None

    return image_header, audio_header


_image_header, _audio_header = _make_header_probes()


def _make_audio_decoder():
    """WAV-PCM, then compressed WAV (G.711 µ-law/A-law, IMA and MS
    ADPCM via :mod:`.adpcm`), then FLAC, then MPEG-1 Layer III
    (:mod:`.mp3` — structural decoder; streams selecting Huffman
    tables outside its registered subset raise NotImplementedError
    so they quarantine honestly) — all sharing the (rate, channels,
    mono float64) contract. Closure-local so cloudpickle ships it by
    value (the adpcm/flac/mp3 modules are registered by-value at
    import)."""
    from trial_submission_studio_spark.operators.aac import decode_aac
    from trial_submission_studio_spark.operators.adpcm import (
        decode_wav_compressed,
    )
    from trial_submission_studio_spark.operators.flac import decode_flac
    from trial_submission_studio_spark.operators.mp3 import decode_mp3

    wav = _decode_wav
    wav_compressed = decode_wav_compressed
    flac = decode_flac
    mp3 = decode_mp3
    aac = decode_aac

    def decode(payload: bytes | None):
        hit = wav(payload)
        if hit is not None:
            return hit
        if payload and payload[:4] == b"RIFF":
            try:
                hit = wav_compressed(payload)
            except Exception:
                hit = None
            if hit is not None:
                return hit
        if payload and payload[:4] == b"fLaC":
            return flac(payload)
        if (
            payload
            and len(payload) > 1
            and payload[0] == 0xFF
            and (payload[1] & 0xF6) == 0xF0
        ):
            # ADTS sync: 0xFFF + layer '00' — disjoint from the MPEG
            # audio layer bits, so AAC never mis-routes to the MP3
            # decoder (and vice versa)
            return aac(payload)
        if payload and (
            payload[:3] == b"ID3"
            or (len(payload) > 1 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0)
        ):
            return mp3(payload)
        return None

    return decode


_decode_audio = _make_audio_decoder()


def image_features(
    df: DataFrame,
    dim: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
    deterministic_fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Decode + featurize images → (media_id, feat, feat_dim).

    PPM/BMP/PNG/JPEG(baseline+progressive)/GIF payloads decode NATIVELY
    (:func:`_make_image_decoder`) into a real feature vector:
    normalized dimensions, channel means, luminance std + 10-bin
    luminance histogram. Undecodable payloads follow
    ``deterministic_fake`` (seeded fake) or ``on_error``:
    ``"raise"`` fails the job naming the PIL integration point;
    ``"null"`` emits a NULL feat for that record — the production
    posture at corpus scale, where one corrupt payload must not kill
    a 1000-executor job (callers filter ``feat IS NULL`` into a
    quarantine sink).
    """
    decode = _decode_image
    fake = _fake_feature
    null_on_error = on_error == "null"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def real_feat(img) -> list[float]:
            h, w = img.shape[0], img.shape[1]
            f = np.asarray(img, dtype=np.float64)
            lum = f @ np.array([0.2126, 0.7152, 0.0722])
            hist, _ = np.histogram(lum, bins=10, range=(0.0, 255.0))
            hist = hist / max(lum.size, 1)
            base = [
                w / 4096.0,
                h / 4096.0,
                float(f[:, :, 0].mean()) / 255.0,
                float(f[:, :, 1].mean()) / 255.0,
                float(f[:, :, 2].mean()) / 255.0,
                float(lum.std()) / 255.0,
            ]
            out = base + [float(x) for x in hist]
            return (out + [0.0] * dim)[:dim]

        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                try:
                    img = decode(p)
                except Exception:
                    img = None  # corrupt container: same path as undecodable
                if img is not None:
                    feats.append(real_feat(img))
                elif deterministic_fake:
                    feats.append(fake(p, dim))
                elif null_on_error:
                    feats.append(None)
                else:
                    raise NotImplementedError(
                        "this image format needs PIL/torchvision (absent "
                        "here); PPM/BMP/PNG/JPEG/GIF/TIFF/WebP-lossless decode natively "
                        "— pass deterministic_fake=True to exercise plumbing, "
                        "or on_error='null' to quarantine bad records"
                    )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feat": feats,
                    "feat_dim": [dim] * len(pdf),
                }
            )

    return widen_if_narrow(df.select(id_col, payload_col), id_col).mapInPandas(
        kernel, IMAGE_FEATURE_SCHEMA
    )


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """64-bit difference hash (dHash) per image → ``(id, dhash)`` —
    the perceptual fingerprint behind image near-dedup in web-scale
    image-text corpora (the LAION recipe): re-encodes, small crops,
    and light noise keep the hash within a few bits, so duplicate
    detection is a Hamming-banded equi-join, never pixel comparison.

    Contract (pinned so persisted hashes stay comparable forever):
    ITU-R 709 luma → 8×9 block-mean downsample (``reduceat`` over
    integer row/col boundaries — deterministic, interpolation-free)
    → bit(r,c) = block[r,c] < block[r,c+1], packed row-major into a
    signed int64.

    Compose with ``dedup.simhash_hamming_pairs(fps, id_col,
    "dhash", max_hamming=...)`` for candidate pairs (pigeonhole
    banding, one narrow shuffle) — the same join that serves text
    SimHash. Undecodable payloads: ``on_error="null"`` quarantines
    (NULL dhash), default raises naming the integration point.
    """
    decode = _decode_image
    null_on_error = on_error == "null"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def dhash(img) -> int:
            f = np.asarray(img, dtype=np.float64)
            lum = f @ np.array([0.2126, 0.7152, 0.0722])
            h, w = lum.shape
            # block-mean to 8 rows x 9 cols: mean of mean-per-row
            # blocks (uniform integer boundaries; rows/cols < 8/9
            # repeat edge samples via linspace indices)
            ri = np.linspace(0, h, 9).astype(np.int64)
            ci = np.linspace(0, w, 10).astype(np.int64)
            if h >= 8 and w >= 9:
                rowsum = np.add.reduceat(lum, ri[:-1], axis=0)
                cells = np.add.reduceat(rowsum, ci[:-1], axis=1)
                counts = np.outer(np.diff(ri), np.diff(ci))
                g = cells / counts
            else:  # tiny image: nearest-sample grid, same contract
                rr = np.clip(ri[:-1], 0, h - 1)
                cc = np.clip(ci[:-1], 0, w - 1)
                g = lum[np.ix_(rr, cc)]
            bits = (g[:, :-1] < g[:, 1:]).flatten()
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            return v - (1 << 64) if v >= (1 << 63) else v  # signed int64

        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                try:
                    img = decode(p)
                except Exception:
                    img = None
                if img is not None:
                    out.append(dhash(img))
                elif null_on_error:
                    out.append(None)
                else:
                    raise NotImplementedError(
                        "this image format needs PIL/torchvision (absent "
                        "here); PPM/BMP/PNG/JPEG/GIF/TIFF/WebP-lossless decode natively — "
                        "pass on_error='null' to quarantine bad records"
                    )
            yield pd.DataFrame({id_col: pdf[id_col], "dhash": out})

    return widen_if_narrow(df.select(id_col, payload_col), id_col).mapInPandas(
        kernel, f"{id_col} long, dhash long"
    )


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """64-bit spectral fingerprint per audio clip → ``(id, afp)`` —
    the audio twin of :func:`image_dhash` (Haitsma–Kalker-flavored):
    near-identical recordings (re-encoded WAV↔FLAC, light noise,
    gain changes) land within a few Hamming bits, so audio near-dedup
    is the same banded equi-join as text SimHash and image dHash
    (``dedup.simhash_hamming_pairs(fps, id_col, "afp", ...)``).

    Contract (pinned so persisted fingerprints stay comparable):
    mono float64 PCM → 8 equal time segments → per-segment rFFT
    power spectrum → 9 log-spaced frequency bands (bin space) →
    bit(t, b) = energy[t, b] < energy[t, b+1], packed row-major into
    a signed int64. Energy RATIOS make it gain-invariant; the
    relative time/frequency grid makes it duration-tolerant.

    Undecodable payloads: ``on_error="null"`` quarantines (NULL
    afp), default raises naming the integration point.
    """
    decode = _decode_audio
    null_on_error = on_error == "null"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def afp(mono) -> int:
            x = np.asarray(mono, dtype=np.float64)
            n = x.size
            if n < 32:  # too short for an 8x9 grid: pad with zeros
                x = np.pad(x, (0, 32 - n))
                n = 32
            seg = np.linspace(0, n, 9).astype(np.int64)
            grid = np.empty((8, 9))
            for t in range(8):
                spec = np.abs(np.fft.rfft(x[seg[t] : seg[t + 1]])) ** 2
                nb = spec.size
                # 10 log-spaced edges from bin 1 (skip DC) to nyquist
                edges = np.unique(
                    np.geomspace(1, max(nb - 1, 2), 10).astype(np.int64)
                )
                while edges.size < 10:  # tiny segments: repeat last
                    edges = np.append(edges, edges[-1] + 1)
                band = np.add.reduceat(spec, np.clip(edges[:-1], 0, nb - 1))
                grid[t] = band[:9]
            bits = (grid[:, :-1] < grid[:, 1:]).flatten()
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                try:
                    hit = decode(p)
                except Exception:
                    hit = None
                if hit is not None:
                    out.append(afp(hit[2]))
                elif null_on_error:
                    out.append(None)
                else:
                    raise NotImplementedError(
                        "this audio format needs torchaudio/ffmpeg (absent "
                        "here); WAV (PCM, G.711, IMA/MS ADPCM) and "
                        "FLAC decode natively — pass "
                        "on_error='null' to quarantine bad records"
                    )
            yield pd.DataFrame({id_col: pdf[id_col], "afp": out})

    return widen_if_narrow(df.select(id_col, payload_col), id_col).mapInPandas(
        kernel, f"{id_col} long, afp long"
    )


RESIZED_SCHEMA = "media_id long, payload binary, width int, height int"


def image_resize(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL nearest-neighbor resize of natively-decodable images
    (PPM/BMP/PNG/JPEG) → (media_id, payload, width, height)
    with the payload re-encoded as PPM. Undecodable payloads pass
    through as NULL (callers filter or route them to the
    codec-library path)."""
    decode = _decode_image

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, ws, hs = [], [], []
            for p in pdf[payload_col]:
                try:
                    img = decode(p)
                except Exception:
                    img = None  # truncated/corrupt container
                if img is None:
                    payloads.append(None)
                    ws.append(None)
                    hs.append(None)
                    continue
                yy = np.linspace(0, img.shape[0] - 1, height).round().astype(int)
                xx = np.linspace(0, img.shape[1] - 1, width).round().astype(int)
                out = np.ascontiguousarray(img[yy][:, xx], dtype=np.uint8)
                payloads.append(
                    b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()
                )
                ws.append(width)
                hs.append(height)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": payloads,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return widen_if_narrow(df.select(id_col, payload_col), id_col).mapInPandas(
        kernel, RESIZED_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, duration_ms long, "
    "rms double, peak double, zcr double"
)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    deterministic_fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """REAL audio featurization: sample rate, channel count,
    duration, RMS, peak and zero-crossing rate of the mono mix.
    WAV-PCM/G.711/ADPCM, FLAC, MP3 (registered-subset — see
    :mod:`.mp3`) and zero-spectrum AAC-LC (see :mod:`.aac`) payloads
    decode natively; everything else (nonzero-band AAC,
    unregistered-table MP3) falls back per ``deterministic_fake``
    or ``on_error="null"``, which quarantines undecodable records
    as all-NULL rows instead of failing the job (filter
    ``sample_rate IS NULL``)."""
    decode = _decode_audio
    fake = _fake_feature
    null_on_error = on_error == "null"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "sample_rate", "n_channels", "duration_ms", "rms", "peak", "zcr"
                )
            }
            for p in pdf[payload_col]:
                try:
                    hit = decode(p)
                except Exception:
                    hit = None
                if hit is None:
                    if null_on_error and not deterministic_fake:
                        for k in rows:
                            rows[k].append(None)
                        continue
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "undecodable audio payload: AAC and "
                            "unregistered-table MP3 need torchaudio/ffmpeg "
                            "(absent here); WAV (PCM, G.711, IMA/MS ADPCM), "
                            "FLAC and registered-subset MP3 decode natively "
                            "— pass on_error='null' to quarantine bad records"
                        )
                    f = fake(p, 4)
                    rows["sample_rate"].append(16000)
                    rows["n_channels"].append(1)
                    rows["duration_ms"].append(int(f[0] * 10000))
                    rows["rms"].append(round(f[1], 6))
                    rows["peak"].append(round(f[2], 6))
                    rows["zcr"].append(round(f[3], 6))
                    continue
                rate, nch, x = hit
                n = x.size
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(nch)
                rows["duration_ms"].append(int(round(1000.0 * n / rate)) if rate else 0)
                rows["rms"].append(round(float(np.sqrt((x * x).mean())) if n else 0.0, 6))
                rows["peak"].append(round(float(np.abs(x).max()) if n else 0.0, 6))
                rows["zcr"].append(
                    round(float((np.diff(np.signbit(x)) != 0).sum() / max(n - 1, 1)), 6)
                )
            yield pd.DataFrame({id_col: pdf[id_col], **rows})

    return widen_if_narrow(df.select(id_col, payload_col), id_col).mapInPandas(
        kernel, AUDIO_FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
    deterministic_fake: bool = False,
    on_error: str = "raise",
    transcode: str = "png",
) -> DataFrame:
    """Video → sampled frames (media_id, frame_idx, frame_png).

    REAL for MJPEG-in-AVI: RIFF container walk (:mod:`.avi`) selects
    one source frame per ``every_ms`` window from the stream's fps,
    decodes it with the package JPEG decoder and re-emits PNG —
    no external codec library. REAL for animated GIF too
    (``transcode="png"`` mode): the full inter-frame state machine
    (:mod:`.gifanim` — sub-rectangle deltas, disposal, transparency)
    composites frames, sampled by cumulative per-frame delay.
    ``transcode="jpeg"`` skips the
    decode entirely and passes the selected frames' raw JPEG bytes
    through (column ``frame_jpeg``) — the 100-TB path, since frame
    SELECTION then costs container walking only, zero codec CPU
    (JPEG-specific, so GIF payloads fall to the error path there).
    Other containers (H.264/VP9/... need ffmpeg) raise
    ``NotImplementedError`` naming the payload, or are skipped per
    ``on_error`` ("raise" | "skip"); the ``deterministic_fake`` mode
    still emits marker frames per sampling point so plumbing stays
    testable for those formats.

    Scale shape: one Arrow-batched ``mapInPandas`` pass, row
    explosion bounded by duration/every_ms; only SELECTED frames pay
    decode CPU (the container walk skips unselected frame bytes).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    if transcode not in ("png", "jpeg"):
        raise ValueError("transcode must be 'png' or 'jpeg'")
    raw = transcode == "jpeg"
    out_col = "frame_jpeg" if raw else "frame_png"
    schema = f"{id_col} long, frame_idx int, {out_col} binary"

    # driver-side captures: avi/jpeg are registered for by-value
    # pickling, encode_png is closure-made — executors import nothing
    from trial_submission_studio_spark.operators.avi import (
        iter_mjpeg_frames,
        parse_avi,
    )
    from trial_submission_studio_spark.operators.gifanim import (
        decode_gif_frames,
    )
    from trial_submission_studio_spark.operators.jpeg import decode_jpeg
    from trial_submission_studio_spark.operators.webpanim import (
        decode_webp_frames,
        is_animated_webp,
    )

    enc_png = encode_png

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, dur, p in zip(
                pdf[id_col], pdf[duration_col], pdf[payload_col]
            ):
                if deterministic_fake:
                    n = max(int((dur or 0) // every_ms), 1)
                    for i in range(n):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(b"\x89PNG-fake-" + str(i).encode())
                    continue
                is_gif = p is not None and p[:6] in (b"GIF87a", b"GIF89a")
                is_awebp = p is not None and is_animated_webp(p)
                if not raw and (is_gif or is_awebp):
                    try:
                        if is_gif:
                            gif_frames = decode_gif_frames(p)
                        else:
                            gif_frames = [
                                (d, img[:, :, :3])
                                for d, img in decode_webp_frames(p)
                            ]
                    except NotImplementedError:
                        if on_error == "skip":
                            continue
                        raise
                    except Exception:
                        gif_frames = None
                    if not gif_frames:
                        if on_error == "skip":
                            continue
                        raise ValueError(
                            f"media_id={mid}: undecodable animation payload"
                        )
                    # sample by cumulative delay, one frame per window
                    t_cum = 0
                    next_t = 0
                    for i, (delay, img) in enumerate(gif_frames):
                        if t_cum >= next_t:
                            ids.append(mid)
                            idxs.append(i)
                            frames.append(enc_png(img))
                            next_t += every_ms
                        t_cum += max(int(delay), 10)
                    continue
                meta = parse_avi(p)
                if meta is None or not meta["fps"]:
                    if on_error == "skip":
                        continue
                    raise NotImplementedError(
                        "only MJPEG-in-AVI decodes without ffmpeg; "
                        f"payload for media_id={mid} is not a parseable AVI "
                        "(pass deterministic_fake=True to test plumbing, "
                        "or on_error='skip' to drop)"
                    )
                step = max(int(round(every_ms * meta["fps"] / 1000.0)), 1)
                for i, jpg in enumerate(iter_mjpeg_frames(p)):
                    if i % step:
                        continue
                    if raw:
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(jpg)
                        continue
                    img = decode_jpeg(jpg)
                    if img is None:
                        if on_error == "skip":
                            continue
                        raise ValueError(
                            f"frame {i} of media_id={mid} is not baseline JPEG"
                        )
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(enc_png(img))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, out_col: frames})

    return widen_if_narrow(
        df.select(id_col, duration_col, payload_col), id_col
    ).mapInPandas(
        kernel, schema
    )


def read_media_dir(
    spark,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Build a media table from a directory of files via Spark's
    ``binaryFile`` source → (media_id, path, kind, payload, mime,
    width, height, duration_ms).

    ``binaryFile`` scans distribute across executors and support
    partition pruning on path globs; ``media_id`` is the stable
    xxhash64 of the file path. Typed metadata (kind/mime/dims) comes
    from :func:`probe_media`'s header sniff — REAL parsing for
    PPM/BMP/WAV, extension+magic classification for the rest.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    base = raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("path"),
        F.col("content").alias("payload"),
    )
    return probe_media(base)


PROBE_SCHEMA = (
    "media_id long, path string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)


def probe_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Header-ONLY classification + metadata extraction: image dims
    from PPM/PNG/JPEG-SOF/GIF/BMP headers, audio duration from the
    WAV header / FLAC STREAMINFO, MP4 duration+dims from the moov box
    walk, MP3 (MPEG-1 L3 CBR) duration from the frame header. NO
    payload decode happens here — probing a corpus costs header
    bytes, not inflate/entropy CPU (the feature/resize operators run
    the real decoders). One partition-local pass, no shuffle; corrupt
    headers classify by magic with NULL metadata, never raise."""
    from trial_submission_studio_spark.operators.avi import parse_avi
    from trial_submission_studio_spark.operators.gifanim import (
        gif_animation_info,
    )
    from trial_submission_studio_spark.operators.webpanim import (
        webp_animation_info,
    )

    img_hdr = _image_header
    aud_hdr = _audio_header
    mp4_meta = _mp4_metadata
    mp3_dur = _mp3_duration_ms
    avi_meta = parse_avi
    gif_anim = gif_animation_info
    webp_anim = webp_animation_info

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        magics = [
            (b"\xff\xd8\xff", "image", "image/jpeg"),
            (b"\x89PNG", "image", "image/png"),
            (b"GIF8", "image", "image/gif"),
            (b"ID3", "audio", "audio/mpeg"),
            (b"\xff\xfb", "audio", "audio/mpeg"),
        ]
        for pdf in batches:
            kinds, mimes, ws, hs, durs = [], [], [], [], []
            for p in pdf[payload_col]:
                kind = mime = None
                w = h = dur = None
                try:
                    ih = img_hdr(p)
                except Exception:
                    ih = None
                if ih is not None:
                    kind = "image"
                    mime, w, h = ih
                    # animated GIF/WebP: total duration from the
                    # header-scale block walk (kind stays "image";
                    # sample_frames treats them as footage)
                    try:
                        if mime == "image/gif":
                            n_fr, total = gif_anim(p)
                        elif mime == "image/webp":
                            n_fr, total = webp_anim(p)
                        else:
                            n_fr, total = 0, 0
                    except Exception:
                        n_fr, total = 0, 0
                    if n_fr > 1:
                        dur = total
                else:
                    try:
                        ah = aud_hdr(p)
                    except Exception:
                        ah = None
                    if ah is not None:
                        kind = "audio"
                        mime, dur = ah
                    elif p and len(p) >= 12 and p[4:8] == b"ftyp":
                        kind, mime = "video", "video/mp4"
                        try:
                            meta = mp4_meta(p)
                        except Exception:
                            meta = None
                        if meta:
                            dur, w, h = meta
                    elif p and len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                        kind, mime = "video", "video/x-msvideo"
                        try:
                            meta = avi_meta(p)
                        except Exception:
                            meta = None
                        if meta:
                            w = meta["width"]
                            h = meta["height"]
                            dur = meta["duration_ms"]
                    else:
                        for magic, k, m in magics:
                            if p and p[: len(magic)] == magic:
                                kind, mime = k, m
                                break
                        else:
                            kind, mime = "binary", "application/octet-stream"
                        if mime == "audio/mpeg":
                            try:
                                dur = mp3_dur(p)
                            except Exception:
                                dur = None
                kinds.append(kind)
                mimes.append(mime)
                ws.append(w)
                hs.append(h)
                durs.append(dur)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "path": pdf["path"],
                    "kind": kinds,
                    "payload": pdf[payload_col],
                    "mime": mimes,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    return df.select("media_id", "path", payload_col).mapInPandas(
        kernel, PROBE_SCHEMA
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Expression-only metadata profile of a media table (no decode):
    per kind: count, total/avg payload bytes, avg duration."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.round(F.avg(F.length("payload")), 2).alias("avg_bytes"),
        F.round(F.avg("duration_ms"), 2).alias("avg_duration_ms"),
    )


def near_duplicate_images(
    media: DataFrame,
    dim: int = 16,
    threshold: float = 0.95,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "null",
) -> DataFrame:
    """Image near-duplicate pairs (id_a < id_b, sim ≥ threshold):
    decode+featurize (:func:`image_features`) feeding the
    hyperplane-LSH near-dup operator from the similarity family —
    the image twin of text MinHash dedup, and the composition a
    training-data pipeline runs before sampling.

    Undecodable payloads drop out (``on_error="null"`` default —
    corrupt records must not fail a corpus pass). Scale shape is the
    embedding operator's: bucketed candidate generation, never
    all-pairs; the only added cost is one decode pass.
    """
    from trial_submission_studio_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    feats = (
        image_features(
            media, dim=dim, payload_col=payload_col, id_col=id_col,
            on_error=on_error,
        )
        .filter(F.col("feat").isNotNull())
        .select(F.col(id_col).alias("vec_id"), F.col("feat").alias("embedding"))
    )
    pairs = embedding_near_dup_pairs(feats, dim=dim, threshold=threshold)
    return pairs


def image_exif(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """EXIF metadata per image → ``(id, orientation, make,
    camera_model, datetime_original, exposure_num, exposure_den,
    iso, pixel_x, pixel_y)`` — header-scale (JPEG APP1 walk or TIFF
    IFD, no pixel decode; :func:`.tiff.parse_exif`). Non-JPEG/TIFF
    payloads and EXIF-less images yield all-NULL metadata rows, so
    the frame stays join-complete. The usual curation inputs:
    orientation for decode-time rotation, timestamps for temporal
    dedup/provenance, camera fields for device-level sampling."""
    from trial_submission_studio_spark.operators.tiff import parse_exif

    exif = parse_exif

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "orientation", "make", "camera_model",
                    "datetime_original", "exposure_num", "exposure_den",
                    "iso", "pixel_x", "pixel_y",
                )
            }
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                meta = exif(bytes(p)) if p is not None else {}
                exposure = meta.get("exposure_time")
                rows[id_col].append(mid)
                rows["orientation"].append(meta.get("orientation"))
                rows["make"].append(meta.get("make"))
                rows["camera_model"].append(meta.get("camera_model"))
                rows["datetime_original"].append(
                    meta.get("datetime_original") or meta.get("datetime")
                )
                rows["exposure_num"].append(exposure[0] if exposure else None)
                rows["exposure_den"].append(exposure[1] if exposure else None)
                rows["iso"].append(meta.get("iso"))
                rows["pixel_x"].append(meta.get("pixel_x"))
                rows["pixel_y"].append(meta.get("pixel_y"))
            yield pd.DataFrame(
                {
                    k: pd.Series(
                        v,
                        dtype=(
                            object
                            if k in (id_col, "make", "camera_model", "datetime_original")
                            else "Int64"
                        ),
                    )
                    for k, v in rows.items()
                }
            )

    return widen_if_narrow(df.select(id_col, payload_col), id_col).mapInPandas(
        kernel,
        f"{id_col} long, orientation int, make string, camera_model string, "
        "datetime_original string, exposure_num long, exposure_den long, "
        "iso int, pixel_x long, pixel_y long",
    )


def audio_id3(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """ID3v2 text metadata per audio payload → ``(id, title, artist,
    album, year, track, genre)`` — header-scale frame walk
    (:func:`.adpcm.parse_id3v2`), no audio decode; tag-less payloads
    yield all-NULL rows. The audio twin of :func:`image_exif`."""
    from trial_submission_studio_spark.operators.adpcm import parse_id3v2

    id3 = parse_id3v2
    fields = ("title", "artist", "album", "year", "track", "genre")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (id_col, *fields)}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                meta = id3(bytes(p)) if p is not None else {}
                rows[id_col].append(mid)
                for f in fields:
                    rows[f].append(meta.get(f))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in rows.items()}
            )

    return widen_if_narrow(df.select(id_col, payload_col), id_col).mapInPandas(
        kernel,
        f"{id_col} long, " + ", ".join(f"{f} string" for f in fields),
    )
