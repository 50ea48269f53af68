"""TIFF codec tests: both byte orders × three compressions, bit
depths, palette/gray/bilevel photometrics, LZW early-change, and
the multimodal integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from trial_submission_studio_spark.operators.tiff import (
    _lzw_decode_tiff,
    decode_tiff,
    encode_tiff,
    tiff_dimensions,
)


def _img(h=13, w=17, seed=0, channels=3):
    rng = np.random.RandomState(seed)
    if channels == 1:
        return rng.randint(0, 256, (h, w), dtype=np.uint8)
    return rng.randint(0, 256, (h, w, channels), dtype=np.uint8)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("big_endian", [False, True])
def test_rgb_roundtrips(comp, big_endian):
    img = _img(seed=1)
    out = decode_tiff(encode_tiff(img, compression=comp, big_endian=big_endian))
    np.testing.assert_array_equal(out, img)


def test_gray_roundtrip_broadcasts():
    g = _img(channels=1, seed=2)
    out = decode_tiff(encode_tiff(g, compression="packbits"))
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], g)


def test_packbits_runs_compress():
    img = np.zeros((16, 64, 3), np.uint8)  # long runs
    img[:, 30:] = 200
    payload = encode_tiff(img, compression="packbits")
    assert len(payload) < img.nbytes // 4
    np.testing.assert_array_equal(decode_tiff(payload), img)


def test_lzw_early_change_width_boundary():
    """> 253 decoded codes after a CLEAR would cross the 9→10-bit
    early-change boundary; the literal encoder re-CLEARs before it,
    and the decoder honors the early-change rule for streams that
    do cross (synthesized directly)."""
    data = bytes(range(256)) * 4  # forces several CLEAR windows
    from trial_submission_studio_spark.operators.tiff import _lzw_encode_tiff

    assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data


def test_16bit_scales_down():
    # hand-build a 16-bit gray single-strip TIFF (little-endian)
    h, w = 3, 5
    vals = (np.arange(h * w, dtype=np.uint16) * 4000).reshape(h, w)
    body = vals.astype("<u2").tobytes()
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(body)),
    ]
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    out += body
    got = decode_tiff(bytes(out))
    np.testing.assert_array_equal(got[:, :, 0], (vals >> 8).astype(np.uint8))


def test_bilevel_and_palette():
    # bilevel: 1-bit, WhiteIsZero
    h, w = 4, 10
    bits = np.zeros((h, w), np.uint8)
    bits[::2, ::2] = 1
    packed = np.packbits(bits, axis=1).tobytes()
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1), (259, 3, 1, 1),
        (262, 3, 1, 0), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(packed)),
    ]
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    out += packed
    got = decode_tiff(bytes(out))
    # WhiteIsZero: bit 1 → black (0), bit 0 → white (255)
    assert got[0, 0, 0] == 0 and got[0, 1, 0] == 255


def test_unsupported_layouts_raise():
    img = _img(seed=3)
    payload = bytearray(encode_tiff(img))
    with pytest.raises(ValueError):
        decode_tiff(b"XX\x2a\x00" + bytes(payload[4:]))
    # patch compression tag (259) to JPEG (7)
    n = struct.unpack("<H", payload[8:10])[0]
    for k in range(n):
        e = 10 + 12 * k
        if struct.unpack("<H", payload[e : e + 2])[0] == 259:
            payload[e + 8 : e + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError):
        decode_tiff(bytes(payload))


def test_multimodal_integration(spark):
    """TIFF payloads flow through probe (dims) and image_features
    (real pixel means), cross-codec with PNG near-dup."""
    from pyspark.sql import functions as F

    from trial_submission_studio_spark.operators.multimodal import (
        encode_png,
        image_features,
        near_duplicate_images,
        probe_media,
    )

    img = _img(16, 16, seed=4)
    media = spark.createDataFrame(
        [(1, encode_tiff(img, compression="lzw"), "a.tiff"),
         (2, encode_png(img), "b.png")],
        "media_id long, payload binary, path string",
    )
    probed = {r["media_id"]: r for r in probe_media(media).collect()}
    assert probed[1]["mime"] == "image/tiff"
    assert (probed[1]["width"], probed[1]["height"]) == (16, 16)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in near_duplicate_images(media, threshold=0.999).collect()
    }
    assert pairs == {(1, 2)}
    feats = {
        r["media_id"]: r["feat"] for r in image_features(media, dim=8).collect()
    }
    # identical pixels through two codecs → identical real features
    assert feats[1] == pytest.approx(feats[2], abs=1e-12)


def _exif_jpeg(jpeg_bytes: bytes, order: str = "<") -> bytes:
    """Inject a minimal EXIF APP1 (orientation 6, make, sub-IFD with
    ISO + DateTimeOriginal) after SOI."""
    def short(v):
        return struct.pack(order + "H", v)

    def long_(v):
        return struct.pack(order + "I", v)

    make = b"ACME\x00"
    dto = b"2024:05:06 07:08:09\x00"
    # layout: header(8) ifd0 ... ext values ... exif sub-ifd
    ifd0_entries = 3  # orientation, make, exif pointer
    ifd0_size = 2 + 12 * ifd0_entries + 4
    make_off = 8 + ifd0_size
    sub_off = make_off + len(make)
    sub_entries = 2
    sub_size = 2 + 12 * sub_entries + 4
    dto_off = sub_off + sub_size
    endian = b"II" if order == "<" else b"MM"
    t = bytearray(endian + short(42) + long_(8))
    t += short(ifd0_entries)
    t += short(0x0112) + short(3) + long_(1) + short(6) + short(0)
    t += short(0x010F) + short(2) + long_(len(make)) + long_(make_off)
    t += short(0x8769) + short(4) + long_(1) + long_(sub_off)
    t += long_(0)
    t += make
    t += short(sub_entries)
    t += short(0x8827) + short(3) + long_(1) + short(320) + short(0)
    t += short(0x9003) + short(2) + long_(len(dto)) + long_(dto_off)
    t += long_(0)
    t += dto
    app1 = b"Exif\x00\x00" + bytes(t)
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return jpeg_bytes[:2] + seg + jpeg_bytes[2:]


@pytest.mark.parametrize("order", ["<", ">"])
def test_parse_exif_jpeg_app1(order):
    from trial_submission_studio_spark.operators.jpeg import encode_jpeg
    from trial_submission_studio_spark.operators.tiff import parse_exif

    jpg = encode_jpeg(_img(16, 16, seed=7))
    meta = parse_exif(_exif_jpeg(jpg, order))
    assert meta["orientation"] == 6
    assert meta["make"] == "ACME"
    assert meta["iso"] == 320
    assert meta["datetime_original"] == "2024:05:06 07:08:09"
    assert parse_exif(jpg) == {}  # no APP1
    assert parse_exif(b"\xff\xd8\xff") == {}  # truncated


def test_image_exif_spark(spark):
    from trial_submission_studio_spark.operators.jpeg import encode_jpeg
    from trial_submission_studio_spark.operators.multimodal import image_exif

    jpg = encode_jpeg(_img(16, 16, seed=8))
    media = spark.createDataFrame(
        [(1, _exif_jpeg(jpg)), (2, jpg), (3, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_exif(media).collect()}
    assert rows[1]["orientation"] == 6 and rows[1]["make"] == "ACME"
    assert rows[1]["iso"] == 320
    assert rows[2]["orientation"] is None  # EXIF-less: NULL row
    assert rows[3]["make"] is None
    assert set(rows) == {1, 2, 3}  # join-complete


def _gray16_tiff(body: bytes, h: int, w: int, extra_entries=()):
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(body)), *extra_entries,
    ]
    entries.sort()
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    out += body
    return bytes(out)


def test_predictor2_16bit_inverts_before_downscale():
    """ADVICE r8: Predictor=2 on 16-bit data must cumsum the
    FULL-DEPTH samples (mod 2^16) before the 8-bit downscale."""
    h, w = 4, 6
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
    diffed = vals.astype(np.int64).copy()
    diffed[:, 1:] = (vals[:, 1:].astype(np.int64) - vals[:, :-1].astype(np.int64))
    body = (diffed % 65536).astype("<u2").tobytes()
    data = _gray16_tiff(body, h, w, extra_entries=[(317, 3, 1, 2)])
    got = decode_tiff(data)
    np.testing.assert_array_equal(got[:, :, 0], (vals >> 8).astype(np.uint8))


def test_predictor2_8bit_any_compression():
    """Predictor=2 applies regardless of compression (it was
    LZW-gated before r9): uncompressed 8-bit differenced data."""
    h, w = 3, 7
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    diffed = vals.astype(np.int64).copy()
    diffed[:, 1:] = vals[:, 1:].astype(np.int64) - vals[:, :-1].astype(np.int64)
    body = (diffed % 256).astype(np.uint8).tobytes()
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(body)), (317, 3, 1, 2),
    ]
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    out += body
    got = decode_tiff(bytes(out))
    np.testing.assert_array_equal(got[:, :, 0], vals)


def test_predictor2_1bit_raises():
    h, w = 2, 8
    body = bytes([0b10101010, 0b01010101])
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(body)), (317, 3, 1, 2),
    ]
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    out += body
    with pytest.raises(ValueError, match="Predictor"):
        decode_tiff(bytes(out))
