"""Compressed-WAV codec tests (G.711 µ-law/A-law, IMA ADPCM, MS
ADPCM) — pure numpy, no Spark session.

G.711 is pinned bit-exact against the stdlib ``audioop`` reference
where it exists (Python < 3.13); ADPCM roundtrips are checked by
SNR (the codecs are lossy by design) and the IMA core loop is
pinned bit-exact against ``audioop.adpcm2lin``'s Intel/DVI variant
(same core, opposite nibble packing).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from trial_submission_studio_spark.operators.adpcm import (
    alaw_decode,
    alaw_encode,
    decode_wav_compressed,
    encode_wav,
    ima_adpcm_decode_block,
    parse_wav_header,
    ulaw_decode,
    ulaw_encode,
)

try:  # removed in Python 3.13 — tests degrade to roundtrip-only
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
except ImportError:  # pragma: no cover
    audioop = None

needs_audioop = pytest.mark.skipif(audioop is None, reason="audioop removed")


def _sine(n=4000, rate=8000, freq=440.0, amp=0.6):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * freq * t) * amp * 32767).astype(np.int16)


def _snr_db(ref, out):
    ref = ref.astype(np.float64)
    out = out.astype(np.float64)[: len(ref)]
    noise = ref[: len(out)] - out
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(noise**2), 1e-12))


# ---- G.711 ----------------------------------------------------------------

@needs_audioop
def test_g711_bit_exact_vs_audioop():
    all_bytes = bytes(range(256))
    assert (
        ulaw_decode(all_bytes)
        == np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype="<i2")
    ).all()
    assert (
        alaw_decode(all_bytes)
        == np.frombuffer(audioop.alaw2lin(all_bytes, 2), dtype="<i2")
    ).all()
    rng = np.random.RandomState(7)
    s = np.concatenate(
        [rng.randint(-32768, 32768, 5000), [-32768, -1, 0, 1, 32767]]
    ).astype(np.int16)
    assert ulaw_encode(s) == audioop.lin2ulaw(s.tobytes(), 2)
    assert alaw_encode(s) == audioop.lin2alaw(s.tobytes(), 2)


def test_g711_companding_is_idempotent_on_lattice():
    """decode∘encode is the identity on already-companded values."""
    for dec, enc in ((ulaw_decode, ulaw_encode), (alaw_decode, alaw_encode)):
        lattice = dec(bytes(range(256)))
        again = dec(enc(lattice))
        np.testing.assert_array_equal(again, lattice)


def test_g711_snr_on_speechlike_signal():
    s = _sine(amp=0.3)
    assert _snr_db(s, ulaw_decode(ulaw_encode(s))) > 30
    assert _snr_db(s, alaw_decode(alaw_encode(s))) > 30


# ---- IMA ADPCM ------------------------------------------------------------

@needs_audioop
def test_ima_core_matches_audioop_dvi():
    """Same core loop as audioop's Intel/DVI ADPCM; audioop packs
    the first sample in the HIGH nibble (WAV packs low-first)."""
    s = _sine(512)
    enc, _ = audioop.lin2adpcm(s.tobytes(), 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(enc, 2, None)[0], dtype="<i2")
    mine, _ = ima_adpcm_decode_block(enc, 0, 0, low_first=False)
    np.testing.assert_array_equal(np.array(mine, dtype=np.int16), ref)


def test_ima_wav_roundtrip_snr():
    s = _sine(5000)
    payload = encode_wav(s, 8000, codec="ima")
    rate, ch, x = decode_wav_compressed(payload)
    assert (rate, ch) == (8000, 1)
    assert len(x) == len(s)
    assert _snr_db(s, (x * 32768).astype(np.int32)) > 25


def test_ima_wav_multiple_blocks_state_reset():
    # > 1 block (block_align 1024 → 2041 samples/block)
    s = _sine(7000, freq=1000.0)
    rate, ch, x = decode_wav_compressed(encode_wav(s, 8000, codec="ima"))
    assert len(x) == len(s)
    assert _snr_db(s, (x * 32768).astype(np.int32)) > 20


def test_ima_stereo_blocks():
    """Hand-assembled 2-channel IMA WAV whose channels carry the
    same content → mono mix equals the mono decode."""
    s = _sine(2041)  # exactly one mono block at block_align=1024
    mono_payload = encode_wav(s, 8000, codec="ima")
    info = parse_wav_header(mono_payload)
    block = info["data"]
    hdr, body = block[:4], block[4:]
    stereo_block = hdr + hdr  # identical per-channel state headers
    for off in range(0, len(body), 4):
        grp = body[off : off + 4]
        stereo_block += grp + grp  # duplicate each 4-byte group
    fmt = struct.pack("<HHIIHH", 0x11, 2, 8000, 8000, 2048, 4)
    fmt += struct.pack("<HH", 2, 2041)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, 2041)
    chunks += b"data" + struct.pack("<I", len(stereo_block)) + stereo_block
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rate, ch, x = decode_wav_compressed(payload)
    assert (rate, ch) == (8000, 2)
    _, _, mono = decode_wav_compressed(mono_payload)
    np.testing.assert_allclose(x, mono, atol=1e-12)


# ---- MS ADPCM -------------------------------------------------------------

def test_ms_wav_roundtrip_snr():
    s = _sine(5000)
    payload = encode_wav(s, 16000, codec="ms")
    rate, ch, x = decode_wav_compressed(payload)
    assert (rate, ch) == (16000, 1)
    assert len(x) == len(s)
    assert _snr_db(s, (x * 32768).astype(np.int32)) > 20


def test_ms_wav_first_two_samples_exact():
    """MS ADPCM stores the first two samples verbatim in the block
    header — they must decode exactly."""
    s = _sine(300)
    _, _, x = decode_wav_compressed(encode_wav(s, 8000, codec="ms"))
    out = (x * 32768).round().astype(np.int32)
    assert out[0] == s[0] and out[1] == s[1]


def test_bad_predictor_index_raises():
    s = _sine(100)
    payload = bytearray(encode_wav(s, 8000, codec="ms"))
    info = parse_wav_header(bytes(payload))
    # corrupt the predictor byte (first byte of the data chunk)
    idx = bytes(payload).rindex(info["data"])
    payload[idx] = 99
    with pytest.raises(ValueError):
        decode_wav_compressed(bytes(payload))


# ---- plumbing -------------------------------------------------------------

def test_parse_wav_header_rejects_junk():
    assert parse_wav_header(b"") is None
    assert parse_wav_header(b"RIFFxxxxWAVE") is None  # no fmt/data
    assert parse_wav_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40) is None


def test_decode_wav_compressed_ignores_pcm():
    """PCM (tag 1) stays with the stdlib wave path — this module
    returns None so the dispatcher ordering is unambiguous."""
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(_sine(100).tobytes())
    assert decode_wav_compressed(buf.getvalue()) is None


def test_audio_decoder_dispatch_handles_compressed():
    """The multimodal audio decoder routes compressed WAV through
    this module: same contract tuple, correct rate."""
    from trial_submission_studio_spark.operators.multimodal import (
        _make_audio_decoder,
    )

    decode = _make_audio_decoder()
    s = _sine(3000)
    for codec in ("ulaw", "alaw", "ima", "ms"):
        hit = decode(encode_wav(s, 8000, codec=codec))
        assert hit is not None, codec
        rate, ch, x = hit
        assert rate == 8000 and ch == 1
        assert _snr_db(s, (x * 32768).astype(np.int32)) > 20, codec


def test_spectral_fingerprint_survives_g711(spark):
    """The gain-invariant audio fingerprint is stable across PCM vs
    µ-law companding of the same signal (≤ 2 of 64 bits differ),
    so compressed-WAV records join the same near-dup buckets."""
    import io
    import wave as wave_mod

    from trial_submission_studio_spark.operators.multimodal import (
        audio_fingerprint,
    )

    s = _sine(8000)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(s.tobytes())
    media = spark.createDataFrame(
        [(1, buf.getvalue()), (2, encode_wav(s, 8000, codec="ulaw"))],
        "media_id bigint, payload binary",
    )
    fps = {r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    assert bin((fps[1] ^ fps[2]) & ((1 << 64) - 1)).count("1") <= 2


def test_probe_media_compressed_wav_duration(spark):
    """probe_media gets duration for compressed WAV from the
    fmt+fact chunks (the stdlib wave module rejects non-PCM)."""
    from pyspark.sql import functions as F

    from trial_submission_studio_spark.operators.multimodal import (
        probe_media,
    )

    s = _sine(16000, rate=8000)  # 2.0 s
    media = spark.createDataFrame(
        [(1, encode_wav(s, 8000, codec="ulaw"), "mem://a.wav")],
        "media_id bigint, payload binary, path string",
    )
    r = probe_media(media).collect()[0]
    assert (r["kind"], r["mime"]) == ("audio", "audio/wav")
    assert abs(r["duration_ms"] - 2000) <= 5


def test_parse_id3v2_versions_and_encodings():
    from trial_submission_studio_spark.operators.adpcm import parse_id3v2

    def frame_v3(fid, text, enc=0):
        if enc == 0:
            data = bytes([0]) + text.encode("latin-1")
        else:
            data = bytes([1]) + text.encode("utf-16")
        return fid + len(data).to_bytes(4, "big") + b"\x00\x00" + data

    body = frame_v3(b"TIT2", "Song Title") + frame_v3(b"TPE1", "Ärtist", enc=1)
    size = len(body)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F])
    tag = b"ID3" + bytes([3, 0, 0]) + ss + body + b"\xff\xfb\x90\x00"
    meta = parse_id3v2(tag)
    assert meta == {"title": "Song Title", "artist": "Ärtist"}

    # v2.4 syncsafe frame sizes, UTF-8
    def frame_v4(fid, text):
        data = bytes([3]) + text.encode("utf-8")
        n = len(data)
        ssz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
        return fid + ssz + b"\x00\x00" + data

    body4 = frame_v4(b"TALB", "Albüm") + frame_v4(b"TDRC", "2024")
    size4 = len(body4)
    ss4 = bytes([(size4 >> 21) & 0x7F, (size4 >> 14) & 0x7F, (size4 >> 7) & 0x7F, size4 & 0x7F])
    meta4 = parse_id3v2(b"ID3" + bytes([4, 0, 0]) + ss4 + body4)
    assert meta4 == {"album": "Albüm", "year": "2024"}

    assert parse_id3v2(b"\xff\xfb no tag") == {}
    assert parse_id3v2(b"ID3") == {}  # truncated


def test_audio_id3_spark(spark):
    from trial_submission_studio_spark.operators.multimodal import audio_id3

    def frame(fid, text):
        data = bytes([0]) + text.encode("latin-1")
        return fid + len(data).to_bytes(4, "big") + b"\x00\x00" + data

    body = frame(b"TIT2", "Track One") + frame(b"TCON", "Jazz")
    n = len(body)
    ss = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
    tagged = b"ID3" + bytes([3, 0, 0]) + ss + body + b"\xff\xfb\x90\x00"
    media = spark.createDataFrame(
        [(1, tagged), (2, b"\xff\xfbno-tag"), (3, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in audio_id3(media).collect()}
    assert rows[1]["title"] == "Track One" and rows[1]["genre"] == "Jazz"
    assert rows[2]["title"] is None and rows[3]["artist"] is None
