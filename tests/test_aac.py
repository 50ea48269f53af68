"""AAC-LC (ADTS) skeleton tests (operators/aac.py): ADTS walk,
raw_data_block parse across every implemented element/window path,
the named codebook quarantine boundary, the filterbank's
perfect-reconstruction property (fed directly, since the bitstream
can only carry zero spectra), and the Spark audio operators."""

from __future__ import annotations

import math

import numpy as np
import pytest

from trial_submission_studio_spark.operators.aac import (
    ADTS_RATES,
    EIGHT_SHORT,
    LONG_START,
    LONG_STOP,
    ONLY_LONG,
    _half_window,
    _imdct,
    _synthesize_channel,
    adts_stream_info,
    decode_aac,
    encode_aac_silence,
)


def _fwd_mdct(x, w):
    """Reference forward MDCT matching _imdct's phase (n0=(N/2+1)/2)."""
    n = len(x)
    half = n // 2
    n0 = (half + 1) / 2.0
    t = np.arange(n)[:, None]
    k = np.arange(half)[None, :]
    M = np.cos(2.0 * math.pi / n * (t + n0) * (k + 0.5))
    return (x * w) @ M


@pytest.mark.parametrize("rate", [44100, 48000, 32000])
@pytest.mark.parametrize("channels", [1, 2])
def test_silence_roundtrip_all_rates(rate, channels):
    blob = encode_aac_silence(rate, n_frames=6, channels=channels)
    info = adts_stream_info(blob)
    assert info["rate"] == rate and info["channels"] == channels
    assert info["n_frames"] == 6
    r, ch, pcm = decode_aac(blob)
    assert (r, ch) == (rate, channels)
    assert pcm.shape == (6 * 1024,)
    assert np.abs(pcm).max() == 0.0


def test_window_sequences_and_fil_parse():
    """All four window sequences (cycled), KBD shape, CPE common
    window, FIL element — the full implemented parse surface."""
    blob = encode_aac_silence(
        48000, n_frames=8, channels=2,
        window_sequence=(ONLY_LONG, LONG_START, EIGHT_SHORT, LONG_STOP),
        window_shape=1, with_fil=True,
    )
    r, ch, pcm = decode_aac(blob)
    assert (r, ch) == (48000, 2)
    assert pcm.shape == (8 * 1024,)
    assert np.abs(pcm).max() == 0.0


def test_codebook_boundary_quarantines_by_name():
    for cb, word in ((11, "spectral"), (13, "PNS noise"), (15, "intensity")):
        bad = encode_aac_silence(44100, n_frames=1, _codebook=cb)
        with pytest.raises(NotImplementedError, match=f"{word} codebook {cb}"):
            decode_aac(bad)


def test_non_adts_and_garbage_return_none():
    assert decode_aac(b"") is None
    assert decode_aac(b"\x00" * 300) is None
    assert adts_stream_info(b"junk" * 50) is None


def test_filterbank_perfect_reconstruction_long():
    """Sine and KBD long windows satisfy Princen-Bradley: analysis
    MDCT -> _synthesize_channel reconstructs the overlapped interior
    of a random signal to ~1e-10 — the filterbank is REAL even
    though the bitstream boundary only carries zero spectra yet."""
    rng = np.random.RandomState(7)
    x = rng.randn(1024 * 6)
    for shape in (0, 1):
        w = _half_window(1024, shape)
        full_w = np.concatenate([w, w[::-1]])
        spectra = [
            _fwd_mdct(x[i * 1024:(i + 2) * 1024], full_w) for i in range(5)
        ]
        ics = [{"window_sequence": ONLY_LONG, "window_shape": shape}] * 5
        got = _synthesize_channel(spectra, ics)
        # frames 1..4 of the output cover x[1024:5120] fully overlapped
        np.testing.assert_allclose(
            got[1024:5 * 1024], x[1024:5 * 1024], atol=1e-9
        )


def test_filterbank_reconstruction_through_short_transition():
    """LONG_START -> EIGHT_SHORT -> LONG_STOP carries a random signal
    through the transition windows with perfect reconstruction in
    the fully-overlapped interior."""
    rng = np.random.RandomState(11)
    x = rng.randn(1024 * 6)
    shape = 0
    wl = _half_window(1024, shape)
    ws_ = _half_window(128, shape)

    def win_for(seq_pos):
        w = np.empty(2048)
        if seq_pos == ONLY_LONG:
            w[:1024] = wl
            w[1024:] = wl[::-1]
        elif seq_pos == LONG_START:
            w[:1024] = wl
            w[1024:1472] = 1.0
            w[1472:1600] = ws_[::-1]
            w[1600:] = 0.0
        elif seq_pos == LONG_STOP:
            w[:448] = 0.0
            w[448:576] = ws_
            w[576:1024] = 1.0
            w[1024:] = wl[::-1]
        return w

    seq = [ONLY_LONG, LONG_START, EIGHT_SHORT, LONG_STOP, ONLY_LONG]
    spectra = []
    for i, s in enumerate(seq):
        frame = x[i * 1024:(i + 2) * 1024]
        if s == EIGHT_SHORT:
            X = np.empty(1024)
            sw = np.concatenate([ws_, ws_[::-1]])
            for w_i in range(8):
                start = 448 + 128 * w_i
                X[128 * w_i:128 * (w_i + 1)] = _fwd_mdct(
                    frame[start:start + 256], sw
                )
            spectra.append(X)
        else:
            spectra.append(_fwd_mdct(frame, win_for(s)))
    ics = [{"window_sequence": s, "window_shape": shape} for s in seq]
    got = _synthesize_channel(spectra, ics)
    np.testing.assert_allclose(
        got[1024:5 * 1024], x[1024:5 * 1024], atol=1e-9
    )


def test_imdct_scale_is_pr_normalized():
    """The inverse carries the exact 2/N PR normalization: a forward
    MDCT of a windowed constant comes back at unit gain through two
    overlapped frames (no hidden 2x)."""
    x = np.ones(1024 * 4)
    w = _half_window(1024, 0)
    full_w = np.concatenate([w, w[::-1]])
    spectra = [_fwd_mdct(x[i * 1024:(i + 2) * 1024], full_w) for i in range(3)]
    ics = [{"window_sequence": ONLY_LONG, "window_shape": 0}] * 3
    got = _synthesize_channel(spectra, ics)
    np.testing.assert_allclose(got[1024:3 * 1024], 1.0, atol=1e-9)


def test_audio_features_consume_adts_stream(spark):
    """The r11 verdict task-10 'Done' criterion: audio_features
    consumes an in-repo-encoded ADTS stream — real rate/channels/
    duration, zero RMS (the honest decode of an all-ZERO_HCB
    stream) — and a nonzero-codebook stream quarantines under
    on_error='null' instead of failing the job."""
    from trial_submission_studio_spark.operators.multimodal import (
        audio_features,
    )

    good = encode_aac_silence(48000, n_frames=12, channels=2)
    bad = encode_aac_silence(48000, n_frames=2, _codebook=11)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in audio_features(df, on_error="null").collect()
    }
    assert rows[1]["sample_rate"] == 48000
    assert rows[1]["n_channels"] == 2
    assert rows[1]["duration_ms"] == int(round(1000 * 12 * 1024 / 48000))
    assert rows[1]["rms"] == 0.0
    assert rows[2]["sample_rate"] is None  # quarantined, job alive


def test_adts_rates_table_is_the_published_one():
    assert ADTS_RATES[3] == 48000 and ADTS_RATES[4] == 44100
    assert len(ADTS_RATES) == 13


def test_protected_multiblock_frame_quarantines_explicitly():
    """ADVICE r12 (low): with protection_absent=0 AND
    number_of_raw_data_blocks_in_frame > 0 the ADTS header carries
    raw_data_block_position entries plus per-block CRC words, which
    the sequential parse does not implement — the decode must raise
    NotImplementedError (quarantine), never misparse the first block
    as if only the 2 fixed CRC bytes preceded it."""
    import pytest

    from trial_submission_studio_spark.operators.aac import (
        _parse_adts_header,
        decode_aac,
    )

    good = encode_aac_silence(44100, n_frames=1, channels=1)
    # rewrite the header: protection_absent=0 (clear bit 0 of byte 1),
    # n_blocks=2 (set number_of_raw_data_blocks_in_frame=1), extend
    # frame_len by the 2 CRC bytes we splice in after the 7-byte header
    b = bytearray(good)
    b[1] &= 0xFE
    b[6] = (b[6] & 0xFC) | 1
    frame_len = ((b[3] & 0x3) << 11) | (b[4] << 3) | (b[5] >> 5)
    frame_len += 2
    b[3] = (b[3] & 0xFC) | (frame_len >> 11)
    b[4] = (frame_len >> 3) & 0xFF
    b[5] = (b[5] & 0x1F) | ((frame_len & 0x7) << 5)
    b = b[:7] + b"\x00\x00" + b[7:]
    h = _parse_adts_header(bytes(b), 0)
    assert h is not None and h["crc"] and h["n_blocks"] == 2
    with pytest.raises(NotImplementedError, match="multi-block"):
        decode_aac(bytes(b))
