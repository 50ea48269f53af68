"""AAC-LC (ADTS) codec skeleton — pure stdlib + numpy, public-spec
(ISO/IEC 14496-3) algorithmic stages with the same honest boundary
discipline as :mod:`.mp3`.

What is REAL here (all closed-form / structural, fully implemented
and tested):

- ADTS framing: syncword walk, header fields (profile, sampling
  frequency index, channel configuration, frame length, CRC skip,
  multiple raw-data-blocks-per-frame);
- raw_data_block syntax: SCE/CPE/LFE/DSE/FIL/END element framing,
  element instance tags, common_window + MS mask parse, DSE/FIL
  payload skip with escape counts;
- ics_info for all four window sequences (ONLY_LONG, LONG_START,
  EIGHT_SHORT with scale_factor_grouping, LONG_STOP);
- section_data: per-band codebook runs with 5-bit/3-bit section
  lengths and escape accumulation;
- the filterbank: 2048/256 IMDCT, sine AND Kaiser-Bessel-derived
  windows (KBD is formula-derived, not tabulated), the four window
  shapes incl. the 448-offset short-window assembly, 1024-sample
  overlap-add — perfect-reconstruction-tested against a reference
  numpy MDCT (`tests/test_aac.py`).

What is NOT (the named boundary, same rule as
`mp3_tables.UNVALIDATED_TABLES`): the Huffman codebooks — the
scalefactor codebook and spectral codebooks 1-11 are arbitrary
published constants with no in-container source and no recall that
survives the prefix-free/Kraft transcription gate that admitted the
MP3 subset. Consequently only ZERO_HCB (codebook 0) bands decode —
i.e. structurally-valid SILENT streams; any section selecting
codebook 1-15, and any tool needing the scalefactor codebook
(nonzero bands, PNS energy deltas, intensity positions), raises
``NotImplementedError`` naming the codebook, so corpus jobs
quarantine via ``on_error="null"`` instead of decoding garbage.
The in-repo :func:`encode_aac_silence` correctness encoder emits
conformant ADTS streams over every implemented parse path (long /
short / transition windows, SCE and CPE, all three common rates),
which is exactly the decode surface `multimodal.audio_features`
consumes: real sample rate, channel count and duration; RMS 0.

Reference parity: the reference bundles a full codec stack via its
media crates; this skeleton + boundary is the honest equivalent
(SURVEY.md multimodal row).
"""

from __future__ import annotations

import math

__all__ = ["decode_aac", "encode_aac_silence", "adts_stream_info"]

#: ADTS sampling_frequency_index table (ISO 14496-3)
ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)

ONLY_LONG, LONG_START, EIGHT_SHORT, LONG_STOP = 0, 1, 2, 3

#: spectral codebook ids (section_data): 0 decodes (silence); the
#: rest are the named boundary
ZERO_HCB = 0
ESC_HCB = 11
NOISE_HCB = 13
INTENSITY_HCB2, INTENSITY_HCB = 14, 15

#: number of scalefactor bands (num_swb) per rate — used to bound
#: section_data loops. Lenient: unknown rates fall back to the
#: largest published count; max_sfb beyond it is a parse error.
NUM_SWB_LONG = {96000: 41, 88200: 41, 64000: 47, 48000: 49, 44100: 49,
                32000: 51, 24000: 47, 22050: 47, 16000: 43, 12000: 43,
                11025: 43, 8000: 40}
NUM_SWB_SHORT = {96000: 12, 88200: 12, 64000: 12, 48000: 14, 44100: 14,
                 32000: 14, 24000: 15, 22050: 15, 16000: 15, 12000: 15,
                 11025: 15, 8000: 15}


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        pos, data = self.pos, self.data
        for _ in range(n):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, bits: int) -> None:
        if bits:
            self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
            self.n += bits
            while self.n >= 8:
                self.n -= 8
                self.out.append((self.acc >> self.n) & 0xFF)

    def byte_align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


# ---------------------------------------------------------------- ADTS


def _parse_adts_header(b: bytes, i: int):
    """13-field fixed+variable ADTS header at offset i, or None."""
    if i + 7 > len(b):
        return None
    if b[i] != 0xFF or (b[i + 1] & 0xF6) != 0xF0:
        return None  # sync 0xFFF + layer '00'
    protection_absent = b[i + 1] & 1
    profile = (b[i + 2] >> 6) & 0x3
    sr_idx = (b[i + 2] >> 2) & 0xF
    if sr_idx >= len(ADTS_RATES):
        return None
    channels = ((b[i + 2] & 1) << 2) | ((b[i + 3] >> 6) & 0x3)
    frame_len = ((b[i + 3] & 0x3) << 11) | (b[i + 4] << 3) | (b[i + 5] >> 5)
    n_blocks = (b[i + 6] & 0x3) + 1
    if frame_len < 7:
        return None
    return {
        "profile": profile,  # 1 = AAC-LC ('01')
        "rate": ADTS_RATES[sr_idx],
        "sr_idx": sr_idx,
        "channels": channels,
        "frame_len": frame_len,
        "crc": protection_absent == 0,
        "n_blocks": n_blocks,
        "header_len": 7 + (2 if protection_absent == 0 else 0),
    }


def adts_stream_info(payload: bytes):
    """Header-only ADTS walk → rate/channels/frames/duration, or
    None. (The multimodal probe has its own copy of this walk; this
    one is the codec-side entry.)"""
    if not payload:
        return None
    i, n, rate, channels = 0, 0, None, None
    while i + 7 <= len(payload):
        h = _parse_adts_header(payload, i)
        if h is None:
            if n == 0:
                i += 1
                continue
            break
        rate, channels = h["rate"], h["channels"]
        n += h["n_blocks"]
        i += h["frame_len"]
    if n == 0:
        return None
    return {
        "rate": rate,
        "channels": channels,
        "n_frames": n,
        "duration_ms": int(round(1000.0 * n * 1024 / rate)),
    }


# ---------------------------------------------------------- raw_data_block


def _parse_ics_info(br: _Bits, rate: int):
    if br.read(1):
        raise ValueError("ics_reserved_bit set")
    ws = br.read(2)
    shape = br.read(1)
    if ws == EIGHT_SHORT:
        max_sfb = br.read(4)
        grouping = br.read(7)
        num_swb = NUM_SWB_SHORT.get(rate, 15)
    else:
        max_sfb = br.read(6)
        if br.read(1):  # predictor_data_present
            raise NotImplementedError(
                "AAC predictor/LTP data is outside the implemented subset"
            )
        grouping = None
        num_swb = NUM_SWB_LONG.get(rate, 51)
    if max_sfb > num_swb:
        raise ValueError(f"max_sfb {max_sfb} > num_swb {num_swb}")
    return {"window_sequence": ws, "window_shape": shape,
            "max_sfb": max_sfb, "grouping": grouping}


def _window_groups(ics) -> int:
    """Short frames: grouping bit i set means window i+1 joins the
    previous group; clear bits start new groups."""
    if ics["window_sequence"] != EIGHT_SHORT:
        return 1
    g = 1
    for bit in range(6, -1, -1):
        if not (ics["grouping"] >> bit) & 1:
            g += 1
    return g


def _parse_section_data(br: _Bits, ics):
    """→ list of (group, sfb_start, sfb_end, codebook)."""
    short = ics["window_sequence"] == EIGHT_SHORT
    bits = 3 if short else 5
    esc = (1 << bits) - 1
    out = []
    for g in range(_window_groups(ics)):
        k = 0
        while k < ics["max_sfb"]:
            cb = br.read(4)
            sect_len = 0
            while True:
                inc = br.read(bits)
                sect_len += inc
                if inc != esc:
                    break
            if sect_len == 0 or k + sect_len > ics["max_sfb"]:
                raise ValueError("bad section length")
            out.append((g, k, k + sect_len, cb))
            k += sect_len
    return out


def _parse_individual_channel_stream(
    br: _Bits, rate: int, common_ics, scale_flag: bool = False
):
    """One ICS → per-channel dict; only all-ZERO_HCB spectra decode
    (module docstring boundary)."""
    gg = br.read(8)
    ics = common_ics if common_ics is not None else _parse_ics_info(br, rate)
    sections = _parse_section_data(br, ics)
    nonzero = [s for s in sections if s[3] != ZERO_HCB]
    if nonzero:
        cb = nonzero[0][3]
        kind = {NOISE_HCB: "PNS noise", INTENSITY_HCB: "intensity",
                INTENSITY_HCB2: "intensity"}.get(cb, "spectral")
        raise NotImplementedError(
            f"AAC {kind} codebook {cb} is outside the implemented subset: "
            "the scalefactor and spectral Huffman codebooks could not be "
            "validated from available knowledge (operators/aac.py "
            "docstring boundary) - only ZERO_HCB bands decode"
        )
    # all bands zero: no scalefactor bits are transmitted
    if br.read(1):  # pulse_data_present
        raise NotImplementedError(
            "AAC pulse data is outside the implemented subset"
        )
    if br.read(1):  # tns_data_present
        raise NotImplementedError(
            "AAC TNS data is outside the implemented subset"
        )
    if br.read(1):  # gain_control_data_present
        raise NotImplementedError(
            "AAC gain control (SSR) is outside the implemented subset"
        )
    # spectral_data: zero codebooks carry no bits
    return {"global_gain": gg, "ics": ics}


def _skip_fil(br: _Bits) -> None:
    cnt = br.read(4)
    if cnt == 15:
        cnt += br.read(8) - 1
    for _ in range(cnt):
        br.read(8)


def _skip_dse(br: _Bits) -> None:
    br.read(4)  # instance tag
    align = br.read(1)
    cnt = br.read(8)
    if cnt == 255:
        cnt += br.read(8)
    if align:
        br.byte_align()
    for _ in range(cnt):
        br.read(8)


def _parse_raw_data_block(br: _Bits, rate: int):
    """→ list of per-channel ICS dicts (one per SCE channel, two per
    CPE), in stream order, ending at the END element."""
    chans = []
    while True:
        ele = br.read(3)
        if ele == 7:  # END
            break
        if ele in (0, 3):  # SCE / LFE
            br.read(4)  # instance tag
            chans.append(
                _parse_individual_channel_stream(br, rate, None)
            )
        elif ele == 1:  # CPE
            br.read(4)
            common = br.read(1)
            shared = None
            if common:
                shared = _parse_ics_info(br, rate)
                ms = br.read(2)  # ms_mask_present
                if ms == 1:
                    n_bands = shared["max_sfb"] * _window_groups(shared)
                    for _ in range(n_bands):
                        br.read(1)
                elif ms == 3:
                    raise ValueError("reserved ms_mask_present")
            chans.append(
                _parse_individual_channel_stream(br, rate, shared)
            )
            chans.append(
                _parse_individual_channel_stream(br, rate, shared)
            )
        elif ele == 4:  # DSE
            _skip_dse(br)
        elif ele == 6:  # FIL
            _skip_fil(br)
        else:  # CCE / PCE
            raise NotImplementedError(
                f"AAC syntactic element {ele} (CCE/PCE) is outside the "
                "implemented subset"
            )
    return chans


# ------------------------------------------------------------- filterbank


def _kbd_window(n_half: int, alpha: float = 4.0):
    """Kaiser-Bessel-derived window half (ISO 14496-3 formula —
    derived, not tabulated: cumulative normalized Kaiser kernel,
    square-rooted). alpha = 4 for the 2048 window, 6 for 256."""
    import numpy as np

    m = n_half
    k = np.arange(m + 1, dtype=np.float64)
    w = np.i0(math.pi * alpha * np.sqrt(1.0 - (2.0 * k / m - 1.0) ** 2))
    c = np.cumsum(w)
    return np.sqrt(c[:-1] / c[-1])


def _sine_window(n_half: int):
    import numpy as np

    return np.sin(math.pi / (2 * n_half) * (np.arange(n_half) + 0.5))


def _half_window(n_half: int, shape: int):
    if shape:
        return _kbd_window(n_half, 4.0 if n_half == 1024 else 6.0)
    return _sine_window(n_half)


def _imdct(X):
    """N/2-point spectrum → N time samples (the standard MDCT
    inverse with n0 = (N/2 + 1)/2)."""
    import numpy as np

    half = len(X)
    n = 2 * half
    n0 = (half + 1) / 2.0
    t = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(half, dtype=np.float64)[None, :]
    M = np.cos(2.0 * math.pi / n * (t + n0) * (k + 0.5))
    return (2.0 / half) * (M @ np.asarray(X, dtype=np.float64))


def _window_long(z, ics, prev_shape: int):
    """Apply the window-sequence shaping to a 2048-sample IMDCT
    output (left half uses the PREVIOUS frame's shape, per spec)."""
    import numpy as np

    ws = ics["window_sequence"]
    left = _half_window(1024, prev_shape)
    right = _half_window(1024, ics["window_shape"])
    w = np.empty(2048)
    if ws == ONLY_LONG:
        w[:1024] = left
        w[1024:] = right[::-1]
    elif ws == LONG_START:
        w[:1024] = left
        w[1024:1024 + 448] = 1.0
        short_r = _half_window(128, ics["window_shape"])
        w[1472:1600] = short_r[::-1]
        w[1600:] = 0.0
    elif ws == LONG_STOP:
        w[:448] = 0.0
        short_l = _half_window(128, prev_shape)
        w[448:576] = short_l
        w[576:1024] = 1.0
        w[1024:] = right[::-1]
    else:
        raise ValueError(ws)
    return z * w


def _synthesize_channel(spectra, ics_seq):
    """Per-frame 1024-coefficient spectra + ics dicts → PCM via
    IMDCT + 50%% overlap-add. Implements all four window sequences;
    EIGHT_SHORT assembles eight 256-point transforms at the
    448-sample offset."""
    import numpy as np

    overlap = np.zeros(1024)
    prev_shape = 0
    out = []
    for X, ics in zip(spectra, ics_seq):
        ws = ics["window_sequence"]
        if ws == EIGHT_SHORT:
            buf = np.zeros(2048)
            short_prev = prev_shape
            for w_i in range(8):
                zz = _imdct(X[128 * w_i: 128 * (w_i + 1)])
                wl = _half_window(128, short_prev)
                wr = _half_window(128, ics["window_shape"])
                zz = zz * np.concatenate([wl, wr[::-1]])
                start = 448 + 128 * w_i
                buf[start:start + 256] += zz
                short_prev = ics["window_shape"]
            z = buf
        else:
            z = _window_long(_imdct(X), ics, prev_shape)
        out.append(z[:1024] + overlap)
        overlap = z[1024:]
        prev_shape = ics["window_shape"]
    if not out:
        return np.zeros(0)
    return np.concatenate(out)


# ----------------------------------------------------------------- decode


def decode_aac(payload: bytes):
    """ADTS AAC-LC bytes → (sample_rate, n_channels, float64 mono
    mix) — the `multimodal._make_audio_decoder` contract — or None
    when no ADTS frame parses. Raises ``NotImplementedError`` when
    any band selects a codebook outside ZERO_HCB (quarantine path —
    module docstring boundary)."""
    import numpy as np

    if not payload:
        return None
    i, rate, nch = 0, None, None
    per_chan_spectra: list[list] = []
    per_chan_ics: list[list] = []
    n_blocks_done = 0
    while i + 7 <= len(payload):
        h = _parse_adts_header(payload, i)
        if h is None:
            if n_blocks_done == 0:
                i += 1
                continue
            break
        if rate is None:
            rate, nch = h["rate"], max(1, h["channels"])
            per_chan_spectra = [[] for _ in range(nch)]
            per_chan_ics = [[] for _ in range(nch)]
        if h["crc"] and h["n_blocks"] > 1:
            # ISO 13818-7 §6.2: with protection_absent=0 and
            # number_of_raw_data_blocks_in_frame > 0 the header also
            # carries raw_data_block_position[1..n-1] (16 bits each)
            # and a per-block CRC word follows EVERY block — a
            # sequential parse that only skips the 2 fixed CRC bytes
            # would misread the first block. Quarantine explicitly
            # rather than decode garbage (ADVICE r12).
            raise NotImplementedError(
                "ADTS protected multi-block frame "
                f"(n_blocks={h['n_blocks']}, protection_absent=0): "
                "per-block CRC framing not implemented"
            )
        body = payload[i + h["header_len"]: i + h["frame_len"]]
        br = _Bits(body)
        for _blk in range(h["n_blocks"]):
            chans = _parse_raw_data_block(br, rate)
            br.byte_align()
            if len(chans) != nch:
                raise ValueError(
                    f"raw_data_block carries {len(chans)} channels, "
                    f"header says {nch}"
                )
            for c, ch in enumerate(chans):
                per_chan_spectra[c].append(np.zeros(1024))
                per_chan_ics[c].append(ch["ics"])
            n_blocks_done += 1
        i += h["frame_len"]
    if n_blocks_done == 0:
        return None
    pcm = [
        _synthesize_channel(per_chan_spectra[c], per_chan_ics[c])
        for c in range(nch)
    ]
    mono = sum(pcm) / float(nch)
    np.clip(mono, -1.0, 1.0, out=mono)
    return rate, nch, mono


# ---------------------------------------------------- correctness encoder


def encode_aac_silence(
    sample_rate: int = 44100,
    n_frames: int = 8,
    channels: int = 1,
    *,
    max_sfb: int = 20,
    window_sequence: tuple = (ONLY_LONG,),
    window_shape: int = 0,
    with_fil: bool = False,
    _codebook: int = ZERO_HCB,
) -> bytes:
    """Structurally-conformant ADTS AAC-LC frames whose every band
    is ZERO_HCB — the correctness-encoder twin of
    `mp3.encode_mp3_tones`, covering the implemented parse surface:
    SCE/CPE, all four window sequences (cycled per frame from
    ``window_sequence``), sine/KBD shapes, FIL elements, multi-rate.
    ``_codebook`` is the quarantine hook: a nonzero value emits ONE
    section with that codebook (and no further payload), producing a
    frame whose decode must raise ``NotImplementedError``."""
    if sample_rate not in ADTS_RATES:
        raise ValueError(f"sample_rate must be one of {ADTS_RATES}")
    if channels not in (1, 2):
        raise ValueError("channels must be 1 or 2")
    if any(ws not in (0, 1, 2, 3) for ws in window_sequence):
        raise ValueError("window sequences are 0..3")
    sr_idx = ADTS_RATES.index(sample_rate)

    def put_ics_info(w: _BitWriter, ws: int) -> None:
        w.put(0, 1)  # ics_reserved
        w.put(ws, 2)
        w.put(window_shape, 1)
        if ws == EIGHT_SHORT:
            w.put(min(max_sfb, 14), 4)
            w.put(0x7F, 7)  # one group of eight windows
        else:
            w.put(min(max_sfb, NUM_SWB_LONG.get(sample_rate, 40)), 6)
            w.put(0, 1)  # predictor_data_present

    def put_sections(w: _BitWriter, ws: int) -> None:
        short = ws == EIGHT_SHORT
        bits = 3 if short else 5
        esc = (1 << bits) - 1
        msfb = min(max_sfb, 14) if short else min(
            max_sfb, NUM_SWB_LONG.get(sample_rate, 40)
        )
        if _codebook != ZERO_HCB:
            w.put(_codebook, 4)
            w.put(min(msfb, esc - 1), bits)
            return
        k = 0
        while k < msfb:  # ZERO sections with escape exercise
            step = min(msfb - k, esc - 1) or 1
            w.put(ZERO_HCB, 4)
            w.put(step, bits)
            k += step

    def put_ics(w: _BitWriter, ws: int, with_info: bool) -> None:
        w.put(100, 8)  # global_gain (no effect on zero bands)
        if with_info:
            put_ics_info(w, ws)
        put_sections(w, ws)
        if _codebook != ZERO_HCB:
            return  # decode raises before reading further
        w.put(0, 1)  # pulse_data_present
        w.put(0, 1)  # tns_data_present
        w.put(0, 1)  # gain_control_data_present

    frames = []
    for f_i in range(n_frames):
        ws = window_sequence[f_i % len(window_sequence)]
        body = _BitWriter()
        if with_fil:
            body.put(6, 3)  # FIL
            body.put(2, 4)  # 2 fill bytes
            body.put(0xABCD, 16)
        if channels == 1:
            body.put(0, 3)  # SCE
            body.put(0, 4)  # instance tag
            put_ics(body, ws, with_info=True)
        else:
            body.put(1, 3)  # CPE
            body.put(0, 4)
            body.put(1, 1)  # common_window
            put_ics_info(body, ws)
            body.put(0, 2)  # ms_mask_present = 0
            put_ics(body, ws, with_info=False)
            put_ics(body, ws, with_info=False)
        body.put(7, 3)  # END
        body.byte_align()
        payload = body.bytes()
        frame_len = 7 + len(payload)
        h = _BitWriter()
        h.put(0xFFF, 12)      # sync
        h.put(0, 1)           # MPEG-4
        h.put(0, 2)           # layer
        h.put(1, 1)           # protection_absent
        h.put(1, 2)           # profile: AAC-LC
        h.put(sr_idx, 4)
        h.put(0, 1)           # private
        h.put(channels, 3)
        h.put(0, 1)           # original
        h.put(0, 1)           # home
        h.put(0, 1)           # copyright id
        h.put(0, 1)           # copyright start
        h.put(frame_len, 13)
        h.put(0x7FF, 11)      # buffer fullness: VBR
        h.put(0, 2)           # one raw_data_block
        frames.append(h.bytes() + payload)
    return b"".join(frames)


try:  # register by value so Arrow kernels can ship this module
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - never block import on this
    pass
