"""JPEG codec, baseline + progressive — pure stdlib + numpy (no
PIL/libjpeg).

Public-spec implementation (ITU-T T.81, Huffman, 8-bit): the format
is self-describing — quantization and Huffman tables travel in
DQT/DHT segments — so the decoder reads whatever tables the file
carries and the encoder is free to emit its own canonical tables.
Supported:

- ``decode_jpeg``: baseline SOF0 *and* progressive SOF2 (spectral
  selection + successive approximation, T.81 G.2 refinement
  semantics), 8-bit, 1- or 3-component, any sampling factors in {1,2}
  (chroma upsampled by pixel repetition), restart intervals
  (DRI/RSTn), multiple DQT/DHT per segment. Arithmetic-coded,
  hierarchical, and 12-bit streams return None — callers fall through
  to their codec-library integration point.
- ``encode_jpeg``: baseline; quality-scaled standard quant tables,
  4:4:4 or 4:2:0 subsampling, fixed canonical Huffman tables (all DC
  symbols at 4 bits, all AC symbols at 8 bits — valid per the spec
  since the tables are written into the DHT segment).
- ``encode_jpeg_progressive``: SOF2 with the classic web scan script
  (interleaved DC, luma AC in two spectral bands, chroma AC, plus DC
  and AC refinement passes when ``successive=True``). Emits the SAME
  quantized coefficients as ``encode_jpeg``, so progressive and
  baseline decode to bit-identical pixels — the roundtrip test pin.

Throughput note: entropy decode is bit-serial Python per coefficient
— a correct, dependency-free reference decoder for test/metadata
scale, same position as the PNG unfilter loop. Production bulk decode
belongs in a PIL/torchvision kernel behind the same mapInPandas
operator surface.
"""

from __future__ import annotations

import struct

__all__ = ["encode_jpeg", "encode_jpeg_progressive", "decode_jpeg"]


def _zigzag():
    import numpy as np

    zz = []
    for s in range(15):
        idx = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        zz += idx[::-1] if s % 2 == 0 else idx
    rows = np.array([r for r, _ in zz])
    cols = np.array([c for _, c in zz])
    return rows, cols


def _dct_matrix():
    import numpy as np

    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5  # orthonormal scaling: C @ B @ C.T is the 2-D DCT


#: standard (Annex K) base quantization tables, quality-scaled at use
_Q_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHR = (
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32
)

#: encoder Huffman alphabets (canonical; lengths chosen so Kraft holds
#: and the all-ones code stays unused): DC categories 0..11 at 4 bits,
#: the 162 baseline AC symbols at 8 bits
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {sym: (i, length) for i, sym in enumerate(sorted(symbols))}


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _encode_block(bw, block_q, dc_prev, dc_codes, ac_codes, zz_r, zz_c):
    seq = block_q[zz_r, zz_c]
    dc = int(seq[0])
    diff = dc - dc_prev
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    nz = [i for i in range(1, 64) if seq[i]]
    last_nz = nz[-1] if nz else 0
    for i in range(1, last_nz + 1):
        v = int(seq[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
    return dc


def _quality_scale(base: list[int], quality: int):
    import numpy as np

    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.array(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32).reshape(8, 8)


def _dht_segment(tc_th: int, symbols: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    body = bytes([tc_th]) + bytes(counts) + bytes(sorted(symbols))
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img, quality: int = 90, subsampling: str = "4:2:0", restart_interval: int = 0
) -> bytes:
    """H×W×3 uint8 RGB → baseline JFIF bytes (4:2:0 or 4:4:4).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs
    (error-resilience feature; also exercises the decoder's restart
    resync path)."""
    import numpy as np

    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape[0], a.shape[1]
    sub = subsampling == "4:2:0"

    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qy = _quality_scale(_Q_LUM, quality)
    qc = _quality_scale(_Q_CHR, quality)
    C = _dct_matrix()
    zz_r, zz_c = _zigzag()
    dc_codes = _canonical_codes(_DC_SYMBOLS, 4)
    ac_codes = _canonical_codes(_AC_SYMBOLS, 8)

    mcu = 16 if sub else 8
    ph = (h + mcu - 1) // mcu * mcu
    pw = (w + mcu - 1) // mcu * mcu

    def pad(ch, target_h, target_w):
        return np.pad(
            ch, ((0, target_h - ch.shape[0]), (0, target_w - ch.shape[1])),
            mode="edge",
        )

    y = pad(y, ph, pw)
    if sub:
        cb = pad(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = pad(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = pad(cb, ph, pw), pad(cr, ph, pw)

    def fdct_q(plane, by, bx, qtab):
        blk = plane[by : by + 8, bx : bx + 8] - 128.0
        return np.round(C @ blk @ C.T / qtab).astype(np.int32)

    bw = _BitWriter()
    dc_y = dc_cb = dc_cr = 0
    n_mcu = 0
    rst_idx = 0
    for my in range(0, ph, mcu):
        for mx in range(0, pw, mcu):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                dc_y = dc_cb = dc_cr = 0
            n_mcu += 1
            if sub:
                for dy in (0, 8):
                    for dx in (0, 8):
                        dc_y = _encode_block(
                            bw, fdct_q(y, my + dy, mx + dx, qy), dc_y,
                            dc_codes, ac_codes, zz_r, zz_c,
                        )
                dc_cb = _encode_block(
                    bw, fdct_q(cb, my // 2, mx // 2, qc), dc_cb,
                    dc_codes, ac_codes, zz_r, zz_c,
                )
                dc_cr = _encode_block(
                    bw, fdct_q(cr, my // 2, mx // 2, qc), dc_cr,
                    dc_codes, ac_codes, zz_r, zz_c,
                )
            else:
                dc_y = _encode_block(
                    bw, fdct_q(y, my, mx, qy), dc_y, dc_codes, ac_codes, zz_r, zz_c
                )
                dc_cb = _encode_block(
                    bw, fdct_q(cb, my, mx, qc), dc_cb, dc_codes, ac_codes, zz_r, zz_c
                )
                dc_cr = _encode_block(
                    bw, fdct_q(cr, my, mx, qc), dc_cr, dc_codes, ac_codes, zz_r, zz_c
                )
    bw.flush()

    def dqt(tq, qtab):
        seq = qtab[zz_r, zz_c].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + seq

    hv_y = 0x22 if sub else 0x11
    sof = (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    sos = (
        b"\xff\xda"
        + struct.pack(">HB", 12, 3)
        + bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + dqt(0, qy)
        + dqt(1, qc)
        + dri
        + sof
        + _dht_segment(0x00, _DC_SYMBOLS, 4)   # DC lum
        + _dht_segment(0x10, _AC_SYMBOLS, 8)   # AC lum
        + _dht_segment(0x01, _DC_SYMBOLS, 4)   # DC chr
        + _dht_segment(0x11, _AC_SYMBOLS, 8)   # AC chr
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        while self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                else:
                    return False  # marker: stop filling
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
            return True
        return False

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # pad with zeros at stream end (spec-padded streams
                # never actually consume these)
                self.acc <<= 8
                self.nbits += 8
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_marker(self) -> None:
        self.acc = 0
        self.nbits = 0
        # skip exactly ONE RSTn marker pair — a loop over 0xFF-prefixed
        # pairs would also swallow a stuffed FF 00 entropy byte that
        # legally follows the marker, silently corrupting the interval
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


def _build_decode_table(counts: list[int], symbols: list[int]):
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes):
    """Baseline JFIF bytes → H×W×3 uint8 RGB array, or None if the
    stream is not baseline-decodable (progressive, 12-bit, bad
    markers)."""
    import numpy as np

    if not payload or payload[:2] != b"\xff\xd8":
        return None
    qtabs: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart = 0
    i = 2
    zz_r, zz_c = _zigzag()
    C = _dct_matrix()
    try:
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            seg = payload[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT (possibly several tables)
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0xF
                    if pq != 0:
                        return None  # 16-bit tables: not baseline-8
                    tab = np.zeros((8, 8), np.int32)
                    vals = np.frombuffer(seg[j + 1 : j + 65], np.uint8)
                    tab[zz_r, zz_c] = vals
                    qtabs[tq] = tab
                    j += 65
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8 or nc not in (1, 3):
                    return None
                if h * w > 1 << 26:  # hostile-header cap (~67 MP)
                    return None
                comps = []
                for k in range(nc):
                    cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                    )
                if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                    return None
            elif marker == 0xC2:  # progressive DCT
                return _decode_progressive(payload)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                return None  # non-baseline, non-progressive SOF
            elif marker == 0xC4:  # DHT (possibly several tables)
                j = 0
                while j < len(seg):
                    tc_th = seg[j]
                    counts = list(seg[j + 1 : j + 17])
                    n = sum(counts)
                    symbols = list(seg[j + 17 : j + 17 + n])
                    huff[(tc_th >> 4, tc_th & 0xF)] = _build_decode_table(
                        counts, symbols
                    )
                    j += 17 + n
            elif marker == 0xDD:  # DRI
                restart = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                sel = {}
                for k in range(ns):
                    cs, td_ta = seg[1 + 2 * k : 3 + 2 * k]
                    sel[cs] = (td_ta >> 4, td_ta & 0xF)
                scan = payload[i + 2 + seg_len :]
                return _decode_scan(
                    scan, comps, sel, qtabs, huff, h, w, restart, C, zz_r, zz_c
                )
            i += 2 + seg_len
    except (ValueError, IndexError, KeyError, TypeError, OverflowError,
            struct.error):
        # KeyError: stream references an undefined quant/Huffman table
        # or a component absent from SOS; TypeError: SOS before SOF;
        # OverflowError: a corrupt DHT can yield bit-lengths whose
        # values no longer fit the int32 coefficient store.
        # The contract is None for anything not baseline-decodable.
        return None
    return None


def _decode_scan(scan, comps, sel, qtabs, huff, h, w, restart, C, zz_r, zz_c):
    import numpy as np

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), np.float64)
        )

    br = _BitReader(scan)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and n_mcu and n_mcu % restart == 0:
                br.align_to_marker()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                q = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, np.int32)
                        s = _read_symbol(br, dc_tab)
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        coeffs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_tab)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            sz = rs & 0xF
                            if k > 63:
                                raise ValueError("AC overflow")
                            coeffs[k] = _extend(br.bits(sz), sz)
                            k += 1
                        blk = np.zeros((8, 8), np.float64)
                        blk[zz_r, zz_c] = coeffs * q[zz_r, zz_c]
                        px = C.T @ blk @ C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            n_mcu += 1

    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive (SOF2) decode — spectral selection + successive approximation
# --------------------------------------------------------------------------
#
# A progressive stream carries the SAME quantized DCT coefficients as a
# baseline one, split across several scans: DC first (optionally at
# reduced precision), then per-component AC bands, then refinement
# scans that append one precision bit per coefficient. The decoder
# accumulates coefficients per block across all scans and reconstructs
# once at EOI. Refinement-bit semantics follow T.81 G.2 (the same
# arithmetic libjpeg implements): newly-nonzero coefficients arrive as
# ±1<<Al, history coefficients absorb correction bits via two's
# complement OR toward their true magnitude.


def _ac_first(br, block, tab, ss, se, al, state):
    """One block of a first-pass AC scan (Ah=0): band-limited RLE with
    EOB runs; coefficient values land shifted left by Al."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _read_symbol(br, tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.bits(r)
            return
        k += r
        if k > se:
            raise ValueError("AC band overflow")
        block[k] = _extend(br.bits(s), s) << al
        k += 1


def _ac_refine(br, block, tab, ss, se, al, state):
    """One block of an AC refinement scan (Ah>0): newly-nonzero
    coefficients enter as ±1<<Al; every nonzero-history coefficient
    passed absorbs one correction bit."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _read_symbol(br, tab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                val = p1 if br.bits(1) else m1
            while k <= se:
                if block[k] != 0:
                    if br.bits(1) and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if block[k] != 0:
                if br.bits(1) and (block[k] & p1) == 0:
                    block[k] += p1 if block[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _decode_prog_scan(
    payload, start, scomps, coef, huff, ss, se, ah, al, restart, mcus_x, mcus_y
):
    """Decode one progressive scan's entropy data; returns the offset
    of the next marker. Multi-component scans (DC only, per spec) walk
    MCU order; single-component scans walk the component's
    non-interleaved block grid."""
    br = _BitReader(payload[start:])
    state = {"eobrun": 0}
    preds = {ci: 0 for ci, _c, _td, _ta in scomps}

    def units():
        if len(scomps) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blocks = []
                    for ci, c, td, ta in scomps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blocks.append(
                                    (ci, c, td, ta, my * c["v"] + by, mx * c["h"] + bx)
                                )
                    yield blocks
        else:
            ci, c, td, ta = scomps[0]
            for by in range(c["bh_n"]):
                for bx in range(c["bw_n"]):
                    yield [(ci, c, td, ta, by, bx)]

    n_unit = 0
    for blocks in units():
        if restart and n_unit and n_unit % restart == 0:
            br.align_to_marker()
            state["eobrun"] = 0
            for ci in preds:
                preds[ci] = 0
        n_unit += 1
        for ci, c, td, ta, by, bx in blocks:
            block = coef[ci][by, bx]
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                if ah == 0:
                    s = _read_symbol(br, huff[(0, td)])
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[ci] += diff
                    block[0] = preds[ci] << al
                else:
                    if br.bits(1):
                        block[0] |= 1 << al
            elif ah == 0:
                _ac_first(br, block, huff[(1, ta)], ss, se, al, state)
            else:
                _ac_refine(br, block, huff[(1, ta)], ss, se, al, state)

    p = start + br.pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00 and not (
            0xD0 <= payload[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p


def _decode_progressive(payload):
    """Progressive JFIF bytes → H×W×3 uint8 RGB array, or None if not
    decodable. Coefficients accumulate across scans; dequantize + IDCT
    happen once at end-of-image (vectorized einsum over all blocks)."""
    import numpy as np

    qtabs: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    comps_by_id = {}
    coef = None
    h = w = 0
    restart = 0
    mcus_x = mcus_y = 0
    hmax = vmax = 1
    zz_r, zz_c = _zigzag()
    C = _dct_matrix()
    i = 2
    try:
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            seg = payload[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0xF
                    if pq != 0:
                        return None
                    tab = np.zeros((8, 8), np.int32)
                    vals = np.frombuffer(seg[j + 1 : j + 65], np.uint8)
                    tab[zz_r, zz_c] = vals
                    qtabs[tq] = tab
                    j += 65
            elif marker == 0xC2:
                prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8 or nc not in (1, 3):
                    return None
                if h * w > 1 << 26:  # hostile-header cap (~67 MP)
                    return None
                comps = []
                for k in range(nc):
                    cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
                if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                    return None
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                coef = []
                for ci, c in enumerate(comps):
                    c["bw_full"] = mcus_x * c["h"]
                    c["bh_full"] = mcus_y * c["v"]
                    cw = (w * c["h"] + hmax - 1) // hmax
                    ch_ = (h * c["v"] + vmax - 1) // vmax
                    c["bw_n"] = (cw + 7) // 8
                    c["bh_n"] = (ch_ + 7) // 8
                    coef.append(
                        np.zeros((c["bh_full"], c["bw_full"], 64), np.int32)
                    )
                    comps_by_id[c["id"]] = (ci, c)
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                return None  # mixed-frame / non-Huffman-8-bit streams
            elif marker == 0xC4:
                j = 0
                while j < len(seg):
                    tc_th = seg[j]
                    counts = list(seg[j + 1 : j + 17])
                    n = sum(counts)
                    symbols = list(seg[j + 17 : j + 17 + n])
                    huff[(tc_th >> 4, tc_th & 0xF)] = _build_decode_table(
                        counts, symbols
                    )
                    j += 17 + n
            elif marker == 0xDD:
                restart = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:
                ns = seg[0]
                scomps = []
                for k in range(ns):
                    cs, td_ta = seg[1 + 2 * k : 3 + 2 * k]
                    ci, c = comps_by_id[cs]
                    scomps.append((ci, c, td_ta >> 4, td_ta & 0xF))
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                i = _decode_prog_scan(
                    payload, i + 2 + seg_len, scomps, coef, huff,
                    ss, se, ahal >> 4, ahal & 0xF, restart, mcus_x, mcus_y,
                )
                continue
            i += 2 + seg_len
    except (ValueError, IndexError, KeyError, TypeError, OverflowError,
            struct.error):
        return None
    if coef is None or h == 0:
        return None

    full = []
    for c, cf in zip(comps, coef):
        q = qtabs.get(c["tq"])
        if q is None:
            return None
        blocks = np.zeros((c["bh_full"], c["bw_full"], 8, 8), np.float64)
        blocks[:, :, zz_r, zz_c] = cf.astype(np.float64) * q[zz_r, zz_c]
        px = np.einsum("ab,ijbc,cd->ijad", C.T, blocks, C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(
            c["bh_full"] * 8, c["bw_full"] * 8
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])

    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive (SOF2) encode — used by tests and as the sink-side mirror
# --------------------------------------------------------------------------


def _emit_ac_first(bw, vals, ac_codes):
    """First-pass AC band for one block: ``vals`` are the band's
    point-transformed coefficients (truncated toward zero). EOB runs
    are emitted per block (EOBRUN=1 — always legal)."""
    last_nz = -1
    for idx, v in enumerate(vals):
        if v:
            last_nz = idx
    if last_nz < 0:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
        return
    run = 0
    for idx in range(last_nz + 1):
        v = vals[idx]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < len(vals) - 1:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)


def _emit_ac_refine(bw, vals, al, ac_codes):
    """Refinement AC band for one block, mirroring the decoder's walk
    bit-for-bit: ``vals`` are the ORIGINAL (full-precision) band
    coefficients. Newly-nonzero at this precision (|v|>>Al == 1) emit
    a run/size-1 symbol + sign bit; zero-history runs count only
    positions still zero; every nonzero-history coefficient passed
    emits one correction bit, positionally ordered."""
    ab = [abs(v) >> al for v in vals]
    n = len(ab)
    last_new = -1
    for idx, a in enumerate(ab):
        if a == 1:
            last_new = idx
    idx = 0
    while idx <= last_new:
        j = idx
        while ab[j] != 1:
            j += 1
        run = sum(1 for t in range(idx, j) if ab[t] == 0)
        while run > 15:
            # ZRL: consume 16 zero-history positions from idx, with
            # the correction bits of history coefficients inside the
            # span emitted right after the symbol
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            zr = 0
            while zr < 16:
                if ab[idx] == 0:
                    zr += 1
                elif ab[idx] > 1:
                    bw.put(ab[idx] & 1, 1)
                idx += 1
            run -= 16
        code, ln = ac_codes[(run << 4) | 1]
        bw.put(code, ln)
        bw.put(1 if vals[j] > 0 else 0, 1)
        for t in range(idx, j):
            if ab[t] > 1:
                bw.put(ab[t] & 1, 1)
        idx = j + 1
    if idx <= n - 1:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
        for t in range(idx, n):
            if ab[t] > 1:
                bw.put(ab[t] & 1, 1)


def encode_jpeg_progressive(
    img, quality: int = 90, subsampling: str = "4:2:0", successive: bool = True
) -> bytes:
    """H×W×3 uint8 RGB → progressive (SOF2) JFIF bytes.

    Scan script (the shape web encoders emit): interleaved DC scan
    (at Al=1 when ``successive``), DC refinement, luma AC in two
    spectral bands (1–5, 6–63) + chroma AC in one band — each at Al=1
    when ``successive`` — then per-band AC refinement scans down to
    full precision. With ``successive=False`` only spectral selection
    is used (single full-precision pass per band)."""
    import numpy as np

    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape[0], a.shape[1]
    sub = subsampling == "4:2:0"

    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    planes3 = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]

    qy = _quality_scale(_Q_LUM, quality)
    qc = _quality_scale(_Q_CHR, quality)
    C = _dct_matrix()
    zz_r, zz_c = _zigzag()
    dc_codes = _canonical_codes(_DC_SYMBOLS, 4)
    ac_codes = _canonical_codes(_AC_SYMBOLS, 8)

    hmax = vmax = 2 if sub else 1
    mcu = 8 * hmax
    ph = (h + mcu - 1) // mcu * mcu
    pw = (w + mcu - 1) // mcu * mcu
    mcus_x, mcus_y = pw // mcu, ph // mcu

    def pad(ch, th, tw):
        return np.pad(
            ch, ((0, th - ch.shape[0]), (0, tw - ch.shape[1])), mode="edge"
        )

    comps = []
    for ci, plane in enumerate(planes3):
        if ci == 0 or not sub:
            p = pad(plane, ph, pw)
            cf_h, cf_v = hmax, vmax
        else:
            p = pad(plane, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cf_h = cf_v = 1
        q = qy if ci == 0 else qc
        bh = mcus_y * cf_v
        bwid = mcus_x * cf_h
        cw = (w * cf_h + hmax - 1) // hmax
        ch_ = (h * cf_v + vmax - 1) // vmax
        coefs = np.zeros((bh, bwid, 64), np.int64)
        for by in range(bh):
            for bx in range(bwid):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                qb = np.round(C @ blk @ C.T / q).astype(np.int64)
                coefs[by, bx] = qb[zz_r, zz_c]
        comps.append(
            {
                "h": cf_h, "v": cf_v, "coefs": coefs,
                "bw_n": (cw + 7) // 8, "bh_n": (ch_ + 7) // 8,
            }
        )

    def pt(v: int, al: int) -> int:
        # AC point transform: magnitude shift (truncation toward zero)
        return (abs(v) >> al) * (1 if v >= 0 else -1)

    def sos_header(sel: list[tuple[int, int]], ss, se, ah, al) -> bytes:
        ns = len(sel)
        body = bytes([ns])
        for cid, tdta in sel:
            body += bytes([cid, tdta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")

    def dqt(tq, qtab):
        return (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
            + qtab[zz_r, zz_c].astype(np.uint8).tobytes()
        )

    out += dqt(0, qy) + dqt(1, qc)
    hv_y = 0x22 if sub else 0x11
    out += (
        b"\xff\xc2"
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    out += _dht_segment(0x00, _DC_SYMBOLS, 4)
    out += _dht_segment(0x10, _AC_SYMBOLS, 8)
    out += _dht_segment(0x01, _DC_SYMBOLS, 4)
    out += _dht_segment(0x11, _AC_SYMBOLS, 8)

    dc_al = 1 if successive else 0
    ac_al = 1 if successive else 0
    bands = {0: [(1, 5), (6, 63)], 1: [(1, 63)], 2: [(1, 63)]}

    # --- DC first scan (interleaved) ---
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(c["coefs"][my * c["v"] + by, mx * c["h"] + bx, 0])
                        approx = dc >> dc_al  # arithmetic shift per spec
                        diff = approx - preds[ci]
                        preds[ci] = approx
                        s = _category(diff)
                        code, ln = dc_codes[s]
                        bw.put(code, ln)
                        if s:
                            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += sos_header([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, dc_al)
    out += bytes(bw.out)

    # --- DC refinement (interleaved, raw bits) ---
    if successive:
        bw = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc = int(
                                c["coefs"][my * c["v"] + by, mx * c["h"] + bx, 0]
                            )
                            bw.put(dc & 1, 1)
        bw.flush()
        out += sos_header([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
        out += bytes(bw.out)

    # --- AC first scans (non-interleaved, per component per band) ---
    for ci, c in enumerate(comps):
        ta = 0x00 if ci == 0 else 0x01
        for bs, be in bands[ci]:
            bw = _BitWriter()
            for by in range(c["bh_n"]):
                for bx in range(c["bw_n"]):
                    seq = c["coefs"][by, bx]
                    vals = [pt(int(seq[k]), ac_al) for k in range(bs, be + 1)]
                    _emit_ac_first(bw, vals, ac_codes)
            bw.flush()
            out += sos_header([(ci + 1, ta)], bs, be, 0, ac_al)
            out += bytes(bw.out)

    # --- AC refinement scans ---
    if successive:
        for ci, c in enumerate(comps):
            ta = 0x00 if ci == 0 else 0x01
            for bs, be in bands[ci]:
                bw = _BitWriter()
                for by in range(c["bh_n"]):
                    for bx in range(c["bw_n"]):
                        seq = c["coefs"][by, bx]
                        vals = [int(seq[k]) for k in range(bs, be + 1)]
                        _emit_ac_refine(bw, vals, 0, ac_codes)
                bw.flush()
                out += sos_header([(ci + 1, ta)], bs, be, 1, 0)
                out += bytes(bw.out)

    out += b"\xff\xd9"
    return bytes(out)
