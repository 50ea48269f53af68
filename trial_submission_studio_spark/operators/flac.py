"""FLAC codec — pure stdlib + numpy (no libFLAC/torchaudio).

Public-spec implementation (RFC 9639 / xiph FLAC format): the stream
is self-describing, so the decoder handles every subframe type the
spec defines for native FLAC — CONSTANT, VERBATIM, FIXED (orders
0–4), and LPC (orders 1–32) — with 4- or 5-bit Rice-partitioned
residuals (escape → raw bits), wasted-bits shifts, all four channel
assignments (independent, left/side, right/side, mid/side), and both
fixed- and variable-blocksize framing. CRC-8/CRC-16 are verified.

``encode_flac`` (driver/test-side) writes 16-bit streams using
CONSTANT, VERBATIM, or FIXED order-1 + Rice subframes per channel —
enough to exercise every decoder path that synthetic audio can reach,
and valid input for any conformant decoder.

Throughput note: residual decode is bit-serial Python — the correct,
dependency-free reference decoder for test/metadata scale (same
position as the JPEG entropy loop). Bulk decode belongs in a
libFLAC-backed kernel behind the same operator surface.
"""

from __future__ import annotations

__all__ = ["encode_flac", "decode_flac"]


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bits(self, n: int) -> int:
        while self.n < n:
            if self.pos >= len(self.data):
                raise ValueError("EOF")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= n
        v = (self.acc >> self.n) & ((1 << n) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def align(self) -> None:
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos - (self.n // 8)


def _utf8_number(value: int) -> bytes:
    """FLAC's extended-UTF-8 frame/sample number coding (an n-byte
    sequence carries ``(7-n) + 6*(n-1)`` payload bits, n ≤ 7)."""
    if value < 0x80:
        return bytes([value])
    for n in range(2, 8):
        if value.bit_length() <= (7 - n) + 6 * (n - 1):
            break
    head = (0xFF << (8 - n)) & 0xFF
    shift = 6 * (n - 1)
    out = [head | (value >> shift)]
    for _ in range(n - 1):
        shift -= 6
        out.append(0x80 | ((value >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("bad UTF-8 number")
    value = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        value = (value << 6) | (c & 0x3F)
    return value


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _zigzag(e: int) -> int:
    return (e << 1) if e >= 0 else ((-e) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def encode_flac(samples, sample_rate: int = 16000, block_size: int = 4096,
                verbatim: bool = False) -> bytes:
    """int16 array (n,) mono or (n, ch) → FLAC bytes (16-bit).

    Subframe choice per channel block: CONSTANT when flat, else FIXED
    order-1 with single-partition Rice residuals — or VERBATIM when
    ``verbatim`` (exercises that decoder path)."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, nch = a.shape

    import struct

    # spec: stream block size is 16..65535 (the LAST frame may be
    # shorter and is excluded from the STREAMINFO min/max fields)
    block_size = max(16, min(65535, int(block_size)))

    # STREAMINFO: min/max block, min/max frame (0 = unknown), rate,
    # channels, bps, total samples. All non-final frames use
    # block_size, so min = max = block_size per the spec's
    # last-frame exclusion; a stream of ONE short frame reports that
    # frame's size (clamped to the spec floor).
    rep_bs = block_size if n >= block_size else max(16, n)
    si = bytearray()
    si += struct.pack(">HH", rep_bs, rep_bs)
    si += b"\x00\x00\x00" * 2
    packed = (sample_rate << 44) | ((nch - 1) << 41) | ((16 - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # md5 unset
    header = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    frames = bytearray()
    for fi, start in enumerate(range(0, n, block_size)):
        blk = a[start : start + block_size]
        bs = blk.shape[0]
        hdr = _BitWriter()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)  # reserved
        hdr.put(0, 1)  # fixed blocksize strategy
        hdr.put(0b0111, 4)   # blocksize: 16-bit value at end of header
        hdr.put(0b0000, 4)   # sample rate: from STREAMINFO
        hdr.put(nch - 1, 4)  # independent channels
        hdr.put(0b100, 3)    # 16 bps
        hdr.put(0, 1)        # reserved
        hdr.align()
        head = bytes(hdr.out) + _utf8_number(fi) + struct.pack(">H", bs - 1)
        head += bytes([_crc8(head)])

        body = _BitWriter()
        for ch in range(nch):
            s = blk[:, ch]
            if bool((s == s[0]).all()) and not verbatim:
                body.put(0, 1)
                body.put(0, 6)  # CONSTANT
                body.put(0, 1)
                body.put(int(s[0]), 16)
            elif verbatim or bs < 2:
                body.put(0, 1)
                body.put(1, 6)  # VERBATIM
                body.put(0, 1)
                for v in s:
                    body.put(int(v), 16)
            else:
                body.put(0, 1)
                body.put(8 | 1, 6)  # FIXED order 1
                body.put(0, 1)
                body.put(int(s[0]), 16)  # warm-up
                res = np.diff(s)
                mean = max(1.0, float(np.abs(res).mean()))
                k = min(14, max(0, int(mean).bit_length()))
                body.put(0, 2)   # rice method (4-bit params)
                body.put(0, 4)   # partition order 0
                body.put(k, 4)
                for e in res:
                    u = _zigzag(int(e))
                    body.put_unary(u >> k)
                    if k:
                        body.put(u, k)
        body.align()
        payload = head + bytes(body.out)
        frames += payload + struct.pack(">H", _crc16(payload))
    return header + bytes(frames)


def decode_flac(payload: bytes):
    """FLAC bytes → (sample_rate, n_channels, float64 mono mix in
    [-1, 1]) — the same contract as the WAV decoder — or None when the
    payload is not decodable FLAC."""
    import numpy as np

    if not payload or payload[:4] != b"fLaC":
        return None
    try:
        i = 4
        rate = nch = bps = None
        total = 0
        while True:
            hdr = payload[i]
            btype = hdr & 0x7F
            blen = int.from_bytes(payload[i + 1 : i + 4], "big")
            if btype == 0:  # STREAMINFO
                si = payload[i + 4 : i + 4 + blen]
                packed = int.from_bytes(si[10:18], "big")
                rate = packed >> 44
                nch = ((packed >> 41) & 0x7) + 1
                bps = ((packed >> 36) & 0x1F) + 1
                total = packed & ((1 << 36) - 1)
            i += 4 + blen
            if hdr & 0x80:
                break
        if rate is None or rate == 0:
            return None

        chunks = []
        while i < len(payload) - 2:
            br = _BitReader(payload, i)
            sync = br.bits(14)
            if sync != 0b11111111111110:
                return None
            br.bits(1)
            br.bits(1)  # blocksize strategy
            bs_code = br.bits(4)
            sr_code = br.bits(4)
            ch_code = br.bits(4)
            bps_code = br.bits(3)
            br.bits(1)
            _read_utf8_number(br)
            if bs_code == 6:
                bs = br.bits(8) + 1
            elif bs_code == 7:
                bs = br.bits(16) + 1
            elif bs_code == 1:
                bs = 192
            elif 2 <= bs_code <= 5:
                bs = 576 << (bs_code - 2)
            elif 8 <= bs_code <= 15:
                bs = 256 << (bs_code - 8)
            else:
                return None
            if sr_code == 12:
                br.bits(8)
            elif sr_code in (13, 14):
                br.bits(16)
            fbps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[bps_code]
            crc_end = br.byte_pos()
            if _crc8(payload[i:crc_end]) != br.bits(8):
                return None

            if ch_code < 8:
                n_sub = ch_code + 1
                assign = "indep"
            elif ch_code in (8, 9, 10):
                n_sub = 2
                assign = {8: "left", 9: "right", 10: "mid"}[ch_code]
            else:
                return None

            subs = []
            for sub_i in range(n_sub):
                ebps = fbps
                # side channel carries one extra bit
                if (assign == "left" and sub_i == 1) or (
                    assign == "right" and sub_i == 0
                ) or (assign == "mid" and sub_i == 1):
                    ebps += 1
                if br.bits(1):
                    return None
                stype = br.bits(6)
                wasted = 0
                if br.bits(1):
                    wasted = 1 + br.unary()
                    ebps -= wasted
                if stype == 0:
                    vals = np.full(bs, br.signed(ebps), np.int64)
                elif stype == 1:
                    vals = np.array([br.signed(ebps) for _ in range(bs)], np.int64)
                elif 8 <= stype <= 12 or stype >= 32:
                    if stype >= 32:
                        order = (stype & 0x1F) + 1
                        warm = [br.signed(ebps) for _ in range(order)]
                        prec = br.bits(4) + 1
                        if prec == 16:
                            return None
                        shift = br.signed(5)
                        coefs = [br.signed(prec) for _ in range(order)]
                    else:
                        order = stype & 0x7
                        warm = [br.signed(ebps) for _ in range(order)]
                        coefs = _FIXED_COEFS[order]
                        prec = None
                        shift = 0
                    method = br.bits(2)
                    if method > 1:
                        return None
                    pbits = 4 if method == 0 else 5
                    escape = (1 << pbits) - 1
                    porder = br.bits(4)
                    vals = np.empty(bs, np.int64)
                    vals[:order] = warm
                    pos = order
                    n_parts = 1 << porder
                    for p in range(n_parts):
                        cnt = (bs >> porder) - (order if p == 0 else 0)
                        k = br.bits(pbits)
                        if k == escape:
                            raw = br.bits(5)
                            for j in range(cnt):
                                vals[pos + j] = br.signed(raw) if raw else 0
                        else:
                            for j in range(cnt):
                                q = br.unary()
                                u = (q << k) | (br.bits(k) if k else 0)
                                vals[pos + j] = _unzigzag(u)
                        pos += cnt
                    # run the predictor over the residuals
                    for j in range(order, bs):
                        acc = 0
                        for ci, cf in enumerate(coefs):
                            acc += cf * int(vals[j - 1 - ci])
                        vals[j] += acc >> shift if stype >= 32 else acc
                else:
                    return None
                if wasted:
                    vals = vals << wasted
                subs.append(vals)

            if assign == "indep":
                chans = subs
            elif assign == "left":
                left = subs[0]
                chans = [left, left - subs[1]]
            elif assign == "right":
                right = subs[1]
                chans = [right + subs[0], right]
            else:  # mid/side
                side = subs[1]
                mid2 = (subs[0] << 1) | (side & 1)
                chans = [(mid2 + side) >> 1, (mid2 - side) >> 1]

            br.align()
            fpos = br.byte_pos()
            if _crc16(payload[i:fpos]) != int.from_bytes(
                payload[fpos : fpos + 2], "big"
            ):
                return None
            i = fpos + 2
            chunks.append(np.stack(chans, axis=1))

        if not chunks:
            return None
        pcm = np.concatenate(chunks, axis=0)
        if total:
            pcm = pcm[:total]
        mono = pcm.mean(axis=1) / float(1 << (fbps - 1))
        return rate, (nch or pcm.shape[1]), mono
    except (ValueError, IndexError, KeyError):
        return None
