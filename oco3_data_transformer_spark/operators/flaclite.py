"""Pure-python FLAC codec subset for the multimodal audio decode path.

FLAC is the dominant *lossless* audio codec in public speech/music corpora
(LibriSpeech distributes .flac); no audio library is importable in this
container, so — exactly like the JPEG (operators/jpeglite.py), PNG
(operators/multimodal.py), HDF5 (sources/hdf5lite.py) and Zarr
(sinks/zarrlite.py) codecs — this implements the subset of the public
FLAC format specification (RFC 9639 / xiph.org format spec) real files
use:

  decode — STREAMINFO parsing, all metadata blocks skipped, fixed and
    variable blocking, UTF-8-coded frame/sample numbers, block-size and
    sample-rate-at-end-of-header codes, CRC-8 header and CRC-16 frame
    verification, subframe types CONSTANT / VERBATIM / FIXED (orders
    0-4) / LPC (any order, quantized coefficients + shift), wasted bits,
    Rice and Rice2 residual partitions incl. the escape (raw) code, and
    all four channel assignments (independent, left/side, right/side,
    mid/side); 8/16/24-bit samples.

  encode — canonical lossless subset: fixed 4096-sample blocks,
    independent channels, per-block best-of FIXED order 0-2 predictor,
    single-partition Rice residuals with the standard mean-based
    parameter estimate, CRC-8/CRC-16 exactly per spec.  Decode(encode(x))
    == x bit-exactly — FLAC is lossless, so the round-trip is an exact
    oracle (unlike the JPEG codec's bounded-error one).

Out of scope, raising clearly: bps other than 8/16/24 on encode,
Ogg-encapsulated FLAC.  The MD5 field in STREAMINFO is written as zeros
("unavailable" per spec) and not verified on decode.
"""

from __future__ import annotations

import struct

import numpy as np

_SYNC = 0b11111111111110

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


_CRC16_TABLE = None


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — the whole-frame CRC."""
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        tbl = []
        for i in range(256):
            crc = i << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            tbl.append(crc)
        _CRC16_TABLE = tbl
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


class _Bits:
    """MSB-first bit reader over bytes, tracking byte position."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position of the NEXT unread byte
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("FLAC truncated (bitstream past EOF)")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


class _BitW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


def _utf8_number(br: _Bits) -> int:
    """The frame header's UTF-8-style coded number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("FLAC bad UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c >> 6 != 0b10:
            raise ValueError("FLAC bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(w: _BitW, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    payload = []
    n = 1
    while True:
        total_bits = 6 * n + (6 - n)
        if v < (1 << total_bits) and n <= 6:
            break
        n += 1
    for _ in range(n):
        payload.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF << (7 - n)) & 0xFF | v
    w.write(lead, 8)
    for b in reversed(payload):
        w.write(b, 8)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_residual(br: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    n_part = 1 << po
    if blocksize % n_part:
        raise ValueError("FLAC partition order does not divide block size")
    if n_part > 1 and (blocksize >> po) <= order:
        raise ValueError("FLAC first partition shorter than predictor order")
    out = np.empty(blocksize - order, np.int64)
    idx = 0
    for p in range(n_part):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[idx + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = br.unary()
                u = (q << param) | br.read(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)  # zigzag
        idx += n
    return out


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(bps), np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(blocksize)], np.int64)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            acc = res[i - order]
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out[i] = acc
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * int(out[i - 1 - j])
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"FLAC reserved subframe type {t}")
    if wasted:
        out = out << wasted
    return out


def flac_decode(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC payload → ((n_samples, channels) int32, sample_rate,
    bits_per_sample).  CRC-8 and CRC-16 are verified per frame."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC truncated (metadata)")
        hdr = payload[pos]
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + ln]
        if (hdr & 0x7F) == 0:  # STREAMINFO
            if len(body) != 34:
                raise ValueError("FLAC bad STREAMINFO length")
            b = _Bits(body)
            b.read(16)  # min block
            b.read(16)  # max block
            b.read(24)  # min frame
            b.read(24)  # max frame
            rate = b.read(20)
            ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            streaminfo = {"rate": rate, "ch": ch, "bps": bps, "total": total}
        pos += 4 + ln
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")

    chans: list[list[np.ndarray]] = [[] for _ in range(streaminfo["ch"])]
    total = streaminfo["total"]  # 0 = unknown: decode to EOF
    n_out = 0
    while pos < len(payload) and (total == 0 or n_out < total):
        frame_start = pos
        br = _Bits(payload, pos)
        if br.read(14) != _SYNC:
            raise ValueError("FLAC lost frame sync")
        if br.read(1):
            raise ValueError("FLAC reserved sync bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC reserved header bit set")
        _utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC reserved block size code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC invalid sample rate code")
        bps = streaminfo["bps"] if ss_code == 0 else _SAMPLE_SIZES[ss_code]
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        if br.n:
            raise ValueError("FLAC header not byte-aligned at CRC")
        if _crc8(payload[frame_start : br.pos]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ca <= 7:
            n_ch = ca + 1
            sub_bps = [bps] * n_ch
        elif ca in (8, 9, 10):
            n_ch = 2
            side_idx = 1 if ca in (8, 10) else 0
            sub_bps = [bps + (1 if i == side_idx else 0) for i in range(2)]
        else:
            raise ValueError(f"FLAC reserved channel assignment {ca}")
        if n_ch != streaminfo["ch"]:
            raise ValueError("FLAC frame channel count != STREAMINFO")

        subs = [_read_subframe(br, blocksize, sub_bps[i]) for i in range(n_ch)]
        br.align()
        crc_expect = _crc16(payload[frame_start : br.pos])
        if crc_expect != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.pos

        if ca == 8:  # left/side: right = left - side
            left, side = subs
            subs = [left, left - side]
        elif ca == 9:  # right/side: left = right + side
            side, right = subs
            subs = [right + side, right]
        elif ca == 10:  # mid/side
            mid, side = subs
            t = (mid << 1) | (side & 1)
            subs = [(t + side) >> 1, (t - side) >> 1]
        for c in range(len(subs)):
            chans[c].append(subs[c])
        n_out += blocksize

    arr = np.stack([np.concatenate(c) for c in chans], axis=1)
    if total:
        arr = arr[:total]
    return arr.astype(np.int32), streaminfo["rate"], streaminfo["bps"]


# ---------------------------------------------------------------------------
# encoder (lossless subset: FIXED 0-2, independent channels)
# ---------------------------------------------------------------------------

def _rice_param(res: np.ndarray) -> int:
    """Standard mean-based Rice parameter estimate."""
    if not len(res):
        return 0
    mean = float(np.mean(np.abs(res)))
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _write_residual(w: _BitW, res: np.ndarray) -> None:
    w.write(0, 2)  # rice method 0 (4-bit params)
    w.write(0, 4)  # partition order 0: one partition
    param = _rice_param(res)
    w.write(param, 4)
    for v in res:
        v = int(v)
        u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
        q = u >> param
        if q > 1 << 16:  # pathological residual: unary blow-up guard
            raise ValueError("FLAC encoder rice overflow (raise bps?)")
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def flac_encode(samples: np.ndarray, sample_rate: int, bps: int = 16) -> bytes:
    """Encode (n_samples[, channels]) integer PCM losslessly: fixed
    4096-sample blocks, independent channels, best FIXED predictor of
    order 0-2 per subframe, single-partition Rice residuals."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    if bps not in (8, 16, 24):
        raise ValueError("flac_encode: bps must be 8/16/24")
    lim = 1 << (bps - 1)
    if x.min(initial=0) < -lim or x.max(initial=0) >= lim:
        raise ValueError(f"flac_encode: samples out of int{bps} range")
    n, ch = x.shape
    if not 1 <= ch <= 8:
        raise ValueError("flac_encode: 1-8 channels")
    x = x.astype(np.int64)

    out = bytearray(b"fLaC")
    block = 4096
    si = _BitW()
    si.write(min(block, max(n, 16)), 16)  # min block size
    si.write(min(block, max(n, 16)), 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # MD5 unavailable
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fi, start in enumerate(range(0, n, block)):
        blk = x[start : start + block]
        bsz = blk.shape[0]
        w = _BitW()
        w.write(_SYNC, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize stream
        w.write(7, 4)  # block size: 16-bit at end of header
        sr_code = 13 if sample_rate < 65536 else 14
        w.write(sr_code, 4)
        w.write(ch - 1, 4)  # independent channels
        ss_code = {8: 1, 16: 4, 24: 6}[bps]
        w.write(ss_code, 3)
        w.write(0, 1)
        _write_utf8_number(w, fi)
        w.write(bsz - 1, 16)
        w.write(sample_rate if sr_code == 13 else sample_rate // 10, 16)
        hdr = w.bytes()
        hdr += bytes([_crc8(hdr)])

        sw = _BitW()
        for c in range(ch):
            col = blk[:, c]
            max_order = min(2, bsz - 1)
            best, best_cost = 0, None
            for order in range(max_order + 1):
                res = _fixed_residual(col, order)
                cost = float(np.sum(np.abs(res))) if len(res) else 0.0
                if best_cost is None or cost < best_cost:
                    best, best_cost = order, cost
            if bsz >= 1 and np.all(col == col[0]):
                sw.write(0, 1)
                sw.write(0, 6)  # CONSTANT
                sw.write(0, 1)
                sw.write(int(col[0]) & ((1 << bps) - 1), bps)
                continue
            sw.write(0, 1)
            sw.write(8 + best, 6)  # FIXED order
            sw.write(0, 1)  # no wasted bits
            for i in range(best):
                sw.write(int(col[i]) & ((1 << bps) - 1), bps)
            _write_residual(sw, _fixed_residual(col, best))
        frame = hdr + sw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
