"""From-spec FLAC codec (operators/flaclite.py): exact lossless
round-trips (the oracle — FLAC is lossless), container/STREAMINFO byte
goldens, handcrafted streams for the decode paths the in-repo encoder
never emits (LPC, all channel decorrelations, Rice2, escape partitions,
multi-partition residuals, wasted bits), CRC tamper detection, and a
skip-gated differential against soundfile when importable."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oco3_data_transformer_spark.operators import flaclite as FL


def _rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------------------
# round-trips (exact: FLAC is lossless)
# ---------------------------------------------------------------------------


def test_roundtrip_exact_across_shapes_and_depths():
    rng = _rng()
    cases = [(5000, 1, 16), (9000, 2, 16), (100, 1, 8), (4097, 2, 24),
             (1, 1, 16), (4096, 3, 16)]
    for n, ch, bps in cases:
        lim = 1 << (bps - 1)
        base = np.cumsum(rng.integers(-50, 51, size=(n, ch)), axis=0)
        x = np.clip(base, -lim, lim - 1).astype(np.int64)
        dec, rate, b2 = FL.flac_decode(FL.flac_encode(x, 16000, bps=bps))
        assert rate == 16000 and b2 == bps
        assert np.array_equal(dec, x), (n, ch, bps)


def test_compresses_and_constant_collapses():
    rng = _rng()
    x = np.clip(np.cumsum(rng.integers(-20, 21, size=(20000, 1))), -32768, 32767)
    enc = FL.flac_encode(x, 8000)
    assert len(enc) < 0.6 * x.size * 2  # predictors + rice actually compress
    c = np.full((5000, 2), -123)
    enc_c = FL.flac_encode(c, 8000)
    assert len(enc_c) < 200  # CONSTANT subframes
    assert np.array_equal(FL.flac_decode(enc_c)[0], c)


def test_range_and_bps_validation():
    with pytest.raises(ValueError, match="range"):
        FL.flac_encode(np.array([40000]), 8000, bps=16)
    with pytest.raises(ValueError, match="bps"):
        FL.flac_encode(np.array([1]), 8000, bps=12)


# ---------------------------------------------------------------------------
# container goldens
# ---------------------------------------------------------------------------


def test_streaminfo_golden():
    x = np.arange(-100, 100)[:, None]
    enc = FL.flac_encode(x, 44100, bps=16)
    assert enc[:4] == b"fLaC"
    assert enc[4] == 0x80  # last-metadata flag + type 0 (STREAMINFO)
    (ln,) = struct.unpack(">I", b"\x00" + enc[5:8])
    assert ln == 34
    b = FL._Bits(enc[8 : 8 + 34])
    assert b.read(16) >= 16  # min block size floor per spec
    b.read(16), b.read(24), b.read(24)
    assert b.read(20) == 44100
    assert b.read(3) + 1 == 1  # channels
    assert b.read(5) + 1 == 16  # bps
    assert b.read(36) == 200  # total samples
    # first frame sync: 0xFF 0xF8 (14-bit sync + 0 + fixed-blocksize bit)
    assert enc[8 + 34] == 0xFF and enc[8 + 35] == 0xF8


# ---------------------------------------------------------------------------
# handcrafted streams: decode paths the encoder never emits
# ---------------------------------------------------------------------------


def _stream(blocksize, ca, n_ch, bps, write_subframes, rate=8000):
    """Assemble fLaC + STREAMINFO + ONE frame whose subframe bits come
    from ``write_subframes(sw)``."""
    si = FL._BitW()
    si.write(max(blocksize, 16), 16)
    si.write(max(blocksize, 16), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(blocksize, 36)
    out = bytearray(b"fLaC")
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    w = FL._BitW()
    w.write(FL._SYNC, 14)
    w.write(0, 2)
    w.write(7, 4)  # 16-bit blocksize at end
    w.write(13, 4)  # 16-bit rate at end
    w.write(ca, 4)
    w.write({8: 1, 16: 4, 24: 6}[bps], 3)
    w.write(0, 1)
    FL._write_utf8_number(w, 0)
    w.write(blocksize - 1, 16)
    w.write(rate, 16)
    hdr = w.bytes()
    hdr += bytes([FL._crc8(hdr)])
    sw = FL._BitW()
    write_subframes(sw)
    frame = hdr + sw.bytes()
    frame += struct.pack(">H", FL._crc16(frame))
    return bytes(out + frame)


def _verbatim(sw, vals, bps):
    sw.write(0, 1)
    sw.write(1, 6)  # VERBATIM
    sw.write(0, 1)
    for v in vals:
        sw.write(int(v) & ((1 << bps) - 1), bps)


def test_lpc_subframe_decodes():
    """LPC order 1, coef 1, shift 0 → s[i] = s[i-1] + res[i]."""
    res = [3, -2, 5, 0, -7]
    warm = 100

    def subs(sw):
        sw.write(0, 1)
        sw.write(32, 6)  # LPC order (t & 31) + 1 = 1
        sw.write(0, 1)
        sw.write(warm & 0xFFFF, 16)
        sw.write(3, 4)   # precision-1 → 4 bits
        sw.write(0, 5)   # shift 0
        sw.write(1, 4)   # coefficient +1
        sw.write(0, 2)   # rice method 0
        sw.write(0, 4)   # partition order 0
        sw.write(4, 4)   # rice param 4
        for v in res:
            u = (abs(v) << 1) - (1 if v < 0 else 0)
            for _ in range(u >> 4):
                sw.write(0, 1)
            sw.write(1, 1)
            sw.write(u & 15, 4)

    enc = _stream(6, 0, 1, 16, subs)
    got, rate, _ = FL.flac_decode(enc)
    want = np.cumsum([warm] + res)
    assert list(got[:, 0]) == list(want)


@pytest.mark.parametrize("ca", [8, 9, 10])
def test_channel_decorrelation_modes(ca):
    """left/side (8), right/side (9), mid/side (10) reconstruct the same
    stereo signal from VERBATIM-coded decorrelated channels."""
    rng = _rng()
    left = rng.integers(-1000, 1000, 8)
    right = rng.integers(-1000, 1000, 8)
    side = left - right

    def subs(sw):
        if ca == 8:
            _verbatim(sw, left, 16)
            _verbatim(sw, side, 17)  # side carries +1 bit
        elif ca == 9:
            _verbatim(sw, side, 17)
            _verbatim(sw, right, 16)
        else:
            mid = (left + right) >> 1
            _verbatim(sw, mid, 16)
            _verbatim(sw, side, 17)

    got, _, _ = FL.flac_decode(_stream(8, ca, 2, 16, subs))
    assert np.array_equal(got[:, 0], left) and np.array_equal(got[:, 1], right)


def test_rice2_escape_and_partitions():
    """Residual variants: Rice2 (5-bit params), the escape (raw) code,
    and a partition order of 1 — in one FIXED order-0 subframe each."""
    vals = [5, -6, 120, -121, 30, -1, 0, 7]

    def subs_rice2(sw):
        sw.write(0, 1)
        sw.write(8, 6)  # FIXED order 0
        sw.write(0, 1)
        sw.write(1, 2)  # rice method 1: 5-bit params
        sw.write(0, 4)
        sw.write(5, 5)  # param 5
        for v in vals:
            u = (abs(v) << 1) - (1 if v < 0 else 0)
            for _ in range(u >> 5):
                sw.write(0, 1)
            sw.write(1, 1)
            sw.write(u & 31, 5)

    got, _, _ = FL.flac_decode(_stream(8, 0, 1, 16, subs_rice2))
    assert list(got[:, 0]) == vals

    def subs_escape(sw):
        sw.write(0, 1)
        sw.write(8, 6)
        sw.write(0, 1)
        sw.write(0, 2)
        sw.write(0, 4)
        sw.write(15, 4)  # escape
        sw.write(9, 5)   # raw 9-bit residuals
        for v in vals:
            sw.write(int(v) & 0x1FF, 9)

    got, _, _ = FL.flac_decode(_stream(8, 0, 1, 16, subs_escape))
    assert list(got[:, 0]) == vals

    def subs_parts(sw):
        sw.write(0, 1)
        sw.write(8, 6)
        sw.write(0, 1)
        sw.write(0, 2)
        sw.write(1, 4)  # partition order 1: two partitions of 4
        for half in (vals[:4], vals[4:]):
            sw.write(15, 4)  # escape both halves, raw 9 bits
            sw.write(9, 5)
            for v in half:
                sw.write(int(v) & 0x1FF, 9)

    got, _, _ = FL.flac_decode(_stream(8, 0, 1, 16, subs_parts))
    assert list(got[:, 0]) == vals


def test_wasted_bits():
    """wasted-bits flag: samples stored >>1 at bps-1, shifted back."""
    vals = [2, -4, 8, 100, -50, 0]

    def subs(sw):
        sw.write(0, 1)
        sw.write(1, 6)  # VERBATIM
        sw.write(1, 1)  # wasted-bits flag
        sw.write(1, 1)  # unary 0 → wasted = 1 + 0 = 1
        for v in vals:
            sw.write((int(v) >> 1) & 0x7FFF, 15)

    got, _, _ = FL.flac_decode(_stream(6, 0, 1, 16, subs))
    assert list(got[:, 0]) == vals


def test_crc_tamper_and_rejects():
    x = np.arange(100)[:, None]
    enc = bytearray(FL.flac_encode(x, 8000))
    enc[-1] ^= 0xFF  # corrupt the frame CRC-16 itself → must be caught
    with pytest.raises(ValueError, match="CRC"):
        FL.flac_decode(bytes(enc))
    enc[-1] ^= 0xFF
    # header CRC-8 byte: 4 fLaC + 4 metadata header + 34 STREAMINFO, then
    # 4 (sync..reserved) + 1 (utf8 frame 0) + 2 (blocksize) + 2 (rate)
    hdr_crc = 4 + 4 + 34 + 4 + 1 + 2 + 2
    enc[hdr_crc] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8"):
        FL.flac_decode(bytes(enc))
    with pytest.raises(ValueError, match="fLaC"):
        FL.flac_decode(b"RIFFxxxx")
    with pytest.raises(ValueError, match="truncated|Truncated|EOF"):
        FL.flac_decode(FL.flac_encode(x, 8000)[:-10])


def test_multimodal_dispatch_and_features(spark):
    """codec='flac' decodes wheel-free in the Spark feature pass."""
    from oco3_data_transformer_spark.operators import multimodal as M

    rng = _rng()
    rows = []
    for i in range(3):
        x = np.clip(
            np.cumsum(rng.integers(-200, 201, size=(800, 1))), -32768, 32767
        )
        rows.append((i, "flac", 8000, 1, bytearray(FL.flac_encode(x, 8000))))
    df = spark.createDataFrame(rows, M.AUDIO_SCHEMA)
    out = {r.item_id: r for r in M.audio_features(df).collect()}
    assert len(out) == 3
    assert all(out[i].duration_s == pytest.approx(0.1) for i in out)
    assert all(0 <= out[i].peak <= 1.0 for i in out)


def test_differential_against_soundfile():
    """Skip-gated: soundfile must decode our FLAC bit-exactly, and we
    must decode soundfile's FLAC bit-exactly."""
    sf = pytest.importorskip("soundfile")
    import io

    rng = _rng()
    x = np.clip(
        np.cumsum(rng.integers(-100, 101, size=(5000, 2)), axis=0),
        -32768, 32767,
    ).astype(np.int16)
    theirs_dec, sr = sf.read(io.BytesIO(FL.flac_encode(x, 16000)), dtype="int16")
    assert sr == 16000 and np.array_equal(theirs_dec, x)

    buf = io.BytesIO()
    sf.write(buf, x, 16000, format="FLAC", subtype="PCM_16")
    ours, rate, bps = FL.flac_decode(buf.getvalue())
    assert rate == 16000 and bps == 16
    assert np.array_equal(ours, x.astype(np.int32))
