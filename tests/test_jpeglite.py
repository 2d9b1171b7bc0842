"""From-spec baseline JPEG codec (operators/jpeglite.py): marker-level
spec goldens, exactness properties, bounded-error round-trips, restart
markers, and a skip-gated PIL differential.

JPEG is lossy, so 'round-trip equals input' is the wrong oracle except
in the two cases where the math makes it (near-)exact: quality 100
scales the Annex K quantization tables to all-ones (the only remaining
loss is float DCT rounding), and flat blocks are DC-only.  Everything
else is bounded-error, with the bound derived from the quantization
step actually in force.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oco3_data_transformer_spark.operators import jpeglite as J


def _rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# spec goldens
# ---------------------------------------------------------------------------


def test_marker_structure_golden():
    """Byte-level container facts straight from T.81/JFIF: SOI first,
    EOI last, APP0 'JFIF\\0', SOF0 carries precision 8 + dims, SOS is
    0/63/0 for baseline, DQT is written in zigzag order."""
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = J.jpeg_encode(a, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    sof = data.find(b"\xff\xc0")
    assert sof > 0
    prec, h, w, ncomp = struct.unpack_from(">BHHB", data, sof + 4)
    assert (prec, h, w, ncomp) == (8, 8, 8, 1)
    sos = data.find(b"\xff\xda")
    ns = data[sos + 4]
    assert ns == 1
    assert data[sos + 5 + 2 * ns : sos + 8 + 2 * ns] == bytes([0, 63, 0])
    # DQT zigzag order: first two entries are Q[0,0], Q[0,1] of the
    # IJG-scaled (quality 90 -> scale 20) Annex K luma table
    dqt = data.find(b"\xff\xdb")
    q00 = (16 * 20 + 50) // 100
    q01 = (11 * 20 + 50) // 100
    assert data[dqt + 5] == q00 and data[dqt + 6] == q01


def test_quality_100_scales_tables_to_ones():
    t = J._ijg_scale(J.QUANT_LUMA, 100)
    assert np.all(t == 1)
    assert np.all(J._ijg_scale(J.QUANT_CHROMA, 100) == 1)
    # quality 50 leaves the Annex K tables unchanged
    assert np.array_equal(J._ijg_scale(J.QUANT_LUMA, 50), J.QUANT_LUMA)


def test_huffman_canonical_assignment():
    """Annex C canonical codes: the DC luma table's first code is two
    bits of zeros, and all 12 symbols get distinct prefix-free codes."""
    codes = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    assert codes[0] == (0b00, 2)
    assert len(codes) == 12
    bitstrings = {format(c, f"0{n}b") for c, n in codes.values()}
    assert len(bitstrings) == 12
    for s in bitstrings:  # prefix-free
        assert not any(t != s and t.startswith(s) for t in bitstrings)


# ---------------------------------------------------------------------------
# exactness + bounded-error round-trips
# ---------------------------------------------------------------------------


def test_flat_blocks_are_exact_at_q100():
    for val in (0, 37, 128, 255):
        a = np.full((8, 8), val, np.uint8)
        got = J.jpeg_decode(J.jpeg_encode(a, quality=100))
        assert got.shape == (8, 8, 1)
        assert np.all(got[:, :, 0] == val)


def test_flat_blocks_within_one_at_any_quality():
    for q in (30, 50, 75, 90):
        a = np.full((16, 24), 37, np.uint8)
        got = J.jpeg_decode(J.jpeg_encode(a, quality=q))[:, :, 0]
        assert np.abs(got.astype(int) - 37).max() <= 1


def test_gray_q100_roundtrip_is_near_lossless():
    a = _rng().integers(0, 256, size=(33, 29)).astype(np.uint8)
    got = J.jpeg_decode(J.jpeg_encode(a, quality=100))[:, :, 0]
    assert np.abs(got.astype(int) - a.astype(int)).max() <= 1


def test_rgb_q100_roundtrip_bounded_by_colorspace():
    a = _rng().integers(0, 256, size=(24, 17, 3)).astype(np.uint8)
    got = J.jpeg_decode(J.jpeg_encode(a, quality=100))
    # YCbCr forward/inverse rounding adds up to ~3 LSB
    assert np.abs(got.astype(int) - a.astype(int)).max() <= 3


def test_420_subsampling_decodes():
    x = np.linspace(0, 255, 64)
    a = np.repeat(x[None, :, None], 64, 0).astype(np.uint8)
    a = np.concatenate([a, a, a], axis=2)
    enc = J.jpeg_encode(a, quality=95, subsampling="4:2:0")
    # SOF0 must record 2x2 luma sampling
    sof = enc.find(b"\xff\xc0")
    assert enc[sof + 11] == 0x22  # comp 1 h=2 v=2
    got = J.jpeg_decode(enc)
    assert np.abs(got.astype(int) - a.astype(int)).max() <= 8
    # flat color: chroma pooling loses nothing
    a = np.full((20, 22, 3), (200, 30, 90), np.uint8)
    got = J.jpeg_decode(J.jpeg_encode(a, quality=75, subsampling="4:2:0"))
    assert np.abs(got.astype(int) - a.astype(int)).max() <= 2


def test_odd_dimensions_and_psnr():
    rng = _rng()
    a = (np.cumsum(rng.normal(size=(61, 47, 3)), axis=0) * 10 + 128).clip(
        0, 255
    ).astype(np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(a, quality=85))
    assert dec.shape == a.shape
    mse = np.mean((dec.astype(float) - a.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > 28


def test_restart_markers_roundtrip():
    rng = _rng()
    a = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    enc = J.jpeg_encode(a, quality=100, restart_interval=2)
    # DRI golden + RST0 actually present in the stream
    dri = enc.find(b"\xff\xdd")
    assert dri > 0 and struct.unpack_from(">H", enc, dri + 4)[0] == 2
    assert b"\xff\xd0" in enc[dri:]
    got = J.jpeg_decode(enc)[:, :, 0]
    assert np.abs(got.astype(int) - a.astype(int)).max() <= 1


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_decode_equals_baseline_decode():
    """The progressive script encodes the same quantized coefficients as
    the baseline encoder, so the two decodes must be bit-identical."""
    rng = _rng()
    cases = [
        ((16, 16), "4:4:4"),
        ((33, 29, 3), "4:4:4"),
        ((40, 24, 3), "4:2:0"),
        ((8, 8), "4:4:4"),
    ]
    for shape, sub in cases:
        a = rng.integers(0, 256, size=shape).astype(np.uint8)
        for q in (50, 90, 100):
            base = J.jpeg_decode(J.jpeg_encode(a, quality=q, subsampling=sub))
            prog = J.jpeg_decode(
                J.jpeg_encode_progressive(a, quality=q, subsampling=sub)
            )
            assert np.array_equal(base, prog), (shape, sub, q)


def test_progressive_marker_structure():
    """SOF2 frame, four scan phases (1 DC first + N AC first + 1 DC
    refine + N AC refine), and the scan-header golden for each phase."""
    a = _rng().integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    enc = J.jpeg_encode_progressive(a, quality=90)
    assert enc.find(b"\xff\xc0") == -1 and enc.find(b"\xff\xc2") > 0
    # collect every SOS header's (ns, Ss, Se, Ah, Al)
    headers = []
    p = 0
    while True:
        p = enc.find(b"\xff\xda", p)
        if p < 0:
            break
        ns = enc[p + 4]
        ss, se, aa = enc[p + 5 + 2 * ns : p + 8 + 2 * ns]
        headers.append((ns, ss, se, aa >> 4, aa & 15))
        p += 2
    assert headers[0] == (3, 0, 0, 0, 1)       # DC first, interleaved
    assert headers[1:4] == [(1, 1, 63, 0, 1)] * 3   # AC first per comp
    assert headers[4] == (3, 0, 0, 1, 0)       # DC refinement
    assert headers[5:8] == [(1, 1, 63, 1, 0)] * 3   # AC refinement


def test_progressive_spectral_bands():
    """Splitting the AC range over several scans changes the bitstream
    but not the decode; non-tiling bands are rejected."""
    a = _rng().integers(0, 256, size=(24, 31)).astype(np.uint8)
    whole = J.jpeg_decode(J.jpeg_encode_progressive(a, quality=80))
    split = J.jpeg_decode(
        J.jpeg_encode_progressive(a, quality=80, bands=((1, 5), (6, 20), (21, 63)))
    )
    assert np.array_equal(whole, split)
    with pytest.raises(ValueError, match="tile"):
        J.jpeg_encode_progressive(a, bands=((1, 5), (7, 63)))
    with pytest.raises(ValueError, match="tile"):
        J.jpeg_encode_progressive(a, bands=((2, 63),))


def _minimal_progressive(dc_vals, dri=0, eob_run=False):
    """Handcraft a 1-component 8x(8*len(dc_vals)) SOF2 stream at Q=1
    (all-ones DQT) whose blocks are DC-only: DC-first scan + AC-first
    scan.  ``dri`` inserts RST0 every ``dri`` MCUs; ``eob_run`` codes
    the AC scan's all-zero blocks as one EOBn>1 run via a custom DHT
    (the Annex K tables carry no EOBn>1 symbols)."""
    n = len(dc_vals)
    dcc = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    # custom AC table: symbols EOB0 (0x00) and EOB1 (0x10)
    ac_bits = [2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x10]
    acc = J._canonical_codes(ac_bits, ac_vals)

    def dc_scan_bits():
        w = J._BitWriter()
        pred = 0
        for i, d in enumerate(dc_vals):
            if dri and i and i % dri == 0:
                w.restart((i // dri - 1) & 7)
                pred = 0
            diff = d - pred
            pred = d
            s = J._category(diff)
            code, ln = dcc[s]
            w.write(code, ln)
            if s:
                w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        return w.flush()

    def ac_scan_bits():
        w = J._BitWriter()
        i = 0
        while i < n:
            if dri and i and i % dri == 0:
                w.restart((i // dri - 1) & 7)
            run = min(dri, n - i) if dri else n - i
            if eob_run and run > 1:
                # EOB1 covers 2 + (1 extra bit) = 2 or 3 blocks
                cover = min(run, 3)
                code, ln = acc[0x10]
                w.write(code, ln)
                w.write(cover - 2, 1)
                i += cover
                run -= cover
            for _ in range(run):
                code, ln = acc[0x00]
                w.write(code, ln)
                i += 1
        return w.flush()

    out = bytearray(b"\xff\xd8")
    out += J._dqt_segment(0, np.ones((8, 8), np.int64))
    sof = struct.pack(">BHHB", 8, 8, 8 * n, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += J._dht_segment(0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    out += J._dht_segment(1, 0, ac_bits, ac_vals)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos1 = bytes([1, 1, 0x00, 0, 0, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(sos1) + 2) + sos1
    out += dc_scan_bits()
    sos2 = bytes([1, 1, 0x00, 1, 63, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(sos2) + 2) + sos2
    out += ac_scan_bits()
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_eob_run_and_restart_decode():
    """Decode paths the in-repo encoder never emits: EOBn>1 runs (custom
    DHT with the EOB1 symbol) and restart markers inside progressive
    scans.  DC-only blocks at Q=1 decode exactly to clip(dc/8 + 128)."""
    dc_vals = [80, -40, 160, 0]
    expect = [np.clip(round(d / 8) + 128, 0, 255) for d in dc_vals]
    for kwargs in (
        {},                        # plain EOB per block
        {"eob_run": True},         # one EOB1 run covering 4 blocks
        {"dri": 2},                # RST0 between MCU pairs, both scans
        {"dri": 2, "eob_run": True},
    ):
        got = J.jpeg_decode(_minimal_progressive(dc_vals, **kwargs))
        assert got.shape == (8, 32, 1), kwargs
        for i, e in enumerate(expect):
            blk = got[:, 8 * i : 8 * (i + 1), 0]
            assert np.all(blk == e), (kwargs, i)


def test_progressive_differential_against_pil():
    """Skip-gated: our decoder must match PIL's decode of PIL's own
    progressive encode within 1 LSB, and PIL must accept our
    progressive output."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    a = _rng().integers(0, 256, size=(32, 24, 3)).astype(np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(a).save(buf, format="JPEG", quality=90, progressive=True)
    theirs = buf.getvalue()
    got = J.jpeg_decode(theirs)
    ref = np.asarray(PIL_Image.open(io.BytesIO(theirs)).convert("RGB"))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    ours = J.jpeg_encode_progressive(a, quality=90)
    pil_dec = np.asarray(PIL_Image.open(io.BytesIO(ours)).convert("RGB"))
    assert np.abs(pil_dec.astype(int) - a.astype(int)).mean() < 8


# ---------------------------------------------------------------------------
# rejects
# ---------------------------------------------------------------------------


def test_rejects_non_jpeg_arithmetic_and_truncated():
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"not a jpeg")
    a = np.zeros((8, 8), np.uint8)
    enc = bytearray(J.jpeg_encode(a))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="0xC9"):
        J.jpeg_decode(bytes(enc))
    enc[sof + 1] = 0xC2  # SOF2 with a baseline full-band first scan:
    with pytest.raises(ValueError, match="Se=0"):
        J.jpeg_decode(bytes(enc))  # progressive DC scan must have Se=0
    with pytest.raises(ValueError, match="truncated"):
        J.jpeg_decode(J.jpeg_encode(a)[:30])  # cuts mid-DQT
    with pytest.raises(ValueError, match="no scan"):
        J.jpeg_decode(J.jpeg_encode(a)[:20])  # ends cleanly after APP0


# ---------------------------------------------------------------------------
# integration + differential
# ---------------------------------------------------------------------------


def test_decode_image_dispatch_wheel_free():
    from oco3_data_transformer_spark.operators import multimodal as M

    a = _rng().integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    payload = M.encode_image(a, codec="jpeg")
    got = M.decode_image("jpeg", payload, 16, 16, 3)
    assert got.shape == (16, 16, 3)
    assert np.abs(got.astype(int) - a.astype(int)).mean() < 8


def test_image_features_over_jpeg_codec(spark):
    """The mapInPandas feature pass decodes codec='jpeg' blobs wheel-free
    (the Spark-side plumbing is identical to raw/png)."""
    from oco3_data_transformer_spark.operators import multimodal as M

    rng = _rng()
    rows = []
    for i in range(4):
        a = rng.integers(0, 256, size=(6, 8, 3)).astype(np.uint8)
        rows.append((i, "jpeg", 8, 6, 3, bytearray(J.jpeg_encode(a, 95))))
    df = spark.createDataFrame(rows, M.IMAGE_SCHEMA)
    out = M.image_features(df).orderBy("item_id").collect()
    assert len(out) == 4
    assert all(r["width"] == 8 and r["height"] == 6 for r in out)
    assert all(0 <= r["mean_intensity"] <= 255 for r in out)


def test_differential_against_pil():
    """Skip-gated: when PIL is importable, (a) PIL must decode our
    encoder's output with bounded error, (b) our decoder must match
    PIL's decode of PIL's own encode within 1 LSB (same bitstream, two
    independent decoders)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = _rng()
    a = rng.integers(0, 256, size=(32, 24, 3)).astype(np.uint8)
    ours = J.jpeg_encode(a, quality=95)
    pil_dec = np.asarray(PIL_Image.open(io.BytesIO(ours)).convert("RGB"))
    assert np.abs(pil_dec.astype(int) - a.astype(int)).mean() < 8

    buf = io.BytesIO()
    PIL_Image.fromarray(a).save(buf, format="JPEG", quality=95)
    theirs = buf.getvalue()
    got = J.jpeg_decode(theirs)
    ref = np.asarray(PIL_Image.open(io.BytesIO(theirs)).convert("RGB"))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
