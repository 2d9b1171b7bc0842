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
# rejects
# ---------------------------------------------------------------------------


def test_rejects_non_jpeg_progressive_and_truncated():
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"not a jpeg")
    a = np.zeros((8, 8), np.uint8)
    enc = bytearray(J.jpeg_encode(a))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="0xC2"):
        J.jpeg_decode(bytes(enc))
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
