"""blosclite: from-spec blosc1 frame + blosclz codec (VERDICT r08 item 5;
closes zarrlite's last byte-level delta with reference-produced stores,
ref writers/ZarrWriter.py:205 Blosc(cname='blosclz', clevel=9)).

Oracles: decode(encode(x)) == x bit-exact across data shapes / typesizes /
block sizes; byte-level goldens for the frame header and hand-built
blosclz token streams (computed from the published grammar, not from any
library output); skip-gated differentials against real blosc/numcodecs
activate the moment a wheel appears."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oco3_data_transformer_spark.sinks import blosclite as B


def test_frame_header_golden_fields():
    raw = np.arange(512, dtype=np.float64).tobytes()  # 4096 bytes
    f = B.blosc_encode(raw, 8, clevel=9, shuffle=True)
    version, versionlz, flags, typesize, nbytes, bsize, cbytes = (
        struct.unpack_from("<BBBBIII", f, 0)
    )
    assert version == 2 and versionlz == 1
    assert flags & 0x1  # byte-shuffle set
    assert not flags & 0x2  # compressible data: not memcpy'd
    assert flags >> 5 == 0  # compressor code 0 = blosclz
    assert typesize == 8
    assert nbytes == 4096
    assert cbytes == len(f)
    assert bsize == 4096  # single block at this size
    # bstarts: one int32 offset right after the header
    (b0,) = struct.unpack_from("<i", f, 16)
    assert b0 == 20


def test_memcpy_frame_golden():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    f = B.blosc_encode(raw, 1)
    assert f[2] == 0x2  # memcpy flag, no shuffle
    assert f[16:] == raw
    assert len(f) == 16 + 64
    assert B.blosc_decode(f) == raw


def test_blosclz_stream_goldens_decode():
    """Hand-built token streams per the published grammar."""
    # literal run only: token 4 -> 5 literals
    assert B.blosclz_decompress(bytes([4]) + b"hello", 5) == b"hello"
    # first byte's high bits ignored (& 31)
    assert B.blosclz_decompress(bytes([0xE0 | 4]) + b"hello", 5) == b"hello"
    # literals then a short match: len3=3 -> length 5, ofs_hi=0, ofs_lo=2
    # -> distance 3: "abc" + copy 5 from 3 back = "abcabcab"
    s = bytes([2]) + b"abc" + bytes([(3 << 5) | 0, 2])
    assert B.blosclz_decompress(s, 8) == b"abcabcab"
    # RLE via distance 1 (overlapping forward copy): "a" * 10
    s = bytes([0]) + b"a" + bytes([(7 << 5) | 0, 0, 0])
    # long match: len3=7, ext byte 0, ofs_lo 0 -> length 9, distance 1
    assert B.blosclz_decompress(s, 10) == b"a" * 10
    # 255-chained length: ext bytes 255, 1 -> length 6+255+1+3 = 265
    s = bytes([0]) + b"x" + bytes([(7 << 5) | 0, 255, 1, 0])
    assert B.blosclz_decompress(s, 266) == b"x" * 266


def test_blosclz_far_distance_decode():
    """ofs_lo == 255 with ofs_hi == 31<<8 signals the 2-extra-byte far
    form: distance = 8192 + be16."""
    pre = bytes(range(256)) * 40  # 10240 bytes of context
    lit = []
    for i in range(0, len(pre), 32):
        lit.append(bytes([31]) + pre[i : i + 32])
    # far match: distance 8192+100 = 8292, length 5
    tok = bytes([(3 << 5) | 31, 255, 0, 100])
    s = b"".join(lit) + tok
    out = B.blosclz_decompress(s, len(pre) + 5)
    d = 8292
    assert out[: len(pre)] == pre
    assert out[len(pre) :] == pre[len(pre) - d : len(pre) - d + 5]


@pytest.mark.parametrize("typesize", [1, 2, 4, 8, 16])
def test_roundtrip_shapes(typesize):
    rng = np.random.default_rng(typesize)
    for n_elems, gen in [
        (400, lambda n: rng.integers(0, 4, n)),
        (4000, lambda n: np.zeros(n, np.int64)),
        (1000, lambda n: rng.integers(-(2**40), 2**40, n)),
    ]:
        raw = gen(n_elems).astype(np.int64).tobytes()
        raw = raw[: (len(raw) // typesize) * typesize]
        for shuffle in (True, False):
            for bs in (None, 256, 1024):
                f = B.blosc_encode(raw, typesize, shuffle=shuffle,
                                   blocksize=bs)
                assert B.blosc_decode(f) == raw


def test_roundtrip_nan_grid_chunk():
    """The actual payload shape zarr export produces: float64 chunks that
    are mostly NaN fill."""
    rng = np.random.default_rng(7)
    a = np.full((5, 40, 40), np.nan)
    a[2, 10:30, 10:30] = rng.normal(size=(20, 20))
    raw = a.tobytes()
    f = B.blosc_encode(raw, 8)
    assert B.blosc_decode(f) == raw
    assert len(f) < len(raw) * 0.15  # shuffle + LZ crushes NaN fill


def test_roundtrip_fuzz_deterministic():
    rng = np.random.default_rng(99)
    for trial in range(120):
        n = int(rng.integers(1, 5000))
        ts = int(rng.choice([1, 2, 3, 4, 8, 16]))
        kind = rng.random()
        if kind < 0.4:
            raw = bytes(rng.integers(0, 3, n, dtype=np.uint8))
        elif kind < 0.7:
            pat = bytes(rng.integers(0, 256, int(rng.integers(1, 24)),
                                     dtype=np.uint8))
            raw = (pat * (n // len(pat) + 1))[:n]
        else:
            raw = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        f = B.blosc_encode(
            raw, ts, shuffle=bool(rng.random() < 0.5),
            blocksize=[None, 64, 333, 2048][int(rng.integers(0, 4))],
        )
        assert B.blosc_decode(f) == raw, trial


def test_clevel_zero_stores():
    raw = bytes(1000)
    f = B.blosc_encode(raw, 8, clevel=0)
    assert f[2] == 0x2 and B.blosc_decode(f) == raw


def test_foreign_compressor_gate_honest():
    raw = bytes(64)
    f = bytearray(B.blosc_encode(raw, 8, clevel=9, shuffle=False))
    # a compressible all-zero frame: flip compressor code to snappy (2),
    # the one common cname without a system library or a spec path here
    if not f[2] & 0x2:
        f[2] = (f[2] & 0x1F) | (2 << 5)
        with pytest.raises(NotImplementedError, match="snappy"):
            B.blosc_decode(bytes(f))


def test_versionlz_gate_honest():
    """ADVICE r9: a future lz stream-format version must gate, not be
    mis-decoded with the v1 grammar."""
    raw = np.arange(512, dtype=np.float64).tobytes()
    f = bytearray(B.blosc_encode(raw, 8))
    assert not f[2] & 0x2  # compressed frame — versionlz is live
    f[1] = 2
    with pytest.raises(NotImplementedError, match="stream format version 2"):
        B.blosc_decode(bytes(f))
    # memcpy frames carry no lz stream: versionlz is inert there
    m = bytearray(B.blosc_encode(bytes(64), 8, clevel=0))
    m[1] = 7
    assert B.blosc_decode(bytes(m)) == bytes(64)


# --- bit-shuffle decode (VERDICT r09 item 7) ------------------------------

def _bitshuffle_fwd_scalar(buf: bytes, typesize: int) -> bytes:
    """Independent scalar transcription of bitshuffle's published
    ``bshuf_trans_bit_elem`` + c-blosc's leftover rule — a triple-loop
    differential partner for the vectorized numpy inverse."""
    nelem = (len(buf) // typesize) & ~7
    nb = nelem * typesize
    out = bytearray(nb)
    rows = nelem // 8
    for bb in range(typesize):
        for j in range(8):
            for t in range(rows):
                v = 0
                for m in range(8):
                    v |= ((buf[(8 * t + m) * typesize + bb] >> j) & 1) << m
                out[(bb * 8 + j) * rows + t] = v
    return bytes(out) + buf[nb:]


def test_bitunshuffle_hand_golden():
    # 8 one-byte elements [1,0,0,0,0,0,0,0]: only bit-plane 0 has its
    # element-0 bit set -> shuffled = 0x01 then zeros
    assert B._bitunshuffle(bytes([1, 0, 0, 0, 0, 0, 0, 0]), 1) == (
        bytes([1] + [0] * 7)
    )
    # element 5's bit 3 -> plane 3's byte 0, bit 5 (LSB-first packing)
    sh = bytearray(8)
    sh[3] = 1 << 5
    want = bytearray(8)
    want[5] = 1 << 3
    assert B._bitunshuffle(bytes(sh), 1) == bytes(want)
    # typesize 2, 8 elements: byte B=1, bit j=6 of element 2 lives in
    # plane p = 1*8+6, packed bit 2
    sh = bytearray(16)
    sh[(1 * 8 + 6) * 1 + 0] = 1 << 2  # rows = 1 byte per plane
    want = bytearray(16)
    want[2 * 2 + 1] = 1 << 6
    assert B._bitunshuffle(bytes(sh), 2) == bytes(want)


@pytest.mark.parametrize("typesize", [1, 2, 4, 8])
def test_bitunshuffle_inverts_published_transform(typesize):
    rng = np.random.default_rng(typesize)
    for n in (64, 100, 257, 4096):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        sh = _bitshuffle_fwd_scalar(data, typesize)
        assert B._bitunshuffle(sh, typesize) == data
        # leftover rule: tail bytes beyond floor(n/ts)&~7 elements verbatim
        nb = ((n // typesize) & ~7) * typesize
        assert sh[nb:] == data[nb:]


def _hand_frame(codec: int, flags_extra: int, typesize: int,
                raw: bytes, streams_per_block, bsize: int) -> bytes:
    """Assemble a blosc1 frame the way a third-party writer would."""
    nbytes = len(raw)
    nblocks = -(-nbytes // bsize)
    blocks = []
    for j in range(nblocks):
        parts = b""
        for comp, neblock in streams_per_block[j]:
            parts += struct.pack("<i", len(comp)) + comp
        blocks.append(parts)
    total = 16 + 4 * nblocks + sum(len(b) for b in blocks)
    hdr = struct.pack("<BBBBIII", 2, 1, flags_extra | (codec << 5),
                      typesize, nbytes, bsize, total)
    bstarts, pos = [], 16 + 4 * nblocks
    for b in blocks:
        bstarts.append(pos)
        pos += len(b)
    return hdr + struct.pack(f"<{nblocks}i", *bstarts) + b"".join(blocks)


def test_zlib_frame_decode_multiblock_bitshuffle():
    """cname=zlib (stdlib differential — the compressor is the real
    zlib): 2 blocks + a short leftover block, bit-shuffled per block."""
    import zlib

    rng = np.random.default_rng(5)
    raw = rng.integers(0, 4, 2100, dtype=np.uint8).astype("<u4").tobytes()
    ts, bsize = 4, 4096  # blocks of 1024 elements, leftover 52 elems
    streams = []
    for j in range(-(-len(raw) // bsize)):
        block = raw[j * bsize : (j + 1) * bsize]
        sh = _bitshuffle_fwd_scalar(block, ts)
        streams.append([(zlib.compress(sh, 9), len(block))])
    f = _hand_frame(3, 0x4, ts, raw, streams, bsize)
    assert B.blosc_decode(f) == raw


def test_zlib_frame_decode_byteshuffle_and_plain():
    import zlib

    rng = np.random.default_rng(6)
    raw = rng.integers(0, 3, 600, dtype=np.uint8).astype("<f8").tobytes()
    for flags, xform in ((0x1, lambda b: B._shuffle(b, 8)), (0, lambda b: b)):
        sh = xform(raw)
        f = _hand_frame(3, flags, 8, raw, [[(zlib.compress(sh), len(raw))]],
                        len(raw))
        assert B.blosc_decode(f) == raw


def test_lz4_frame_decode_live_differential():
    """cname=lz4 — numcodecs' DEFAULT — with payloads produced by the
    actual system liblz4 (differential-grade: the compressor is the
    real library, only the frame walk + unshuffle are ours)."""
    from oco3_data_transformer_spark.operators import syscodecs

    if not syscodecs.lz4_available():
        pytest.skip("system liblz4 absent (probe logged)")
    rng = np.random.default_rng(7)
    raw = np.repeat(rng.integers(0, 9, 700), 3).astype("<i8").tobytes()
    sh = B._shuffle(raw, 8)
    f = _hand_frame(1, 0x1, 8, raw, [[(syscodecs.lz4_compress(sh), len(raw))]],
                    len(raw))
    assert B.blosc_decode(f) == raw
    # lz4 frames NEVER split under FORWARD_COMPAT even at small
    # typesize/large block — the decoder must recompute nstreams=1
    assert B._split_streams(8, len(raw), False, codec=1) == 1
    assert B._split_streams(8, len(raw), False, codec=0) == 8


def test_zstd_frame_decode_live_differential():
    from oco3_data_transformer_spark.operators import syscodecs

    if not syscodecs.zstd_available():
        pytest.skip("system libzstd absent (probe logged)")
    rng = np.random.default_rng(8)
    a = np.full(3000, np.nan)
    a[50:120] = rng.normal(size=70)
    raw = a.tobytes()
    sh = _bitshuffle_fwd_scalar(raw, 8)
    f = _hand_frame(4, 0x4, 8, raw, [[(syscodecs.zstd_compress(sh), len(raw))]],
                    len(raw))
    assert B.blosc_decode(f) == raw


def test_stored_stream_in_foreign_codec_frame():
    """csize == neblock means stored-raw regardless of compressor code."""
    raw = bytes(range(256))
    f = _hand_frame(4, 0, 1, raw, [[(raw, len(raw))]], len(raw))
    assert B.blosc_decode(f) == raw


# --- differentials: activate when a real blosc build appears -------------

def test_decode_matches_real_blosc():
    blosc = pytest.importorskip("blosc")
    rng = np.random.default_rng(1)
    for ts in (1, 4, 8):
        a = rng.normal(size=2000).astype(np.float64).tobytes()
        theirs = blosc.compress(a, typesize=ts, clevel=9, cname="blosclz",
                                shuffle=blosc.SHUFFLE)
        assert B.blosc_decode(theirs) == a


def test_real_blosc_decodes_our_frames():
    blosc = pytest.importorskip("blosc")
    rng = np.random.default_rng(2)
    a = np.full(4000, np.nan)
    a[100:200] = rng.normal(size=100)
    ours = B.blosc_encode(a.tobytes(), 8)
    assert blosc.decompress(ours) == a.tobytes()


def test_numcodecs_blosc_interop():
    numcodecs = pytest.importorskip("numcodecs")
    codec = numcodecs.Blosc(cname="blosclz", clevel=9,
                            shuffle=numcodecs.Blosc.SHUFFLE)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 5, 3000).astype(np.float64).tobytes()
    assert B.blosc_decode(bytes(codec.encode(a))) == a
    assert bytes(codec.decode(B.blosc_encode(a, 8))) == a


@pytest.mark.parametrize("cname", ["zlib", "lz4", "zstd"])
def test_encode_foreign_cnames_roundtrip(cname):
    """r10 encode side: zlib via stdlib, lz4/zstd via the system
    libraries — frames a real blosc build reads (codec code + single
    stream per FORWARD_COMPAT), round-tripped through our own decoder
    here and skip-gated against real blosc below."""
    from oco3_data_transformer_spark.operators import syscodecs

    if cname == "lz4" and not syscodecs.lz4_available():
        pytest.skip("system liblz4 absent (probe logged)")
    if cname == "zstd" and not syscodecs.zstd_available():
        pytest.skip("system libzstd absent (probe logged)")
    rng = np.random.default_rng(10)
    for raw in (
        np.repeat(rng.integers(0, 7, 900), 2).astype("<f8").tobytes(),
        np.full(3000, np.nan).tobytes(),
        bytes(rng.integers(0, 256, 777, dtype=np.uint8)),  # typesize 1
    ):
        for ts in (1, 8):
            r = raw[: len(raw) // ts * ts]
            f = B.blosc_encode(r, ts, cname=cname)
            _, _, flags, *_ = struct.unpack_from("<BBBB", f, 0)
            if not flags & 0x2:  # compressed frames carry the codec code
                assert flags >> 5 == {"zlib": 3, "lz4": 1, "zstd": 4}[cname]
                # FORWARD_COMPAT: non-blosclz frames never split
                (csize0,) = struct.unpack_from("<i", f, 20)
                assert csize0 > 0
            assert B.blosc_decode(f) == r


def test_encode_unknown_cname_gate():
    with pytest.raises(NotImplementedError, match="snappy"):
        B.blosc_encode(bytes(64), 8, cname="snappy")


def test_real_blosc_decodes_our_foreign_cname_frames():
    blosc = pytest.importorskip("blosc")
    a = np.arange(4000, dtype=np.float64).tobytes()
    for cname in ("zlib", "lz4", "zstd"):
        try:
            ours = B.blosc_encode(a, 8, cname=cname)
        except NotImplementedError:
            continue
        assert blosc.decompress(ours) == a
