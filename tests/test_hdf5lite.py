"""HDF5 subset codec (sources/hdf5lite.py): round-trips across all three
layouts (contiguous, chunked, chunked+shuffle+deflate), byte-level spec
goldens (signature, superblock field offsets, B-tree/SNOD/HEAP
signatures, IEEE-float datatype property bytes), projection pushdown,
_FillValue attribute decode, and the S1 granule path end-to-end
(decode_netcdf fallback → Spark sounding DataFrame)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from oco3_data_transformer_spark.sources import hdf5lite as H


def _granule(n=500, seed=3):
    rng = np.random.default_rng(seed)
    xco2 = rng.normal(400, 2, n)
    xco2[::97] = -999999.0  # fill-marked soundings
    return {
        "latitude": rng.uniform(-90, 90, n),
        "longitude": rng.uniform(-180, 180, n),
        "sounding_id": np.arange(n, dtype=np.int64),
        "vertex_latitude": rng.uniform(-90, 90, (n, 4)).astype(np.float32),
        "xco2": xco2,
    }


@pytest.mark.parametrize(
    "kw",
    [dict(), dict(chunk_rows=64), dict(chunk_rows=64, compress=True)],
    ids=["contiguous", "chunked", "chunked+shuffle+deflate"],
)
def test_roundtrip_all_layouts(kw):
    data = _granule()
    blob = H.write_hdf5(data, {"xco2": {"_FillValue": -999999.0}}, **kw)
    arrays, attrs = H.read_hdf5(blob)
    assert set(arrays) == set(data)
    for k, v in data.items():
        np.testing.assert_array_equal(arrays[k], v)
        assert arrays[k].dtype == v.dtype
    assert float(np.asarray(attrs["xco2"]["_FillValue"]).ravel()[0]) == -999999.0


def test_compression_actually_compresses_and_shuffles():
    # constant data: shuffle+deflate must crush it; and the raw chunk bytes
    # must NOT contain the plain little-endian float pattern (proof the
    # byte-shuffle filter really ran, not just deflate)
    a = np.full(4096, 1234.5)
    plain = H.write_hdf5({"v": a}, chunk_rows=4096)
    comp = H.write_hdf5({"v": a}, chunk_rows=4096, compress=True)
    assert len(comp) < len(plain) / 20
    arrays, _ = H.read_hdf5(comp)
    np.testing.assert_array_equal(arrays["v"], a)
    # shuffled stream of a constant array deflates to runs of identical
    # bytes; inflating the chunk gives the TRANSPOSED layout, not tobytes()
    start = comp.index(zlib.compress(
        np.frombuffer(a.tobytes(), np.uint8).reshape(-1, 8).T.tobytes(), 4
    )[:16]) if True else 0
    assert start > 0


def test_spec_golden_superblock_and_signatures():
    blob = H.write_hdf5({"v": np.arange(3.0)})
    assert blob[:8] == b"\x89HDF\r\n\x1a\n"
    assert blob[8] == 0  # superblock version 0
    assert blob[13] == 8 and blob[14] == 8  # offset/length sizes
    (eof,) = struct.unpack_from("<Q", blob, 40)
    assert eof == len(blob)  # end-of-file address
    # root symbol table entry: object header address then cached stab
    (root_oh,) = struct.unpack_from("<Q", blob, 64)
    assert blob[root_oh] == 1  # v1 object header
    assert b"TREE" in blob and b"SNOD" in blob and b"HEAP" in blob


def test_spec_golden_ieee_float64_datatype():
    body = H._dtype_message(np.dtype("<f8"))
    assert body[0] == 0x11  # version 1, class 1 (float)
    assert body[1:4] == bytes([0x20, 63, 0])  # LE, implied-msb norm, sign@63
    assert struct.unpack_from("<I", body, 4) == (8,)
    assert struct.unpack_from("<HHBBBBI", body, 8) == (0, 64, 52, 11, 0, 52, 1023)
    assert H._parse_dtype(body) == np.dtype("<f8")
    for dt in ["<f4", "<i4", "<i8", "<u2", "<u1"]:
        assert H._parse_dtype(H._dtype_message(np.dtype(dt))) == np.dtype(dt)


def test_projection_prunes_before_decode():
    data = _granule()
    blob = H.write_hdf5(data, chunk_rows=64, compress=True)
    arrays, _ = H.read_hdf5(blob, variables=["xco2", "latitude"])
    assert sorted(arrays) == ["latitude", "xco2"]


def test_unsupported_shapes_fail_loudly():
    with pytest.raises(ValueError, match="signature"):
        H.read_hdf5(b"not an hdf5 file at all, padded long enough......")
    blob = bytearray(H.write_hdf5({"v": np.arange(3.0)}))
    blob[8] = 2  # superblock v2 (new-format)
    with pytest.raises(ValueError, match="superblock version 2"):
        H.read_hdf5(bytes(blob))
    with pytest.raises(ValueError, match="compression requires"):
        H.write_hdf5({"v": np.arange(3.0)}, compress=True)


def test_nested_groups_roundtrip():
    """netCDF variable groups (the reference projects /Retrieval,
    /Sounding etc. — ref readers/GranuleReader.py:115-117): '/'-separated
    dataset paths create real HDF5 sub-groups and read back by path."""
    rng = np.random.default_rng(9)
    data = {
        "sounding_id": np.arange(20, dtype=np.int64),
        "Retrieval/xco2": rng.normal(400, 2, 20),
        "Retrieval/psurf": rng.normal(1000, 5, 20),
        "Sounding/operation_mode": rng.integers(0, 3, 20).astype(np.int8),
    }
    blob = H.write_hdf5(
        data, {"Retrieval/xco2": {"_FillValue": -999999.0}},
        chunk_rows=7, compress=True,
    )
    arrays, attrs = H.read_hdf5(blob)
    assert set(arrays) == set(data)
    for k, v in data.items():
        np.testing.assert_array_equal(arrays[k], v)
    assert "_FillValue" in attrs["Retrieval/xco2"]
    # projection by leaf name finds grouped variables too
    arrays, _ = H.read_hdf5(blob, variables=["xco2"])
    assert list(arrays) == ["Retrieval/xco2"]


def test_decode_netcdf_group_selection():
    """decode_netcdf(group='Retrieval') mirrors xarray's group= semantics
    on the wheel-free path; group=None flattens to leaf names."""
    from oco3_data_transformer_spark.sources.granules import decode_netcdf

    data = {
        "sounding_id": np.arange(10, dtype=np.int64),
        "Retrieval/xco2": np.linspace(400, 401, 10),
    }
    blob = H.write_hdf5(data)
    sel = decode_netcdf(blob, None, group="Retrieval")
    assert list(sel.columns) == ["xco2"]
    flat = decode_netcdf(blob, None)
    assert sorted(flat.columns) == ["sounding_id", "xco2"]


def test_decode_netcdf_hdf5_fallback_masks_fill():
    """The S1 decoder path: hdf5lite payload → pandas frame with
    _FillValue→NaN normalization (ref readers/GranuleReader.py:151-153)
    and 2-D vertex arrays as list columns."""
    from oco3_data_transformer_spark.sources.granules import decode_netcdf

    data = _granule()
    blob = H.write_hdf5(
        data, {"xco2": {"_FillValue": -999999.0}}, chunk_rows=128, compress=True
    )
    pdf = decode_netcdf(blob, None)
    assert np.isnan(pdf["xco2"].to_numpy()[0::97]).all()
    assert pdf["sounding_id"].dtype.kind == "i"  # ints NOT fill-masked
    assert len(pdf["vertex_latitude"][0]) == 4
    pdf2 = decode_netcdf(blob, ["xco2"])
    assert list(pdf2.columns) == ["xco2"]


def test_granule_source_reads_hdf5_granules(spark, tmp_path):
    """End-to-end S1: .nc4-style HDF5 granule files on disk → binaryFile
    scan → mapInPandas decode → sounding DataFrame (the same harness the
    npz decoder runs through)."""
    from pyspark.sql import types as T

    from oco3_data_transformer_spark.sources import granules as G

    schema = T.StructType(
        [
            T.StructField("granule", T.StringType()),
            T.StructField("sounding_id", T.LongType()),
            T.StructField("xco2", T.DoubleType()),
            T.StructField("latitude", T.DoubleType()),
        ]
    )
    for day in (1, 2):
        data = _granule(seed=day)
        blob = H.write_hdf5(
            data, {"xco2": {"_FillValue": -999999.0}}, chunk_rows=200,
            compress=True,
        )
        (tmp_path / f"oco3_LtCO2_2401{day:02d}_B11000_g{day}.nc4").write_bytes(blob)
    df = G.read_granules(spark, str(tmp_path / "*.nc4"), schema, fmt="nc4")
    rows = df.toPandas()
    assert len(rows) == 1000
    assert {"granule", "sounding_id", "xco2", "latitude"} == set(rows.columns)
    assert rows["xco2"].isna().sum() > 0  # fill masked to NaN


def test_wide_group_stays_in_spec():
    """A granule-realistic variable count (30 datasets in one group): the
    superblock's Group Leaf Node K must cover the single SNOD's entry
    count (spec caps a symbol table node at 2K symbols), and everything
    round-trips."""
    data = {f"var_{i:02d}": np.arange(4, dtype=np.float64) + i for i in range(30)}
    blob = H.write_hdf5(data)
    (leaf_k,) = struct.unpack_from("<H", blob, 16)
    assert 2 * leaf_k >= 30
    arrays, _ = H.read_hdf5(blob)
    assert len(arrays) == 30
    np.testing.assert_array_equal(arrays["var_29"], np.arange(4.0) + 29)


def test_multi_node_chunk_btree_stays_in_spec():
    """>64 chunks must split across B-tree nodes: superblock v0 has no
    Indexed Storage Internal Node K field, so real readers assume the
    default K=32 (max 64 entries/node) — one wide leaf is out-of-spec
    (the chunk-side twin of the Group Leaf Node K bound).  500 chunks →
    a depth-1 tree; every type-1 node must hold ≤ 64 entries and the
    data must round-trip bit-exactly."""
    rng = np.random.default_rng(7)
    a = rng.normal(size=100_000).astype(np.float32)
    blob = H.write_hdf5({"x": a}, chunk_rows=200, compress=True)
    seen_levels = set()
    pos = 0
    while True:
        pos = blob.find(b"TREE", pos)
        if pos < 0:
            break
        ntype, level, nent = struct.unpack_from("<BBH", blob, pos + 4)
        if ntype == 1:
            assert nent <= 64, f"chunk B-tree node at {pos} has {nent} entries"
            seen_levels.add(level)
        pos += 4
    assert seen_levels == {0, 1}  # 500 chunks: leaves + one internal level
    arrays, _ = H.read_hdf5(blob)
    np.testing.assert_array_equal(arrays["x"], a)


def test_depth2_chunk_btree_roundtrip():
    """5000 chunks exceed 64*64, forcing two internal levels."""
    a = np.arange(10_000, dtype=np.int64)
    blob = H.write_hdf5({"a": a}, chunk_rows=2)
    arrays, _ = H.read_hdf5(blob)
    np.testing.assert_array_equal(arrays["a"], a)


def test_zero_row_chunked_dataset():
    """Zero-row array with chunk_rows must not crash (chunk dims stay
    positive per spec; zero chunks → UNDEF B-tree address, which the
    reader maps to an empty/all-fill array)."""
    blob = H.write_hdf5(
        {"z": np.zeros((0,), np.float64), "w": np.arange(5.0)},
        chunk_rows=100,
        compress=True,
    )
    arrays, _ = H.read_hdf5(blob)
    assert arrays["z"].shape == (0,)
    np.testing.assert_array_equal(arrays["w"], np.arange(5.0))
