"""From-spec Zarr v2 store (sinks/zarrlite.py + sinks/zarr_store.py):
metadata-document goldens, chunk-byte goldens, round-trips (edge chunks,
missing chunks, uncompressed), the distributed export/scan pair, and a
skip-gated differential against the real ``zarr`` package."""

from __future__ import annotations

import datetime as dt
import json
import os
import zlib

import numpy as np
import pytest

from oco3_data_transformer_spark.sinks import zarrlite as Z


# ---------------------------------------------------------------------------
# spec goldens
# ---------------------------------------------------------------------------


def test_zarray_document_golden():
    meta = Z.array_meta((10, 6), (4, 6), np.dtype("float64"), np.nan, 9)
    assert meta == {
        "zarr_format": 2,
        "shape": [10, 6],
        "chunks": [4, 6],
        "dtype": "<f8",
        "compressor": {"id": "zlib", "level": 9},
        "fill_value": "NaN",  # v2 spec: NaN serializes as the string
        "order": "C",
        "filters": None,
    }
    assert Z.array_meta((3,), (3,), np.dtype("int32"), 0, None)["compressor"] is None
    assert Z.array_meta((3,), (3,), np.dtype("int32"), 0, None)["fill_value"] == 0


def test_chunk_bytes_are_zlib_of_c_order():
    a = np.arange(12, dtype="<f8").reshape(3, 4)
    payload = Z.encode_chunk(a, (3, 4), np.nan, 6)
    assert zlib.decompress(payload) == a.tobytes(order="C")
    # edge chunk padded with fill to the FULL chunk size (v2 stores only
    # full-size chunks; the logical shape crops)
    edge = Z.encode_chunk(a[:2, :3], (3, 4), -1.0, None)
    full = np.frombuffer(edge, "<f8").reshape(3, 4)
    assert np.array_equal(full[:2, :3], a[:2, :3])
    assert np.all(full[2, :] == -1.0) and np.all(full[:, 3] == -1.0)


def test_chunk_keys_dot_separated():
    assert Z.chunk_key((0, 2, 1)) == "0.2.1"
    assert Z.chunk_key((7,)) == "7"


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------


def test_array_roundtrip_with_edge_and_missing_chunks(tmp_path):
    root = str(tmp_path / "store")
    Z.write_group(root, attrs={"title": "t"})
    a = np.arange(70, dtype=np.float64).reshape(10, 7)
    Z.write_array(root, "v", a, (4, 3), dims=["y", "x"], fill_value=np.nan)
    got, attrs = Z.read_array(root, "v")
    assert np.array_equal(got, a)
    assert attrs["_ARRAY_DIMENSIONS"] == ["y", "x"]
    # deleting a chunk reads back as fill_value (spec: missing == fill)
    os.remove(os.path.join(root, "v", "1.0"))
    got, _ = Z.read_array(root, "v")
    assert np.all(np.isnan(got[4:8, 0:3]))
    assert np.array_equal(got[:4], a[:4])
    assert Z.group_attrs(root) == {"title": "t"}


def test_uncompressed_and_int_arrays(tmp_path):
    root = str(tmp_path / "s")
    a = np.arange(9, dtype=np.int32).reshape(3, 3)
    Z.write_array(root, "i", a, (2, 2), fill_value=0, level=None)
    meta = json.load(open(os.path.join(root, "i", ".zarray")))
    assert meta["compressor"] is None and meta["dtype"] == "<i4"
    got, _ = Z.read_array(root, "i")
    assert np.array_equal(got, a)


def test_consolidated_metadata(tmp_path):
    root = str(tmp_path / "s")
    Z.write_group(root, attrs={"a": 1})
    Z.write_array(root, "v", np.zeros(3), None, dims=["t"])
    Z.consolidate(root)
    zm = json.load(open(os.path.join(root, ".zmetadata")))
    assert zm["zarr_consolidated_format"] == 1
    assert ".zgroup" in zm["metadata"] and "v/.zarray" in zm["metadata"]
    assert zm["metadata"]["v/.zattrs"]["_ARRAY_DIMENSIONS"] == ["t"]
    assert Z.list_arrays(root) == ["v"]


def test_reader_rejects_unsupported(tmp_path):
    root = str(tmp_path / "s")
    Z.write_array(root, "v", np.zeros(3), None)
    meta_path = os.path.join(root, "v", ".zarray")
    meta = json.load(open(meta_path))
    for patch, msg in [
        ({"order": "F"}, "F-order"),
        ({"compressor": {"id": "blosc"}}, "blosc"),
        ({"filters": [{"id": "delta"}]}, "filters"),
        ({"zarr_format": 3}, "v2"),
    ]:
        bad = {**meta, "order": "C", "filters": None, "zarr_format": 2}
        bad.update(patch)
        json.dump(bad, open(meta_path, "w"))
        with pytest.raises(ValueError, match=msg):
            Z.read_array(root, "v")
    with pytest.raises(ValueError, match="subset"):
        Z.dtype_str(np.dtype("U4"))


# ---------------------------------------------------------------------------
# distributed export / scan
# ---------------------------------------------------------------------------


@pytest.fixture()
def small_store_rows(spark):
    from oco3_data_transformer_spark.schemas import STORE_SLICE

    rows = []
    rng = np.random.default_rng(3)
    days = [dt.datetime(2023, 5, d) for d in (1, 2, 4)]
    for t in days:
        for var in ("xco2", "xco2_uncert"):
            for lat in range(4):
                for lon in range(5):
                    if rng.random() < 0.35:
                        continue  # sparse: mask drops cells
                    rows.append(
                        ("oco3", "t1", "post", t, lat, lon, var,
                         float(rng.normal()))
                    )
    return spark.createDataFrame(rows, STORE_SLICE), rows


def test_export_zarr_roundtrip(spark, small_store_rows, tmp_path):
    from oco3_data_transformer_spark.sinks.zarr_store import export_zarr, scan_zarr

    df, rows = small_store_rows
    path = str(tmp_path / "store.zarr")
    manifest = export_zarr(
        df, path, lat_res=4, lon_res=5, chunk_t=2, chunk_lat=2, chunk_lon=3,
        bbox=(-10.0, -4.0, 10.0, 4.0), attrs={"title": "unit"},
    )
    assert manifest["shape"] == [3, 4, 5]
    assert sorted(manifest["variables"]) == ["xco2", "xco2_uncert"]

    # dense read-back matches the input rows exactly; unset cells are NaN
    expect = {
        v: np.full((3, 4, 5), np.nan) for v in ("xco2", "xco2_uncert")
    }
    day_ix = {dt.datetime(2023, 5, d): i for i, d in enumerate((1, 2, 4))}
    for _, _, _, t, lat, lon, var, val in rows:
        expect[var][day_ix[t], lat, lon] = val
    for var in expect:
        got, attrs = Z.read_array(path, var)
        assert attrs["_ARRAY_DIMENSIONS"] == ["time", "lat", "lon"]
        assert np.array_equal(np.isnan(got), np.isnan(expect[var]))
        assert np.allclose(got, expect[var], equal_nan=True)

    # coordinates + attrs follow the reference's store conventions
    t_arr, t_attrs = Z.read_array(path, "time")
    assert t_attrs["units"].startswith("seconds since 1970")
    assert list(t_arr) == [
        int(dt.datetime(2023, 5, d, tzinfo=dt.timezone.utc).timestamp())
        for d in (1, 2, 4)
    ]
    lat_arr, _ = Z.read_array(path, "lat")
    assert np.allclose(lat_arr, [-3, -1, 1, 3])
    ga = Z.group_attrs(path)
    assert ga["coverage_start"] == "2023-05-01T00:00:00Z"
    assert ga["coverage_end"] == "2023-05-04T00:00:00Z"
    assert (ga["mission"], ga["qf"], ga["title"]) == ("oco3", "post", "unit")
    assert os.path.exists(os.path.join(path, ".zmetadata"))

    # scan: one task per chunk, long rows == input rows
    back = scan_zarr(spark, path).collect()
    got_set = {
        (r.time, r.lat_idx, r.lon_idx, r.variable, round(r.value, 9))
        for r in back
    }
    want_set = {
        (t, lat, lon, var, round(val, 9))
        for _, _, _, t, lat, lon, var, val in rows
    }
    assert got_set == want_set


def test_export_zarr_rejects_multiple_stores(spark, small_store_rows, tmp_path):
    from oco3_data_transformer_spark.sinks.zarr_store import export_zarr
    from pyspark.sql import functions as F

    df, _ = small_store_rows
    two = df.union(df.withColumn("qf", F.lit("pre")))
    with pytest.raises(ValueError, match="ONE store"):
        export_zarr(two, str(tmp_path / "x"), 4, 5)


def _mk_rows(spark, days, variables=("xco2",), seed=0, h=4, w=5, sparsity=0.3):
    from oco3_data_transformer_spark.schemas import STORE_SLICE

    rng = np.random.default_rng(seed)
    rows = []
    for t in days:
        for var in variables:
            for lat in range(h):
                for lon in range(w):
                    if rng.random() < sparsity:
                        continue
                    rows.append(
                        ("oco3", "t1", "post", t, lat, lon, var,
                         float(rng.normal()))
                    )
    return spark.createDataFrame(rows, STORE_SLICE), rows


def _dense(rows, days, var, h=4, w=5):
    out = np.full((len(days), h, w), np.nan)
    ix = {d: i for i, d in enumerate(days)}
    for _, _, _, t, lat, lon, v, val in rows:
        if v == var and t in ix:
            out[ix[t], lat, lon] = val
    return out


def test_append_zarr_fast_path_and_boundary_merge(spark, tmp_path):
    """Appending strictly-later days only writes new time-chunks; with
    chunk_t=2 and 3 existing days the straddled chunk is merged
    read-modify-write; coverage attrs update; verify stays green."""
    from oco3_data_transformer_spark.sinks.zarr_store import (
        append_zarr, export_zarr, verify_zarr)

    d0 = [dt.datetime(2023, 5, d) for d in (1, 2, 3)]
    d1 = [dt.datetime(2023, 5, d) for d in (5, 6)]
    df0, rows0 = _mk_rows(spark, d0, seed=1)
    df1, rows1 = _mk_rows(spark, d1, seed=2)
    path = str(tmp_path / "s.zarr")
    export_zarr(df0, path, 4, 5, chunk_t=2, bbox=(-10, -4, 10, 4))
    rep = append_zarr(df1, path)
    assert rep == {"path": path, "n_appended": 2,
                   "n_skipped_duplicates": 0, "rewritten": False}
    got, _ = Z.read_array(path, "xco2")
    assert got.shape == (5, 4, 5)
    want = _dense(rows0 + rows1, d0 + d1, "xco2")
    assert np.allclose(got, want, equal_nan=True)
    ga = Z.group_attrs(path)
    assert ga["coverage_end"] == "2023-05-06T00:00:00Z"
    assert ga["coverage_start"] == "2023-05-01T00:00:00Z"
    v = verify_zarr(path)
    assert v["ok"] and v["n_days"] == 5
    t_arr, _ = Z.read_array(path, "time")
    assert len(t_arr) == 5 and list(np.diff(t_arr) > 0) == [True] * 4


def test_append_zarr_duplicate_days_keep_first(spark, tmp_path):
    """A re-delivered day is skipped: the stored slice wins (the
    reference's drop_duplicates keep='first' on verify)."""
    from oco3_data_transformer_spark.sinks.zarr_store import (
        append_zarr, export_zarr)

    d0 = [dt.datetime(2023, 5, 1), dt.datetime(2023, 5, 2)]
    df0, rows0 = _mk_rows(spark, d0, seed=3)
    path = str(tmp_path / "s.zarr")
    export_zarr(df0, path, 4, 5, chunk_t=2, bbox=(-10, -4, 10, 4))
    # duplicate day 2 with DIFFERENT values + a genuinely new day 3
    dup, _ = _mk_rows(spark, [dt.datetime(2023, 5, 2)], seed=9)
    new, rows_new = _mk_rows(spark, [dt.datetime(2023, 5, 3)], seed=4)
    rep = append_zarr(dup.unionByName(new), path)
    assert rep["n_appended"] == 1 and rep["n_skipped_duplicates"] == 1
    got, _ = Z.read_array(path, "xco2")
    want = _dense(rows0 + rows_new, d0 + [dt.datetime(2023, 5, 3)], "xco2")
    assert np.allclose(got, want, equal_nan=True)  # day-2 slice unchanged


def test_append_zarr_out_of_order_rewrites_sorted(spark, tmp_path):
    """A day earlier than coverage_end cannot pure-append: the store is
    rewritten sorted via temp + swap (the reference's verify repair)."""
    from oco3_data_transformer_spark.sinks.zarr_store import (
        append_zarr, export_zarr, verify_zarr)

    d0 = [dt.datetime(2023, 5, 2), dt.datetime(2023, 5, 6)]
    late = [dt.datetime(2023, 5, 4)]
    df0, rows0 = _mk_rows(spark, d0, seed=5)
    dfl, rowsl = _mk_rows(spark, late, seed=6)
    path = str(tmp_path / "s.zarr")
    export_zarr(df0, path, 4, 5, chunk_t=2, bbox=(-10, -4, 10, 4))
    rep = append_zarr(dfl, path)
    assert rep["rewritten"] is True and rep["n_appended"] == 1
    days = d0[:1] + late + d0[1:]
    got, _ = Z.read_array(path, "xco2")
    want = _dense(rows0 + rowsl, days, "xco2")
    assert np.allclose(got, want, equal_nan=True)
    t_arr, _ = Z.read_array(path, "time")
    assert list(np.diff(t_arr) > 0) == [True] * 2
    assert verify_zarr(path)["ok"]


def test_append_zarr_new_variable_and_identity_guard(spark, tmp_path):
    from oco3_data_transformer_spark.sinks.zarr_store import (
        append_zarr, export_zarr)
    from pyspark.sql import functions as F

    d0 = [dt.datetime(2023, 5, 1)]
    d1 = [dt.datetime(2023, 5, 2)]
    df0, _ = _mk_rows(spark, d0, seed=7)
    df1, rows1 = _mk_rows(spark, d1, variables=("xco2", "uncert"), seed=8)
    path = str(tmp_path / "s.zarr")
    export_zarr(df0, path, 4, 5, chunk_t=4, bbox=(-10, -4, 10, 4))
    append_zarr(df1, path)
    got, _ = Z.read_array(path, "uncert")
    assert got.shape == (2, 4, 5)
    assert np.all(np.isnan(got[0]))  # day 1 never had the variable
    want = _dense(rows1, d0 + d1, "uncert")[1]
    assert np.allclose(got[1], want, equal_nan=True)
    with pytest.raises(ValueError, match="must match"):
        append_zarr(df1.withColumn("qf", F.lit("pre")), path)


def test_differential_against_zarr_package(spark, small_store_rows, tmp_path):
    """Skip-gated: the real zarr package must open our store (values,
    coords, consolidated metadata), and our reader must read a store the
    real package wrote with the zlib codec."""
    zarr = pytest.importorskip("zarr")
    from oco3_data_transformer_spark.sinks.zarr_store import export_zarr

    df, rows = small_store_rows
    path = str(tmp_path / "store.zarr")
    export_zarr(df, path, lat_res=4, lon_res=5, chunk_t=2,
                bbox=(-10.0, -4.0, 10.0, 4.0))
    g = zarr.open_group(path, mode="r")
    ours, _ = Z.read_array(path, "xco2")
    assert np.allclose(np.asarray(g["xco2"]), ours, equal_nan=True)

    theirs_dir = str(tmp_path / "theirs.zarr")
    tg = zarr.open_group(theirs_dir, mode="w")
    a = np.arange(24, dtype=np.float64).reshape(4, 6)
    try:
        from numcodecs import Zlib

        tg.create_dataset("v", data=a, chunks=(2, 4), compressor=Zlib(5))
    except Exception:
        pytest.skip("zarr build without numcodecs zlib")
    got, _ = Z.read_array(theirs_dir, "v")
    assert np.array_equal(got, a)


def test_verify_zarr_flags_stale_coverage_attrs_and_append_heals(
    spark, tmp_path
):
    """VERDICT r08 item 7 (ref writers/ZarrWriter.py:140-167): verify must
    reconcile coverage attrs against the actual time axis — a tampered
    coverage_end is flagged — and the next append re-derives BOTH attrs
    from the axis, healing the store."""
    import json
    import os

    from oco3_data_transformer_spark.sinks.zarr_store import (
        append_zarr, export_zarr, verify_zarr)

    d0 = [dt.datetime(2023, 5, d) for d in (1, 2)]
    d1 = [dt.datetime(2023, 5, 4)]
    df0, _ = _mk_rows(spark, d0, seed=3)
    df1, _ = _mk_rows(spark, d1, seed=4)
    path = str(tmp_path / "s.zarr")
    export_zarr(df0, path, 4, 5, chunk_t=2, bbox=(-10, -4, 10, 4))
    assert verify_zarr(path)["ok"]
    # out-of-band tampering: stale end + wrong start
    attrs_path = os.path.join(path, ".zattrs")
    ga = json.load(open(attrs_path))
    ga["coverage_end"] = "2023-04-30T00:00:00Z"
    json.dump(ga, open(attrs_path, "w"))
    rep = verify_zarr(path)
    assert not rep["ok"]
    assert any("coverage_end" in p and "stale" in p for p in rep["problems"])
    # the next append re-derives both attrs from the axis
    append_zarr(df1, path)
    rep2 = verify_zarr(path)
    assert rep2["ok"], rep2["problems"]
    ga2 = Z.group_attrs(path)
    assert ga2["coverage_start"] == "2023-05-01T00:00:00Z"
    assert ga2["coverage_end"] == "2023-05-04T00:00:00Z"


def test_export_zarr_blosc_reference_codec(spark, tmp_path):
    """compressor='blosc' writes the reference's exact chunk codec config
    (Blosc blosclz clevel-9 byte-shuffle, ref writers/ZarrWriter.py:205)
    through the distributed assembly; scan and read_array round-trip it,
    and append to a blosc store keeps emitting blosc chunks."""
    from oco3_data_transformer_spark.sinks.zarr_store import (
        append_zarr, export_zarr, scan_zarr, verify_zarr)

    d0 = [dt.datetime(2023, 5, d) for d in (1, 2)]
    d1 = [dt.datetime(2023, 5, 3)]
    df0, rows0 = _mk_rows(spark, d0, seed=11)
    df1, rows1 = _mk_rows(spark, d1, seed=12)
    path = str(tmp_path / "b.zarr")
    export_zarr(df0, path, 4, 5, chunk_t=2, bbox=(-10, -4, 10, 4),
                compressor="blosc")
    meta = json.loads(open(os.path.join(path, "xco2", ".zarray")).read())
    assert meta["compressor"] == {
        "id": "blosc", "cname": "blosclz", "clevel": 9, "shuffle": 1,
        "blocksize": 0,
    }
    # chunk payloads are genuine blosc1 frames (version 2, blosclz)
    ck = open(os.path.join(path, "xco2", "0.0.0"), "rb").read()
    assert ck[0] == 2 and ck[1] == 1 and (ck[2] >> 5) == 0
    append_zarr(df1, path)
    assert verify_zarr(path)["ok"]
    got, _ = Z.read_array(path, "xco2")
    want = _dense(rows0 + rows1, d0 + d1, "xco2")
    assert np.allclose(got, want, equal_nan=True)
    # the appended chunk is blosc too (chunk_t=2: day 3 starts chunk 1)
    ck1 = open(os.path.join(path, "xco2", "1.0.0"), "rb").read()
    assert ck1[0] == 2 and ck1[1] == 1
    back = scan_zarr(spark, path)
    assert back.count() == int(np.isfinite(want).sum())


def test_real_zarr_reads_blosc_store(spark, tmp_path):
    """Differential (activates when the zarr wheel appears): a store
    exported with compressor='blosc' opens byte-compatibly in zarr."""
    zarr = pytest.importorskip("zarr")
    from oco3_data_transformer_spark.sinks.zarr_store import export_zarr

    d0 = [dt.datetime(2023, 5, 1)]
    df0, rows0 = _mk_rows(spark, d0, seed=13)
    path = str(tmp_path / "z.zarr")
    export_zarr(df0, path, 4, 5, bbox=(-10, -4, 10, 4), compressor="blosc")
    g = zarr.open_group(path, mode="r")
    want = _dense(rows0, d0, "xco2")
    assert np.allclose(g["xco2"][:], want, equal_nan=True)


def test_third_party_blosc_store_scan(spark, tmp_path):
    """A store shaped the way THIRD-PARTY zarr writers produce it —
    numcodecs' DEFAULT Blosc (cname='lz4', byte-shuffle) on one
    variable, zstd + BIT-shuffle on another — reads through both
    read_array and the engine's distributed per-chunk scan (r10:
    blosclite dispatches on the frame's compressor code; lz4/zstd
    payloads come from the real system libraries, bitshuffle decodes
    from spec). Before r10 these stores were rejected at the cname gate."""
    import struct

    from oco3_data_transformer_spark.operators import syscodecs
    from oco3_data_transformer_spark.sinks import blosclite as B
    from oco3_data_transformer_spark.sinks.zarr_store import scan_zarr

    if not (syscodecs.lz4_available() and syscodecs.zstd_available()):
        pytest.skip("system liblz4/libzstd absent (probe logged)")

    # forward bitshuffle for fixture-building only: inverting the
    # decoder's own inverse would be circular, so use the independent
    # scalar transcription of the published algorithm
    def fwd_bitshuffle(raw: bytes, typesize: int) -> bytes:
        nelem = (len(raw) // typesize) & ~7
        nb = nelem * typesize
        out = bytearray(nb)
        rows = nelem // 8
        for bb in range(typesize):
            for j in range(8):
                for t in range(rows):
                    v = 0
                    for m in range(8):
                        v |= ((raw[(8 * t + m) * typesize + bb] >> j) & 1) << m
                    out[(bb * 8 + j) * rows + t] = v
        return bytes(out) + raw[nb:]

    def frame(raw: bytes, typesize: int, codec: int, flags: int,
              comp) -> bytes:
        if flags & 0x4:
            sh = fwd_bitshuffle(raw, typesize)
        elif flags & 0x1:
            sh = B._shuffle(raw, typesize)
        else:
            sh = raw
        payload = comp(sh)
        total = 16 + 4 + 4 + len(payload)
        hdr = struct.pack("<BBBBIII", 2, 1, flags | (codec << 5),
                          typesize, len(raw), len(raw), total)
        return (hdr + struct.pack("<i", 20)
                + struct.pack("<i", len(payload)) + payload)

    root = str(tmp_path / "tp.zarr")
    rng = np.random.default_rng(21)
    shape, chunks = (2, 4, 5), (1, 4, 5)
    a = rng.normal(size=shape)
    a[0, 0, 0] = np.nan
    b = rng.normal(size=shape)

    def write_var(name, arr, comp_doc, codec, flags, comp):
        adir = os.path.join(root, name)
        os.makedirs(adir)
        meta = {
            "zarr_format": 2, "shape": list(shape), "chunks": list(chunks),
            "dtype": "<f8", "compressor": comp_doc, "fill_value": "NaN",
            "order": "C", "filters": None,
        }
        json.dump(meta, open(os.path.join(adir, ".zarray"), "w"))
        for t in range(shape[0]):
            raw = np.ascontiguousarray(arr[t:t + 1]).tobytes()
            with open(os.path.join(adir, f"{t}.0.0"), "wb") as fh:
                fh.write(frame(raw, 8, codec, flags, comp))

    write_var(
        "xco2", a,
        {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
         "blocksize": 0},
        codec=1, flags=0x1, comp=syscodecs.lz4_compress,
    )
    write_var(
        "xco2_uncert", b,
        {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 2,
         "blocksize": 0},
        codec=4, flags=0x4, comp=syscodecs.zstd_compress,
    )
    # coordinate arrays (uncompressed int64 seconds / float64 axes)
    Z.write_array(root, "time", np.array([1682899200, 1682985600],
                                         dtype="<i8"), None)
    Z.write_array(root, "lat", np.linspace(-4, 4, 4), None)
    Z.write_array(root, "lon", np.linspace(-10, 10, 5), None)

    got_a, _ = Z.read_array(root, "xco2")
    got_b, _ = Z.read_array(root, "xco2_uncert")
    assert np.allclose(got_a, a, equal_nan=True)
    assert np.allclose(got_b, b, equal_nan=True)

    back = scan_zarr(spark, root)
    rows = back.filter(back.variable == "xco2").collect()
    assert len(rows) == int(np.isfinite(a).sum())
    by_key = {(r.time.day, r.lat_idx, r.lon_idx): r.value for r in rows}
    assert by_key[(1, 1, 2)] == pytest.approx(a[0, 1, 2])
    assert by_key[(2, 3, 4)] == pytest.approx(a[1, 3, 4])


def test_export_zarr_zstd_cname_and_append_preserves_codec(spark, tmp_path):
    """compressor='blosc:zstd' (the codec production zarr stores run at
    scale) writes zstd blosc frames through the distributed assembly;
    append FOLLOWS the store's cname instead of silently re-encoding as
    blosclz (r10 fix), and scan/read_array round-trip the values."""
    from oco3_data_transformer_spark.operators import syscodecs
    from oco3_data_transformer_spark.sinks.zarr_store import (
        append_zarr, export_zarr, scan_zarr, verify_zarr)

    if not syscodecs.zstd_available():
        pytest.skip("system libzstd absent (probe logged)")
    d0 = [dt.datetime(2023, 5, d) for d in (1, 2)]
    d1 = [dt.datetime(2023, 5, 3)]
    # sparse grids (mostly NaN fill, the real store shape) so chunks
    # genuinely compress — a dense random-mantissa 320-byte chunk
    # correctly falls back to memcpy
    df0, rows0 = _mk_rows(spark, d0, seed=31, sparsity=0.85)
    df1, rows1 = _mk_rows(spark, d1, seed=32, sparsity=0.85)
    path = str(tmp_path / "zs.zarr")
    export_zarr(df0, path, 4, 5, chunk_t=2, bbox=(-10, -4, 10, 4),
                compressor="blosc:zstd", level=3)
    meta = json.loads(open(os.path.join(path, "xco2", ".zarray")).read())
    assert meta["compressor"]["cname"] == "zstd"
    ck = open(os.path.join(path, "xco2", "0.0.0"), "rb").read()
    assert ck[0] == 2 and (ck[2] >> 5) == 4  # zstd compressor code
    append_zarr(df1, path)
    assert verify_zarr(path)["ok"]
    ck1 = open(os.path.join(path, "xco2", "1.0.0"), "rb").read()
    assert (ck1[2] >> 5) == 4 or ck1[2] & 0x2  # still zstd (or memcpy)
    got, _ = Z.read_array(path, "xco2")
    want = _dense(rows0 + rows1, d0 + d1, "xco2")
    assert np.allclose(got, want, equal_nan=True)
    back = scan_zarr(spark, path)
    assert back.filter(back.variable == "xco2").count() == int(
        np.isfinite(want).sum()
    )
