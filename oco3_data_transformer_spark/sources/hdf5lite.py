"""Minimal pure-numpy HDF5 subset codec for S1 granule decode.

The reference opens NetCDF4 granules with h5netcdf (ref
readers/GranuleReader.py:45-155); NetCDF4 is HDF5 on disk. Neither
h5py/h5netcdf nor libhdf5 is reachable in this environment, so — exactly
like the CDF-1/CDF-5 and GeoTIFF encoders in sinks/containers.py — this
module implements the SUBSET of the public HDF5 File Format Specification
(version 1.0, "HDF5 File Format Specification Version 1.0"/II as published
by The HDF Group) that NetCDF4-style granules actually use:

  - superblock version 0, 8-byte offsets/lengths;
  - one root group, old-style layout: symbol-table message → v1 group
    B-tree → SNOD symbol nodes → local heap for link names;
  - v1 object headers with Dataspace (v1, simple, 1-D/2-D), Datatype
    (fixed-point and IEEE float, little-endian), Fill Value (v2), Data
    Layout (v3, contiguous AND chunked), Filter Pipeline (v1: deflate and
    byte-shuffle — the standard netCDF compression stack), Attribute (v1,
    numeric scalars such as ``_FillValue``), and Object Header
    Continuation blocks on the read side;
  - v1 raw-data-chunk B-trees: any depth on read AND write (nodes are
    capped at 64 entries = the 2K bound real readers assume from the
    default Indexed Storage K=32, since superblock v0 has no field for
    it; >64 chunks stack internal levels).

Out of scope (raises with a clear message): later superblock versions,
v2 B-trees / fractal heaps ("new-style" groups), variable-length and
compound datatypes, szip/fletcher32 filters. The wheel-backed decoders
remain preferred when importable (sources/granules.py) — this is the
fallback that makes `fmt='netcdf4'` granules decodable wheel-free, the
same contract the container sinks follow.

Round-trip tested plus byte-level spec goldens in tests/test_hdf5lite.py
(signature/superblock offsets, B-tree/SNOD/heap signatures, IEEE float
datatype property bytes), and exercised end-to-end through the granule
source in tests/test_granule_source.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# message type ids (spec IV.A.2)
_M_NIL = 0x0000
_M_DATASPACE = 0x0001
_M_DATATYPE = 0x0003
_M_FILLVALUE = 0x0005
_M_LAYOUT = 0x0008
_M_FILTERS = 0x000B
_M_ATTRIBUTE = 0x000C
_M_CONTINUATION = 0x0010
_M_SYMBOL_TABLE = 0x0011

_FILTER_DEFLATE = 1
_FILTER_SHUFFLE = 2


# ---------------------------------------------------------------------------
# datatype message <-> numpy dtype (fixed-point + IEEE float, little-endian)
# ---------------------------------------------------------------------------

def _dtype_message(dt: np.dtype) -> bytes:
    """Serialize a Datatype message body for a little-endian numeric dtype."""
    dt = np.dtype(dt)
    size = dt.itemsize
    if dt.kind == "f":
        # class 1 (float), version 1; IEEE layout properties per size
        classver = 0x11
        # bit field: byte order LE (bit0=0), mantissa normalization = 2
        # (implied msb) at bits 4-5, sign bit position in byte 1
        bits = bytes([0x20, size * 8 - 1, 0x00])
        if size == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        elif size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            raise ValueError(f"unsupported float size {size}")
    elif dt.kind in ("i", "u"):
        classver = 0x10  # class 0 (fixed-point), version 1
        bits = bytes([0x08 if dt.kind == "i" else 0x00, 0x00, 0x00])
        props = struct.pack("<HH", 0, size * 8)
    else:
        raise ValueError(f"unsupported dtype {dt}")
    return bytes([classver]) + bits + struct.pack("<I", size) + props


def _parse_dtype(body: bytes) -> np.dtype:
    classver = body[0]
    cls, ver = classver & 0x0F, classver >> 4
    if ver not in (1, 2, 3):
        raise ValueError(f"datatype message version {ver} unsupported")
    bits = body[1:4]
    (size,) = struct.unpack_from("<I", body, 4)
    if bits[0] & 0x01:
        raise ValueError("big-endian datatypes unsupported (granules are LE)")
    if cls == 1:  # float
        if size == 8:
            return np.dtype("<f8")
        if size == 4:
            return np.dtype("<f4")
        raise ValueError(f"float size {size} unsupported")
    if cls == 0:  # fixed-point
        kind = "i" if bits[0] & 0x08 else "u"
        if size in (1, 2, 4, 8):
            return np.dtype(f"<{kind}{size}")
        raise ValueError(f"fixed-point size {size} unsupported")
    raise ValueError(
        f"datatype class {cls} unsupported (numeric granule subset only)"
    )


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _dataspace_message(shape: tuple[int, ...]) -> bytes:
    head = struct.pack("<BBB5x", 1, len(shape), 0)  # v1, ndims, no maxdims
    return head + b"".join(struct.pack("<Q", d) for d in shape)


def _parse_dataspace(body: bytes) -> tuple[int, ...]:
    ver = body[0]
    if ver == 1:
        ndims, flags = body[1], body[2]
        off = 8
    elif ver == 2:
        ndims, flags = body[1], body[2]
        off = 4
    else:
        raise ValueError(f"dataspace version {ver} unsupported")
    dims = struct.unpack_from(f"<{ndims}Q", body, off)
    return tuple(int(d) for d in dims)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _message(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    block = b"".join(messages)
    # v1 prefix (12 bytes) + 4 bytes pad so the message block is 8-aligned
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(block)) + block


def _attribute_message(name: str, value: np.ndarray) -> bytes:
    value = np.ascontiguousarray(value)
    nm = name.encode() + b"\x00"
    dt = _dtype_message(value.dtype)
    sp = _dataspace_message(value.shape if value.shape else (1,))
    body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(sp))
    return body + _pad8(nm) + _pad8(dt) + _pad8(sp) + value.tobytes()


class _Blk:
    """Planned file block: size known up front, address assigned later."""

    def __init__(self, size: int):
        self.size, self.addr = size, 0


# v1 B-tree node capacity for raw-data-chunk (indexed storage) trees.
# Superblock v0 carries NO "Indexed Storage Internal Node K" field (that
# appears only in superblock v1), so real readers assume the library
# default K=32 → at most 2K = 64 entries per node.  Emitting a wider
# node produces a file libhdf5/h5py reject — the same out-of-spec
# failure mode the Group Leaf Node K fix (commit 65099d6) closed for
# symbol-table nodes, on the chunk side.
_CHUNK_BTREE_MAX_ENTRIES = 64


def _plan_dataset(
    a: np.ndarray, chunk_rows: int | None, compress: int
) -> dict:
    plan: dict = {"array": a}
    if chunk_rows is None:
        plan["data"] = [a.tobytes()]
    else:
        # zero-row arrays: keep the chunked layout message (chunk dims
        # must be > 0 per spec) but emit zero chunks and an UNDEF B-tree
        # address, which the reader already maps to an all-fill array.
        cshape = (max(1, min(chunk_rows, a.shape[0])),) + a.shape[1:]
        plan["cshape"] = cshape
        raws = []
        for i in range(0, a.shape[0], cshape[0]):
            chunk = np.zeros(cshape, a.dtype)
            part = a[i : i + cshape[0]]
            chunk[: part.shape[0]] = part
            raw = chunk.tobytes()
            if compress:
                # pipeline order: shuffle then deflate (netCDF default)
                raw = (
                    np.frombuffer(raw, np.uint8)
                    .reshape(-1, a.dtype.itemsize)
                    .T.tobytes()
                )
                raw = zlib.compress(raw, compress)
            raws.append(raw)
        plan["data"] = raws
        plan["starts"] = list(range(0, a.shape[0], cshape[0]))
        if raws:
            plan["bt_nodes"], plan["bt_blks"] = _plan_chunk_btree(
                len(raws), a.ndim
            )
            # layout message points at the root = first planned node
            plan["blk_btree"] = plan["bt_blks"][0]
    plan["blk_data"] = [_Blk(len(d)) for d in plan["data"]]
    return plan


def _plan_chunk_btree(nchunks: int, ndims: int) -> tuple[list[dict], list[_Blk]]:
    """Plan a v1 raw-data-chunk B-tree over ``nchunks`` chunks, splitting
    into multiple nodes (and levels) so no node exceeds
    ``_CHUNK_BTREE_MAX_ENTRIES``.  Returns node descriptors + their
    blocks, root first; each descriptor covers the chunk index range
    [lo, hi) and, at level > 0, holds the indices of its child nodes."""
    ksize = 8 + 8 * (ndims + 1)

    def node_size(nent: int) -> int:
        return 24 + (nent + 1) * ksize + nent * 8

    cap = _CHUNK_BTREE_MAX_ENTRIES
    # bottom level: leaves over chunk index ranges
    level_nodes: list[dict] = []
    nleaves = (nchunks + cap - 1) // cap
    per = (nchunks + nleaves - 1) // nleaves
    lo = 0
    while lo < nchunks:
        hi = min(lo + per, nchunks)
        level_nodes.append({"level": 0, "lo": lo, "hi": hi, "children": None})
        lo = hi
    levels = [level_nodes]
    # stack internal levels until a single root remains
    while len(levels[-1]) > 1:
        below = levels[-1]
        nnodes = (len(below) + cap - 1) // cap
        per_n = (len(below) + nnodes - 1) // nnodes
        lvl: list[dict] = []
        for s in range(0, len(below), per_n):
            grp = below[s : s + per_n]
            lvl.append(
                {
                    "level": grp[0]["level"] + 1,
                    "lo": grp[0]["lo"],
                    "hi": grp[-1]["hi"],
                    "children": list(range(s, s + len(grp))),
                }
            )
        levels.append(lvl)
    # flatten root-first; record each node's flat index per level for
    # child resolution
    nodes: list[dict] = []
    offsets: list[int] = []
    for lvl in reversed(levels):  # root level first
        offsets.append(len(nodes))
        nodes.extend(lvl)
    # child indices were per-level; rebase onto the flat list.  After the
    # reversed() flatten, level L sits at offsets[len(levels)-1-L].
    flat_off = {lv[0]["level"]: off for lv, off in zip(reversed(levels), offsets)}
    for n in nodes:
        if n["children"] is not None:
            n["children"] = [flat_off[n["level"] - 1] + c for c in n["children"]]
    blks = [
        _Blk(
            node_size(
                len(n["children"])
                if n["children"] is not None
                else n["hi"] - n["lo"]
            )
        )
        for n in nodes
    ]
    return nodes, blks


class _GroupPlan:
    """One group's blocks: object header, v1 B-tree (single leaf), SNOD,
    local heap; children are (name → _GroupPlan | dataset plan)."""

    def __init__(self, tree: dict, chunk_rows, compress, attrs, path=""):
        self.children: dict[str, object] = {}
        for name in sorted(tree):
            node = tree[name]
            sub = f"{path}{name}/"
            if isinstance(node, dict):
                self.children[name] = _GroupPlan(
                    node, chunk_rows, compress, attrs, sub
                )
            else:
                p = _plan_dataset(node, chunk_rows, compress)
                p["attrs"] = attrs.get(sub[:-1], {})
                p["blk_oh"] = _Blk(
                    len(_object_header(_ds_messages(p, p["attrs"], compress)))
                )
                self.children[name] = p
        # local heap: offset 0 = reserved empty string, then child names
        heap_data = bytearray(b"\x00" * 8)
        self.name_off: dict[str, int] = {}
        for n in self.children:
            self.name_off[n] = len(heap_data)
            heap_data += n.encode() + b"\x00"
        self.heap_data = _pad8(bytes(heap_data))
        self.blk_oh = _Blk(
            len(_object_header([_message(_M_SYMBOL_TABLE, b"\x00" * 16)]))
        )
        self.blk_btree = _Blk(24 + 3 * 8)  # 1 leaf, 1 child SNOD
        self.blk_snod = _Blk(8 + 40 * len(self.children))
        self.blk_heap = _Blk(32)
        self.blk_heap_seg = _Blk(len(self.heap_data))

    def blocks(self) -> list[_Blk]:
        out = [
            self.blk_oh, self.blk_btree, self.blk_snod,
            self.blk_heap, self.blk_heap_seg,
        ]
        for child in self.children.values():
            if isinstance(child, _GroupPlan):
                out.extend(child.blocks())
            else:
                out.append(child["blk_oh"])
                out.extend(child.get("bt_blks", []))
                out.extend(child["blk_data"])
        return out

    def serialize(self, out: bytearray, compress: bool) -> None:
        assert len(out) == self.blk_oh.addr
        out += _object_header(
            [
                _message(
                    _M_SYMBOL_TABLE,
                    struct.pack("<QQ", self.blk_btree.addr, self.blk_heap.addr),
                )
            ]
        )
        names = list(self.children)
        last_off = self.name_off[names[-1]] if names else 0
        out += (
            b"TREE"
            + struct.pack("<BBH", 0, 0, 1)
            + struct.pack("<QQ", _UNDEF, _UNDEF)
            + struct.pack("<QQQ", 0, self.blk_snod.addr, last_off)
        )
        snod = b"SNOD" + struct.pack("<BxH", 1, len(names))
        for n in names:
            child = self.children[n]
            oh = child.blk_oh if isinstance(child, _GroupPlan) else child["blk_oh"]
            snod += struct.pack("<QQI4x16x", self.name_off[n], oh.addr, 0)
        out += snod
        out += b"HEAP" + struct.pack(
            "<B3xQQQ", 0, len(self.heap_data), _UNDEF, self.blk_heap_seg.addr
        )
        out += self.heap_data
        for n in names:
            child = self.children[n]
            if isinstance(child, _GroupPlan):
                child.serialize(out, compress)
                continue
            p = child
            out += _object_header(_ds_messages(p, p["attrs"], compress))
            if "bt_nodes" in p:
                _serialize_chunk_btree(out, p)
            for raw in p["data"]:
                out += raw


def _serialize_chunk_btree(out: bytearray, p: dict) -> None:
    """Emit the planned chunk B-tree nodes (root first, then by level).
    Key ``i`` describes chunk ``i`` (size, mask=0, row offset); the
    sentinel key one past the last chunk carries the one-past-the-end
    row offset, matching libhdf5's right-edge key convention.  Internal
    node key ``j`` is the left key of child ``j``'s subtree."""
    a = p["array"]
    nd = a.ndim
    nchunks = len(p["data"])

    def key(i: int) -> bytes:
        if i < nchunks:
            size, start = len(p["data"][i]), p["starts"][i]
        else:
            size, start = 0, p["starts"][-1] + p["cshape"][0]
        return struct.pack("<II", size, 0) + struct.pack(
            f"<{nd + 1}Q", start, *([0] * nd)
        )

    nodes, blks = p["bt_nodes"], p["bt_blks"]
    # sibling pointers: adjacent nodes at the same level
    sib: dict[int, tuple[int, int]] = {}
    for lvl in {n["level"] for n in nodes}:
        idxs = [i for i, n in enumerate(nodes) if n["level"] == lvl]
        for j, i in enumerate(idxs):
            left = blks[idxs[j - 1]].addr if j > 0 else _UNDEF
            right = blks[idxs[j + 1]].addr if j + 1 < len(idxs) else _UNDEF
            sib[i] = (left, right)
    # blocks were planned root-first, but file addresses are in plan
    # order, so serialize in that same order
    for i, (n, blk) in enumerate(zip(nodes, blks)):
        assert len(out) == blk.addr
        if n["children"] is None:  # leaf: children are chunk data blocks
            ents = list(range(n["lo"], n["hi"]))
            childaddr = [p["blk_data"][c].addr for c in ents]
            bounds = ents + [n["hi"]]
        else:  # internal: children are lower B-tree nodes
            childaddr = [blks[c].addr for c in n["children"]]
            bounds = [nodes[c]["lo"] for c in n["children"]] + [n["hi"]]
        bt = (
            b"TREE"
            + struct.pack("<BBH", 1, n["level"], len(childaddr))
            + struct.pack("<QQ", *sib[i])
        )
        for b, addr in zip(bounds, childaddr):
            bt += key(b) + struct.pack("<Q", addr)
        bt += key(bounds[-1])
        assert len(bt) == blk.size, (len(bt), blk.size)
        out += bt


def write_hdf5(
    datasets: dict[str, np.ndarray],
    attrs: dict[str, dict[str, float]] | None = None,
    chunk_rows: int | None = None,
    compress: int = 0,
) -> bytes:
    """Encode numeric arrays as a minimal HDF5 file. Dataset names may be
    '/'-separated paths ("Retrieval/xco2") — intermediate groups are
    created, mirroring the netCDF4 variable-group layout the reference
    projects (ref readers/GranuleReader.py:115-117, group= selection).

    ``chunk_rows``: rows per chunk along axis 0 (None = contiguous
    layout). ``compress``: zlib level 1-9 for shuffle+deflate chunks
    (0/False = uncompressed; True = level 4; requires ``chunk_rows`` —
    HDF5 only filters chunked layouts, per spec).
    ``attrs``: per-dataset numeric scalar attributes keyed by the same
    path (e.g. ``{"Retrieval/xco2": {"_FillValue": -999999.0}}``).
    """
    compress = 4 if compress is True else int(compress)
    if compress and chunk_rows is None:
        raise ValueError("compression requires chunked layout (chunk_rows)")
    attrs = attrs or {}
    tree: dict = {}
    for name, arr in datasets.items():
        parts = [p for p in name.split("/") if p]
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"{name}: path collides with a dataset")
        node[parts[-1]] = np.ascontiguousarray(arr)

    root = _GroupPlan(tree, chunk_rows, compress, attrs)
    sb = _Blk(96)
    order = [sb] + root.blocks()
    pos = 0
    for b in order:
        b.addr = pos
        pos += b.size
    eof = pos

    # Group Leaf Node K bounds a symbol table node at 2K entries (spec
    # III.C); this writer emits ONE SNOD per group, so K must cover the
    # widest group or the file is out-of-spec for real readers (granules
    # routinely carry dozens of variables per group).
    def max_children(g: _GroupPlan) -> int:
        return max(
            [len(g.children)]
            + [
                max_children(c)
                for c in g.children.values()
                if isinstance(c, _GroupPlan)
            ]
        )

    leaf_k = max(4, (max_children(root) + 1) // 2)

    out = bytearray()
    out += (
        _SIG
        + struct.pack("<BBBxB BBx HH I", 0, 0, 0, 0, 8, 8, leaf_k, 16, 0)
        + struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
        # root symbol table entry: name offset 0, root OH addr, cached stab
        + struct.pack(
            "<QQI4xQQ", 0, root.blk_oh.addr, 1,
            root.blk_btree.addr, root.blk_heap.addr,
        )
    )
    assert len(out) == 96
    root.serialize(out, compress)
    assert len(out) == eof, (len(out), eof)
    return bytes(out)


def _ds_messages(plan: dict, ds_attrs: dict[str, float], compress: int) -> list[bytes]:
    """Dataset object-header messages; addresses read from plan blocks
    (zero placeholders before layout)."""
    a = plan["array"]
    msgs = [
        _message(_M_DATASPACE, _dataspace_message(a.shape)),
        _message(_M_DATATYPE, _dtype_message(a.dtype)),
        # fill value v2: alloc time 2 (early), write time 0, undefined
        _message(_M_FILLVALUE, struct.pack("<BBBB", 2, 2, 0, 0)),
    ]
    if "cshape" in plan:
        # layout v3 chunked (spec IV.A.2.i): version, class, dimensionality
        # (= ndims+1), B-tree address, chunk dims (4B each), element size —
        # properties immediately follow the class byte, NO padding.
        # Zero-row datasets have no chunks: UNDEF B-tree address (the
        # reader returns an all-fill array for that, per spec semantics).
        cshape = plan["cshape"]
        bt_addr = plan["blk_btree"].addr if "blk_btree" in plan else _UNDEF
        body = struct.pack("<BBB", 3, 2, len(cshape) + 1)
        body += struct.pack("<Q", bt_addr)
        body += b"".join(struct.pack("<I", c) for c in cshape)
        body += struct.pack("<I", a.dtype.itemsize)
        msgs.append(_message(_M_LAYOUT, body))
        if compress:
            fl = struct.pack("<BB6x", 1, 2)
            fl += struct.pack("<HHHH", _FILTER_SHUFFLE, 0, 1, 1)
            fl += struct.pack("<I4x", a.dtype.itemsize)  # odd count: 4B pad
            fl += struct.pack("<HHHH", _FILTER_DEFLATE, 0, 1, 1)
            fl += struct.pack("<I4x", compress)  # client value = zlib level
            msgs.append(_message(_M_FILTERS, fl))
    else:
        # layout v3 contiguous: version, class, address, size — unpadded
        addr = plan["blk_data"][0].addr
        body = struct.pack("<BB", 3, 1) + struct.pack("<QQ", addr, a.nbytes)
        msgs.append(_message(_M_LAYOUT, body))
    for k in sorted(ds_attrs):
        msgs.append(
            _message(
                _M_ATTRIBUTE,
                _attribute_message(k, np.asarray(ds_attrs[k], np.float64)),
            )
        )
    return msgs


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _read_messages(data: bytes, oh_addr: int) -> list[tuple[int, bytes]]:
    """All (type, body) messages of a v1 object header, following
    continuation blocks."""
    ver, nmsgs, _refs, hsize = struct.unpack_from("<BxHII", data, oh_addr)
    if ver != 1:
        raise ValueError(
            f"object header version {ver} unsupported (v1 subset)"
        )
    spans = [(oh_addr + 16, hsize)]
    msgs: list[tuple[int, bytes]] = []
    seen = 0  # nmsgs counts continuation and NIL messages too
    while spans and seen < nmsgs:
        pos, remaining = spans.pop(0)
        while remaining >= 8 and seen < nmsgs:
            mtype, msize, _flags = struct.unpack_from("<HHB3x", data, pos)
            body = data[pos + 8 : pos + 8 + msize]
            pos += 8 + msize
            remaining -= 8 + msize
            seen += 1
            if mtype == _M_CONTINUATION:
                caddr, clen = struct.unpack_from("<QQ", body, 0)
                spans.append((caddr, clen))
            elif mtype != _M_NIL:
                msgs.append((mtype, body))
    return msgs


def _walk_group_btree(data: bytes, addr: int) -> list[int]:
    """v1 group B-tree → SNOD addresses (any depth)."""
    assert data[addr : addr + 4] == b"TREE", "expected group B-tree node"
    ntype, level, nent = struct.unpack_from("<BBH", data, addr + 4)
    if ntype != 0:
        raise ValueError("expected group (type 0) B-tree node")
    base = addr + 24
    children = [
        struct.unpack_from("<Q", data, base + 8 + i * 16)[0]
        for i in range(nent)
    ]
    if level == 0:
        return children
    out: list[int] = []
    for c in children:
        out.extend(_walk_group_btree(data, c))
    return out


def _walk_chunk_btree(
    data: bytes, addr: int, ndims: int
) -> list[tuple[int, int, tuple[int, ...], int]]:
    """v1 raw-data-chunk B-tree → (size, filter_mask, offsets, address)."""
    assert data[addr : addr + 4] == b"TREE", "expected chunk B-tree node"
    ntype, level, nent = struct.unpack_from("<BBH", data, addr + 4)
    if ntype != 1:
        raise ValueError("expected raw-data (type 1) B-tree node")
    ksize = 8 + 8 * (ndims + 1)
    pos = addr + 24
    recs = []
    for _ in range(nent):
        size, mask = struct.unpack_from("<II", data, pos)
        offs = struct.unpack_from(f"<{ndims + 1}Q", data, pos + 8)
        (child,) = struct.unpack_from("<Q", data, pos + ksize)
        recs.append((size, mask, tuple(int(o) for o in offs[:ndims]), child))
        pos += ksize + 8
    if level == 0:
        return recs
    out = []
    for _, _, _, child in recs:
        out.extend(_walk_chunk_btree(data, child, ndims))
    return out


def _parse_attribute(body: bytes) -> tuple[str, np.ndarray] | None:
    ver = body[0]
    if ver != 1:
        return None  # v2/v3 attrs (new-format files) — skip, not needed
    nlen, dtlen, splen = struct.unpack_from("<HHH", body, 2)
    pos = 8
    name = body[pos : pos + nlen].split(b"\x00", 1)[0].decode()
    pos += nlen + (-nlen % 8)
    try:
        dt = _parse_dtype(body[pos : pos + dtlen])
    except ValueError:
        return None  # string/compound attribute — irrelevant metadata
    pos += dtlen + (-dtlen % 8)
    shape = _parse_dataspace(body[pos : pos + splen]) or (1,)
    pos += splen + (-splen % 8)
    n = int(np.prod(shape))
    val = np.frombuffer(body, dt, count=n, offset=pos).reshape(shape)
    return name, val


def read_hdf5(
    data: bytes, variables: list[str] | None = None
) -> tuple[dict[str, np.ndarray], dict[str, dict[str, np.ndarray]]]:
    """Decode the supported HDF5 subset. Returns ``(arrays, attrs)`` —
    root-group numeric datasets by name (optionally projected to
    ``variables`` — column pruning happens before any data byte is
    touched) and their numeric attributes (e.g. ``_FillValue``)."""
    if data[:8] != _SIG:
        raise ValueError("not an HDF5 file (bad signature)")
    sbver = data[8]
    if sbver != 0:
        raise ValueError(
            f"superblock version {sbver} unsupported (v0 subset; "
            "re-save with netCDF4 default/classic-model settings)"
        )
    size_off, size_len = data[13], data[14]
    if (size_off, size_len) != (8, 8):
        raise ValueError("only 8-byte offsets/lengths supported")
    # superblock v0 fixed part is 56 bytes; the root symbol table entry
    # follows: name_off(8) oh_addr(8) cache(4) pad(4) scratch(16)
    (root_oh,) = struct.unpack_from("<Q", data, 56 + 8)

    btree_addr = heap_addr = None
    for mtype, body in _read_messages(data, root_oh):
        if mtype == _M_SYMBOL_TABLE:
            btree_addr, heap_addr = struct.unpack_from("<QQ", body, 0)
    if btree_addr is None:
        raise ValueError(
            "root group has no symbol table (new-style v2 groups "
            "unsupported — re-save without latest-format flags)"
        )

    arrays: dict[str, np.ndarray] = {}
    attrs: dict[str, dict[str, np.ndarray]] = {}

    def walk_group(btree_addr: int, heap_addr: int, prefix: str) -> None:
        if data[heap_addr : heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        (heap_seg,) = struct.unpack_from("<Q", data, heap_addr + 24)

        def heap_name(off: int) -> str:
            end = data.index(b"\x00", heap_seg + off)
            return data[heap_seg + off : end].decode()

        entries: list[tuple[str, int]] = []
        for snod in _walk_group_btree(data, btree_addr):
            assert data[snod : snod + 4] == b"SNOD"
            (nsym,) = struct.unpack_from("<H", data, snod + 6)
            for i in range(nsym):
                base = snod + 8 + i * 40
                noff, oaddr = struct.unpack_from("<QQ", data, base)
                entries.append((heap_name(noff), oaddr))

        for name, oaddr in entries:
            path = prefix + name
            shape: tuple[int, ...] | None = None
            dt: np.dtype | None = None
            layout = None
            filters: list[tuple[int, int]] = []  # (id, client value)
            a_attrs: dict[str, np.ndarray] = {}
            stab = None
            for mtype, body in _read_messages(data, oaddr):
                if mtype == _M_DATASPACE:
                    shape = _parse_dataspace(body)
                elif mtype == _M_DATATYPE:
                    dt = _parse_dtype(body)
                elif mtype == _M_LAYOUT:
                    layout = body
                elif mtype == _M_FILTERS:
                    filters = _parse_filters(body)
                elif mtype == _M_SYMBOL_TABLE:
                    stab = struct.unpack_from("<QQ", body, 0)
                elif mtype == _M_ATTRIBUTE:
                    kv = _parse_attribute(body)
                    if kv:
                        a_attrs[kv[0]] = kv[1]
            if stab is not None:  # sub-group (netCDF variable group)
                walk_group(stab[0], stab[1], path + "/")
                continue
            if shape is None or dt is None or layout is None:
                continue  # neither dataset nor old-style group — skip
            # projection matches the full path OR the leaf name, so
            # callers can say 'xco2' without knowing the group layout
            if variables is not None and not (
                path in variables or name in variables
            ):
                continue
            arrays[path] = _read_data(data, layout, shape, dt, filters)
            attrs[path] = a_attrs

    walk_group(btree_addr, heap_addr, "")
    return arrays, attrs


def _parse_filters(body: bytes) -> list[tuple[int, int]]:
    ver, nf = body[0], body[1]
    if ver != 1:
        raise ValueError(f"filter pipeline version {ver} unsupported")
    pos = 8
    out = []
    for _ in range(nf):
        fid, nlen, _flags, ncv = struct.unpack_from("<HHHH", body, pos)
        pos += 8 + nlen
        cvs = struct.unpack_from(f"<{ncv}I", body, pos)
        pos += 4 * ncv + (4 if ncv % 2 else 0)
        if fid not in (_FILTER_DEFLATE, _FILTER_SHUFFLE):
            raise ValueError(
                f"filter id {fid} unsupported (deflate/shuffle subset)"
            )
        out.append((fid, cvs[0] if cvs else 0))
    return out


def _read_data(
    data: bytes,
    layout: bytes,
    shape: tuple[int, ...],
    dt: np.dtype,
    filters: list[tuple[int, int]],
) -> np.ndarray:
    ver, lclass = layout[0], layout[1]
    if ver != 3:
        raise ValueError(f"data layout version {ver} unsupported")
    if lclass == 1:  # contiguous: address(8) + size(8) at offset 2
        addr, size = struct.unpack_from("<QQ", layout, 2)
        if addr == _UNDEF:
            return np.zeros(shape, dt)
        return (
            np.frombuffer(data, dt, count=size // dt.itemsize, offset=addr)
            .reshape(shape)
            .copy()
        )
    if lclass != 2:
        raise ValueError(f"layout class {lclass} unsupported")
    ndims_p1 = layout[2]
    (bt_addr,) = struct.unpack_from("<Q", layout, 3)
    cdims = struct.unpack_from(f"<{ndims_p1 - 1}I", layout, 11)
    cshape = tuple(int(c) for c in cdims)
    out = np.zeros(shape, dt)
    if bt_addr == _UNDEF:
        return out
    for size, mask, offs, addr in _walk_chunk_btree(data, bt_addr, len(shape)):
        raw = data[addr : addr + size]
        # filters applied in reverse pipeline order; mask bit i set = skip
        for i in range(len(filters) - 1, -1, -1):
            fid, cv = filters[i]
            if mask & (1 << i):
                continue
            if fid == _FILTER_DEFLATE:
                raw = zlib.decompress(raw)
            elif fid == _FILTER_SHUFFLE:
                raw = (
                    np.frombuffer(raw, np.uint8)
                    .reshape(dt.itemsize, -1)
                    .T.tobytes()
                )
        chunk = np.frombuffer(raw, dt, count=int(np.prod(cshape))).reshape(
            cshape
        )
        sl = tuple(
            slice(o, min(o + c, s)) for o, c, s in zip(offs, cshape, shape)
        )
        clip = tuple(slice(0, s.stop - s.start) for s in sl)
        out[sl] = chunk[clip]
    return out
