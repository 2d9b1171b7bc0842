"""Pure-numpy 2-D Delaunay triangulation + piecewise-linear interpolation.

Closes the last semantic gap of the G1 gridding kernel: the reference runs
``scipy.interpolate.griddata(..., method='linear')`` (ref
processors/OCO3SamProcessor.py:161-182), which is Qhull Delaunay +
barycentric interpolation, NaN outside the convex hull. scipy has no wheel
reachable from this environment (install attempt documented in ROADMAP.md),
so the same math is implemented here from the public textbook algorithms:

- :func:`delaunay` — Bowyer-Watson incremental insertion (Bowyer 1981,
  Watson 1981). Per inserted point the circumcircle test over all live
  triangles is a single vectorized numpy expression, so the Python-level
  work is O(n) iterations of C-speed array ops (O(n^2) worst case total —
  fine for the per-(day, region) group sizes this kernel sees; groups are
  the parallel unit, the triangulation never crosses groups).
- :func:`linear_griddata` — barycentric point location over the mesh,
  chunked so peak memory is bounded regardless of triangle count.

Semantics notes vs scipy (pinned by tests/test_delaunay.py):
- On general-position inputs any Delaunay triangulation yields the same
  interpolant wherever the triangulation is unique; piecewise-linear
  interpolation reproduces affine functions exactly (the differential
  oracle used by the tests, plus a brute-force empty-circumcircle
  reference triangulation).
- Co-circular point sets have non-unique Delaunay diagonals; scipy/Qhull
  and this kernel may pick different (both valid) diagonals there.
- Degenerate inputs (all points collinear): Qhull raises; this kernel
  returns an all-NaN grid (no triangles → every cell outside the hull),
  which is the graceful behaviour the pipeline wants.
- Exact duplicate coordinates are collapsed keeping the first occurrence
  (Qhull merges them too).
"""

from __future__ import annotations

import numpy as np

_EPS_CIRCUM = 1e-12  # relative slack on the in-circumcircle test
_EPS_BARY = 1e-9  # slack on barycentric inside-test (points on edges)


def _circumcircles(a: np.ndarray, b: np.ndarray, c: np.ndarray):
    """Circumcenter + squared radius for each triangle (vectorized).
    Degenerate (collinear) triangles get an infinite circumcircle so any
    later insertion clears them out of the mesh."""
    d = 2.0 * (
        a[:, 0] * (b[:, 1] - c[:, 1])
        + b[:, 0] * (c[:, 1] - a[:, 1])
        + c[:, 0] * (a[:, 1] - b[:, 1])
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        a2 = (a * a).sum(1)
        b2 = (b * b).sum(1)
        c2 = (c * c).sum(1)
        ux = (
            a2 * (b[:, 1] - c[:, 1])
            + b2 * (c[:, 1] - a[:, 1])
            + c2 * (a[:, 1] - b[:, 1])
        ) / d
        uy = (
            a2 * (c[:, 0] - b[:, 0])
            + b2 * (a[:, 0] - c[:, 0])
            + c2 * (b[:, 0] - a[:, 0])
        ) / d
    cc = np.column_stack([ux, uy])
    r2 = ((a - cc) ** 2).sum(1)
    bad = ~np.isfinite(r2)
    if bad.any():
        cc[bad] = 0.0
        r2[bad] = np.inf
    return cc, r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """Delaunay triangulation of ``points`` (n, 2) → int array (m, 3) of
    vertex indices. Empty result for n < 3 or fully degenerate input."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # normalize into the unit square for numeric stability
    lo = pts.min(axis=0)
    span = float(np.max(pts.max(axis=0) - lo))
    if span <= 0.0:
        return np.empty((0, 3), dtype=np.int64)  # all points identical
    p = (pts - lo) / span
    # super-triangle comfortably containing the unit square
    verts = np.vstack([p, [[-10.0, -10.0], [30.0, -10.0], [-10.0, 30.0]]])
    tris = np.array([[n, n + 1, n + 2]], dtype=np.int64)
    cc, r2 = _circumcircles(verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]])
    for i in range(n):
        q = verts[i]
        d2 = ((cc - q) ** 2).sum(1)
        bad = d2 <= r2 * (1.0 + _EPS_CIRCUM)
        if not bad.any():
            # numerically outside every circumcircle (can only happen on a
            # duplicate/near-duplicate of an existing vertex) — skip it
            continue
        bad_tris = tris[bad]
        edges = bad_tris[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2)
        edges = np.sort(edges, axis=1)
        uniq, counts = np.unique(edges, axis=0, return_counts=True)
        boundary = uniq[counts == 1]
        keep = ~bad
        new = np.column_stack(
            [np.full(len(boundary), i, dtype=np.int64), boundary]
        )
        ncc, nr2 = _circumcircles(verts[new[:, 0]], verts[new[:, 1]], verts[new[:, 2]])
        tris = np.vstack([tris[keep], new])
        cc = np.vstack([cc[keep], ncc])
        r2 = np.concatenate([r2[keep], nr2])
    # drop triangles that use a super-triangle vertex
    real = (tris < n).all(axis=1)
    return np.sort(tris[real], axis=1)


def linear_interpolate(
    pts: np.ndarray,
    values: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
) -> np.ndarray:
    """Piecewise-linear (barycentric) interpolation of scattered ``pts``
    (n, 2) / ``values`` (n,) at query locations — NaN outside the convex
    hull. Exact duplicate coordinates collapse to the first occurrence."""
    pts = np.asarray(pts, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    _, first = np.unique(pts, axis=0, return_index=True)
    if len(first) != len(pts):
        keep = np.sort(first)
        pts, values = pts[keep], values[keep]
    out = np.full(len(qx), np.nan)
    tri = delaunay(pts)
    if len(tri) == 0:
        return out
    a, b, c = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (
        a[:, 1] - c[:, 1]
    )
    det = np.where(det == 0.0, np.nan, det)
    va, vb, vc = values[tri[:, 0]], values[tri[:, 1]], values[tri[:, 2]]
    scale = max(
        1.0, float(np.max(np.abs(pts[:, 0]))), float(np.max(np.abs(pts[:, 1])))
    )
    eps = _EPS_BARY * scale
    chunk = max(1, 4_000_000 // max(1, len(tri)))
    for s in range(0, len(qx), chunk):
        e = min(s + chunk, len(qx))
        dx = qx[s:e, None] - c[None, :, 0]
        dy = qy[s:e, None] - c[None, :, 1]
        l1 = ((b[:, 1] - c[:, 1])[None, :] * dx + (c[:, 0] - b[:, 0])[None, :] * dy) / det
        l2 = ((c[:, 1] - a[:, 1])[None, :] * dx + (a[:, 0] - c[:, 0])[None, :] * dy) / det
        l3 = 1.0 - l1 - l2
        inside = (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
        has = inside.any(axis=1)
        ti = inside.argmax(axis=1)
        rows = np.arange(e - s)
        vals_q = (
            l1[rows, ti] * va[ti] + l2[rows, ti] * vb[ti] + l3[rows, ti] * vc[ti]
        )
        out[s:e][has] = vals_q[has]
    return out


def linear_griddata(
    pts_lon: np.ndarray,
    pts_lat: np.ndarray,
    values: np.ndarray,
    mesh_lon: np.ndarray,
    mesh_lat: np.ndarray,
) -> np.ndarray:
    """griddata(method='linear') over a rectangular mesh: returns
    (n_lat, n_lon) with NaN outside the convex hull of the points."""
    glon, glat = np.meshgrid(
        np.asarray(mesh_lon, dtype=np.float64),
        np.asarray(mesh_lat, dtype=np.float64),
    )
    flat = linear_interpolate(
        np.column_stack([np.asarray(pts_lon, np.float64), np.asarray(pts_lat, np.float64)]),
        values,
        glon.ravel(),
        glat.ravel(),
    )
    return flat.reshape(glat.shape)
