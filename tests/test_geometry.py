"""Geometry predicates (G8/J4-refine) vs brute-force ground truth.

The box×polygon intersection must match shapely's ``box(...).intersects``
semantics for simple polygons (shapely itself is unavailable here); ground
truth below is dense point sampling + exact edge tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from oco3_data_transformer_spark.operators.geometry import (
    boxes_intersect_polygons,
    points_in_polygon,
    scale_footprint,
)

SQUARE = (np.array([0.0, 2.0, 2.0, 0.0]), np.array([0.0, 0.0, 2.0, 2.0]))
DIAMOND = (np.array([1.0, 2.0, 1.0, 0.0]), np.array([0.0, 1.0, 2.0, 1.0]))


def one_box(bx0, by0, bx1, by1, poly):
    px, py = poly
    return boxes_intersect_polygons(
        np.array([bx0]), np.array([by0]), np.array([bx1]), np.array([by1]),
        px[None, :], py[None, :],
    )[0]


def test_point_in_polygon_basic():
    px, py = SQUARE
    xs = np.array([1.0, 3.0, -0.5, 1.999])
    ys = np.array([1.0, 1.0, 1.0, 0.001])
    got = points_in_polygon(xs, ys, px, py)
    assert got.tolist() == [True, False, False, True]


def test_box_fully_inside_polygon():
    assert one_box(0.5, 0.5, 1.5, 1.5, SQUARE)


def test_polygon_fully_inside_box():
    assert one_box(-1, -1, 3, 3, SQUARE)


def test_disjoint():
    assert not one_box(5, 5, 6, 6, SQUARE)


def test_edge_crossing_no_vertex_containment():
    # Tall thin box crossing the diamond's waist: no diamond vertex in the
    # box, no box corner in the diamond, but edges cross.
    assert one_box(0.9, -5, 1.1, 5, DIAMOND)


def test_corner_touch_counts_as_intersecting():
    # Shares only the single point (2,2) with the square.
    assert one_box(2.0, 2.0, 3.0, 3.0, SQUARE)


def test_near_miss_outside_diamond_corner():
    # Box in the corner region outside the diamond but inside its bbox.
    assert not one_box(0.0, 0.0, 0.4, 0.4, DIAMOND)


def test_vectorized_rows_independent():
    px = np.stack([SQUARE[0], DIAMOND[0]])
    py = np.stack([SQUARE[1], DIAMOND[1]])
    got = boxes_intersect_polygons(
        np.array([5.0, 0.9]), np.array([5.0, -5.0]),
        np.array([6.0, 1.1]), np.array([6.0, 5.0]), px, py,
    )
    assert got.tolist() == [False, True]


def test_scale_footprint_clamps_to_reference_range():
    lons = np.array([[0.0, 2.0, 2.0, 0.0]])
    lats = np.array([[0.0, 0.0, 2.0, 2.0]])
    sx, sy = scale_footprint(lons, lats, 2.0)  # clamped to 1.5
    assert sx.max() == pytest.approx(1.0 + 1.5)
    assert sy.min() == pytest.approx(1.0 - 1.5)
    sx1, _ = scale_footprint(lons, lats, 0.5)  # clamped to 1.0 (no shrink)
    np.testing.assert_allclose(sx1, lons)


def test_random_boxes_match_sampled_ground_truth():
    rng = np.random.default_rng(7)
    px, py = DIAMOND
    for _ in range(200):
        x0, y0 = rng.uniform(-1, 3, 2)
        w, h = rng.uniform(0.05, 1.5, 2)
        x1, y1 = x0 + w, y0 + h
        got = one_box(x0, y0, x1, y1, DIAMOND)
        # ground truth: dense sample of the box tested against the polygon,
        # plus polygon vertices tested against the box
        gx, gy = np.meshgrid(np.linspace(x0, y1 * 0 + x1, 30), np.linspace(y0, y1, 30))
        any_in = points_in_polygon(gx.ravel(), gy.ravel(), px, py).any()
        vert_in = ((px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)).any()
        truth = bool(any_in or vert_in)
        if truth:
            assert got, (x0, y0, x1, y1)
        # (sampling can miss grazing intersections, so only assert one way)
