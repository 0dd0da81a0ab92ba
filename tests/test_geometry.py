"""geometry kernels vs the independent scalar oracle (different algorithms)."""

from __future__ import annotations

import math

import numpy as np

from mosaic_engine import geometry as geo
from tests import oracle


def _random_ring(rng, nvert=6, cx=0.0, cy=0.0, r=1.0):
    """Random simple star-shaped closed ring around (cx, cy)."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, nvert))
    radii = rng.uniform(0.3 * r, r, nvert)
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    xs = np.append(xs, xs[0])
    ys = np.append(ys, ys[0])
    return xs, ys


def test_points_in_polys_random_vs_oracle():
    rng = np.random.default_rng(42)
    xs_l, ys_l, px, py = [], [], [], []
    for _ in range(300):
        xs, ys = _random_ring(rng, nvert=int(rng.integers(3, 12)))
        xs_l.append(xs)
        ys_l.append(ys)
        px.append(rng.uniform(-1.2, 1.2))
        py.append(rng.uniform(-1.2, 1.2))
    RX, RY, nv = geo.pad_rings(xs_l, ys_l)
    got = geo.points_in_polys(np.array(px), np.array(py), RX, RY)
    for i in range(300):
        ring = list(zip(xs_l[i], ys_l[i]))
        assert got[i] == oracle.point_in_ring(px[i], py[i], ring), i


def test_points_on_boundary_are_inside():
    # unit square, points on edges/vertices count as inside
    xs = [0.0, 1.0, 1.0, 0.0, 0.0]
    ys = [0.0, 0.0, 1.0, 1.0, 0.0]
    RX, RY, nv = geo.pad_rings([xs] * 5, [ys] * 5)
    px = np.array([0.0, 1.0, 0.5, 0.5, 1.0])
    py = np.array([0.0, 1.0, 0.0, 1.0, 0.5])
    assert geo.points_in_polys(px, py, RX, RY).all()
    # and just outside is outside
    RX, RY, nv = geo.pad_rings([xs] * 2, [ys] * 2)
    assert not geo.points_in_polys(
        np.array([-1e-9, 1.0 + 1e-6]), np.array([0.5, 0.5]), RX, RY
    ).any()


def test_polys_intersect_boxes_random_vs_oracle():
    rng = np.random.default_rng(7)
    xs_l, ys_l = [], []
    boxes = []
    idx = []
    for p in range(120):
        xs, ys = _random_ring(rng, nvert=int(rng.integers(3, 10)))
        xs_l.append(xs)
        ys_l.append(ys)
        for _ in range(6):
            cx, cy = rng.uniform(-1.5, 1.5, 2)
            hw, hh = rng.uniform(0.05, 0.8, 2)
            boxes.append((cx - hw, cy - hh, cx + hw, cy + hh))
            idx.append(p)
    RX, RY, nv = geo.pad_rings(xs_l, ys_l)
    bw, bs, be, bn = (np.array(v) for v in zip(*boxes))
    got = geo.polys_intersect_boxes(RX, RY, nv, np.array(idx), bw, bs, be, bn)
    for k, p in enumerate(idx):
        ring = list(zip(xs_l[p], ys_l[p]))
        exp = oracle.ring_intersects_box(ring, bw[k], bs[k], be[k], bn[k])
        assert got[k] == exp, (k, p)


def test_box_inside_polygon_and_vice_versa():
    # big square ring
    xs = [-2.0, 2.0, 2.0, -2.0, -2.0]
    ys = [-2.0, -2.0, 2.0, 2.0, -2.0]
    RX, RY, nv = geo.pad_rings([xs, xs], [ys, ys])
    # box fully inside polygon (no vertex/corner/edge coincidence… corners
    # of the box ARE inside the polygon, so rule (b) fires)
    got = geo.polys_intersect_boxes(
        RX,
        RY,
        nv,
        np.array([0, 1]),
        np.array([-0.5, -10.0]),
        np.array([-0.5, -10.0]),
        np.array([0.5, 10.0]),
        np.array([0.5, 10.0]),
    )
    assert got.all()  # second case: polygon fully inside box → vertex rule


def test_bbox_overlap_but_no_intersection():
    # thin diagonal triangle near origin vs box in the opposite corner of
    # its bbox — bboxes overlap, exact test must reject (SURVEY FIXTURES §1)
    xs = [0.0, 10.0, 10.0, 0.0]
    ys = [0.0, 10.0, 9.0, 0.0]
    RX, RY, nv = geo.pad_rings([xs], [ys])
    got = geo.polys_intersect_boxes(
        RX,
        RY,
        nv,
        np.array([0]),
        np.array([0.5]),
        np.array([5.0]),
        np.array([1.5]),
        np.array([6.0]),
    )
    assert not got[0]
    assert not oracle.ring_intersects_box(
        list(zip(xs, ys)), 0.5, 5.0, 1.5, 6.0
    )


def test_edge_touch_counts():
    # box touching polygon edge exactly at x=1
    xs = [0.0, 1.0, 1.0, 0.0, 0.0]
    ys = [0.0, 0.0, 1.0, 1.0, 0.0]
    RX, RY, nv = geo.pad_rings([xs], [ys])
    got = geo.polys_intersect_boxes(
        RX,
        RY,
        nv,
        np.array([0]),
        np.array([1.0]),
        np.array([0.25]),
        np.array([2.0]),
        np.array([0.75]),
    )
    assert got[0]


def test_haversine_matches_oracle():
    rng = np.random.default_rng(5)
    lon1, lon2 = rng.uniform(-180, 180, (2, 200))
    lat1, lat2 = rng.uniform(-85, 85, (2, 200))
    got = geo.haversine_m(lon1, lat1, lon2, lat2)
    for i in range(200):
        exp = oracle.haversine_m(lon1[i], lat1[i], lon2[i], lat2[i])
        assert math.isclose(got[i], exp, rel_tol=1e-12)
    # known value: London → Paris ≈ 343.5 km
    d = geo.haversine_m(-0.1278, 51.5074, 2.3522, 48.8566)
    assert 340_000 < d[()] < 345_000


def test_nan_ring_intersects_nothing():
    """(r5 review) A ring with a non-finite vertex must not report
    intersection with every candidate box (the Liang-Barsky rejects go
    all-False under NaN) — corrupt geometry contributes no coverage."""
    import numpy as np

    from mosaic_engine import geometry as geo

    RX, RY, nv = geo.pad_rings(
        [[0.0, 4.0, np.nan, 0.0], [0.0, 4.0, 2.0, 0.0]],
        [[0.0, 0.0, 4.0, 0.0], [0.0, 0.0, 4.0, 0.0]],
    )
    idx = np.array([0, 0, 1])
    # boxes: one the real triangle would hit, one far away, and the
    # same hit-box against the FINITE twin ring
    bw = np.array([1.0, 100.0, 1.0])
    bs = np.array([0.5, 100.0, 0.5])
    be = np.array([2.0, 101.0, 2.0])
    bn = np.array([1.5, 101.0, 1.5])
    out = geo.polys_intersect_boxes(RX, RY, nv, idx, bw, bs, be, bn)
    assert out.tolist() == [False, False, True]
