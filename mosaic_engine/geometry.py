"""Planar polygon geometry — pure numpy, no Spark imports.

Columnar reimplementation of the shapely `prepared.prep(poly).intersects`
semantics the reference uses to refine bbox tile covers
([ref: landsat_cogeo_mosaic/mosaic.py#features_to_mosaicJSON] — see
SURVEY.md §2.3 G5/G8). Boundary touch counts as intersecting, matching
shapely's `intersects` predicate.

Rings are flat coordinate arrays (closed: first point == last point).
Batches of variable-length rings are padded into dense (n, maxlen)
matrices — padded vertices repeat the last real point, producing
zero-length edges that every predicate below treats as inert, so all
tests vectorize across an entire Arrow batch with no per-row Python.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8  # mean earth radius (IUGG)

__all__ = [
    "pad_rings",
    "points_in_polys",
    "polys_intersect_boxes",
    "haversine_m",
]


def pad_rings(xs_list, ys_list):
    """List of closed rings → (RX, RY, nvert) dense float64 matrices.

    RX/RY have shape (n, maxlen); rows shorter than maxlen are padded by
    repeating their last vertex. nvert[i] is the real (closed) length.
    """
    n = len(xs_list)
    lens = np.fromiter((len(x) for x in xs_list), dtype=np.int64, count=n)
    if n and (lens == 0).any():
        # a zero-length ring would make the pad step below copy
        # UNINITIALIZED np.empty memory across the row — nondeterministic
        # phantom geometry. Corrupt input fails loudly instead.
        raise ValueError("pad_rings: empty ring (corrupt geometry input)")
    maxlen = int(lens.max()) if n else 0
    if n and (lens == maxlen).all():
        # uniform rings (the common case: fixed 5-point footprints) —
        # one C-level stack instead of a Python row loop
        RX = np.asarray([np.asarray(x) for x in xs_list], dtype=np.float64)
        RY = np.asarray([np.asarray(y) for y in ys_list], dtype=np.float64)
        return RX, RY, lens
    RX = np.empty((n, maxlen), dtype=np.float64)
    RY = np.empty((n, maxlen), dtype=np.float64)
    for i in range(n):  # batch-level loop over rows only to pack arrays;
        li = lens[i]  # all geometry predicates below are fully vectorized
        RX[i, :li] = xs_list[i]
        RY[i, :li] = ys_list[i]
        if li < maxlen:
            RX[i, li:] = RX[i, li - 1]
            RY[i, li:] = RY[i, li - 1]
    return RX, RY, lens


def _edges(RX, RY):
    """Edge endpoint matrices (x1, y1, x2, y2), shape (n, maxlen-1)."""
    return RX[:, :-1], RY[:, :-1], RX[:, 1:], RY[:, 1:]


def points_in_polys(px, py, RX, RY, eps: float = 1e-12):
    """Even-odd point-in-polygon with inclusive boundary.

    px/py shape (n,) paired row-wise with rings RX/RY shape (n, maxlen).
    Returns bool (n,). A point on a ring edge or vertex counts as inside
    (matches shapely `intersects`, not `contains`).
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1, y1, x2, y2 = _edges(RX, RY)
    # crossing-number parity; zero-length pad edges have y1==y2 → no cross
    cond = (y1 > py) != (y2 > py)
    # divide: y1==y2 pad/horizontal edges → ±inf/NaN, masked by `cond`
    # (which is False there); over: a near-degenerate edge can push the
    # quotient past float max (VERDICT r5 #7 — hypothesis hit it), and
    # the resulting inf compares fine in `px < xint`. Silencing keeps
    # REAL warnings from other kernels visible in test logs.
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crosses = cond & (px < xint)
    inside = (crosses.sum(axis=1) & 1).astype(bool)
    # inclusive boundary: point collinear with an edge and within its
    # bbox. Only points NOT already inside by parity need this (the
    # common deep-interior case skips it — it's half the kernel cost).
    todo = ~inside
    if todo.any():
        x1, y1, x2, y2 = x1[todo], y1[todo], x2[todo], y2[todo]
        pxs, pys = px[todo], py[todo]
        cross_prod = (x2 - x1) * (pys - y1) - (y2 - y1) * (pxs - x1)
        span = np.maximum(np.abs(x2 - x1), np.abs(y2 - y1))
        on_line = np.abs(cross_prod) <= eps * np.maximum(span, 1.0)
        in_seg = (
            (pxs >= np.minimum(x1, x2) - eps)
            & (pxs <= np.maximum(x1, x2) + eps)
            & (pys >= np.minimum(y1, y2) - eps)
            & (pys <= np.maximum(y1, y2) + eps)
        )
        on_boundary = (on_line & in_seg & (span > 0)).any(axis=1)
        inside[todo] |= on_boundary
    return inside


def _segments_overlap_boxes(x1, y1, x2, y2, bw, bs, be, bn):
    """Liang–Barsky: does each segment touch its axis-aligned box?

    All args broadcastable to (n, m) (m = edges per ring); boxes are
    (n, 1). Inclusive: a touch at the boundary counts. Zero-length pad
    segments only count if the (repeated) point lies inside the box —
    harmless, since that point is a real ring vertex.
    """
    dx = x2 - x1
    dy = y2 - y1
    p = np.stack([-dx, dx, -dy, dy])  # (4, n, m)
    q = np.stack([x1 - bw, be - x1, y1 - bs, bn - y1])
    with np.errstate(divide="ignore", invalid="ignore"):
        r = q / p
    t0 = np.zeros_like(x1)
    t1 = np.ones_like(x1)
    reject = np.zeros(x1.shape, dtype=bool)
    for k in range(4):
        pk, qk, rk = p[k], q[k], r[k]
        reject |= (pk == 0) & (qk < 0)
        t0 = np.where(pk < 0, np.maximum(t0, rk), t0)
        t1 = np.where(pk < 0, t1, np.where(pk > 0, np.minimum(t1, rk), t1))
    return ~reject & (t0 <= t1)


def polys_intersect_boxes(RX, RY, nvert, idx, bw, bs, be, bn):
    """Exact polygon ∩ axis-aligned-box test, batched over candidates.

    RX/RY/nvert: padded ring matrices for `npoly` polygons.
    idx: (m,) int — candidate i tests polygon idx[i] against box i.
    bw/bs/be/bn: (m,) box bounds.
    Returns bool (m,). Complete for simple polygons: a polygon and a box
    intersect iff (a) some ring vertex is in the box, or (b) some box
    corner is in the polygon, or (c) some ring edge crosses the box.
    Boundary touches count (shapely `intersects` semantics).
    """
    idx = np.asarray(idx, dtype=np.int64)
    bw = np.asarray(bw, dtype=np.float64)[:, None]
    bs = np.asarray(bs, dtype=np.float64)[:, None]
    be = np.asarray(be, dtype=np.float64)[:, None]
    bn = np.asarray(bn, dtype=np.float64)[:, None]
    gRX = RX[idx]  # (m, maxlen)
    gRY = RY[idx]

    # non-finite ring guard (r5 review): a NaN vertex (e.g. a null
    # coordinate in an untrusted feed, converted by np.asarray) makes
    # the Liang–Barsky rejects all-False — the ring would "intersect"
    # EVERY candidate box, silently assigning the scene to its entire
    # bbox cover. A corrupt ring intersects nothing instead: the
    # feature contributes no coverage and the gap is auditable via the
    # missing-quadkeys lane.
    finite = np.isfinite(gRX).all(axis=1) & np.isfinite(gRY).all(axis=1)

    # (a) ring vertex in box (inclusive); pad vertices repeat real ones
    vin = ((gRX >= bw) & (gRX <= be) & (gRY >= bs) & (gRY <= bn)).any(axis=1)

    # (b) any box corner inside polygon
    cin = np.zeros(idx.shape[0], dtype=bool)
    for cx, cy in ((bw, bs), (bw, bn), (be, bs), (be, bn)):
        todo = ~(vin | cin)
        if not todo.any():
            break
        cin[todo] = points_in_polys(
            cx[todo, 0], cy[todo, 0], gRX[todo], gRY[todo]
        )

    # (c) ring edge crosses box
    need = ~(vin | cin)
    ein = np.zeros(idx.shape[0], dtype=bool)
    if need.any():
        x1, y1, x2, y2 = _edges(gRX[need], gRY[need])
        hit = _segments_overlap_boxes(
            x1, y1, x2, y2, bw[need], bs[need], be[need], bn[need]
        )
        ein[need] = hit.any(axis=1)
    return (vin | cin | ein) & finite


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance in meters, float64 haversine."""
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(a, 1.0)))
