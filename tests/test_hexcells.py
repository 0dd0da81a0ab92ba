"""hexcells: true hexagonal H3-style cells (SURVEY.md §2.3 G7 optional
ring). Pure numpy — no SparkSession — so the suite stays fast; the
Spark/oracle integration is covered by the hex_cell_agg /
hex_kring_agg entries in __spark_entry__ (driver gate) and
tests/test_sources_ops.py."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mosaic_engine import hexcells as hx
from mosaic_engine import tilemath as tm


# ---------------------------------------------------------------- scalar ref
def _scalar_encode(lon: float, lat: float, res: int) -> tuple[int, int]:
    """Independent scalar reference: the same published math as the
    DuckDB oracle SQL (plain Python floats, branchy cube round)."""
    mx = lon / 360.0 + 0.5
    sinlat = math.sin(math.radians(lat))
    my = 0.5 - 0.25 * math.log((1.0 + sinlat) / (1.0 - sinlat)) / math.pi
    scale = float(1 << res)
    qf = (0.5773502691896257 * mx - my / 3.0) * scale
    rf = (my * (2.0 / 3.0)) * scale
    sf = -qf - rf
    rx, ry, rz = (
        math.floor(qf + 0.5),
        math.floor(sf + 0.5),
        math.floor(rf + 0.5),
    )
    dx, dy, dz = abs(rx - qf), abs(ry - sf), abs(rz - rf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif not (dy > dz):
        rz = -rx - ry
    return int(rx), int(rz)


def _rand_lonlat(n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    return (
        rng.uniform(-180.0, 180.0, n),
        rng.uniform(-84.0, 84.0, n),
    )


# ---------------------------------------------------------------- pack/unpack
def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(7)
    for res in (0, 3, 9, 15, hx.HEX_MAX_RES):
        lim = 1 << min(res, 20)
        q = rng.integers(-(lim // 2) - 1, lim, 200)
        r = rng.integers(-(lim // 2) - 1, lim, 200)
        ids = hx.hex_pack(q, r, res)
        q2, r2, z2 = hx.hex_unpack(ids)
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(r2, r)
        assert (z2 == res).all()
        assert ids.dtype == np.int64 and (ids >= 0).all()


def test_pack_range_and_res_guards():
    with pytest.raises(ValueError, match="res"):
        hx.hex_encode([0.0], [0.0], hx.HEX_MAX_RES + 1)
    with pytest.raises(ValueError, match="out of range"):
        hx.hex_pack([1 << 29], [0], 5)
    with pytest.raises(ValueError, match="pole"):
        hx.hex_encode([0.0], [90.0], 8)


def test_ids_unique_across_res():
    """The same axial (q, r) at different res must pack differently
    (res rides in the id, like cells.py's level field)."""
    a = hx.hex_pack([5], [7], 8)[0]
    b = hx.hex_pack([5], [7], 9)[0]
    assert a != b


# ---------------------------------------------------------------- encode
def test_encode_matches_scalar_reference():
    lons, lats = _rand_lonlat(3000, 11)
    for res in (4, 8, 12):
        ids = hx.hex_encode(lons, lats, res)
        q, r, _ = hx.hex_unpack(ids)
        for i in range(0, 3000, 97):
            sq, sr = _scalar_encode(float(lons[i]), float(lats[i]), res)
            assert (q[i], r[i]) == (sq, sr), (lons[i], lats[i], res)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-180.0, 180.0, allow_nan=False),
    st.floats(-84.9, 84.9, allow_nan=False),
    st.integers(0, 16),
)
def test_encode_hypothesis_vs_scalar(lon, lat, res):
    ids = hx.hex_encode([lon], [lat], res)
    q, r, z = hx.hex_unpack(ids)
    assert (int(q[0]), int(r[0])) == _scalar_encode(lon, lat, res)
    assert int(z[0]) == res


def test_cube_round_invariant():
    """q + s + r = 0 after rounding (s implicit): rounding repairs keep
    the cube constraint, so distances computed from (q, r) are exact."""
    lons, lats = _rand_lonlat(5000, 23)
    qf, rf = hx._axial_float(lons, lats, 10)
    q, r = hx._cube_round(qf, rf)
    # containment: the rounded center is within 1 hex of the fractional
    # position on every axis (cube rounding never lands farther)
    assert (np.abs(q - qf) <= 1.0).all()
    assert (np.abs(r - rf) <= 1.0).all()


def test_center_reencodes_to_same_cell():
    """hex_center is interior (far from every boundary), so encoding it
    must return the original id — locks encode/center inverse pairing."""
    lons, lats = _rand_lonlat(2000, 31)
    for res in (5, 10, 14):
        ids = np.unique(hx.hex_encode(lons, lats, res))
        clon, clat = hx.hex_center(ids)
        np.testing.assert_array_equal(hx.hex_encode(clon, clat, res), ids)


# ---------------------------------------------------------------- rings
def test_kring_size_and_distances():
    lons, lats = _rand_lonlat(50, 5)
    ids = hx.hex_encode(lons, lats, 9)
    for k in (0, 1, 2, 3):
        ring = hx.hex_kring(ids, k)
        assert ring.shape == (50, 3 * k * (k + 1) + 1)
        # no duplicates within a ring; self always present
        assert all(len(set(row)) == ring.shape[1] for row in ring)
        assert (ring == ids[:, None]).any(axis=1).all()
        d = hx.hex_distance(
            np.repeat(ids, ring.shape[1]), ring.ravel()
        ).reshape(ring.shape)
        assert (d <= k).all()
        if k:
            # exactly 6k cells at distance exactly k (the hex ring)
            assert ((d == k).sum(axis=1) == 6 * k).all()


def test_kring_symmetry():
    lons, lats = _rand_lonlat(40, 13)
    ids = hx.hex_encode(lons, lats, 7)
    ring = hx.hex_kring(ids, 1)
    neigh = {int(i): set(map(int, row)) for i, row in zip(ids, ring)}
    for a, row in neigh.items():
        for b in row:
            if b in neigh and b != a:
                assert a in neigh[b]


def test_kring_mixed_res_raises():
    a = hx.hex_encode([10.0], [10.0], 8)
    b = hx.hex_encode([10.0], [10.0], 9)
    with pytest.raises(ValueError, match="mixed"):
        hx.hex_kring(np.concatenate([a, b]), 1)


def test_six_equidistant_neighbors():
    """THE hex property vs the square grid (which has √2-far corner
    neighbors): all 6 ring-1 neighbors' centers sit at the SAME planar
    distance from the cell center in mercator space."""
    ids = hx.hex_encode([12.3, -77.0, 140.0], [41.5, -33.0, 67.0], 10)
    ring = hx.hex_kring(ids, 1)
    for i, cid in enumerate(ids):
        clon, clat = hx.hex_center([cid])
        cx, cy = tm._xy_norm(clon, clat)
        others = ring[i][ring[i] != cid]
        nlon, nlat = hx.hex_center(others)
        nx, ny = tm._xy_norm(nlon, nlat)
        d = np.hypot(nx - cx[0], ny - cy[0])
        assert d.shape == (6,)
        np.testing.assert_allclose(d, d[0], rtol=1e-9)
        # spacing = √3 · circumradius = √3 · 2^-res
        np.testing.assert_allclose(d[0], math.sqrt(3.0) * 2.0 ** -10, rtol=1e-9)


def test_point_maps_to_nearest_center():
    """cube rounding = nearest lattice center: the planar distance from
    a point to its own cell center never exceeds the distance to any
    ring-1 neighbor center (ties at boundaries allowed)."""
    lons, lats = _rand_lonlat(500, 41)
    ids = hx.hex_encode(lons, lats, 8)
    px, py = tm._xy_norm(lons, lats)
    ring = hx.hex_kring(ids, 1)
    clon, clat = hx.hex_center(ids)
    cx, cy = tm._xy_norm(clon, clat)
    own = np.hypot(px - cx, py - cy)
    nlon, nlat = hx.hex_center(ring.ravel())
    nx = (
        tm._xy_norm(nlon, nlat)[0].reshape(ring.shape),
        tm._xy_norm(nlon, nlat)[1].reshape(ring.shape),
    )
    dn = np.hypot(nx[0] - px[:, None], nx[1] - py[:, None])
    assert (own[:, None] <= dn + 1e-12).all()


def test_distance_triangle_and_symmetry():
    lons, lats = _rand_lonlat(300, 17)
    a = hx.hex_encode(lons[:100], lats[:100], 6)
    b = hx.hex_encode(lons[100:200], lats[100:200], 6)
    c = hx.hex_encode(lons[200:], lats[200:], 6)
    dab, dba = hx.hex_distance(a, b), hx.hex_distance(b, a)
    np.testing.assert_array_equal(dab, dba)
    assert (hx.hex_distance(a, a) == 0).all()
    assert (dab <= hx.hex_distance(a, c) + hx.hex_distance(c, b)).all()
    with pytest.raises(ValueError, match="mismatch"):
        hx.hex_distance(a, hx.hex_encode(lons[:100], lats[:100], 7))


def test_kring_past_packable_range_yields_sentinels():
    """(r6 review) At low res the id offset 2^(res+1) is small enough
    that a modest k walks past it — those ring members come back as -1
    (never matches a real id in a join) instead of raising; in-range
    members are exact."""
    ids = hx.hex_encode(np.array([0.0]), np.array([0.0]), 0)
    ring = hx.hex_kring(ids, 3)
    assert ring.shape == (1, 3 * 3 * 4 + 1)
    sent = ring == -1
    assert sent.any() and not sent.all()
    # every in-range member round-trips through pack/unpack exactly
    q, r, res = hx.hex_unpack(ring[~sent])
    assert (hx.hex_pack(q, r, 0) == ring[~sent]).all()
    assert (res == 0).all()
    # a high-res ring is sentinel-free and matches the offsets table
    ids2 = hx.hex_encode(np.array([12.3, -77.0]), np.array([45.6, 2.0]), 9)
    ring2 = hx.hex_kring(ids2, 2)
    off = hx.hex_kring_offsets(2)
    q2, r2, _ = hx.hex_unpack(ids2)
    want = hx.hex_pack(
        (q2[:, None] + off[:, 0]).ravel(),
        (r2[:, None] + off[:, 1]).ravel(),
        9,
    ).reshape(2, off.shape[0])
    assert (ring2 >= 0).all() and (ring2 == want).all()


def test_hex_unpack_rejects_kring_sentinels():
    """(ADVICE r6) hex_kring emits -1 for unpackable ring positions;
    decoding one would yield well-formed garbage (res 31, huge q/r) —
    hex_unpack must fail loud instead, like hex_pack does."""
    import numpy as np
    import pytest

    from mosaic_engine import hexcells as hx

    with pytest.raises(ValueError, match="negative id"):
        hx.hex_unpack(np.array([-1], dtype=np.int64))
    # and through the helpers that decode internally
    with pytest.raises(ValueError, match="negative id"):
        hx.hex_center(np.array([5, -1], dtype=np.int64))
