"""S2-style hierarchical cell ids over the web-mercator quadtree.

[BASELINE.json:14] requires an "H3/S2 index" for the kNN and
raster↔vector joins. Design (SURVEY.md §2.3 G7): the web-mercator
quadtree IS our cell hierarchy — a cell at level z is exactly tile
(x, y, z), so the engine reuses the bit-exact tile math of tilemath.py
and quadkeys are the string form of the same cells.

Packed id layout (int64): ``(morton(x, y) << 6) | level`` where morton
interleaves x (even bits) and y (odd bits). Levels 0..28 fit in 63 bits
(non-negative ids); level 29 needs bit 63, so its ids can be NEGATIVE —
still unique and grouping-safe two's-complement values, but not
order-comparable across the sign. Levels above 29 would truncate and
are rejected. Landsat-scale indexing uses levels 5..12. Like S2's cell
ids, parents are prefix-related:
``parent(id) = ((id >> 6) >> 2) << 6 | (level-1)``.
"""

from __future__ import annotations

import numpy as np

from . import tilemath as tm

__all__ = [
    "pack_cell",
    "unpack_cell",
    "encode_cells",
    "cell_parent",
    "neighbor_cells_3x3",
]


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 30 bits of v to even bit positions (morton helper)."""
    v = v.astype(np.uint64) & np.uint64(0x3FFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _unpart1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def pack_cell(xs, ys, level: int) -> np.ndarray:
    """(x, y, level) tiles → packed int64 cell ids (see module doc for
    the level-29 sign caveat)."""
    if not 0 <= level <= 29:
        raise ValueError(f"cell level must be in [0, 29] (got {level})")
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    # fail-loud range check (r5 review): the morton interleave masks to
    # 30 bits, so an out-of-range coord would silently alias to a
    # wrong-but-well-formed cell id (x = 2^30 + 1 packs like x = 1) and
    # downstream joins would mismatch without a trace — the same
    # convention as lonlat_to_tile's NaN raise and cell_parent's guard
    n = np.int64(1) << np.int64(level)
    if xs.size and (
        (xs < 0).any() or (xs >= n).any() or (ys < 0).any() or (ys >= n).any()
    ):
        raise ValueError(
            f"pack_cell: tile coords out of range for level {level} "
            f"(valid [0, {int(n)}))"
        )
    morton = _part1by1(xs) | (_part1by1(ys) << np.uint64(1))
    return ((morton << np.uint64(6)) | np.uint64(level)).astype(np.int64)


def unpack_cell(cells) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Packed ids → (x, y, level)."""
    c = np.asarray(cells, dtype=np.int64).astype(np.uint64)
    level = (c & np.uint64(0x3F)).astype(np.int64)
    morton = c >> np.uint64(6)
    xs = _unpart1by1(morton).astype(np.int64)
    ys = _unpart1by1(morton >> np.uint64(1)).astype(np.int64)
    return xs, ys, level


def encode_cells(lons, lats, level: int) -> np.ndarray:
    """(lon, lat) → packed cell id at `level` (bit-exact tilemath)."""
    xs, ys = tm.lonlat_to_tile(lons, lats, level)
    return pack_cell(xs, ys, level)


def cell_parent(cells, levels: int = 1) -> np.ndarray:
    c = np.asarray(cells, dtype=np.int64).astype(np.uint64)
    level = (c & np.uint64(0x3F)).astype(np.int64) - levels
    if (level < 0).any():
        raise ValueError(
            "cell_parent: levels exceeds a cell's own level (the level "
            "field would wrap)"
        )
    morton = (c >> np.uint64(6)) >> np.uint64(2 * levels)
    return ((morton << np.uint64(6)) | level.astype(np.uint64)).astype(np.int64)


def neighbor_cells_3x3(lons, lats, level: int) -> np.ndarray:
    """(n, 9) packed ids of the 3x3 tile neighborhood around each point.

    X wraps around the antimeridian; y is clamped at the poles (the
    world edge rows have no northern/southern neighbors — clamping
    repeats the center row, which dedupes away in the join). This is the
    H3-kRing-style banding used by the kNN join (SURVEY.md §2.4 J3).
    """
    xs, ys = tm.lonlat_to_tile(lons, lats, level)
    n = xs.shape[0] if xs.ndim else 1
    z2 = np.int64(1 << level)
    dx, dy = np.meshgrid([-1, 0, 1], [-1, 0, 1])
    nx = (xs.reshape(-1, 1) + dx.ravel()[None, :]) % z2
    ny = np.clip(ys.reshape(-1, 1) + dy.ravel()[None, :], 0, z2 - 1)
    return pack_cell(nx.ravel(), ny.ravel(), level).reshape(n, 9)
