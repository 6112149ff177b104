"""Hierarchical quadkey (Morton) cell index — the engine's H3/S2 analogue.

Replaces the reference's content-balanced grid cells
(find_overlap_and_gap-pre.sql:121-239 ``cbg_content_based_balanced_grid``)
with a from-scratch hierarchical cell scheme: the tiling square
[origin, origin+span]^2 is recursively quartered; a cell at level L is
identified by (L, morton(ix, iy)) packed into one uint64:

    cell_id = (L << 58) | interleave_bits(ix, iy)      (L <= 29)

Properties used throughout the engine:
- parent/child moves are bit shifts (like H3 parent/child resolution moves)
- k_ring(cell) = the <=8 neighbours at the same level (H3 k-ring analogue,
  used for kNN expansion)
- all functions are numpy-vectorized over row batches.

Cell boundaries lie exactly on the integer snap grid (span is a
power-of-two multiple of the snap precision), so tile-border segments have
exact integer endpoints shared by both adjacent tiles.
"""

from __future__ import annotations

import numpy as np

LEVEL_SHIFT = 58
MORTON_MASK = (1 << LEVEL_SHIFT) - 1

_B = [
    0x5555555555555555,
    0x3333333333333333,
    0x0F0F0F0F0F0F0F0F,
    0x00FF00FF00FF00FF,
    0x0000FFFF0000FFFF,
]


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of x so there is a 0 bit between each."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def encode(level: int, ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Pack (level, ix, iy) into uint64 cell ids. ix/iy must be < 2**level."""
    m = _part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))
    return (np.uint64(level) << np.uint64(LEVEL_SHIFT)) | m


# -- scalar twins: numpy on 1-element arrays costs ~25us per Morton op, a
# -- Python-int bit mix costs ~1us; the per-cell tree walks (Route descend,
# -- kNN ring expansion) live on these ---------------------------------------


def _part1by1_int(x: int) -> int:
    x = (x | (x << 16)) & 0x0000FFFF0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x << 2)) & 0x3333333333333333
    x = (x | (x << 1)) & 0x5555555555555555
    return x


def _compact1by1_int(x: int) -> int:
    x &= 0x5555555555555555
    x = (x | (x >> 1)) & 0x3333333333333333
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFF
    x = (x | (x >> 16)) & 0x00000000FFFFFFFF
    return x


def encode_int(level: int, ix: int, iy: int) -> int:
    return (level << LEVEL_SHIFT) | _part1by1_int(ix) | (_part1by1_int(iy) << 1)


def decode_int(cell: int) -> tuple[int, int, int]:
    level = cell >> LEVEL_SHIFT
    m = cell & MORTON_MASK
    return level, _compact1by1_int(m), _compact1by1_int(m >> 1)


def children_int(cell: int) -> tuple[int, int, int, int]:
    """The 4 direct children of one cell (scalar fast path)."""
    level, ix, iy = decode_int(cell)
    lv, x, y = level + 1, ix * 2, iy * 2
    return (
        encode_int(lv, x, y),
        encode_int(lv, x + 1, y),
        encode_int(lv, x, y + 1),
        encode_int(lv, x + 1, y + 1),
    )


def cell_bounds_px_int(cell: int, span_px: int) -> tuple[int, int, int, int]:
    level, ix, iy = decode_int(cell)
    w = span_px >> level
    x0, y0 = ix * w, iy * w
    return x0, y0, x0 + w, y0 + w


def decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell ids -> (level, ix, iy)."""
    cell = np.asarray(cell, dtype=np.uint64)
    level = (cell >> np.uint64(LEVEL_SHIFT)).astype(np.int64)
    m = cell & np.uint64(MORTON_MASK)
    return level, _compact1by1(m).astype(np.int64), _compact1by1(m >> np.uint64(1)).astype(np.int64)


def level_of(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(LEVEL_SHIFT)).astype(np.int64)


def parent(cell: np.ndarray, parent_level: int) -> np.ndarray:
    """Ancestor cell at parent_level (H3 cell_to_parent analogue)."""
    level, ix, iy = decode(cell)
    shift = (level - parent_level).astype(np.int64)
    if np.any(shift < 0):
        raise ValueError("parent_level deeper than cell level")
    return encode(parent_level, ix >> shift, iy >> shift)


def children(cell: int) -> np.ndarray:
    """The 4 direct children of one cell."""
    level, ix, iy = decode(np.asarray([cell], dtype=np.uint64))
    lv, x, y = int(level[0]) + 1, int(ix[0]) * 2, int(iy[0]) * 2
    xs = np.array([x, x + 1, x, x + 1])
    ys = np.array([y, y, y + 1, y + 1])
    return encode(lv, xs, ys)


def k_ring(cell: int, k: int = 1) -> np.ndarray:
    """All cells at the same level within Chebyshev distance k (incl. self).

    H3 grid_disk analogue, used for kNN candidate expansion.
    """
    lv, x, y = decode_int(int(cell))
    n = 1 << lv
    xs, ys = np.meshgrid(np.arange(x - k, x + k + 1), np.arange(y - k, y + k + 1))
    xs, ys = xs.ravel(), ys.ravel()
    ok = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
    return encode(lv, xs[ok], ys[ok])


def cell_of_point_px(px: np.ndarray, py: np.ndarray, level: int, span_px: int) -> np.ndarray:
    """Cell at ``level`` containing integer-grid points (vectorized).

    Points outside the tiling square are clamped to the edge cells.
    """
    w = span_px >> level  # cell width in snap pixels
    n = 1 << level
    ix = np.clip(np.asarray(px) // w, 0, n - 1)
    iy = np.clip(np.asarray(py) // w, 0, n - 1)
    return encode(level, ix, iy)


def cell_bounds_px(cell: int, span_px: int) -> tuple[int, int, int, int]:
    """(minx, miny, maxx, maxy) of a cell in snap pixels."""
    level, ix, iy = decode(np.asarray([cell], dtype=np.uint64))
    w = span_px >> int(level[0])
    x0, y0 = int(ix[0]) * w, int(iy[0]) * w
    return x0, y0, x0 + w, y0 + w


def cells_overlapping_bbox_px(
    minx: int, miny: int, maxx: int, maxy: int, level: int, span_px: int
) -> np.ndarray:
    """All cells at ``level`` whose square intersects the closed bbox."""
    w = span_px >> level
    n = 1 << level
    x0 = max(int(minx) // w, 0)
    y0 = max(int(miny) // w, 0)
    x1 = min(int(maxx) // w, n - 1)
    y1 = min(int(maxy) // w, n - 1)
    if x1 < x0 or y1 < y0:
        return np.empty(0, dtype=np.uint64)
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    return encode(level, xs.ravel(), ys.ravel())
