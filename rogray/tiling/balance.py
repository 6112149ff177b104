"""Content-balanced quadtree cut — skew handling for the tiling layer.

Reference semantics (cbg_content_based_balanced_grid,
find_overlap_and_gap-pre.sql:121-239): a cell is split into 4 quadrants
while it holds more than ``max_rows`` rows; leaf cells therefore hold a
bounded number of rows regardless of skew.

Ray-Data-first realisation: instead of a recursive counting query per cell
(one DB roundtrip per split in the reference), we take ONE pass over the
data computing each row's fine-level cell (groupby(cell).count() -> a small
histogram), then build the cut tree driver-side from the histogram and
broadcast it.  Rows are then re-keyed to their cut cell in a second
stateless pass.  Two data passes total, no per-cell queries.

The histogram is tiny relative to the data (<= 4**(base+extra) cells,
bounded further by occupancy), so driver-side tree building is fine at any
data scale; only counts travel, never rows.
"""

from __future__ import annotations

import numpy as np

from . import quadkey


def build_cut(
    fine_cells: np.ndarray,
    fine_counts: np.ndarray,
    base_level: int,
    fine_level: int,
    max_rows: int,
) -> dict[int, int]:
    """From a histogram at ``fine_level``, choose the balanced cut.

    Returns {cell_id -> count} for the chosen leaf cells: every base-level
    cell with rows appears either itself (count <= max_rows) or as the set
    of descendants obtained by splitting any cell over max_rows, stopping
    at fine_level (cells still hot at fine_level stay — bounded-depth split,
    same as the reference's min_distance stop, pre.sql:208-213).
    """
    fine_cells = np.asarray(fine_cells, dtype=np.uint64)
    fine_counts = np.asarray(fine_counts, dtype=np.int64)
    # counts aggregated at every level from fine up to base
    per_level: dict[int, dict[int, int]] = {}
    cells, counts = fine_cells, fine_counts
    for lvl in range(fine_level, base_level - 1, -1):
        if lvl < fine_level:
            cells = quadkey.parent(fine_cells, lvl)
        u, inv = np.unique(cells, return_inverse=True)
        agg = np.zeros(len(u), dtype=np.int64)
        np.add.at(agg, inv, fine_counts)
        per_level[lvl] = dict(zip(u.tolist(), agg.tolist()))

    cut: dict[int, int] = {}
    stack = list(per_level[base_level].items())
    while stack:
        cell, cnt = stack.pop()
        lvl = int(cell >> quadkey.LEVEL_SHIFT)
        if cnt <= max_rows or lvl >= fine_level:
            cut[int(cell)] = int(cnt)
            continue
        child_counts = per_level[lvl + 1]
        for ch in quadkey.children_int(int(cell)):
            c = child_counts.get(int(ch), 0)
            if c > 0:
                stack.append((int(ch), c))
    return cut


class CutIndex:
    """Broadcast-friendly lookup: fine cell / bbox -> leaf tile(s) of the cut.

    Built once driver-side, shipped to workers via ray.put (read in every
    map_batches task without reserialization).
    """

    def __init__(self, cut: dict[int, int], base_level: int, fine_level: int, span_px: int):
        self.base_level = base_level
        self.fine_level = fine_level
        self.span_px = span_px
        self.leaves = frozenset(cut.keys())
        self.counts = dict(cut)
        self._levels = sorted({int(c >> quadkey.LEVEL_SHIFT) for c in cut}) or [base_level]
        self._leaf_arr = np.sort(np.fromiter(cut.keys(), dtype=np.uint64, count=len(cut)))
        # every strict ancestor of a leaf, for O(1) descend decisions
        self._interior: set[int] = set()
        for leaf in cut:
            lvl = int(leaf >> quadkey.LEVEL_SHIFT)
            for up in range(base_level, lvl):
                self._interior.add(int(quadkey.parent(np.asarray([leaf], np.uint64), up)[0]))
        # the actual tile partition of the square (leaves + empty-region
        # cells): membership gates the Route fast path — tile_of_points_px
        # falls back to the base cell for points in histogram-empty regions
        # of a SPLIT base cell, and that base cell is NOT a partition tile
        self._partition_arr = np.asarray(self.all_tiles(), dtype=np.uint64)

    def is_partition_tile(self, cells: np.ndarray) -> np.ndarray:
        """True where ``cells`` are actual tiles of the partition
        (vectorized). Cells returned by tile_of_points_px for points in
        empty regions under a split base cell fail this test and must take
        the full bbox descend."""
        return np.isin(np.asarray(cells, dtype=np.uint64), self._partition_arr)

    def tile_of_points_px(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Leaf tile containing each integer-grid point (vectorized).

        Points in empty regions (no leaf) map to their base-level cell.
        """
        px = np.asarray(px, dtype=np.int64)
        py = np.asarray(py, dtype=np.int64)
        out = quadkey.cell_of_point_px(px, py, self.base_level, self.span_px)
        unresolved = ~np.isin(out, self._leaf_arr) if len(self._leaf_arr) else np.zeros(len(out), bool)
        for lvl in self._levels:
            if lvl == self.base_level or not unresolved.any():
                continue
            cand = quadkey.cell_of_point_px(px[unresolved], py[unresolved], lvl, self.span_px)
            hit = np.isin(cand, self._leaf_arr)
            idx = np.flatnonzero(unresolved)
            out[idx[hit]] = cand[hit]
            unresolved[idx[hit]] = False
        return out

    def tiles_of_bbox_px(self, minx: int, miny: int, maxx: int, maxy: int) -> list[int]:
        """All leaf tiles whose square intersects the bbox (for row routing).

        Regions not under any leaf (empty space the histogram never saw —
        possible when a bbox pokes into an empty base cell) contribute the
        base-level cell so tile-rect coverage of the plane stays complete.
        """
        out: list[int] = []
        for base in quadkey.cells_overlapping_bbox_px(
            minx, miny, maxx, maxy, self.base_level, self.span_px
        ).tolist():
            self._descend(int(base), minx, miny, maxx, maxy, out)
        return out

    def _descend(self, cell: int, minx, miny, maxx, maxy, out: list[int]) -> None:
        if cell in self.leaves:
            out.append(cell)
            return
        lvl = int(cell >> quadkey.LEVEL_SHIFT)
        if lvl >= self.fine_level:
            out.append(cell)  # empty region: base/fine cell is the tile
            return
        if cell not in self._interior:
            out.append(cell)  # no leaves below: the cell itself is the tile
            return
        for ch in quadkey.children_int(cell):
            x0, y0, x1, y1 = quadkey.cell_bounds_px_int(ch, self.span_px)
            if x1 < minx or x0 > maxx or y1 < miny or y0 > maxy:
                continue
            self._descend(ch, minx, miny, maxx, maxy, out)

    def all_tiles(self) -> list[int]:
        """The complete tiling partition of the square: cut leaves plus the
        non-split cells covering empty regions (descend from the root)."""
        out: list[int] = []
        stack = [int(quadkey.encode(0, np.asarray([0]), np.asarray([0]))[0])]
        while stack:
            cell = stack.pop()
            lvl = int(cell >> quadkey.LEVEL_SHIFT)
            if cell in self.leaves:
                out.append(cell)
            elif lvl < self.base_level or cell in self._interior:
                stack.extend(quadkey.children_int(int(cell)))
            else:
                out.append(cell)
        return sorted(out)
