"""Detection-only pipeline: find_overlap_gap — Ray-Data rebuild of the
vendored find_overlap_gap_run family (find_overlap_and_gap-pre.sql:297-755).

Per tile (reference per cell, find_overlap_gap_single_cell:525-755):
- overlap report: every face of the tile arrangement covered by >= 2 inputs
  contributes its area to each unordered input pair (the reference's
  pairwise ST_Intersection of ST_Overlaps pairs, pre.sql:619-649);
- gap report: every face covered by no input (the reference's
  ST_Difference(cell, ST_Union(data)), pre.sql:652-692 — note this
  includes the outside-data portion of the tile, same as the reference).

Used as the QA oracle for the resolve pipeline (compare_result, A8).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa

from .. import stages
from ..config import GridConfig, ResolveConfig
from ..geom import arrangement, core
from ..tiling import quadkey
from .resolve import ResolvePlan, prepare


class TileDetect:
    """groupby(tile).map_groups worker: overlap/gap report for one tile."""

    def __init__(self, grid: GridConfig, utm: bool):
        self.__name__ = "TileDetect"  # map_groups task-fn contract
        self.grid = grid
        self.utm = utm

    def _area(self, rings_px: list[np.ndarray]) -> float:
        g = self.grid
        if self.utm:
            return core.planar_area(rings_px, g.precision)
        return core.geodesic_area(rings_px, g.origin_x, g.origin_y, g.precision)

    def __call__(self, group: pa.Table) -> pa.Table:
        g = self.grid
        tile = int(group["tile"][0].as_py())
        bounds = quadkey.cell_bounds_px(np.uint64(tile), g.span_px)
        pks = group["pk"].to_numpy()
        rings_col = group["rings"].to_pylist()
        polys = [
            (int(pks[i]), stages.unpack_rings(rings_col[i])[0])
            for i in range(len(group))
        ]
        faces = arrangement.overlay_tile(polys, bounds)
        over: dict[tuple[int, int], float] = {}
        gap_area = 0.0
        n_gap_faces = 0
        for f in faces:
            cov = sorted(f.cov)
            if len(cov) >= 2:
                a = self._area(f.rings)
                for i, j in combinations(cov, 2):
                    over[(i, j)] = over.get((i, j), 0.0) + a
            elif len(cov) == 0:
                gap_area += self._area(f.rings)
                n_gap_faces += 1
        kinds, id1, id2, areas = [], [], [], []
        for (i, j), a in sorted(over.items()):
            kinds.append("overlap")
            id1.append(i)
            id2.append(j)
            areas.append(a)
        if n_gap_faces:
            kinds.append("gap")
            id1.append(-1)
            id2.append(-1)
            areas.append(gap_area)
        return pa.table(
            {
                "tile": pa.array([tile] * len(kinds), pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "id1": pa.array(id1, pa.int64()),
                "id2": pa.array(id2, pa.int64()),
                "area": pa.array(areas, pa.float64()),
            }
        )


def find_overlap_gap(ds, cfg: ResolveConfig | None = None, plan: ResolvePlan | None = None):
    """documents Dataset -> per-tile overlap/gap report Dataset."""
    cfg = cfg or ResolveConfig()
    plan = plan or prepare(ds, cfg)
    t = cfg.topology
    unwrapped = ds.map_batches(stages.Unwrap(plan.grid), batch_format="pyarrow")
    routed = unwrapped.map_batches(stages.Route(plan.cut), batch_format="pyarrow")
    return routed.groupby("tile").map_groups(
        TileDetect(plan.grid, t.utm), batch_format="pyarrow"
    )
