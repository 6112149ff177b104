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
from ..rayctx import hash_shuffled
from ..tiling import quadkey
from .resolve import ResolvePlan, prepare, routed_table_from_refs, tile_apply


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
        # one batched area pass over all report-relevant faces
        need = [f for f in faces if len(f.cov) >= 2 or len(f.cov) == 0]
        areas_np = core.area_faces(
            [f.rings for f in need], self.utm, g.origin_x, g.origin_y, g.precision
        )
        over: dict[tuple[int, int], float] = {}
        gap_area = 0.0
        n_gap_faces = 0
        for f, a in zip(need, areas_np):
            cov = sorted(f.cov)
            if len(cov) >= 2:
                a = float(a)
                for i, j in combinations(cov, 2):
                    over[(i, j)] = over.get((i, j), 0.0) + a
            else:
                gap_area += float(a)
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


@hash_shuffled
def find_overlap_gap(ds, cfg: ResolveConfig | None = None, plan: ResolvePlan | None = None):
    """documents Dataset -> per-tile overlap/gap report Dataset."""
    cfg = cfg or ResolveConfig()
    input_refs, ds = stages.small_input_refs(ds)
    plan = plan or prepare(ds, cfg, input_refs=input_refs)
    t = cfg.topology
    worker = TileDetect(plan.grid, t.utm)
    if input_refs:
        # driver-bounded layer: plain-task front end (resolve.prepare note)
        whole = routed_table_from_refs(input_refs, plan)
        if whole is not None:
            return tile_apply(whole, worker)
    unwrapped = ds.map_batches(stages.Unwrap(plan.grid), batch_format="pyarrow")
    routed = unwrapped.map_batches(stages.Route(plan.cut), batch_format="pyarrow")
    # small inputs skip the tile all-to-all (stages.small_group_fanout
    # rationale); big inputs run the hash shuffle unchanged
    return stages.gated_groupby(ds, routed, "tile", worker)


def _clip_seg_to_tile(
    ax: int, ay: int, bx: int, by: int, x0: int, y0: int, x1: int, y1: int
) -> tuple[int, int, int, int] | None:
    """Liang-Barsky clip of an integer segment to the closed tile box.

    Border crossings are rounded half-away to the snap grid — both tiles
    derive the crossing from the same input line, so the rounded split
    point is identical on either side and pieces abut exactly.  Returns
    None for pieces outside the box or that round to zero length.
    """
    dx = bx - ax
    dy = by - ay
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, ax - x0), (dx, x1 - ax), (-dy, ay - y0), (dy, y1 - ay)):
        if p == 0:
            if q < 0:
                return None
        else:
            r = q / p
            if p < 0:
                if r > t1:
                    return None
                if r > t0:
                    t0 = r
            else:
                if r < t0:
                    return None
                if r < t1:
                    t1 = r
    if t0 > t1:
        return None
    import math

    def _rnd(v: float, lo: int, hi: int) -> int:
        return min(max(int(math.floor(v + 0.5)), lo), hi)

    nax = _rnd(ax + t0 * dx, x0, x1) if t0 > 0.0 else ax
    nay = _rnd(ay + t0 * dy, y0, y1) if t0 > 0.0 else ay
    nbx = _rnd(ax + t1 * dx, x0, x1) if t1 < 1.0 else bx
    nby = _rnd(ay + t1 * dy, y0, y1) if t1 < 1.0 else by
    if nax == nbx and nay == nby:
        return None
    return nax, nay, nbx, nby


class TileCoverageDepth:
    """groupby(tile).map_groups worker: area by coverage depth for one tile.

    The coverage-depth histogram (how much area is covered by exactly d
    inputs) is the layer-QA companion of the overlap/gap report — the
    reference derives the same quantities from its pairwise overlap pass
    (find_overlap_and_gap-pre.sql:619-692); here every arrangement face
    contributes its area to its own depth bucket, so depth >= 3 regions are
    counted once instead of once per pair.  Depth-0 faces (the tile's
    outside-data portion) are skipped: their area depends on the tile frame,
    not the layer.
    """

    def __init__(self, grid: GridConfig, utm: bool):
        self.__name__ = "TileCoverageDepth"
        self.grid = grid
        self.utm = utm

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
        need = [f for f in faces if len(f.cov) > 0]
        areas_np = core.area_faces(
            [f.rings for f in need], self.utm, g.origin_x, g.origin_y, g.precision
        )
        by_depth: dict[int, float] = {}
        for f, a in zip(need, areas_np):
            d = len(f.cov)
            by_depth[d] = by_depth.get(d, 0.0) + float(a)
        depths = sorted(by_depth)
        return pa.table(
            {
                "tile": pa.array([tile] * len(depths), pa.int64()),
                "depth": pa.array(depths, pa.int64()),
                "area": pa.array([by_depth[d] for d in depths], pa.float64()),
            }
        )


@hash_shuffled
def coverage_depth(ds, cfg: ResolveConfig | None = None, plan: ResolvePlan | None = None):
    """documents Dataset -> per-tile (depth, area) coverage histogram."""
    cfg = cfg or ResolveConfig()
    input_refs, ds = stages.small_input_refs(ds)
    plan = plan or prepare(ds, cfg, input_refs=input_refs)
    t = cfg.topology
    worker = TileCoverageDepth(plan.grid, t.utm)
    if input_refs:
        whole = routed_table_from_refs(input_refs, plan)
        if whole is not None:
            return tile_apply(whole, worker)
    unwrapped = ds.map_batches(stages.Unwrap(plan.grid), batch_format="pyarrow")
    routed = unwrapped.map_batches(stages.Route(plan.cut), batch_format="pyarrow")
    return stages.gated_groupby(ds, routed, "tile", worker)


class TileEdges:
    """groupby(tile).map_groups worker: the topology EDGE listing.

    Reference analogue: the edge_data + edge_attributes tables of the AR5
    attribute mode (resolve_overlap_and_gap_expected:36-103 lists per-edge
    lengths with source attribution).  Emits one row per noded arrangement
    segment owned by this tile (midpoint-in-tile ownership so shared
    border segments appear exactly once globally): left/right coverage,
    source polygon/line pks from the labels, and length.
    """

    def __init__(self, grid: GridConfig, utm: bool):
        self.__name__ = "TileEdges"
        self.grid = grid
        self.utm = utm

    def __call__(self, group: pa.Table) -> pa.Table:
        import math

        from ..geom import arrangement as arr_mod
        from ..geom import noding, polygonize

        g = self.grid
        tile = int(group["tile"][0].as_py())
        x0, y0, x1, y1 = quadkey.cell_bounds_px(np.uint64(tile), g.span_px)
        pks = group["pk"].to_numpy()
        is_line = (
            group["is_line"].to_numpy(zero_copy_only=False)
            if "is_line" in group.column_names
            else np.zeros(len(group), dtype=bool)
        )
        rings_col = group["rings"].to_pylist()
        seg_parts = []
        for i in range(len(group)):
            if pks[i] < 0:
                continue
            rings, _ = stages.unpack_rings(rings_col[i])
            if is_line[i]:
                seg_parts.append(arr_mod.polyline_to_segments(rings, int(pks[i])))
            else:
                seg_parts.append(
                    arr_mod.rings_to_segments(arr_mod.normalize_rings(rings), int(pks[i]))
                )
        if not seg_parts:
            return pa.table(
                {
                    "tile": pa.array([], pa.int64()),
                    "x1": pa.array([], pa.int64()),
                    "y1": pa.array([], pa.int64()),
                    "x2": pa.array([], pa.int64()),
                    "y2": pa.array([], pa.int64()),
                    "length": pa.array([], pa.float64()),
                    "left_cov": pa.array([], pa.list_(pa.int64())),
                    "right_cov": pa.array([], pa.list_(pa.int64())),
                    "source_pks": pa.array([], pa.list_(pa.int64())),
                }
            )
        segs = np.concatenate([s for s, _ in seg_parts])
        labels = [l for _, ls in seg_parts for l in ls]
        segs, labels = noding.node_segments(segs, labels)
        arr = polygonize.polygonize(segs, labels)
        out = {k: [] for k in ("x1", "y1", "x2", "y2", "length", "left_cov", "right_cov", "source_pks")}
        for k in range(len(arr.segs)):
            s = arr.segs[k]
            # clip to the owning tile FIRST: adjacent tiles node the same
            # input edge against different residents, so whole-segment
            # midpoint ownership can double-emit a piece with stale labels
            # (a resident the other tile never saw) or drop it entirely
            # when the two tiles split the edge differently.  Clipping at
            # the tile rect makes ownership exact: every geometric piece
            # inside a tile is emitted by that tile alone, labeled from
            # the full local arrangement (all inputs intersecting the
            # tile are routed to it).  Border-lying pieces keep the
            # half-open midpoint rule (the right/top tile owns them).
            piece = _clip_seg_to_tile(
                int(s[0]), int(s[1]), int(s[2]), int(s[3]), x0, y0, x1, y1
            )
            if piece is None:
                continue
            ax, ay, bx, by = piece
            mx = (ax + bx) / 2.0
            my = (ay + by) / 2.0
            if not (x0 <= mx < x1 and y0 <= my < y1):
                continue
            lc = arr.cycle_cov.get(int(arr.cycle_left[k]), frozenset())
            rc = arr.cycle_cov.get(int(arr.cycle_right[k]), frozenset())
            out["x1"].append(ax)
            out["y1"].append(ay)
            out["x2"].append(bx)
            out["y2"].append(by)
            out["length"].append(math.hypot(bx - ax, by - ay) * g.precision)
            out["left_cov"].append(sorted(lc))
            out["right_cov"].append(sorted(rc))
            out["source_pks"].append(sorted({p for p, _ in arr.labels[k]}))
        # dangling line pieces: polygonize prunes degree-1 chains (they
        # bound no face), but PostGIS topology keeps them as edges — so
        # does the reference's edge_data.  Recover them here: a pruned
        # noded segment lies strictly inside ONE face (its interior holds
        # no nodes), so both covers equal that face's coverage, found by
        # an even-odd raycast on doubled coordinates (the doubled midpoint
        # is exact and never on a boundary).
        kept_keys = {tuple(s) for s in arr.segs.tolist()}
        pruned = [
            k
            for k in range(len(segs))
            if tuple(segs[k].tolist()) not in kept_keys
            and any(p != arr_mod.TILE_ID for p, _ in labels[k])
        ]
        if pruned:
            from ..geom import core

            face_rings = []
            for f in arr.faces:
                rings2 = [np.asarray(r, np.int64) * 2 for r in [f.shell] + f.holes]
                bb = (
                    min(int(r[:, 0].min()) for r in rings2),
                    min(int(r[:, 1].min()) for r in rings2),
                    max(int(r[:, 0].max()) for r in rings2),
                    max(int(r[:, 1].max()) for r in rings2),
                ) if rings2 else (0, 0, -1, -1)
                face_rings.append((rings2, bb, f.cov))
            for k in pruned:
                s = segs[k]
                piece = _clip_seg_to_tile(
                    int(s[0]), int(s[1]), int(s[2]), int(s[3]), x0, y0, x1, y1
                )
                if piece is None:
                    continue
                ax, ay, bx, by = piece
                mx = (ax + bx) / 2.0
                my = (ay + by) / 2.0
                if not (x0 <= mx < x1 and y0 <= my < y1):
                    continue
                qx, qy = ax + bx, ay + by  # doubled midpoint (exact int)
                cov = frozenset()
                for rings2, bb, fcov in face_rings:
                    if not (bb[0] <= qx <= bb[2] and bb[1] <= qy <= bb[3]):
                        continue
                    crossings = sum(
                        core.point_in_ring_crossings(qx, qy, r) for r in rings2
                    )
                    if crossings % 2 == 1:
                        cov = fcov  # raw face cover, TILE_ID included —
                        break       # same semantics as the cycle_cov rows
                out["x1"].append(ax)
                out["y1"].append(ay)
                out["x2"].append(bx)
                out["y2"].append(by)
                out["length"].append(math.hypot(bx - ax, by - ay) * g.precision)
                lc_s = sorted(cov)
                out["left_cov"].append(lc_s)
                out["right_cov"].append(lc_s)
                out["source_pks"].append(sorted({p for p, _ in labels[k]}))
        return pa.table(
            {
                "tile": pa.array([tile] * len(out["x1"]), pa.int64()),
                "x1": pa.array(out["x1"], pa.int64()),
                "y1": pa.array(out["y1"], pa.int64()),
                "x2": pa.array(out["x2"], pa.int64()),
                "y2": pa.array(out["y2"], pa.int64()),
                "length": pa.array(out["length"], pa.float64()),
                "left_cov": pa.array(out["left_cov"], pa.list_(pa.int64())),
                "right_cov": pa.array(out["right_cov"], pa.list_(pa.int64())),
                "source_pks": pa.array(out["source_pks"], pa.list_(pa.int64())),
            }
        )


@hash_shuffled
def extract_edges(ds, cfg: ResolveConfig | None = None, plan: ResolvePlan | None = None):
    """documents Dataset -> noded edge listing with source attribution.

    The reference's edge_attributes re-link (cell.sql:390-416) happens here
    for free: labels carry the source pks through the noding.
    """
    cfg = cfg or ResolveConfig()
    input_refs, ds = stages.small_input_refs(ds)
    plan = plan or prepare(ds, cfg, input_refs=input_refs)
    t = cfg.topology
    worker = TileEdges(plan.grid, t.utm)
    if input_refs:
        whole = routed_table_from_refs(input_refs, plan)
        if whole is not None:
            return tile_apply(whole, worker)
    unwrapped = ds.map_batches(stages.Unwrap(plan.grid), batch_format="pyarrow")
    routed = unwrapped.map_batches(stages.Route(plan.cut), batch_format="pyarrow")
    return stages.gated_groupby(ds, routed, "tile", worker)
