"""Per-tile overlay: polygons + tile rect -> attributed disjoint faces.

The engine's analogue of the reference's per-cell worker
(function_resolve_overlap_gap_single_cell.sql JT1/JT6/JT7):

- ring segments labelled with (poly_id, interior-side) + the tile rectangle
  as a pseudo-polygon (TILE_ID) are snap-round noded and polygonized;
- faces covered by the tile rect are kept (tile ownership is exact: the
  tile rect edges are part of the arrangement, so each kept face's region
  lies wholly inside this tile and in no other);
- small faces not touching the tile border are dissolved into the
  neighbour with the longest shared boundary (reference: ST_RemEdgeNewFace
  on the longest edge, function_01_do_remove_small_areas_no_block.sql:62-83;
  border-touching faces are deferred to the stitch pass because only their
  within-tile piece-area is known here);
- each face carries a coverage LEDGER [(area2, cov_set), ...] so that
  attribution (JT7's >50%-coverage join, cell.sql:833-873) stays exact
  after merges: coverage_fraction(P) = sum(area2 where P in cov) / total.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import noding, polygonize
from .core import ring_signed_area2

TILE_ID = -1
UNIVERSE = polygonize.UNIVERSE


@dataclass
class TileFace:
    rings: list[np.ndarray]          # [shell(CCW), holes(CW)...] int px
    area2: int                       # 2 * area in px^2
    ledger: list[tuple[int, frozenset]]  # [(area2, cov w/o TILE_ID)]
    touches_border: bool             # boundary lies partly on the tile rect
    cov: frozenset = frozenset()     # the face's own covering set (w/o TILE_ID)
    touches: frozenset = frozenset() # real poly ids on the boundary
    masks: list[np.ndarray] | None = None  # per ring: 1 where the edge is pure tile border


def _ring_masks(face, labels) -> list[np.ndarray]:
    tile_only = lambda i: 1 if all(p == TILE_ID for p, _ in labels[i]) else 0
    out = []
    segidx = [face.shell_seg] + list(face.holes_seg)
    for arr in segidx:
        out.append(np.asarray([tile_only(int(i)) for i in arr], dtype=np.uint8))
    return out


def normalize_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Orient exterior ring (index 0) CCW and holes CW."""
    out = []
    for k, r in enumerate(rings):
        r = np.asarray(r, dtype=np.int64)
        a2 = ring_signed_area2(r)
        want_ccw = k == 0
        if (a2 < 0 and want_ccw) or (a2 > 0 and not want_ccw):
            r = r[::-1]
        out.append(r)
    return out


def rings_to_segments(
    rings: list[np.ndarray], poly_id: int
) -> tuple[np.ndarray, list[frozenset]]:
    """Normalized ring list -> labelled segments (interior on the left)."""
    segs = []
    for r in rings:
        r = np.asarray(r, dtype=np.int64)
        if len(r) < 2:
            continue
        nxt = np.roll(r, -1, axis=0)
        segs.append(np.concatenate([r, nxt], axis=1))
    if not segs:
        return np.empty((0, 4), dtype=np.int64), []
    segs = np.concatenate(segs)
    labels = [frozenset([(poly_id, 1)])] * len(segs)
    return segs, labels


def tile_rect_segments(bounds: tuple[int, int, int, int]) -> tuple[np.ndarray, list[frozenset]]:
    x0, y0, x1, y1 = bounds
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.int64)
    return rings_to_segments([ring], TILE_ID)


def attribution(
    ledger: list[tuple[int, frozenset]]
) -> tuple[int | None, list[int]]:
    """JT7 attribute rule (cell.sql:833-873): winner = input covering >50%
    of the face, highest coverage first, pk ascending on ties; the other
    >50% coverers go to _other_intersect_id_list."""
    total = sum(a for a, _ in ledger)
    if total <= 0:
        return None, []
    acc: dict[int, int] = {}
    for a, cov in ledger:
        for p in cov:
            acc[p] = acc.get(p, 0) + a
    cands = [(frac, p) for p, s in acc.items() if (frac := s / total) > 0.5]
    cands.sort(key=lambda t: (-t[0], t[1]))
    if not cands:
        return None, []
    return cands[0][1], [p for _, p in cands[1:]]


def polyline_to_segments(
    pts_list: list[np.ndarray], poly_id: int
) -> tuple[np.ndarray, list[frozenset]]:
    """Open polylines -> side-0 labelled segments: they node into the
    arrangement and split faces but never toggle coverage (the reference's
    companion line layer, view_get_simplified_border_lines...sql)."""
    segs = []
    for pts in pts_list:
        pts = np.asarray(pts, dtype=np.int64)
        if len(pts) < 2:
            continue
        segs.append(np.concatenate([pts[:-1], pts[1:]], axis=1))
    if not segs:
        return np.empty((0, 4), dtype=np.int64), []
    segs = np.concatenate(segs)
    labels = [frozenset([(poly_id, 0)])] * len(segs)
    return segs, labels


def overlay_tile(
    polys: list[tuple[int, list[np.ndarray]]],
    tile_bounds: tuple[int, int, int, int],
    min_area2_px: float = 0.0,
    area2_fn=None,
    lines: list[tuple[int, list[np.ndarray]]] | None = None,
) -> list[TileFace]:
    """Overlay for one tile.

    polys: [(poly_id >= 0, normalized rings in snap px)];
    tile_bounds: (x0, y0, x1, y1) snap px;
    min_area2_px: dissolve interior faces with 2*area(px^2) below this;
    area2_fn: optional callable(face_rings)->comparable 2*area overriding
      the px^2 measure (geodesic thresholds for lon/lat data).
    """
    seg_parts = [tile_rect_segments(tile_bounds)]
    for pid, rings in polys:
        seg_parts.append(rings_to_segments(rings, pid))
    for pid, pts in lines or []:
        seg_parts.append(polyline_to_segments(pts, pid))
    segs = np.concatenate([s for s, _ in seg_parts])
    labels = [l for _, ls in seg_parts for l in ls]
    segs, labels = noding.node_segments(segs, labels)
    arr = polygonize.polygonize(segs, labels)

    kept = [f for f in arr.faces if TILE_ID in f.cov]
    if min_area2_px and kept:
        out = _merge_small_faces(arr, kept, min_area2_px, area2_fn)
    else:
        out = [
            TileFace(
                [f.shell] + f.holes,
                f.area2,
                [(f.area2, f.cov - {TILE_ID})],
                TILE_ID in f.touches,
                f.cov - {TILE_ID},
                f.touches - {TILE_ID},
                _ring_masks(f, arr.labels),
            )
            for f in kept
        ]
    heal_border_touch_vertices(out, arr, tile_bounds)
    return out


def _face_measure(f_rings: list[np.ndarray], area2_fn) -> float:
    if area2_fn is None:
        a = abs(ring_signed_area2(f_rings[0]))
        for h in f_rings[1:]:
            a -= abs(ring_signed_area2(h))
        return float(a)
    return float(area2_fn(f_rings))


def _merge_small_faces(
    arr: polygonize.Arrangement,
    kept: list[polygonize.Face],
    min_area2: float,
    area2_fn,
) -> list[TileFace]:
    """Dissolve small interior faces into their longest-boundary neighbour,
    iterating to fixpoint (reference loop:
    function_01_do_remove_small_areas_no_block.sql:52-93)."""
    from .core import seg_lengths

    lengths = seg_lengths(arr.segs)
    region = dict(arr.region_of)  # cycle -> region id (face cycle | UNIVERSE)
    kept_cycles = {f.cycle for f in kept}
    face_by_cycle = {f.cycle: f for f in kept}

    # group = union-find over region ids (face cycles + UNIVERSE and
    # non-kept face cycles, which all act as absorbing sinks)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # measures / protection
    measure: dict[int, float] = {}
    protected: dict[int, bool] = {}
    for f in kept:
        measure[f.cycle] = _face_measure([f.shell] + f.holes, area2_fn)
        protected[f.cycle] = TILE_ID in f.touches

    # neighbour boundary lengths, per pair of region-groups
    def current_groups():
        return {find(c) for c in kept_cycles}

    for _ in range(64):  # fixpoint bound (reference loops until none removed)
        # shared boundary length between groups
        shared: dict[tuple[int, int], float] = {}
        for i in range(len(arr.segs)):
            gl = find(region.get(int(arr.cycle_left[i]), UNIVERSE))
            gr = find(region.get(int(arr.cycle_right[i]), UNIVERSE))
            if gl == gr:
                continue
            key = (gl, gr) if gl < gr else (gr, gl)
            shared[key] = shared.get(key, 0.0) + float(lengths[i])
        merged_any = False
        # deterministic order: smallest area first
        for cyc in sorted(kept_cycles, key=lambda c: (measure.get(find(c), 0.0), c)):
            g = find(cyc)
            if g != cyc:
                continue  # already absorbed
            if protected.get(g, False) or measure.get(g, 0.0) >= min_area2:
                continue
            best, best_len = None, -1.0
            for (a, b), ln in shared.items():
                if a == g or b == g:
                    other = b if a == g else a
                    if ln > best_len or (ln == best_len and (best is None or other < best)):
                        best, best_len = other, ln
            if best is None:
                continue
            # absorb g into best: best's identity/cov wins
            parent[g] = best
            if best in measure:
                measure[best] = measure.get(best, 0.0) + measure.get(g, 0.0)
            protected[best] = protected.get(best, False) or protected.get(g, False)
            merged_any = True
            break  # recompute shared lengths after each merge (small N)
        if not merged_any:
            break

    # rebuild geometry: keep segments whose two sides fall in different groups
    def side_group(cyc: int) -> int:
        return find(region.get(cyc, UNIVERSE))

    surv = [
        i
        for i in range(len(arr.segs))
        if side_group(int(arr.cycle_left[i])) != side_group(int(arr.cycle_right[i]))
    ]
    sub_segs = arr.segs[surv]
    sub_labels = [arr.labels[i] for i in surv]
    arr2 = polygonize.polygonize(sub_segs, sub_labels)
    # map new faces to old groups via a boundary segment's left side
    orig_left = {k: side_group(int(arr.cycle_left[i])) for k, i in enumerate(surv)}
    orig_right = {k: side_group(int(arr.cycle_right[i])) for k, i in enumerate(surv)}
    # new segment order differs; match by coordinates
    key_of = {tuple(s): k for k, s in enumerate(map(tuple, sub_segs))}
    out: list[TileFace] = []
    # ledgers per group
    ledgers: dict[int, list[tuple[int, frozenset]]] = {}
    for f in kept:
        g = find(f.cycle)
        if g in kept_cycles or g in face_by_cycle:
            ledgers.setdefault(g, []).append((f.area2, f.cov - {TILE_ID}))
    for nf in arr2.faces:
        # identify this new face's group
        gid = None
        for i in nf.boundary_segs:
            k = key_of.get(tuple(arr2.segs[i]))
            if k is None:
                continue
            if int(arr2.cycle_left[i]) == nf.cycle:
                gid = orig_left[k]
            elif int(arr2.cycle_right[i]) == nf.cycle:
                gid = orig_right[k]
            if gid is not None:
                break
        if gid is None or gid not in ledgers:
            continue  # universe / non-kept region
        led = ledgers[gid]
        area2 = sum(a for a, _ in led)
        absorber = face_by_cycle.get(gid)
        cov = (absorber.cov - {TILE_ID}) if absorber else frozenset()
        out.append(
            TileFace(
                [nf.shell] + nf.holes,
                area2,
                led,
                TILE_ID in nf.touches,
                cov,
                nf.touches - {TILE_ID},
                _ring_masks(nf, arr2.labels),
            )
        )
    return out


# ---------------------------------------------------------------------------
# artifact-vertex healing (the engine's do_healedges analogue,
# function_01_do_healedges_no_block.sql:1-127): degree-2 vertices introduced
# by tile borders are removed so output geometry is independent of tiling.
# ---------------------------------------------------------------------------


def _near_collinear(a: np.ndarray, v: np.ndarray, b: np.ndarray) -> bool:
    """v within ~0.75 px of segment a-b (the max deviation a snap-rounded
    tile-border split can introduce, plus slack)."""
    cr = float((int(v[0]) - int(a[0])) * (int(b[1]) - int(a[1]))
               - (int(v[1]) - int(a[1])) * (int(b[0]) - int(a[0])))
    ab = float(np.hypot(float(b[0] - a[0]), float(b[1] - a[1])))
    return ab > 0 and abs(cr) <= 1.5 * ab


def heal_border_touch_vertices(
    faces: list[TileFace],
    arr: polygonize.Arrangement,
    bounds: tuple[int, int, int, int],
) -> None:
    """Remove ring vertices where a real edge touches (not crosses) the tile
    border: the vertex lies on the border line, exactly 2 real segments meet
    there, and they are near-collinear.  Both faces adjacent to the edge
    apply the same rule, so shared edges stay identical."""
    x0, y0, x1, y1 = bounds
    deg_real: dict[tuple[int, int], int] = {}
    for i in range(len(arr.segs)):
        if all(p == TILE_ID for p, _ in arr.labels[i]):
            continue
        s = arr.segs[i]
        for pt in ((int(s[0]), int(s[1])), (int(s[2]), int(s[3]))):
            deg_real[pt] = deg_real.get(pt, 0) + 1

    def on_border(p):
        return p[0] == x0 or p[0] == x1 or p[1] == y0 or p[1] == y1

    for f in faces:
        new_rings, new_masks = [], []
        for k, r in enumerate(f.rings):
            m = f.masks[k] if f.masks else np.zeros(len(r), dtype=np.uint8)
            changed = True
            r = r.copy()
            m = m.copy()
            while changed and len(r) > 3:
                changed = False
                for i in range(len(r)):
                    v = (int(r[i, 0]), int(r[i, 1]))
                    if not on_border(v) or deg_real.get(v, 0) != 2:
                        continue
                    if m[i - 1] or m[i]:
                        continue  # incident edge runs along the border
                    a = r[i - 1]
                    b = r[(i + 1) % len(r)]
                    if _near_collinear(a, r[i], b):
                        r = np.delete(r, i, axis=0)
                        m = np.delete(m, i)
                        changed = True
                        break
            new_rings.append(r)
            new_masks.append(m)
        f.rings = new_rings
        f.masks = new_masks
