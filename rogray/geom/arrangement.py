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


def _tile_only_arr(labels) -> np.ndarray:
    """Per-SEGMENT pure-tile-border flags, computed once per arrangement
    (the per-face mask builder fancy-indexes it — the old per-face lambda
    walked every label set once per face)."""
    return np.fromiter(
        (all(p == TILE_ID for p, _ in lab) for lab in labels),
        dtype=bool,
        count=len(labels),
    )


def _border_seg_arr(segs: np.ndarray, tile_only: np.ndarray, bounds=None) -> np.ndarray:
    """Per-SEGMENT tile-border flags (uint8), computed once per arrangement.

    A segment is "border" when it carries only TILE_ID labels (``tile_only``
    from _tile_only_arr), OR (with ``bounds`` given) when it lies
    geometrically ON the tile rectangle — the latter covers clipped
    giant-polygon runs along the rect, whose segments also carry the
    polygon label but must cancel against the neighbouring tile's
    identical run in the stitch.  The geometric test is orientation-
    invariant, so evaluating it on the canonical segment equals the old
    per-ring-edge evaluation."""
    m = tile_only.astype(np.uint8)
    if bounds is not None and len(segs):
        x0, y0, x1, y1 = bounds
        on = (
            (segs[:, 0] == segs[:, 2]) & ((segs[:, 0] == x0) | (segs[:, 0] == x1))
        ) | ((segs[:, 1] == segs[:, 3]) & ((segs[:, 1] == y0) | (segs[:, 1] == y1)))
        m = m | on.astype(np.uint8)
    return m


def _ring_masks(face, border_seg: np.ndarray) -> list[np.ndarray]:
    """Per ring-edge tile-border flags: one fancy index per ring into the
    precomputed per-segment flags (_border_seg_arr)."""
    return [
        border_seg[np.asarray(arr, dtype=np.int64)]
        for arr in [face.shell_seg] + list(face.holes_seg)
    ]


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
        nxt = np.empty_like(r)
        nxt[:-1] = r[1:]
        nxt[-1] = r[0]
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
    smooth: dict | None = None,
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
    tonly = _tile_only_arr(arr.labels)
    if min_area2_px and kept:
        out = _merge_small_faces(arr, kept, min_area2_px, area2_fn, tile_bounds)
    else:
        border_seg = _border_seg_arr(arr.segs, tonly, tile_bounds)
        out = [
            TileFace(
                [f.shell] + f.holes,
                f.area2,
                [(f.area2, f.cov - {TILE_ID})],
                TILE_ID in f.touches,
                f.cov - {TILE_ID},
                f.touches - {TILE_ID},
                _ring_masks(f, border_seg),
            )
            for f in kept
        ]
    heal_border_touch_vertices(out, arr, tile_bounds, tile_only=tonly)
    if smooth:
        smooth_tile_faces(out, arr, tile_bounds, **smooth)
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
    tile_bounds=None,
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

    # fixpoint: ONE merge per iteration (shared lengths recomputed after
    # each), so the bound must cover every small face — the previous fixed
    # 64 silently left small faces unmerged in large single-tile runs
    for _ in range(2 * len(kept) + 8):
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
    tonly2 = _tile_only_arr(arr2.labels)
    border_seg2 = _border_seg_arr(arr2.segs, tonly2, tile_bounds)
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
                _ring_masks(nf, border_seg2),
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
    tile_only: np.ndarray | None = None,
) -> None:
    """Remove ring vertices where a real edge touches (not crosses) the tile
    border: the vertex lies on the border line, exactly 2 real segments meet
    there, and they are near-collinear.  Both faces adjacent to the edge
    apply the same rule, so shared edges stay identical."""
    x0, y0, x1, y1 = bounds
    # degree-2 REAL-segment endpoints ON the border, counted vectorized
    # (coords < 2^28 and nonnegative, so x<<31|y packs collision-free —
    # same packing as the dissolve's segment keys)
    segs = arr.segs
    deg2: set[int] = set()
    if len(segs):
        if tile_only is None:
            tile_only = _tile_only_arr(arr.labels)
        real = segs[~tile_only]
        pts = np.concatenate([real[:, :2], real[:, 2:]])
        onb = (pts[:, 0] == x0) | (pts[:, 0] == x1) | (pts[:, 1] == y0) | (pts[:, 1] == y1)
        pts = pts[onb]
        if len(pts):
            key = (pts[:, 0].astype(np.int64) << np.int64(31)) | pts[:, 1]
            u, c = np.unique(key, return_counts=True)
            deg2 = set(u[c == 2].tolist())

    for f in faces:
        new_rings, new_masks = [], []
        for k, r in enumerate(f.rings):
            m = f.masks[k] if f.masks else np.zeros(len(r), dtype=np.uint8)
            onb = (r[:, 0] == x0) | (r[:, 0] == x1) | (r[:, 1] == y0) | (r[:, 1] == y1)
            if not onb.any():  # interior ring: nothing to heal
                new_rings.append(r)
                new_masks.append(m)
                continue
            changed = True
            r = r.copy()
            m = m.copy()
            while changed and len(r) > 3:
                changed = False
                cand = np.flatnonzero(
                    (r[:, 0] == x0) | (r[:, 0] == x1) | (r[:, 1] == y0) | (r[:, 1] == y1)
                )
                for i in cand:
                    i = int(i)
                    if (int(r[i, 0]) << 31) | int(r[i, 1]) not in deg2:
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


# ---------------------------------------------------------------------------
# in-topology border smoothing (reference JT5: simplify + chaikins applied to
# the resolved faces' edges inside each cell, cell.sql:642-756 +
# chaikins.sql:9-218).  Face boundaries decompose into node-to-node CHAINS;
# every chain is smoothed once in canonical orientation and validated
# SEQUENTIALLY against the live segment set — the engine's analogue of the
# reference's per-edge ST_ChangeEdgeGeom attempts, which validate each new
# edge geometry against the current topology and keep the old geometry on
# failure.  A smoothed chain is accepted only if it stays strictly inside
# the tile rectangle and touches the rest of the arrangement at nothing but
# its own two endpoint nodes; otherwise the exact original chain stays.
# Both adjacent faces then rebuild from the same accepted-chain map, so the
# cleaned faces remain watertight.  Chains containing tile-border segments
# are never smoothed (cross-tile stitch cancellation needs exact borders).
# Like the reference's per-cell pass, cleaning is tiling-AFFECTING: the
# tiling-independence invariant is guaranteed only with cleaning off.
# ---------------------------------------------------------------------------


class _SegIndex:
    """Tiny dynamic grid index over integer segments for contact queries."""

    def __init__(self, cell: int):
        self.cell = max(1, cell)
        self.grid: dict[tuple[int, int], set[int]] = {}
        self.segs: dict[int, tuple[int, int, int, int]] = {}
        self._next = 0

    def _cells(self, s):
        x0 = min(s[0], s[2]) // self.cell
        x1 = max(s[0], s[2]) // self.cell
        y0 = min(s[1], s[3]) // self.cell
        y1 = max(s[1], s[3]) // self.cell
        for cx in range(x0, x1 + 1):
            for cy in range(y0, y1 + 1):
                yield (cx, cy)

    def add(self, s) -> int:
        sid = self._next
        self._next += 1
        s = (int(s[0]), int(s[1]), int(s[2]), int(s[3]))
        self.segs[sid] = s
        for c in self._cells(s):
            self.grid.setdefault(c, set()).add(sid)
        return sid

    def remove(self, sid: int) -> None:
        s = self.segs.pop(sid)
        for c in self._cells(s):
            self.grid[c].discard(sid)

    def near(self, s):
        out = set()
        for c in self._cells(s):
            out |= self.grid.get(c, set())
        return [self.segs[i] for i in out]


def _seg_contact_ok(a, b, allowed: set) -> bool:
    """True iff segments a,b touch at most at points in ``allowed``."""
    p1 = (a[0], a[1]); p2 = (a[2], a[3]); q1 = (b[0], b[1]); q2 = (b[2], b[3])
    d1 = (p2[0]-p1[0])*(q1[1]-p1[1]) - (p2[1]-p1[1])*(q1[0]-p1[0])
    d2 = (p2[0]-p1[0])*(q2[1]-p1[1]) - (p2[1]-p1[1])*(q2[0]-p1[0])
    d3 = (q2[0]-q1[0])*(p1[1]-q1[1]) - (q2[1]-q1[1])*(p1[0]-q1[0])
    d4 = (q2[0]-q1[0])*(p2[1]-q1[1]) - (q2[1]-q1[1])*(p2[0]-q1[0])
    if ((d1 > 0) != (d2 > 0)) and d1 != 0 and d2 != 0 and \
       ((d3 > 0) != (d4 > 0)) and d3 != 0 and d4 != 0:
        return False  # proper crossing
    if d1 == 0 and d2 == 0:  # collinear: reject interior interval overlap
        ax = abs(p2[0] - p1[0]) >= abs(p2[1] - p1[1])
        k = 0 if ax else 1
        lo = max(min(p1[k], p2[k]), min(q1[k], q2[k]))
        hi = min(max(p1[k], p2[k]), max(q1[k], q2[k]))
        if lo < hi:
            return False
    for (o, p, q) in ((p1, p2, q1), (p1, p2, q2), (q1, q2, p1), (q1, q2, p2)):
        col = (p[0]-o[0])*(q[1]-o[1]) - (p[1]-o[1])*(q[0]-o[0]) == 0
        if (col and min(o[0], p[0]) <= q[0] <= max(o[0], p[0])
                and min(o[1], p[1]) <= q[1] <= max(o[1], p[1])
                and q not in allowed):
            return False
    return True


def smooth_tile_faces(
    faces: list[TileFace],
    arr,
    tile_bounds: tuple[int, int, int, int],
    simplify_tol_px: float = 0.0,
    chaikins_iters: int = 0,
    chaikins_min_deg: float = 30.0,
    chaikins_max_deg: float = 330.0,
    chaikins_max_len_px: float = 0.0,
) -> None:
    """Smooth face-boundary chains in place (see section comment)."""
    from . import simplify as simp

    if simplify_tol_px <= 0 and chaikins_iters <= 0:
        return
    x0, y0, x1, y1 = tile_bounds
    deg: dict[tuple[int, int], int] = {}
    for s in arr.segs:
        for pt in ((int(s[0]), int(s[1])), (int(s[2]), int(s[3]))):
            deg[pt] = deg.get(pt, 0) + 1

    def smooth_open(chain: np.ndarray) -> np.ndarray:
        out = chain.astype(np.float64)
        if simplify_tol_px > 0 and len(out) > 2:
            for r in range(1, 6):  # reference back-off ladder (cell.sql:695-703)
                cand = simp.douglas_peucker(out, simplify_tol_px / r)
                if len(cand) >= 2:
                    out = cand
                    break
        if chaikins_iters > 0:
            out = simp.chaikins_acute_angle(
                out,
                n_iterations=chaikins_iters,
                min_degrees=chaikins_min_deg,
                max_degrees=chaikins_max_deg,
                max_length=chaikins_max_len_px or np.inf,
            )
        snapped = np.round(out).astype(np.int64)
        keep = np.empty(len(snapped), dtype=bool)
        keep[0] = True
        np.any(snapped[1:] != snapped[:-1], axis=1, out=keep[1:])
        return snapped[keep]

    # --- pass 1: decompose rings into chains; register unique ones --------
    chain_ids: dict[tuple, int] = {}
    originals: list[np.ndarray] = []

    def register(chain: np.ndarray) -> tuple[int, bool]:
        a = (int(chain[0, 0]), int(chain[0, 1]))
        b = (int(chain[-1, 0]), int(chain[-1, 1]))
        if a < b:
            fwd = True
        elif a > b:
            fwd = False
        else:
            # closed loop (island ring / self-loop): adjacent faces traverse
            # it oppositely — canonicalize by the interior vertex sequence
            fseq = tuple(map(tuple, chain[1:-1].tolist()))
            fwd = fseq <= fseq[::-1]
        pts = chain if fwd else chain[::-1]
        key = tuple(map(tuple, pts.tolist()))
        cid = chain_ids.get(key)
        if cid is None:
            cid = len(originals)
            chain_ids[key] = cid
            originals.append(pts)
        return cid, fwd

    per_face: list[list[list]] = []  # face -> ring -> [(cid|None, fwd, full_chain, mask)]
    fixed_obstacles: list[np.ndarray] = []
    for f in faces:
        rings_plan = []
        for k, ring in enumerate(f.rings):
            m = f.masks[k] if f.masks else np.zeros(len(ring), dtype=np.uint8)
            n = len(ring)
            node_pos = [
                i for i in range(n)
                if deg.get((int(ring[i, 0]), int(ring[i, 1])), 0) != 2
            ]
            plan = []
            if not node_pos:
                if m.any() or n < 4:
                    plan.append((None, True, np.vstack([ring, ring[:1]]), m))
                else:
                    start = min(range(n), key=lambda i: (int(ring[i, 0]), int(ring[i, 1])))
                    rr = np.roll(ring, -start, axis=0)
                    cid, fwd = register(np.vstack([rr, rr[:1]]))
                    plan.append((cid, fwd, np.vstack([rr, rr[:1]]), np.zeros(n, dtype=np.uint8)))
                rings_plan.append(plan)
                continue
            start = node_pos[0]
            rr = np.roll(ring, -start, axis=0)
            mm = np.roll(m, -start)
            npos = sorted((p - start) % n for p in node_pos)
            bounds_ = npos + [n]
            for bi in range(len(npos)):
                i0, i1 = bounds_[bi], bounds_[bi + 1]
                if i1 < n:
                    chain = rr[i0 : i1 + 1]
                    cmask = mm[i0:i1]
                else:
                    chain = np.vstack([rr[i0:], rr[:1]])
                    cmask = mm[i0:]
                if cmask.any() or len(chain) < 3:
                    plan.append((None, True, chain, cmask))
                else:
                    cid, fwd = register(chain)
                    plan.append((cid, fwd, chain, cmask))
            rings_plan.append(plan)
        per_face.append(rings_plan)

    # --- pass 2: sequential smooth-and-validate against the live set ------
    # index starts with every chain's ORIGINAL segments exactly once, plus
    # every non-chain (border/mask/short) piece as immutable obstacles
    ext = np.maximum(np.abs(arr.segs[:, 2] - arr.segs[:, 0]),
                     np.abs(arr.segs[:, 3] - arr.segs[:, 1])) if len(arr.segs) else np.array([1])
    index = _SegIndex(int(np.percentile(ext, 75)) or 1)
    chain_seg_ids: dict[int, list[int]] = {}

    def add_chain(pts: np.ndarray) -> list[int]:
        return [index.add((pts[i, 0], pts[i, 1], pts[i + 1, 0], pts[i + 1, 1]))
                for i in range(len(pts) - 1)]

    for cid, pts in enumerate(originals):
        chain_seg_ids[cid] = add_chain(pts)
    seen_fixed: set[tuple] = set()
    for rings_plan in per_face:
        for plan in rings_plan:
            for cid, fwd, full, cmask in plan:
                if cid is None and len(full) >= 2:
                    key = tuple(map(tuple, full.tolist()))
                    rkey = tuple(map(tuple, full[::-1].tolist()))
                    if key in seen_fixed or rkey in seen_fixed:
                        continue
                    seen_fixed.add(key)
                    add_chain(full)

    smoothed: list[np.ndarray] = list(originals)
    for cid in range(len(originals)):
        pts = originals[cid]
        sm = smooth_open(pts)
        if len(sm) < 2 or np.array_equal(sm, pts):
            continue
        interior = sm[1:-1]
        if len(interior) and not bool(
            np.all((interior[:, 0] > x0) & (interior[:, 0] < x1)
                   & (interior[:, 1] > y0) & (interior[:, 1] < y1))
        ):
            continue  # left the tile: keep exact original
        # temporarily remove own segments, then contact-test the candidate
        for sid in chain_seg_ids[cid]:
            index.remove(sid)
        a = (int(sm[0, 0]), int(sm[0, 1]))
        b = (int(sm[-1, 0]), int(sm[-1, 1]))
        allowed = {a, b}
        ok = True
        cand_segs = [
            (int(sm[i, 0]), int(sm[i, 1]), int(sm[i + 1, 0]), int(sm[i + 1, 1]))
            for i in range(len(sm) - 1)
        ]
        # self-contacts: candidate segments against each other (non-adjacent)
        for i in range(len(cand_segs)):
            for j in range(i + 1, len(cand_segs)):
                shared = {(cand_segs[i][0], cand_segs[i][1]), (cand_segs[i][2], cand_segs[i][3])} & \
                         {(cand_segs[j][0], cand_segs[j][1]), (cand_segs[j][2], cand_segs[j][3])}
                if not _seg_contact_ok(cand_segs[i], cand_segs[j], allowed | shared if j == i + 1 else allowed):
                    ok = False
                    break
            if not ok:
                break
        if ok:
            for cs in cand_segs:
                for other in index.near(cs):
                    if not _seg_contact_ok(cs, other, allowed):
                        ok = False
                        break
                if not ok:
                    break
        if ok:
            smoothed[cid] = sm
            chain_seg_ids[cid] = add_chain(sm)
        else:
            chain_seg_ids[cid] = add_chain(pts)

    # --- pass 3: rebuild rings from the accepted chain map ----------------
    for fi, f in enumerate(faces):
        new_rings, new_masks = [], []
        for plan in per_face[fi]:
            pieces, pmasks = [], []
            for cid, fwd, full, cmask in plan:
                if cid is None:
                    pieces.append(full[:-1])
                    pmasks.append(cmask)
                else:
                    sm = smoothed[cid] if fwd else smoothed[cid][::-1]
                    pieces.append(sm[:-1])
                    pmasks.append(np.zeros(len(sm) - 1, dtype=np.uint8))
            cand = np.concatenate(pieces)
            new_rings.append(cand)
            new_masks.append(np.concatenate(pmasks).astype(np.uint8))
        f.rings = new_rings
        f.masks = new_masks
        a2 = abs(ring_signed_area2(f.rings[0]))
        for h in f.rings[1:]:
            a2 -= abs(ring_signed_area2(h))
        f.area2 = int(a2)
