"""Planar-graph polygonization + coverage labelling (exact, from scratch).

Turns a noded, labelled segment set (output of rogray.geom.noding) into the
faces of its arrangement — the engine's analogue of the reference's PostGIS
topology face set (edge_data/node/face tables built by
topology.TopoGeo_addLinestring; face geometry via ST_GetFaceGeometry,
function_01_get_face_geo_geo.sql).

Algorithm (all exact integer arithmetic, deterministic):
1. half-edge structure; outgoing edges CCW-sorted per node; next(e) =
   clockwise-neighbour of twin(e) -> each traced cycle has its region on
   the LEFT; in a connected component every bounded face is one positive
   cycle and the component hull is the single negative cycle.
2. component nesting by exact downward ray casts from each component's
   bottom vertex (no floating point, no epsilon).
3. polygon-coverage sets per region by flood fill across segments using
   the (poly_id, side) labels — crossing a segment toggles exactly the
   polygons whose boundary it carries.  This replaces JT7's
   area-of-intersection coverage join (cell.sql:833-873) with an exact
   combinatorial computation: every face of the arrangement is covered
   0% or 100% by each input polygon.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .noding import _run_bounds


@dataclass
class Face:
    cycle: int                      # positive-cycle id (shell)
    shell: np.ndarray               # (N,2) int ring, CCW
    holes: list[np.ndarray]         # (N,2) int rings, CW
    area2: int                      # 2*shell area minus holes (grid units)
    cov: frozenset                  # poly ids covering this face
    touches: frozenset              # all label poly ids on the boundary
    boundary_segs: list[int] = field(default_factory=list)  # segment indices
    shell_seg: np.ndarray | None = None   # segment index per shell edge (ring-aligned)
    holes_seg: list[np.ndarray] = field(default_factory=list)


UNIVERSE = -2


def _unique_points(pts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """np.unique(pts, axis=0) via packed 1-D int64 keys (coordinate RANGE
    < 2^30 by the span_px < 2^28 bound, offset to non-negative) — several
    times faster than the void-view sort of axis=0 unique."""
    if len(pts) == 0:
        return pts.reshape(0, 2).astype(np.int64), np.empty(0, np.int64)
    mnx = np.int64(pts[:, 0].min())
    mny = np.int64(pts[:, 1].min())
    key = (pts[:, 0] - mnx) * np.int64(1 << 31) + (pts[:, 1] - mny)
    uniq_keys, inv = np.unique(key, return_inverse=True)
    uniq = np.empty((len(uniq_keys), 2), dtype=np.int64)
    uniq[:, 0] = (uniq_keys >> 31) + mnx
    uniq[:, 1] = (uniq_keys & np.int64((1 << 31) - 1)) + mny
    return uniq, inv


def _nesting_raycasts(
    segs: np.ndarray,
    seg_comp: np.ndarray,
    uniq_pts: np.ndarray,
    comp_bottom: np.ndarray,
    cycle_of: np.ndarray,
    ncomp: int,
) -> list[int]:
    """Containing cycle per component via exact downward ray casts from each
    component's bottom vertex — vectorized.

    Candidates come from a 1-D x-interval grid (O(total stabbing pairs),
    not O(ncomp * nsegs)); the nearest-below crossing per query is selected
    with float64 y-values, then every candidate within 0.5 px of the float
    winner is re-compared with exact integer fractions (float error is
    bounded by ~2^-52 * span << 0.5, so the window provably contains the
    true maximum).
    """
    n = len(segs)
    sx1, sy1, sx2, sy2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    qx_arr = uniq_pts[comp_bottom, 0]
    qy_arr = uniq_pts[comp_bottom, 1]
    containing = [-1] * ncomp

    # 2-D bucket grid over segment bboxes: each query probes only its own
    # x-column, moving DOWNWARD bucket by bucket and stopping as soon as the
    # best crossing found lies at or above the bottom of the current bucket
    # (all deeper buckets hold strictly lower crossings).  The cell width
    # adapts upward until the bbox expansion is O(n).
    ext = np.maximum(np.abs(sx2 - sx1), np.abs(sy2 - sy1))
    cell = max(1, int(np.percentile(ext, 75)) if n else 1)
    while True:
        cx0 = np.minimum(sx1, sx2) // cell
        cx1 = np.maximum(sx1, sx2) // cell
        cy0 = np.minimum(sy1, sy2) // cell
        cy1 = np.maximum(sy1, sy2) // cell
        counts = ((cx1 - cx0 + 1) * (cy1 - cy0 + 1)).astype(np.int64)
        total = int(counts.sum())
        if total <= 8 * n or cell > (1 << 30):
            break
        cell *= 4
    idx = np.repeat(np.arange(n), counts)
    k = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)
    nx_r = np.repeat(cx1 - cx0 + 1, counts)
    col = np.repeat(cx0, counts) + k % nx_r
    yb = np.repeat(cy0, counts) + k // nx_r
    # pack (col, yb) collision-free: both ranges < 2^31 after offset
    coff = np.int64(col.min()) if total else np.int64(0)
    yoff = np.int64(yb.min()) if total else np.int64(0)
    keys = (col - coff) * np.int64(1 << 31) + (yb - yoff)
    order = np.argsort(keys, kind="stable")
    keys_s, idx_s = keys[order], idx[order]
    ukeys, kstarts = np.unique(keys_s, return_index=True)
    kends = np.empty(len(kstarts), dtype=np.int64)
    kends[:-1] = kstarts[1:]
    if len(kends):
        kends[-1] = len(keys_s)
    ucol = (ukeys >> np.int64(31)) + coff
    uyb = (ukeys & np.int64((1 << 31) - 1)) + yoff
    # per-column contiguous runs in (ucol, uyb) order (ukeys is col-major)
    col_starts, col_ends = _run_bounds(ucol[1:] != ucol[:-1], len(ucol))
    col_range = {int(ucol[s]): (s, e) for s, e in zip(col_starts.tolist(), col_ends.tolist())}

    for c in range(ncomp):
        qx = int(qx_arr[c])
        qy = int(qy_arr[c])
        rng = col_range.get(qx // cell)
        if rng is None:
            continue
        s0, e0 = rng
        ybs = uyb[s0:e0]  # ascending occupied y-buckets of this column
        j = int(np.searchsorted(ybs, qy // cell, side="right")) - 1
        best_num = best_den = 0
        best_seg = -1
        best_val = -np.inf
        while j >= 0:
            bstart, bend = int(kstarts[s0 + j]), int(kends[s0 + j])
            S = idx_s[bstart:bend]
            den = sx2[S] - sx1[S]
            ok = (sx1[S] <= qx) & (qx < sx2[S]) & (seg_comp[S] != c)
            if ok.any():
                Sv = S[ok]
                denv = den[ok]
                num = sy1[Sv] * denv + (qx - sx1[Sv]) * (sy2[Sv] - sy1[Sv])
                below = num < qy * denv
                if below.any():
                    Sv, denv, num = Sv[below], denv[below], num[below]
                    val = num.astype(np.float64) / denv.astype(np.float64)
                    # float argmax + exact re-compare of near-ties (float
                    # error ~2^-52 * span << 0.5 px window)
                    bi = int(np.argmax(val))
                    cand = np.flatnonzero(val >= val[bi] - 0.5)
                    bn, bd, bs, bv = int(num[bi]), int(denv[bi]), int(Sv[bi]), float(val[bi])
                    for t in cand.tolist():
                        if t == bi:
                            continue
                        tn, td = int(num[t]), int(denv[t])
                        if tn * bd > bn * td:
                            bn, bd, bs, bv = tn, td, int(Sv[t]), float(val[t])
                    if best_seg == -1 or bn * best_den > best_num * bd:
                        best_num, best_den, best_seg, best_val = bn, bd, bs, bv
            # stop: best crossing at/above the bottom of this bucket beats
            # anything in strictly lower buckets (0.5 px float safety)
            if best_seg != -1 and best_val >= float(int(ybs[j]) * cell) + 0.5:
                break
            j -= 1
        if best_seg != -1:
            containing[c] = int(cycle_of[2 * best_seg])  # upper side
    return containing


@dataclass
class Arrangement:
    segs: np.ndarray                # (M,4) canonical noded segments
    labels: list[frozenset]
    faces: list[Face]
    cycle_left: np.ndarray          # cycle id left of canonical dir, per segment
    cycle_right: np.ndarray         # cycle id right of canonical dir
    cycle_cov: dict[int, frozenset]
    cycle_area2: dict[int, int]
    universe_cycles: set[int]       # cycles whose region is the global universe
    region_of: dict[int, int]       # cycle id -> region id (face cycle or UNIVERSE)


def polygonize(segs: np.ndarray, labels: list[frozenset]) -> Arrangement:
    segs = np.asarray(segs, dtype=np.int64).reshape(-1, 4)
    n = len(segs)
    if n == 0:
        return Arrangement(segs, [], [], np.empty(0, np.int64), np.empty(0, np.int64), {}, {}, set(), {})

    # ---- prune dangles (degree-1 chains) -------------------------------
    alive = np.ones(n, dtype=bool)
    pts = np.concatenate([segs[:, :2], segs[:, 2:]])
    uniq_pts, inv = _unique_points(pts)
    u_node = inv[:n]
    v_node = inv[n:]
    while True:
        deg = np.zeros(len(uniq_pts), dtype=np.int64)
        np.add.at(deg, u_node[alive], 1)
        np.add.at(deg, v_node[alive], 1)
        bad = alive & ((deg[u_node] <= 1) | (deg[v_node] <= 1))
        if not bad.any():
            break
        alive &= ~bad
    if not alive.any():
        # EVERYTHING pruned: present a consistent fully-empty arrangement
        # (segs and the per-segment cycle arrays must stay aligned —
        # carrying the input segs with empty cycle arrays crashed callers
        # that index cycles by segment position)
        return Arrangement(segs[:0], [], [], np.empty(0, np.int64), np.empty(0, np.int64), {}, {}, set(), {})
    keep_idx = np.flatnonzero(alive)
    segs = segs[keep_idx]
    labels = [labels[i] for i in keep_idx]
    n = len(segs)
    pts = np.concatenate([segs[:, :2], segs[:, 2:]])
    uniq_pts, inv = _unique_points(pts)
    u_node = inv[:n]
    v_node = inv[n:]

    # ---- half edges -----------------------------------------------------
    # directed edge 2i = u->v (canonical), 2i+1 = v->u
    e_orig = np.empty(2 * n, dtype=np.int64)
    e_dest = np.empty(2 * n, dtype=np.int64)
    e_orig[0::2], e_dest[0::2] = u_node, v_node
    e_orig[1::2], e_dest[1::2] = v_node, u_node
    dx = np.empty(2 * n, dtype=np.int64)
    dy = np.empty(2 * n, dtype=np.int64)
    dx[0::2] = segs[:, 2] - segs[:, 0]
    dy[0::2] = segs[:, 3] - segs[:, 1]
    dx[1::2] = -dx[0::2]
    dy[1::2] = -dy[0::2]
    ang = np.arctan2(dy.astype(np.float64), dx.astype(np.float64))

    order = np.lexsort((ang, e_orig))
    # for each node: contiguous run in `order` (vectorized)
    sorted_nodes = e_orig[order]
    starts, ends = _run_bounds(sorted_nodes[1:] != sorted_nodes[:-1], len(order))
    node_run_start = np.zeros(len(uniq_pts), dtype=np.int64)
    node_run_end = np.zeros(len(uniq_pts), dtype=np.int64)
    node_run_start[sorted_nodes[starts]] = starts
    node_run_end[sorted_nodes[starts]] = ends
    pos_in_run = np.empty(2 * n, dtype=np.int64)
    pos_in_run[order] = np.arange(len(order))

    # next(e) for every directed edge at once: CW neighbour of twin(e)
    twins = np.arange(2 * n) ^ 1
    tw_node = e_orig[twins]
    p = pos_in_run[twins]
    s_run = node_run_start[tw_node]
    e_run = node_run_end[tw_node]
    nxt = order[np.where(p == s_run, e_run - 1, p - 1)]

    # ---- trace cycles (tight pointer-chase) ----------------------------
    cycle_of = np.full(2 * n, -1, dtype=np.int64)
    cycles_edges: list[list[int]] = []
    nxt_l = nxt.tolist()
    cyc_l = cycle_of.tolist()
    for e0 in range(2 * n):
        if cyc_l[e0] != -1:
            continue
        cid = len(cycles_edges)
        path = []
        e = e0
        while cyc_l[e] == -1:
            cyc_l[e] = cid
            path.append(e)
            e = nxt_l[e]
        cycles_edges.append(path)
    cycle_of = np.asarray(cyc_l, dtype=np.int64)

    # ---- cycle signed areas: vectorized int64 with cycle-local origin ---
    # contribution of directed edge e (u->v) to its cycle: (u-b) x (v-b)
    # with b = the cycle's first vertex; diffs are bounded by the data
    # extent so products fit int64; the exact Python-int path is kept as a
    # fallback for any cycle flagged by a float magnitude check.
    ncyc = len(cycles_edges)
    first_edge = np.asarray([p[0] for p in cycles_edges], dtype=np.int64)
    bx = uniq_pts[e_orig[first_edge], 0][cycle_of]
    by = uniq_pts[e_orig[first_edge], 1][cycle_of]
    ux = uniq_pts[e_orig, 0] - bx
    uy = uniq_pts[e_orig, 1] - by
    vx = uniq_pts[e_dest, 0] - bx
    vy = uniq_pts[e_dest, 1] - by
    contrib = ux * vy - vx * uy
    acc = np.zeros(ncyc, dtype=np.int64)
    np.add.at(acc, cycle_of, contrib)
    # overflow guard: recompute any suspiciously-large cycle exactly
    accf = np.zeros(ncyc, dtype=np.float64)
    np.add.at(accf, cycle_of, contrib.astype(np.float64))
    cycle_area2: dict[int, int] = {}
    for cid in range(ncyc):
        if abs(accf[cid]) > 2**60 or abs(accf[cid] - acc[cid]) > 1.0:
            path = cycles_edges[cid]
            xs = uniq_pts[e_orig[path], 0].astype(object)
            ys = uniq_pts[e_orig[path], 1].astype(object)
            x0, y0 = xs[0], ys[0]
            a = 0
            for k in range(len(path)):
                k2 = (k + 1) % len(path)
                a += (xs[k] - x0) * (ys[k2] - y0) - (xs[k2] - x0) * (ys[k] - y0)
            cycle_area2[cid] = a
        else:
            cycle_area2[cid] = int(acc[cid])

    # ---- connected components ------------------------------------------
    # plain-list union-find: Python list element access is ~3x faster than
    # numpy scalar indexing in this pointer-chase
    parent = list(range(len(uniq_pts)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(u_node.tolist(), v_node.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_of_node = np.fromiter(
        (find(i) for i in range(len(uniq_pts))), np.int64, len(uniq_pts)
    )
    comp_ids = np.unique(comp_of_node)
    # vectorized comp-index lookup (comp_ids is sorted)
    comp_idx_of_node = np.searchsorted(comp_ids, comp_of_node)
    seg_comp = comp_idx_of_node[u_node]
    cycle_comp = {}
    for cid, path in enumerate(cycles_edges):
        cycle_comp[cid] = int(comp_idx_of_node[e_orig[path[0]]])

    ncomp = len(comp_ids)
    # hull cycle per component = most negative cycle
    hull_of_comp = [-1] * ncomp
    hull_area = [1] * ncomp
    for cid, a2 in cycle_area2.items():
        c = cycle_comp[cid]
        if hull_of_comp[c] == -1 or a2 < hull_area[c]:
            hull_of_comp[c] = cid
            hull_area[c] = a2

    # ---- component nesting via exact downward ray casts -----------------
    # bottom vertex per component: first occurrence per comp in (y, x) order
    comp_bottom = np.full(ncomp, -1, dtype=np.int64)
    ord_asc = np.lexsort((uniq_pts[:, 0], uniq_pts[:, 1]))
    comps_sorted, firsts = np.unique(comp_idx_of_node[ord_asc], return_index=True)
    comp_bottom[comps_sorted] = ord_asc[firsts]
    containing_cycle = [-1] * ncomp  # cycle whose region contains this component
    if ncomp > 1:
        containing_cycle = _nesting_raycasts(
            segs, seg_comp, uniq_pts, comp_bottom, cycle_of, ncomp
        )
    # resolve containment to faces + universe set
    universe_cycles: set[int] = set()
    for c in range(ncomp):
        if containing_cycle[c] == -1:
            universe_cycles.add(hull_of_comp[c])
    # iterate: a hull contained in a universe-region hull is itself bounding universe-adjacent region?
    # (hull H of comp K bounds K's outside. If containing cycle of K is a hull in universe set,
    #  K floats in the universe -> K's hull also bounds universe.)
    changed = True
    while changed:
        changed = False
        for c in range(ncomp):
            cc = containing_cycle[c]
            if cc != -1 and cc in universe_cycles and hull_of_comp[c] not in universe_cycles:
                universe_cycles.add(hull_of_comp[c])
                changed = True

    # ---- coverage flood fill -------------------------------------------
    # order components by dependency: containing component first
    cycle_cov: dict[int, frozenset] = {}
    comp_order: list[int] = []
    state = [0] * ncomp

    def comp_of_cycle(cid: int) -> int:
        return cycle_comp[cid]

    def visit(c: int) -> None:
        if state[c] == 1:
            return
        state[c] = 1
        cc = containing_cycle[c]
        if cc != -1:
            visit(comp_of_cycle(cc))
        comp_order.append(c)

    for c in range(ncomp):
        visit(c)

    # segment adjacency lists per component / per cycle, built by grouping a
    # sorted index array (no per-element dict setdefault)
    cl_all = cycle_of[0::2]
    cr_all = cycle_of[1::2]
    seg_dup = np.concatenate([np.arange(n), np.arange(n)])
    comp_dup = np.concatenate([seg_comp, seg_comp])
    cyc_dup = np.concatenate([cl_all, cr_all])
    ordc = np.lexsort((cyc_dup, comp_dup))
    comp_sorted_d = comp_dup[ordc]
    cyc_sorted_d = cyc_dup[ordc]
    seg_sorted_d = seg_dup[ordc]
    grp_starts, grp_ends = _run_bounds(
        (comp_sorted_d[1:] != comp_sorted_d[:-1]) | (cyc_sorted_d[1:] != cyc_sorted_d[:-1]),
        len(ordc),
    )
    cyc_segs_by_comp: dict[int, dict[int, np.ndarray]] = {}
    for s, e in zip(grp_starts.tolist(), grp_ends.tolist()):
        cyc_segs_by_comp.setdefault(int(comp_sorted_d[s]), {})[int(cyc_sorted_d[s])] = seg_sorted_d[s:e]

    # EVEN-ODD toggles (symmetric difference), precomputed once per
    # segment: crossing a segment flips membership for every poly whose
    # boundary it carries with exactly one orientation.  For valid
    # (simple) polygons this is identical to the directional
    # remove-left/add-right update; for INVALID self-crossing boundaries
    # the directional update is path-dependent (two BFS spanning trees can
    # disagree), which made coverage — and therefore winner attribution —
    # depend on the tiling.  Even-odd is Z2-consistent for any
    # node-parity-even boundary, i.e. deterministic and tiling-independent.
    def _tog(lab) -> frozenset:
        sides: dict[int, int] = {}
        for p, s in lab:
            m = sides.get(p)
            if m is None:
                sides[p] = s
            elif m != s:
                sides[p] = -2  # both orientations: no toggle
        return frozenset(p for p, s in sides.items() if s != -2)

    # label sets are shared objects (rings_to_segments emits one frozenset
    # per ring; noding only replaces them on merges), so memoizing by
    # object identity collapses the per-segment set walks to one per
    # distinct label
    _tog_memo: dict[int, frozenset] = {}
    _pid_memo: dict[int, frozenset] = {}
    tog_of = []
    pids_of = []
    for lab in labels:
        key = id(lab)
        got = _tog_memo.get(key)
        if got is None:
            got = _tog(lab)
            _tog_memo[key] = got
            _pid_memo[key] = frozenset(p for p, _ in lab)
        tog_of.append(got)
        pids_of.append(_pid_memo[key])

    for c in comp_order:
        cc = containing_cycle[c]
        outside = frozenset() if cc == -1 else cycle_cov[cc]
        hull = hull_of_comp[c]
        cov = {hull: outside}
        # BFS across segments
        stack = [hull]
        cyc_segs = cyc_segs_by_comp.get(int(c), {})
        while stack:
            cur = stack.pop()
            for i in cyc_segs.get(cur, ()):
                left = int(cycle_of[2 * i])
                right = int(cycle_of[2 * i + 1])
                tog = tog_of[i]
                if left == cur and right not in cov:
                    cov[right] = cov[left] ^ tog
                    stack.append(right)
                elif right == cur and left not in cov:
                    cov[left] = cov[right] ^ tog
                    stack.append(left)
        cycle_cov.update(cov)

    # ---- assemble faces -------------------------------------------------
    def cycle_ring(cid: int) -> np.ndarray:
        path = cycles_edges[cid]
        return uniq_pts[e_orig[path]].astype(np.int64)

    def cycle_seg_idx(cid: int) -> np.ndarray:
        # segment index of the edge leaving each ring vertex (ring-aligned)
        return np.asarray([e >> 1 for e in cycles_edges[cid]], dtype=np.int64)

    # map hull -> owning face cycle (resolve through sibling hulls)
    def owner_face_cycle(c: int) -> int:
        seen = set()
        cur = c
        while True:
            cc = containing_cycle[cur]
            if cc == -1:
                return -1
            if cycle_area2[cc] > 0:
                return cc
            nxt = comp_of_cycle(cc)
            if nxt in seen:
                return -1
            seen.add(nxt)
            cur = nxt

    holes_of: dict[int, list[int]] = {}
    for c in range(ncomp):
        oc = owner_face_cycle(c)
        if oc != -1:
            holes_of.setdefault(oc, []).append(hull_of_comp[c])

    faces: list[Face] = []
    cycle_left = cycle_of[0::2].copy()
    cycle_right = cycle_of[1::2].copy()
    ordl = np.argsort(cyc_dup, kind="stable")
    cyc_sorted_l = cyc_dup[ordl]
    seg_sorted_l = seg_dup[ordl]
    sl_starts, sl_ends = _run_bounds(cyc_sorted_l[1:] != cyc_sorted_l[:-1], len(ordl))
    seg_lists: dict[int, list[int]] = {
        int(cyc_sorted_l[s]): seg_sorted_l[s:e].tolist()
        for s, e in zip(sl_starts.tolist(), sl_ends.tolist())
    }
    for cid, a2 in cycle_area2.items():
        if a2 <= 0:
            continue
        shell = cycle_ring(cid)
        hole_cycles = holes_of.get(cid, [])
        holes = [cycle_ring(h) for h in hole_cycles]
        area2 = a2 + sum(cycle_area2[h] for h in hole_cycles)
        bsegs = list(seg_lists.get(cid, []))
        for h in hole_cycles:
            bsegs.extend(seg_lists.get(h, []))
        cov = cycle_cov.get(cid, frozenset())
        touches = (
            frozenset().union(*(pids_of[i] for i in bsegs)) if bsegs else frozenset()
        )
        faces.append(
            Face(
                cid, shell, holes, area2, cov, touches, bsegs,
                cycle_seg_idx(cid), [cycle_seg_idx(h) for h in hole_cycles],
            )
        )

    # region id per cycle: positive cycles are their own region; a negative
    # hull's region is the face owning its component (or the universe)
    region_of: dict[int, int] = {}
    for cid, a2 in cycle_area2.items():
        if a2 > 0:
            region_of[cid] = cid
    for c in range(ncomp):
        h = hull_of_comp[c]
        oc = owner_face_cycle(c)
        region_of[h] = oc if oc != -1 else UNIVERSE

    return Arrangement(segs, labels, faces, cycle_left, cycle_right, cycle_cov, cycle_area2, universe_cycles, region_of)
