"""Snap-rounded noding of a labelled segment soup (exact integer arithmetic).

This replaces the reference's PostGIS-Topology line insertion
(topology.TopoGeo_addLinestring wrapped by the fault-tolerant ladder in
function_03_add_border_lines.sql:8-375).  In the reference, concurrent
inserts into a shared topology need tolerance-escalation/retry rescue
ladders; here, noding is a deterministic pure function per tile, so the
whole ladder collapses to Guibas-Marimont-style snap rounding:

  1. split segments at pairwise intersection points (rounded to the grid),
  2. snap segments passing within half a pixel of any vertex ("hot pixel"),
  3. iterate to fixpoint.

Each input segment carries labels (poly_id, side): side=+1 means the
polygon's interior lies on the LEFT of the canonical direction.  Duplicate
segments merge their label sets — this is how shared borders between
adjacent polygons become single topology edges (the reference gets this
from ST_Union + TopoGeo dedup, view_get_simplified_border_lines_...sql:154).
"""

from __future__ import annotations

import numpy as np

Label = tuple[int, int]  # (poly_id, side)  side=+1 interior-left, -1 interior-right


def _canonicalize(segs: np.ndarray, labels: list[frozenset]) -> tuple[np.ndarray, list[frozenset]]:
    """Orient each segment with the lexicographically smaller endpoint first,
    flipping label sides when reversed; drop degenerates; merge duplicates."""
    segs = np.asarray(segs, dtype=np.int64).reshape(-1, 4)
    keep = (segs[:, 0] != segs[:, 2]) | (segs[:, 1] != segs[:, 3])
    segs = segs[keep]
    labels = [l for l, k in zip(labels, keep) if k]
    flip = (segs[:, 0] > segs[:, 2]) | ((segs[:, 0] == segs[:, 2]) & (segs[:, 1] > segs[:, 3]))
    segs = segs.copy()
    segs[flip] = segs[flip][:, [2, 3, 0, 1]]
    labels = [
        frozenset((p, -s) for p, s in l) if f else l for l, f in zip(labels, flip)
    ]
    if len(segs) == 0:
        return segs, labels
    order = np.lexsort((segs[:, 3], segs[:, 2], segs[:, 1], segs[:, 0]))
    segs = segs[order]
    labels = [labels[i] for i in order]
    same = np.all(segs[1:] == segs[:-1], axis=1)
    if same.any():
        starts, ends = _run_bounds(~same, len(segs))
        out_labels = [
            labels[s] if e - s == 1 else frozenset().union(*labels[s:e])
            for s, e in zip(starts.tolist(), ends.tolist())
        ]
        return segs[starts], out_labels
    return segs, labels


_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}

def _run_bounds(diff_mask, n):
    """(starts, ends) of equal-runs given the "differs from previous" mask
    over positions 1..n-1 — np.r_-free (np.r_ costs ~30us per call, which
    dominates when the kernels run per coverage signature)."""
    first = np.empty(len(diff_mask) + 1, dtype=bool)
    first[0] = True
    first[1:] = diff_mask
    starts = np.flatnonzero(first)
    ends = np.empty(len(starts), dtype=np.int64)
    ends[:-1] = starts[1:]
    ends[-1] = n
    return starts, ends



def _triu(m: int) -> tuple[np.ndarray, np.ndarray]:
    got = _TRIU_CACHE.get(m)
    if got is None:
        got = np.triu_indices(m, k=1)
        if m <= 256:
            _TRIU_CACHE[m] = got
    return got


def _grid_pairs(boxes: np.ndarray, cell: int, other_points: np.ndarray | None = None):
    """Candidate index pairs whose (expanded) bboxes share a grid bucket.

    With other_points given, returns (point_idx, box_idx) candidates instead
    of (box_idx, box_idx) pairs.  Fully vectorized (no per-box Python work).
    """
    cx0 = boxes[:, 0] // cell
    cy0 = boxes[:, 1] // cell
    cx1 = boxes[:, 2] // cell
    cy1 = boxes[:, 3] // cell
    nx = cx1 - cx0 + 1
    counts = nx * (cy1 - cy0 + 1)
    total = int(counts.sum())
    idx = np.repeat(np.arange(len(boxes)), counts)
    # local cell index within each box, vectorized
    k = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)
    nx_r = np.repeat(nx, counts)
    keys = (np.repeat(cx0, counts) + k % nx_r) * np.int64(1 << 31) + (
        np.repeat(cy0, counts) + k // nx_r
    )
    if other_points is None:
        order = np.argsort(keys, kind="stable")
        keys, idx = keys[order], idx[order]
        neq = np.empty(len(keys), dtype=bool)
        neq[0] = True
        np.not_equal(keys[1:], keys[:-1], out=neq[1:])
        starts = np.flatnonzero(neq)
        ends = np.concatenate([starts[1:], [len(keys)]])
        sizes = ends - starts
        ai, bi = [], []
        for s, e in zip(starts[sizes > 1], ends[sizes > 1]):
            grp = idx[s:e]
            ii, jj = _triu(e - s)
            ai.append(grp[ii])
            bi.append(grp[jj])
        if not ai:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(ai), np.concatenate(bi)
    # point-vs-box candidates
    pk = (other_points[:, 0] // cell) * np.int64(1 << 31) + other_points[:, 1] // cell
    order = np.argsort(keys, kind="stable")
    keys_s, idx_s = keys[order], idx[order]
    left = np.searchsorted(keys_s, pk, side="left")
    right = np.searchsorted(keys_s, pk, side="right")
    cnt = right - left
    total_p = int(cnt.sum())
    if total_p == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pi = np.repeat(np.arange(len(pk)), cnt)
    pos = (
        np.arange(total_p, dtype=np.int64)
        - np.repeat(np.cumsum(cnt) - cnt, cnt)
        + np.repeat(left, cnt)
    )
    return pi, idx_s[pos].astype(np.int64)


def _iround_div(num: int, den: int) -> int:
    """Exact round-half-up division (deterministic for negatives)."""
    if den < 0:
        num, den = -num, -den
    return (2 * num + den) // (2 * den)


def _proper_intersections(segs: np.ndarray, ai: np.ndarray, bi: np.ndarray):
    """Exact proper-crossing points for candidate pairs; returns per-pair
    (pair_ok mask, px, py) with px/py rounded to the grid."""
    a = segs[ai]
    b = segs[bi]
    ax1, ay1, ax2, ay2 = (a[:, k] for k in range(4))
    bx1, by1, bx2, by2 = (b[:, k] for k in range(4))
    d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)  # b1 vs a
    d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)  # b2 vs a
    d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)  # a1 vs b
    d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)  # a2 vs b
    proper = ((d1 > 0) != (d2 > 0)) & (d1 != 0) & (d2 != 0) & ((d3 > 0) != (d4 > 0)) & (d3 != 0) & (d4 != 0)
    idx = np.flatnonzero(proper)
    px = np.zeros(len(idx), dtype=np.int64)
    py = np.zeros(len(idx), dtype=np.int64)
    for k, t in enumerate(idx):
        x1, y1, x2, y2 = (int(v) for v in segs[ai[t]])
        x3, y3, x4, y4 = (int(v) for v in segs[bi[t]])
        den = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        tn = (x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)
        px[k] = _iround_div(x1 * den + tn * (x2 - x1), den)
        py[k] = _iround_div(y1 * den + tn * (y2 - y1), den)
    return idx, px, py


def _collinear_overlaps(segs: np.ndarray, ai: np.ndarray, bi: np.ndarray):
    """For collinear overlapping candidate pairs, split points = interior
    endpoints of the partner segment. Returns list of (seg_idx, x, y)."""
    a = segs[ai]
    b = segs[bi]
    ax1, ay1, ax2, ay2 = (a[:, k] for k in range(4))
    bx1, by1, bx2, by2 = (b[:, k] for k in range(4))
    d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    col = (d1 == 0) & (d2 == 0)
    out = []
    for t in np.flatnonzero(col):
        sa = segs[ai[t]]
        sb = segs[bi[t]]
        dx, dy = int(sa[2] - sa[0]), int(sa[3] - sa[1])
        # project onto a's direction (exact int dot products)
        def dot(px, py, ox, oy):
            return (int(px) - ox) * dx + (int(py) - oy) * dy
        o_x, o_y = int(sa[0]), int(sa[1])
        la = dot(sa[2], sa[3], o_x, o_y)
        for px_, py_ in ((sb[0], sb[1]), (sb[2], sb[3])):
            d = dot(px_, py_, o_x, o_y)
            if 0 < d < la:
                out.append((int(ai[t]), int(px_), int(py_)))
        dxb, dyb = int(sb[2] - sb[0]), int(sb[3] - sb[1])
        ob_x, ob_y = int(sb[0]), int(sb[1])
        lb = dxb * dxb + dyb * dyb
        for px_, py_ in ((sa[0], sa[1]), (sa[2], sa[3])):
            d = (int(px_) - ob_x) * dxb + (int(py_) - ob_y) * dyb
            if 0 < d < lb:
                out.append((int(bi[t]), int(px_), int(py_)))
    return out


def _hot_pixel_hits(segs: np.ndarray, verts: np.ndarray, cell: int):
    """(seg_idx, vx, vy) where the segment passes through the half-unit pixel
    square around a vertex that is not one of its endpoints. Exact via
    doubled coordinates."""
    if len(verts) == 0 or len(segs) == 0:
        return []
    boxes = np.empty((len(segs), 4), dtype=np.int64)
    boxes[:, 0] = np.minimum(segs[:, 0], segs[:, 2]) - 1
    boxes[:, 1] = np.minimum(segs[:, 1], segs[:, 3]) - 1
    boxes[:, 2] = np.maximum(segs[:, 0], segs[:, 2]) + 1
    boxes[:, 3] = np.maximum(segs[:, 1], segs[:, 3]) + 1
    pi, si = _grid_pairs(boxes, cell, other_points=verts)
    if len(pi) == 0:
        return []
    v = verts[pi]
    s = segs[si]
    vx, vy = v[:, 0], v[:, 1]
    not_endpoint = ~(((s[:, 0] == vx) & (s[:, 1] == vy)) | ((s[:, 2] == vx) & (s[:, 3] == vy)))
    # bbox containment (closed, expanded by half pixel -> doubled coords)
    in_box = (
        (2 * vx + 1 >= 2 * np.minimum(s[:, 0], s[:, 2]))
        & (2 * vx - 1 <= 2 * np.maximum(s[:, 0], s[:, 2]))
        & (2 * vy + 1 >= 2 * np.minimum(s[:, 1], s[:, 3]))
        & (2 * vy - 1 <= 2 * np.maximum(s[:, 1], s[:, 3]))
    )
    cand = not_endpoint & in_box
    if not cand.any():
        return []
    v, s = v[cand], s[cand]
    si = si[cand]
    ax, ay = 2 * s[:, 0], 2 * s[:, 1]
    bx, by = 2 * s[:, 2], 2 * s[:, 3]
    dx, dy = bx - ax, by - ay
    signs = []
    for ex in (-1, 1):
        for ey in (-1, 1):
            cxp = 2 * v[:, 0] + ex
            cyp = 2 * v[:, 1] + ey
            signs.append(np.sign(dx * (cyp - ay) - dy * (cxp - ax)))
    sg = np.stack(signs)
    straddles = ~(np.all(sg > 0, axis=0) | np.all(sg < 0, axis=0))
    hit = np.flatnonzero(straddles)
    return [(int(si[h]), int(v[h, 0]), int(v[h, 1])) for h in hit]


def _choose_cell(segs: np.ndarray) -> int:
    # grid cell ~ 75th-percentile segment extent; partition-based selection
    # (cell choice is perf-only: any positive cell yields identical noding,
    # so the cheaper non-interpolating quantile is fine)
    n = len(segs)
    if n == 0:
        return 1
    w = np.maximum(
        np.abs(segs[:, 2] - segs[:, 0]), np.abs(segs[:, 3] - segs[:, 1])
    )
    k = (3 * (n - 1)) // 4
    return max(1, int(np.partition(w, k)[k]))


def node_segments(
    segs: np.ndarray, labels: list[frozenset], max_iter: int = 10
) -> tuple[np.ndarray, list[frozenset]]:
    """Snap-round the labelled segment soup to a non-crossing set.

    Returns canonical segments (M,4) + merged label sets, such that any two
    output segments meet only at shared endpoints (within snap tolerance).
    """
    segs, labels = _canonicalize(segs, labels)
    for _ in range(max_iter):
        if len(segs) == 0:
            break
        cell = _choose_cell(segs)
        boxes = np.empty((len(segs), 4), dtype=np.int64)
        boxes[:, 0] = np.minimum(segs[:, 0], segs[:, 2])
        boxes[:, 1] = np.minimum(segs[:, 1], segs[:, 3])
        boxes[:, 2] = np.maximum(segs[:, 0], segs[:, 2])
        boxes[:, 3] = np.maximum(segs[:, 1], segs[:, 3])
        ai, bi = _grid_pairs(boxes, cell)
        if len(ai):
            overlap = (
                (boxes[ai, 0] <= boxes[bi, 2])
                & (boxes[bi, 0] <= boxes[ai, 2])
                & (boxes[ai, 1] <= boxes[bi, 3])
                & (boxes[bi, 1] <= boxes[ai, 3])
            )
            ai, bi = ai[overlap], bi[overlap]
            # dedup pairs (same pair can share several grid buckets)
            pk = ai.astype(np.int64) * np.int64(len(segs)) + bi
            _, uniq = np.unique(pk, return_index=True)
            ai, bi = ai[uniq], bi[uniq]
        splits: dict[int, set[tuple[int, int]]] = {}

        def add_split(i: int, x: int, y: int) -> None:
            s = segs[i]
            if (x == s[0] and y == s[1]) or (x == s[2] and y == s[3]):
                return
            splits.setdefault(i, set()).add((x, y))

        if len(ai):
            pidx, px, py = _proper_intersections(segs, ai, bi)
            for k, t in enumerate(pidx):
                add_split(int(ai[t]), int(px[k]), int(py[k]))
                add_split(int(bi[t]), int(px[k]), int(py[k]))
            for i, x, y in _collinear_overlaps(segs, ai, bi):
                add_split(i, x, y)
        verts = np.unique(
            np.concatenate([segs[:, :2], segs[:, 2:]]), axis=0
        )
        for i, x, y in _hot_pixel_hits(segs, verts, cell):
            add_split(i, x, y)
        if not splits:
            break
        new_segs, new_labels = [], []
        for i in range(len(segs)):
            if i not in splits:
                new_segs.append(segs[i])
                new_labels.append(labels[i])
                continue
            x1, y1, x2, y2 = (int(v) for v in segs[i])
            dx, dy = x2 - x1, y2 - y1
            pts = sorted(
                splits[i],
                key=lambda p: ((p[0] - x1) * dx + (p[1] - y1) * dy, p[0], p[1]),
            )
            chain = [(x1, y1)] + pts + [(x2, y2)]
            for (px_, py_), (qx_, qy_) in zip(chain[:-1], chain[1:]):
                if px_ == qx_ and py_ == qy_:
                    continue
                new_segs.append(np.array([px_, py_, qx_, qy_], dtype=np.int64))
                new_labels.append(labels[i])
        segs, labels = _canonicalize(np.asarray(new_segs), new_labels)
    return segs, labels
