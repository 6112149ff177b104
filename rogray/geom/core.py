"""Integer snap-grid geometry core: exact predicates, snapping, areas.

Everything topology-critical runs on int64 coordinates on a global snap
grid (pixel = snap tolerance), mirroring the role of the reference's
topology snap tolerance (function_resolve_overlap_gap_init.sql:48).  With
coordinates bounded by span_px < 2**28, every predicate below fits in
int64 without overflow (doubled-coordinate cross products < 2**58).
"""

from __future__ import annotations

import numpy as np

MAX_SPAN_PX = 1 << 28


def snap(xy: np.ndarray, origin_x: float, origin_y: float, precision: float) -> np.ndarray:
    """Float coords -> int64 grid coords (round-half-away-from-zero).

    Deterministic and global: the same float coordinate snaps identically in
    every tile, which is what makes shared tile borders bit-identical.
    """
    xy = np.asarray(xy, dtype=np.float64)
    g = np.empty(xy.shape, dtype=np.int64)
    g[..., 0] = np.floor((xy[..., 0] - origin_x) / precision + 0.5).astype(np.int64)
    g[..., 1] = np.floor((xy[..., 1] - origin_y) / precision + 0.5).astype(np.int64)
    return g


def unsnap(g: np.ndarray, origin_x: float, origin_y: float, precision: float) -> np.ndarray:
    g = np.asarray(g)
    out = np.empty(g.shape, dtype=np.float64)
    out[..., 0] = g[..., 0] * precision + origin_x
    out[..., 1] = g[..., 1] * precision + origin_y
    return out


def cross(ox, oy, ax, ay, bx, by):
    """Vectorized exact cross product (o->a) x (o->b) in int64.

    Safe for |coords| < 2**31 (diffs < 2**31, products < 2**62).
    """
    ax = np.asarray(ax, dtype=np.int64)
    ay = np.asarray(ay, dtype=np.int64)
    bx = np.asarray(bx, dtype=np.int64)
    by = np.asarray(by, dtype=np.int64)
    ox = np.asarray(ox, dtype=np.int64)
    oy = np.asarray(oy, dtype=np.int64)
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def cross_sign(ox, oy, ax, ay, bx, by):
    """Vectorized orientation sign of (o->a) x (o->b): +1 ccw, -1 cw, 0 collinear."""
    return np.sign(cross(ox, oy, ax, ay, bx, by))


def ring_signed_area2(ring: np.ndarray) -> int:
    """Twice the signed area of an int ring (positive = CCW). Exact (Python int)."""
    r = np.asarray(ring, dtype=np.int64)
    if len(r) < 3:
        return 0
    x = r[:, 0] - r[0, 0]
    y = r[:, 1] - r[0, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return int(np.sum(x * y2 - x2 * y, dtype=object))


def ring_area_px(ring: np.ndarray) -> float:
    return abs(ring_signed_area2(ring)) / 2.0


def seg_lengths(segs: np.ndarray) -> np.ndarray:
    """Euclidean lengths (float) of int segments (N,4)."""
    dx = (segs[:, 2] - segs[:, 0]).astype(np.float64)
    dy = (segs[:, 3] - segs[:, 1]).astype(np.float64)
    return np.hypot(dx, dy)


def planar_area(rings_px: list[np.ndarray], precision: float) -> float:
    """Polygon area (shell + holes by ring orientation) in CRS units^2."""
    a2 = sum(ring_signed_area2(r) for r in rings_px)
    return abs(a2) / 2.0 * precision * precision


_EARTH_R = 6371008.8  # mean Earth radius (m), public constant


def spherical_ring_area_m2(lonlat: np.ndarray) -> float:
    """Signed spherical polygon area in m^2 for a lon/lat-degree ring.

    Standard spherical excess line integral (the algorithm behind
    geojson-area; public knowledge).  The reference uses geodesic area via
    PostGIS geography (function_01_get_face_area.sql:24-28); spherical is
    within ~0.3% of geodesic, which is fine for min_area thresholds.
    """
    ll = np.radians(np.asarray(lonlat, dtype=np.float64))
    if len(ll) < 3:
        return 0.0
    lon, lat = ll[:, 0], ll[:, 1]
    lon2, lat2 = np.roll(lon, -1), np.roll(lat, -1)
    s = np.sum((lon2 - lon) * (2.0 + np.sin(lat) + np.sin(lat2)))
    return s * _EARTH_R * _EARTH_R / 2.0


def geodesic_area(rings_px: list[np.ndarray], origin_x: float, origin_y: float, precision: float) -> float:
    a = 0.0
    for r in rings_px:
        a += spherical_ring_area_m2(unsnap(np.asarray(r), origin_x, origin_y, precision))
    return abs(a)


def bbox_of_rings(rings: list[np.ndarray]) -> tuple[int, int, int, int]:
    mnx = min(int(r[:, 0].min()) for r in rings)
    mny = min(int(r[:, 1].min()) for r in rings)
    mxx = max(int(r[:, 0].max()) for r in rings)
    mxy = max(int(r[:, 1].max()) for r in rings)
    return mnx, mny, mxx, mxy


def point_in_ring_crossings(qx: int, qy: int, ring: np.ndarray) -> int:
    """Exact upward-ray crossing count for one int point vs one int ring.

    Half-open rule on x (a.x <= q.x < b.x or b.x <= q.x < a.x) avoids all
    vertex degeneracies; points ON the boundary are not supported (caller
    must guarantee disjointness).
    """
    r = np.asarray(ring, dtype=np.int64)
    ax, ay = r[:, 0], r[:, 1]
    bx, by = np.roll(ax, -1), np.roll(ay, -1)
    straddle = ((ax <= qx) & (qx < bx)) | ((bx <= qx) & (qx < ax))
    if not straddle.any():
        return 0
    ax, ay, bx, by = ax[straddle], ay[straddle], bx[straddle], by[straddle]
    # segment is above q at x=qx:  ay + (qx-ax)*(by-ay)/(bx-ax) > qy, exact:
    num = (qx - ax) * (by - ay) + (ay - qy) * (bx - ax)
    above = np.where(bx > ax, num > 0, num < 0)
    return int(np.count_nonzero(above))


def point_in_polygon(qx: int, qy: int, rings: list[np.ndarray]) -> bool:
    c = 0
    for r in rings:
        c += point_in_ring_crossings(qx, qy, r)
    return bool(c & 1)


def ring_is_simple(ring: np.ndarray) -> bool:
    """True if no two non-adjacent ring segments intersect (exact, O(k^2)).

    The engine's input-validity check — the reference flags outputs touching
    invalid inputs via ST_IsValid (function_resolve_overlap_gap_post.sql:48-59).
    """
    r = np.asarray(ring, dtype=np.int64)
    k = len(r)
    if k < 3:
        return False
    a = r
    b = np.roll(r, -1, axis=0)
    ii, jj = np.triu_indices(k, k=1)
    adjacent = (jj - ii == 1) | ((ii == 0) & (jj == k - 1))
    ii, jj = ii[~adjacent], jj[~adjacent]
    if len(ii) == 0:
        return True
    p1, p2 = a[ii], b[ii]
    q1, q2 = a[jj], b[jj]

    def orient(o, p, q):
        return np.sign(
            (p[:, 0] - o[:, 0]) * (q[:, 1] - o[:, 1])
            - (p[:, 1] - o[:, 1]) * (q[:, 0] - o[:, 0])
        )

    d1 = orient(p1, p2, q1)
    d2 = orient(p1, p2, q2)
    d3 = orient(q1, q2, p1)
    d4 = orient(q1, q2, p2)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper.any():
        return False

    def on_seg(o, p, q):
        # q collinear with o-p and within bbox
        col = (
            (p[:, 0] - o[:, 0]) * (q[:, 1] - o[:, 1])
            - (p[:, 1] - o[:, 1]) * (q[:, 0] - o[:, 0])
        ) == 0
        inx = (np.minimum(o[:, 0], p[:, 0]) <= q[:, 0]) & (q[:, 0] <= np.maximum(o[:, 0], p[:, 0]))
        iny = (np.minimum(o[:, 1], p[:, 1]) <= q[:, 1]) & (q[:, 1] <= np.maximum(o[:, 1], p[:, 1]))
        return col & inx & iny

    touch = (
        on_seg(p1, p2, q1)
        | on_seg(p1, p2, q2)
        | on_seg(q1, q2, p1)
        | on_seg(q1, q2, p2)
    )
    return not touch.any()
