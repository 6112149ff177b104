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
    """Twice the signed area of an int ring (positive = CCW).  Exact: terms
    are < 2^59 (coords relative to the first vertex, span_px < 2^28), summed
    in int64 chunks of 8 (< 2^62 each) and combined as Python ints."""
    r = np.asarray(ring, dtype=np.int64)
    if len(r) < 3:
        return 0
    x = r[:, 0] - r[0, 0]
    y = r[:, 1] - r[0, 1]
    # cyclic terms with origin at r0: the closing and opening terms vanish
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    if len(cross) <= 8:
        return int(cross.sum())
    parts = np.add.reduceat(cross, np.arange(0, len(cross), 8))
    return sum(int(p) for p in parts)


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


def _spherical_area_terms(
    F: np.ndarray, offs: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Per-vertex spherical-excess terms for many lon/lat rings laid out in
    one (N,2) float array.  terms[offs[i]:offs[i]+lens[i]] holds EXACTLY the
    element values spherical_ring_area_m2 builds for ring i (wraparound term
    in the last slot), so a per-ring np.sum is bit-identical to the scalar
    kernel (same values, same pairwise summation)."""
    ll = np.radians(F)
    lon = np.ascontiguousarray(ll[:, 0])
    sinlat = np.sin(ll[:, 1])
    nxt_lon = np.empty_like(lon)
    nxt_sin = np.empty_like(sinlat)
    if len(lon):
        nxt_lon[:-1] = lon[1:]
        nxt_sin[:-1] = sinlat[1:]
        nz = lens > 0
        ends_nz = (offs + lens)[nz] - 1
        nxt_lon[ends_nz] = lon[offs[nz]]
        nxt_sin[ends_nz] = sinlat[offs[nz]]
    return (nxt_lon - lon) * (2.0 + sinlat + nxt_sin)


def geodesic_area_packed(
    F: np.ndarray, offs: np.ndarray, lens: np.ndarray, face_nr: np.ndarray
) -> np.ndarray:
    """geodesic_area for many faces over one concatenated unsnapped float
    array — bit-identical to calling the scalar path per face (trig and
    term construction batched; the per-ring pairwise np.sum and the
    s*R*R/2 accumulation order are preserved exactly)."""
    terms = _spherical_area_terms(F, offs, lens)
    out = np.empty(len(face_nr), np.float64)
    ri = 0
    for f in range(len(face_nr)):
        a = 0.0
        for _ in range(int(face_nr[f])):
            n = int(lens[ri])
            if n >= 3:
                s = terms[offs[ri] : offs[ri] + n].sum()
                a += s * _EARTH_R * _EARTH_R / 2.0
            ri += 1
        out[f] = abs(a)
    return out


def area_faces(
    faces_rings: list[list[np.ndarray]],
    utm: bool,
    origin_x: float,
    origin_y: float,
    precision: float,
) -> np.ndarray:
    """planar/geodesic area for many faces given as ring lists —
    bit-identical to calling the scalar kernels per face (same packed
    layout the finalize stage uses)."""
    rings = [np.asarray(r, np.int64) for fr in faces_rings for r in fr]
    lens = np.asarray([len(r) for r in rings], np.int64)
    offs = (
        np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        if len(lens)
        else np.empty(0, np.int64)
    )
    coords = np.concatenate(rings) if rings else np.empty((0, 2), np.int64)
    face_nr = np.asarray([len(fr) for fr in faces_rings], np.int64)
    if utm:
        return planar_area_packed(coords, offs, lens, face_nr, precision)
    F = unsnap(coords, origin_x, origin_y, precision)
    return geodesic_area_packed(F, offs, lens, face_nr)


def _signed_area2_from_concat(
    coords: np.ndarray, offs: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """ring_signed_area2_batch over an already-concatenated layout.
    Robust to zero-length rings anywhere in the batch (their offset can
    equal len(coords); they sum to 0 via the lens<3 mask)."""
    if not len(lens):
        return np.empty(0, np.int64)
    if not len(coords):
        return np.zeros(len(lens), np.int64)
    o = np.minimum(offs, len(coords) - 1)  # safe index for empty rings
    x = coords[:, 0] - np.repeat(coords[o, 0], lens)
    y = coords[:, 1] - np.repeat(coords[o, 1], lens)
    terms = np.zeros(len(x), np.int64)
    if len(x) > 1:
        terms[:-1] = x[:-1] * y[1:] - x[1:] * y[:-1]
    nz = lens > 0
    terms[(offs + lens)[nz] - 1] = 0
    sums = np.add.reduceat(terms, o)
    sums[lens < 3] = 0
    mags = np.maximum.reduceat(np.abs(terms), o)
    for t in np.flatnonzero(mags * np.maximum(lens, 1) >= (1 << 62)):
        sums[t] = ring_signed_area2(coords[offs[t] : offs[t] + lens[t]])
    return sums


def planar_area_packed(
    coords: np.ndarray,
    offs: np.ndarray,
    lens: np.ndarray,
    face_nr: np.ndarray,
    precision: float,
) -> np.ndarray:
    """planar_area for many faces over one concatenated int coord array.
    Per-ring signed areas are exact integers, so only the final float
    conversion order matters — kept as abs(a2)/2.0*p*p like the scalar."""
    a2 = _signed_area2_from_concat(coords, offs, lens)
    out = np.empty(len(face_nr), np.float64)
    ri = 0
    for f in range(len(face_nr)):
        nr = int(face_nr[f])
        tot = sum(int(v) for v in a2[ri : ri + nr])
        ri += nr
        out[f] = abs(tot) / 2.0 * precision * precision
    return out


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


_SIMPLE_PAIRS: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _nonadjacent_pairs(k: int) -> tuple[np.ndarray, np.ndarray]:
    got = _SIMPLE_PAIRS.get(k)
    if got is None:
        ii, jj = np.triu_indices(k, k=1)
        adjacent = (jj - ii == 1) | ((ii == 0) & (jj == k - 1))
        got = (ii[~adjacent], jj[~adjacent])
        if k <= 4096:
            _SIMPLE_PAIRS[k] = got
    return got


def ring_is_simple(ring: np.ndarray) -> bool:
    """True if no two non-adjacent ring segments intersect (exact, O(k^2)).

    The engine's input-validity check — the reference flags outputs touching
    invalid inputs via ST_IsValid (function_resolve_overlap_gap_post.sql:48-59).
    The pair-index tables are cached per ring size: this runs once per input
    polygon on the hot unwrap path.
    """
    r = np.asarray(ring, dtype=np.int64)
    k = len(r)
    if k < 3:
        return False
    ii, jj = _nonadjacent_pairs(k)
    if len(ii) == 0:
        return True
    ax, ay = r[:, 0], r[:, 1]
    bx = np.concatenate([ax[1:], ax[:1]])
    by = np.concatenate([ay[1:], ay[:1]])
    p1x, p1y, p2x, p2y = ax[ii], ay[ii], bx[ii], by[ii]
    q1x, q1y, q2x, q2y = ax[jj], ay[jj], bx[jj], by[jj]
    # bbox prefilter: disjoint bboxes cannot intersect
    cand = (
        (np.minimum(p1x, p2x) <= np.maximum(q1x, q2x))
        & (np.minimum(q1x, q2x) <= np.maximum(p1x, p2x))
        & (np.minimum(p1y, p2y) <= np.maximum(q1y, q2y))
        & (np.minimum(q1y, q2y) <= np.maximum(p1y, p2y))
    )
    if not cand.any():
        return True
    p1x, p1y, p2x, p2y = p1x[cand], p1y[cand], p2x[cand], p2y[cand]
    q1x, q1y, q2x, q2y = q1x[cand], q1y[cand], q2x[cand], q2y[cand]
    dpx, dpy = p2x - p1x, p2y - p1y
    dqx, dqy = q2x - q1x, q2y - q1y
    d1 = dpx * (q1y - p1y) - dpy * (q1x - p1x)
    d2 = dpx * (q2y - p1y) - dpy * (q2x - p1x)
    d3 = dqx * (p1y - q1y) - dqy * (p1x - q1x)
    d4 = dqx * (p2y - q1y) - dqy * (p2x - q1x)
    if (((d1 > 0) != (d2 > 0)) & (d1 != 0) & (d2 != 0)
            & ((d3 > 0) != (d4 > 0)) & (d3 != 0) & (d4 != 0)).any():
        return False
    # endpoint-touch / collinear-overlap: an endpoint of one segment lying ON
    # the other (bbox already guaranteed by `cand` for the pair, re-checked
    # per point below)
    def on_seg(ox, oy, px, py, dx_, dy_, qx, qy):
        col = dx_ * (qy - oy) - dy_ * (qx - ox) == 0
        inx = (np.minimum(ox, px) <= qx) & (qx <= np.maximum(ox, px))
        iny = (np.minimum(oy, py) <= qy) & (qy <= np.maximum(oy, py))
        return col & inx & iny

    touch = (
        on_seg(p1x, p1y, p2x, p2y, dpx, dpy, q1x, q1y)
        | on_seg(p1x, p1y, p2x, p2y, dpx, dpy, q2x, q2y)
        | on_seg(q1x, q1y, q2x, q2y, dqx, dqy, p1x, p1y)
        | on_seg(q1x, q1y, q2x, q2y, dqx, dqy, p2x, p2y)
    )
    return not touch.any()


def _concat_rings(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(coords concat int64, ring start offsets, ring lengths)."""
    lens = np.array([len(r) for r in rings], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    coords = (
        np.concatenate(rings).astype(np.int64)
        if rings
        else np.empty((0, 2), np.int64)
    )
    return coords, offs, lens


def ring_signed_area2_batch(rings: list[np.ndarray]) -> np.ndarray:
    """Vectorized ring_signed_area2 over many rings at once.

    Same exactness contract: per-ring terms are computed relative to the
    ring's first vertex; a ring whose |terms| could overflow the int64
    accumulation bound falls back to the scalar chunked routine (never in
    practice — it needs ~2^59-scale terms).  One numpy pass otherwise.
    """
    if not rings:
        return np.empty(0, np.int64)
    coords, offs, lens = _concat_rings(rings)
    # delegate to the concat-layout routine: it clamps offsets and masks
    # by lens, so zero-length rings anywhere in the batch are safe (a
    # trailing empty ring would otherwise index coords[len(coords)], and
    # an interior one would zero a term inside the PREVIOUS ring)
    return _signed_area2_from_concat(coords, offs, lens)


def rings_are_simple_batch(rings: list[np.ndarray]) -> np.ndarray:
    """Vectorized ring_is_simple over many rings: ONE pass over the
    concatenated non-adjacent segment pairs of the whole batch (identical
    predicate — proper crossing, endpoint touch, collinear overlap)."""
    n = len(rings)
    res = np.ones(n, dtype=bool)
    if n == 0:
        return res
    coords, offs, lens = _concat_rings(rings)
    res[lens < 3] = False
    ii_parts, jj_parts, rid_parts = [], [], []
    for t in range(n):
        k = int(lens[t])
        if k < 3:
            continue
        ii, jj = _nonadjacent_pairs(k)
        if len(ii):
            ii_parts.append(ii + offs[t])
            jj_parts.append(jj + offs[t])
            rid_parts.append(np.full(len(ii), t, np.int64))
    if not ii_parts:
        return res
    ii = np.concatenate(ii_parts)
    jj = np.concatenate(jj_parts)
    rid = np.concatenate(rid_parts)
    ax, ay = coords[:, 0], coords[:, 1]
    # next vertex within the ring (cyclic); mask zero-length rings — their
    # offs+lens-1 would write into the PREVIOUS ring's wrap slot
    nxt = np.arange(len(coords), dtype=np.int64) + 1
    nz = lens > 0
    nxt[(offs + lens)[nz] - 1] = offs[nz]
    bx, by = ax[nxt], ay[nxt]
    p1x, p1y, p2x, p2y = ax[ii], ay[ii], bx[ii], by[ii]
    q1x, q1y, q2x, q2y = ax[jj], ay[jj], bx[jj], by[jj]
    cand = (
        (np.minimum(p1x, p2x) <= np.maximum(q1x, q2x))
        & (np.minimum(q1x, q2x) <= np.maximum(p1x, p2x))
        & (np.minimum(p1y, p2y) <= np.maximum(q1y, q2y))
        & (np.minimum(q1y, q2y) <= np.maximum(p1y, p2y))
    )
    if not cand.any():
        return res
    rid = rid[cand]
    p1x, p1y, p2x, p2y = p1x[cand], p1y[cand], p2x[cand], p2y[cand]
    q1x, q1y, q2x, q2y = q1x[cand], q1y[cand], q2x[cand], q2y[cand]
    dpx, dpy = p2x - p1x, p2y - p1y
    dqx, dqy = q2x - q1x, q2y - q1y
    d1 = dpx * (q1y - p1y) - dpy * (q1x - p1x)
    d2 = dpx * (q2y - p1y) - dpy * (q2x - p1x)
    d3 = dqx * (p1y - q1y) - dqy * (p1x - q1x)
    d4 = dqx * (p2y - q1y) - dqy * (p2x - q1x)
    proper = (
        ((d1 > 0) != (d2 > 0)) & (d1 != 0) & (d2 != 0)
        & ((d3 > 0) != (d4 > 0)) & (d3 != 0) & (d4 != 0)
    )

    def on_seg_v(ox, oy, px, py, dx_, dy_, qx, qy):
        col = dx_ * (qy - oy) - dy_ * (qx - ox) == 0
        inx = (np.minimum(ox, px) <= qx) & (qx <= np.maximum(ox, px))
        iny = (np.minimum(oy, py) <= qy) & (qy <= np.maximum(oy, py))
        return col & inx & iny

    touch = (
        on_seg_v(p1x, p1y, p2x, p2y, dpx, dpy, q1x, q1y)
        | on_seg_v(p1x, p1y, p2x, p2y, dpx, dpy, q2x, q2y)
        | on_seg_v(q1x, q1y, q2x, q2y, dqx, dqy, p1x, p1y)
        | on_seg_v(q1x, q1y, q2x, q2y, dqx, dqy, p2x, p2y)
    )
    bad = rid[proper | touch]
    if len(bad):
        res[np.unique(bad)] = False
    return res


def bbox_of_rings_batch(rings: list[np.ndarray]) -> np.ndarray:
    """(n, 4) int64 [minx, miny, maxx, maxy] per ring in one pass."""
    if not rings:
        return np.empty((0, 4), np.int64)
    coords, offs, _ = _concat_rings(rings)
    return np.stack(
        [
            np.minimum.reduceat(coords[:, 0], offs),
            np.minimum.reduceat(coords[:, 1], offs),
            np.maximum.reduceat(coords[:, 0], offs),
            np.maximum.reduceat(coords[:, 1], offs),
        ],
        axis=1,
    )
