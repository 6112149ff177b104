"""Exact-integer ring clipping to an axis-aligned rectangle.

Used by the Route stage to ship only the per-tile FRAGMENT of a giant
polygon instead of replicating the whole ring to every tile its bbox
touches (the reference's analogue: >10 000-point lines are diverted to a
serial path, view_get_simplified_border_lines_function_v.sql:35; clipping
is the distribution-friendly version).

Sutherland–Hodgman against each rect half-plane; crossing vertices round
with the SAME half-up integer division as the snap-round noding
(noding._iround_div), so a clipped edge crossing x=X yields the exact
vertex the overlay's noding would have produced for the unclipped ring —
neighbouring tiles compute bit-identical crossing points for their shared
border.  S-H on concave rings can emit collinear zero-width bridges along
the rect edge; those cancel exactly in the even-odd overlay.
"""

from __future__ import annotations

import numpy as np

from .noding import _iround_div


def _clip_halfplane(pts: np.ndarray, axis: int, bound: int, keep_less: bool) -> np.ndarray:
    """One S-H pass: keep points with pts[axis] <= bound (keep_less) or
    >= bound; crossings are inserted with exact-rounded coordinates."""
    n = len(pts)
    if n == 0:
        return pts
    out = []
    other = 1 - axis

    def inside(p) -> bool:
        return p[axis] <= bound if keep_less else p[axis] >= bound

    def crossing(a, b):
        # intersection of segment a-b with the line axis == bound
        da = int(b[axis]) - int(a[axis])
        num = int(a[other]) * da + (bound - int(a[axis])) * (int(b[other]) - int(a[other]))
        o = _iround_div(num, da)
        return (bound, o) if axis == 0 else (o, bound)

    for i in range(n):
        a = pts[i]
        b = pts[(i + 1) % n]
        ia, ib = inside(a), inside(b)
        if ia:
            out.append((int(a[0]), int(a[1])))
            if not ib:
                out.append(crossing(a, b))
        elif ib:
            out.append(crossing(a, b))
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    arr = np.asarray(out, dtype=np.int64)
    # drop consecutive duplicates (incl. wrap-around)
    keep = np.empty(len(arr), dtype=bool)
    keep[0] = True
    np.any(arr[1:] != arr[:-1], axis=1, out=keep[1:])
    arr = arr[keep]
    if len(arr) > 1 and (arr[0] == arr[-1]).all():
        arr = arr[:-1]
    return arr


def clip_ring_to_rect(ring: np.ndarray, x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
    """Closed ring (no repeated last vertex) -> clipped ring, possibly empty."""
    pts = np.asarray(ring, dtype=np.int64)
    for axis, bound, keep_less in ((0, x1, True), (0, x0, False), (1, y1, True), (1, y0, False)):
        pts = _clip_halfplane(pts, axis, bound, keep_less)
        if len(pts) < 3:
            return np.empty((0, 2), dtype=np.int64)
    return pts


def clip_rings_to_rect(
    rings: list[np.ndarray], x0: int, y0: int, x1: int, y1: int
) -> list[np.ndarray]:
    """Clip every ring; drops rings that vanish.  Ring roles (shell/hole)
    are preserved by orientation — the even-odd overlay does not care
    about ring order."""
    out = []
    for r in rings:
        c = clip_ring_to_rect(r, x0, y0, x1, y1)
        if len(c) >= 3:
            out.append(c)
    return out
