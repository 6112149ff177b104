"""Line smoothing / simplification kernels (reference S1/S2).

- douglas_peucker: the kernel behind the reference's
  ST_SimplifyPreserveTopology use (cell.sql:232-241, 676-714).  Topology
  preservation is approximated the way the reference's retry ladder does:
  if the simplified ring stops being simple, back off the tolerance
  (<=5 retries at tol/heal_edge_retry_num, cell.sql:695-703).
- chaikins_acute_angle: numpy port of
  topo_update.chaikinsAcuteAngle (function_02_chaikinsAcuteAngle.sql:9-218):
  Chaikin corner-cutting applied ONLY at sharp vertices — vertex angle
  (from segment azimuths) <= min_degrees or >= max_degrees with both
  adjacent segments shorter than max_length, or beyond the steep-angle
  thresholds regardless of length; each selected corner is replaced by
  points at 0.25 / 0.75 along the adjacent segments; n iterations.
  Endpoints are never moved.  (NB the reference constructor has a
  field-order quirk at types_resolve_overlap.sql:95; we implement the
  intended semantics.)
"""

from __future__ import annotations

import numpy as np


def _perp_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ab = b - a
    ln = np.hypot(*ab)
    if ln == 0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    return np.abs((pts[:, 0] - a[0]) * ab[1] - (pts[:, 1] - a[1]) * ab[0]) / ln


def douglas_peucker(line: np.ndarray, tol: float) -> np.ndarray:
    """Classic DP on an open polyline (float or int coords)."""
    line = np.asarray(line, dtype=np.float64)
    n = len(line)
    if n < 3 or tol <= 0:
        return line
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        d = _perp_dist(line[i + 1 : j], line[i], line[j])
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return line[keep]


def simplify_ring(ring: np.ndarray, tol: float, retries: int = 5) -> np.ndarray:
    """DP on a closed ring with the reference's tolerance back-off when the
    result would not be a simple ring (cell.sql:695-703)."""
    from .core import ring_is_simple

    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 5 or tol <= 0:
        return ring
    closed = np.vstack([ring, ring[:1]])
    for r in range(1, retries + 1):
        t = tol / r
        out = douglas_peucker(closed, t)[:-1]
        if len(out) >= 3 and ring_is_simple(np.round(out * 1e9).astype(np.int64)):
            return out
    return ring


def chaikins_acute_angle(
    line: np.ndarray,
    n_iterations: int = 1,
    min_degrees: float = 30.0,
    max_degrees: float = 330.0,
    max_length: float = np.inf,
    min_steep_angle_degrees: float = 1.0,
    max_steep_angle_degrees: float = 359.0,
    closed: bool = False,
) -> np.ndarray:
    """Selective Chaikin corner cutting (see module docstring)."""
    pts = np.asarray(line, dtype=np.float64)
    for _ in range(max(0, n_iterations)):
        n = len(pts)
        if n < 3:
            break
        if closed:
            prev = np.roll(pts, 1, axis=0)
            nxt = np.roll(pts, -1, axis=0)
            idx = np.arange(n)
        else:
            prev = pts[:-2]
            nxt = pts[2:]
            idx = np.arange(1, n - 1)
        cur = pts[idx]
        v1 = prev[: len(cur)] - cur if closed else prev - cur
        v2 = nxt[: len(cur)] - cur if closed else nxt - cur
        a1 = np.degrees(np.arctan2(v1[:, 0], v1[:, 1])) % 360.0  # azimuth-like
        a2 = np.degrees(np.arctan2(v2[:, 0], v2[:, 1])) % 360.0
        ang = (a2 - a1) % 360.0
        l1 = np.hypot(v1[:, 0], v1[:, 1])
        l2 = np.hypot(v2[:, 0], v2[:, 1])
        sharp = ((ang <= min_degrees) | (ang >= max_degrees)) & (
            (l1 < max_length) & (l2 < max_length)
        )
        steep = (ang <= min_steep_angle_degrees) | (ang >= max_steep_angle_degrees)
        sel = sharp | steep
        if not sel.any():
            break
        out = []
        first = 0 if closed else 1
        if not closed:
            out.append(pts[0])
        for k, i in enumerate(idx):
            if sel[k]:
                p = prev[k] if closed else pts[i - 1]
                q = nxt[k] if closed else pts[i + 1]
                out.append(pts[i] + 0.25 * (p - pts[i]))
                out.append(pts[i] + 0.25 * (q - pts[i]))
            else:
                out.append(pts[i])
        if not closed:
            out.append(pts[-1])
        pts = np.asarray(out)
    return pts
