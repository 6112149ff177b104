"""Property-based tests (hypothesis) for the geometry kernel invariants.

These are the engine's ValidateTopology analogue at the unit level:
whatever segments go in, the noded output must be planar (no two output
segments properly cross) and the tile overlay must exactly partition the
tile (face areas sum to the tile area, coverage consistent).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from rogray.geom import arrangement, core, noding


coord = st.integers(min_value=0, max_value=60)


@st.composite
def segment_soup(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    segs = []
    for _ in range(n):
        x1, y1, x2, y2 = (draw(coord) for _ in range(4))
        segs.append((x1, y1, x2, y2))
    return np.asarray(segs, dtype=np.int64)


def _properly_cross(a, b):
    d1 = core.cross(a[0], a[1], a[2], a[3], b[0], b[1])
    d2 = core.cross(a[0], a[1], a[2], a[3], b[2], b[3])
    d3 = core.cross(b[0], b[1], b[2], b[3], a[0], a[1])
    d4 = core.cross(b[0], b[1], b[2], b[3], a[2], a[3])
    return (d1 * d2 < 0) and (d3 * d4 < 0)


@given(segment_soup())
@settings(max_examples=120, deadline=None)
def test_noding_output_planar(segs):
    labels = [frozenset([(i, 1)]) for i in range(len(segs))]
    out, out_labels = noding.node_segments(segs, labels)
    assert len(out) == len(out_labels)
    for i in range(len(out)):
        for j in range(i + 1, len(out)):
            assert not _properly_cross(out[i], out[j]), (out[i], out[j])
    # canonical + unique
    keys = {tuple(s) for s in out.tolist()}
    assert len(keys) == len(out)


@st.composite
def convex_polys(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    polys = []
    for pid in range(n):
        cx = draw(st.integers(min_value=15, max_value=85))
        cy = draw(st.integers(min_value=15, max_value=85))
        r = draw(st.integers(min_value=4, max_value=14))
        k = draw(st.integers(min_value=3, max_value=7))
        ang = np.sort(draw(st.lists(st.floats(0, 2 * np.pi - 0.01), min_size=k, max_size=k, unique=True)))
        if len(ang) < 3:
            continue
        ring = np.stack(
            [cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1
        ).astype(np.int64)
        polys.append((pid, arrangement.normalize_rings([ring])))
    return polys


@given(convex_polys())
@settings(max_examples=60, deadline=None)
def test_overlay_partitions_tile(polys):
    polys = [
        (pid, rings)
        for pid, rings in polys
        if rings and core.ring_signed_area2(rings[0]) != 0
    ]
    faces = arrangement.overlay_tile(polys, (0, 0, 128, 128))
    total = sum(f.area2 for f in faces)
    assert total == 2 * 128 * 128  # faces exactly partition the tile
    # every covered face's cov refers to real polygon ids
    pids = {pid for pid, _ in polys}
    for f in faces:
        for _, cov in f.ledger:
            assert cov <= pids
