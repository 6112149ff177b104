"""Unit tests for the exact geometry kernel (no Ray needed).

The reference has no unit tests (SURVEY.md section 5); these cover the
kernel pieces its PL/pgSQL gets from PostGIS: WKB, noding, polygonize,
coverage, small-face dissolve.
"""

import numpy as np
import pytest

from rogray.geom import arrangement, core, noding, polygonize, wkb


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.int64)


class TestWkb:
    def test_polygon_roundtrip(self):
        ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        b = wkb.encode_polygon([ring])
        gtype, parts = wkb.decode(b)
        assert gtype == wkb.POLYGON
        np.testing.assert_allclose(parts[0][0], ring)

    def test_polygon_with_hole(self):
        shell = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        hole = np.array([[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0]])
        b = wkb.encode_polygon([shell, hole])
        rings = wkb.decode_polygon_rings(b)
        assert len(rings) == 2

    def test_multipolygon(self):
        r1 = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        r2 = np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0]])
        b = wkb.encode_multipolygon([[r1], [r2]])
        gtype, parts = wkb.decode(b)
        assert gtype == wkb.MULTIPOLYGON and len(parts) == 2

    def test_point_linestring(self):
        assert wkb.decode(wkb.encode_point(3.5, -2.0))[0] == wkb.POINT
        ls = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 1.0]])
        gtype, parts = wkb.decode(wkb.encode_linestring(ls))
        assert gtype == wkb.LINESTRING
        np.testing.assert_allclose(parts[0][0], ls)


class TestCore:
    def test_snap_roundtrip(self):
        xy = np.array([[1.23456, 7.89012], [-3.14159, 2.71828]])
        g = core.snap(xy, 0.0, 0.0, 0.001)
        back = core.unsnap(g, 0.0, 0.0, 0.001)
        assert np.abs(back - xy).max() <= 0.0005 + 1e-12

    def test_snap_deterministic_half(self):
        # exactly-half values must round identically everywhere
        g1 = core.snap(np.array([[0.0015, 0.0025]]), 0.0, 0.0, 0.001)
        assert g1.tolist() == [[2, 3]]  # round-half-up

    def test_ring_area(self):
        assert core.ring_signed_area2(sq(0, 0, 10, 10)) == 200
        assert core.ring_signed_area2(sq(0, 0, 10, 10)[::-1]) == -200

    def test_point_in_polygon(self):
        rings = [sq(0, 0, 10, 10)]
        assert core.point_in_polygon(5, 5, rings)
        assert not core.point_in_polygon(15, 5, rings)
        # with hole
        rings = [sq(0, 0, 10, 10), sq(4, 4, 6, 6)[::-1]]
        assert not core.point_in_polygon(5, 5, rings)
        assert core.point_in_polygon(2, 2, rings)

    def test_spherical_area_square_degree(self):
        # 1x1 degree at equator ~ 12364 km^2
        ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
        a = abs(core.spherical_ring_area_m2(ring))
        assert 1.22e10 < a < 1.25e10


def lab(pid, side=1):
    return frozenset([(pid, side)])


class TestNoding:
    def test_cross_split(self):
        segs = np.array([[0, 0, 10, 10], [0, 10, 10, 0]], dtype=np.int64)
        out, labels = noding.node_segments(segs, [lab(1), lab(2)])
        assert len(out) == 4  # both split at (5,5)
        pts = set(map(tuple, np.concatenate([out[:, :2], out[:, 2:]])))
        assert (5, 5) in pts

    def test_duplicate_merge(self):
        segs = np.array([[0, 0, 10, 0], [10, 0, 0, 0]], dtype=np.int64)
        out, labels = noding.node_segments(segs, [lab(1, 1), lab(2, 1)])
        assert len(out) == 1
        # second was reversed: its interior-left becomes interior-right
        assert labels[0] == frozenset([(1, 1), (2, -1)])

    def test_endpoint_on_interior(self):
        segs = np.array([[0, 0, 10, 0], [5, 0, 5, 8]], dtype=np.int64)
        out, _ = noding.node_segments(segs, [lab(1), lab(2)])
        assert len(out) == 3  # horizontal split at (5,0)

    def test_hot_pixel_snap(self):
        # vertex (5,1) is within half-pixel of segment y=x/10 at x=5 (y=0.5)
        segs = np.array([[0, 0, 10, 1], [5, 1, 5, 9]], dtype=np.int64)
        out, _ = noding.node_segments(segs, [lab(1), lab(2)])
        pts = set(map(tuple, np.concatenate([out[:, :2], out[:, 2:]])))
        assert (5, 1) in pts
        # the long segment must have been bent through (5,1)
        assert len(out) >= 3

    def test_collinear_overlap(self):
        segs = np.array([[0, 0, 10, 0], [4, 0, 14, 0]], dtype=np.int64)
        out, labels = noding.node_segments(segs, [lab(1), lab(2)])
        outs = set(map(tuple, out))
        assert (4, 0, 10, 0) in outs  # shared middle piece
        mid = [l for s, l in zip(map(tuple, out), labels) if s == (4, 0, 10, 0)]
        assert mid[0] == frozenset([(1, 1), (2, 1)])
        assert len(out) == 3

    def test_no_false_splits(self):
        segs = np.array([[0, 0, 10, 0], [0, 5, 10, 5]], dtype=np.int64)
        out, _ = noding.node_segments(segs, [lab(1), lab(2)])
        assert len(out) == 2


class TestPolygonize:
    def _arr(self, ring_lists):
        parts = [arrangement.rings_to_segments(arrangement.normalize_rings(r), i) for i, r in enumerate(ring_lists)]
        segs = np.concatenate([s for s, _ in parts])
        labels = [l for _, ls in parts for l in ls]
        segs, labels = noding.node_segments(segs, labels)
        return polygonize.polygonize(segs, labels)

    def test_single_square(self):
        arr = self._arr([[sq(0, 0, 10, 10)]])
        assert len(arr.faces) == 1
        f = arr.faces[0]
        assert f.area2 == 200
        assert f.cov == frozenset([0])

    def test_two_overlapping_squares(self):
        arr = self._arr([[sq(0, 0, 10, 10)], [sq(5, 5, 15, 15)]])
        covs = sorted(tuple(sorted(f.cov)) for f in arr.faces)
        assert covs == [(0,), (0, 1), (1,)]
        both = [f for f in arr.faces if f.cov == frozenset([0, 1])][0]
        assert both.area2 == 50  # 5x5 overlap

    def test_disjoint_islands(self):
        arr = self._arr([[sq(0, 0, 10, 10)], [sq(20, 0, 30, 10)]])
        assert len(arr.faces) == 2
        assert all(len(f.cov) == 1 for f in arr.faces)

    def test_nested_island(self):
        # small square floating inside big one (disconnected components)
        arr = self._arr([[sq(0, 0, 20, 20)], [sq(5, 5, 10, 10)]])
        covs = sorted((tuple(sorted(f.cov)), f.area2) for f in arr.faces)
        # big face minus island region + island face covered by both
        assert ((0, 1), 50) in covs
        assert ((0,), 800 - 50) in covs

    def test_polygon_with_hole_and_island(self):
        shell = [sq(0, 0, 20, 20), sq(5, 5, 10, 10)[::-1]]  # hole
        island = [sq(6, 6, 9, 9)]
        arr = self._arr([shell, island])
        covs = sorted((tuple(sorted(f.cov)), f.area2) for f in arr.faces)
        # donut face cov={0}, island face cov={1}, and the gap ring between
        # hole boundary and island is a face with cov={} (area 25-9=16 -> 32)
        assert ((0,), 2 * (400 - 25)) in covs
        assert ((1,), 18) in covs
        assert (tuple(), 2 * (25 - 9)) in covs

    def test_touching_squares_share_edge(self):
        arr = self._arr([[sq(0, 0, 10, 10)], [sq(10, 0, 20, 10)]])
        assert len(arr.faces) == 2
        assert sorted(tuple(sorted(f.cov)) for f in arr.faces) == [(0,), (1,)]


class TestOverlayTile:
    def test_basic_tile(self):
        polys = [(0, arrangement.normalize_rings([sq(2, 2, 8, 8)]))]
        faces = arrangement.overlay_tile(polys, (0, 0, 100, 100))
        # face for the polygon + uncovered remainder of the tile
        led_covs = sorted(tuple(sorted(l[0][1])) for l in [f.ledger for f in faces])
        assert led_covs == [(), (0,)]
        poly_face = [f for f in faces if f.ledger[0][1] == frozenset([0])][0]
        assert poly_face.area2 == 72
        assert not poly_face.touches_border

    def test_overlap_resolution_t2_analogue(self):
        # 4 mutually overlapping squares around a central gap — the
        # reference's t2 fixture shape (4 inputs -> 7 faces, 1 gap):
        polys = [
            (1, arrangement.normalize_rings([sq(0, 0, 40, 40)])),
            (2, arrangement.normalize_rings([sq(60, 0, 100, 40)])),
            (3, arrangement.normalize_rings([sq(0, 60, 40, 100)])),
            (4, arrangement.normalize_rings([sq(60, 60, 100, 100)])),
        ]
        faces = arrangement.overlay_tile(polys, (0, 0, 100, 100))
        covs = [f.ledger[0][1] for f in faces]
        assert sum(1 for c in covs if len(c) == 1) == 4
        # uncovered tile remainder exists
        assert sum(1 for c in covs if len(c) == 0) >= 1

    def test_attribution(self):
        winner, others = arrangement.attribution([(100, frozenset([3, 7]))])
        assert winner == 3 and others == [7]
        winner, others = arrangement.attribution([(100, frozenset())])
        assert winner is None
        # area-weighted after merge: 0.6 covered by 5, 0.4 by nothing
        winner, others = arrangement.attribution(
            [(60, frozenset([5])), (40, frozenset())]
        )
        assert winner == 5 and others == []

    def test_small_face_dissolve(self):
        # enclosed sliver = thin hole (1x20) inside a big square
        shell = sq(10, 10, 90, 50)
        hole = sq(50, 20, 51, 40)
        polys = [(1, arrangement.normalize_rings([shell, hole]))]
        faces_no = arrangement.overlay_tile(polys, (0, 0, 100, 100))
        sliver = [
            f
            for f in faces_no
            if f.ledger[0][1] == frozenset() and not f.touches_border
        ]
        assert len(sliver) == 1 and sliver[0].area2 == 2 * 20
        faces = arrangement.overlay_tile(polys, (0, 0, 100, 100), min_area2_px=200.0)
        interior_uncovered = [
            f
            for f in faces
            if not f.touches_border and arrangement.attribution(f.ledger)[0] is None
        ]
        assert len(interior_uncovered) == 0
        # absorbed into the surrounding face: single ring, full area, winner 1
        a1 = [f for f in faces if arrangement.attribution(f.ledger)[0] == 1][0]
        assert len(a1.rings) == 1
        assert a1.area2 == 2 * (80 * 40)
        # ledger keeps the uncovered contribution for exact coverage fractions
        covered = sum(a for a, c in a1.ledger if 1 in c)
        assert covered == 2 * (80 * 40 - 20)


class TestLineLayer:
    def test_lines_split_faces_without_coverage(self):
        # a polygon split in two by a companion border line (AR5 mode)
        polys = [(1, arrangement.normalize_rings([sq(10, 10, 50, 50)]))]
        line = [np.array([[30, 0], [30, 60]], dtype=np.int64)]
        faces = arrangement.overlay_tile(
            polys, (0, 0, 100, 100), lines=[(99, line)]
        )
        one_cov = [f for f in faces if f.ledger[0][1] == frozenset([1])]
        assert len(one_cov) == 2  # polygon split into two faces
        assert sum(f.area2 for f in one_cov) == 2 * 1600
        # line pk never appears as covering attribution
        for f in faces:
            w, others = arrangement.attribution(f.ledger)
            assert w != 99 and 99 not in others

    def test_dangling_line_pruned(self):
        polys = [(1, arrangement.normalize_rings([sq(10, 10, 50, 50)]))]
        line = [np.array([[20, 20], [40, 40]], dtype=np.int64)]  # ends inside
        faces = arrangement.overlay_tile(polys, (0, 0, 100, 100), lines=[(99, line)])
        one_cov = [f for f in faces if f.ledger[0][1] == frozenset([1])]
        assert len(one_cov) == 1  # dangle does not split anything


class TestBatchedKernels:
    """The batched Unwrap kernels must agree term-for-term with the scalar
    routines on random and adversarial rings."""

    def _rings(self):
        rng = np.random.default_rng(7)
        rings = [
            rng.integers(-1000, 1000, size=(int(rng.integers(3, 14)), 2)).astype(
                np.int64
            )
            for _ in range(800)
        ]
        rings += [
            np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.int64),  # simple
            np.array([[0, 0], [10, 10], [10, 0], [0, 10]], np.int64),  # bowtie
            np.array([[0, 0], [5, 0], [10, 0], [10, 10], [0, 10]], np.int64),
            np.array([[0, 0], [10, 0]], np.int64),  # degenerate
            np.array([[0, 0], [0, 0], [5, 5]], np.int64),  # repeated vertex
        ]
        return rings

    def test_simple_batch_matches_scalar(self):
        rings = self._rings()
        want = np.array([core.ring_is_simple(r) for r in rings])
        got = core.rings_are_simple_batch(rings)
        assert (want == got).all()

    def test_area_batch_matches_scalar(self):
        rings = self._rings()
        want = np.array([core.ring_signed_area2(r) for r in rings])
        got = core.ring_signed_area2_batch(rings)
        assert (want == got).all()

    def test_bbox_batch_matches_scalar(self):
        rings = self._rings()
        got = core.bbox_of_rings_batch(rings)
        for i, r in enumerate(rings):
            assert tuple(got[i]) == core.bbox_of_rings([r])

    def test_empty(self):
        assert len(core.rings_are_simple_batch([])) == 0
        assert len(core.ring_signed_area2_batch([])) == 0
        assert core.bbox_of_rings_batch([]).shape == (0, 4)


class TestFinalizeBatchedKernels:
    """The batched finalize kernels (one parse + one trig pass + one memcpy
    per ring) must be BIT- and BYTE-identical to the scalar per-face path:
    the output `area` column feeds value-hash pins that round to 9 decimals
    on ~1e8-scale values, so even ulp drift is visible."""

    def _faces(self):
        rng = np.random.default_rng(11)
        faces = []
        for _ in range(300):
            nr = int(rng.integers(1, 4))
            rings = [
                rng.integers(0, 1 << 20, size=(int(rng.integers(2, 30)), 2)).astype(
                    np.int64
                )
                for _ in range(nr)
            ]
            # close about half the rings explicitly (exercises both closure
            # branches of _ring_bytes)
            rings = [
                np.vstack([r, r[:1]]) if rng.random() < 0.5 else r for r in rings
            ]
            faces.append(rings)
        faces.append([])  # ring-less face
        faces.append([np.empty((0, 2), np.int64)])  # empty ring
        return faces

    def _packed(self, faces):
        from rogray import stages

        return [stages.pack_rings(rings) for rings in faces]

    def test_wkb_and_areas_bit_identical(self):
        from rogray import stages
        from rogray.geom import wkb as wkb_mod

        ox, oy, prec = 4.05, 57.7, 1e-7
        faces = self._faces()
        bufs = self._packed(faces)
        coords, offs, lens, face_nr = stages.parse_packed_batch(bufs)
        F = core.unsnap(coords, ox, oy, prec)
        got_wkb = wkb_mod.encode_polygons_packed(F, offs, lens, face_nr)
        got_geo = core.geodesic_area_packed(F, offs, lens, face_nr)
        got_pla = core.planar_area_packed(coords, offs, lens, face_nr, prec)
        for i, rings in enumerate(faces):
            rings_f = [core.unsnap(r, ox, oy, prec) for r in rings]
            assert got_wkb[i] == wkb_mod.encode_polygon(rings_f), i
            want_geo = core.geodesic_area(rings, ox, oy, prec)
            assert got_geo[i] == want_geo, i  # bitwise, not approx
            assert got_pla[i] == core.planar_area(rings, prec), i

    def test_parse_matches_unpack(self):
        from rogray import stages

        faces = self._faces()
        bufs = self._packed(faces)
        coords, offs, lens, face_nr = stages.parse_packed_batch(bufs)
        ri = 0
        for f, buf in enumerate(bufs):
            rings, _ = stages.unpack_rings(buf)
            assert int(face_nr[f]) == len(rings)
            for r in rings:
                s, n = int(offs[ri]), int(lens[ri])
                assert n == len(r)
                assert (coords[s : s + n] == r).all()
                ri += 1


class TestBboxScan:
    """scan_coord_bboxes must agree with a full decode on every geometry
    type it claims to handle, and skip exactly what the decoder rejects."""

    def _wkbs(self):
        from rogray.geom import wkb as w

        rng = np.random.default_rng(23)
        out = []
        for _ in range(200):
            kind = rng.integers(0, 4)
            if kind == 0:  # polygon, 1-3 rings
                rings = [
                    rng.uniform(-50, 50, size=(int(rng.integers(3, 9)), 2))
                    for _ in range(int(rng.integers(1, 4)))
                ]
                out.append(w.encode_polygon(rings))
            elif kind == 1:  # multipolygon
                polys = [
                    [rng.uniform(-50, 50, size=(int(rng.integers(3, 7)), 2))]
                    for _ in range(int(rng.integers(1, 3)))
                ]
                out.append(w.encode_multipolygon(polys))
            elif kind == 2:  # linestring
                out.append(
                    w.encode_linestring(rng.uniform(-50, 50, size=(int(rng.integers(2, 8)), 2)))
                )
            else:  # point (skipped by both paths)
                out.append(w.encode_point(float(rng.uniform()), float(rng.uniform())))
        out.append(None)
        out.append(b"")
        out.append(b"\x01\x03\x00\x00")  # truncated header
        poly = w.encode_polygon([np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0]])])
        out.append(poly[: len(poly) - 7])  # truncated coords
        return out

    def test_matches_decode(self):
        from rogray.geom import wkb as w

        wkbs = self._wkbs()
        rows, mnx, mny, mxx, mxy = w.scan_coord_bboxes(wkbs)
        got = dict(zip(rows.tolist(), zip(mnx, mny, mxx, mxy)))
        for i, wb in enumerate(wkbs):
            want = None
            if wb:
                import struct as _st

                try:
                    gtype, parts = w.decode(wb)
                except (w.WkbError, _st.error, ValueError):
                    gtype, parts = None, None
                if gtype in (w.POLYGON, w.MULTIPOLYGON):
                    rings = [r for poly in (parts if gtype == w.MULTIPOLYGON else [parts[0]]) for r in poly]
                    # decode strips closing vertices; rescan raw coords via
                    # the ring arrays plus the stripped closers — bbox is
                    # unchanged by the closing duplicate
                    pts = np.concatenate(rings)
                    want = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
                elif gtype == w.LINESTRING:
                    pts = parts[0][0]
                    want = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
            if want is None:
                assert i not in got, i
            else:
                assert i in got, i
                assert got[i] == want, i
