"""Rectangle-layer oracle harness (rogray/rectlayer.py): the REAL geometry
pipelines — find_overlap_gap, coverage_depth, point_in_polygon_join — over
an exact integer rectangle frame, value-compared against independent DuckDB
interval-arithmetic oracles at sf0.001 (the driver repeats the same checks
at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from rogray import rectlayer

SF = "/root/testdata/sf0.001"


def _oracle_con():
    con = duckdb.connect()
    for t in ("part", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _assert_exact(ds, sql):
    got = ds.to_pandas()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = _oracle_con().execute(sql).df()[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if got[c].dtype != object:
            got[c] = got[c].astype("int64")
        if want[c].dtype != object:
            want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    return got


class TestRectFormulas:
    def test_corners_match_sql(self):
        k = np.arange(1, 3000, dtype=np.int64)
        x1, y1, x2, y2 = rectlayer.rect_corners(k)
        con = duckdb.connect()
        con.execute("CREATE VIEW part AS SELECT unnest(range(1, 3000)) AS p_partkey")
        df = con.execute(f"WITH {rectlayer._RECT_CTE} SELECT * FROM rect ORDER BY k").df()
        assert (df["x1"].to_numpy() == x1).all()
        assert (df["y1"].to_numpy() == y1).all()
        assert (df["x2"].to_numpy() == x2).all()
        assert (df["y2"].to_numpy() == y2).all()

    def test_edges_even_points_odd_in_frame(self):
        k = np.arange(1, 30000, dtype=np.int64)
        x1, y1, x2, y2 = rectlayer.rect_corners(k)
        for a in (x1, y1, x2, y2):
            assert (a % 2 == 0).all() and (a >= 0).all()
        assert int(max(x2.max(), y2.max())) < rectlayer._SPAN
        px, py = rectlayer.point_coords(k)
        assert (px % 2 == 1).all() and (py % 2 == 1).all()
        assert int(max(px.max(), py.max())) < rectlayer._SPAN


class TestRectOracles:
    def test_overlap_pairs_exact(self, ray_session):
        got = _assert_exact(
            rectlayer.rect_overlap_pairs(SF), rectlayer.rect_overlap_pairs_sql()
        )
        assert len(got) > 0 and (got["overlap_px2"] > 0).all()

    def test_coverage_depth_exact(self, ray_session):
        got = _assert_exact(
            rectlayer.rect_coverage_depth(SF), rectlayer.rect_coverage_depth_sql()
        )
        # depth>=2 area must equal the inclusion-exclusion-free bound:
        # sum over depths of area == union area <= sum of rect areas
        assert got["depth"].min() == 1 and got["depth"].max() >= 2

    def test_pip_join_exact(self, ray_session):
        got = _assert_exact(rectlayer.rect_pip_join(SF), rectlayer.rect_pip_join_sql())
        assert len(got) > 0

    def test_resolve_winner_areas_exact(self, ray_session):
        """The FULL flagship pipeline (route -> overlay -> stitch ->
        finalize -> attribution) against the per-cell MIN(k) oracle."""
        got = _assert_exact(
            rectlayer.rect_resolve_winner_areas(SF),
            rectlayer.rect_resolve_winner_areas_sql(),
        )
        assert (got["area_px2"] > 0).all()

    def test_resolve_cov_areas_exact(self, ray_session):
        ds = rectlayer.rect_resolve_cov_areas(SF)
        got = ds.to_pandas()
        want = (
            _oracle_con().execute(rectlayer.rect_resolve_cov_areas_sql()).df()
        )
        got = got.sort_values(["cov_key"]).reset_index(drop=True)
        want = want.sort_values(["cov_key"]).reset_index(drop=True)
        assert got["cov_key"].tolist() == want["cov_key"].tolist()
        assert got["area_px2"].astype("int64").tolist() == want[
            "area_px2"
        ].astype("int64").tolist()

    def test_edge_pairs_len_exact(self, ray_session):
        """extract_edges (noding + adjacency labels + tile-clipped
        ownership) against the 4-neighbour unit-cell boundary oracle.
        This check found (and now pins the fix for) the round-3
        double-emit/drop bug in whole-segment midpoint ownership."""
        got = _assert_exact(
            rectlayer.rect_edge_pairs_len(SF), rectlayer.rect_edge_pairs_len_sql()
        )
        assert len(got) > 0

    def test_depth_union_consistent_with_rect_areas(self, ray_session):
        """Union area (sum over depth buckets) + pairwise overlap structure:
        sum(depth * area) over buckets == total rect area (every rect
        counted once per unit cell it covers)."""
        import pyarrow.parquet as pq

        got = rectlayer.rect_coverage_depth(SF).to_pandas()
        k = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"])[
            "p_partkey"
        ].to_numpy()
        x1, y1, x2, y2 = rectlayer.rect_corners(k.astype(np.int64))
        total = int(((x2 - x1) * (y2 - y1)).sum())
        assert int((got["depth"] * got["area_px2"]).sum()) == total


class TestRasterOps:
    def test_rasterize_runs_oracle(self, ray_session):
        _assert_exact(
            rectlayer.rect_rasterize_runs(SF), rectlayer.rect_rasterize_runs_sql()
        )

    def test_zonal_stats_oracle(self, ray_session):
        _assert_exact(
            rectlayer.rect_zonal_stats(SF), rectlayer.rect_zonal_stats_sql()
        )

    def test_vectorize_area_oracle(self, ray_session):
        """raster->vector round trip: vectorized polygon area (shells minus
        holes, exact integer shoelace) equals the zone's pixel count."""
        got = _assert_exact(
            rectlayer.rect_vectorize_area(SF), rectlayer.rect_vectorize_area_sql()
        )
        assert (got["vec_area"] > 0).all()


class TestScanlineKernel:
    """The rasterizer kernel vs a brute-force even-odd center test."""

    @staticmethod
    def _brute(rings, w, h):
        got = set()
        for cx in range(w):
            for cyy in range(h):
                px, py = cx + 0.5, cyy + 0.5
                c = 0
                for r in rings:
                    pts = list(map(tuple, r)) + [tuple(r[0])]
                    for (ax, ay), (bx, by) in zip(pts[:-1], pts[1:]):
                        if ay != by and min(ay, by) <= py < max(ay, by):
                            if px < ax + (py - ay) * (bx - ax) / (by - ay):
                                c += 1
                if c % 2 == 1:
                    got.add((cx, cyy))
        return got

    def test_matches_brute_force_on_odd_shapes(self):
        from rogray import raster

        shapes = [
            [np.array([[0, 0], [10, 0], [0, 10]], float)],          # triangle
            [np.array([[0, 0], [7, 7], [7, 0], [0, 7]], float)],    # bowtie
            [np.array([[0, 0], [9, 0], [9, 9], [0, 9]], float),     # with hole
             np.array([[2, 2], [6, 2], [6, 6], [2, 6]], float)],
            [np.array([[0.3, 0.2], [8.7, 1.1], [4.4, 9.6]], float)],  # non-integer
        ]
        p, cy, x0, x1 = raster.scanline_runs(shapes)
        for si, rings in enumerate(shapes):
            got = {
                (cx, int(cy[i]))
                for i in np.flatnonzero(p == si)
                for cx in range(x0[i], x1[i])
            }
            assert got == self._brute(rings, 12, 12), f"shape {si}"

    def test_shared_edge_partition(self):
        """Two faces sharing an edge claim every center exactly once."""
        from rogray import raster

        left = [np.array([[0, 0], [5, 0], [4, 8], [0, 8]], float)]
        right = [np.array([[5, 0], [9, 0], [9, 8], [4, 8]], float)]
        p, cy, x0, x1 = raster.scanline_runs([left, right])
        seen = {}
        for i in range(len(p)):
            for cx in range(x0[i], x1[i]):
                key = (cx, int(cy[i]))
                assert key not in seen, f"double-claimed {key}"
                seen[key] = int(p[i])
        union = self._brute(left + right, 12, 12)
        assert set(seen) == union


class TestCrossLayerJoin:
    def test_oracle(self, ray_session):
        _assert_exact(
            rectlayer.rect_cross_layer_join(SF),
            rectlayer.rect_cross_layer_join_sql(),
        )

    def test_b_corners_match_sql(self):
        k = np.arange(1, 3000, dtype=np.int64)
        x1, y1, x2, y2 = rectlayer.rect_b_corners(k)
        con = duckdb.connect()
        con.execute("CREATE VIEW part AS SELECT unnest(range(1, 3000)) AS p_partkey")
        df = con.execute(
            f"WITH {rectlayer._RECT_B_CTE} SELECT * FROM rectb ORDER BY k"
        ).df()
        assert (df["x1"].to_numpy() == x1).all()
        assert (df["y1"].to_numpy() == y1).all()
        assert (df["x2"].to_numpy() == x2).all()
        assert (df["y2"].to_numpy() == y2).all()
        for a in (x1, y1, x2, y2):
            assert (a % 2 == 0).all() and (a >= 0).all()
        assert int(max(x2.max(), y2.max())) < rectlayer._SPAN

    def test_same_layer_join_matches_overlap_pairs(self, ray_session):
        """A x A through the cross-layer operator reproduces the
        find_overlap_gap pair areas (plus the trivial self pairs)."""
        from rogray import spatial_query

        a = rectlayer.rect_docs(SF)
        cfg = rectlayer.rect_cfg()
        plan = rectlayer.rect_plan(a, cfg)
        res = spatial_query.layer_intersection_join(
            a, rectlayer.rect_docs(SF), cfg, plan
        ).to_pandas()
        res = res[res.pk_a < res.pk_b].rename(columns={"sum(area)": "area"})
        want = rectlayer.rect_overlap_pairs(SF).to_pandas()
        got = {
            (int(r.pk_a), int(r.pk_b)): int(round(r.area))
            for r in res.itertuples()
        }
        exp = {
            (int(r.id1), int(r.id2)): int(r.overlap_px2) for r in want.itertuples()
        }
        assert got == exp


class TestCellCover:
    def test_oracle(self, ray_session):
        _assert_exact(
            rectlayer.rect_cell_cover(SF), rectlayer.rect_cell_cover_sql()
        )

    def test_cover_cells_roundtrip_quadkey(self, ray_session):
        """The opaque cell ids decode back to (level, cx, cy)."""
        from rogray.tiling import quadkey

        docs = rectlayer.rect_docs(SF)
        cfg = rectlayer.rect_cfg()
        plan = rectlayer.rect_plan(docs, cfg)
        from rogray import spatial_query

        df = spatial_query.cell_cover(docs, 9, cfg, plan).to_pandas()
        lvl, cx, cy = quadkey.decode(df["cell"].to_numpy().astype(np.uint64))
        assert (lvl == 9).all()
        assert (cx == df["cx"].to_numpy()).all()
        assert (cy == df["cy"].to_numpy()).all()


class TestLineCoverOracle:
    def test_line_cover_len_exact(self, ray_session):
        got = _assert_exact(
            rectlayer.rect_line_cover_len(SF), rectlayer.rect_line_cover_len_sql()
        )
        assert len(got) > 0 and (got["cov_len"] > 0).all()


class TestDanglingLineEdges:
    def test_dangling_piece_keeps_coverage(self, ray_session):
        """A line ENDING inside a polygon is a dangle (bounds no face);
        PostGIS topology still lists it as an edge — extract_edges must
        recover the pruned pieces with the containing region's coverage
        and the exact total length."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from rogray import spans as spans_mod
        from rogray.config import ResolveConfig, TopologyConfig
        from rogray.geom import wkb
        from rogray.pipelines import detect

        poly = np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])
        line = np.array([[4.0, 4.0], [9.0, 4.1]])  # starts INSIDE the polygon
        docs = pa.table(
            {
                "doc_id": pa.array(["1", "2"]),
                "spans": spans_mod.make_spans_column(
                    [
                        [(spans_mod.GEOMETRY_KIND, wkb.encode_polygon([poly]).hex(), "", 0)],
                        [(spans_mod.GEOMETRY_KIND, wkb.encode_linestring(line).hex(), "", 0)],
                    ]
                ),
            }
        )
        cfg = ResolveConfig(
            topology=TopologyConfig(
                snap_tolerance=0.01, utm=True, max_rows_in_each_cell=10, base_level=1
            )
        )
        edges = detect.extract_edges(rd.from_arrow(docs), cfg).to_pandas()
        line_rows = edges[edges.source_pks.map(lambda s: 2 in list(s))]
        assert len(line_rows) >= 2  # inside piece + outside piece(s)
        total = line_rows.length.sum()
        assert abs(total - np.hypot(5.0, 0.1)) < 0.05  # snapped ~= exact
        inside = line_rows[line_rows.left_cov.map(lambda c: 1 in list(c))]
        assert len(inside) >= 1  # the dangling piece carries the polygon pk
        assert (inside.left_cov.map(tuple) == inside.right_cov.map(tuple)).all()


class TestNearestJoinOracle:
    def test_nearest_join_exact(self, ray_session):
        got = _assert_exact(
            rectlayer.rect_nearest_join(SF), rectlayer.rect_nearest_join_sql()
        )
        assert len(got) > 0
        # points inside a rectangle have distance exactly 0
        assert (got["d2_px"] >= 0).all()
