"""Regression tests for the round-1 verdict/advice findings.

1. Route fast path must never emit a non-partition (phantom) tile for
   rows whose bbox corners fall in a histogram-empty region of a SPLIT
   base cell (the sampled/centroid-keyed histogram makes such regions
   reachable at scale).
2. pk derivation for string doc_ids must be process-stable (builtin
   ``hash`` is salted per process) so the winner attribute join works.
3. Monetary cents must round half away from zero like DuckDB round().
"""

import numpy as np
import pyarrow as pa

from rogray import stages
from rogray.ids import stable_pk
from rogray.tiling import balance, quadkey


class TestRouteFastPathPartition:
    def _cut(self):
        # data only in level-1 quadrants (0,0) and (1,0): the root splits,
        # quadrants (0,1)/(1,1) are histogram-empty but still partition
        # tiles (all_tiles covers the square)
        fine_cells = quadkey.encode(2, np.array([0, 2]), np.array([0, 1]))
        counts = np.array([10, 10])
        cut = balance.build_cut(fine_cells, counts, base_level=0, fine_level=2, max_rows=15)
        return balance.CutIndex(cut, base_level=0, fine_level=2, span_px=1024)

    def test_empty_quadrant_row_not_misrouted(self):
        cut = self._cut()
        partition = set(int(t) for t in cut.all_tiles())
        # bbox entirely inside the empty (1,1) quadrant of the split root:
        # both corners fall back to the base cell in tile_of_points_px, so
        # an unguarded lo==hi fast path would route to the (phantom) root
        t = pa.table(
            {
                "pk": pa.array([7], pa.int64()),
                "minx": pa.array([600], pa.int64()),
                "miny": pa.array([600], pa.int64()),
                "maxx": pa.array([700], pa.int64()),
                "maxy": pa.array([700], pa.int64()),
            }
        )
        routed = stages.Route(cut)(t)
        tiles = routed["tile"].to_pylist()
        assert tiles == [int(quadkey.encode(1, np.array([1]), np.array([1]))[0])]
        assert set(tiles) <= partition

    def test_all_routes_land_in_partition(self):
        cut = self._cut()
        partition = set(int(t) for t in cut.all_tiles())
        rng = np.random.default_rng(0)
        mnx = rng.integers(0, 1000, 200)
        mny = rng.integers(0, 1000, 200)
        t = pa.table(
            {
                "pk": pa.array(np.arange(200), pa.int64()),
                "minx": pa.array(mnx, pa.int64()),
                "miny": pa.array(mny, pa.int64()),
                "maxx": pa.array(mnx + rng.integers(0, 60, 200), pa.int64()),
                "maxy": pa.array(mny + rng.integers(0, 60, 200), pa.int64()),
            }
        )
        routed = stages.Route(cut)(t)
        assert set(routed["tile"].to_pylist()) <= partition
        # and routing agrees with the exhaustive bbox descend per row
        got: dict[int, set] = {}
        for pk, tile in zip(routed["pk"].to_pylist(), routed["tile"].to_pylist()):
            got.setdefault(pk, set()).add(tile)
        for i in range(200):
            want = set(
                cut.tiles_of_bbox_px(int(mnx[i]), int(mny[i]), int(mnx[i]) + 0, int(mny[i]) + 0)
            )
            # recompute with the row's actual bbox
            want = set(
                cut.tiles_of_bbox_px(
                    int(t["minx"][i].as_py()),
                    int(t["miny"][i].as_py()),
                    int(t["maxx"][i].as_py()),
                    int(t["maxy"][i].as_py()),
                )
            )
            assert got[i] == want


class TestStablePk:
    def test_numeric_passthrough(self):
        assert stable_pk("42") == 42
        assert stable_pk(7) == 7

    def test_string_ids_deterministic_across_processes(self):
        import subprocess
        import sys

        code = (
            "import sys; sys.path.insert(0, '/root/repo');"
            "from rogray.ids import stable_pk;"
            "print(stable_pk('alpha'), stable_pk('beta'))"
        )
        outs = {
            subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                env={"PYTHONHASHSEED": str(seed), "PATH": "/usr/bin:/bin"},
            ).stdout.strip()
            for seed in (1, 2)
        }
        assert len(outs) == 1  # same pks under different hash seeds
        a, b = outs.pop().split()
        assert int(a) == stable_pk("alpha") and int(b) == stable_pk("beta")

    def test_resolve_attributes_string_doc_ids(self, ray_session):
        """Two overlapping squares with non-numeric doc_ids: winner
        attribution must survive the pk join (regression: per-process
        hash() made every string-id join miss)."""
        import ray.data as rd

        from rogray import spans as spans_mod
        from rogray.config import ResolveConfig, TopologyConfig
        from rogray.geom import wkb
        from rogray.pipelines import resolve

        sq1 = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
        sq2 = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0]])
        docs = pa.table(
            {
                "doc_id": pa.array(["alpha", "beta"]),
                "spans": spans_mod.make_spans_column(
                    [
                        [("text", "first doc", "", 0), ("geometry", wkb.encode_polygon([sq1]).hex(), "", 1)],
                        [("geometry", wkb.encode_polygon([sq2]).hex(), "", 0)],
                    ]
                ),
            }
        )
        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-3, max_rows_in_each_cell=16, base_level=1)
        )
        df = resolve.resolve_overlap_gap(rd.from_arrow(docs), cfg).to_pandas()
        attributed = df[df["doc_id"].notna()]
        assert set(attributed["doc_id"]) == {"alpha", "beta"}
        # spans (incl. the non-geometry one) rode through the join
        alpha_rows = attributed[attributed["doc_id"] == "alpha"]
        assert all(r[0]["text"] == "first doc" for r in alpha_rows["spans"])


class TestCentsRounding:
    def test_half_away_from_zero(self):
        from rogray.relational import _cents

        # 0.125 * 100 = 12.5 exactly in binary: DuckDB round() -> 13,
        # banker's np.round -> 12 (the regression)
        got = _cents(np.array([0.125, -0.125, 2.0, 0.0]))
        assert got.tolist() == [13, -13, 200, 0]

    def test_matches_duckdb_round(self):
        import duckdb

        from rogray.relational import _cents

        vals = [0.125, -0.125, 1.115, -1.115, 0.005, 99.995, -0.375]
        want = [
            duckdb.sql(f"select cast(round({v} * 100) as bigint)").fetchone()[0]
            for v in vals
        ]
        assert _cents(np.array(vals)).tolist() == want


class TestTilingIndependenceAtScale:
    def test_multi_equals_single_tile_1500(self, ray_session):
        """The 64-doc tiling-independence test missed a coverage bug that
        only shows with enough invalid (self-crossing) inputs: directional
        flood-fill updates were path-dependent for invalid boundaries, so
        winner attribution depended on the tiling.  This pins the invariant
        at a scale where that class of bug is visible (1500 docs includes
        ~15 bowties and ~36 duplicate-contained polygons)."""
        import ray.data as rd

        import rogray.sources as sources
        from rogray.config import ResolveConfig, TopologyConfig
        from rogray.pipelines import resolve
        from tests.test_resolve_pipeline import canonical_face_key

        ds = rd.read_parquet(sources.docs_path_for("x", 1500))
        multi = resolve.resolve_overlap_gap(
            ds,
            ResolveConfig(topology=TopologyConfig(
                snap_tolerance=1e-5, max_rows_in_each_cell=150, base_level=2)),
        ).to_pandas()
        single = resolve.resolve_overlap_gap(
            ds,
            ResolveConfig(topology=TopologyConfig(
                snap_tolerance=1e-5, max_rows_in_each_cell=10**9, base_level=0)),
        ).to_pandas()
        assert len(multi) == len(single)
        k1 = {
            canonical_face_key(r["wkb"], r["winner_pk"], r["other_intersect_id_list"])
            for _, r in multi.iterrows()
        }
        k2 = {
            canonical_face_key(r["wkb"], r["winner_pk"], r["other_intersect_id_list"])
            for _, r in single.iterrows()
        }
        # Residual tolerance: snap-round noding near tile borders can move a
        # junction vertex by <= 1 px (hot-pixel snap), perturbing a face
        # where three regions meet — sub-pixel, area-neutral, and bounded.
        # Everything else must be bit-identical.
        divergent = len(k1 ^ k2)
        assert divergent <= max(2, len(k1) // 500), f"{divergent} divergent faces"
        # attribution mass must agree to float precision regardless
        gm = multi.groupby("winner_pk")["area"].sum()
        gs = single.groupby("winner_pk")["area"].sum()
        j = gm.to_frame("m").join(gs.to_frame("s"), how="outer").fillna(0.0)
        rel = (j["m"] - j["s"]).abs().sum() / single["area"].sum()
        assert rel < 1e-7, rel


class TestJT5Smoothing:
    def _utm_ds(self):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        import rogray.sources as sources
        from rogray import spans as spans_mod
        from rogray.geom import wkb

        t = pq.read_table(sources.docs_path_for("x", 64))
        span_lists = []
        for doc in t["spans"].to_pylist():
            new_doc = []
            for s in doc:
                if s["kind"] == "geometry":
                    rings = wkb.decode_polygon_rings(bytes.fromhex(s["text"]))
                    rings_m = [(r - np.array([5.0, 58.0])) * 100_000.0 for r in rings]
                    s = {**s, "text": wkb.encode_polygon(rings_m).hex()}
                new_doc.append(s)
            span_lists.append(new_doc)
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": t["doc_id"],
                    "spans": pa.array(
                        [[dict(x) for x in d] for d in span_lists], spans_mod.SPANS_TYPE
                    ),
                }
            )
        )

    def test_simplify_chaikins_golden(self, ray_session):
        """The reference t3 analogue (resolve_overlap_and_gap.sql:61-94:
        utm, tol 1.0 m, simplify 30, chaikins 1 -> pinned structure
        counts, resolve_overlap_and_gap_expected:11-15).  Our engine's
        pinned numbers on the 64-doc metric fixture: same face structure
        as the uncleaned run, fewer boundary vertices, area within 0.1%,
        and the cleaned faces still partition the plane (overlap == 0)."""
        from rogray.config import CleanConfig, ResolveConfig, TopologyConfig
        from rogray.geom import wkb
        from rogray.pipelines import compare, resolve

        ds = self._utm_ds()
        topo = TopologyConfig(snap_tolerance=1.0, utm=True, max_rows_in_each_cell=16, base_level=1)
        cfg = ResolveConfig(
            topology=topo,
            clean=CleanConfig(simplify_tolerance=30.0, chaikins_n_iterations=1),
        )
        res = resolve.resolve_overlap_gap(ds, cfg)
        df = res.to_pandas()
        nvtx = sum(len(wkb.decode_polygon_rings(w)[0]) for w in df["wkb"])
        assert len(df) == 133
        assert int(df["winner_pk"].notna().sum()) == 126
        assert nvtx == 919  # golden: smoothing removed 30 of 949 vertices
        # (4 chains reverted by the global cross-chain validation)
        plain = resolve.resolve_overlap_gap(ds, ResolveConfig(topology=topo)).to_pandas()
        assert abs(df["area"].sum() - plain["area"].sum()) / plain["area"].sum() < 1e-3
        # watertight: smoothed faces still overlap-free (shared chains were
        # smoothed identically on both sides)
        qa = compare.compare_result(ds, res, cfg)
        after = qa[qa["phase"] == "after"].iloc[0]
        assert after["n_overlap_pairs"] == 0
        assert after["overlap_area"] == 0.0


class TestFaceRelationRows:
    def test_ar5_attribute_table_golden(self, ray_session, docs64=None):
        """AR5 attribute-table mode analogue (reference expected:36-103 —
        9 faces / 54 edges / 63 relation rows on its fixture): pinned
        relation-row structure on ours.  Row count == sum of coverage-set
        sizes (gap faces contribute one NULL row); per-face area constant
        across its rows."""
        import ray.data as rd

        import rogray.sources as sources
        from rogray.config import ResolveConfig, TopologyConfig
        from rogray.pipelines import resolve

        ds = rd.read_parquet(sources.docs_path_for("x", 64))
        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=16, base_level=1)
        )
        df = resolve.face_relation_rows(ds, cfg).to_pandas()
        assert len(df) == 195
        assert df["face_id"].nunique() == 133      # == resolved face count
        assert int(df["src_pk"].isna().sum()) == 7  # == gap faces
        # area consistent per face; each covered face repeats once per src
        g = df.groupby("face_id")
        assert (g["face_area"].nunique() == 1).all()
        covered = df[df["src_pk"].notna()]
        assert (covered.groupby("face_id")["src_pk"].count()
                == covered.groupby("face_id")["n_srcs"].first()).all()


class TestGiantPolygonClipping:
    def _docs(self):
        import pyarrow as pa

        from rogray import spans as spans_mod
        from rogray.geom import wkb

        rng = np.random.default_rng(7)
        span_lists, ids = [], []
        # giant polygon: 3000-point circle covering most of the layer
        ang = np.linspace(0, 2 * np.pi, 3000, endpoint=False)
        big = np.stack([5.6 + 0.5 * np.cos(ang), 58.6 + 0.5 * np.sin(ang)], axis=1)
        ids.append("0")
        span_lists.append([("geometry", wkb.encode_polygon([big]).hex(), "", 0)])
        # small polygons scattered inside and around it
        for i in range(1, 40):
            cx = 5.1 + rng.uniform(0, 1.0)
            cy = 58.1 + rng.uniform(0, 1.0)
            a = np.sort(rng.uniform(0, 2 * np.pi, 7))
            r = 0.02 * rng.uniform(0.6, 1.2, 7)
            ring = np.stack([cx + r * np.cos(a), cy + r * np.sin(a)], axis=1)
            ids.append(str(i))
            span_lists.append([("geometry", wkb.encode_polygon([ring]).hex(), "", 0)])
        return pa.table(
            {"doc_id": pa.array(ids), "spans": spans_mod.make_spans_column(span_lists)}
        )

    def test_clip_shrinks_shuffle_and_preserves_output(self, ray_session):
        import pyarrow.parquet as pq
        import ray.data as rd

        from rogray import stages
        from rogray.config import ResolveConfig, TopologyConfig
        from rogray.pipelines import resolve
        from tests.test_resolve_pipeline import canonical_face_key

        docs = self._docs()
        ds = rd.from_arrow(docs)
        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-4, max_rows_in_each_cell=4, base_level=3)
        )
        plan = resolve.prepare(ds, cfg)
        uw = stages.Unwrap(plan.grid)(docs)

        clipped_route = stages.Route(plan.cut)(uw)
        old_pts = stages.Route.GIANT_POINTS
        try:
            stages.Route.GIANT_POINTS = 10**9  # disable clipping
            whole_route = stages.Route(plan.cut)(uw)
        finally:
            stages.Route.GIANT_POINTS = old_pts

        def ring_bytes(tb):
            return sum(len(b) for b in tb["rings"].to_pylist())

        # the giant ring would otherwise replicate to every tile it touches
        assert ring_bytes(clipped_route) < 0.5 * ring_bytes(whole_route)

        df_clip = resolve.resolve_overlap_gap(ds, cfg, plan=plan).to_pandas()
        try:
            stages.Route.GIANT_POINTS = 10**9
            df_whole = resolve.resolve_overlap_gap(ds, cfg, plan=plan).to_pandas()
        finally:
            stages.Route.GIANT_POINTS = old_pts
        assert len(df_clip) == len(df_whole)
        k1 = sorted(
            canonical_face_key(r["wkb"], r["winner_pk"], r["other_intersect_id_list"])
            for _, r in df_clip.iterrows()
        )
        k2 = sorted(
            canonical_face_key(r["wkb"], r["winner_pk"], r["other_intersect_id_list"])
            for _, r in df_whole.iterrows()
        )
        assert k1 == k2


class TestCrossGroupDissolve:
    def test_min_area_multi_matches_single(self, ray_session):
        """JT6 across tile borders: small faces that were border pieces get
        dissolved by the post-stitch pass.  Multi-tile and single-tile runs
        must agree on the face COUNT (no small face survives anywhere), the
        exact total area, and attribute mass within 0.5% (the dissolve
        order differs between the per-tile and global passes, like the
        reference's per-cell JT6 vs a single-cell run)."""
        import ray.data as rd

        import rogray.sources as sources
        from rogray.config import CleanConfig, ResolveConfig, TopologyConfig
        from rogray.pipelines import resolve

        ds = rd.read_parquet(sources.docs_path_for("x", 300))
        min_area = 300_000.0
        multi = resolve.resolve_overlap_gap(ds, ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=30, base_level=2),
            clean=CleanConfig(min_area_to_keep=min_area))).to_pandas()
        single = resolve.resolve_overlap_gap(ds, ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=10**9, base_level=0),
            clean=CleanConfig(min_area_to_keep=min_area))).to_pandas()
        assert len(multi) == len(single)
        assert int((multi["area"] < min_area).sum()) == 0
        assert int((single["area"] < min_area).sum()) == 0
        assert abs(multi["area"].sum() - single["area"].sum()) / single["area"].sum() < 1e-12
        gm = multi.groupby("winner_pk")["area"].sum()
        gs = single.groupby("winner_pk")["area"].sum()
        j = gm.to_frame("m").join(gs.to_frame("s"), how="outer").fillna(0.0)
        assert (j["m"] - j["s"]).abs().sum() / single["area"].sum() < 5e-3
