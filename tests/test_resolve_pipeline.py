"""End-to-end tests for the resolve pipeline on synthetic fixtures.

The key invariant (SURVEY.md section 7.4 "cross-tile exactness"): the
result must be INDEPENDENT of the tiling — running the same input as one
giant tile or as many small tiles yields the same face set with
bit-identical snapped geometry.  The reference gets this from a single
shared PostGIS topology; we get it from the global snap grid + exact
stitch, and this test is the proof.
"""

import numpy as np
import pyarrow as pa
import pytest

import rogray.sources as sources
from rogray.config import ResolveConfig, TopologyConfig
from rogray.geom import wkb


def canonical_face_key(wkb_bytes: bytes, winner, others) -> tuple:
    """Tiling-independent identity of an output face: canonicalized rings
    (rotated to lexicographic min start, holes sorted) + attribution."""
    rings = wkb.decode_polygon_rings(wkb_bytes)
    canon = []
    for r in rings:
        r = np.round(np.asarray(r), 9)
        k = min(range(len(r)), key=lambda i: (r[i, 0], r[i, 1]))
        rr = np.roll(r, -k, axis=0)
        canon.append(tuple(map(tuple, rr)))
    shell, holes = canon[0], tuple(sorted(canon[1:]))
    w = None if winner is None or (isinstance(winner, float) and np.isnan(winner)) else int(winner)
    return (shell, holes, w, tuple(sorted(others)))


def run_resolve(ds, cfg):
    from rogray.pipelines import resolve

    return resolve.resolve_overlap_gap(ds, cfg).to_pandas()


@pytest.fixture(scope="module")
def docs64(ray_session):
    import ray.data as rd

    path = sources.docs_path_for("/root/testdata/sf0.001", 64)
    return rd.read_parquet(path)


class TestResolve:
    def test_basic_output(self, docs64):
        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=16, base_level=1)
        )
        df = run_resolve(docs64, cfg)
        assert len(df) > 64  # overlaps create extra faces
        assert df["winner_pk"].notna().sum() >= 60
        # every attributed face's winner covers >50% -> winner never in others
        for _, row in df.dropna(subset=["winner_pk"]).iterrows():
            assert int(row["winner_pk"]) not in list(row["other_intersect_id_list"])
        # bowtie rows (pk % 97 == 13) flag neighbours invalid
        assert (~df["input_geo_is_valid"]).sum() > 0

    def test_tiling_independence(self, docs64):
        base = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=10_000, base_level=0)
        )
        fine = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=8, base_level=2)
        )
        df1 = run_resolve(docs64, base)
        df2 = run_resolve(docs64, fine)
        k1 = sorted(
            canonical_face_key(r["wkb"], r["winner_pk"], r["other_intersect_id_list"])
            for _, r in df1.iterrows()
        )
        k2 = sorted(
            canonical_face_key(r["wkb"], r["winner_pk"], r["other_intersect_id_list"])
            for _, r in df2.iterrows()
        )
        assert len(k1) == len(k2)
        assert k1 == k2

    def test_span_passthrough(self, docs64):
        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=16, base_level=1)
        )
        df = run_resolve(docs64, cfg)
        src = {r["doc_id"]: r["spans"] for r in docs64.take_all()}
        checked = 0
        for _, row in df.iterrows():
            if row["doc_id"] is None:
                continue
            orig = src[row["doc_id"]]
            out = row["spans"]
            assert len(out) == len(orig)
            for o, n in zip(orig, out):
                if o["kind"] == "geometry":
                    assert n["kind"] == "geometry"
                    assert n["text"] != ""  # rewritten
                else:
                    # untouched spans byte-identical, order preserved
                    assert (o["kind"], o["text"], o["media_ref"], o["offset"]) == (
                        n["kind"],
                        n["text"],
                        n["media_ref"],
                        n["offset"],
                    )
            checked += 1
        assert checked > 50


class TestResume:
    def test_resume_skips_done_tiles(self, docs64, tmp_path):
        import shutil
        import os
        import json

        from rogray.pipelines import resolve

        out_dir = str(tmp_path / "ckpt")
        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=8, base_level=2)
        )
        df1 = (
            resolve.resolve_overlap_gap_resumable(docs64, out_dir, cfg)
            .to_pandas()
        )
        tiles = sorted(d for d in os.listdir(out_dir) if d.startswith("tile="))
        assert len(tiles) > 4
        # record manifests, then simulate a partial crash: remove 3 tiles
        kept_stamp = {}
        for d in tiles:
            with open(os.path.join(out_dir, d, "_MANIFEST.json")) as f:
                kept_stamp[d] = json.load(f)["written_at"]
        for d in tiles[:3]:
            shutil.rmtree(os.path.join(out_dir, d))
        # a crash mid-overlay means the stitched phase checkpoint was
        # never written — remove it so this test exercises TILE resume
        # (phase resume is covered in test_round3_fixes.py)
        shutil.rmtree(os.path.join(out_dir, "phase=stitched"), ignore_errors=True)
        df2 = (
            resolve.resolve_overlap_gap_resumable(docs64, out_dir, cfg)
            .to_pandas()
        )
        # identical final output
        k1 = sorted(
            canonical_face_key(r["wkb"], r["winner_pk"], r["other_intersect_id_list"])
            for _, r in df1.iterrows()
        )
        k2 = sorted(
            canonical_face_key(r["wkb"], r["winner_pk"], r["other_intersect_id_list"])
            for _, r in df2.iterrows()
        )
        assert k1 == k2
        # finished tiles were NOT recomputed (same manifest timestamp)
        for d in tiles[3:]:
            with open(os.path.join(out_dir, d, "_MANIFEST.json")) as f:
                assert json.load(f)["written_at"] == kept_stamp[d]
        # the 3 deleted ones were recomputed
        for d in tiles[:3]:
            with open(os.path.join(out_dir, d, "_MANIFEST.json")) as f:
                assert json.load(f)["written_at"] != kept_stamp[d]


class TestCompare:
    def test_overlap_resolved_to_zero(self, docs64):
        from rogray.pipelines import compare, resolve

        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=16, base_level=1)
        )
        result = resolve.resolve_overlap_gap(docs64, cfg)
        df = compare.compare_result(docs64, result, cfg)
        before = df[df["phase"] == "before"].iloc[0]
        after = df[df["phase"] == "after"].iloc[0]
        assert before["overlap_area"] > 0
        assert after["n_overlap_pairs"] == 0
        assert after["overlap_area"] == 0.0


class TestUtmMode:
    def test_utm_resolve_matches_degree_structure(self, ray_session):
        """The reference's t3 fixture: same data in a metric CRS
        (resolve_overlap_and_gap.sql:61-94).  We scale the degree fixture
        into fake metres and check the same face structure comes out of
        the utm=True path (planar areas, data-extent grid)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from rogray import sources
        from rogray import spans as spans_mod
        from rogray.geom import wkb
        from rogray.pipelines import resolve

        t = pq.read_table(sources.docs_path_for("x", 64))
        span_lists = []
        for doc in t["spans"].to_pylist():
            new_doc = []
            for s in doc:
                if s["kind"] == "geometry":
                    rings = wkb.decode_polygon_rings(bytes.fromhex(s["text"]))
                    # fake 'utm': degrees -> metres-ish scale
                    rings_m = [
                        (r - np.array([5.0, 58.0])) * 100_000.0 for r in rings
                    ]
                    s = {**s, "text": wkb.encode_polygon(rings_m).hex()}
                new_doc.append(s)
            span_lists.append(new_doc)
        utm_tbl = pa.table(
            {
                "doc_id": t["doc_id"],
                "spans": pa.array(
                    [
                        [dict(x) for x in doc]
                        for doc in span_lists
                    ],
                    spans_mod.SPANS_TYPE,
                ),
            }
        )
        ds = rd.from_arrow(utm_tbl)
        from rogray.config import ResolveConfig, TopologyConfig

        cfg = ResolveConfig(
            topology=TopologyConfig(
                snap_tolerance=1.0, utm=True, max_rows_in_each_cell=16, base_level=1
            )
        )
        df = resolve.resolve_overlap_gap(ds, cfg).to_pandas()
        cfg_deg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=16, base_level=1)
        )
        deg = resolve.resolve_overlap_gap(
            rd.read_parquet(sources.docs_path_for("x", 64)), cfg_deg
        ).to_pandas()
        # identical face structure: same count, same attribution multiset
        assert len(df) == len(deg)
        a1 = sorted((r["winner_pk"] if r["winner_pk"] == r["winner_pk"] else -1, tuple(r["other_intersect_id_list"])) for _, r in df.iterrows())
        a2 = sorted((r["winner_pk"] if r["winner_pk"] == r["winner_pk"] else -1, tuple(r["other_intersect_id_list"])) for _, r in deg.iterrows())
        assert a1 == a2
        # planar areas in m^2: 1 deg ~ 100 km here
        assert df["area"].sum() > 1e6


class TestGoldenCounts:
    """Pinned golden numbers for the seeded 64-polygon fixture — the
    engine's analogue of resolve_overlap_and_gap_expected (scalar counts
    asserted after a full run).  Any kernel change that alters these must
    be deliberate."""

    def test_expected_counts(self, docs64):
        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=16, base_level=1)
        )
        df = run_resolve(docs64, cfg)
        assert len(df) == 133
        # 126 (was 125 pre-even-odd): one face bounded by a self-crossing
        # bowtie input gains a >50% coverer under the even-odd coverage
        # rule, which is the deterministic, tiling-independent semantics
        # for invalid boundaries (see polygonize flood fill)
        assert int(df["winner_pk"].notna().sum()) == 126
        assert int(df["winner_pk"].isna().sum()) == 7
        assert int((~df["input_geo_is_valid"]).sum()) == 7
        # total geodesic area is stable to the snap grid
        assert abs(df["area"].sum() - 627_145_819) / 627_145_819 < 1e-3


class TestEdgeExtract:
    def test_edges_have_sources_and_lengths(self, docs64):
        from rogray.pipelines import detect

        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-5, max_rows_in_each_cell=16, base_level=1)
        )
        df = detect.extract_edges(docs64, cfg).to_pandas()
        assert len(df) > 200
        assert (df["length"] > 0).all()
        # every edge knows its source polygon(s)
        assert df["source_pks"].map(len).ge(1).all()
        # every input polygon contributes at least one edge
        seen = set()
        for pks in df["source_pks"]:
            seen.update(pks)
        assert len(seen) >= 60
    def test_shared_border_carries_both_sources(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from rogray import spans as spans_mod
        from rogray.geom import wkb
        from rogray.pipelines import detect

        sq1 = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
        sq2 = np.array([[2.0, 1.0], [3.0, 1.0], [3.0, 2.0], [2.0, 2.0]])
        docs = pa.table(
            {
                "doc_id": pa.array(["0", "1"]),
                "spans": spans_mod.make_spans_column(
                    [
                        [("geometry", wkb.encode_polygon([sq1]).hex(), "", 0)],
                        [("geometry", wkb.encode_polygon([sq2]).hex(), "", 0)],
                    ]
                ),
            }
        )
        cfg = ResolveConfig(
            topology=TopologyConfig(snap_tolerance=1e-3, max_rows_in_each_cell=16, base_level=0)
        )
        df = detect.extract_edges(rd.from_arrow(docs), cfg).to_pandas()
        shared = df[df["source_pks"].map(lambda p: list(p) == [0, 1])]
        assert len(shared) == 1  # the single coincident border edge
        assert abs(shared.iloc[0]["length"] - 1.0) < 1e-6
        # and its two sides are covered by the two different polygons
        assert {tuple(shared.iloc[0]["left_cov"]), tuple(shared.iloc[0]["right_cov"])} == {(0,), (1,)}
