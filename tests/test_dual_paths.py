"""Table-driven dual-path coverage: every gated call-site family must be
differential-tested.

Every operator that consults the driver-bounded fan-out gates
(stages.small_input_refs / small_group_fanout / gated_groupby) has TWO
execution paths: the plain-task wave below the gate and the streaming
Ray Data path above it.  This module enforces, in one place, that
1. the set of gated families is KNOWN — an AST scan over rogray/
   enumerates every top-level function that calls a gate, and the scan
   must equal the FAMILY_CHECKS registry (a new gated operator fails the
   scan test until it registers a differential check), and
2. every family's registered check passes — gates forced OFF
   (stages.SMALL_FANOUT_LIMIT = 0, the 100 TB behavior) must produce the
   same result as gates on (the test-scale behavior).
"""

from __future__ import annotations

import ast
import pathlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
ROOT = pathlib.Path("/root/repo")
GATE_FNS = {"small_group_fanout", "small_input_refs", "gated_groupby"}


def scan_gated_families() -> set[str]:
    """Top-level rogray functions (by file) whose body — including nested
    defs — calls one of the gate helpers."""
    fams = set()
    for p in sorted((ROOT / "rogray").rglob("*.py")):
        tree = ast.parse(p.read_text())
        for node in tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for c in ast.walk(node):
                if isinstance(c, ast.Call):
                    name = getattr(c.func, "attr", None) or getattr(c.func, "id", None)
                    if name in GATE_FNS:
                        fams.add(f"{p.relative_to(ROOT)}:{node.name}")
                        break
    # the gate helpers themselves are not operator families
    fams = {
        f
        for f in fams
        if not f.startswith("rogray/stages.py:")
    }
    return fams


# ---------------------------------------------------------------------------
# custom differential checks (families not reachable through queries())
# ---------------------------------------------------------------------------


def _dissolve_fixture():
    from rogray import stages

    def rect(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.int64)

    def face(rings, pk):
        a2 = 0
        for k, r in enumerate(rings):
            x, y = r[:, 0].astype(float), r[:, 1].astype(float)
            s = np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
            a2 += abs(s) if k == 0 else -abs(s)
        return {
            "tile": 0, "stitch_key": "g", "kind": 0,
            "rings": stages.pack_rings(list(rings)),
            "cov": [pk], "winner_pk": pk, "others": [],
            "is_valid": True, "area2": int(round(a2)),
        }

    big = np.array(
        [[0, 0], [100, 0], [100, 40], [100, 60], [100, 100], [10, 100], [0, 100]],
        dtype=np.int64,
    )
    rows = [face([big], 1)]
    for i in range(8):
        x0 = 100 + 2 * i
        rows.append(face([rect(x0, 40, x0 + 2, 60)], 10 + i))
    rows.append(face([rect(200, 200, 205, 205)], 30))
    rows.append(face([rect(0, 100, 10, 103)], 40))
    return pa.Table.from_pylist(rows, schema=stages.FACE_SCHEMA)


def check_dissolve_small_faces():
    import ray.data as rd

    from rogray.config import GridConfig
    from rogray.pipelines.resolve import dissolve_small_faces

    grid = GridConfig(origin_x=0.0, origin_y=0.0, span=1024.0, precision=1.0)
    tbl = _dissolve_fixture()

    def run():
        out = dissolve_small_faces(
            rd.from_arrow(tbl), grid, utm=True, min_area=50.0
        ).to_pandas()
        out["cov"] = out["cov"].map(tuple)
        out["others"] = out["others"].map(tuple)
        out["rings"] = out["rings"].map(bytes)
        return out.sort_values(["winner_pk", "area2", "rings"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(_with_gates(run, True), _with_gates(run, False))


def check_resolve_resumable():
    import tempfile

    import __ray_entry__ as entry
    from rogray.pipelines import resolve

    def run():
        with tempfile.TemporaryDirectory() as d:
            res = resolve.resolve_overlap_gap_resumable(
                entry._geo_docs(SF), d, entry._geo_cfg()
            )
            df = res.select_columns(
                ["doc_id", "winner_pk", "input_geo_is_valid", "area"]
            ).to_pandas()
        return df.sort_values(["doc_id", "winner_pk", "area"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(_with_gates(run, True), _with_gates(run, False))


# ---------------------------------------------------------------------------
# the registry: every scanned family -> a queries() entry name whose
# gates-on/gates-off outputs are compared, or a callable check
# ---------------------------------------------------------------------------

FAMILY_CHECKS: dict[str, object] = {
    "rogray/clusters.py:duplicate_clusters": "dedup_clusters",
    "rogray/corpus.py:bigram_pmi": "bigram_pmi",
    "rogray/corpus.py:inverted_index_stats": "inverted_index_stats",
    "rogray/corpus.py:source_distinct_terms": "source_distinct_terms",
    "rogray/corpus.py:source_distinct_terms_hll": "source_distinct_terms_hll",
    "rogray/corpus.py:tfidf_top_terms": "tfidf_top_terms",
    "rogray/corpus.py:unigram_logprob": "unigram_logprob",
    "rogray/dedup.py:_dedup_pairs": "dedup_minhash_lsh",
    "rogray/dedup.py:embedding_neardup_exact": "dedup_embedding_exact",
    "rogray/dedup.py:embedding_neardup_pairs": "dedup_embedding_lsh",
    "rogray/dedup.py:exact_dedup": "dedup_exact",
    "rogray/dedup.py:minhash_lsh_pairs": "dedup_minhash_lsh",
    "rogray/dedup.py:ngram_jaccard_pairs": "dedup_ngram_jaccard",
    "rogray/dedup.py:simhash_pairs": "dedup_simhash",
    "rogray/dedup.py:substring_dedup_pairs": "dedup_substring",
    "rogray/joins.py:bucket_join": "shipping_priority",
    "rogray/pipelines/detect.py:coverage_depth": "rect_coverage_depth",
    "rogray/pipelines/detect.py:extract_edges": "rect_edge_pairs_len",
    "rogray/pipelines/detect.py:find_overlap_gap": "rect_overlap_pairs",
    "rogray/pipelines/resolve.py:dissolve_small_faces": check_dissolve_small_faces,
    "rogray/pipelines/resolve.py:face_relation_rows": "face_attributes",
    "rogray/pipelines/resolve.py:resolve_overlap_gap": "rect_resolve_winner_areas",
    "rogray/pipelines/resolve.py:resolve_overlap_gap_resumable": check_resolve_resumable,
    "rogray/pipelines/resolve.py:stitched_faces": "rect_resolve_cov_areas",
    "rogray/raster.py:rasterize_faces": "rect_rasterize_runs",
    "rogray/raster.py:zonal_stats": "rect_zonal_stats",
    "rogray/rectlayer.py:rect_vectorize_area": "rect_vectorize_area",
    "rogray/relational.py:events_asof_join": "events_asof_join",
    "rogray/relational.py:events_sessionize": "events_sessionize",
    "rogray/relational.py:events_window_stats": "events_window_stats",
    "rogray/relational.py:orders_price_quantiles": "orders_price_quantiles",
    "rogray/relational.py:pricing_summary": "pricing_summary",
    "rogray/relational.py:top_parts_per_brand": "top_parts_per_brand",
    "rogray/similarity.py:brute_topk": "ann_brute_topk",
    "rogray/similarity.py:ivf_topk": "ann_ivf_topk",
    "rogray/spatial_query.py:cell_cover": "rect_cell_cover",
    "rogray/spatial_query.py:knn_points": "knn_cell_expansion",
    "rogray/spatial_query.py:layer_intersection_join": "rect_cross_layer_join",
    "rogray/spatial_query.py:nearest_geom_join": "rect_nearest_join",
    "rogray/spatial_query.py:point_in_polygon_join": "rect_pip_join",
}


def test_every_gated_family_is_registered():
    scanned = scan_gated_families()
    missing = scanned - set(FAMILY_CHECKS)
    stale = set(FAMILY_CHECKS) - scanned
    assert not missing, (
        f"gated call sites with NO registered differential check: {sorted(missing)} "
        "— add a FAMILY_CHECKS entry (a queries() name or a callable)"
    )
    assert not stale, f"registry entries no longer gated: {sorted(stale)}"


# ---------------------------------------------------------------------------
# the differential runner
# ---------------------------------------------------------------------------

_CACHE: dict[tuple[str, bool], pd.DataFrame] = {}


def _with_gates(fn, gates_on: bool):
    from rogray import stages

    prev = stages.SMALL_FANOUT_LIMIT
    stages.SMALL_FANOUT_LIMIT = prev if gates_on else 0
    try:
        return fn()
    finally:
        stages.SMALL_FANOUT_LIMIT = prev


def _canon(obj) -> pd.DataFrame:
    if not isinstance(obj, pd.DataFrame):
        obj = obj.to_pandas()
    df = obj[sorted(obj.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
            if df[c].map(lambda v: isinstance(v, (bytes, bytearray))).any():
                df[c] = df[c].map(lambda v: bytes(v) if v is not None else v)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run_query(name: str, gates_on: bool) -> pd.DataFrame:
    key = (name, gates_on)
    if key not in _CACHE:
        import __ray_entry__ as entry

        fn = entry.queries()[name]
        _CACHE[key] = _canon(_with_gates(lambda: fn(SF), gates_on))
    return _CACHE[key]


@pytest.mark.parametrize("family", sorted(FAMILY_CHECKS))
def test_gated_family_differential(family, ray_session):
    check = FAMILY_CHECKS[family]
    if callable(check):
        check()
        return
    on = _run_query(check, True)
    off = _run_query(check, False)
    pd.testing.assert_frame_equal(on, off, check_dtype=False)
