"""Axis-aligned rectangle layer: the exact-SQL harness for the geometry engine.

Derives one rectangle per ``part`` row with pure integer arithmetic on
``p_partkey`` (the same formulas appear verbatim in the DuckDB oracles) and
drives the REAL geometry pipelines — Unwrap -> Route -> tile overlay ->
detect / coverage-depth / point-in-polygon — over a fixed integer frame
(origin (0,0), precision 1, planar).  On that frame every coordinate,
axis-parallel intersection and face area is exact integer math, so DuckDB
recomputes the results independently with interval arithmetic and unit-cell
enumeration:

- ``rect_overlap_pairs``: per unordered input pair, the total area of the
  >=2-covered faces attributed to the pair by the real find_overlap_gap
  report equals the rectangle intersection area
  ``max(0, min(x2)-max(x1)) * max(0, min(y2)-max(y1))``.
- ``rect_coverage_depth``: total area by coverage depth (>=1) equals the
  unit-cell coverage histogram (every 1x1 cell has uniform depth because
  all region boundaries are integer-aligned).
- ``rect_pip_join``: containment pairs from the real point_in_polygon_join
  operator; point coordinates are odd and rectangle edges even, so boundary
  semantics can never disagree.

This puts the overlap/gap report semantics of the reference
(find_overlap_and_gap-pre.sql:619-692) and the PIP join under a hard
value-hash oracle instead of hand-pinned goldens — the general polygon
fixtures exercise the same code paths with rows-only checks.

The engine's stable_pk keeps numeric doc_ids as their own value
(rogray/ids.py:19), so the pks in the reports ARE the part keys — no
back-map is needed and every stage streams.  Rectangle ids stay below
2^31 so int64 areas are exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import stages
from .config import GridConfig, ResolveConfig, TopologyConfig
from .geom import wkb
from .pipelines import detect
from .pipelines.resolve import ResolvePlan
from . import spans as spans_mod

# Frame: all rectangles live in [0, 2320]^2 <= span 4096 (power of two).
_SPAN = 4096.0
_GMOD = 48  # grid cells per axis before the key wraps (stacking = overlap)
_PITCH = 24  # half-pitch; x coordinates are doubled so edges are even

# Rectangle corner formulas — keep in exact sync with _RECT_CTE below.
#   gx = k % 48, gy = (k // 48) % 48
#   x1 = 2*(gx*24 + (k*7) % 11)    width  = 2*(6 + (k*5) % 17)
#   y1 = 2*(gy*24 + (k*11) % 13)   height = 2*(6 + (k*3) % 19)
_RECT_CTE = """
rect AS (
    SELECT p_partkey AS k,
           2 * ((p_partkey % 48) * 24 + (p_partkey * 7) % 11) AS x1,
           2 * (((p_partkey // 48) % 48) * 24 + (p_partkey * 11) % 13) AS y1,
           2 * ((p_partkey % 48) * 24 + (p_partkey * 7) % 11)
             + 2 * (6 + (p_partkey * 5) % 17) AS x2,
           2 * (((p_partkey // 48) % 48) * 24 + (p_partkey * 11) % 13)
             + 2 * (6 + (p_partkey * 3) % 19) AS y2
    FROM part
)"""

# Point formulas (one point per customer row) — odd coordinates, in-frame.
_POINT_CTE = """
pt AS (
    SELECT c_custkey AS point_id,
           2 * ((c_custkey * 13) % 1150) + 1 AS px,
           2 * ((c_custkey * 17) % 1150) + 1 AS py
    FROM customer
)"""


def rect_corners(k: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x1, y1, x2, y2) int64 arrays for part keys k (see _RECT_CTE)."""
    k = np.asarray(k, dtype=np.int64)
    gx = k % _GMOD
    gy = (k // _GMOD) % _GMOD
    x1 = 2 * (gx * _PITCH + (k * 7) % 11)
    y1 = 2 * (gy * _PITCH + (k * 11) % 13)
    x2 = x1 + 2 * (6 + (k * 5) % 17)
    y2 = y1 + 2 * (6 + (k * 3) % 19)
    return x1, y1, x2, y2


def point_coords(c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(px, py) odd int64 arrays for customer keys c (see _POINT_CTE)."""
    c = np.asarray(c, dtype=np.int64)
    return 2 * ((c * 13) % 1150) + 1, 2 * ((c * 17) % 1150) + 1


def _rects_to_docs(t: pa.Table) -> pa.Table:
    k = t["p_partkey"].to_numpy().astype(np.int64)
    x1, y1, x2, y2 = rect_corners(k)
    doc_ids, span_lists = [], []
    for i in range(len(k)):
        ring = np.array(
            [
                [x1[i], y1[i]],
                [x2[i], y1[i]],
                [x2[i], y2[i]],
                [x1[i], y2[i]],
            ],
            dtype=np.float64,
        )
        doc_ids.append(str(int(k[i])))
        span_lists.append(
            [(spans_mod.GEOMETRY_KIND, wkb.encode_polygon([ring]).hex(), "", 0)]
        )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": spans_mod.make_spans_column(span_lists),
        }
    )


def rect_docs(sf_dir: str):
    """part parquet -> span-wrapped rectangle document Dataset (streaming)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    return ds.map_batches(_rects_to_docs, batch_format="pyarrow")


def rect_cfg(max_rows: int = 400, base_level: int = 3) -> ResolveConfig:
    return ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1.0,
            utm=True,
            max_rows_in_each_cell=max_rows,
            base_level=base_level,
        )
    )


def rect_plan(docs, cfg: ResolveConfig) -> ResolvePlan:
    """Fixed integer frame (origin 0, span 4096, precision 1): snapping is
    the identity on the integer rectangle corners, so every downstream
    intersection and area is exact."""
    t = cfg.topology
    grid = GridConfig(origin_x=0.0, origin_y=0.0, span=_SPAN, precision=1.0)
    cut = stages.compute_cut(
        docs,
        grid,
        t.base_level,
        min(t.base_level + t.histogram_extra_levels, grid.max_level()),
        t.max_rows_in_each_cell,
    )
    return ResolvePlan(grid, cut, len(cut.leaves))


def rect_overlap_pairs(sf_dir: str):
    """Real find_overlap_gap over the rectangle layer -> per-pair area.

    Output: (id1, id2, overlap_px2) with id1 < id2 by rectangle id; exact
    int64 areas in snap-pixel^2.
    """
    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    rep = detect.find_overlap_gap(docs, cfg, plan)

    def only_overlap(t: pa.Table) -> pa.Table:
        # pk == rect id (numeric doc_id fast path); TileDetect already
        # emits pairs with id1 < id2
        t = t.filter(pc.equal(t["kind"], "overlap"))
        return t.select(["id1", "id2", "area"])

    agg = rep.map_batches(only_overlap, batch_format="pyarrow").groupby(
        ["id1", "id2"]
    ).sum("area")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id1": t["id1"].combine_chunks(),
                "id2": t["id2"].combine_chunks(),
                "overlap_px2": pc.round(t["sum(area)"]).cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rect_overlap_pairs_sql() -> str:
    return f"""
WITH {_RECT_CTE}
SELECT a.k AS id1, b.k AS id2,
       (LEAST(a.x2, b.x2) - GREATEST(a.x1, b.x1))
     * (LEAST(a.y2, b.y2) - GREATEST(a.y1, b.y1)) AS overlap_px2
FROM rect a JOIN rect b
  ON a.k < b.k
 AND a.x1 < b.x2 AND b.x1 < a.x2
 AND a.y1 < b.y2 AND b.y1 < a.y2
ORDER BY id1, id2
"""


def rect_coverage_depth(sf_dir: str):
    """Real coverage_depth pipeline -> (depth, area_px2) histogram."""
    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    rep = detect.coverage_depth(docs, cfg, plan)
    agg = rep.groupby("depth").sum("area")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "depth": t["depth"].combine_chunks(),
                "area_px2": pc.round(t["sum(area)"]).cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rect_coverage_depth_sql() -> str:
    return f"""
WITH {_RECT_CTE},
xs AS (
    SELECT y1, y2, unnest(generate_series(x1, x2 - 1)) AS cx FROM rect
),
cells AS (
    SELECT cx, unnest(generate_series(y1, y2 - 1)) AS cy FROM xs
),
cov AS (
    SELECT cx, cy, COUNT(*) AS depth FROM cells GROUP BY 1, 2
)
SELECT depth, COUNT(*)::BIGINT AS area_px2
FROM cov GROUP BY depth ORDER BY depth
"""


def rect_pip_join(sf_dir: str):
    """Real point_in_polygon_join: customer-derived points x rectangles."""
    import ray.data as rd

    from . import spatial_query

    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)

    def points(t: pa.Table) -> pa.Table:
        c = t["c_custkey"].to_numpy().astype(np.int64)
        px, py = point_coords(c)
        return pa.table(
            {
                "point_id": pa.array(c, pa.int64()),
                "x": pa.array(px.astype(np.float64), pa.float64()),
                "y": pa.array(py.astype(np.float64), pa.float64()),
            }
        )

    pts = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]).map_batches(
        points, batch_format="pyarrow"
    )
    res = spatial_query.point_in_polygon_join(pts, docs, cfg, plan)

    def rename(t: pa.Table) -> pa.Table:
        # pk == rect id (numeric doc_id fast path)
        return pa.table(
            {
                "point_id": t["point_id"].combine_chunks(),
                "rect_id": t["pk"].combine_chunks(),
            }
        )

    return res.map_batches(rename, batch_format="pyarrow")


def rect_resolve_winner_areas(sf_dir: str):
    """Real resolve_overlap_gap (route -> overlay -> stitch -> finalize ->
    attribution) over the rectangle layer -> per-winner resolved area.

    Attribution (JT7, cell.sql:833-873): every covering input owns 100% of
    an atomic face, so the pk-ascending tiebreak picks the minimum rect id
    — which DuckDB recomputes per unit cell as MIN(k).  An exact value
    match here pins the whole flagship pipeline, stitch and finalize
    included.
    """
    from .pipelines import resolve

    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    res = resolve.resolve_overlap_gap(docs, cfg, plan)

    def rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["winner_pk"], 0))
        return pa.table(
            {
                "winner_id": t["winner_pk"].combine_chunks(),
                "area": t["area"].combine_chunks(),
            }
        )

    agg = res.map_batches(rows, batch_format="pyarrow").groupby("winner_id").sum("area")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "winner_id": t["winner_id"].combine_chunks(),
                "area_px2": pc.round(t["sum(area)"]).cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rect_resolve_winner_areas_sql() -> str:
    return f"""
WITH {_RECT_CTE},
xs AS (
    SELECT k, y1, y2, unnest(generate_series(x1, x2 - 1)) AS cx FROM rect
),
cells AS (
    SELECT k, cx, unnest(generate_series(y1, y2 - 1)) AS cy FROM xs
),
win AS (
    SELECT cx, cy, MIN(k) AS winner_id FROM cells GROUP BY 1, 2
)
SELECT winner_id, COUNT(*)::BIGINT AS area_px2
FROM win GROUP BY winner_id ORDER BY winner_id
"""


def rect_resolve_cov_areas(sf_dir: str):
    """Per-coverage-set resolved area: pins winner AND the
    other_intersect_id_list of every face (cell.sql:833-873's
    _other_intersect_id_list) against DuckDB's per-cell covering set."""
    from .pipelines import resolve

    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    res = resolve.resolve_overlap_gap(docs, cfg, plan)

    def rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["winner_pk"], 0))
        w = t["winner_pk"].to_numpy()
        others = t["other_intersect_id_list"].to_pylist()
        keys = [
            ",".join(str(v) for v in sorted([int(w[i])] + list(others[i])))
            for i in range(len(t))
        ]
        return pa.table(
            {
                "cov_key": pa.array(keys, pa.string()),
                "area": t["area"].combine_chunks(),
            }
        )

    agg = res.map_batches(rows, batch_format="pyarrow").groupby("cov_key").sum("area")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cov_key": t["cov_key"].combine_chunks(),
                "area_px2": pc.round(t["sum(area)"]).cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rect_resolve_cov_areas_sql() -> str:
    return f"""
WITH {_RECT_CTE},
xs AS (
    SELECT k, y1, y2, unnest(generate_series(x1, x2 - 1)) AS cx FROM rect
),
cells AS (
    SELECT k, cx, unnest(generate_series(y1, y2 - 1)) AS cy FROM xs
),
cov AS (
    SELECT cx, cy, STRING_AGG(CAST(k AS VARCHAR), ',' ORDER BY k) AS cov_key
    FROM cells GROUP BY 1, 2
)
SELECT cov_key, COUNT(*)::BIGINT AS area_px2
FROM cov GROUP BY cov_key ORDER BY cov_key
"""


def rect_edge_pairs_len(sf_dir: str):
    """Real extract_edges (snap-round noding + polygonize adjacency labels)
    -> total boundary length between each unordered pair of coverage
    regions.

    Every noded segment separates a left and a right coverage set; on the
    integer rectangle frame each unit of its length is also a unit-cell
    4-neighbour pair, so DuckDB recomputes the same totals by counting
    neighbouring cells whose covering sets differ (missing cell = gap '').
    Segments with equal sets on both sides (tile borders crossing a region
    interior, frame edges inside gaps) separate nothing and are excluded on
    both sides of the comparison.  This pins the edge_attributes path
    (cell.sql:390-416 re-link semantics) to an exact value check.
    """
    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    edges = detect.extract_edges(docs, cfg, plan)

    def rows(t: pa.Table) -> pa.Table:
        lc = t["left_cov"].to_pylist()
        rc = t["right_cov"].to_pylist()
        ln = t["length"].to_numpy()
        cov_a, cov_b, length = [], [], []
        for i in range(len(t)):
            ka = ",".join(str(v) for v in sorted(lc[i]))
            kb = ",".join(str(v) for v in sorted(rc[i]))
            if ka == kb:
                continue
            if ka > kb:
                ka, kb = kb, ka
            cov_a.append(ka)
            cov_b.append(kb)
            length.append(float(ln[i]))
        return pa.table(
            {
                "cov_a": pa.array(cov_a, pa.string()),
                "cov_b": pa.array(cov_b, pa.string()),
                "length": pa.array(length, pa.float64()),
            }
        )

    agg = edges.map_batches(rows, batch_format="pyarrow").groupby(
        ["cov_a", "cov_b"]
    ).sum("length")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cov_a": t["cov_a"].combine_chunks(),
                "cov_b": t["cov_b"].combine_chunks(),
                "len_px": pc.round(t["sum(length)"]).cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rect_edge_pairs_len_sql() -> str:
    # Unit-cell covering sets, then count 4-neighbour pairs with different
    # sets; a missing neighbour is the gap region ''.  Each vertical cell
    # pair is one unit of horizontal-boundary length and vice versa; LEFT
    # JOIN a->right plus the reverse empty-left probe covers cell/empty
    # frontiers exactly once per unordered pair.
    return f"""
WITH {_RECT_CTE},
xs AS (
    SELECT k, y1, y2, unnest(generate_series(x1, x2 - 1)) AS cx FROM rect
),
cells AS (
    SELECT k, cx, unnest(generate_series(y1, y2 - 1)) AS cy FROM xs
),
cov AS (
    SELECT cx, cy, STRING_AGG(CAST(k AS VARCHAR), ',' ORDER BY k) AS ck
    FROM cells GROUP BY 1, 2
),
nbr AS (
    SELECT a.ck AS ka, COALESCE(b.ck, '') AS kb
    FROM cov a LEFT JOIN cov b ON b.cx = a.cx + 1 AND b.cy = a.cy
    UNION ALL
    SELECT COALESCE(a.ck, '') AS ka, b.ck AS kb
    FROM cov b LEFT JOIN cov a ON a.cx = b.cx - 1 AND a.cy = b.cy
    WHERE a.ck IS NULL
    UNION ALL
    SELECT a.ck AS ka, COALESCE(b.ck, '') AS kb
    FROM cov a LEFT JOIN cov b ON b.cx = a.cx AND b.cy = a.cy + 1
    UNION ALL
    SELECT COALESCE(a.ck, '') AS ka, b.ck AS kb
    FROM cov b LEFT JOIN cov a ON a.cx = b.cx AND a.cy = b.cy - 1
    WHERE a.ck IS NULL
)
SELECT LEAST(ka, kb) AS cov_a, GREATEST(ka, kb) AS cov_b,
       COUNT(*)::BIGINT AS len_px
FROM nbr
WHERE ka != kb
GROUP BY 1, 2
ORDER BY 1, 2
"""


def rect_pip_join_sql() -> str:
    return f"""
WITH {_RECT_CTE},
{_POINT_CTE}
SELECT pt.point_id, rect.k AS rect_id
FROM pt JOIN rect
  ON pt.px > rect.x1 AND pt.px < rect.x2
 AND pt.py > rect.y1 AND pt.py < rect.y2
ORDER BY 1, 2
"""


def rect_rasterize_runs(sf_dir: str):
    """Real resolve pipeline -> vector->raster scanline rasterization.

    The resolved winner mosaic is rasterized to merged RLE pixel runs
    (winner_id, cy, x0, x1); DuckDB recomputes the identical runs by
    unit-cell enumeration + gaps-and-islands over the per-cell MIN(k)
    winner.  An exact match pins the even-odd scanline kernel, the px
    frame conversion and the island merge against the resolved topology.
    """
    from . import raster
    from .pipelines import resolve

    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    res = resolve.resolve_overlap_gap(docs, cfg, plan)

    def covered_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["winner_pk"], 0))

    covered = res.map_batches(covered_only, batch_format="pyarrow")
    runs = raster.rasterize_faces(covered, plan.grid, zone_col="winner_pk")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "winner_id": t["zone"].combine_chunks(),
                "cy": t["cy"].combine_chunks(),
                "x0": t["x0"].combine_chunks(),
                "x1": t["x1"].combine_chunks(),
            }
        )

    return runs.map_batches(rename, batch_format="pyarrow")


def rect_rasterize_runs_sql() -> str:
    return f"""
WITH {_RECT_CTE},
xs AS (
    SELECT k, y1, y2, unnest(generate_series(x1, x2 - 1)) AS cx FROM rect
),
cells AS (
    SELECT k, cx, unnest(generate_series(y1, y2 - 1)) AS cy FROM xs
),
win AS (
    SELECT cx, cy, MIN(k) AS winner_id FROM cells GROUP BY 1, 2
),
isl AS (
    SELECT winner_id, cy, cx,
           cx - ROW_NUMBER() OVER (PARTITION BY winner_id, cy ORDER BY cx) AS grp
    FROM win
)
SELECT winner_id, cy, MIN(cx) AS x0, MAX(cx) + 1 AS x1
FROM isl GROUP BY winner_id, cy, grp
ORDER BY 1, 2, 3
"""


def rect_vectorize_area(sf_dir: str):
    """raster->vector round-trip under an exact oracle.

    The resolved winner mosaic is rasterized to RLE runs (same path as
    rect_rasterize_runs), each zone's binary mask is rebuilt from its runs
    and vectorized with the marching-squares edge-cancel + polygonize
    kernel (raster.vectorize_mask); the polygons' exact integer shoelace
    area (shells minus holes) must equal the zone's pixel count, which
    DuckDB recomputes by unit-cell enumeration.  Pins edge cancellation,
    polygonization, hole nesting and orientation in one integer identity
    (reference analogue: get_face_geo / C9, cell.sql:833-873 builds faces
    from edges the same way).
    """
    from . import raster
    from .geom import core
    from .pipelines import resolve

    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    res = resolve.resolve_overlap_gap(docs, cfg, plan)

    def covered_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["winner_pk"], 0))

    runs = raster.rasterize_faces(
        res.map_batches(covered_only, batch_format="pyarrow"),
        plan.grid,
        zone_col="winner_pk",
    )

    def per_zone(g: pa.Table) -> pa.Table:
        zone = int(g["zone"][0].as_py())
        cy = g["cy"].to_numpy()
        x0 = g["x0"].to_numpy()
        x1 = g["x1"].to_numpy()
        ymin = int(cy.min())
        xmin = int(x0.min())
        mask = np.zeros((int(cy.max()) - ymin + 1, int(x1.max()) - xmin), bool)
        for yy, a, b in zip(cy, x0, x1):
            mask[int(yy) - ymin, int(a) - xmin : int(b) - xmin] = True
        area2 = 0
        for rings in raster.vectorize_mask(mask, origin_px=(xmin, ymin), cell_px=1):
            area2 += abs(core.ring_signed_area2(rings[0]))
            for hole in rings[1:]:
                area2 -= abs(core.ring_signed_area2(hole))
        assert area2 % 2 == 0
        return pa.table(
            {
                "winner_id": pa.array([zone], pa.int64()),
                "vec_area": pa.array([area2 // 2], pa.int64()),
            }
        )

    return stages.gated_groupby(None, runs, "zone", per_zone)


def rect_vectorize_area_sql() -> str:
    return f"""
WITH {_RECT_CTE},
xs AS (
    SELECT k, y1, y2, unnest(generate_series(x1, x2 - 1)) AS cx FROM rect
),
cells AS (
    SELECT k, cx, unnest(generate_series(y1, y2 - 1)) AS cy FROM xs
),
win AS (
    SELECT cx, cy, MIN(k) AS winner_id FROM cells GROUP BY 1, 2
)
SELECT winner_id, COUNT(*) AS vec_area FROM win GROUP BY 1 ORDER BY 1
"""


def rect_zonal_stats(sf_dir: str):
    """Raster->vector zonal statistics over the synthetic raster field.

    Each rectangle zone aggregates the deterministic per-pixel value
    (7x+13y) mod 97 over its own covered cells (overlap allowed — zones
    are independent); DuckDB recomputes by cell enumeration with the
    same formula.  Pins the scanline fill + ragged value fold exactly.
    """
    from . import raster

    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    stats = raster.zonal_stats(docs, cfg, plan)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zone_id": pc.cast(t["zone_id"], pa.int64()),
                "n_px": t["n_px"].combine_chunks(),
                "sum_v": t["sum_v"].combine_chunks(),
                "min_v": t["min_v"].combine_chunks(),
                "max_v": t["max_v"].combine_chunks(),
            }
        )

    return stats.map_batches(finish, batch_format="pyarrow")


def rect_zonal_stats_sql() -> str:
    return f"""
WITH {_RECT_CTE},
xs AS (
    SELECT k, y1, y2, unnest(generate_series(x1, x2 - 1)) AS cx FROM rect
),
cells AS (
    SELECT k, cx, unnest(generate_series(y1, y2 - 1)) AS cy FROM xs
)
SELECT k AS zone_id, COUNT(*)::BIGINT AS n_px,
       SUM((7 * cx + 13 * cy) % 97)::BIGINT AS sum_v,
       MIN((7 * cx + 13 * cy) % 97)::BIGINT AS min_v,
       MAX((7 * cx + 13 * cy) % 97)::BIGINT AS max_v
FROM cells GROUP BY k ORDER BY k
"""


# Layer-B rectangle formulas (cross-layer join oracle) — derived from the
# same part keys with different multipliers so the two layers shear
# against each other; same frame, all edges even and < _SPAN.
_RECT_B_CTE = """
rectb AS (
    SELECT p_partkey AS k,
           2 * (((p_partkey * 29) % 48) * 24 + (p_partkey * 3) % 13) AS x1,
           2 * (((p_partkey * 17) % 48) * 24 + (p_partkey * 5) % 11) AS y1,
           2 * (((p_partkey * 29) % 48) * 24 + (p_partkey * 3) % 13)
             + 2 * (5 + (p_partkey * 7) % 19) AS x2,
           2 * (((p_partkey * 17) % 48) * 24 + (p_partkey * 5) % 11)
             + 2 * (5 + (p_partkey * 11) % 17) AS y2
    FROM part
)"""


def rect_b_corners(k: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x1, y1, x2, y2) int64 arrays for layer-B keys (see _RECT_B_CTE)."""
    k = np.asarray(k, dtype=np.int64)
    x1 = 2 * (((k * 29) % _GMOD) * _PITCH + (k * 3) % 13)
    y1 = 2 * (((k * 17) % _GMOD) * _PITCH + (k * 5) % 11)
    x2 = x1 + 2 * (5 + (k * 7) % 19)
    y2 = y1 + 2 * (5 + (k * 11) % 17)
    return x1, y1, x2, y2


def _rects_b_to_docs(t: pa.Table) -> pa.Table:
    k = t["p_partkey"].to_numpy().astype(np.int64)
    x1, y1, x2, y2 = rect_b_corners(k)
    doc_ids, span_lists = [], []
    for i in range(len(k)):
        ring = np.array(
            [[x1[i], y1[i]], [x2[i], y1[i]], [x2[i], y2[i]], [x1[i], y2[i]]],
            dtype=np.float64,
        )
        doc_ids.append(str(int(k[i])))
        span_lists.append(
            [(spans_mod.GEOMETRY_KIND, wkb.encode_polygon([ring]).hex(), "", 0)]
        )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": spans_mod.make_spans_column(span_lists),
        }
    )


def rect_b_docs(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    return ds.map_batches(_rects_b_to_docs, batch_format="pyarrow")


def rect_cross_layer_join(sf_dir: str):
    """Real layer_intersection_join: layer A x layer B pairwise areas.

    Both layers share part keys but different corner formulas (including
    identical doc_ids across layers — the row-index labeling inside the
    tile worker must keep them apart); DuckDB recomputes every pair by
    interval arithmetic.  Exact match pins the two-layer routing, the
    per-tile arrangement under mixed coverage, and the cross-tile
    additivity of pair areas.
    """
    from . import spatial_query

    a = rect_docs(sf_dir)
    b = rect_b_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(a.union(b), cfg)
    res = spatial_query.layer_intersection_join(a, b, cfg, plan)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": t["pk_a"].combine_chunks(),
                "id_b": t["pk_b"].combine_chunks(),
                "overlap_px2": pc.round(t["sum(area)"]).cast(pa.int64()),
            }
        )

    return res.map_batches(finish, batch_format="pyarrow")


def rect_cross_layer_join_sql() -> str:
    return f"""
WITH {_RECT_CTE},
{_RECT_B_CTE}
SELECT a.k AS id_a, b.k AS id_b,
       (LEAST(a.x2, b.x2) - GREATEST(a.x1, b.x1))
     * (LEAST(a.y2, b.y2) - GREATEST(a.y1, b.y1)) AS overlap_px2
FROM rect a JOIN rectb b
  ON a.x1 < b.x2 AND b.x1 < a.x2
 AND a.y1 < b.y2 AND b.y1 < a.y2
ORDER BY 1, 2
"""


def rect_cell_cover(sf_dir: str, level: int = 9):
    """Real cell_cover (quadkey polyfill) over the rectangle layer.

    Cell size at level 9 on the 4096-px frame is 8 px, so each rectangle
    covers a handful of cells per axis; DuckDB recomputes the covering
    cell ranges with integer interval arithmetic on the cell centers.
    """
    from . import spatial_query

    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    res = spatial_query.cell_cover(docs, level, cfg, plan)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_key": pc.cast(t["doc_id"], pa.int64()),
                "cx": t["cx"].combine_chunks(),
                "cy": t["cy"].combine_chunks(),
            }
        )

    return res.map_batches(finish, batch_format="pyarrow")


def rect_cell_cover_sql(level: int = 9) -> str:
    s = int(_SPAN) >> level
    h = s // 2
    # cell center c = cx*s + h covered iff x1 <= c < x2 (half-open, the
    # same convention the scanline kernel uses on every axis)
    return f"""
WITH {_RECT_CTE},
xr AS (
    SELECT k, y1, y2,
           unnest(generate_series((x1 - {h} + {s} - 1) // {s},
                                  (x2 - {h} - 1) // {s})) AS cx
    FROM rect
)
SELECT k AS doc_key, cx,
       unnest(generate_series((y1 - {h} + {s} - 1) // {s},
                              (y2 - {h} - 1) // {s})) AS cy
FROM xr
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# companion line layer: one horizontal polyline per part row.  Odd y
# coordinates + even rectangle edges mean a line is never collinear with a
# rectangle boundary or a tile border, so the length of line k inside
# rectangle r is the pure interval overlap DuckDB computes below — the
# exact-SQL oracle for the line-layer noding path (M1/M2), including
# DANGLING pieces (line ends strictly inside a region), which PostGIS
# topology keeps as edges and extract_edges recovers after polygonize
# prunes them.
# ---------------------------------------------------------------------------

_LINE_BASE = 10_000_000

# Line formulas — keep in exact sync with _LINE_CTE below.
#   y  = 2*((k*13) % 1100) + 1   (odd)
#   x1 = 2*((k*17) % 1000)       (even)
#   x2 = x1 + 2*(10 + (k*7) % 300)
_LINE_CTE = """
line AS (
    SELECT p_partkey AS k,
           2 * ((p_partkey * 17) % 1000) AS x1,
           2 * ((p_partkey * 13) % 1100) + 1 AS y,
           2 * ((p_partkey * 17) % 1000) + 2 * (10 + (p_partkey * 7) % 300) AS x2
    FROM part
)
"""


def line_coords(k: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    x1 = 2 * ((k * 17) % 1000)
    y = 2 * ((k * 13) % 1100) + 1
    x2 = x1 + 2 * (10 + (k * 7) % 300)
    return x1, y, x2


def _lines_to_docs(t: pa.Table) -> pa.Table:
    k = t["p_partkey"].to_numpy().astype(np.int64)
    x1, y, x2 = line_coords(k)
    doc_ids, span_lists = [], []
    for i in range(len(k)):
        pts = np.array([[x1[i], y[i]], [x2[i], y[i]]], dtype=np.float64)
        doc_ids.append(str(int(k[i]) + _LINE_BASE))
        span_lists.append(
            [(spans_mod.GEOMETRY_KIND, wkb.encode_linestring(pts).hex(), "", 0)]
        )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": spans_mod.make_spans_column(span_lists),
        }
    )


def rect_line_docs(sf_dir: str):
    """Rectangles + companion lines as one span-document Dataset."""
    import ray.data as rd

    lines = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"]).map_batches(
        _lines_to_docs, batch_format="pyarrow"
    )
    return rect_docs(sf_dir).union(lines)


def rect_line_cover_len(sf_dir: str):
    """Length of each line inside each rectangle, via the REAL noded edge
    listing: noded line pieces inherit the coverage of the region they lie
    in (left cover == right cover off-boundary), so summing piece lengths
    per (line, covering rect) reproduces the interval overlap exactly."""
    docs = rect_line_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)
    edges = detect.extract_edges(docs, cfg, plan)

    def explode(t: pa.Table) -> pa.Table:
        lk, rk, ln = [], [], []
        srcs = t["source_pks"].to_pylist()
        covs = t["left_cov"].to_pylist()
        lens = t["length"].to_numpy()
        for i in range(len(t)):
            line_pks = [p for p in srcs[i] if p >= _LINE_BASE]
            if not line_pks:
                continue
            rect_pks = [c for c in (covs[i] or []) if 0 <= c < _LINE_BASE]
            for lp in line_pks:
                for rp in rect_pks:
                    lk.append(lp - _LINE_BASE)
                    rk.append(rp)
                    ln.append(float(lens[i]))
        return pa.table(
            {
                "line_k": pa.array(lk, pa.int64()),
                "rect_k": pa.array(rk, pa.int64()),
                "len": pa.array(ln, pa.float64()),
            }
        )

    agg = edges.map_batches(explode, batch_format="pyarrow").groupby(
        ["line_k", "rect_k"]
    ).sum("len")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "line_k": t["line_k"].combine_chunks(),
                "rect_k": t["rect_k"].combine_chunks(),
                "cov_len": pc.round(t["sum(len)"]).cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rect_line_cover_len_sql() -> str:
    return f"""
WITH {_RECT_CTE},
{_LINE_CTE.strip().rstrip()}
SELECT l.k AS line_k, r.k AS rect_k,
       LEAST(l.x2, r.x2) - GREATEST(l.x1, r.x1) AS cov_len
FROM line l JOIN rect r
  ON l.y > r.y1 AND l.y < r.y2
 AND LEAST(l.x2, r.x2) > GREATEST(l.x1, r.x1)
ORDER BY 1, 2
"""


def rect_nearest_join(sf_dir: str):
    """Real nearest_geom_join: each customer point's nearest rectangle by
    exact boundary distance (0 inside), cell-ring expansion at level 7.
    Output (point_id, nearest_pk, d2_px); d2 on this integer frame is an
    exact int64 both here and in the SQL oracle; ties break by rect id."""
    import ray.data as rd

    from . import spatial_query

    docs = rect_docs(sf_dir)
    cfg = rect_cfg()
    plan = rect_plan(docs, cfg)

    def points(t: pa.Table) -> pa.Table:
        c = t["c_custkey"].to_numpy().astype(np.int64)
        px, py = point_coords(c)
        return pa.table(
            {
                "point_id": pa.array(c, pa.int64()),
                "x": pa.array(px.astype(np.float64), pa.float64()),
                "y": pa.array(py.astype(np.float64), pa.float64()),
            }
        )

    pts = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]).map_batches(
        points, batch_format="pyarrow"
    )
    res = spatial_query.nearest_geom_join(pts, docs, cfg, plan, level=7)

    def finish(t: pa.Table) -> pa.Table:
        assert pc.all(t["complete"]).as_py(), "nearest search did not converge"
        return pa.table(
            {
                "point_id": t["point_id"].combine_chunks(),
                "nearest_pk": t["nearest_pk"].combine_chunks(),
                "d2_px": t["d2_px"].combine_chunks(),
            }
        )

    return res.map_batches(finish, batch_format="pyarrow")


def rect_nearest_join_sql() -> str:
    return f"""
WITH {_RECT_CTE},
{_POINT_CTE.strip()}
SELECT point_id, nearest_pk, d2_px FROM (
    -- d2 via integer multiplication so the oracle returns BIGINT like the
    -- engine's int64 d2_px (POWER() would return DOUBLE and hash-mismatch
    -- under a dtype-strict comparer).
    SELECT point_id, nearest_pk, d2_px,
           ROW_NUMBER() OVER (
               PARTITION BY point_id ORDER BY d2_px, nearest_pk
           ) AS rn
    FROM (
        SELECT p.point_id, r.k AS nearest_pk,
               GREATEST(r.x1 - p.px, p.px - r.x2, 0) * GREATEST(r.x1 - p.px, p.px - r.x2, 0)
             + GREATEST(r.y1 - p.py, p.py - r.y2, 0) * GREATEST(r.y1 - p.py, p.py - r.y2, 0) AS d2_px
        FROM pt p CROSS JOIN rect r
    )
) WHERE rn = 1
ORDER BY point_id
"""
