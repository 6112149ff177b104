"""Spatial query operators: point-in-polygon join and kNN over the tile grid.

Both reuse the content-balanced cut: queries and data shuffle once by tile
key, all geometry predicates run exactly on the snap grid inside per-tile
groups.  kNN candidate recall uses cell expansion (the quadkey analogue of
H3 k-ring): each query point is routed to every leaf tile intersecting its
radius-expanded bbox, so neighbours across tile borders are never missed
as long as the true kth distance <= radius (callers widen the radius and
re-run for the rare under-covered points — reported via the `complete`
flag).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import stages
from .config import GridConfig, ResolveConfig
from .rayctx import hash_shuffled
from .geom import core
from .tiling import quadkey
from .pipelines.resolve import ResolvePlan, prepare


def _snap_points(t: pa.Table, grid: GridConfig) -> tuple[np.ndarray, np.ndarray]:
    xy = np.stack([t["x"].to_numpy(), t["y"].to_numpy()], axis=1)
    g = core.snap(xy, grid.origin_x, grid.origin_y, grid.precision)
    return g[:, 0], g[:, 1]


@hash_shuffled
def point_in_polygon_join(points_ds, polys_docs_ds, cfg: ResolveConfig | None = None,
                          plan: ResolvePlan | None = None):
    """(point_id, x, y) x polygon documents -> (point_id, pk) containment pairs.

    One shuffle: polygons routed by bbox, points by location, grouped per
    tile; exact even-odd PIP on snapped coordinates inside the group.
    """
    cfg = cfg or ResolveConfig()
    if plan is None:
        # driver-bounded layers: histogram as a plain-task wave + the
        # input materialized once for the chains below (resolve.prepare)
        input_refs, polys_docs_ds = stages.small_input_refs(polys_docs_ds)
        plan = prepare(polys_docs_ds, cfg, input_refs=input_refs)
    grid, cut = plan.grid, plan.cut

    unwrapped = polys_docs_ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")
    polys_routed = unwrapped.map_batches(stages.Route(cut), batch_format="pyarrow")

    def polys_tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tile": t["tile"].combine_chunks(),
                "is_point": pa.array([False] * len(t), pa.bool_()),
                "point_id": pa.array([-1] * len(t), pa.int64()),
                "px": pa.array([0] * len(t), pa.int64()),
                "py": pa.array([0] * len(t), pa.int64()),
                "pk": t["pk"].combine_chunks(),
                "rings": t["rings"].combine_chunks(),
            }
        )

    def points_tag(t: pa.Table) -> pa.Table:
        px, py = _snap_points(t, grid)
        tiles = cut.tile_of_points_px(px, py)
        return pa.table(
            {
                "tile": pa.array(tiles.astype(np.int64), pa.int64()),
                "is_point": pa.array([True] * len(t), pa.bool_()),
                "point_id": t["point_id"].cast(pa.int64()).combine_chunks(),
                "px": pa.array(px, pa.int64()),
                "py": pa.array(py, pa.int64()),
                "pk": pa.array([-1] * len(t), pa.int64()),
                "rings": pa.array([b""] * len(t), pa.large_binary()),
            }
        )

    tagged = polys_routed.map_batches(polys_tag, batch_format="pyarrow").union(
        points_ds.map_batches(points_tag, batch_format="pyarrow")
    )

    def per_tile(g: pa.Table) -> pa.Table:
        is_pt = g["is_point"].to_numpy(zero_copy_only=False)
        out_pid, out_pk = [], []
        polys = []
        for i in np.flatnonzero(~is_pt):
            rings, _ = stages.unpack_rings(g["rings"][int(i)].as_py())
            polys.append((int(g["pk"][int(i)].as_py()), rings))
        if polys:
            # vectorized bbox prefilter: one (n_points x n_polys) mask per
            # tile group instead of a Python loop over every (point, poly)
            # pair — the exact PIP test runs only on bbox hits
            bb = np.asarray([core.bbox_of_rings(r) for _, r in polys], dtype=np.int64)
            px = g["px"].to_numpy()
            py = g["py"].to_numpy()
            pid = g["point_id"].to_numpy()
            pt_idx = np.flatnonzero(is_pt)
            xs = px[pt_idx][:, None]
            ys = py[pt_idx][:, None]
            hits = (
                (bb[None, :, 0] <= xs) & (xs <= bb[None, :, 2])
                & (bb[None, :, 1] <= ys) & (ys <= bb[None, :, 3])
            )
            for r, c in zip(*np.nonzero(hits)):
                i = int(pt_idx[r])
                pk, rings = polys[int(c)]
                if core.point_in_polygon(int(px[i]), int(py[i]), rings):
                    out_pid.append(int(pid[i]))
                    out_pk.append(pk)
        return pa.table(
            {
                "point_id": pa.array(out_pid, pa.int64()),
                "pk": pa.array(out_pk, pa.int64()),
            }
        )

    return stages.gated_groupby([polys_docs_ds, points_ds], tagged, "tile", per_tile)


def knn_points(points_ds, k: int = 5, radius: float = 0.1,
               grid: GridConfig | None = None, cut=None,
               base_level: int = 4):
    """kNN self-join on a point table (point_id, x, y).

    Cell-expansion candidate recall: every point's home cell plus all leaf
    cells within `radius` (the quadkey k-ring analogue).  Emits
    (point_id, neighbor_id, dist, rank, complete) — `complete` is False
    when the kth neighbour might lie beyond the radius (caller re-runs
    those points with a larger radius).
    """
    import pyarrow.compute as pc

    if grid is None:
        # derive a grid from the point extent
        import ray

        parts = points_ds.map_batches(
            lambda t: pa.table(
                {
                    "mnx": [float(np.min(t["x"].to_numpy()))],
                    "mny": [float(np.min(t["y"].to_numpy()))],
                    "mxx": [float(np.max(t["x"].to_numpy()))],
                    "mxy": [float(np.max(t["y"].to_numpy()))],
                }
            ),
            batch_format="pyarrow",
        ).take_all()
        mnx = min(p["mnx"] for p in parts)
        mny = min(p["mny"] for p in parts)
        mxx = max(p["mxx"] for p in parts)
        mxy = max(p["mxy"] for p in parts)
        grid = stages.grid_from_extent(mnx, mny, mxx, mxy, max((mxx - mnx) / 1e6, 1e-9))
    r_px = int(np.ceil(radius / grid.precision))

    def route(t: pa.Table) -> pa.Table:
        """Fully vectorized cell expansion: every point's radius window is
        a small (bounded by (2*r_px/cell_w + 2)^2) rectangle of cells, so
        the whole batch enumerates through one offset meshgrid + mask —
        no per-point Python loop (round-2 verdict item)."""
        px, py = _snap_points(t, grid)
        pid = t["point_id"].to_numpy()
        w = grid.span_px >> base_level
        n = 1 << base_level
        home_ix = np.clip(px // w, 0, n - 1)
        home_iy = np.clip(py // w, 0, n - 1)
        x0 = np.clip((px - r_px) // w, 0, n - 1)
        x1 = np.clip((px + r_px) // w, 0, n - 1)
        y0 = np.clip((py - r_px) // w, 0, n - 1)
        y1 = np.clip((py + r_px) // w, 0, n - 1)
        mx = int((x1 - x0).max(initial=0)) + 1
        my = int((y1 - y0).max(initial=0)) + 1
        ox, oy = np.meshgrid(np.arange(mx), np.arange(my), indexing="ij")
        ox, oy = ox.ravel(), oy.ravel()
        cx = x0[:, None] + ox[None, :]
        cy = y0[:, None] + oy[None, :]
        rows, cols = np.nonzero((cx <= x1[:, None]) & (cy <= y1[:, None]))
        cx_v, cy_v = cx[rows, cols], cy[rows, cols]
        cells = quadkey.encode(base_level, cx_v, cy_v)
        cells_i = (cells & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        is_home = (cx_v == home_ix[rows]) & (cy_v == home_iy[rows])
        return pa.table(
            {
                "cell": pa.array(cells_i, pa.int64()),
                "point_id": pa.array(pid[rows].astype(np.int64), pa.int64()),
                "px": pa.array(px[rows].astype(np.int64), pa.int64()),
                "py": pa.array(py[rows].astype(np.int64), pa.int64()),
                "is_home": pa.array(is_home, pa.bool_()),
            }
        )

    _KNN_SCHEMA = pa.schema(
        [("point_id", pa.int64()), ("neighbor_id", pa.int64()),
         ("d2_px", pa.int64()), ("dist", pa.float64()),
         ("rank", pa.int64()), ("complete", pa.bool_())]
    )

    def per_cell(g: pa.Table) -> pa.Table:
        px = g["px"].to_numpy()
        py = g["py"].to_numpy()
        pid = g["point_id"].to_numpy()
        home = g["is_home"].to_numpy(zero_copy_only=False)
        # dedup candidates by point_id (a point may be routed twice via
        # different overlaps at level boundaries); keep them SORTED by id
        # so a stable row-wise argsort on d2 breaks ties by ascending
        # neighbour id — the exact order the SQL oracle pins
        tpid, first = np.unique(pid, return_index=True)
        tx, ty = px[first], py[first]
        r2_px = np.int64(r_px) * np.int64(r_px)
        targets = np.flatnonzero(home)
        C = len(tpid)
        if len(targets) == 0 or C == 0:
            return _KNN_SCHEMA.empty_table()
        big = np.iinfo(np.int64).max
        chunks = []
        # block the (targets x candidates) distance matrix to ~32 MB
        block = max(1, 4_000_000 // C)
        for t0 in range(0, len(targets), block):
            ti = targets[t0 : t0 + block]
            dx = tx[None, :] - px[ti][:, None]
            dy = ty[None, :] - py[ti][:, None]
            d2 = dx * dx + dy * dy  # exact integer squared distances
            d2[tpid[None, :] == pid[ti][:, None]] = big  # self
            kk = min(k, C)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            dsel = np.take_along_axis(d2, idx, axis=1)
            kth = dsel[:, -1]
            complete = kth <= r2_px  # kth might lie beyond the radius
            valid = dsel != big
            rows, cols = np.nonzero(valid)
            chunks.append(
                pa.table(
                    {
                        "point_id": pa.array(pid[ti][rows], pa.int64()),
                        "neighbor_id": pa.array(tpid[idx[rows, cols]], pa.int64()),
                        "d2_px": pa.array(dsel[rows, cols], pa.int64()),
                        "dist": pa.array(
                            np.sqrt(dsel[rows, cols].astype(np.float64))
                            * grid.precision,
                            pa.float64(),
                        ),
                        "rank": pa.array((cols + 1).astype(np.int64), pa.int64()),
                        "complete": pa.array(complete[rows], pa.bool_()),
                    },
                    schema=_KNN_SCHEMA,
                )
            )
        return pa.concat_tables(chunks)

    routed = points_ds.map_batches(route, batch_format="pyarrow")
    return stages.gated_groupby(points_ds, routed, "cell", per_cell)


# fixed frame for the embeddings-derived kNN demo: constants appear
# verbatim in knn_embedding_sql so the snap arithmetic is bit-identical
# (same IEEE double ops) between the engine and the DuckDB oracle
_EMB_ORIGIN = -1.0
_EMB_PRECISION = 1e-4
_EMB_SPAN_PX = 32768  # covers [-1, 2.2768] at 1e-4


def knn_embedding_points(sf_dir: str, k: int = 5, radius: float = 0.3,
                         base_level: int = 3):
    """kNN cell-expansion over points derived from the embeddings table
    (x = embedding[0], y = embedding[1]) on a FIXED snap grid, so a DuckDB
    window-function oracle can reproduce the exact integer distances.
    Output: (point_id, neighbor_id, d2_px, rank)."""
    import ray.data as rd

    from .config import GridConfig

    grid = GridConfig(_EMB_ORIGIN, _EMB_ORIGIN, _EMB_SPAN_PX * _EMB_PRECISION, _EMB_PRECISION)

    def to_points(t: pa.Table) -> pa.Table:
        embs = t["embedding"].to_pylist()
        xs = np.array([e[0] for e in embs], dtype=np.float64)
        ys = np.array([e[1] for e in embs], dtype=np.float64)
        return pa.table(
            {
                "point_id": t["vec_id"].cast(pa.int64()).combine_chunks(),
                "x": pa.array(xs, pa.float64()),
                "y": pa.array(ys, pa.float64()),
            }
        )

    pts = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(to_points, batch_format="pyarrow")
    res = knn_points(pts, k=k, radius=radius, grid=grid, base_level=base_level)
    return res.select_columns(["point_id", "neighbor_id", "d2_px", "rank"])


def knn_embedding_sql(k: int = 5) -> str:
    """DuckDB oracle for knn_embedding_points: same snap (floor(x/prec -
    origin/prec + 0.5) with identical constants), exact integer squared
    distances, row_number ties broken by neighbor id."""
    return f"""
        WITH pts AS (
          SELECT vec_id AS point_id,
                 CAST(floor((CAST(embedding[1] AS DOUBLE) - (-1.0)) / 0.0001 + 0.5) AS BIGINT) AS px,
                 CAST(floor((CAST(embedding[2] AS DOUBLE) - (-1.0)) / 0.0001 + 0.5) AS BIGINT) AS py
          FROM embeddings
        ), pairs AS (
          SELECT a.point_id, b.point_id AS neighbor_id,
                 (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2,
                 row_number() OVER (
                   PARTITION BY a.point_id
                   ORDER BY (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py),
                            b.point_id
                 ) AS rnk
          FROM pts a JOIN pts b ON a.point_id <> b.point_id
        )
        SELECT point_id, neighbor_id, CAST(d2 AS BIGINT) AS d2_px,
               CAST(rnk AS BIGINT) AS rank
        FROM pairs WHERE rnk <= {k}
    """


# --------------------------------------------------------------------------
# exact-oracle smoothing harness (S1/S2 under a DuckDB value hash)
# --------------------------------------------------------------------------

# synthetic integer polyline per part key — the same formulas appear
# verbatim in SMOOTH_EXACT_SQL so DuckDB recomputes the input exactly.
# x strictly increases (no duplicate/zero-length segments, no spikes that
# reverse direction), every fifth vertex juts 2500 up so the simplifier
# must keep it and the chaikin pass sees a genuinely sharp (<30 deg)
# corner there.
_SMOOTH_TOL = 2.5  # DP tolerance; tol^2 = 6.25 is exact in binary


def _smooth_poly_xy(k: int) -> np.ndarray:
    n = 20 + (k % 11)
    i = np.arange(n, dtype=np.int64)
    x = i * 100 + (k * 31 + i * i * 17) % 41
    y = (k * 57 + i * 23) % 89 + np.where(i % 5 == 2, 2500, 0)
    return np.stack([x, y], axis=1).astype(np.float64)


def smooth_polylines_exact(sf_dir: str):
    """S1+S2 smoothing under an EXACT DuckDB oracle (reference semantics:
    cell.sql:676-714 simplify ladder + function_02_chaikinsAcuteAngle.sql).

    Runs the REAL douglas_peucker + chaikins_acute_angle kernels over
    deterministic integer polylines derived from `part` and emits every
    output vertex as a row (pk, seq, x, y).  On integer input with
    tol=2.5 both transforms are exactly SQL-expressible: the DP keep-set
    via a recursive interval CTE whose predicates are exact int64
    (cross^2 > tol^2 * len^2), the chaikin sharp test via
    4*dot^2 >= 3*|v1|^2*|v2|^2 with dot > 0 (cos^2 30 = 3/4), and the
    inserted corner points are quarters of integers — bit-exact doubles
    on both sides.  The steep-angle test is disabled (0/360): the input
    construction has no same-direction collinear corners, so the float
    and exact predicates cannot disagree."""
    import ray.data as rd

    from .geom import simplify as simp

    def fn(t: pa.Table) -> pa.Table:
        ks = t["p_partkey"].to_numpy().astype(np.int64)
        pk_o, seq_o, x_o, y_o = [], [], [], []
        for k in ks:
            line = _smooth_poly_xy(int(k))
            outl = simp.douglas_peucker(line, _SMOOTH_TOL)
            outl = simp.chaikins_acute_angle(
                outl,
                n_iterations=1,
                min_degrees=30.0,
                max_degrees=330.0,
                min_steep_angle_degrees=0.0,
                max_steep_angle_degrees=360.0,
            )
            m = len(outl)
            pk_o.extend([int(k)] * m)
            seq_o.extend(range(m))
            x_o.extend(outl[:, 0].tolist())
            y_o.extend(outl[:, 1].tolist())
        return pa.table(
            {
                "pk": pa.array(pk_o, pa.int64()),
                "seq": pa.array(seq_o, pa.int64()),
                "x": pa.array(x_o, pa.float64()),
                "y": pa.array(y_o, pa.float64()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


SMOOTH_EXACT_SQL = """
WITH pts AS (
  SELECT p.p_partkey AS pk, g.i AS k,
         CAST(g.i * 100 + (p.p_partkey * 31 + g.i * g.i * 17) % 41 AS BIGINT) AS x,
         CAST((p.p_partkey * 57 + g.i * 23) % 89
              + CASE WHEN g.i % 5 = 2 THEN 2500 ELSE 0 END AS BIGINT) AS y
  FROM part p, LATERAL (
    SELECT UNNEST(range(0, 20 + CAST(p.p_partkey % 11 AS INT))) AS i
  ) g
), ends AS (
  SELECT pk, MAX(k) AS last_k FROM pts GROUP BY pk
), splits AS (
  -- Douglas-Peucker as a recursive interval refinement: an interval
  -- (i,j) splits at its max-perp-distance interior point k when
  -- cross((B-A),(P-A))^2 > tol^2 * |B-A|^2 (all exact int64; ties on
  -- the squared cross distance break to the smallest k like np.argmax)
  WITH RECURSIVE seg(pk, i, j) AS (
    SELECT pk, 0, last_k FROM ends
    UNION ALL
    SELECT w.pk,
           CASE WHEN h.half = 0 THEN w.i ELSE w.k END,
           CASE WHEN h.half = 0 THEN w.k ELSE w.j END
    FROM (
      SELECT q.pk, q.i, q.j, q.k FROM (
        SELECT s.pk, s.i, s.j, p.k,
               ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x))
             * ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)) AS c2,
               ((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)) AS l2,
               ROW_NUMBER() OVER (
                 PARTITION BY s.pk, s.i, s.j
                 ORDER BY ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x))
                        * ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)) DESC,
                          p.k ASC
               ) AS rn
        FROM seg s
        JOIN pts a ON a.pk = s.pk AND a.k = s.i
        JOIN pts b ON b.pk = s.pk AND b.k = s.j
        JOIN pts p ON p.pk = s.pk AND p.k > s.i AND p.k < s.j
      ) q
      WHERE q.rn = 1 AND CAST(q.c2 AS DOUBLE) > 6.25 * CAST(q.l2 AS DOUBLE)
    ) w
    CROSS JOIN (SELECT UNNEST([0, 1]) AS half) h
  )
  SELECT * FROM seg
), kept AS (
  SELECT DISTINCT pk, k FROM (
    SELECT pk, i AS k FROM splits UNION ALL SELECT pk, j FROM splits
  )
), kv AS (
  SELECT kp.pk, kp.k, p.x, p.y,
         ROW_NUMBER() OVER (PARTITION BY kp.pk ORDER BY kp.k) AS r,
         COUNT(*) OVER (PARTITION BY kp.pk) AS m
  FROM kept kp JOIN pts p ON p.pk = kp.pk AND p.k = kp.k
), ang AS (
  SELECT kv.*,
         LAG(x) OVER w AS px, LAG(y) OVER w AS py,
         LEAD(x) OVER w AS qx, LEAD(y) OVER w AS qy
  FROM kv WINDOW w AS (PARTITION BY pk ORDER BY r)
), sel AS (
  SELECT pk, r, x, y, px, py, qx, qy,
         CASE WHEN px IS NULL OR qx IS NULL THEN FALSE
              ELSE (
                ((px - x) * (qx - x) + (py - y) * (qy - y)) > 0
                AND 4 * ((px - x) * (qx - x) + (py - y) * (qy - y))
                      * ((px - x) * (qx - x) + (py - y) * (qy - y))
                    >= 3 * ((px - x) * (px - x) + (py - y) * (py - y))
                        * ((qx - x) * (qx - x) + (qy - y) * (qy - y))
              ) END AS sharp
  FROM ang
), outpts AS (
  SELECT pk, r, 0 AS sub,
         CAST(x AS DOUBLE) AS ox, CAST(y AS DOUBLE) AS oy
  FROM sel WHERE NOT sharp
  UNION ALL
  SELECT pk, r, 0 AS sub,
         CAST(x AS DOUBLE) + 0.25 * (CAST(px AS DOUBLE) - CAST(x AS DOUBLE)),
         CAST(y AS DOUBLE) + 0.25 * (CAST(py AS DOUBLE) - CAST(y AS DOUBLE))
  FROM sel WHERE sharp
  UNION ALL
  SELECT pk, r, 1 AS sub,
         CAST(x AS DOUBLE) + 0.25 * (CAST(qx AS DOUBLE) - CAST(x AS DOUBLE)),
         CAST(y AS DOUBLE) + 0.25 * (CAST(qy AS DOUBLE) - CAST(y AS DOUBLE))
  FROM sel WHERE sharp
)
SELECT pk, CAST(ROW_NUMBER() OVER (PARTITION BY pk ORDER BY r, sub) - 1 AS BIGINT) AS seq,
       ox AS x, oy AS y
FROM outpts
ORDER BY pk, seq
"""


def smooth_lines(ds, simplify_tolerance: float = 0.0, chaikins_iterations: int = 1):
    """Line smoothing operator (reference S1/S2 exposed as a Dataset stage):
    LineString geometry spans are Douglas-Peucker simplified and
    chaikins-acute-angle smoothed; output (doc_id, n_points_in,
    n_points_out, wkb_hex)."""
    from .geom import simplify as simp
    from .geom import wkb as wkb_mod
    from . import spans as spans_mod

    def fn(t: pa.Table) -> pa.Table:
        wkbs = spans_mod.extract_geometry_wkb(t["spans"])
        ids = t["doc_id"].to_pylist()
        out = {"doc_id": [], "n_points_in": [], "n_points_out": [], "wkb_hex": []}
        for did, wb in zip(ids, wkbs):
            if not wb:
                continue
            try:
                gtype, parts = wkb_mod.decode(wb)
            except wkb_mod.WkbError:
                continue
            if gtype == wkb_mod.LINESTRING:
                line = parts[0][0]
            elif gtype == wkb_mod.POLYGON:
                line = parts[0][0]  # smooth the exterior ring as a line
            else:
                continue
            n_in = len(line)
            outl = line
            if simplify_tolerance > 0:
                outl = simp.douglas_peucker(outl, simplify_tolerance)
            if chaikins_iterations > 0:
                outl = simp.chaikins_acute_angle(outl, n_iterations=chaikins_iterations)
            out["doc_id"].append(did)
            out["n_points_in"].append(n_in)
            out["n_points_out"].append(len(outl))
            out["wkb_hex"].append(wkb_mod.encode_linestring(outl).hex())
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "n_points_in": pa.array(out["n_points_in"], pa.int64()),
                "n_points_out": pa.array(out["n_points_out"], pa.int64()),
                "wkb_hex": pa.array(out["wkb_hex"], pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class _TileCrossJoin:
    """groupby(tile).map_groups worker: pairwise A x B intersection areas.

    Same per-tile arrangement as detect.TileDetect, but inputs carry a
    side tag; every face whose coverage set contains members of BOTH
    layers contributes its exact area to each (a, b) pair.  Faces split
    by tile borders sum correctly downstream — no stitch is needed for
    an additive measure."""

    def __init__(self, grid: GridConfig, utm: bool):
        self.__name__ = "TileCrossJoin"
        self.grid = grid
        self.utm = utm

    def __call__(self, group: pa.Table) -> pa.Table:
        from .geom import arrangement

        g = self.grid
        tile = int(group["tile"][0].as_py())
        bounds = quadkey.cell_bounds_px(np.uint64(tile), g.span_px)
        pks = group["pk"].to_numpy()
        sides = group["side"].to_numpy(zero_copy_only=False)
        rings_col = group["rings"].to_pylist()
        # label polygons by ROW INDEX so identical pks across layers can
        # never merge; map back through (pks, sides) at emit time
        polys = [
            (i, stages.unpack_rings(rings_col[i])[0]) for i in range(len(group))
        ]
        faces = arrangement.overlay_tile(polys, bounds)
        pair_area: dict[tuple[int, int], float] = {}
        for f in faces:
            if len(f.cov) < 2:
                continue
            a_rows = [r for r in f.cov if not sides[r]]
            b_rows = [r for r in f.cov if sides[r]]
            if not a_rows or not b_rows:
                continue
            if self.utm:
                area = core.planar_area(f.rings, g.precision)
            else:
                area = core.geodesic_area(
                    f.rings, g.origin_x, g.origin_y, g.precision
                )
            for ra in a_rows:
                for rb in b_rows:
                    k = (int(pks[ra]), int(pks[rb]))
                    pair_area[k] = pair_area.get(k, 0.0) + area
        ka, kb, ar = [], [], []
        for (a, b), v in sorted(pair_area.items()):
            ka.append(a)
            kb.append(b)
            ar.append(v)
        return pa.table(
            {
                "pk_a": pa.array(ka, pa.int64()),
                "pk_b": pa.array(kb, pa.int64()),
                "area": pa.array(ar, pa.float64()),
            }
        )


@hash_shuffled
def layer_intersection_join(docs_a, docs_b, cfg: ResolveConfig | None = None,
                            plan: ResolvePlan | None = None):
    """Two polygon layers -> (pk_a, pk_b, intersection area) pairs.

    The cross-layer spatial join of the reference's deployment context
    (AR5 land-cover joined against other national layers): both layers
    unwrap onto the SAME snap grid and content-balanced cut, shuffle once
    by tile, and each tile computes its arrangement exactly; pair areas
    are additive across tiles so one groupby-sum finishes the join.
    When `plan` is omitted it is prepared on the UNION of the layers so
    the grid extent covers both.
    """
    cfg = cfg or ResolveConfig()
    plan = plan or prepare(docs_a.union(docs_b), cfg)
    grid, cut = plan.grid, plan.cut

    def tag(side: bool):
        # prune to the join's working set — spans/bbox never enter the
        # shuffle
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "tile": t["tile"].combine_chunks(),
                    "pk": t["pk"].combine_chunks(),
                    "rings": t["rings"].combine_chunks(),
                    "side": pa.array(np.full(len(t), side), pa.bool_()),
                }
            )
        return f

    def prep(ds, side: bool):
        u = ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")
        r = u.map_batches(stages.Route(cut), batch_format="pyarrow")
        return r.map_batches(tag(side), batch_format="pyarrow")

    both = prep(docs_a, False).union(prep(docs_b, True))
    worker = _TileCrossJoin(grid, cfg.topology.utm)
    pairs = stages.gated_groupby([docs_a, docs_b], both, "tile", worker)
    return pairs.groupby(["pk_a", "pk_b"]).sum("area")


def cell_cover(docs_ds, level: int, cfg: ResolveConfig | None = None,
               plan: ResolvePlan | None = None):
    """Polygon documents -> covering quadkey cells at a level (H3 polyfill
    analogue).

    A cell covers a polygon iff the CELL CENTER lies inside it (the H3
    polyfill convention), evaluated with the raster kernel's half-open
    even-odd fill at cell resolution — so adjacent polygons partition the
    cell set exactly like they partition pixels.  Output one row per
    (doc, cell): doc_id, cell (opaque quadkey id usable with
    parent/children/k_ring), cx, cy (the cell address at `level`).
    Streams: one stateless map_batches, no shuffle.
    """
    from . import raster

    cfg = cfg or ResolveConfig()
    if plan is None:
        input_refs, docs_ds = stages.small_input_refs(docs_ds)
        plan = prepare(docs_ds, cfg, input_refs=input_refs)
    grid = plan.grid
    s = int(grid.span_px) >> level
    if s <= 0:
        raise ValueError(f"level {level} finer than the snap grid")

    def cover(t: pa.Table) -> pa.Table:
        rings_col = t["rings"].to_pylist()
        polys = []
        for b in rings_col:
            rings, _ = stages.unpack_rings(b)
            polys.append([r.astype(np.float64) / s for r in rings])
        p, cy, x0, x1 = raster.scanline_runs(polys)
        n = (x1 - x0).astype(np.int64)
        total = int(n.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "cell": pa.array([], pa.uint64()),
                    "cx": pa.array([], pa.int64()),
                    "cy": pa.array([], pa.int64()),
                }
            )
        offs = np.concatenate([[0], np.cumsum(n)[:-1]])
        ridx = np.repeat(np.arange(len(n)), n)
        cx = np.arange(total) - np.repeat(offs, n) + x0[ridx]
        cyy = cy[ridx]
        cells = quadkey.encode(level, cx.astype(np.uint64), cyy.astype(np.uint64))
        doc_ids = t["doc_id"].take(pa.array(p[ridx], pa.int64()))
        return pa.table(
            {
                "doc_id": doc_ids.combine_chunks()
                if hasattr(doc_ids, "combine_chunks")
                else doc_ids,
                "cell": pa.array(cells, pa.uint64()),
                "cx": pa.array(cx, pa.int64()),
                "cy": pa.array(cyy, pa.int64()),
            }
        )

    unwrapped = docs_ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")
    return unwrapped.map_batches(cover, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# nearest-geometry join: for each point, the nearest polygon document by
# exact boundary distance (0 when inside), found by quadkey cell-ring
# expansion — the grid-file nearest-neighbour search (H3 grid_disk
# analogue), generalizing knn_points from point targets to polygons.
#
# Scale shape (round-4 rework; the round-3 version re-shuffled the full
# geometry table once per annulus round):
#   * geometry bbox covers at a fixed cell level are materialized ONCE;
#     giant bboxes (> giant_cells cells) never enter the cover table —
#     they join the bounded always-candidate list instead (the Route-style
#     giant treatment), so the cover table is O(docs x min(bbox cells,
#     giant_cells)), never output-sized.
#   * both the cover table and the slim (pk, rings) geometry table are
#     broadcast through the object store when they fit under
#     _NEAREST_BCAST_LIMIT (the finalize-join hybrid rule): each worker
#     fetches them zero-copy once, and the per-round dataflow touches ONLY
#     point-sized rows — ring cells, candidate pairs and the state fold.
#   * above the limit, candidates fall back to a per-round cell-bucket
#     shuffle of the (int-only) cover rows, and distances to a pk-bucket
#     shuffle where the geometry side is pre-filtered to the round's
#     candidate pk set (collected with a hard cap) — per-round shuffled
#     geometry bytes scale with the ACTIVE candidates, not the layer.
#   * shuffle-group counts scale with the input (_n_buckets_for), and the
#     annulus radius is clamped to the frame: once the scanned disk covers
#     every cell the search is conclusively done (points with no geometry
#     anywhere finish `complete` with a NULL nearest_pk).
# ---------------------------------------------------------------------------

_NEAREST_BCAST_LIMIT = 256 << 20
_NEAREST_CACHE: dict = {}


def _bcast_fetch(mat, build):
    """Worker-side cached fetch of a materialized broadcast dataset.

    Returns a zero-arg fetch() resolving the payload in the calling worker
    process, building it at most once per worker (bounded 2-entry FIFO
    cache — two interleaved broadcast stages must not evict each other
    per batch)."""
    refs = list(mat.to_arrow_refs())
    cache_key = tuple(r.hex() for r in refs)

    def fetch():
        import ray

        got = _NEAREST_CACHE.get(cache_key)
        if got is None:
            parts = [p for p in ray.get(list(refs)) if len(p)]
            got = build(parts)
            while len(_NEAREST_CACHE) >= 2:
                _NEAREST_CACHE.pop(next(iter(_NEAREST_CACHE)))
            _NEAREST_CACHE[cache_key] = got
        return got

    return fetch


def _eval_d2_by_pk(qx, qy, pkc, lookup) -> np.ndarray:
    """Exact point→geometry d² for (qx, qy, pkc) candidate rows: group rows
    by pk via one sort (not a per-pk full-array mask — that is
    O(distinct-pks × candidates)), resolve each pk's rings once through
    `lookup` (pk -> unpacked rings list, or None) and evaluate the group.
    Rows whose pk resolves to None keep d² = inf."""
    d2 = np.full(len(pkc), np.inf)
    if not len(pkc):
        return d2
    o = np.argsort(pkc, kind="stable")
    pks_s = pkc[o]
    starts = np.r_[0, np.nonzero(pks_s[1:] != pks_s[:-1])[0] + 1]
    ends = np.r_[starts[1:], len(pks_s)]
    for s, e in zip(starts, ends):
        rings = lookup(int(pks_s[s]))
        if rings is None:
            continue
        idx = o[s:e]
        d2[idx] = _point_rings_d2(qx[idx], qy[idx], rings)
    return d2


def _point_rings_d2(qx: np.ndarray, qy: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Exact squared distance (px^2, float64) of points to a polygon's
    boundary, 0 when inside (even-odd).  Fully vectorized (points x
    segments), including the inside test — no per-point Python loop."""
    segs = []
    for r in rings:
        if len(r) < 2:
            continue
        nxt = np.empty_like(r)
        nxt[:-1] = r[1:]
        nxt[-1] = r[0]
        segs.append(np.concatenate([r, nxt], axis=1))
    if not segs:
        return np.full(len(qx), np.inf)
    si = np.concatenate(segs).astype(np.int64)  # exact crossing arithmetic
    s = si.astype(np.float64)
    ax, ay, bx, by = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
    iax, iay, ibx, iby = si[:, 0], si[:, 1], si[:, 2], si[:, 3]
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    ln2[ln2 == 0] = 1.0  # degenerate segments: distance to the point a
    out = np.empty(len(qx))
    inside = np.zeros(len(qx), bool)
    B = 4096
    for s0 in range(0, len(qx), B):
        px = qx[s0 : s0 + B, None].astype(np.float64)
        py = qy[s0 : s0 + B, None].astype(np.float64)
        t = ((px - ax) * dx + (py - ay) * dy) / ln2
        t = np.clip(t, 0.0, 1.0)
        ddx = px - (ax + t * dx)
        ddy = py - (ay + t * dy)
        out[s0 : s0 + B] = (ddx * ddx + ddy * ddy).min(axis=1)
        # even-odd crossings, exact int64, all rings in one pass (counts
        # are additive across rings); half-open-x rule as in core.
        # Boundary points already have out == 0, so a garbage parity for
        # them is harmless (0 stays 0).
        iqx = qx[s0 : s0 + B, None].astype(np.int64)
        iqy = qy[s0 : s0 + B, None].astype(np.int64)
        straddle = ((iax <= iqx) & (iqx < ibx)) | ((ibx <= iqx) & (iqx < iax))
        num = (iqx - iax) * (iby - iay) + (iay - iqy) * (ibx - iax)
        above = np.where(ibx > iax, num > 0, num < 0) & straddle
        inside[s0 : s0 + B] = (above.sum(axis=1) % 2).astype(bool)
    out[inside] = 0.0
    return out


# shared union schemas — the per-round unions rely on EXACT field order
# (Arrow unifies by name today, but pinning the schema removes the
# version-fragility)
_NJ_PAIR_SCHEMA = pa.schema(
    [("point_id", pa.int64()), ("px", pa.int64()), ("py", pa.int64()),
     ("pk", pa.int64())]
)
_NJ_CELL_SCHEMA = pa.schema(
    [("cb", pa.int64()), ("cell", pa.int64()), ("pk", pa.int64()),
     ("is_pt", pa.bool_()), ("px", pa.int64()), ("py", pa.int64()),
     ("point_id", pa.int64())]
)
_NJ_EVAL_SCHEMA = pa.schema(
    [("gb", pa.int64()), ("pk", pa.int64()), ("is_doc", pa.bool_()),
     ("rings", pa.large_binary()), ("point_id", pa.int64()),
     ("px", pa.int64()), ("py", pa.int64())]
)
_NJ_MIN_SCHEMA = pa.schema(
    [("sb", pa.int64()), ("point_id", pa.int64()), ("pk", pa.int64()),
     ("d2", pa.float64())]
)
_NJ_FOLD_SCHEMA = pa.schema(
    [("sb", pa.int64()), ("point_id", pa.int64()), ("pk", pa.int64()),
     ("d2", pa.float64()), ("px", pa.int64()), ("py", pa.int64()),
     ("done", pa.bool_()), ("is_state", pa.bool_())]
)
_NJ_STATE_SCHEMA = pa.schema(
    [("point_id", pa.int64()), ("px", pa.int64()), ("py", pa.int64()),
     ("best_pk", pa.int64()), ("best_d2", pa.float64()),
     ("done", pa.bool_())]
)


def _nj_empty(schema: pa.Schema) -> pa.Table:
    return pa.table(
        {f.name: pa.array([], f.type) for f in schema}, schema=schema
    )


@hash_shuffled
def nearest_geom_join(points_ds, polys_docs_ds, cfg: ResolveConfig | None = None,
                      plan: ResolvePlan | None = None, level: int = 7,
                      max_rounds: int = 12, n_buckets: int | None = None,
                      r0_radius: int = 8, giant_cells: int = 4096,
                      max_giants: int = 4096,
                      bcast_limit: int = _NEAREST_BCAST_LIMIT):
    """(point_id, x, y) x polygon documents -> one row per point:
    (point_id, nearest_pk, d2_px, dist, complete).  nearest_pk is NULL for
    points with no geometry anywhere in the frame (complete stays True —
    once the scanned disk covers the whole frame the answer is
    conclusive); complete is False only when max_rounds ran out first.
    Ties break by pk ascending (deterministic, matches the SQL oracle).

    Geometries whose bbox covers more than `giant_cells` cells skip the
    cover table and are evaluated exactly for EVERY point in round 0; when
    more than `max_giants` of them show up at the requested `level`, the
    join AUTO-COARSENS — it rebuilds the cover at level-2, level-4, ...
    (each step shrinks every bbox's cell count ~16x) until the giant set
    fits.  `level` is performance-only, so the result is identical; a
    warning logs each step.  Only an unsatisfiable `giant_cells` (one a
    single cell can't satisfy even at level 0, where every bbox covers
    exactly 1 cell) still raises."""
    import pyarrow.compute as pc

    from .dedup import _n_buckets_for

    cfg = cfg or ResolveConfig()
    if plan is None:
        input_refs, polys_docs_ds = stages.small_input_refs(polys_docs_ds)
        plan = prepare(polys_docs_ds, cfg, input_refs=input_refs)
    grid = plan.grid
    if int(grid.span_px) >> level <= 0:
        raise ValueError(f"level {level} finer than the snap grid")

    unwrapped = polys_docs_ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")

    def _cover_at(w: int, n: int):
        def cover_rows(t: pa.Table) -> pa.Table:
            """Cover rows + giant markers in ONE pass: geometries whose
            bbox spans more than giant_cells cells emit a single cell=-1
            row instead of a cover expansion, so the (decode-heavy)
            Unwrap upstream runs once, not once per derived table."""
            mnx = np.clip(t["minx"].to_numpy() // w, 0, n - 1)
            mny = np.clip(t["miny"].to_numpy() // w, 0, n - 1)
            mxx = np.clip(t["maxx"].to_numpy() // w, 0, n - 1)
            mxy = np.clip(t["maxy"].to_numpy() // w, 0, n - 1)
            cnt = (mxx - mnx + 1) * (mxy - mny + 1)
            pk_all = t["pk"].to_numpy()
            keep = cnt <= giant_cells
            gpk = pk_all[~keep]
            mnx, mny, mxx, mxy, cnt = (a[keep] for a in (mnx, mny, mxx, mxy, cnt))
            pk = pk_all[keep]
            nx = (mxx - mnx + 1).astype(np.int64)
            total = int(cnt.sum())
            ridx = np.repeat(np.arange(len(cnt)), cnt)
            k = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            nx_r = np.repeat(nx, cnt)
            cx = np.repeat(mnx, cnt) + k % nx_r
            cy = np.repeat(mny, cnt) + k // nx_r
            cells = cx * np.int64(n) + cy
            return pa.table(
                {
                    "cell": pa.array(
                        np.concatenate([cells, np.full(len(gpk), -1, np.int64)]),
                        pa.int64(),
                    ),
                    "pk": pa.array(np.concatenate([pk[ridx], gpk]), pa.int64()),
                }
            )

        return unwrapped.map_batches(cover_rows, batch_format="pyarrow").materialize()

    def only_giants(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(_pc.equal(t["cell"], -1))

    # auto-coarsen: rebuild the cover two levels coarser per round until
    # the giant set fits (each step shrinks every bbox's cell count ~16x;
    # level 0 is a guaranteed terminator for any giant_cells >= 1 since
    # every bbox covers exactly one cell there)
    while True:
        w = int(grid.span_px) >> level
        n = 1 << level
        covers = _cover_at(w, n)
        # bounded pull: take(cap+1) stops at the cap instead of collecting
        # an adversarial giant set before deciding
        giant_take = covers.map_batches(only_giants, batch_format="pyarrow").take(
            max_giants + 1
        )
        if len(giant_take) <= max_giants:
            break
        if level == 0:
            raise ValueError(
                f"nearest_geom_join: more than {max_giants} geometries "
                f"exceed giant_cells={giant_cells} even at level 0 (where "
                f"every bbox covers exactly 1 cell) — raise giant_cells "
                f"or max_giants"
            )
        coarser = max(0, level - 2)
        import logging

        logging.getLogger(__name__).warning(
            "nearest_geom_join: more than %d geometries exceed "
            "giant_cells=%d at level %d; auto-coarsening to level %d",
            max_giants,
            giant_cells,
            level,
            coarser,
        )
        level = coarser
    giant_pks = np.sort(
        np.asarray([r["pk"] for r in giant_take], dtype=np.int64)
    )

    # slim geometry side: one (pk, rings) row per doc — the broadcast
    # payload AND the shuffle-path union side derive from this one table
    def geo_slim_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"pk": t["pk"].cast(pa.int64()).combine_chunks(),
             "rings": t["rings"].combine_chunks()}
        )

    geo_slim = unwrapped.map_batches(geo_slim_rows, batch_format="pyarrow").materialize()

    def init_state(t: pa.Table) -> pa.Table:
        px, py = _snap_points(t, grid)
        nn = len(t)
        return pa.table(
            {
                "point_id": t["point_id"].cast(pa.int64()).combine_chunks(),
                "px": pa.array(px, pa.int64()),
                "py": pa.array(py, pa.int64()),
                "best_pk": pa.array(np.full(nn, -1, np.int64)),
                "best_d2": pa.array(np.full(nn, np.inf)),
                "done": pa.array(np.zeros(nn, bool)),
            },
            schema=_NJ_STATE_SCHEMA,
        )

    state = points_ds.map_batches(init_state, batch_format="pyarrow").materialize()

    nb = n_buckets or _n_buckets_for(state.count() * 2 + covers.count())
    cov_bcast = (covers.size_bytes() or 0) <= bcast_limit
    geo_bcast = (geo_slim.size_bytes() or 0) <= bcast_limit

    def build_cov(parts):
        if not parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        tt = pa.concat_tables(parts)
        cells = tt["cell"].to_numpy()
        pks = tt["pk"].to_numpy()
        real = cells >= 0  # drop the giant markers
        cells, pks = cells[real], pks[real]
        o = np.argsort(cells, kind="stable")
        return cells[o].copy(), pks[o].copy()

    def build_geo(parts):
        d = {}
        for p in parts:
            d.update(zip(p["pk"].to_numpy().tolist(), p["rings"].to_pylist()))
        return d

    fetch_cov = _bcast_fetch(covers, build_cov) if cov_bcast else None
    fetch_geo = _bcast_fetch(geo_slim, build_geo) if geo_bcast else None

    def _annulus_cells(px: np.ndarray, py: np.ndarray, R: int, Rp: int):
        """Cells with Chebyshev radius in (Rp, R] around each point cell,
        chunked so points x offsets stays bounded.  Returns (point row
        index, cell id) arrays."""
        hx = np.clip(px // w, 0, n - 1)
        hy = np.clip(py // w, 0, n - 1)
        side = np.arange(-R, R + 1, dtype=np.int64)
        ox, oy = np.meshgrid(side, side, indexing="ij")
        cheb = np.maximum(np.abs(ox), np.abs(oy)).ravel()
        keep = cheb > Rp if Rp else np.ones(len(cheb), bool)
        offs_x = ox.ravel()[keep]
        offs_y = oy.ravel()[keep]
        m = max(1, len(offs_x))
        out_pi, out_cells = [], []
        step = max(1, 4_000_000 // m)
        for s0 in range(0, len(px), step):
            cx = hx[s0 : s0 + step, None] + offs_x[None, :]
            cy = hy[s0 : s0 + step, None] + offs_y[None, :]
            ok = (cx >= 0) & (cx < n) & (cy >= 0) & (cy < n)
            pi, oi = np.nonzero(ok)
            out_pi.append(pi + s0)
            out_cells.append(cx[pi, oi] * np.int64(n) + cy[pi, oi])
        if not out_pi:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_pi), np.concatenate(out_cells)

    def _dedup_pairs_np(pid, pk, px, py):
        o = np.lexsort((pk, pid))
        pid, pk, px, py = pid[o], pk[o], px[o], py[o]
        first = np.r_[True, (pid[1:] != pid[:-1]) | (pk[1:] != pk[:-1])]
        return pid[first], pk[first], px[first], py[first]

    def _pairs_table(pid, pk, px, py) -> pa.Table:
        return pa.table(
            {
                "point_id": pa.array(pid, pa.int64()),
                "px": pa.array(px, pa.int64()),
                "py": pa.array(py, pa.int64()),
                "pk": pa.array(pk, pa.int64()),
            },
            schema=_NJ_PAIR_SCHEMA,
        )

    def _giant_pairs_np(pid, px, py):
        g = len(giant_pks)
        return (
            np.repeat(pid, g),
            np.tile(giant_pks, len(pid)),
            np.repeat(px, g),
            np.repeat(py, g),
        )

    # ---- per-round candidate generation ------------------------------
    def make_cand(state_ds, R: int, Rp: int, rnd: int):
        if cov_bcast:
            def cand_bcast(t: pa.Table, _R=R, _Rp=Rp, _rnd=rnd) -> pa.Table:
                t = t.filter(pc.invert(t["done"]))
                if len(t) == 0:
                    return _nj_empty(_NJ_PAIR_SCHEMA)
                px = t["px"].to_numpy()
                py = t["py"].to_numpy()
                pid = t["point_id"].to_numpy()
                pi, cells = _annulus_cells(px, py, _R, _Rp)
                cov_cells, cov_pks = fetch_cov()
                left = np.searchsorted(cov_cells, cells, side="left")
                right = np.searchsorted(cov_cells, cells, side="right")
                cnt = right - left
                total = int(cnt.sum())
                if total:
                    ji = np.repeat(np.arange(len(cells)), cnt)
                    pos = (
                        np.arange(total, dtype=np.int64)
                        - np.repeat(np.cumsum(cnt) - cnt, cnt)
                        + np.repeat(left, cnt)
                    )
                    cpid = pid[pi[ji]]
                    cpk = cov_pks[pos]
                    cpx = px[pi[ji]]
                    cpy = py[pi[ji]]
                else:
                    cpid = np.empty(0, np.int64)
                    cpk = np.empty(0, np.int64)
                    cpx = np.empty(0, np.int64)
                    cpy = np.empty(0, np.int64)
                if _rnd == 0 and len(giant_pks):
                    gp = _giant_pairs_np(pid, px, py)
                    cpid = np.concatenate([cpid, gp[0]])
                    cpk = np.concatenate([cpk, gp[1]])
                    cpx = np.concatenate([cpx, gp[2]])
                    cpy = np.concatenate([cpy, gp[3]])
                if not len(cpid):
                    return _nj_empty(_NJ_PAIR_SCHEMA)
                return _pairs_table(*_dedup_pairs_np(cpid, cpk, cpx, cpy))

            cand_bcast.__name__ = f"nj_cand_R{R}"
            return state_ds.map_batches(cand_bcast, batch_format="pyarrow")

        # fallback: per-round cell-bucket shuffle of point rings + the
        # (int-only) cover rows
        def ring_rows(t: pa.Table, _R=R, _Rp=Rp) -> pa.Table:
            t = t.filter(pc.invert(t["done"]))
            if len(t) == 0:
                return _nj_empty(_NJ_CELL_SCHEMA)
            px = t["px"].to_numpy()
            py = t["py"].to_numpy()
            pid = t["point_id"].to_numpy()
            pi, cells = _annulus_cells(px, py, _R, _Rp)
            nn = len(cells)
            return pa.table(
                {
                    "cb": pa.array(cells % nb, pa.int64()),
                    "cell": pa.array(cells, pa.int64()),
                    "pk": pa.array(np.zeros(nn, np.int64)),
                    "is_pt": pa.array(np.ones(nn, bool)),
                    "px": pa.array(px[pi], pa.int64()),
                    "py": pa.array(py[pi], pa.int64()),
                    "point_id": pa.array(pid[pi], pa.int64()),
                },
                schema=_NJ_CELL_SCHEMA,
            )

        ring_rows.__name__ = f"nj_ring_R{R}"

        def cov_union_rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t["cell"], 0))  # drop giant markers
            cells = t["cell"].to_numpy()
            nn = len(cells)
            return pa.table(
                {
                    "cb": pa.array(cells % nb, pa.int64()),
                    "cell": t["cell"].combine_chunks(),
                    "pk": t["pk"].combine_chunks(),
                    "is_pt": pa.array(np.zeros(nn, bool)),
                    "px": pa.array(np.zeros(nn, np.int64)),
                    "py": pa.array(np.zeros(nn, np.int64)),
                    "point_id": pa.array(np.zeros(nn, np.int64)),
                },
                schema=_NJ_CELL_SCHEMA,
            )

        def cell_join(g: pa.Table) -> pa.Table:
            """Per CELL-BUCKET: match point rows to doc-cover rows on the
            exact cell id via sort + searchsorted (one Ray group handles
            thousands of cells)."""
            is_pt = g["is_pt"].to_numpy(zero_copy_only=False)
            npt = int(is_pt.sum())
            if npt == 0 or npt == len(g):
                return _nj_empty(_NJ_PAIR_SCHEMA)
            pts = g.filter(pa.array(is_pt))
            docs = g.filter(pa.array(~is_pt))
            dc = docs["cell"].to_numpy()
            o = np.argsort(dc, kind="stable")
            dc_s = dc[o]
            pk_s = docs["pk"].to_numpy()[o]
            pcell = pts["cell"].to_numpy()
            left = np.searchsorted(dc_s, pcell, side="left")
            right = np.searchsorted(dc_s, pcell, side="right")
            cnt = right - left
            total = int(cnt.sum())
            if total == 0:
                return _nj_empty(_NJ_PAIR_SCHEMA)
            pi = np.repeat(np.arange(len(pcell)), cnt)
            pos = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
                + np.repeat(left, cnt)
            )
            return _pairs_table(
                *_dedup_pairs_np(
                    pts["point_id"].to_numpy()[pi],
                    pk_s[pos],
                    pts["px"].to_numpy()[pi],
                    pts["py"].to_numpy()[pi],
                )
            )

        cand = (
            state_ds.map_batches(ring_rows, batch_format="pyarrow")
            .union(covers.map_batches(cov_union_rows, batch_format="pyarrow"))
            .groupby("cb")
            .map_groups(cell_join, batch_format="pyarrow")
        )
        if rnd == 0 and len(giant_pks):
            def giant_pairs(t: pa.Table) -> pa.Table:
                t = t.filter(pc.invert(t["done"]))
                if len(t) == 0:
                    return _nj_empty(_NJ_PAIR_SCHEMA)
                return _pairs_table(
                    *_giant_pairs_np(
                        t["point_id"].to_numpy(),
                        t["px"].to_numpy(),
                        t["py"].to_numpy(),
                    )
                )

            cand = cand.union(
                state_ds.map_batches(giant_pairs, batch_format="pyarrow")
            )
        return cand

    def _best_rows(pid, pk, d2) -> pa.Table:
        """Per-point argmin reduce (tie: pk asc) before the fold shuffle."""
        o = np.lexsort((pk, d2, pid))
        pid, pk, d2 = pid[o], pk[o], d2[o]
        first = np.r_[True, pid[1:] != pid[:-1]]
        pid, pk, d2 = pid[first], pk[first], d2[first]
        return pa.table(
            {
                "sb": pa.array(pid % nb, pa.int64()),
                "point_id": pa.array(pid, pa.int64()),
                "pk": pa.array(pk, pa.int64()),
                "d2": pa.array(d2, pa.float64()),
            },
            schema=_NJ_MIN_SCHEMA,
        )

    # ---- per-round exact distance evaluation --------------------------
    def make_mins(cand, rnd: int):
        if geo_bcast:
            def eval_bcast(t: pa.Table) -> pa.Table:
                if len(t) == 0:
                    return _nj_empty(_NJ_MIN_SCHEMA)
                d = fetch_geo()

                def rings_of(p: int):
                    blob = d.get(p)
                    return None if blob is None else stages.unpack_rings(blob)[0]

                pkc = t["pk"].to_numpy()
                qx = t["px"].to_numpy()
                qy = t["py"].to_numpy()
                pid = t["point_id"].to_numpy()
                d2 = _eval_d2_by_pk(qx, qy, pkc, rings_of)
                keep = np.isfinite(d2)
                if not keep.any():
                    return _nj_empty(_NJ_MIN_SCHEMA)
                return _best_rows(pid[keep], pkc[keep], d2[keep])

            eval_bcast.__name__ = f"nj_eval_r{rnd}"
            return cand.map_batches(eval_bcast, batch_format="pyarrow")

        # fallback: pk-bucket reduce-side attach.  The geometry union side
        # is pre-filtered to the round's candidate pk set when that set is
        # collectible (<= 2M distinct pks — active-candidate-sized, NOT
        # layer-sized); beyond the cap the full slim table unions in.
        import ray as _ray

        cand = cand.materialize()

        def uniq_pks(t: pa.Table) -> pa.Table:
            return pa.table(
                {"pk": pa.array(np.unique(t["pk"].to_numpy()), pa.int64())}
            )

        uniq = cand.map_batches(uniq_pks, batch_format="pyarrow").materialize()
        pk_filter_ref = None
        if uniq.count() <= 2_000_000:
            pks = np.unique(
                np.concatenate(
                    [p["pk"].to_numpy() for p in _ray.get(list(uniq.to_arrow_refs()))]
                    or [np.empty(0, np.int64)]
                )
            )
            pk_filter_ref = _ray.put(pks)

        def cand_union(t: pa.Table) -> pa.Table:
            nn = len(t)
            return pa.table(
                {
                    "gb": pa.array(t["pk"].to_numpy() % nb, pa.int64()),
                    "pk": t["pk"].combine_chunks(),
                    "is_doc": pa.array(np.zeros(nn, bool)),
                    "rings": pa.array([None] * nn, pa.large_binary()),
                    "point_id": t["point_id"].combine_chunks(),
                    "px": t["px"].combine_chunks(),
                    "py": t["py"].combine_chunks(),
                },
                schema=_NJ_EVAL_SCHEMA,
            )

        def geo_union(t: pa.Table) -> pa.Table:
            pk = t["pk"].to_numpy()
            if pk_filter_ref is not None:
                import ray

                keep = np.isin(pk, ray.get(pk_filter_ref))
                t = t.filter(pa.array(keep))
                pk = pk[keep]
            nn = len(t)
            return pa.table(
                {
                    "gb": pa.array(pk % nb, pa.int64()),
                    "pk": t["pk"].combine_chunks(),
                    "is_doc": pa.array(np.ones(nn, bool)),
                    "rings": t["rings"].combine_chunks(),
                    "point_id": pa.array(np.zeros(nn, np.int64)),
                    "px": pa.array(np.zeros(nn, np.int64)),
                    "py": pa.array(np.zeros(nn, np.int64)),
                },
                schema=_NJ_EVAL_SCHEMA,
            )

        def eval_dist(g: pa.Table) -> pa.Table:
            is_doc = g["is_doc"].to_numpy(zero_copy_only=False)
            cand_rows = g.filter(pa.array(~is_doc))
            if len(cand_rows) == 0:
                return _nj_empty(_NJ_MIN_SCHEMA)
            docs = g.filter(pa.array(is_doc))
            rings_by_pk = {
                int(p): stages.unpack_rings(b)[0]
                for p, b in zip(docs["pk"].to_numpy(), docs["rings"].to_pylist())
            }
            pkc = cand_rows["pk"].to_numpy()
            qx = cand_rows["px"].to_numpy()
            qy = cand_rows["py"].to_numpy()
            pid = cand_rows["point_id"].to_numpy()
            d2 = _eval_d2_by_pk(qx, qy, pkc, rings_by_pk.get)
            keep = np.isfinite(d2)
            if not keep.any():
                return _nj_empty(_NJ_MIN_SCHEMA)
            return _best_rows(pid[keep], pkc[keep], d2[keep])

        return (
            cand.map_batches(cand_union, batch_format="pyarrow")
            .union(geo_slim.map_batches(geo_union, batch_format="pyarrow"))
            .groupby("gb")
            .map_groups(eval_dist, batch_format="pyarrow")
        )

    def make_round_fused(R: int, Rp: int, rnd: int, full: bool):
        """One annulus round as a single map over state blocks.  Both
        broadcast gates are on, so a point's candidate generation, exact
        distances and best-update all happen inside its own block — the
        round shuffles nothing (vs. the union→groupby fold below)."""

        def round_fused(t: pa.Table) -> pa.Table:
            px = t["px"].to_numpy()
            py = t["py"].to_numpy()
            best_pk = t["best_pk"].to_numpy().copy()
            best_d2 = t["best_d2"].to_numpy().copy()
            done = t["done"].to_numpy(zero_copy_only=False).copy()
            act = np.nonzero(~done)[0]
            if len(act):
                apx = px[act]
                apy = py[act]
                pi, cells = _annulus_cells(apx, apy, R, Rp)
                cov_cells, cov_pks = fetch_cov()
                left = np.searchsorted(cov_cells, cells, side="left")
                right = np.searchsorted(cov_cells, cells, side="right")
                cnt = right - left
                total = int(cnt.sum())
                if total:
                    ji = np.repeat(np.arange(len(cells)), cnt)
                    pos = (
                        np.arange(total, dtype=np.int64)
                        - np.repeat(np.cumsum(cnt) - cnt, cnt)
                        + np.repeat(left, cnt)
                    )
                    cpi = pi[ji]
                    cpk = cov_pks[pos]
                else:
                    cpi = np.empty(0, np.int64)
                    cpk = np.empty(0, np.int64)
                if rnd == 0 and len(giant_pks):
                    g = len(giant_pks)
                    cpi = np.concatenate([cpi, np.repeat(np.arange(len(act)), g)])
                    cpk = np.concatenate([cpk, np.tile(giant_pks, len(act))])
                if len(cpi):
                    o = np.lexsort((cpk, cpi))
                    cpi, cpk = cpi[o], cpk[o]
                    first = np.r_[
                        True, (cpi[1:] != cpi[:-1]) | (cpk[1:] != cpk[:-1])
                    ]
                    cpi, cpk = cpi[first], cpk[first]
                    geo = fetch_geo()

                    def rings_of(p: int):
                        blob = geo.get(p)
                        return None if blob is None else stages.unpack_rings(blob)[0]

                    qx = apx[cpi]
                    qy = apy[cpi]
                    d2 = _eval_d2_by_pk(qx, qy, cpk, rings_of)
                    keep = np.isfinite(d2)
                    if keep.any():
                        ci, ck, cd = cpi[keep], cpk[keep], d2[keep]
                        # argmin per point, pk-asc tie-break (matches fold)
                        o2 = np.lexsort((ck, cd, ci))
                        ci, ck, cd = ci[o2], ck[o2], cd[o2]
                        f2 = np.r_[True, ci[1:] != ci[:-1]]
                        ci, ck, cd = ci[f2], ck[f2], cd[f2]
                        tgt = act[ci]
                        upd = (cd < best_d2[tgt]) | (
                            (cd == best_d2[tgt]) & (ck < best_pk[tgt])
                        )
                        ti = tgt[upd]
                        best_d2[ti] = cd[upd]
                        best_pk[ti] = ck[upd]
            # identical termination rule to the shuffle-path fold
            bound = float((R - 1) * w)
            if bound >= 0:
                done |= np.sqrt(best_d2) <= bound
            if full:
                done |= True
            return pa.table(
                {
                    "point_id": t["point_id"].combine_chunks(),
                    "px": t["px"].combine_chunks(),
                    "py": t["py"].combine_chunks(),
                    "best_pk": pa.array(best_pk, pa.int64()),
                    "best_d2": pa.array(best_d2, pa.float64()),
                    "done": pa.array(done, pa.bool_()),
                },
                schema=_NJ_STATE_SCHEMA,
            )

        round_fused.__name__ = f"nj_round_R{R}"
        return round_fused

    def _shuffle_round(state, R, R_prev, rnd, full_frame):
        cand = make_cand(state, R, R_prev, rnd)
        mins = make_mins(cand, rnd)

        def state_rows(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "sb": pa.array(t["point_id"].to_numpy() % nb, pa.int64()),
                    "point_id": t["point_id"].combine_chunks(),
                    "pk": t["best_pk"].combine_chunks(),
                    "d2": t["best_d2"].combine_chunks(),
                    "px": t["px"].combine_chunks(),
                    "py": t["py"].combine_chunks(),
                    "done": t["done"].combine_chunks(),
                    "is_state": pa.array(np.ones(len(t), bool)),
                },
                schema=_NJ_FOLD_SCHEMA,
            )

        def min_rows(t: pa.Table) -> pa.Table:
            nn = len(t)
            return pa.table(
                {
                    "sb": t["sb"].combine_chunks(),
                    "point_id": t["point_id"].combine_chunks(),
                    "pk": t["pk"].combine_chunks(),
                    "d2": t["d2"].combine_chunks(),
                    "px": pa.array(np.zeros(nn, np.int64)),
                    "py": pa.array(np.zeros(nn, np.int64)),
                    "done": pa.array(np.zeros(nn, bool)),
                    "is_state": pa.array(np.zeros(nn, bool)),
                },
                schema=_NJ_FOLD_SCHEMA,
            )

        def fold(g: pa.Table, _R=R, _full=full_frame) -> pa.Table:
            is_state = g["is_state"].to_numpy(zero_copy_only=False)
            st = g.filter(pa.array(is_state))
            nw = g.filter(pa.array(~is_state))
            pid_s = st["point_id"].to_numpy()
            best_pk = st["pk"].to_numpy().copy()
            best_d2 = st["d2"].to_numpy().copy()
            done = st["done"].to_numpy(zero_copy_only=False).copy()
            if len(nw):
                # candidate argmin per point: sort by (pid, d2, pk), first wins
                pid_n = nw["point_id"].to_numpy()
                pk_n = nw["pk"].to_numpy()
                d2_n = nw["d2"].to_numpy()
                o = np.lexsort((pk_n, d2_n, pid_n))
                pid_n, pk_n, d2_n = pid_n[o], pk_n[o], d2_n[o]
                first = np.r_[True, pid_n[1:] != pid_n[:-1]]
                pid_f, pk_f, d2_f = pid_n[first], pk_n[first], d2_n[first]
                so = np.argsort(pid_s, kind="stable")
                pid_ss = pid_s[so]
                pos = np.searchsorted(pid_ss, pid_f)
                valid = (pos < len(pid_ss)) & (
                    pid_ss[np.minimum(pos, len(pid_ss) - 1)] == pid_f
                )
                tgt = so[pos[valid]]
                upd = (d2_f[valid] < best_d2[tgt]) | (
                    (d2_f[valid] == best_d2[tgt]) & (pk_f[valid] < best_pk[tgt])
                )
                ti = tgt[upd]
                best_d2[ti] = d2_f[valid][upd]
                best_pk[ti] = pk_f[valid][upd]
            # termination: every unseen geometry's bbox lies outside the
            # scanned Chebyshev disk of radius R -> distance >= R*w >
            # (R-1)*w >= best (strict, so bound-ties cannot flip the pick)
            bound = float((_R - 1) * w)
            if bound >= 0:
                done |= np.sqrt(best_d2) <= bound
            if _full:
                # scanned disk covers the whole frame: every geometry was
                # a candidate, the answer is conclusive for every point
                done |= True
            return pa.table(
                {
                    "point_id": st["point_id"].combine_chunks(),
                    "px": st["px"].combine_chunks(),
                    "py": st["py"].combine_chunks(),
                    "best_pk": pa.array(best_pk, pa.int64()),
                    "best_d2": pa.array(best_d2, pa.float64()),
                    "done": pa.array(done, pa.bool_()),
                },
                schema=_NJ_STATE_SCHEMA,
            )

        fold.__name__ = f"nj_fold_R{R}"
        import ray as _ray

        # coalesce: the per-round union+sort would otherwise multiply block
        # counts round over round (sort reduce partitions track input block
        # count), the same tiny-block explosion the dissolve loop hit
        n_blocks = max(8, int(_ray.cluster_resources().get("CPU", 8)))
        state = (
            state.map_batches(state_rows, batch_format="pyarrow")
            .union(mins.map_batches(min_rows, batch_format="pyarrow"))
            .groupby("sb")
            .map_groups(fold, batch_format="pyarrow")
            .repartition(n_blocks)
            .materialize()
        )
        return state

    # ---- annulus rounds ------------------------------------------------
    # geometrically growing annuli clamped to the frame: round k scans
    # Chebyshev radius (r0*2^(k-1), min(r0*2^k, n-1)]; O(log n) rounds.
    # With both broadcast gates on (cover + slim geometry fit the object
    # store) a round is ONE embarrassingly-parallel map over the state
    # blocks — nothing shuffles; otherwise each round pays the cell-bucket
    # / pk-bucket exchanges plus a point-sized fold shuffle.
    R_prev = 0
    for rnd in range(max_rounds):
        R = min(r0_radius << rnd, n - 1)
        full_frame = R >= n - 1
        if cov_bcast and geo_bcast:
            state = state.map_batches(
                make_round_fused(R, R_prev, rnd, full_frame),
                batch_format="pyarrow",
            ).materialize()
        else:
            state = _shuffle_round(state, R, R_prev, rnd, full_frame)
        R_prev = R
        if full_frame:
            break
        remaining = state.map_batches(
            lambda t: pa.table(
                {"n": pa.array(
                    [int((~t["done"].to_numpy(zero_copy_only=False)).sum())],
                    pa.int64(),
                )}
            ),
            batch_format="pyarrow",
        ).sum("n")
        if not remaining:
            break

    def finish(t: pa.Table) -> pa.Table:
        best_pk = t["best_pk"].to_numpy()
        best_d2 = t["best_d2"].to_numpy()
        has = best_pk >= 0
        return pa.table(
            {
                "point_id": t["point_id"].combine_chunks(),
                "nearest_pk": pa.array(
                    [int(p) if h else None for p, h in zip(best_pk, has)], pa.int64()
                ),
                "d2_px": pa.array(
                    [int(round(d)) if h else None for d, h in zip(best_d2, has)],
                    pa.int64(),
                ),
                "dist": pa.array(
                    [
                        float(np.sqrt(d)) * grid.precision if h else None
                        for d, h in zip(best_d2, has)
                    ],
                    pa.float64(),
                ),
                "complete": t["done"].combine_chunks(),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow")
