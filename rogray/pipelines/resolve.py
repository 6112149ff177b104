"""Flagship pipeline: resolve_overlap_gap — Ray-Data rebuild of
CALL resolve_overlap_gap_run(...) (function_resolve_overlap_gap_run.sql).

One linear streaming pipeline (no branch, no mid-pipeline materialize):

  documents -> Unwrap -> [histogram/cut: tiny driver step] -> Route
            -> groupby(tile).map_groups(TileOverlay)      # shuffle 1
            -> groupby(stitch_key).map_groups(stitch)     # shuffle 2 (borders)
            -> Finalize -> result Dataset / parquet

The reference's 7-phase job state machine with dblink fan-out, row locks
and retry ladders collapses to two shuffles because tile ownership is by
key, not by lock.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data as rd

from .. import spans as spans_mod
from .. import stages
from ..config import GridConfig, ResolveConfig
from ..tiling import balance


@dataclass
class ResolvePlan:
    grid: GridConfig
    cut: balance.CutIndex
    num_tiles: int


def prepare(ds, cfg: ResolveConfig) -> ResolvePlan:
    """Init stage (analogue of resolve_overlap_gap_init, init.sql:4-293):
    global snap grid from the data extent + content-balanced tile cut."""
    t = cfg.topology
    if t.utm:
        mnx, mny, mxx, mxy = stages.extent_of_docs(ds)
        grid = stages.grid_from_extent(mnx, mny, mxx, mxy, t.snap_tolerance)
    else:
        # lon/lat: fixed world frame, no extent pass needed
        grid = stages.world_grid(t.snap_tolerance)
    cut = stages.compute_cut(
        ds,
        grid,
        t.base_level,
        t.base_level + t.histogram_extra_levels,
        t.max_rows_in_each_cell,
    )
    return ResolvePlan(grid, cut, len(cut.leaves))


def stitched_faces(ds, cfg: ResolveConfig, plan: ResolvePlan):
    """The resolved face set BEFORE attribute finalization: one row per
    output face with exact px rings, coverage set, winner/others, area2.
    Shared by resolve_overlap_gap and the AR5 attribute-table mode."""
    t = cfg.topology
    grid = plan.grid
    # stateless task stages (no reserved actors -> shuffles never starve)
    unwrapped = ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")
    routed = unwrapped.map_batches(stages.Route(plan.cut), batch_format="pyarrow")
    # leaf markers: every tile of the partition emits its faces even when
    # it holds no data (gaps spanning empty tiles, exact universe frontier)
    routed = routed.union(rd.from_arrow(_marker_table(plan)))
    coarse_level = _coarse_level(plan, t.base_level)
    # task-pool stage: the overlay needs no per-actor state (all state is
    # per tile group), and task pools release CPUs the moment the dataset
    # finishes - actor pools were observed pinning CPUs after execution,
    # starving later pipelines in the same session
    faces = routed.groupby("tile").map_groups(
        stages.TileOverlay(
            grid, t.utm, cfg.clean.min_area_to_keep, coarse_level, clean=cfg.clean
        ),
        batch_format="pyarrow",
    )
    # multi-level border stitch: coarse-cell buckets, then (when the grid is
    # deep enough) a spatial mid level that dissolves giant signature
    # groups — the gap/universe network above all — in parallel, then
    # per-signature global groups.  Only still-frontier pieces escalate a
    # level, so the straggler group shrinks geometrically.
    mid_level = _mid_level(coarse_level)
    st = faces.groupby("stitch_key").map_groups(
        stages.StitchLocal(mid_level), batch_format="pyarrow"
    )
    if mid_level is not None:
        st = st.groupby("stitch_key").map_groups(
            stages.stitch_mid, batch_format="pyarrow"
        )
    return st.groupby("stitch_key").map_groups(
        stages.stitch_global, batch_format="pyarrow"
    )


def resolve_overlap_gap(
    ds,
    cfg: ResolveConfig | None = None,
    plan: ResolvePlan | None = None,
    overlay_concurrency=None,
):
    """documents Dataset -> resolved faces Dataset (the `_result` table).

    Output columns: doc_id (winner's; NULL for gap faces), winner_pk,
    other_intersect_id_list, input_geo_is_valid, wkb, area, tile, spans.
    """
    cfg = cfg or ResolveConfig()
    plan = plan or prepare(ds, cfg)
    stitched = stitched_faces(ds, cfg, plan)
    return _finalize_join(stitched, ds, plan.grid, cfg.topology.utm)


def face_relation_rows(ds, cfg: ResolveConfig | None = None, plan: ResolvePlan | None = None):
    """AR5 attribute-table mode (reference create_topology_attrbute_tables,
    cell.sql:390-416,877-899; golden: resolve_overlap_and_gap_expected:36-103
    — per-face relation rows + per-face areas): one row per
    (face, covering source), face identity = deterministic hash of the
    exact px rings.  Faces covered by k sources emit k rows; gap faces
    emit one row with src_pk NULL.  Edge rows live in
    pipelines.detect.extract_edges (the edge_data analogue)."""
    import hashlib

    cfg = cfg or ResolveConfig()
    plan = plan or prepare(ds, cfg)
    grid = plan.grid
    utm = cfg.topology.utm
    stitched = stitched_faces(ds, cfg, plan)

    def rows(t: pa.Table) -> pa.Table:
        from ..geom import core

        out = {"face_id": [], "src_pk": [], "n_srcs": [], "face_area": [], "is_valid": []}
        rings_col = t["rings"].to_pylist()
        covs = t["cov"].to_pylist()
        valid = t["is_valid"].to_pylist()
        for i in range(len(t)):
            rings, _ = stages.unpack_rings(rings_col[i])
            fid = hashlib.md5(rings_col[i]).hexdigest()[:16]
            if utm:
                area = core.planar_area(rings, grid.precision)
            else:
                area = core.geodesic_area(rings, grid.origin_x, grid.origin_y, grid.precision)
            cov = covs[i] or []
            for src in (cov if cov else [None]):
                out["face_id"].append(fid)
                out["src_pk"].append(src)
                out["n_srcs"].append(len(cov))
                out["face_area"].append(area)
                out["is_valid"].append(bool(valid[i]))
        return pa.table(
            {
                "face_id": pa.array(out["face_id"], pa.string()),
                "src_pk": pa.array(out["src_pk"], pa.int64()),
                "n_srcs": pa.array(out["n_srcs"], pa.int64()),
                "face_area": pa.array(out["face_area"], pa.float64()),
                "is_valid": pa.array(out["is_valid"], pa.bool_()),
            }
        )

    return stitched.map_batches(rows, batch_format="pyarrow")


def _mid_level(coarse_level: int) -> int | None:
    """Spatial mid-stitch level: two levels above the coarse buckets (16x
    the area), or None when the hierarchy is too shallow to help."""
    return coarse_level - 2 if coarse_level >= 2 else None


def _coarse_level(plan: ResolvePlan, base_level: int) -> int:
    """Level-1 stitch bucket granularity: one level above the typical leaf,
    so each bucket consolidates a handful of tiles (enough cancellation to
    shrink the global level) while keeping enough buckets for parallelism."""
    from ..tiling import quadkey

    lvls = sorted(int(c) >> quadkey.LEVEL_SHIFT for c in plan.cut.leaves) or [base_level]
    med = lvls[len(lvls) // 2]
    return max(0, min(med - 1, 10))


def _marker_table(plan: ResolvePlan, exclude: set[int] | None = None):
    import pyarrow as pa

    from ..spans import SPANS_TYPE

    tiles = [t for t in plan.cut.all_tiles() if not exclude or t not in exclude]
    n = len(tiles)
    return pa.table(
        {
            "doc_id": pa.array([""] * n, pa.string()),
            "pk": pa.array([-1] * n, pa.int64()),
            "rings": pa.array([stages.pack_rings([])] * n, pa.large_binary()),
            "minx": pa.array([0] * n, pa.int64()),
            "miny": pa.array([0] * n, pa.int64()),
            "maxx": pa.array([0] * n, pa.int64()),
            "maxy": pa.array([0] * n, pa.int64()),
            "valid": pa.array([True] * n, pa.bool_()),
            "is_line": pa.array([False] * n, pa.bool_()),
            "spans": pa.array([[]] * n, SPANS_TYPE),
            "tile": pa.array(tiles, pa.int64()),
        }
    )


_JOIN_SCHEMA = pa.schema(
    [
        ("jk", pa.int64()),          # join key: winner_pk / doc pk
        ("is_doc", pa.bool_()),
        ("tile", pa.int64()),
        ("rings", pa.large_binary()),
        ("winner_pk", pa.int64()),
        ("others_s", pa.string()),
        ("is_valid", pa.bool_()),
        ("w_doc_id", pa.string()),
        ("w_spans_json", pa.string()),
    ]
)


def _finalize_join(stitched, ds, grid, utm):
    """JT7 attribute copy (cell.sql:869-873) as a reduce-side join: face
    rows and (pk, doc payload) rows shuffle to the same winner_pk key, the
    group attaches the winner's doc_id/spans to every face.  Task-pool
    sort shuffle throughout — no join-aggregator actors to start (they
    also reserved CPUs on small clusters), no driver materialization, and
    sorts consume the 0-row schema-less blocks that crash Ray's hash-join
    schema broadcast."""

    def docs_min(t: pa.Table) -> pa.Table:
        import json

        from ..ids import stable_pk

        n = len(t)
        ids = t["doc_id"].to_pylist()
        pks = [stable_pk(did) for did in ids]
        # spans ride as JSON (list<struct> does not survive concat/take
        # uniformly across block types)
        spans_json = [
            json.dumps(
                [[sp["kind"], sp["text"], sp["media_ref"], sp["offset"]] for sp in doc]
            )
            for doc in t["spans"].to_pylist()
        ]
        return pa.table(
            {
                "jk": pa.array(pks, pa.int64()),
                "is_doc": pa.array([True] * n, pa.bool_()),
                "tile": pa.array([0] * n, pa.int64()),
                "rings": pa.array([None] * n, pa.large_binary()),
                "winner_pk": pa.array([0] * n, pa.int64()),
                "others_s": pa.array([None] * n, pa.string()),
                "is_valid": pa.array([True] * n, pa.bool_()),
                "w_doc_id": t["doc_id"].cast(pa.string()).combine_chunks(),
                "w_spans_json": pa.array(spans_json, pa.string()),
            },
            schema=_JOIN_SCHEMA,
        )

    def prep(t: pa.Table) -> pa.Table:
        n = len(t)
        others = [",".join(map(str, o or [])) for o in t["others"].to_pylist()]
        return pa.table(
            {
                "jk": t["winner_pk"].combine_chunks(),
                "is_doc": pa.array([False] * n, pa.bool_()),
                "tile": t["tile"].combine_chunks(),
                "rings": t["rings"].combine_chunks(),
                "winner_pk": t["winner_pk"].combine_chunks(),
                "others_s": pa.array(others, pa.string()),
                "is_valid": t["is_valid"].combine_chunks(),
                "w_doc_id": pa.array([None] * n, pa.string()),
                "w_spans_json": pa.array([None] * n, pa.string()),
            },
            schema=_JOIN_SCHEMA,
        )

    def attach(g: pa.Table) -> pa.Table:
        import numpy as np

        is_doc = g["is_doc"].to_numpy(zero_copy_only=False)
        faces_idx = np.flatnonzero(~is_doc)
        if len(faces_idx) == 0:
            return _JOIN_SCHEMA.empty_table().drop_columns(["jk", "is_doc"])
        doc_idx = np.flatnonzero(is_doc)
        faces = g.take(pa.array(faces_idx, pa.int64()))
        out = faces.drop_columns(["jk", "is_doc"])
        if len(doc_idx):
            i = int(doc_idx[0])
            nf = len(faces)
            out = out.set_column(
                out.schema.get_field_index("w_doc_id"),
                "w_doc_id",
                pa.array([g["w_doc_id"][i].as_py()] * nf, pa.string()),
            )
            out = out.set_column(
                out.schema.get_field_index("w_spans_json"),
                "w_spans_json",
                pa.array([g["w_spans_json"][i].as_py()] * nf, pa.string()),
            )
        return out

    attach.__name__ = "attach_winner"
    joined = (
        stitched.map_batches(prep, batch_format="pyarrow")
        .union(ds.map_batches(docs_min, batch_format="pyarrow"))
        .groupby("jk")
        .map_groups(attach, batch_format="pyarrow")
    )
    return joined.map_batches(
        stages.FinalizeJoined(grid, utm), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# resumable variant: per-tile checkpointed output (donejobs analogue)
# ---------------------------------------------------------------------------


class _TileOverlayWriter:
    """TileOverlay that checkpoints each tile's faces (interior rows AND
    border pieces) atomically before returning them.  A rerun skips tiles
    whose manifest exists — the reference's `_job_list_donejobs` semantics
    (cell.sql:125-132) with per-partition lineage+metrics."""

    def __init__(self, grid, utm, min_area, coarse_level, out_dir, cfg_fp, clean=None):
        from .. import stages

        self.__name__ = "TileOverlayWriter"  # map_groups task-fn contract

        self._inner = stages.TileOverlay(grid, utm, min_area, coarse_level, clean=clean)
        self.out_dir = out_dir
        self.cfg_fp = cfg_fp

    def __call__(self, group):
        from ..state import manifest

        table = self._inner(group)
        if len(group) > 0:
            tile = int(group["tile"][0].as_py())
            n_border = int((table["kind"].to_numpy() == 1).sum()) if len(table) else 0
            manifest.write_tile(
                self.out_dir,
                tile,
                table,
                self.cfg_fp,
                {"n_faces": len(table), "n_border_pieces": n_border,
                 "n_input_rows": len(group)},
            )
        return table


def resolve_overlap_gap_resumable(
    ds,
    out_dir: str,
    cfg: ResolveConfig | None = None,
    overlay_concurrency=None,
):
    """Checkpointed flagship run: per-tile overlay results are written
    atomically under ``out_dir``; a rerun recomputes only missing tiles,
    then the (cheap) border stitch + finalize re-run over the union.
    Work lost on a crash is bounded by the tiles in flight."""
    from .. import stages
    from ..state import manifest

    cfg = cfg or ResolveConfig()
    plan = prepare(ds, cfg)
    t = cfg.topology
    grid = plan.grid
    fp = manifest.config_fingerprint(cfg)

    done = manifest.completed_tiles(out_dir, fp)
    unwrapped = ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")
    routed = unwrapped.map_batches(stages.Route(plan.cut), batch_format="pyarrow")
    if done:
        import numpy as np
        import pyarrow as pa

        done_arr = np.fromiter(done, dtype=np.int64, count=len(done))

        def drop_done(tb: "pa.Table") -> "pa.Table":
            keep = ~np.isin(tb["tile"].to_numpy(), done_arr)
            return tb.filter(pa.array(keep))

        routed = routed.map_batches(drop_done, batch_format="pyarrow")
    routed = routed.union(rd.from_arrow(_marker_table(plan, exclude=done)))
    coarse_level = _coarse_level(plan, t.base_level)
    pending = routed.groupby("tile").map_groups(
        _TileOverlayWriter(
            grid, t.utm, cfg.clean.min_area_to_keep, coarse_level, out_dir, fp,
            clean=cfg.clean,
        ),
        batch_format="pyarrow",
    )
    pending.count()  # drive the checkpointing pass

    faces = manifest.read_all(out_dir)
    mid_level = _mid_level(coarse_level)
    st = faces.groupby("stitch_key").map_groups(
        stages.StitchLocal(mid_level), batch_format="pyarrow"
    )
    if mid_level is not None:
        st = st.groupby("stitch_key").map_groups(
            stages.stitch_mid, batch_format="pyarrow"
        )
    stitched = st.groupby("stitch_key").map_groups(
        stages.stitch_global, batch_format="pyarrow"
    )
    return _finalize_join(stitched, ds, grid, t.utm)
