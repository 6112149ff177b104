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

import ray
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
        stages.TileOverlay(grid, t.utm, cfg.clean.min_area_to_keep, coarse_level),
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
    stitched = st.groupby("stitch_key").map_groups(
        stages.stitch_global, batch_format="pyarrow"
    )
    return _finalize_join(stitched, ds, grid, t.utm)


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


def _finalize_join(stitched, ds, grid, utm):
    """JT7 attribute copy as a distributed left hash join on winner_pk
    (cell.sql:869-873) — no driver-side materialization of the input."""

    def docs_min(t):
        import json

        import pyarrow as pa

        from ..ids import stable_pk

        ids = t["doc_id"].to_pylist()
        pks = [stable_pk(did) for did in ids]
        # Arrow join cannot carry list<struct> payloads: spans ride as JSON
        spans_json = [
            json.dumps(
                [[sp["kind"], sp["text"], sp["media_ref"], sp["offset"]] for sp in doc]
            )
            for doc in t["spans"].to_pylist()
        ]
        return pa.table(
            {
                "pk": pa.array(pks, pa.int64()),
                "w_doc_id": t["doc_id"].combine_chunks(),
                "w_spans_json": pa.array(spans_json, pa.string()),
            }
        )

    def prep(t):
        import pyarrow as pa

        # Arrow hash join rejects list payload columns: encode `others`
        # as a string, drop `cov` (not part of the output schema)
        others = [",".join(map(str, o or [])) for o in t["others"].to_pylist()]
        return (
            t.drop_columns(["cov", "others", "stitch_key", "kind"])
            .append_column("others_s", pa.array(others, pa.string()))
        )

    stitched = stitched.map_batches(prep, batch_format="pyarrow")
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # Ray's hash join broadcasts the left schema to all join partitions from
    # the FIRST left block only — and marks the broadcast done even when
    # that block is a 0-row schema-less block emitted by an upstream sort
    # (ray.data hash_shuffle._shuffle_block early-returns on num_rows==0 but
    # _has_schemas_broadcasted is set regardless).  A partition that then
    # receives no left rows builds a schema-less table and the Arrow join
    # raises "No match for FieldRef(winner_pk)".  Rebuilding blocks here
    # scrubs schema-less empties; it runs on the trimmed face schema (rings
    # + 5 scalar cols), not the raw input.
    stitched = stitched.repartition(max(2, cpus // 2))
    docs_side = ds.map_batches(docs_min, batch_format="pyarrow")
    joined = stitched.join(
        docs_side,
        join_type="left_outer",
        num_partitions=max(2, cpus // 2),
        on=("winner_pk",),
        right_on=("pk",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
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

    def __init__(self, grid, utm, min_area, coarse_level, out_dir, cfg_fp):
        from .. import stages

        self.__name__ = "TileOverlayWriter"  # map_groups task-fn contract

        self._inner = stages.TileOverlay(grid, utm, min_area, coarse_level)
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
            grid, t.utm, cfg.clean.min_area_to_keep, coarse_level, out_dir, fp
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
