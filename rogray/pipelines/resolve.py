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
    mnx, mny, mxx, mxy = stages.extent_of_docs(ds)
    grid = stages.grid_from_extent(mnx, mny, mxx, mxy, t.snap_tolerance)
    unwrapped = ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")
    cut = stages.compute_cut(
        unwrapped,
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
    # the two heavy stateful stages hold the actor pools
    faces = routed.groupby("tile").map_groups(
        stages.TileOverlay,
        fn_constructor_args=(grid, t.utm, cfg.clean.min_area_to_keep),
        batch_format="pyarrow",
        concurrency=overlay_concurrency or (1, 8),
    )
    stitched = faces.groupby("stitch_key").map_groups(
        stages.stitch_group, batch_format="pyarrow"
    )
    # broadcast winner attributes/spans once (scale path: Dataset.join on pk)
    docs_ref = ray.put(_collect_doc_map(ds))
    result = stitched.map_batches(
        stages.Finalize,
        fn_constructor_args=(grid, t.utm, docs_ref),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return result


def _collect_doc_map(ds) -> dict:
    """pk -> (doc_id, spans) for the attribute-copy join.

    NOTE scale: fine while the winner side fits the object store (it is
    broadcast once via ray.put, read per actor).  For inputs beyond that,
    switch resolve_overlap_gap to Dataset.join(faces, docs, on='pk') —
    tracked in SURVEY.md section 7.4.
    """
    out = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids = batch["doc_id"].to_pylist()
        spans = batch["spans"].to_pylist()
        for did, sp in zip(ids, spans):
            try:
                pk = int(did)
            except (TypeError, ValueError):
                pk = hash(did) & 0x7FFFFFFFFFFFFFFF
            out[pk] = (did, sp)
    return out
