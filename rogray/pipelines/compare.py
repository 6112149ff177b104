"""QA comparator: resolve_overlap_gap_compare_result (reference A8,
src/test/sql/regress/resolve_overlap_gap_compare_result.sql).

Re-runs the overlap/gap detector on the INPUT layer and on the RESOLVED
output and tabulates both — after a resolve run, residual overlap area
must be ~0 (the reference's regression asserts exactly this).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..config import ResolveConfig
from . import detect


def _result_as_docs(result_ds):
    """Wrap resolved faces back into the document shape the detector reads."""

    def wrap(t: pa.Table) -> pa.Table:
        wkbs = t["wkb"].to_pylist()
        n = len(t)
        spans = [
            [
                {
                    "kind": "geometry",
                    "text": (w or b"").hex(),
                    "media_ref": "",
                    "offset": 0,
                }
            ]
            for w in wkbs
        ]
        import hashlib

        from ..spans import SPANS_TYPE

        # globally-unique deterministic ids (faces are disjoint, so their
        # WKB is unique)
        ids = [hashlib.md5(w or b"").hexdigest()[:16] for w in wkbs]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "spans": pa.array(spans, SPANS_TYPE),
            }
        )

    return result_ds.map_batches(wrap, batch_format="pyarrow")


def _sum_row(ds, cols: list[str]) -> dict:
    """Dataset.sum over partial-count columns -> plain dict (0 on empty)."""
    out = ds.sum(cols)
    if out is None:
        return {c: 0 for c in cols}
    if not isinstance(out, dict):  # single column returns a scalar
        return {cols[0]: out or 0}
    return {c: (out.get(f"sum({c})") or 0) for c in cols}


def _summarize(report_ds) -> dict:
    """Overlap/gap totals via Dataset aggregates — the report is per-tile
    PAIR rows and can be huge on a skewed layer, so it never reaches the
    driver."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        is_over = pc.equal(t["kind"], "overlap")
        over_area = pc.sum(pc.if_else(is_over, t["area"], 0.0)).as_py() or 0.0
        gap_area = pc.sum(pc.if_else(is_over, 0.0, t["area"])).as_py() or 0.0
        n_over = pc.sum(pc.cast(is_over, pa.int64())).as_py() or 0
        return pa.table(
            {
                "n_overlap_pairs": pa.array([n_over], pa.int64()),
                "overlap_area": pa.array([over_area], pa.float64()),
                "n_gap_cells": pa.array([len(t) - n_over], pa.int64()),
                "gap_area": pa.array([gap_area], pa.float64()),
            }
        )

    s = _sum_row(
        report_ds.map_batches(partial, batch_format="pyarrow"),
        ["n_overlap_pairs", "overlap_area", "n_gap_cells", "gap_area"],
    )
    return {
        "n_overlap_pairs": int(s["n_overlap_pairs"]),
        "overlap_area": float(s["overlap_area"]),
        "n_gap_cells": int(s["n_gap_cells"]),
        "gap_area": float(s["gap_area"]),
    }


def _input_stats(docs_ds, utm: bool, min_area: float) -> dict:
    """Reference A8 layer stats for the INPUT table: row count, vertex
    count, sub-min_area polygon count
    (resolve_overlap_gap_compare_result.sql:106-156)."""
    from ..geom import core, wkb
    from ..spans import extract_geometry_wkb

    def partial(t: pa.Table) -> pa.Table:
        n_pts = 0
        n_small = 0
        n_geo = 0
        for wb in extract_geometry_wkb(t["spans"]):
            if wb is None:
                continue
            n_geo += 1
            rings = wkb.decode_polygon_rings(wb)
            n_pts += sum(len(r) for r in rings)
            if min_area > 0:
                if utm:
                    a = abs(sum(core.ring_signed_area2(r) for r in rings)) / 2.0
                else:
                    a = abs(sum(core.spherical_ring_area_m2(r) for r in rings))
                if a < min_area:
                    n_small += 1
        return pa.table(
            {
                "n_rows": pa.array([len(t)], pa.int64()),
                "n_rows_attributed": pa.array([n_geo], pa.int64()),
                "n_points": pa.array([n_pts], pa.int64()),
                "n_small_polygons": pa.array([n_small], pa.int64()),
            }
        )

    return _sum_row(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["n_rows", "n_rows_attributed", "n_points", "n_small_polygons"],
    )


def _output_stats(result_ds, min_area: float) -> dict:
    """Same stats for the RESOLVED table; attributed = winner found."""
    import pyarrow.compute as pc

    from ..geom import wkb

    def partial(t: pa.Table) -> pa.Table:
        n_pts = 0
        for wb in t["wkb"].to_pylist():
            if wb:
                n_pts += sum(len(r) for r in wkb.decode_polygon_rings(wb))
        n_attr = pc.sum(pc.cast(pc.is_valid(t["doc_id"]), pa.int64())).as_py() or 0
        n_small = 0
        if min_area > 0:
            n_small = pc.sum(pc.cast(pc.less(t["area"], min_area), pa.int64())).as_py() or 0
        return pa.table(
            {
                "n_rows": pa.array([len(t)], pa.int64()),
                "n_rows_attributed": pa.array([int(n_attr)], pa.int64()),
                "n_points": pa.array([n_pts], pa.int64()),
                "n_small_polygons": pa.array([int(n_small)], pa.int64()),
            }
        )

    return _sum_row(
        result_ds.map_batches(partial, batch_format="pyarrow"),
        ["n_rows", "n_rows_attributed", "n_points", "n_small_polygons"],
    )


def compare_result(docs_ds, result_ds, cfg: ResolveConfig | None = None) -> pd.DataFrame:
    """Before/after table: one row per phase, overlap + gap statistics.

    NB the detector's 'gap' includes the outside-data portion of each tile
    (same as the reference's ST_Difference(cell, union(data)),
    find_overlap_and_gap-pre.sql:652-692), so gap_area does not go to zero
    — the signal is overlap_area: >0 before, == 0 after.
    """
    cfg = cfg or ResolveConfig()
    min_area = cfg.clean.min_area_to_keep
    # pin the (output-sized, small) result once: the detector takes three
    # passes over its input (extent, histogram, route) and must not re-run
    # the whole resolve pipeline for each
    result_ds = result_ds.materialize()
    rows = [
        {
            "phase": "before",
            **_input_stats(docs_ds, cfg.topology.utm, min_area),
            **_summarize(detect.find_overlap_gap(docs_ds, cfg)),
        },
        {
            "phase": "after",
            **_output_stats(result_ds, min_area),
            **_summarize(detect.find_overlap_gap(_result_as_docs(result_ds), cfg)),
        },
    ]
    return pd.DataFrame(rows)
