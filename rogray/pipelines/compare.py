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


def _summarize(report_ds) -> dict:
    df = report_ds.to_pandas()
    over = df[df["kind"] == "overlap"]
    gap = df[df["kind"] == "gap"]
    return {
        "n_overlap_pairs": int(len(over)),
        "overlap_area": float(over["area"].sum()),
        "n_gap_cells": int(len(gap)),
        "gap_area": float(gap["area"].sum()),
    }


def compare_result(docs_ds, result_ds, cfg: ResolveConfig | None = None) -> pd.DataFrame:
    """Before/after table: one row per phase, overlap + gap statistics.

    NB the detector's 'gap' includes the outside-data portion of each tile
    (same as the reference's ST_Difference(cell, union(data)),
    find_overlap_and_gap-pre.sql:652-692), so gap_area does not go to zero
    — the signal is overlap_area: >0 before, == 0 after.
    """
    cfg = cfg or ResolveConfig()
    before = _summarize(detect.find_overlap_gap(docs_ds, cfg))
    # pin the (output-sized, small) result once: the detector takes three
    # passes over its input (extent, histogram, route) and must not re-run
    # the whole resolve pipeline for each
    result_ds = result_ds.materialize()
    after = _summarize(detect.find_overlap_gap(_result_as_docs(result_ds), cfg))
    rows = [{"phase": "before", **before}, {"phase": "after", **after}]
    return pd.DataFrame(rows)
