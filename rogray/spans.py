"""Interleaved text+media document wrapper (driver-mandated input shape).

Input tables are documents: (doc_id: string, spans: list<struct<kind:string,
text:string, media_ref:string, offset:int32>>).  Geometry rides in the span
with kind == 'geometry' (WKB hex in ``text``); attributes in 'attr:<name>'
spans; 'text' / 'media' spans pass through the engine untouched
(per-row span-sequence invariant: kind, text, media_ref, order).

All pack/unpack stays in Arrow (zero-copy list/struct columns); pandas is
never involved so binary/list columns don't degrade to object dtype.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
SPANS_TYPE = pa.list_(SPAN_TYPE)

GEOMETRY_KIND = "geometry"


def make_spans_column(span_lists: list[list[tuple[str, str, str, int]]]) -> pa.Array:
    return pa.array(
        [
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in spans
            ]
            for spans in span_lists
        ],
        type=SPANS_TYPE,
    )


def extract_geometry_wkb(spans_col: pa.ChunkedArray | pa.Array) -> list[bytes | None]:
    """WKB bytes of the first 'geometry' span per document (None if absent).

    Vectorized: flatten the list<struct> column once, find geometry spans
    with an Arrow equality kernel, pick the first per parent row — no
    to_pylist of the nested column (that walk dominated the unwrap stage)."""
    import pyarrow.compute as pc

    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    n = len(spans_col)
    out: list[bytes | None] = [None] * n
    if n == 0:
        return out
    flat = spans_col.flatten()
    if len(flat) == 0:
        return out
    parents = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)
    is_geo = pc.fill_null(
        pc.equal(flat.field("kind"), GEOMETRY_KIND), False
    ).to_numpy(zero_copy_only=False)
    geo_idx = np.flatnonzero(is_geo)
    if len(geo_idx) == 0:
        return out
    geo_parents = parents[geo_idx]
    # parents are non-decreasing: first geometry span per row
    rows, first_pos = np.unique(geo_parents, return_index=True)
    sel = geo_idx[first_pos]
    hexes = flat.field("text").take(pa.array(sel, pa.int64())).to_pylist()
    for p, hx in zip(rows.tolist(), hexes):
        out[p] = bytes.fromhex(hx) if hx else None
    return out


def extract_attr(spans_col: pa.ChunkedArray | pa.Array, name: str) -> list[str | None]:
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    kind = f"attr:{name}"
    out: list[str | None] = []
    for doc in spans_col.to_pylist():
        val = None
        for s in doc or []:
            if s["kind"] == kind:
                val = s["text"]
                break
        out.append(val)
    return out


def rewrite_geometry_span(
    spans: list[dict], new_wkb_hex: str
) -> list[dict]:
    """Return the span list with the geometry span's text replaced; all other
    spans byte-identical and in order (the per-row invariant)."""
    out = []
    done = False
    for s in spans:
        if not done and s["kind"] == GEOMETRY_KIND:
            out.append({**s, "text": new_wkb_hex})
            done = True
        else:
            out.append(s)
    if not done:
        out.append(
            {
                "kind": GEOMETRY_KIND,
                "text": new_wkb_hex,
                "media_ref": "",
                "offset": (out[-1]["offset"] + 1) if out else 0,
            }
        )
    return out
