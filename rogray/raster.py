"""Raster -> vector: binary masks vectorized into the tile frame.

The north rule's raster<->vector join path: media spans reference raster
masks; masks are vectorized to polygons on the SAME global snap grid the
vector layer uses, so the resulting polygons flow straight into the tile
overlay / PIP machinery.

The vectorization is real (grid-edge extraction + the engine's own
polygonize — a from-scratch marching-squares equivalent for binary masks);
the DECODE of real image formats is stubbed (no image libs in this
environment): decode_mask() understands only the deterministic synthetic
`mask://` scheme and raises NotImplementedError for anything else, with
the Ray-side plumbing (schema, actor signature, batch layout) real and
tested.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import stages
from .geom import polygonize
from .spans import GEOMETRY_KIND


def decode_mask(media_ref: str, height: int = 32, width: int = 32) -> np.ndarray:
    """Deterministic fake decoder for `mask://` refs; stub otherwise.

    A real deployment plugs an image codec in here (actor-pool __init__
    loads it once); the rest of the pipeline is format-agnostic.
    """
    if not media_ref.startswith("mask://"):
        raise NotImplementedError(
            f"real media decoding not available in this environment: {media_ref!r}"
        )
    seed = zlib.crc32(media_ref.encode("utf-8"))
    rng = np.random.default_rng(seed)
    # smooth-ish blob: threshold a low-res random field upsampled
    low = rng.standard_normal((4, 4))
    up = np.kron(low, np.ones((height // 4, width // 4)))
    return up > 0.2


def vectorize_mask(
    mask: np.ndarray, origin_px: tuple[int, int] = (0, 0), cell_px: int = 1
) -> list[list[np.ndarray]]:
    """Binary mask -> polygons (list of ring lists, shell first) in snap px.

    Cell (row i, col j) covers [x0+j*c, x0+(j+1)*c] x [y0+i*c, y0+(i+1)*c].
    Boundary edges between 1-cells cancel pairwise; the remainder
    polygonizes into shells + holes with the engine's own machinery —
    exactly the marching-squares contour set for a binary image.
    """
    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape
    x0, y0 = origin_px
    ii, jj = np.nonzero(mask)
    if len(ii) == 0:
        return []
    # 4 CCW edges per 1-cell (interior on the left)
    xl = x0 + jj * cell_px
    xr = xl + cell_px
    yb = y0 + ii * cell_px
    yt = yb + cell_px
    segs = np.concatenate(
        [
            np.stack([xl, yb, xr, yb], axis=1),  # bottom, ->right
            np.stack([xr, yb, xr, yt], axis=1),  # right, ->up
            np.stack([xr, yt, xl, yt], axis=1),  # top, ->left
            np.stack([xl, yt, xl, yb], axis=1),  # left, ->down
        ]
    ).astype(np.int64)
    # cancel opposite duplicates (vectorized, same trick as the stitch)
    side = np.ones(len(segs), dtype=np.int64)
    flip = (segs[:, 0] > segs[:, 2]) | (
        (segs[:, 0] == segs[:, 2]) & (segs[:, 1] > segs[:, 3])
    )
    segs[flip] = segs[flip][:, [2, 3, 0, 1]]
    side[flip] = -1
    order = np.lexsort((segs[:, 3], segs[:, 2], segs[:, 1], segs[:, 0]))
    segs, side = segs[order], side[order]
    same_prev = np.r_[False, np.all(segs[1:] == segs[:-1], axis=1)]
    run_id = np.cumsum(~same_prev)
    pos = np.zeros(run_id.max() + 1, dtype=np.int64)
    neg = np.zeros(run_id.max() + 1, dtype=np.int64)
    np.add.at(pos, run_id, (side == 1).astype(np.int64))
    np.add.at(neg, run_id, (side == -1).astype(np.int64))
    both = (pos[run_id] > 0) & (neg[run_id] > 0)
    segs, side = segs[~both], side[~both]
    labels = [frozenset([(0, int(s))]) for s in side]
    arr = polygonize.polygonize(segs, labels)
    out = []
    for f in arr.faces:
        if 0 in f.cov:
            out.append([f.shell] + f.holes)
    return out


class MaskVectorize:
    """Actor-pool map_batches stage: media spans -> mask polygons.

    Emits one row per polygon: (doc_id, media_ref, rings packed px,
    n_cells) in the global tile frame, ready to join against the vector
    layer (point-in-polygon / overlay).
    """

    def __init__(self, mask_scale_px: int = 64):
        self.mask_scale_px = mask_scale_px

    def __call__(self, t: pa.Table) -> pa.Table:
        from . import stages

        spans_col = t["spans"].combine_chunks()
        doc_ids = t["doc_id"].to_pylist()
        out = {"doc_id": [], "media_ref": [], "rings": [], "n_cells": []}
        for i, doc in enumerate(spans_col.to_pylist()):
            for s in doc or []:
                if s["kind"] != "media" or not s["media_ref"]:
                    continue
                try:
                    mask = decode_mask(s["media_ref"])
                except NotImplementedError:
                    continue
                polys = vectorize_mask(
                    mask, origin_px=(0, 0), cell_px=self.mask_scale_px
                )
                for rings in polys:
                    out["doc_id"].append(doc_ids[i])
                    out["media_ref"].append(s["media_ref"])
                    out["rings"].append(stages.pack_rings(rings))
                    out["n_cells"].append(int(mask.sum()))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "media_ref": pa.array(out["media_ref"], pa.string()),
                "rings": pa.array(out["rings"], pa.large_binary()),
                "n_cells": pa.array(out["n_cells"], pa.int64()),
            }
        )


def vectorize_masks(docs_ds, mask_scale_px: int = 64, concurrency=(1, 4)):
    return docs_ds.map_batches(
        MaskVectorize,
        fn_constructor_args=(mask_scale_px,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Vector -> raster: even-odd scanline rasterization to RLE pixel runs.
#
# The other half of the north rule's raster<->vector path.  Output is
# run-length scanline rows (zone, cy, x0, x1) — the representation that
# stays bounded at 100 TB (a 2320^2-px tile is ~5M cells per-pixel but only
# ~height runs per polygon), shuffles by (zone, cy) key, and converts back
# to per-pixel values only inside a vectorized aggregate.
# ---------------------------------------------------------------------------


def scanline_runs(
    polys: list[list[np.ndarray]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batched even-odd pixel-center scanline fill.

    polys: one entry per polygon — a list of rings (shell + holes), each an
    (n, 2) array in pixel coordinates.  A pixel (cx, cy) covers the unit
    cell [cx, cx+1) x [cy, cy+1); it is filled iff its CENTER
    (cx+.5, cy+.5) is inside the polygon under the even-odd rule with
    half-open crossing intervals ([ymin, ymax) per edge, [xa, xb) per
    span), so two faces sharing an edge claim each center exactly once.

    Returns (poly_idx, cy, x0, x1) int64 arrays; each run covers
    cx in [x0, x1).  All steps are numpy over the whole batch.
    """
    ex0, ey0, ex1, ey1, epi = [], [], [], [], []
    for p, rings in enumerate(polys):
        for r in rings:
            r = np.asarray(r, dtype=np.float64)
            if len(r) < 3:
                continue
            if r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]:
                r = np.vstack([r, r[:1]])
            ex0.append(r[:-1, 0]); ey0.append(r[:-1, 1])
            ex1.append(r[1:, 0]); ey1.append(r[1:, 1])
            epi.append(np.full(len(r) - 1, p, dtype=np.int64))
    empty = (np.empty(0, np.int64),) * 4
    if not ex0:
        return empty
    x0 = np.concatenate(ex0); y0 = np.concatenate(ey0)
    x1 = np.concatenate(ex1); y1 = np.concatenate(ey1)
    pi = np.concatenate(epi)
    keep = y0 != y1  # horizontal edges never cross a center scanline
    x0, y0, x1, y1, pi = x0[keep], y0[keep], x1[keep], y1[keep], pi[keep]
    if len(x0) == 0:
        return empty
    ylo = np.minimum(y0, y1)
    yhi = np.maximum(y0, y1)
    cy_start = np.ceil(ylo - 0.5).astype(np.int64)   # first cy with cy+.5 >= ylo
    cy_stop = np.ceil(yhi - 0.5).astype(np.int64)    # first cy with cy+.5 >= yhi
    counts = np.maximum(0, cy_stop - cy_start)
    total = int(counts.sum())
    if total == 0:
        return empty
    eidx = np.repeat(np.arange(len(counts)), counts)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total) - np.repeat(offs, counts)
    cy = cy_start[eidx] + within
    yc = cy + 0.5
    # x at the scanline crossing (edge direction does not matter)
    xx = x0[eidx] + (yc - y0[eidx]) * (x1[eidx] - x0[eidx]) / (y1[eidx] - y0[eidx])
    gp = pi[eidx]
    order = np.lexsort((xx, cy, gp))
    gp, cy, xx = gp[order], cy[order], xx[order]
    # pair consecutive crossings within each (poly, cy) group
    new_grp = np.r_[True, (gp[1:] != gp[:-1]) | (cy[1:] != cy[:-1])]
    grp_id = np.cumsum(new_grp) - 1
    starts = np.flatnonzero(new_grp)
    pos = np.arange(len(gp)) - starts[grp_id]
    # guard: drop an unpaired trailing crossing (degenerate float geometry)
    sizes = np.diff(np.r_[starts, len(gp)])
    ok = pos < (sizes[grp_id] & ~np.int64(1))
    gp, cy, xx, pos = gp[ok], cy[ok], xx[ok], pos[ok]
    xa = xx[pos % 2 == 0]
    xb = xx[pos % 2 == 1]
    rp = gp[pos % 2 == 0]
    rc = cy[pos % 2 == 0]
    rx0 = np.ceil(xa - 0.5).astype(np.int64)
    rx1 = np.ceil(xb - 0.5).astype(np.int64)
    nz = rx1 > rx0
    return rp[nz], rc[nz], rx0[nz], rx1[nz]


def raster_field(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Deterministic synthetic raster value at pixel (x, y): (7x+13y) mod 97.

    Stands in for a real tiled raster source (which a deployment would read
    per-tile inside the same actor pool); the formula is reproduced verbatim
    in the DuckDB oracles so zonal statistics are exactly checkable.
    """
    return (7 * xs + 13 * ys) % 97


def run_value_stats(
    cy: np.ndarray, x0: np.ndarray, x1: np.ndarray, value_fn=raster_field
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-run (n_px, sum_v, min_v, max_v) via ragged pixel enumeration.

    Vectorized over the whole batch of runs: one ragged arange builds every
    covered pixel x once, reduceat folds per run.  Chunked callers keep the
    transient arrays bounded (a run batch of 1M px is ~24 MB)."""
    n = (x1 - x0).astype(np.int64)
    total = int(n.sum())
    n_px = n
    if total == 0:
        z = np.empty(0, np.int64)
        return n_px, z, z, z
    offs = np.concatenate([[0], np.cumsum(n)[:-1]])
    ridx = np.repeat(np.arange(len(n)), n)
    xs = np.arange(total) - np.repeat(offs, n) + x0[ridx]
    vals = value_fn(xs, cy[ridx]).astype(np.int64)
    nonempty = n > 0
    red = np.flatnonzero(nonempty)
    sum_v = np.zeros(len(n), np.int64)
    min_v = np.zeros(len(n), np.int64)
    max_v = np.zeros(len(n), np.int64)
    bounds = offs[red]
    sum_v[red] = np.add.reduceat(vals, bounds)
    min_v[red] = np.minimum.reduceat(vals, bounds)
    max_v[red] = np.maximum.reduceat(vals, bounds)
    return n_px, sum_v, min_v, max_v


class _FacesToRuns:
    """map_batches task: resolved faces (wkb, zone col) -> pixel runs.

    Decodes each face polygon, converts world coords to the snap-pixel
    frame, scanline-fills the whole batch in one numpy pass, and tags each
    run with a hash bucket of (zone, cy) so the single downstream groupby
    co-locates exactly the runs that may need merging."""

    def __init__(self, grid, zone_col: str, n_buckets: int):
        self.grid = grid
        self.zone_col = zone_col
        self.n_buckets = n_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        from .geom import wkb as wkb_mod

        g = self.grid
        zones = t[self.zone_col].to_numpy(zero_copy_only=False).astype(np.int64)
        polys = []
        for wb in t["wkb"].to_pylist():
            rings = wkb_mod.decode_polygon_rings(wb)
            polys.append(
                [
                    np.column_stack(
                        [
                            (r[:, 0] - g.origin_x) / g.precision,
                            (r[:, 1] - g.origin_y) / g.precision,
                        ]
                    )
                    for r in rings
                ]
            )
        p, cy, x0, x1 = scanline_runs(polys)
        zone = zones[p]
        h = (
            zone.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + cy.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        bkt = (h % np.uint64(self.n_buckets)).astype(np.int64)
        return pa.table(
            {
                "zone": pa.array(zone, pa.int64()),
                "cy": pa.array(cy, pa.int64()),
                "x0": pa.array(x0, pa.int64()),
                "x1": pa.array(x1, pa.int64()),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )


def _merge_runs_bucket(g: pa.Table) -> pa.Table:
    """Vectorized island merge for one bucket: runs of the same (zone, cy)
    that touch or overlap fuse into maximal runs (faces partition the
    plane, so within a key the sorted runs are disjoint and x1 is
    monotone — a run continues the island iff x0 <= previous x1)."""
    zone = g["zone"].to_numpy()
    cy = g["cy"].to_numpy()
    x0 = g["x0"].to_numpy()
    x1 = g["x1"].to_numpy()
    order = np.lexsort((x0, cy, zone))
    zone, cy, x0, x1 = zone[order], cy[order], x0[order], x1[order]
    new_key = np.r_[True, (zone[1:] != zone[:-1]) | (cy[1:] != cy[:-1])]
    starts = new_key.copy()
    starts[1:] |= x0[1:] > x1[:-1]
    isl = np.flatnonzero(starts)
    ends = np.r_[isl[1:], len(zone)] - 1
    return pa.table(
        {
            "zone": pa.array(zone[isl], pa.int64()),
            "cy": pa.array(cy[isl], pa.int64()),
            "x0": pa.array(x0[isl], pa.int64()),
            "x1": pa.array(x1[ends], pa.int64()),
        }
    )


def rasterize_faces(faces_ds, grid, zone_col: str = "winner_pk", n_buckets: int | None = None):
    """Resolved-face Dataset -> merged mosaic pixel runs (zone, cy, x0, x1).

    One batched scanline pass per block, ONE shuffle keyed by a hash bucket
    of (zone, cy) — the only co-location the island merge needs — then a
    vectorized merge per bucket.  Runs stay RLE end to end; nothing
    enumerates pixels.

    n_buckets defaults to _n_buckets_for(face count) so shuffle-group count
    scales with the input (a fixed count means giant merge groups at 100 TB).
    Sizing needs the face count, so the default path materializes faces_ds
    once — the faces feed the shuffle anyway; pass n_buckets explicitly to
    keep a purely streaming plan."""
    from .dedup import _n_buckets_for

    if n_buckets is None:
        faces_ds = faces_ds.materialize()
        # ~8 (zone, cy) scanline keys per face is a safe overestimate
        n_buckets = _n_buckets_for(faces_ds.count() * 8)
    runs = faces_ds.map_batches(
        _FacesToRuns(grid, zone_col, n_buckets), batch_format="pyarrow"
    )
    return stages.gated_groupby(faces_ds, runs, "bkt", _merge_runs_bucket)


_PX_CHUNK = 4_000_000  # max pixels enumerated per vectorized stats pass


class _DocsToZonalStats:
    """map_batches task: unwrapped polygons -> per-row zonal raster stats.

    Each row carries a whole polygon, so its stats are complete within the
    batch; the downstream groupby only folds multi-polygon documents."""

    def __init__(self, value_fn=raster_field):
        self.value_fn = value_fn

    def __call__(self, t: pa.Table) -> pa.Table:
        from . import stages as stages_mod

        rings_col = t["rings"].to_pylist()
        polys = [stages_mod.unpack_rings(b)[0] for b in rings_col]
        p, cy, x0, x1 = scanline_runs(polys)
        n_px = np.zeros(len(polys), np.int64)
        sum_v = np.zeros(len(polys), np.int64)
        min_v = np.full(len(polys), np.iinfo(np.int64).max, np.int64)
        max_v = np.full(len(polys), np.iinfo(np.int64).min, np.int64)
        lo = 0
        while lo < len(p):
            hi = lo
            px = 0
            while hi < len(p) and px < _PX_CHUNK:
                px += int(x1[hi] - x0[hi])
                hi += 1
            n, s, mn, mx = run_value_stats(cy[lo:hi], x0[lo:hi], x1[lo:hi], self.value_fn)
            pi = p[lo:hi]
            ne = n > 0
            np.add.at(n_px, pi, n)
            np.add.at(sum_v, pi, s)
            np.minimum.at(min_v, pi[ne], mn[ne])
            np.maximum.at(max_v, pi[ne], mx[ne])
            lo = hi
        keep = n_px > 0
        return pa.table(
            {
                "zone_id": pc.cast(t["doc_id"], pa.string()).filter(
                    pa.array(keep)
                ),
                "n_px": pa.array(n_px[keep], pa.int64()),
                "sum_v": pa.array(sum_v[keep], pa.int64()),
                "min_v": pa.array(min_v[keep], pa.int64()),
                "max_v": pa.array(max_v[keep], pa.int64()),
            }
        )


def zonal_stats(docs_ds, cfg=None, plan=None, value_fn=raster_field):
    """Per-document raster-zone statistics over the synthetic raster field.

    documents Dataset -> Unwrap (snap to the global grid) -> batched
    scanline fill -> chunked ragged value fold -> groupby(doc) aggregate.
    A real deployment swaps value_fn for a tiled raster reader inside the
    same stage; everything else is unchanged."""
    from ray.data.aggregate import Max, Min, Sum

    from . import stages as stages_mod
    from .pipelines.resolve import prepare
    from .config import ResolveConfig

    cfg = cfg or ResolveConfig()
    if plan is None:
        input_refs, docs_ds = stages_mod.small_input_refs(docs_ds)
        plan = prepare(docs_ds, cfg, input_refs=input_refs)
    unwrapped = docs_ds.map_batches(stages_mod.Unwrap(plan.grid), batch_format="pyarrow")
    partial = unwrapped.map_batches(_DocsToZonalStats(value_fn), batch_format="pyarrow")
    return partial.groupby("zone_id").aggregate(
        Sum("n_px", alias_name="n_px"),
        Sum("sum_v", alias_name="sum_v"),
        Min("min_v", alias_name="min_v"),
        Max("max_v", alias_name="max_v"),
    )
