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
