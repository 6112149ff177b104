"""Sources: deterministic synthetic polygon-document layer + readers.

The reference's regression fixtures are Norwegian municipality polygons
(overlap_gap_input_t1.sql: 428 rows, EPSG:4258, deliberately overlapping
with slivers/gaps).  This generator reproduces that *shape* synthetically
(FIXTURES.md F1): jittered-grid star polygons whose radii straddle half
the pitch so neighbours overlap 1-5% and leave gaps; every ~53rd polygon
has a hole, every ~97th is an invalid bowtie (exercising the
_input_geo_is_valid path, function_resolve_overlap_gap_post.sql:48-59),
every ~41st duplicates its left neighbour (containment/dedup path).

Everything is seeded and pure — same (n, seed) => byte-identical table.
Geometry rides inside span-wrapped documents (driver input_hint); the
table is written as Parquet (Lance is the nominal production format but
the lance package is not available in this environment — Parquet is the
stand-in with an identical Arrow schema).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import spans as spans_mod
from .geom import wkb

ORIGIN_LON = 5.0
ORIGIN_LAT = 58.0
PITCH = 0.05  # degrees between polygon centres


def synth_polygon_docs(n: int, seed: int = 42) -> pa.Table:
    """Deterministic document table of n overlapping polygons (see module doc)."""
    rng = np.random.default_rng(seed)
    m = max(1, math.ceil(math.sqrt(n)))
    doc_ids = []
    span_lists = []
    for i in range(n):
        gx, gy = i % m, i // m
        jx, jy = rng.uniform(-0.15, 0.15, 2)
        cx = ORIGIN_LON + (gx + 0.5 + jx) * PITCH
        cy = ORIGIN_LAT + (gy + 0.5 + jy) * PITCH
        r_base = PITCH * rng.uniform(0.42, 0.78)
        k = int(rng.integers(5, 10))
        ang = np.sort(rng.uniform(0, 2 * math.pi, k))
        radii = r_base * rng.uniform(0.8, 1.15, k)
        xs = cx + radii * np.cos(ang)
        ys = cy + radii * np.sin(ang)
        ring = np.stack([xs, ys], axis=1)
        rings = [ring]
        if i % 53 == 7 and k >= 6:
            h = r_base * 0.2
            rings.append(
                np.array(
                    [[cx - h, cy - h], [cx - h, cy + h], [cx + h, cy + h], [cx + h, cy - h]]
                )
            )
        if i % 97 == 13 and k >= 5:
            ring = ring.copy()
            ring[[0, 2]] = ring[[2, 0]]  # bowtie: invalid self-intersection
            rings[0] = ring
        if i % 41 == 3 and i > 0:
            # duplicate of previous polygon, shrunk (contained overlap)
            prev = span_lists[-1]
            prev_hex = next(s[1] for s in prev if s[0] == spans_mod.GEOMETRY_KIND)
            prev_rings = wkb.decode_polygon_rings(bytes.fromhex(prev_hex))
            c = prev_rings[0].mean(axis=0)
            rings = [c + (prev_rings[0] - c) * 0.6]
        wkb_hex = wkb.encode_polygon(rings).hex()
        sp = [
            ("text", f"Parcel {i} municipal boundary record.", "", 0),
            (spans_mod.GEOMETRY_KIND, wkb_hex, "", 1),
            ("attr:c2", f"name_{i:06d}", "", 2),
            ("attr:c3", f"region_{i % 7}", "", 3),
        ]
        if i % 11 == 5:
            sp.append(("media", "", f"mask://tiles/{i:08d}.bin", 4))
        doc_ids.append(str(i))
        span_lists.append(sp)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "spans": spans_mod.make_spans_column(span_lists),
        }
    )


def docs_path_for(sf_dir: str, n: int, seed: int = 42) -> str:
    """Write (once, cached) the synthetic polygon-doc table for a test scale.

    Cache key includes n and seed; lives under /tmp so reruns are free and
    /root/testdata stays untouched.
    """
    cache = f"/tmp/rogray_fixtures/polydocs_n{n}_s{seed}.parquet"
    if not os.path.exists(cache):
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp"
        pq.write_table(synth_polygon_docs(n, seed), tmp)
        os.replace(tmp, cache)
    return cache


def scale_rows(sf_dir: str) -> int:
    """Polygon count proportional to the driver scale factor (sf0.01 -> 6k)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.01
    return max(64, int(600_000 * sf))
