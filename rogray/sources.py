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


def docs_path_for(sf_dir: str, n: int, seed: int = 42, shards: int = 1) -> str:
    """Write (once, cached) the synthetic polygon-doc table for a test scale.

    Cache key includes n and seed; lives under /tmp so reruns are free and
    /root/testdata stays untouched.  ``shards > 1`` writes the SAME rows
    as a directory of ``shards`` parquet files (contiguous row ranges) and
    returns the directory — the shape of a real 100 TB input, which is
    tens of thousands of shard files, never one; ``read_parquet`` on the
    directory yields one read task per file, so ingest parallelism scales
    with the shard count instead of being pinned to one file's row
    groups."""
    if shards <= 1:
        cache = f"/tmp/rogray_fixtures/polydocs_n{n}_s{seed}.parquet"
        if not os.path.exists(cache):
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            tmp = cache + ".tmp"
            pq.write_table(synth_polygon_docs(n, seed), tmp)
            os.replace(tmp, cache)
        return cache
    cache = f"/tmp/rogray_fixtures/polydocs_n{n}_s{seed}_k{shards}"
    if not os.path.isdir(cache):
        tmp = cache + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        tbl = synth_polygon_docs(n, seed)
        step = -(-len(tbl) // shards)
        for i, off in enumerate(range(0, len(tbl), step)):
            pq.write_table(
                tbl.slice(off, step).combine_chunks(),
                os.path.join(tmp, f"part-{i:05d}.parquet"),
            )
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


# ---------------------------------------------------------------------------
# Interchange readers: newline-delimited GeoJSON (RFC 8142) and WKT-in-CSV.
#
# The reference ingests "any PostgreSQL table" (types.sql:2-18); users
# switching to this engine hold their layers in files.  Both readers are
# streaming Ray Data pipelines — read_text / read_csv shards the input,
# a stateless map_batches parses each shard into the span-document schema
# every pipeline here consumes.  Parsers are from scratch (no GDAL/shapely
# in this environment, and none needed for these two formats).
# ---------------------------------------------------------------------------

_WKT_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


def _parse_wkt(text: str) -> tuple[int, list[list[np.ndarray]]] | None:
    """WKT POLYGON / MULTIPOLYGON / LINESTRING -> (wkb geom type, parts).

    parts: list of polygons (each a list of rings) or, for a linestring,
    a single [ [coords] ].  Returns None for empty/unsupported geometry.
    """
    import re

    s = text.strip()
    up = s.upper()

    def rings_of(block: str) -> list[np.ndarray]:
        out = []
        for grp in re.findall(r"\(([^()]+)\)", block):
            pts = []
            for pair in grp.split(","):
                nums = re.findall(_WKT_NUM, pair)
                if len(nums) < 2:
                    return []
                pts.append((float(nums[0]), float(nums[1])))
            out.append(np.array(pts, dtype=np.float64))
        return out

    if up.startswith("MULTIPOLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        # split top-level polygon blocks by paren depth
        polys, depth, start = [], 0, None
        for i, ch in enumerate(body):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    polys.append(body[start : i + 1])
        parts = [rings_of(p) for p in polys]
        parts = [p for p in parts if p]
        return (wkb.MULTIPOLYGON, parts) if parts else None
    if up.startswith("POLYGON"):
        rr = rings_of(s)
        return (wkb.POLYGON, [rr]) if rr else None
    if up.startswith("LINESTRING"):
        import re as _re

        nums = _re.findall(_WKT_NUM, s)
        if len(nums) < 4:
            return None
        xy = np.array(nums, dtype=np.float64).reshape(-1, 2)
        return (wkb.LINESTRING, [[xy]])
    return None


def _geom_to_wkb_hex(gtype: int, parts: list[list[np.ndarray]]) -> str:
    if gtype == wkb.LINESTRING:
        return wkb.encode_linestring(parts[0][0]).hex()
    if len(parts) == 1:
        return wkb.encode_polygon(parts[0]).hex()
    return wkb.encode_multipolygon(parts).hex()


def _doc_rows(ids: list[str], geoms: list[str], attrs: list[list[tuple[str, str]]]) -> pa.Table:
    span_lists = []
    for g, at in zip(geoms, attrs):
        sp = [(spans_mod.GEOMETRY_KIND, g, "", 0)]
        sp += [(f"attr:{k}", str(v), "", o + 1) for o, (k, v) in enumerate(at)]
        span_lists.append(sp)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "spans": spans_mod.make_spans_column(span_lists),
        }
    )


def read_geojsonseq_docs(path: str, id_property: str = "id"):
    """Newline-delimited GeoJSON Features -> span-document Dataset.

    doc_id comes from the Feature `id` member, else properties[id_property],
    else the feature's 0-based position within its shard is rejected —
    ids must be explicit (positional ids are not stable under resharding).
    All scalar properties become attr: spans.  Unsupported geometry types
    are skipped (count them via the input/output row delta).
    """
    import json

    import ray.data as rd

    def parse(t: pa.Table) -> pa.Table:
        ids, geoms, attrs = [], [], []
        for line in t["text"].to_pylist():
            line = line.strip().lstrip("\x1e")  # RFC 8142 RS prefix
            if not line:
                continue
            feat = json.loads(line)
            if feat.get("type") != "Feature":
                continue
            geom = feat.get("geometry") or {}
            gt = geom.get("type")
            if gt == "Polygon":
                parts = [[np.array(r, dtype=np.float64) for r in geom["coordinates"]]]
                gtype = wkb.POLYGON
            elif gt == "MultiPolygon":
                parts = [
                    [np.array(r, dtype=np.float64) for r in poly]
                    for poly in geom["coordinates"]
                ]
                gtype = wkb.MULTIPOLYGON
            elif gt == "LineString":
                parts = [[np.array(geom["coordinates"], dtype=np.float64)]]
                gtype = wkb.LINESTRING
            else:
                continue
            props = feat.get("properties") or {}
            did = feat.get("id", props.get(id_property))
            if did is None:
                raise ValueError("GeoJSON feature without id / id property")
            ids.append(str(did))
            geoms.append(_geom_to_wkb_hex(gtype, parts))
            attrs.append(
                [
                    (k, v)
                    for k, v in sorted(props.items())
                    if k != id_property and not isinstance(v, (dict, list))
                ]
            )
        return _doc_rows(ids, geoms, attrs)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_wkt_csv_docs(path: str, id_col: str = "id", wkt_col: str = "wkt"):
    """CSV with a WKT geometry column -> span-document Dataset.

    Remaining columns become attr: spans.  Rows whose WKT fails to parse
    are dropped (same skip contract as the GeoJSON reader).
    """
    import ray.data as rd

    def parse(t: pa.Table) -> pa.Table:
        ids, geoms, attrs = [], [], []
        other_cols = [c for c in t.column_names if c not in (id_col, wkt_col)]
        id_vals = t[id_col].to_pylist()
        wkt_vals = t[wkt_col].to_pylist()
        other = {c: t[c].to_pylist() for c in other_cols}
        for i, w in enumerate(wkt_vals):
            parsed = _parse_wkt(w or "")
            if parsed is None:
                continue
            ids.append(str(id_vals[i]))
            geoms.append(_geom_to_wkb_hex(*parsed))
            attrs.append([(c, other[c][i]) for c in other_cols])
        return _doc_rows(ids, geoms, attrs)

    return rd.read_csv(path).map_batches(parse, batch_format="pyarrow")


class _WideRowsToDocs:
    """(pk, WKB geometry[, attr...]) wide rows -> span documents — the
    reference's ingest contract (any PostgreSQL table with a primary key
    and a geometry column, ``types.sql:2-18``), shared by the Lance and
    SQL readers below.  Picklable (map_batches callable)."""

    def __init__(self, id_col: str, wkb_col: str):
        self.id_col = id_col
        self.wkb_col = wkb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = [str(v) for v in t[self.id_col].to_pylist()]
        geoms = [
            w.hex() if isinstance(w, (bytes, bytearray)) else str(w or "")
            for w in t[self.wkb_col].to_pylist()
        ]
        other_cols = [
            c for c in t.column_names if c not in (self.id_col, self.wkb_col)
        ]
        other = {c: t[c].to_pylist() for c in other_cols}
        attrs = [
            [(c, other[c][i]) for c in other_cols if other[c][i] is not None]
            for i in range(len(ids))
        ]
        return _doc_rows(ids, geoms, attrs)


def read_lance_docs(path: str, id_col: str = "id", wkb_col: str = "geom", **read_kwargs):
    """Lance dataset -> span-document Dataset (BASELINE.json names Lance
    as an input format).  Thin wrapper over ``ray.data.read_lance`` (a
    streaming fragment-parallel read) + the shared wide-row mapper.  The
    ``lance`` package is absent in this environment, so the wrapper
    raises a clear dependency error here; the mapper itself is exercised
    by tests through in-memory Arrow tables."""
    import ray.data as rd

    try:
        ds = rd.read_lance(path, **read_kwargs)
    except ImportError as e:  # pragma: no cover - env without pylance
        raise RuntimeError(
            "read_lance_docs requires the 'lance' package (pip install "
            "pylance), which is not installed in this environment"
        ) from e
    return ds.map_batches(_WideRowsToDocs(id_col, wkb_col), batch_format="pyarrow")


def read_sql_docs(
    table: str,
    id_col: str = "id",
    wkb_col: str = "geom",
    *,
    dsn: str | None = None,
    connection_factory=None,
    shard_keys: list[str] | None = None,
    override_num_blocks: int | None = None,
):
    """SQL table -> span-document Dataset via ``ray.data.read_sql``.

    The reference ingests any PostgreSQL table (``types.sql:2-18``: pk +
    WKB geometry + arbitrary attribute columns); this is the engine-side
    analogue for ANY DBAPI source.  Pass ``dsn`` for PostgreSQL (needs
    psycopg2, absent in this environment — a clear error says so) or a
    ``connection_factory`` for any other driver (tests exercise the full
    plumbing through DuckDB's DBAPI connection).  ``shard_keys``
    (defaulting to the pk for PG sources) makes the read a fan-out of
    hash-sharded queries instead of one giant scan — at 100 TB table
    sizes a single-query read is wrong."""
    import ray.data as rd

    if connection_factory is None:
        if dsn is None:
            raise ValueError("read_sql_docs needs dsn= or connection_factory=")
        try:
            import psycopg2
        except ImportError as e:
            raise RuntimeError(
                "read_sql_docs with dsn= requires psycopg2 (pip install "
                "psycopg2-binary), which is not installed in this "
                "environment; pass connection_factory= for other drivers"
            ) from e

        def connection_factory():
            return psycopg2.connect(dsn)

        if shard_keys is None:
            shard_keys = [id_col]
    kw = {}
    if shard_keys:
        kw["shard_keys"] = shard_keys
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    ds = rd.read_sql(f"SELECT * FROM {table}", connection_factory, **kw)
    return ds.map_batches(_WideRowsToDocs(id_col, wkb_col), batch_format="pyarrow")


def docs_to_geojsonseq(t: pa.Table) -> pa.Table:
    """Span documents -> one GeoJSON Feature line per document (the sink
    converter; pair with write_csv-free text output or any line sink)."""
    import json

    lines = []
    for did, doc in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist()):
        geom_hex = next(
            (s["text"] for s in doc or [] if s["kind"] == spans_mod.GEOMETRY_KIND), None
        )
        if geom_hex is None:
            continue
        gtype, parts = wkb.decode(bytes.fromhex(geom_hex))

        def closed(r):
            # GeoJSON rings are explicitly closed; the engine stores them open
            pts = r.tolist()
            if pts and pts[0] != pts[-1]:
                pts.append(pts[0])
            return pts

        if gtype == wkb.LINESTRING:
            gj = {"type": "LineString", "coordinates": parts[0][0].tolist()}
        elif gtype == wkb.MULTIPOLYGON and len(parts) > 1:
            gj = {
                "type": "MultiPolygon",
                "coordinates": [[closed(r) for r in poly] for poly in parts],
            }
        else:
            gj = {"type": "Polygon", "coordinates": [closed(r) for r in parts[0]]}
        props = {
            s["kind"][5:]: s["text"]
            for s in doc or []
            if s["kind"].startswith("attr:")
        }
        lines.append(
            json.dumps(
                {"type": "Feature", "id": did, "geometry": gj, "properties": props},
                separators=(",", ":"),
            )
        )
    return pa.table({"text": pa.array(lines, pa.string())})
