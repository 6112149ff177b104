"""Minimal WKB/EWKB codec (2D Point / LineString / Polygon / MultiPolygon).

From-scratch implementation of the OGC WKB wire format (public spec); no
GEOS/shapely in this environment.  Rings are returned as (N, 2) float64
arrays WITHOUT the repeated closing vertex (closed on encode).
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 1, 2, 3, 4, 5, 6
_SRID_FLAG = 0x20000000
_Z_FLAG = 0x80000000
_M_FLAG = 0x40000000


class WkbError(ValueError):
    pass


def _read_header(buf: memoryview, off: int) -> tuple[str, int, int]:
    bo = "<" if buf[off] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", buf, off + 1)
    off += 5
    if gtype & (_Z_FLAG | _M_FLAG):
        raise WkbError("only 2D geometries supported")
    if gtype & _SRID_FLAG:
        off += 4  # skip SRID (EWKB)
        gtype &= ~_SRID_FLAG
    return bo, gtype, off


def _read_coords(buf: memoryview, off: int, n: int, bo: str) -> tuple[np.ndarray, int]:
    arr = np.frombuffer(buf, dtype=("<f8" if bo == "<" else ">f8"), count=2 * n, offset=off)
    return arr.reshape(n, 2).astype(np.float64), off + 16 * n


def decode(wkb: bytes) -> tuple[int, list[list[np.ndarray]]]:
    """Decode WKB -> (geom_type, parts).

    parts layout: Point -> [[ (1,2) ]], LineString -> [[ (N,2) ]],
    Polygon -> [[ring0, ring1, ...]], MultiPolygon -> [poly0_rings, ...].
    Polygon rings have the closing vertex stripped.
    """
    buf = memoryview(wkb)
    bo, gtype, off = _read_header(buf, 0)
    if gtype == POINT:
        xy, _ = _read_coords(buf, off, 1, bo)
        return POINT, [[xy]]
    if gtype == LINESTRING:
        (n,) = struct.unpack_from(bo + "I", buf, off)
        xy, _ = _read_coords(buf, off + 4, n, bo)
        return LINESTRING, [[xy]]
    if gtype == POLYGON:
        rings, _ = _read_polygon_body(buf, off, bo)
        return POLYGON, [rings]
    if gtype == MULTIPOLYGON:
        (np_, ) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        polys = []
        for _ in range(np_):
            bo2, gt2, off = _read_header(buf, off)
            if gt2 != POLYGON:
                raise WkbError("MultiPolygon member is not a Polygon")
            rings, off = _read_polygon_body(buf, off, bo2)
            polys.append(rings)
        return MULTIPOLYGON, polys
    raise WkbError(f"unsupported geometry type {gtype}")


def _read_polygon_body(buf: memoryview, off: int, bo: str) -> tuple[list[np.ndarray], int]:
    (nrings,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        (n,) = struct.unpack_from(bo + "I", buf, off)
        xy, off = _read_coords(buf, off + 4, n, bo)
        if n >= 2 and xy[0, 0] == xy[-1, 0] and xy[0, 1] == xy[-1, 1]:
            xy = xy[:-1]
        rings.append(xy)
    return rings, off


def decode_polygon_rings(wkb: bytes) -> list[np.ndarray]:
    """All rings of a Polygon/MultiPolygon, exterior(s) first per polygon."""
    gtype, parts = decode(wkb)
    if gtype == POLYGON:
        return parts[0]
    if gtype == MULTIPOLYGON:
        return [r for poly in parts for r in poly]
    raise WkbError(f"expected polygonal geometry, got type {gtype}")


def scan_coord_bboxes(
    wkbs: list,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bbox-only WKB scan: (row_idx, minx, miny, maxx, maxy) for every
    decodable polygonal/linestring geometry, without building per-ring
    arrays — the content-balance histogram needs only bbox centres, and the
    per-ring numpy allocations of a full decode dominated that pass.  One
    frombuffer over the concatenated coordinate payloads, one reduceat per
    bound.  Undecodable / truncated / empty rows are skipped exactly like
    the per-row decode path."""
    chunks: list[bytes] = []
    gid_lens: list[int] = []
    rows: list[int] = []
    for i, wb in enumerate(wkbs):
        if not wb or len(wb) < 9 or wb[0] != 1:
            continue
        gtype = int.from_bytes(wb[1:5], "little")
        total = 0
        parts: list[bytes] = []
        off = 9
        if gtype == LINESTRING:
            n = int.from_bytes(wb[5:9], "little")
            parts.append(wb[9 : 9 + 16 * n])
            off = 9 + 16 * n
            total = n
        elif gtype == POLYGON:
            nr = int.from_bytes(wb[5:9], "little")
            for _ in range(nr):
                if off + 4 > len(wb):
                    off = len(wb) + 1
                    break
                n = int.from_bytes(wb[off : off + 4], "little")
                off += 4
                parts.append(wb[off : off + 16 * n])
                off += 16 * n
                total += n
        elif gtype == MULTIPOLYGON:
            npolys = int.from_bytes(wb[5:9], "little")
            for _ in range(npolys):
                if off + 9 > len(wb):
                    off = len(wb) + 1
                    break
                nr = int.from_bytes(wb[off + 5 : off + 9], "little")
                off += 9
                for _ in range(nr):
                    if off + 4 > len(wb):
                        off = len(wb) + 1
                        break
                    n = int.from_bytes(wb[off : off + 4], "little")
                    off += 4
                    parts.append(wb[off : off + 16 * n])
                    off += 16 * n
                    total += n
        else:
            continue
        if total == 0 or off > len(wb):  # empty or truncated: skip the row
            continue
        chunks.extend(parts)
        gid_lens.append(total)
        rows.append(i)
    if not rows:
        z = np.empty(0, np.float64)
        return np.empty(0, np.int64), z, z, z, z
    coords = np.frombuffer(b"".join(chunks), dtype="<f8").reshape(-1, 2)
    lens = np.asarray(gid_lens, np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    return (
        np.asarray(rows, np.int64),
        np.minimum.reduceat(coords[:, 0], offs),
        np.minimum.reduceat(coords[:, 1], offs),
        np.maximum.reduceat(coords[:, 0], offs),
        np.maximum.reduceat(coords[:, 1], offs),
    )


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, x, y)


def encode_linestring(xy: np.ndarray) -> bytes:
    xy = np.asarray(xy, dtype="<f8")
    return struct.pack("<BII", 1, LINESTRING, len(xy)) + xy.tobytes()


def _ring_bytes(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype="<f8")
    if len(ring) == 0 or (ring[0] != ring[-1]).any():
        ring = np.vstack([ring, ring[:1]])
    return struct.pack("<I", len(ring)) + ring.tobytes()


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    body = b"".join(_ring_bytes(r) for r in rings)
    return struct.pack("<BII", 1, POLYGON, len(rings)) + body


def encode_polygons_packed(
    F: np.ndarray, offs: np.ndarray, lens: np.ndarray, face_nr: np.ndarray
) -> list[bytes]:
    """encode_polygon for many faces over one concatenated C-contiguous
    float64 (N,2) array — byte-identical to the per-face path.  The
    open-ring closure decision uses the same float comparison _ring_bytes
    makes; the coordinate payload is one memcpy per ring."""
    n_rings = len(lens)
    need = np.zeros(n_rings, dtype=bool)
    if n_rings:
        nz = lens > 0
        first = F[offs[nz]]
        last = F[(offs + lens)[nz] - 1]
        need[nz] = (first != last).any(axis=1)
    out_lens = lens + need
    res: list[bytes] = []
    ri = 0
    pack_hdr = struct.pack
    for f in range(len(face_nr)):
        nr = int(face_nr[f])
        parts = [pack_hdr("<BII", 1, POLYGON, nr)]
        for _ in range(nr):
            s = int(offs[ri])
            n = int(lens[ri])
            parts.append(pack_hdr("<I", int(out_lens[ri]) if n else 0))
            parts.append(F[s : s + n].tobytes())
            if n and need[ri]:
                parts.append(F[s : s + 1].tobytes())
            ri += 1
        res.append(b"".join(parts))
    return res


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    body = b"".join(encode_polygon(rings) for rings in polys)
    return struct.pack("<BII", 1, MULTIPOLYGON, len(polys)) + body
