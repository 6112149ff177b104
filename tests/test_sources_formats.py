"""Interchange readers (GeoJSONSeq, WKT-CSV): parse parity with the
parquet path, proven by running the REAL detect pipeline on the same
rectangle layer ingested three ways."""

import csv
import json
import os

import numpy as np
import pyarrow as pa
import pytest

from rogray import rectlayer, sources
from rogray.geom import wkb

SF = "/root/testdata/sf0.001"


def _rect_features(sf_dir):
    import pyarrow.parquet as pq

    k = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])[
        "p_partkey"
    ].to_numpy().astype(np.int64)
    x1, y1, x2, y2 = rectlayer.rect_corners(k)
    for i in range(len(k)):
        ring = [
            [float(x1[i]), float(y1[i])],
            [float(x2[i]), float(y1[i])],
            [float(x2[i]), float(y2[i])],
            [float(x1[i]), float(y2[i])],
            [float(x1[i]), float(y1[i])],
        ]
        yield int(k[i]), ring


def _write_fixtures(tmpdir):
    gj = os.path.join(tmpdir, "rects.geojsonl")
    ck = os.path.join(tmpdir, "rects.csv")
    with open(gj, "w") as f:
        for k, ring in _rect_features(SF):
            f.write(
                json.dumps(
                    {
                        "type": "Feature",
                        "id": str(k),
                        "geometry": {"type": "Polygon", "coordinates": [ring]},
                        "properties": {"name": f"r{k}"},
                    }
                )
                + "\n"
            )
    with open(ck, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "wkt", "name"])
        for k, ring in _rect_features(SF):
            pts = ", ".join(f"{x:g} {y:g}" for x, y in ring)
            w.writerow([str(k), f"POLYGON (({pts}))", f"r{k}"])
    return gj, ck


def _overlap_pairs(docs):
    from rogray.pipelines import detect

    cfg = rectlayer.rect_cfg()
    plan = rectlayer.rect_plan(docs, cfg)
    rep = detect.find_overlap_gap(docs, cfg, plan).to_pandas()
    rep = rep[rep.kind == "overlap"]
    out = {}
    for r in rep.itertuples():
        key = (int(r.id1), int(r.id2))
        out[key] = out.get(key, 0.0) + float(r.area)
    return {k: round(v) for k, v in out.items()}


class TestInterchangeReaders:
    def test_geojson_and_wkt_paths_match_parquet(self, ray_session, tmp_path):
        gj, ck = _write_fixtures(str(tmp_path))
        want = _overlap_pairs(rectlayer.rect_docs(SF))
        got_gj = _overlap_pairs(sources.read_geojsonseq_docs(gj))
        got_ck = _overlap_pairs(sources.read_wkt_csv_docs(ck))
        assert got_gj == want
        assert got_ck == want

    def test_geojson_roundtrip(self, ray_session, tmp_path):
        gj, _ = _write_fixtures(str(tmp_path))
        docs = sources.read_geojsonseq_docs(gj)
        lines = docs.map_batches(
            sources.docs_to_geojsonseq, batch_format="pyarrow"
        ).to_pandas()["text"]
        by_id = {}
        for ln in lines:
            f = json.loads(ln)
            by_id[f["id"]] = f
        for k, ring in _rect_features(SF):
            f = by_id[str(k)]
            assert f["geometry"]["type"] == "Polygon"
            assert f["geometry"]["coordinates"] == [ring]
            assert f["properties"]["name"] == f"r{k}"

    def test_wkt_parser_variants(self):
        g = sources._parse_wkt(
            "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)),"
            " ((10 10, 12 10, 12 12, 10 12, 10 10)))"
        )
        assert g is not None and g[0] == wkb.MULTIPOLYGON
        polys = g[1]
        assert len(polys) == 2 and len(polys[0]) == 2 and len(polys[1]) == 1
        ls = sources._parse_wkt("LINESTRING (0 0, 1.5 2.5, -3e1 4)")
        assert ls is not None and ls[0] == wkb.LINESTRING
        assert ls[1][0][0].shape == (3, 2) and ls[1][0][0][2, 0] == -30.0
        assert sources._parse_wkt("POINT (1 2)") is None
        assert sources._parse_wkt("") is None


class TestSqlAndLanceReaders:
    def _write_duckdb(self, tmpdir: str) -> str:
        """Rectangle layer as a DBAPI-readable DuckDB file: pk + WKB blob +
        an attribute column — the reference's any-PG-table ingest shape."""
        import duckdb

        db = os.path.join(tmpdir, "rects.duckdb")
        con = duckdb.connect(db)
        con.execute("CREATE TABLE rects (id VARCHAR, geom BLOB, name VARCHAR)")
        for k, ring in _rect_features(SF):
            blob = wkb.encode_polygon([np.array(ring[:-1], dtype=np.float64)])
            con.execute("INSERT INTO rects VALUES (?, ?, ?)", [str(k), blob, f"r{k}"])
        con.close()
        return db

    def test_sql_reader_matches_parquet(self, ray_session, tmp_path):
        """read_sql_docs through a real DBAPI connection (DuckDB stands in
        for PostgreSQL — same plumbing, different factory) feeds the real
        detect pipeline identically to the parquet path."""
        db = self._write_duckdb(str(tmp_path))

        def factory():
            import duckdb

            return duckdb.connect(db, read_only=True)

        docs = sources.read_sql_docs("rects", connection_factory=factory)
        assert _overlap_pairs(docs) == _overlap_pairs(rectlayer.rect_docs(SF))

    def test_sql_reader_without_driver_raises_clearly(self):
        with pytest.raises(RuntimeError, match="psycopg2"):
            sources.read_sql_docs("t", dsn="postgresql://localhost/x")
        with pytest.raises(ValueError, match="dsn= or connection_factory="):
            sources.read_sql_docs("t")

    def test_lance_reader_without_package_raises_clearly(self, ray_session):
        with pytest.raises((RuntimeError, ImportError), match="lance"):
            sources.read_lance_docs("/tmp/nonexistent.lance")

    def test_wide_rows_mapper_contract(self):
        """The shared wide-row mapper (Lance + SQL readers): WKB bytes or
        hex, None attributes dropped, ids stringified."""
        blob = wkb.encode_polygon(
            [np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)]
        )
        t = pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "geom": pa.array([blob, blob], pa.binary()),
                "name": pa.array(["a", None], pa.string()),
            }
        )
        out = sources._WideRowsToDocs("id", "geom")(t)
        assert out["doc_id"].to_pylist() == ["1", "2"]
        spans0 = out["spans"].to_pylist()[0]
        kinds = [s["kind"] for s in spans0]
        assert "geometry" in kinds[0] or any("geometry" in k for k in kinds)
        assert any(s["kind"] == "attr:name" and s["text"] == "a" for s in spans0)
        spans1 = out["spans"].to_pylist()[1]
        assert not any(s["kind"] == "attr:name" for s in spans1)  # None dropped
