"""Sharded multi-file input layout.

A 100 TB input is tens of thousands of parquet shard files, never one.
Every pipeline must (a) produce IDENTICAL output whether the same rows
arrive as one file or N, (b) keep its metadata pre-screen honest on a
directory input — the fan-out gate must reject on the SUMMED shard sizes
(a per-file check would sneak a huge sharded input through), and (c) get
one read task per shard so ingest parallelism scales with file count.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"
N_DOCS = 600
N_SHARDS = 16


def _docs(shards: int):
    import ray.data as rd

    from rogray import sources

    return rd.read_parquet(sources.docs_path_for(SF, N_DOCS, shards=shards))


def _cfg():
    from rogray.config import ResolveConfig, TopologyConfig

    return ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1e-5, utm=False, max_rows_in_each_cell=400, base_level=2
        )
    )


def _faces_df(res) -> pd.DataFrame:
    df = res.select_columns(
        ["doc_id", "winner_pk", "other_intersect_id_list", "input_geo_is_valid", "area"]
    ).to_pandas()
    df["other_intersect_id_list"] = df["other_intersect_id_list"].map(
        lambda v: tuple(v) if v is not None else ()
    )
    return df.sort_values(["doc_id", "winner_pk", "area"]).reset_index(drop=True)


def test_sharded_resolve_detect_minhash_match_single_file(ray_session):
    from rogray import dedup
    from rogray.pipelines import detect, resolve

    single = _docs(1)
    sharded = _docs(N_SHARDS)
    assert sharded.count() == single.count() == N_DOCS

    # the read plans over every shard file (ingest parallelism follows the
    # file count at real shard sizes; tiny test files may be packed into
    # fewer read tasks by Ray's own heuristics)
    assert len(sharded.input_files()) == N_SHARDS

    cfg = _cfg()
    pd.testing.assert_frame_equal(
        _faces_df(resolve.resolve_overlap_gap(single, cfg)),
        _faces_df(resolve.resolve_overlap_gap(sharded, cfg)),
    )

    def pairs_df(ds):
        df = detect.find_overlap_gap(ds, cfg).to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(pairs_df(_docs(1)), pairs_df(_docs(N_SHARDS)))

    # minhash runs on the text `documents` table: shard that one too
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    shard_dir = "/tmp/rogray_fixtures/documents_sharded_k16"
    if not os.path.isdir(shard_dir):
        tmp = shard_dir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        tbl = pq.read_table(f"{SF}/documents.parquet")
        step = -(-len(tbl) // N_SHARDS)
        for i, off in enumerate(range(0, len(tbl), step)):
            pq.write_table(
                tbl.slice(off, step).combine_chunks(),
                os.path.join(tmp, f"part-{i:05d}.parquet"),
            )
        os.replace(tmp, shard_dir)

    def mh_df(ds):
        df = dedup.minhash_lsh_pairs(ds).to_pandas()
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        mh_df(rd.read_parquet(f"{SF}/documents.parquet")),
        mh_df(rd.read_parquet(shard_dir)),
    )


def test_gate_prescreen_sums_shard_sizes(ray_session, monkeypatch):
    """The fan-out pre-screen must see the DIRECTORY's total bytes: with
    the limit squeezed between one shard's size and the total, the gate
    must fail over to streaming even though every individual file is
    tiny.  (A per-file metadata check would wrongly pass, and at 100 TB
    every shard of a huge input is individually small.)"""
    import os

    from rogray import sources, stages

    path = sources.docs_path_for(SF, N_DOCS, shards=N_SHARDS)
    files = sorted(os.listdir(path))
    assert len(files) == N_SHARDS
    sizes = [os.path.getsize(os.path.join(path, f)) for f in files]

    ds = _docs(N_SHARDS)
    total = stages.safe_size_bytes(ds)
    # metadata size of the directory input is the sum over shards
    assert total is not None and total >= sum(sizes) * 0.5
    assert total > max(sizes)

    limit = int(max(sizes) * 2)
    assert limit < total  # the squeeze is real: one shard passes, sum fails
    refs, _ = stages.small_input_refs(ds, limit=limit)
    assert refs is None  # gate rejected on the SUMMED size

    out, _ = stages.small_group_fanout(
        ds, ds, "doc_id", lambda t: t, limit=limit
    )
    assert out is None  # same for the groupby gate's hint pre-screen
