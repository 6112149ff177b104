"""small_group_fanout tests.

The driver-bounded groupby bypass (stages.small_group_fanout and the
border-stitch fan-out in pipelines/resolve) must be a pure optimization:
identical results to the Ray Data all-to-all it replaces, on every call
site, and a clean fallback when the size gate fails.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _make_sum_by_key():
    # defined as a closure so cloudpickle ships it BY VALUE: the tests
    # module is not importable inside Ray workers
    def _sum_by_key(tbl: pa.Table) -> pa.Table:
        key = tbl["k"][0].as_py()
        return pa.table(
            {
                "k": pa.array([key], pa.int64()),
                "s": pa.array([float(np.sum(tbl["v"].to_numpy()))], pa.float64()),
                "n": pa.array([len(tbl)], pa.int64()),
            }
        )

    return _sum_by_key


def test_fanout_matches_groupby(ray_session):
    import ray.data as rd

    from rogray import stages

    rng = np.random.default_rng(7)
    n = 5000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 97, n), pa.int64()),
            "v": pa.array(rng.standard_normal(n), pa.float64()),
        }
    )

    fn = _make_sum_by_key()
    out, _ = stages.small_group_fanout(rd.from_arrow(tbl), rd.from_arrow(tbl), "k", fn)
    assert out is not None  # tiny input must take the fan-out path
    mine = out.to_pandas().sort_values("k").reset_index(drop=True)

    ref = (
        rd.from_arrow(tbl)
        .groupby("k")
        .map_groups(fn, batch_format="pyarrow")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mine, ref)


def test_fanout_gate_falls_back(ray_session):
    import ray.data as rd

    from rogray import stages

    tbl = pa.table({"k": pa.array([1, 1, 2], pa.int64()), "v": pa.array([1.0, 2.0, 3.0])})
    ds = rd.from_arrow(tbl)
    fn = _make_sum_by_key()
    out, grouped = stages.small_group_fanout(ds, ds, "k", fn, limit=0)
    assert out is None
    # the returned dataset is still usable by the fallback groupby
    assert grouped.groupby("k").map_groups(fn, batch_format="pyarrow").count() == 2


def test_fanout_hint_list_sums(ray_session):
    import ray.data as rd

    from rogray import stages

    tbl = pa.table({"k": pa.array([1] * 100, pa.int64()), "v": pa.array([1.0] * 100)})
    ds = rd.from_arrow(tbl)
    one = ds.size_bytes()
    # two hints, each under the limit, must be gated on their SUM
    fn = _make_sum_by_key()
    out, _ = stages.small_group_fanout([ds, ds], ds, "k", fn, limit=int(one * 1.5))
    assert out is None
    out, _ = stages.small_group_fanout([ds, ds], ds, "k", fn, limit=int(one * 10))
    assert out is not None


def test_resolve_paths_match(ray_session, monkeypatch):
    """Forcing the hash-shuffle groupby + stitch ladder (gates zeroed) must
    produce faces identical to the fan-out path on the same input."""
    import ray.data as rd

    import rogray.sources as sources
    from rogray import stages
    from rogray.config import ResolveConfig, TopologyConfig
    from rogray.pipelines import resolve

    docs_path = sources.docs_path_for(SF, 400)
    cfg = ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1e-5, max_rows_in_each_cell=200, base_level=2
        )
    )

    def run():
        df = resolve.resolve_overlap_gap(rd.read_parquet(docs_path), cfg).to_pandas()
        df["wkb_hex"] = df["wkb"].map(lambda b: b.hex())
        df["spans_n"] = df["spans"].map(len)
        df = df.drop(columns=["spans", "wkb"])
        return df.sort_values(["winner_pk", "tile", "wkb_hex"]).reset_index(drop=True)

    fanout = run()
    monkeypatch.setattr(stages, "SMALL_FANOUT_LIMIT", 0)
    monkeypatch.setattr(resolve, "_SINGLE_STITCH_LIMIT", 0)
    shuffled = run()
    pd.testing.assert_frame_equal(fanout, shuffled)


def test_detect_paths_match(ray_session, monkeypatch):
    import ray.data as rd

    import rogray.sources as sources
    from rogray import stages
    from rogray.config import ResolveConfig, TopologyConfig
    from rogray.pipelines import detect

    docs_path = sources.docs_path_for(SF, 300)
    cfg = ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1e-5, max_rows_in_each_cell=150, base_level=2
        )
    )

    def run():
        df = detect.find_overlap_gap(rd.read_parquet(docs_path), cfg).to_pandas()
        return df.sort_values(["tile", "kind", "id1", "id2"]).reset_index(drop=True)

    fanout = run()
    monkeypatch.setattr(stages, "SMALL_FANOUT_LIMIT", 0)
    shuffled = run()
    pd.testing.assert_frame_equal(fanout, shuffled)


def test_dedup_paths_match(ray_session, monkeypatch):
    """The pandas-format fan-out (minhash banding, pair dedup, verify
    chain) must equal the hash-shuffle groupby chain pair for pair."""
    import ray.data as rd

    from rogray import dedup, stages

    docs = rd.read_parquet(f"{SF}/documents.parquet")

    def run():
        df = dedup.minhash_lsh_pairs(docs).to_pandas()
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    fanout = run()
    monkeypatch.setattr(stages, "SMALL_FANOUT_LIMIT", 0)
    shuffled = run()
    pd.testing.assert_frame_equal(fanout, shuffled)
    assert len(fanout) > 0


def test_pandas_fanout_multikey_dtype_drift_and_blocks(ray_session):
    """The pandas-format fan-out: exact multi-column key groups, per-group
    int64->float64 NaN-upcast drift unified (not an Arrow concat error),
    and the gathered result re-sliced into multiple blocks so downstream
    stages keep their parallelism."""
    import ray.data as rd

    from rogray import stages

    rng = np.random.default_rng(11)
    n = 4000
    tbl = pa.table(
        {
            "a": pa.array(rng.integers(0, 13, n), pa.int64()),
            "b": pa.array([f"s{int(x)}" for x in rng.integers(0, 7, n)]),
            # nulls only in SOME groups: those groups' pandas view upcasts
            # v to float64 while null-free groups keep int64
            "v": pa.array(
                [None if (i % 19 == 0 and i % 2 == 0) else int(i) for i in range(n)],
                pa.int64(),
            ),
        }
    )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False)["v"].min()
        return out[out["v"].notna()]

    src = rd.from_arrow(tbl)
    out, _ = stages.small_group_fanout(
        src, src, ["a", "b"], agg, batch_format="pandas"
    )
    assert out is not None
    assert out.num_blocks() > 1  # re-sliced: never one giant block
    mine = out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    ref = (
        rd.from_arrow(tbl)
        .groupby(["a", "b"])
        .map_groups(agg, batch_format="pandas")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        mine.astype({"v": "float64"}), ref.astype({"v": "float64"})
    )


def test_small_input_refs_gate(ray_session):
    """Gate semantics: refs for bounded inputs, None (+ no recompute
    penalty object) past the limit, None for limit<=0."""
    import ray
    import ray.data as rd

    from rogray import stages

    tbl = pa.table({"x": pa.array(range(1000), pa.int64())})
    refs, ds2 = stages.small_input_refs(rd.from_arrow(tbl))
    assert refs is not None
    got = pa.concat_tables([t for t in ray.get(refs) if t is not None])
    assert got.num_rows == 1000

    refs, ds2 = stages.small_input_refs(rd.from_arrow(tbl), limit=0)
    assert refs is None
    refs, ds2 = stages.small_input_refs(rd.from_arrow(tbl), limit=1)
    assert refs is None  # true-size gate: returns the materialized ds
    assert ds2.count() == 1000


def test_block_map_refs_skips_zero_column_blocks(ray_session):
    """Ray Data pass-through operators emit schema-less empty bundles;
    the plain-task wave must drop them before the partial fn (the
    compare_result regression: KeyError 'spans' on a 0-column block)."""
    import ray

    from rogray import stages

    good = pa.table({"k": pa.array([1, 2], pa.int64())})
    empty = pa.table({})  # zero columns, zero rows

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"k2": pa.compute.multiply(t["k"], 2)})

    refs = [ray.put(good), ray.put(empty), ray.put(good)]
    outs = [t for t in ray.get(stages.block_map_refs(refs, fn)) if t is not None]
    got = pa.concat_tables(outs)
    assert sorted(got["k2"].to_pylist()) == [2, 2, 4, 4]


def test_cut_from_refs_matches_compute_cut(ray_session):
    """The plain-task exact histogram must yield the identical cut to the
    Ray Data compute_cut whenever compute_cut does not sample."""
    import ray
    import ray.data as rd

    import rogray.sources as sources
    from rogray import stages

    docs_path = sources.docs_path_for(SF, 500)
    ds = rd.read_parquet(docs_path)
    grid = stages.world_grid(1e-5)
    slow = stages.compute_cut(ds, grid, 2, 8, 60)
    refs, _ = stages.small_input_refs(ds)
    assert refs is not None
    fast = stages.cut_from_refs(refs, grid, 2, 8, 60)
    assert sorted(fast.leaves) == sorted(slow.leaves)


def test_tile_apply_oversize_falls_back_to_groupby(ray_session, monkeypatch):
    """When routing inflates a table past 4x the gate, tile_apply must run
    the real groupby on the driver-resident table — same result."""
    from rogray import stages
    from rogray.pipelines import resolve

    rng = np.random.default_rng(3)
    n = 2000
    tbl = pa.table(
        {
            "tile": pa.array(rng.integers(0, 17, n), pa.int64()),
            "v": pa.array(rng.standard_normal(n), pa.float64()),
        }
    )

    def per_tile(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tile": pa.array([t["tile"][0].as_py()], pa.int64()),
                "s": pa.array([float(np.sum(t["v"].to_numpy()))], pa.float64()),
            }
        )

    small = (
        resolve.tile_apply(tbl, per_tile)
        .to_pandas()
        .sort_values("tile")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(stages, "SMALL_FANOUT_LIMIT", 1)  # nbytes > 4*1
    big = (
        resolve.tile_apply(tbl, per_tile)
        .to_pandas()
        .sort_values("tile")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, big)


def test_finalize_parts_matches_dataset_join(ray_session):
    """The plain-task finalize wave (parts shape) must be byte-identical
    to the Dataset broadcast join on the same stitched faces."""
    import ray.data as rd

    import rogray.sources as sources
    from rogray import stages
    from rogray.config import ResolveConfig, TopologyConfig
    from rogray.pipelines import resolve

    docs_path = sources.docs_path_for(SF, 400)
    cfg = ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1e-5, max_rows_in_each_cell=200, base_level=2
        )
    )

    def run(as_parts):
        ds = rd.read_parquet(docs_path)
        input_refs, ds = stages.small_input_refs(ds)
        plan = resolve.prepare(ds, cfg, input_refs=input_refs)
        st = resolve.stitched_faces(
            ds, cfg, plan, input_refs=input_refs, as_parts=as_parts
        )
        if isinstance(st, tuple):
            assert as_parts
            _, itbl, srefs = st
            out = resolve._finalize_parts(
                itbl, srefs, ds, plan.grid, cfg.topology.utm
            )
        else:
            assert not as_parts
            out = resolve._finalize_join(st, ds, plan.grid, cfg.topology.utm)
        df = out.to_pandas()
        df["wkb_hex"] = df["wkb"].map(lambda b: b.hex())
        df["spans_r"] = df["spans"].map(repr)
        df = df.drop(columns=["spans", "wkb"])
        return df.sort_values(["winner_pk", "tile", "wkb_hex"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(True), run(False))


def test_whole_bucket_kernels_union_safe(ray_session):
    """The whole_bucket fan-out calls the kernel ONCE on a multi-user
    bucket; pin fn(union) == concat(per-group fn) for the three relational
    kernels that opted in, including the window kernel's overflow-guard
    per-segment loop branch."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 600
    base = 1_700_000_000_000_000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 37, n),
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                base + rng.integers(0, 3_600_000_000 * 48, n), unit="us"
            ),
            "value": rng.uniform(-5, 50, n).round(2),
            "event_type": rng.choice(["click", "error", "view"], n),
        }
    )

    from rogray import relational

    def canon(out: pd.DataFrame) -> pd.DataFrame:
        return (
            out.sort_values(list(out.columns))
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns if c != "user_id" and out[c].dtype != object})
        )

    import tempfile, os, pyarrow as pa, pyarrow.parquet as pq
    import ray.data as rd

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(d, "events.parquet"))
        for build, sql_cols in (
            (relational.events_sessionize, None),
            (relational.events_asof_join, None),
            (relational.events_window_stats, None),
        ):
            got = build(d)
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            import duckdb

            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
            )
            name = build.__name__ + "_sql"
            want = con.execute(getattr(relational, name)()).fetchdf()
            g = canon(got.copy())
            w = canon(want.copy())
            pd.testing.assert_frame_equal(
                g.reset_index(drop=True), w[g.columns].pipe(canon), check_dtype=False
            )

    # overflow-guard loop branch of the window kernel: n_seg * span >= 2^62
    # needs ~550 years of timestamp span x >=270 user segments (a span this
    # wide can't arise from one user within pandas' ns-datetime range, so
    # the guard is belt-and-braces — but it must be correct when hit)
    big = df.copy()
    big["user_id"] = np.arange(n, dtype=np.int64)  # every row its own segment
    lo_us = int(pd.Timestamp("1700-01-01").value // 1000)
    hi_us = int(pd.Timestamp("2250-01-01").value // 1000)
    big["ts"] = pd.to_datetime(rng.integers(lo_us, hi_us, n), unit="us")
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
                       os.path.join(d, "events.parquet"))
        got = relational.events_window_stats(d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        import duckdb

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.execute(relational.events_window_stats_sql()).fetchdf()
        g = canon(got.copy())
        pd.testing.assert_frame_equal(
            g.reset_index(drop=True), want[g.columns].pipe(canon), check_dtype=False
        )


def test_safe_size_bytes_never_executes_derived_plans(ray_session):
    """The fan-out pre-screen must be metadata-only: safe_size_bytes on a
    derived dataset walks the logical plan to its leaf sources instead of
    executing (ds.size_bytes() on a derived dataset EXECUTES its plan on
    Ray 2.49).  The poisoned map fn proves no task ever ran."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rogray import stages

    src = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    on_disk = src.size_bytes()  # metadata lookup for a parquet source

    def boom(t):
        raise RuntimeError("plan executed during pre-screen")

    derived = src.map_batches(boom, batch_format="pyarrow")
    # leaf-source sum == the parquet metadata size, computed without
    # running a single task (boom would raise)
    assert stages.safe_size_bytes(derived) == on_disk
    assert stages.safe_count(derived) == pq.read_metadata(
        f"{SF}/events.parquet"
    ).num_rows

    # union / filter shapes resolve through the walk too
    u = derived.union(src.filter(expr="event_id > 5"))
    assert stages.safe_size_bytes(u) == 2 * on_disk

    # materialized datasets report their true in-memory size
    m = src.materialize()
    assert stages.safe_size_bytes(m) == m.size_bytes()
    assert stages.safe_count(m) == m.count()


def test_fanout_gate_rejects_unsizable_hint_without_executing(ray_session):
    """A derived hint whose plan would have to run to learn its size FAILS
    the pre-screen (streaming fallback) rather than executing it."""
    import ray.data as rd

    from rogray import stages

    tbl = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([1.0, 2.0, 3.0])})
    grouped = rd.from_arrow(tbl)

    executed = []

    class Unsizable:
        """Quacks like a Dataset but has no readable plan metadata."""

        def size_bytes(self):
            executed.append(True)
            return 1

    out, _ = stages.small_group_fanout(Unsizable(), grouped, "k", _make_sum_by_key())
    assert out is None  # gate failed -> caller takes the streaming groupby
    assert not executed  # and size_bytes was never called on the hint


# Every kernel registered in stages.WHOLE_BUCKET_KERNELS must have a named
# union-safety differential in this module; test_whole_bucket_registry_covered
# fails when either side of the pairing is missing, so a new kernel cannot
# opt in to whole-bucket fan-out untested.
WHOLE_BUCKET_UNION_SAFETY_CASES = {
    "events_sessionize": "test_whole_bucket_kernels_union_safe",
    "events_asof_join": "test_whole_bucket_kernels_union_safe",
    "events_window_stats": "test_whole_bucket_kernels_union_safe",
    "exact_dedup.keep_first": "test_exact_dedup_keep_first_union_safe",
}


def test_whole_bucket_registry_covered():
    import sys

    from rogray import stages

    assert set(WHOLE_BUCKET_UNION_SAFETY_CASES) == set(stages.WHOLE_BUCKET_KERNELS), (
        "WHOLE_BUCKET_KERNELS and the union-safety test cases diverged — "
        "register the kernel AND add its differential test"
    )
    mod = sys.modules[__name__]
    for kernel, test_name in WHOLE_BUCKET_UNION_SAFETY_CASES.items():
        assert hasattr(mod, test_name), f"{kernel}: named test {test_name} missing"


def test_whole_bucket_requires_registered_name(ray_session):
    import pytest

    from rogray import stages

    tbl = pa.table({"k": pa.array([1, 1, 2], pa.int64()), "v": pa.array([1, 2, 3], pa.int64())})
    ident = lambda g: g  # noqa: E731
    with pytest.raises(ValueError, match="WHOLE_BUCKET_KERNELS"):
        stages.group_fanout_table(tbl, "k", ident, batch_format="pandas", whole_bucket=True)
    with pytest.raises(ValueError, match="WHOLE_BUCKET_KERNELS"):
        stages.group_fanout_table(
            tbl, "k", ident, batch_format="pandas", whole_bucket="never_registered"
        )


def test_exact_dedup_keep_first_union_safe(ray_session):
    """fn(union of disjoint-h groups) == concat(per-group fn) for the
    exact-dedup keeper — valid because identical texts always share h, so
    the global drop_duplicates can never cancel across h groups."""
    import zlib

    rng = np.random.default_rng(11)
    texts = [f"document body {i % 7}" for i in range(60)]  # heavy duplicates
    df = pd.DataFrame(
        {
            "doc_id": [f"d{i:03d}" for i in rng.permutation(60)],
            "text": texts,
        }
    )
    df["h"] = [zlib.crc32(t.encode()) for t in df["text"]]

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values("doc_id").drop_duplicates(subset=["text"], keep="first")
        return out[["doc_id"]]

    whole = keep_first(df).sort_values("doc_id").reset_index(drop=True)
    per_group = (
        pd.concat([keep_first(g) for _, g in df.groupby("h")])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(whole, per_group)

    # and through the real fan-out machinery: whole-bucket == per-group
    from rogray import stages

    tbl = pa.Table.from_pandas(df, preserve_index=False)
    wb = stages.group_fanout_table(
        tbl, "h", keep_first, batch_format="pandas",
        whole_bucket="exact_dedup.keep_first",
    )
    pg = stages.group_fanout_table(tbl, "h", keep_first, batch_format="pandas")
    a = wb.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pg.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, whole)
