"""Round-4 fix tests.

Covers the VERDICT/ADVICE round-3 items:
  * nearest_geom_join no longer re-shuffles geometry per round — the
    broadcast path, the shuffle fallback (bcast_limit=0) and the
    giant-bbox split all produce identical, oracle-exact results;
  * rasterize_faces' shuffle-bucket default scales with face count and is
    output-equivalent to any explicit bucket count;
  * the n-gram prefix filter's hot-gram sample is a seeded RANDOM sample
    (head-of-dataset sampling degrades on sorted corpora) and stays exact;
  * dissolve_small_faces enforces its driver-pull bound (an adversarial
    everything-is-small layer completes under a tiny cap);
  * ring_signed_area2_batch / rings_are_simple_batch tolerate zero-length
    rings anywhere in the batch.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _nearest_df(**kw):
    from rogray import rectlayer, spatial_query
    import ray.data as rd

    docs = rectlayer.rect_docs(SF)
    cfg = rectlayer.rect_cfg()
    plan = rectlayer.rect_plan(docs, cfg)

    def points(t: pa.Table) -> pa.Table:
        c = t["c_custkey"].to_numpy().astype(np.int64)
        px, py = rectlayer.point_coords(c)
        return pa.table(
            {
                "point_id": pa.array(c, pa.int64()),
                "x": pa.array(px.astype(np.float64), pa.float64()),
                "y": pa.array(py.astype(np.float64), pa.float64()),
            }
        )

    pts = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"]).map_batches(
        points, batch_format="pyarrow"
    )
    res = spatial_query.nearest_geom_join(pts, docs, cfg, plan, level=7, **kw)
    df = res.to_pandas().sort_values("point_id").reset_index(drop=True)
    return df[["point_id", "nearest_pk", "d2_px", "complete"]]


class TestNearestJoinPaths:
    def test_shuffle_fallback_matches_broadcast(self, ray_session):
        """bcast_limit=0 forces BOTH fallbacks (cell-bucket candidate
        shuffle + pk-bucket geometry attach); results must be identical."""
        bcast = _nearest_df()
        shuf = _nearest_df(bcast_limit=0)
        pd.testing.assert_frame_equal(bcast, shuf)
        assert bcast["complete"].all()

    def test_giant_split_is_semantics_neutral(self, ray_session):
        """A tiny giant_cells forces many geometries through the
        always-candidate giant list; the join result must not change."""
        default = _nearest_df()
        giants = _nearest_df(giant_cells=8)
        pd.testing.assert_frame_equal(default, giants)

    def test_giant_overflow_auto_coarsens(self, ray_session):
        """max_giants=0 makes every giant an overflow at level 7; instead
        of raising, the join must auto-coarsen until no bbox exceeds
        giant_cells and return the identical result (level is
        performance-only)."""
        default = _nearest_df()
        coarsened = _nearest_df(giant_cells=64, max_giants=0)
        pd.testing.assert_frame_equal(default, coarsened)

    def test_unsatisfiable_giant_cells_raises_at_level_0(self, ray_session):
        """giant_cells=0 can never be satisfied (every bbox covers >= 1
        cell at any level), so coarsening must terminate at level 0 with
        a clear error instead of looping."""
        with pytest.raises(ValueError, match="even at level 0"):
            _nearest_df(giant_cells=0, max_giants=1)


class TestRasterizeBucketScaling:
    def test_default_bucket_count_grows(self):
        from rogray.dedup import _n_buckets_for

        small = _n_buckets_for(1_000 * 8)
        big = _n_buckets_for(100_000_000 * 8)
        assert small < big
        assert _n_buckets_for(10**13) == 100_003  # capped, never unbounded

    def test_default_output_matches_explicit(self, ray_session):
        """rasterize_faces(default buckets) == rasterize_faces(199) on a
        small synthetic face layer (bucketing must never change runs)."""
        import ray.data as rd

        from rogray import raster
        from rogray.config import GridConfig
        from rogray.geom import wkb as wkb_mod

        grid = GridConfig(origin_x=0.0, origin_y=0.0, span=1024.0, precision=1.0)
        rng = np.random.default_rng(7)
        rows = []
        for i in range(60):
            x0, y0 = rng.integers(0, 900, 2)
            w_, h_ = rng.integers(3, 60, 2)
            ring = np.array(
                [[x0, y0], [x0 + w_, y0], [x0 + w_, y0 + h_], [x0, y0 + h_], [x0, y0]],
                dtype=np.float64,
            )
            rows.append({"wkb": wkb_mod.encode_polygon([ring]), "winner_pk": int(i % 7)})
        faces = rd.from_pandas(pd.DataFrame(rows))

        def runs_df(**kw):
            out = raster.rasterize_faces(faces, grid, **kw).to_pandas()
            return out.sort_values(["zone", "cy", "x0"]).reset_index(drop=True)[
                ["zone", "cy", "x0", "x1"]
            ]

        pd.testing.assert_frame_equal(runs_df(), runs_df(n_buckets=199))


class TestHotGramRandomSample:
    def test_sorted_corpus_stays_exact(self, ray_session, monkeypatch):
        """A corpus sorted so its head is single-topic (the worst case for
        head-of-dataset frequency sampling) with the sample size shrunk to
        force the random path: pairs must still match the exact oracle."""
        import duckdb
        import ray.data as rd

        from rogray import dedup

        monkeypatch.setattr(dedup, "_FREQ_SAMPLE", 32)
        rng = np.random.default_rng(3)
        head = ["the same sentence over and over again"] * 60
        tail = [
            " ".join(
                rng.choice(
                    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"],
                    size=8,
                ).tolist()
            )
            for _ in range(120)
        ]
        texts = head + tail  # clustered: the head misrepresents global df
        tbl = pa.table(
            {
                "doc_id": pa.array([str(i) for i in range(len(texts))]),
                "text": pa.array(texts),
            }
        )
        got = (
            dedup.ngram_jaccard_pairs(rd.from_arrow(tbl))
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", tbl.to_pandas())
        want = (
            con.execute(dedup.ngram_jaccard_sql())
            .df()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        got["id_a"] = got["id_a"].astype(str)
        got["id_b"] = got["id_b"].astype(str)
        want["id_a"] = want["id_a"].astype(str)
        want["id_b"] = want["id_b"].astype(str)
        pd.testing.assert_frame_equal(got, want)
        assert len(got) > 0  # the identical head must pair up


class TestDissolveDriverCap:
    def test_everything_small_completes_under_cap(self, ray_session):
        """Every face below min_area (the adversarial case for the
        driver-side target pull): a cap far below the face count must
        still reach the fixpoint, merging in capped chunks per round."""
        import ray.data as rd

        import rogray.sources as sources
        from rogray.config import ResolveConfig, TopologyConfig
        from rogray.pipelines import resolve

        docs = rd.read_parquet(sources.docs_path_for(SF, 48))
        cfg = ResolveConfig(
            topology=TopologyConfig(
                snap_tolerance=1e-5, utm=False, max_rows_in_each_cell=400,
                base_level=2,
            )
        )
        plan = resolve.prepare(docs, cfg)
        stitched = resolve.stitched_faces(docs, cfg, plan)
        capped = resolve.dissolve_small_faces(
            stitched, plan.grid, cfg.topology.utm, min_area=1e30,
            max_driver_targets=5,
        ).to_pandas()
        free = resolve.dissolve_small_faces(
            resolve.stitched_faces(docs, cfg, plan), plan.grid,
            cfg.topology.utm, min_area=1e30,
        ).to_pandas()
        # min_area=inf dissolves everything absorbable; capped chunking
        # must converge to the same face count
        assert len(capped) == len(free)


class TestZeroLengthRingGuards:
    def test_signed_area_batch_with_empty_rings(self):
        from rogray.geom import core

        sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.int64)
        tri = np.array([[0, 0], [2, 0], [0, 2]], dtype=np.int64)
        empty = np.empty((0, 2), dtype=np.int64)
        # interior AND trailing empties (the two corruption cases)
        got = core.ring_signed_area2_batch([sq, empty, tri, empty])
        assert got.tolist() == [32, 0, 4, 0]

    def test_simple_batch_with_empty_rings(self):
        from rogray.geom import core

        sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.int64)
        bow = np.array([[0, 0], [4, 4], [4, 0], [0, 4]], dtype=np.int64)
        empty = np.empty((0, 2), dtype=np.int64)
        got = core.rings_are_simple_batch([empty, sq, empty, bow, empty])
        assert got.tolist() == [False, True, False, False, False]


def test_smooth_lines_exact_oracle():
    """S1/S2 under a hard value check: the real douglas_peucker +
    chaikins_acute_angle kernels over integer polylines must match the
    recursive-CTE DuckDB twin bit-for-bit (VERDICT round-3 task 9)."""
    import duckdb

    from rogray import spatial_query as sq

    res = (
        sq.smooth_polylines_exact(SF)
        .to_pandas()
        .sort_values(["pk", "seq"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM read_parquet('{SF}/part.parquet')")
    ora = con.execute(sq.SMOOTH_EXACT_SQL).df().sort_values(["pk", "seq"]).reset_index(drop=True)
    assert len(res) == len(ora) > 0
    assert (res["pk"].to_numpy() == ora["pk"].to_numpy()).all()
    assert (res["seq"].to_numpy() == ora["seq"].to_numpy()).all()
    # bit-exact doubles (quarter-of-integer coordinates on both sides)
    assert (res["x"].to_numpy() == ora["x"].to_numpy()).all()
    assert (res["y"].to_numpy() == ora["y"].to_numpy()).all()
    # both transforms actually fired: points dropped by DP, added by chaikin
    import numpy as np

    n_in = sum(20 + (int(k) % 11) for k in np.unique(res["pk"].to_numpy()))
    assert len(res) != n_in
    assert (res["x"].to_numpy() % 1 != 0).any()


def test_hash_shuffle_matches_sort_shuffle(ray_session):
    """Round-4: the geometry pipelines build their exchanges under
    cluster-scaled actor-based hash shuffle (rogray.rayctx) — the
    sort-based default plans one range-partition object per (block x
    partition) pair through driver-coordinated reduces, which measured
    CPU-count-invariant ~11 min at 960k polygons.  The hash plan must
    produce identical faces, and the override must not leak out of the
    pipeline builder."""
    import ray.data as rd
    from ray.data import DataContext

    from rogray import sources
    from rogray.config import ResolveConfig, TopologyConfig
    from rogray.pipelines import resolve

    docs_path = sources.docs_path_for(SF, 300)
    cfg = ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1e-5, max_rows_in_each_cell=150, base_level=2
        )
    )

    def run(fn, expect_strategy=None):
        out = fn(rd.read_parquet(docs_path), cfg)
        if expect_strategy is not None:
            # the planner reads the SOURCE dataset's context, which the
            # whole lineage shares — this asserts the plan the executor
            # will actually use, not the (restored) global context.  A
            # caller-created source dataset used to silently revert the
            # decorated pipelines to sort shuffle.
            assert out.context.shuffle_strategy == expect_strategy
        df = out.to_pandas()
        df["wkb_hex"] = df["wkb"].map(lambda b: b.hex())
        return df.sort_values(["winner_pk", "tile", "wkb_hex"]).reset_index(drop=True)

    ctx = DataContext.get_current()
    before = (
        ctx.shuffle_strategy,
        ctx.default_hash_shuffle_parallelism,
        ctx.max_hash_shuffle_aggregators,
    )
    from ray.data.context import ShuffleStrategy

    hashed = run(
        resolve.resolve_overlap_gap, expect_strategy=ShuffleStrategy.HASH_SHUFFLE
    )  # decorated: hash shuffle
    after = (
        ctx.shuffle_strategy,
        ctx.default_hash_shuffle_parallelism,
        ctx.max_hash_shuffle_aggregators,
    )
    assert after == before  # scoped override restored
    plain = run(resolve.resolve_overlap_gap.__wrapped__)  # sort-shuffle plan
    assert len(hashed) == len(plain) > 0
    for col in ("doc_id", "winner_pk", "tile", "wkb_hex", "area"):
        a, b = hashed[col].to_numpy(), plain[col].to_numpy()
        if a.dtype.kind == "f":  # winner_pk is NaN for gap faces; NaN != NaN
            assert np.array_equal(a, b, equal_nan=True), col
        else:
            assert (a == b).all(), col


def test_hash_shuffle_tolerates_empty_exchanges(ray_session):
    """Ray 2.49's hash shuffle crashes (ArrowInvalid: no match for the sort
    key in an EMPTY schema) when an exchange's first block is empty and some
    partition never receives a non-empty shard — schemas are broadcast with
    the first submitted block, but `_shuffle_block` early-returns for 0-row
    blocks before the broadcast.  rogray.rayctx rebinds the Concat
    aggregation to an empty-safe subclass (the class global is pickled by
    reference into the aggregator actors, so patching the method in place
    never reaches them).  All-empty exchanges are legitimate engine states:
    a converged dissolve fixpoint round, a border-free stitch, a filter
    that drains a tiny layer."""
    import ray.data as rd

    from rogray.rayctx import scaled_hash_shuffle

    def empty(b):
        return pa.table(
            {"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
        )

    with scaled_hash_shuffle():
        all_empty = (
            rd.range(64, override_num_blocks=8)
            .map_batches(empty, batch_format="pyarrow")
            .groupby("k")
            .map_groups(lambda t: t, batch_format="pyarrow")
        )
    assert all_empty.count() == 0

    def first_blocks_empty(b):
        if b["id"][0].as_py() < 32:
            return empty(b)
        return pa.table(
            {"k": pa.array([1, 1, 2], pa.int64()), "v": pa.array([1, 2, 3], pa.int64())}
        )

    with scaled_hash_shuffle():
        partial = (
            rd.range(64, override_num_blocks=8)
            .map_batches(first_blocks_empty, batch_format="pyarrow")
            .groupby("k")
            .map_groups(
                lambda t: pa.table(
                    {"k": t["k"][:1], "n": pa.array([len(t)], pa.int64())}
                ),
                batch_format="pyarrow",
            )
        )
    got = partial.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [1, 2] and list(got["n"]) == [8, 4]


def test_hash_shuffle_retry_policy():
    """Stock shard pushes to the stateful shuffle aggregators are not
    idempotent: a `_shuffle_block` worker crash after its first accepted
    shard, followed by Ray's default crash-retry, re-submits the accepted
    shards and silently DUPLICATES rows.  Round 5 makes the push
    idempotent (retry-stable TaskID push keys, deduped at the aggregator
    — see tests/test_shuffle_retry.py for the kill-a-worker proof), so
    retries are RE-ENABLED when — and only when — the retry-safe rebind
    is in place; if a future Ray breaks the rebind, retries must fall
    back to 0 (fail loudly + resumable checkpoints, never silent
    duplication)."""
    from ray.data._internal.execution.operators import hash_shuffle as hs

    import rogray.rayctx as rayctx

    rayctx._patch_hash_shuffle_empty_partitions()
    if rayctx._retry_safe_shuffle_block is not None:
        assert hs._shuffle_block is rayctx._retry_safe_shuffle_block
        assert hs.HashShuffleAggregator is rayctx._RetrySafeAggregator
        assert hs._shuffle_block._default_options.get("max_retries") == 3
    else:  # pragma: no cover - future-Ray fallback
        assert hs._shuffle_block._default_options.get("max_retries") == 0
    # the call site merges these defaults under its resource overrides,
    # which never set max_retries — assert the merge preserves the pin
    merged = hs._shuffle_block.options(num_cpus=0.5)
    assert merged.remote is not None


def test_finalize_join_paths_match(ray_session, monkeypatch):
    """The finalize attribute join has two implementations — object-store
    broadcast (doc side fits the decoded gate) and reduce-side bucketed
    shuffle (the 100 TB path).  Forcing the shuffle path by zeroing the
    gates must produce identical faces.  Also pins the round-4 pre-screen
    fix: the screen is on FULL-table parquet bytes (geometry included)
    and must sit far above the decoded slim gate, or geometry-heavy
    layers silently lose the broadcast path."""
    import ray.data as rd

    import rogray.sources as sources
    from rogray.config import ResolveConfig, TopologyConfig
    from rogray.pipelines import resolve

    assert resolve._BCAST_PRESCREEN_LIMIT >= 4 * resolve._BCAST_JOIN_LIMIT

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

    bcast = run()
    monkeypatch.setattr(resolve, "_BCAST_JOIN_LIMIT", 0)
    monkeypatch.setattr(resolve, "_BCAST_PRESCREEN_LIMIT", 0)
    shuf = run()
    pd.testing.assert_frame_equal(bcast, shuf)
    assert bcast["doc_id"].notna().any()  # winners actually attached
