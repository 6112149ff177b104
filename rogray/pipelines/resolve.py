"""Flagship pipeline: resolve_overlap_gap — Ray-Data rebuild of
CALL resolve_overlap_gap_run(...) (function_resolve_overlap_gap_run.sql).

One streaming pipeline with a single deliberate materialize point:

  documents -> Unwrap -> [histogram/cut: tiny driver step] -> Route
            -> groupby(tile).map_groups(TileOverlay)      # shuffle 1
            -> materialize -> interior faces bypass ------------+
            -> groupby(stitch_key).map_groups(stitch)  # borders only
            -> union(bypass) -> Finalize -> result Dataset / parquet

The reference's 7-phase job state machine with dblink fan-out, row locks
and retry ladders collapses to two shuffles because tile ownership is by
key, not by lock.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data as rd

from .. import spans as spans_mod
from .. import stages
from ..config import GridConfig, ResolveConfig
from ..rayctx import hash_shuffled
from ..tiling import balance


@dataclass
class ResolvePlan:
    grid: GridConfig
    cut: balance.CutIndex
    num_tiles: int


def prepare(ds, cfg: ResolveConfig, input_refs=None) -> ResolvePlan:
    """Init stage (analogue of resolve_overlap_gap_init, init.sql:4-293):
    global snap grid from the data extent + content-balanced tile cut.

    ``input_refs`` (from :func:`stages.small_input_refs`, driver-bounded
    layers only) replaces the extent/histogram Ray Data executions with
    plain-task waves — each execution carries a 1-2.5 s fixed floor at
    32 CPUs that dwarfs the actual scan work at test scales."""
    t = cfg.topology
    if t.utm:
        mnx, mny, mxx, mxy = stages.extent_of_docs(ds, input_refs=input_refs)
        grid = stages.grid_from_extent(mnx, mny, mxx, mxy, t.snap_tolerance)
    else:
        # lon/lat: fixed world frame, no extent pass needed
        grid = stages.world_grid(t.snap_tolerance)
    if input_refs:
        cut = stages.cut_from_refs(
            input_refs,
            grid,
            t.base_level,
            t.base_level + t.histogram_extra_levels,
            t.max_rows_in_each_cell,
        )
    else:
        cut = stages.compute_cut(
            ds,
            grid,
            t.base_level,
            t.base_level + t.histogram_extra_levels,
            t.max_rows_in_each_cell,
        )
    return ResolvePlan(grid, cut, len(cut.leaves))


def routed_table_from_refs(input_refs, plan: ResolvePlan):
    """unwrap+route as one plain-task wave over driver-bounded input block
    refs; returns the routed ``pa.Table`` on the driver (exactly where the
    group fan-out pulls it anyway) or None when the layer is empty.  Saves
    the front Ray Data execution's fixed floor (~2.4 s wall at sf0.1 for
    2.9 CPU·s of unwrap+route work, measured)."""
    import ray

    fn = stages.Compose(stages.Unwrap(plan.grid), stages.Route(plan.cut))
    outs = [
        t
        for t in ray.get(stages.block_map_refs(input_refs, fn))
        if t is not None and len(t)
    ]
    if not outs:
        return None
    return pa.concat_tables(outs, promote_options="default")


def tile_apply(whole: pa.Table, worker):
    """Per-tile worker over a driver-resident routed table: group fan-out
    normally; when routing inflated the table past 4x the fan-out gate
    (heavy multi-tile duplication — rare, since the INPUT passed the gate)
    re-emit it as blocks and run the real groupby, no recompute."""
    if whole.nbytes <= 4 * stages.SMALL_FANOUT_LIMIT:
        return stages.group_fanout_table(whole, "tile", worker)
    n = max(1, min(64, len(whole)))
    step = -(-len(whole) // n)
    # combine_chunks per slice: a zero-copy slice would pickle its parent's
    # full buffers into every block
    slices = [
        whole.slice(i, step).combine_chunks() for i in range(0, len(whole), step)
    ]
    return rd.from_arrow(slices).groupby("tile").map_groups(
        worker, batch_format="pyarrow"
    )


@hash_shuffled
def stitched_faces(
    ds, cfg: ResolveConfig, plan: ResolvePlan, input_refs=None, as_parts=False
):
    """The resolved face set BEFORE attribute finalization: one row per
    output face with exact px rings, coverage set, winner/others, area2.
    Shared by resolve_overlap_gap and the AR5 attribute-table mode.
    ``as_parts`` is forwarded to :func:`_stitch_levels` (best-effort parts
    shape for the plain-task finalize)."""
    t = cfg.topology
    grid = plan.grid
    coarse_level = _coarse_level(plan, t.base_level)
    overlay = stages.TileOverlay(
        grid, t.utm, cfg.clean.min_area_to_keep, coarse_level, clean=cfg.clean
    )
    faces = None
    if input_refs:
        # driver-bounded layer: unwrap+route as one plain-task wave, then
        # the group fan-out — zero Ray Data executions on the front end
        whole = routed_table_from_refs(input_refs, plan)
        mk = _marker_table(plan)
        if whole is not None:
            # markers carry the routed schema (they union today); align
            # field order for the positional concat
            whole = pa.concat_tables(
                [whole, mk.select(whole.column_names)],
                promote_options="permissive",
            )
        else:
            whole = mk
        faces = tile_apply(whole, overlay)
    if faces is None:
        # stateless task stages (no reserved actors -> shuffles never starve)
        unwrapped = ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")
        routed = unwrapped.map_batches(stages.Route(plan.cut), batch_format="pyarrow")
        # leaf markers: every tile of the partition emits its faces even when
        # it holds no data (gaps spanning empty tiles, exact universe frontier)
        routed = routed.union(rd.from_arrow(_marker_table(plan)))
        # small inputs skip the tile all-to-all entirely: bin-packed per-tile
        # plain Ray tasks (stages.small_group_fanout — the exchange's fixed
        # floor and 64-partition bin packing cost more than the overlay
        # itself at test scales); big inputs run the hash shuffle unchanged.
        # Task-pool stage either way: the overlay needs no per-actor state
        # (all state is per tile group), and task pools release CPUs the
        # moment the dataset finishes - actor pools were observed pinning
        # CPUs after execution, starving later pipelines in the same session
        faces = stages.gated_groupby(ds, routed, "tile", overlay)
    return _stitch_levels(faces, _mid_level(coarse_level), as_parts=as_parts)


def _stitch_levels(faces, mid_level, as_parts: bool = False):
    """Multi-level border stitch over the border-piece subset only.

    ``as_parts=True``: when the single-stitch gate passes (the whole face
    table is driver-resident anyway), return ``("parts", interior_tbl,
    stitch_bucket_refs)`` instead of a Dataset so the caller can finalize
    as a plain-task wave.  Best-effort — larger inputs still return the
    Dataset ladder and the caller must handle both shapes.

    Interior faces (kind==0, the bulk of the output) are final the moment
    the overlay emits them; shipping them through three stitch shuffles
    just to pass through moves output-sized ring data all-to-all three
    times and schedules thousands of pass-through groups.  Instead the
    overlay output is materialized once, interiors are routed straight to
    the result, and only border pieces (a thin O(perimeter) subset) are
    sorted through the stitch levels: coarse-cell buckets, then (when the
    grid is deep enough) a spatial mid level that dissolves giant
    signature groups — the gap/universe network above all — in parallel,
    then per-signature global groups.  Only still-frontier pieces escalate
    a level, so the straggler group shrinks geometrically."""
    import pyarrow.compute as pc

    import ray

    faces = faces.materialize()
    interior = faces.map_batches(
        lambda tb: tb.filter(pc.equal(tb["kind"], 0)), batch_format="pyarrow"
    )
    # Adaptive ladder depth.  Every level below global is a pure
    # parallelization: pieces that miss each other early still meet at the
    # per-signature global groups (stages.StitchLocal docstring), so when
    # the whole border subset is small a distributed exchange is pure
    # fixed cost — measured 2-5 s for an 8 MB groupby at 32 CPUs
    # (aggregator actor spin-up + per-partition submit round trips; the
    # sort path has the same floor), which dominated the headline's final
    # execution.  Small borders therefore skip Ray Data's all-to-all
    # entirely: pull the bounded border table to the driver (≤
    # _SINGLE_STITCH_LIMIT by the gate), bucket rows by coverage-signature
    # hash, and stitch each bucket as one plain Ray task
    # (_stitch_border_fanout).  Above the threshold (GB-scale borders at
    # 100 TB) the full ladder keeps per-group work and the universe
    # network bounded.  Gate cheaply first: border is a subset of the
    # materialized faces, so faces.size_bytes() (a metadata lookup, no
    # execution) under the limit proves border is under it too — the
    # common small case reuses the already-materialized face blocks and
    # never runs a separate border execution.
    if (faces.size_bytes() or 0) <= _SINGLE_STITCH_LIMIT:
        tbls = [t for t in ray.get(faces.to_arrow_refs()) if t is not None and len(t)]
        if not tbls:
            return interior
        whole = pa.concat_tables(tbls, promote_options="default")
        border_tbl = whole.filter(pc.not_equal(whole["kind"], 0))
        if as_parts:
            # the whole face table is ALREADY on the driver here: hand the
            # caller the interior table + stitch bucket refs so the
            # finalize can run as a plain-task wave instead of one more
            # Ray Data execution (~20-30 ms submit per block, measured)
            interior_tbl = whole.filter(pc.equal(whole["kind"], 0))
            stitch_refs = (
                _stitch_border_fanout_refs(border_tbl) if len(border_tbl) else []
            )
            return ("parts", interior_tbl, stitch_refs)
        if len(border_tbl) == 0:
            return interior
        return interior.union(_stitch_border_fanout(border_tbl))
    border = faces.map_batches(
        lambda tb: tb.filter(pc.not_equal(tb["kind"], 0)), batch_format="pyarrow"
    ).materialize()
    if (border.size_bytes() or 0) <= _SINGLE_STITCH_LIMIT:
        tbls = [t for t in ray.get(border.to_arrow_refs()) if t is not None and len(t)]
        border_tbl = pa.concat_tables(tbls, promote_options="default") if tbls else None
        if border_tbl is None or len(border_tbl) == 0:
            return interior
        return interior.union(_stitch_border_fanout(border_tbl))
    st = border.groupby("stitch_key").map_groups(
        stages.StitchLocal(mid_level), batch_format="pyarrow"
    )
    if mid_level is not None:
        st = st.groupby("stitch_key").map_groups(
            stages.stitch_mid, batch_format="pyarrow"
        )
    st = st.groupby("stitch_key").map_groups(
        stages.stitch_global, batch_format="pyarrow"
    )
    return interior.union(st)


# border subsets under this size skip the local/mid stitch levels and
# assemble in one driver-bucketed fan-out round (pure-optimization ladder)
_SINGLE_STITCH_LIMIT = 64 << 20


def _stitch_bucket_task(tbl: pa.Table) -> pa.Table:
    """One fan-out bucket of the small-border stitch (plain Ray task)."""
    return stages.stitch_global(tbl)


_stitch_bucket_remote = None  # lazily wrapped: ray.remote at first use


def _stitch_border_fanout(border_tbl: pa.Table):
    """Stitch a SMALL border set without a Ray Data all-to-all.

    Every Ray Data exchange (hash or sort) has a multi-second fixed floor
    at 32 CPUs — aggregator-actor spin-up plus per-partition submit round
    trips, measured 2-5 s for an 8 MB groupby — which dominated the
    headline's final execution at test scales and costs the same dead
    seconds per run at any scale where the border is thin.  The global
    stitch only needs all pieces of one coverage signature in the same
    group (stages._assemble_bucket splits a group by signature
    internally), so for a driver-bounded border table (caller gates at
    _SINGLE_STITCH_LIMIT) hash-bucketing rows by signature on the driver
    and running one plain Ray task per bucket is exactly equivalent —
    and the tasks start immediately, overlapping the final execution
    that consumes them via from_arrow_refs (no driver round trip for the
    results)."""
    return rd.from_arrow_refs(_stitch_border_fanout_refs(border_tbl))


def _stitch_border_fanout_refs(border_tbl: pa.Table):
    """The task refs of :func:`_stitch_border_fanout` (for callers that
    keep chaining plain-task waves instead of Datasets)."""
    import zlib

    import ray

    global _stitch_bucket_remote
    if _stitch_bucket_remote is None:
        _stitch_bucket_remote = ray.remote(num_cpus=1)(_stitch_bucket_task)
    from ..rayctx import _cluster_cpus

    n_tasks = max(1, min(_cluster_cpus(), len(border_tbl)))
    covs = border_tbl["cov"].to_pylist()
    buckets = np.empty(len(covs), dtype=np.int64)
    for i, c in enumerate(covs):
        sig = ",".join(map(str, sorted(c or [])))
        buckets[i] = zlib.crc32(sig.encode()) % n_tasks
    refs = []
    for b in np.unique(buckets):
        idx = np.flatnonzero(buckets == b)
        sub = border_tbl.take(pa.array(idx, pa.int64()))
        refs.append(_stitch_bucket_remote.remote(sub))
    return refs


@hash_shuffled
def resolve_overlap_gap(
    ds,
    cfg: ResolveConfig | None = None,
    plan: ResolvePlan | None = None,
    overlay_concurrency=None,
):
    """documents Dataset -> resolved faces Dataset (the `_result` table).

    Output columns: doc_id (winner's; NULL for gap faces), winner_pk,
    other_intersect_id_list, input_geo_is_valid, wkb, area, tile, spans.

    ``overlay_concurrency`` is accepted for API compatibility and ignored:
    the overlay runs as stateless tasks (groupby.map_groups), so the
    streaming executor sizes concurrency itself and releases CPUs the
    moment the stage drains.
    """
    cfg = cfg or ResolveConfig()
    # driver-bounded layers take the plain-task front end (read once, then
    # extent/histogram/unwrap/route as task waves — no Ray Data execution
    # floors); at scale the gate pre-screen fails on metadata and the
    # streaming path below runs unchanged
    input_refs, ds = stages.small_input_refs(ds)
    # the broadcast doc payload is independent of every geometry stage, so
    # its materialization overlaps the histogram + overlay executions
    slim_fut = _slim_prefetch(ds)
    plan = plan or prepare(ds, cfg, input_refs=input_refs)
    # parts shape (driver interior table + stitch refs) lets the finalize
    # run as one plain-task wave; cleaning mode needs the Dataset shape
    # for the cross-group dissolve
    as_parts = cfg.clean.min_area_to_keep <= 0
    stitched = stitched_faces(
        ds, cfg, plan, input_refs=input_refs, as_parts=as_parts
    )
    if isinstance(stitched, tuple):
        _, interior_tbl, stitch_refs = stitched
        return _finalize_parts(
            interior_tbl, stitch_refs, ds, plan.grid, cfg.topology.utm,
            slim_fut=slim_fut,
        )
    if cfg.clean.min_area_to_keep > 0:
        # small faces that were border pieces only become final in the
        # stitch; their longest neighbour may live in another signature
        # group — dissolve across groups here (JT6 across cell borders)
        stitched = dissolve_small_faces(
            stitched, plan.grid, cfg.topology.utm, cfg.clean.min_area_to_keep
        )
    return _finalize_join(stitched, ds, plan.grid, cfg.topology.utm, slim_fut=slim_fut)


@hash_shuffled
def face_relation_rows(ds, cfg: ResolveConfig | None = None, plan: ResolvePlan | None = None):
    """AR5 attribute-table mode (reference create_topology_attrbute_tables,
    cell.sql:390-416,877-899; golden: resolve_overlap_and_gap_expected:36-103
    — per-face relation rows + per-face areas): one row per
    (face, covering source), face identity = deterministic hash of the
    exact px rings.  Faces covered by k sources emit k rows; gap faces
    emit one row with src_pk NULL.  Edge rows live in
    pipelines.detect.extract_edges (the edge_data analogue)."""
    import hashlib

    cfg = cfg or ResolveConfig()
    input_refs, ds = stages.small_input_refs(ds)
    plan = plan or prepare(ds, cfg, input_refs=input_refs)
    grid = plan.grid
    utm = cfg.topology.utm
    stitched = stitched_faces(ds, cfg, plan, input_refs=input_refs)

    def rows(t: pa.Table) -> pa.Table:
        from ..geom import core

        out = {"face_id": [], "src_pk": [], "n_srcs": [], "face_area": [], "is_valid": []}
        rings_col = t["rings"].to_pylist()
        covs = t["cov"].to_pylist()
        valid = t["is_valid"].to_pylist()
        for i in range(len(t)):
            rings, _ = stages.unpack_rings(rings_col[i])
            fid = hashlib.md5(rings_col[i]).hexdigest()[:16]
            if utm:
                area = core.planar_area(rings, grid.precision)
            else:
                area = core.geodesic_area(rings, grid.origin_x, grid.origin_y, grid.precision)
            cov = covs[i] or []
            for src in (cov if cov else [None]):
                out["face_id"].append(fid)
                out["src_pk"].append(src)
                out["n_srcs"].append(len(cov))
                out["face_area"].append(area)
                out["is_valid"].append(bool(valid[i]))
        return pa.table(
            {
                "face_id": pa.array(out["face_id"], pa.string()),
                "src_pk": pa.array(out["src_pk"], pa.int64()),
                "n_srcs": pa.array(out["n_srcs"], pa.int64()),
                "face_area": pa.array(out["face_area"], pa.float64()),
                "is_valid": pa.array(out["is_valid"], pa.bool_()),
            }
        )

    return stitched.map_batches(rows, batch_format="pyarrow")


def _mid_level(coarse_level: int) -> int | None:
    """Spatial mid-stitch level: two levels above the coarse buckets (16x
    the area), or None when the hierarchy is too shallow to help."""
    return coarse_level - 2 if coarse_level >= 2 else None


def _coarse_level(plan: ResolvePlan, base_level: int) -> int:
    """Level-1 stitch bucket granularity: one level above the typical leaf,
    so each bucket consolidates a handful of tiles (enough cancellation to
    shrink the global level) while keeping enough buckets for parallelism."""
    from ..tiling import quadkey

    lvls = sorted(int(c) >> quadkey.LEVEL_SHIFT for c in plan.cut.leaves) or [base_level]
    med = lvls[len(lvls) // 2]
    return max(0, min(med - 1, 10))


def _marker_table(plan: ResolvePlan, exclude: set[int] | None = None):
    import pyarrow as pa

    from ..spans import SPANS_TYPE

    tiles = [t for t in plan.cut.all_tiles() if not exclude or t not in exclude]
    n = len(tiles)
    return pa.table(
        {
            "doc_id": pa.array([""] * n, pa.string()),
            "pk": pa.array([-1] * n, pa.int64()),
            "rings": pa.array([stages.pack_rings([])] * n, pa.large_binary()),
            "minx": pa.array([0] * n, pa.int64()),
            "miny": pa.array([0] * n, pa.int64()),
            "maxx": pa.array([0] * n, pa.int64()),
            "maxy": pa.array([0] * n, pa.int64()),
            "valid": pa.array([True] * n, pa.bool_()),
            "is_line": pa.array([False] * n, pa.bool_()),
            "spans": pa.array([[]] * n, SPANS_TYPE),
            "tile": pa.array(tiles, pa.int64()),
        }
    )


_JOIN_SCHEMA = pa.schema(
    [
        ("jk", pa.int64()),          # join key: winner_pk / doc pk
        ("bkt", pa.int64()),         # shuffle bucket: jk mod n_buckets
        ("is_doc", pa.bool_()),
        ("tile", pa.int64()),
        ("rings", pa.large_binary()),
        ("winner_pk", pa.int64()),
        ("others_s", pa.string()),
        ("is_valid", pa.bool_()),
        ("w_doc_id", pa.string()),
        ("w_spans_json", pa.string()),
    ]
)


# Broadcast the doc payload through the object store when its DECODED slim
# (jk, doc_id, spans-json) form is smaller than this; above it, fall back
# to the reduce-side bucketed shuffle join (the 100 TB path).  The payload
# lives ONCE per node in plasma and the attach tasks read it zero-copy as
# chunked Arrow arrays — per worker-PROCESS heap is only the int64 key
# column (+ its argsort), 16 bytes/doc, so the limit is bounded by the
# object-store share, not by heap × processes.  Nothing is collected on
# the driver in either path.
_BCAST_JOIN_LIMIT = 1 << 30
# Pre-screen on the full doc table's (compressed) parquet bytes, which
# include the geometry that the slim payload drops — must be a wide
# multiple of the decoded limit (see _finalize_join).
_BCAST_PRESCREEN_LIMIT = 8 * _BCAST_JOIN_LIMIT


def _spans_payload_json(doc_spans: list[dict]) -> str:
    """Doc spans -> compact JSON for the join payload.

    The FIRST geometry span's text is blanked: FinalizeJoined rewrites it
    to the output face's own WKB (spans.rewrite_geometry_span), so the
    original hex — by far the largest field — never needs to ship.
    """
    import json

    out = []
    blanked = False
    for sp in doc_spans:
        txt = sp["text"]
        if not blanked and sp["kind"] == spans_mod.GEOMETRY_KIND:
            txt = ""
            blanked = True
        out.append([sp["kind"], txt, sp["media_ref"], sp["offset"]])
    return json.dumps(out)


def _finalize_join(stitched, ds, grid, utm, slim_fut=None):
    """JT7 attribute copy (cell.sql:869-873).

    Small doc side (by parquet metadata bytes): object-store broadcast —
    the slim (jk, doc_id, spans-json) payload is materialized to Arrow
    object refs by workers, and every attach task reads it zero-copy; the
    faces never enter an all-to-all.  Large doc side: reduce-side join —
    face rows and doc rows shuffle to the same BUCKET of winner_pk keys,
    and each bucket attaches winners with one vectorized searchsorted
    (grouping per pk would schedule one tiny group per output face; bucket
    count scales with the doc count so groups stay bounded at 100 TB).
    Task-pool sort shuffle throughout — no join-aggregator actors, no
    driver materialization, and sorts consume the 0-row schema-less blocks
    that crash Ray's hash-join schema broadcast."""
    from ..dedup import _n_buckets_for

    # metadata-only probes: safe_count/safe_size_bytes read leaf-source
    # metadata for derived inputs instead of executing their plans (the
    # old direct count()/size_bytes() calls eagerly executed the full doc
    # plan whenever a caller passed a transformed dataset)
    n_docs = stages.safe_count(ds)
    if n_docs is None:
        sz = stages.safe_size_bytes(ds)
        n_docs = max(1, (sz or 0) // 512)  # rough rows-from-bytes estimate
    nb = _n_buckets_for(max(1, n_docs) * 8)
    doc_bytes = stages.safe_size_bytes(ds)
    if doc_bytes is None:
        doc_bytes = _BCAST_PRESCREEN_LIMIT + 1  # unknown: assume big
    # two-stage gate: the cheap metadata size (compressed parquet bytes of
    # the FULL doc table — geometry included) only pre-screens; the binding
    # gate is the DECODED slim payload's size_bytes().  The slim payload
    # drops the geometry — usually the bulk of the table — so the
    # pre-screen must be a wide multiple of the limit or it rejects
    # geometry-heavy layers whose slim side broadcasts fine (at 960k
    # polygons the full parquet is >256 MB while slim decodes to 172 MB;
    # the old equal-limits screen silently forced the shuffle join).  A
    # pre-screen miss costs one wasted slim scan that overlaps the overlay
    # anyway (_slim_prefetch); the decoded gate still binds.
    if doc_bytes <= _BCAST_PRESCREEN_LIMIT:
        slim = slim_fut.result() if slim_fut is not None else _docs_slim_sorted(ds)
        if (slim.size_bytes() or 0) <= _BCAST_JOIN_LIMIT:
            return _finalize_join_broadcast(stitched, slim, grid, utm)
        # decoded payload over the limit: fall through to the shuffle join

    def docs_min(t: pa.Table) -> pa.Table:
        from ..ids import stable_pk

        n = len(t)
        ids = t["doc_id"].to_pylist()
        pks = [stable_pk(did) for did in ids]
        # spans ride as JSON (list<struct> does not survive concat/take
        # uniformly across block types); the replaced geometry hex is
        # blanked before shipping
        spans_json = [_spans_payload_json(doc) for doc in t["spans"].to_pylist()]
        pks_np = np.asarray(pks, dtype=np.int64)
        return pa.table(
            {
                "jk": pa.array(pks, pa.int64()),
                "bkt": pa.array(pks_np % nb, pa.int64()),
                "is_doc": pa.array([True] * n, pa.bool_()),
                "tile": pa.array([0] * n, pa.int64()),
                "rings": pa.array([None] * n, pa.large_binary()),
                "winner_pk": pa.array([0] * n, pa.int64()),
                "others_s": pa.array([None] * n, pa.string()),
                "is_valid": pa.array([True] * n, pa.bool_()),
                "w_doc_id": t["doc_id"].cast(pa.string()).combine_chunks(),
                "w_spans_json": pa.array(spans_json, pa.string()),
            },
            schema=_JOIN_SCHEMA,
        )

    def prep(t: pa.Table) -> pa.Table:
        n = len(t)
        others = [",".join(map(str, o or [])) for o in t["others"].to_pylist()]
        return pa.table(
            {
                "jk": t["winner_pk"].combine_chunks(),
                "bkt": pa.array(t["winner_pk"].to_numpy() % nb, pa.int64()),
                "is_doc": pa.array([False] * n, pa.bool_()),
                "tile": t["tile"].combine_chunks(),
                "rings": t["rings"].combine_chunks(),
                "winner_pk": t["winner_pk"].combine_chunks(),
                "others_s": pa.array(others, pa.string()),
                "is_valid": t["is_valid"].combine_chunks(),
                "w_doc_id": pa.array([None] * n, pa.string()),
                "w_spans_json": pa.array([None] * n, pa.string()),
            },
            schema=_JOIN_SCHEMA,
        )

    def attach(g: pa.Table) -> pa.Table:
        import numpy as np

        is_doc = g["is_doc"].to_numpy(zero_copy_only=False)
        faces_idx = np.flatnonzero(~is_doc)
        if len(faces_idx) == 0:
            return _JOIN_SCHEMA.empty_table().drop_columns(["jk", "bkt", "is_doc"])
        doc_idx = np.flatnonzero(is_doc)
        faces = g.take(pa.array(faces_idx, pa.int64()))
        out = faces.drop_columns(["jk", "bkt", "is_doc"])
        if len(doc_idx):
            docs = g.take(pa.array(doc_idx, pa.int64()))
            fjk = faces["jk"].to_numpy()
            djk = docs["jk"].to_numpy()
            order = np.argsort(djk, kind="stable")
            djk_s = djk[order]
            pos = np.minimum(np.searchsorted(djk_s, fjk), len(djk_s) - 1)
            miss = djk_s[pos] != fjk
            idx = pa.array(order[pos], pa.int64(), mask=miss)
            out = out.set_column(
                out.schema.get_field_index("w_doc_id"),
                "w_doc_id",
                docs["w_doc_id"].combine_chunks().take(idx),
            )
            out = out.set_column(
                out.schema.get_field_index("w_spans_json"),
                "w_spans_json",
                docs["w_spans_json"].combine_chunks().take(idx),
            )
        return out

    attach.__name__ = "attach_winner"
    joined = (
        stitched.map_batches(prep, batch_format="pyarrow")
        .union(ds.map_batches(docs_min, batch_format="pyarrow"))
        .groupby("bkt")
        .map_groups(attach, batch_format="pyarrow")
    )
    return joined.map_batches(
        stages.FinalizeJoined(grid, utm), batch_format="pyarrow"
    )


# process-level cache for broadcast join payloads: worker processes are
# reused across tasks, so the (sorted keys, payload arrays) build happens
# once per worker, not once per batch
_BCAST_CACHE: dict = {}


def _docs_slim_sorted(ds):
    """Materialized (jk, doc_id, spans-json) broadcast payload.

    Deliberately NOT network-sorted: a Dataset.sort here is a full
    all-to-all of the payload (measured 3-12 s at sf0.1) whose only benefit
    is saving each attach worker ONE argsort of the int64 key column —
    microseconds at the 256 MB broadcast gate.  attach_bcast sorts lazily
    per worker process and caches the result (_BCAST_CACHE)."""

    def docs_slim(t: pa.Table) -> pa.Table:
        from ..ids import stable_pk

        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "jk": pa.array([stable_pk(d) for d in ids], pa.int64()),
                "w_doc_id": t["doc_id"].cast(pa.string()).combine_chunks(),
                "w_spans_json": pa.array(
                    [_spans_payload_json(doc) for doc in t["spans"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(docs_slim, batch_format="pyarrow").materialize()


def _slim_prefetch(ds):
    """Start materializing the broadcast doc payload on a daemon thread so
    it overlaps the overlay execution (the two pipelines share no inputs
    beyond the parquet scan; Ray Data executes concurrent datasets on
    independent streaming executors).  Returns a Future or None when the
    metadata pre-screen says the shuffle join will be taken anyway."""
    doc_bytes = stages.safe_size_bytes(ds)  # never executes a derived plan
    if doc_bytes is None or doc_bytes > _BCAST_PRESCREEN_LIMIT:
        return None
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="slim-prefetch")
    fut = pool.submit(_docs_slim_sorted, ds)
    pool.shutdown(wait=False)
    return fut


def _finalize_join_broadcast(stitched, slim, grid, utm):
    """Broadcast-side finalize join: the slim doc payload (materialized to
    Arrow blocks in the object store by workers, never the driver) is read
    zero-copy by every attach task.  The face stream stays put — no union,
    no sort shuffle, no extra all-to-all."""
    joined = stitched.map_batches(_make_attach_bcast(slim), batch_format="pyarrow")
    return joined.map_batches(
        stages.FinalizeJoined(grid, utm), batch_format="pyarrow"
    )


def _make_attach_bcast(slim):
    """The broadcast attach kernel as a picklable closure over the slim
    payload's object refs (shared by the Dataset path and the plain-task
    parts wave)."""
    refs = [r for r in slim.to_arrow_refs()]
    cache_key = tuple(r.hex() for r in refs)

    def attach_bcast(t: pa.Table) -> pa.Table:
        import ray

        got = _BCAST_CACHE.get(cache_key)
        if got is None:
            # The string payload columns stay CHUNKED and plasma-backed:
            # ray.get of Arrow blocks is zero-copy out of the object store,
            # so the payload exists once per NODE no matter how many worker
            # processes attach.  Per-process heap is only the int64 key
            # column and (when blocks arrive unordered, the common case)
            # its argsort — 16 bytes/doc; never combine_chunks/take the
            # payload itself, that would copy it into every process heap.
            parts = [p for p in ray.get(list(refs)) if len(p)]
            if parts:
                docs = pa.concat_tables(parts)
                jk = docs["jk"].to_numpy(zero_copy_only=False)
                if len(jk) > 1 and not (jk[1:] >= jk[:-1]).all():
                    order = np.argsort(jk, kind="stable").astype(np.int64)
                    jk = jk[order]
                else:
                    order = None
                got = (jk, order, docs["w_doc_id"], docs["w_spans_json"])
            else:
                got = (
                    np.empty(0, np.int64),
                    None,
                    pa.chunked_array([], pa.string()),
                    pa.chunked_array([], pa.string()),
                )
            # bounded 2-entry FIFO (not clear-then-insert): two broadcast
            # joins interleaving batches in one worker process must not
            # evict each other's payload on every batch
            while len(_BCAST_CACHE) >= 2:
                _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
            _BCAST_CACHE[cache_key] = got
        jk_s, order, doc_arr, span_arr = got
        n = len(t)
        others = [",".join(map(str, o or [])) for o in t["others"].to_pylist()]
        w = t["winner_pk"].to_numpy()
        if len(jk_s):
            pos = np.minimum(np.searchsorted(jk_s, w), len(jk_s) - 1)
            miss = jk_s[pos] != w
            orig = order[pos] if order is not None else pos
            idx = pa.array(orig, pa.int64(), mask=miss)
            w_doc = doc_arr.take(idx)
            w_span = span_arr.take(idx)
            if isinstance(w_doc, pa.ChunkedArray):
                w_doc = w_doc.combine_chunks()
            if isinstance(w_span, pa.ChunkedArray):
                w_span = w_span.combine_chunks()
        else:
            w_doc = pa.array([None] * n, pa.string())
            w_span = pa.array([None] * n, pa.string())
        return pa.table(
            {
                "tile": t["tile"].combine_chunks(),
                "rings": t["rings"].combine_chunks(),
                "winner_pk": t["winner_pk"].combine_chunks(),
                "others_s": pa.array(others, pa.string()),
                "is_valid": t["is_valid"].combine_chunks(),
                "w_doc_id": w_doc,
                "w_spans_json": w_span,
            }
        )

    return attach_bcast


def _parts_to_dataset(interior_tbl: pa.Table, stitch_refs):
    """Reconstitute a stitched-faces Dataset from parts (the fallback when
    the finalize wave cannot broadcast)."""
    n = max(1, min(64, len(interior_tbl)))
    step = -(-len(interior_tbl) // n)
    slices = [
        interior_tbl.slice(i, step).combine_chunks()
        for i in range(0, len(interior_tbl), step)
    ] or [interior_tbl]
    ds1 = rd.from_arrow(slices)
    if stitch_refs:
        return ds1.union(rd.from_arrow_refs(stitch_refs))
    return ds1


def _finalize_parts(interior_tbl, stitch_refs, ds, grid, utm, slim_fut=None):
    """Finalize as ONE plain-task wave over stitched-face parts (driver
    interior table + stitch bucket refs) when the slim doc payload passes
    the broadcast gates — the last Ray Data execution of the headline
    replaced by direct task submits.  Falls back to the Dataset join
    (reduce-side shuffle) on a reconstituted dataset otherwise."""
    doc_bytes = stages.safe_size_bytes(ds)  # never executes a derived plan
    if doc_bytes is None:
        doc_bytes = _BCAST_PRESCREEN_LIMIT + 1
    slim = None
    if doc_bytes <= _BCAST_PRESCREEN_LIMIT:
        slim = slim_fut.result() if slim_fut is not None else _docs_slim_sorted(ds)
        if (slim.size_bytes() or 0) > _BCAST_JOIN_LIMIT:
            slim = None
    if slim is None or (len(interior_tbl) == 0 and not stitch_refs):
        return _finalize_join(
            _parts_to_dataset(interior_tbl, stitch_refs), ds, grid, utm,
            slim_fut=slim_fut,
        )
    fn = stages.Compose(_make_attach_bcast(slim), stages.FinalizeJoined(grid, utm))
    out_refs = list(stages.block_map_refs(stitch_refs, fn)) if stitch_refs else []
    if len(interior_tbl):
        out_refs += stages.table_map_refs(_slice_compact(interior_tbl), fn)
    return rd.from_arrow_refs(out_refs)


def _slice_compact(tbl: pa.Table, per_cpu: int = 2):
    """~per_cpu compact slices per CPU (compact: a zero-copy slice would
    pickle its parent's full buffers into every task)."""
    from ..rayctx import _cluster_cpus

    k = max(1, min(per_cpu * _cluster_cpus(), len(tbl)))
    step = -(-len(tbl) // k)
    return [tbl.slice(i, step).combine_chunks() for i in range(0, len(tbl), step)]


# ---------------------------------------------------------------------------
# resumable variant: per-tile checkpointed output (donejobs analogue)
# ---------------------------------------------------------------------------


class _TileOverlayWriter:
    """TileOverlay that checkpoints each tile's faces (interior rows AND
    border pieces) atomically before returning them.  A rerun skips tiles
    whose manifest exists — the reference's `_job_list_donejobs` semantics
    (cell.sql:125-132) with per-partition lineage+metrics."""

    def __init__(self, grid, utm, min_area, coarse_level, out_dir, cfg_fp, clean=None):
        from .. import stages

        self.__name__ = "TileOverlayWriter"  # map_groups task-fn contract

        self._inner = stages.TileOverlay(grid, utm, min_area, coarse_level, clean=clean)
        self.out_dir = out_dir
        self.cfg_fp = cfg_fp

    def __call__(self, group):
        from ..state import manifest

        table = self._inner(group)
        if len(group) > 0:
            tile = int(group["tile"][0].as_py())
            n_border = int((table["kind"].to_numpy() == 1).sum()) if len(table) else 0
            manifest.write_tile(
                self.out_dir,
                tile,
                table,
                self.cfg_fp,
                {"n_faces": len(table), "n_border_pieces": n_border,
                 "n_input_rows": len(group)},
            )
        return table


@hash_shuffled
def resolve_overlap_gap_resumable(
    ds,
    out_dir: str,
    cfg: ResolveConfig | None = None,
    overlay_concurrency=None,
):
    """Checkpointed flagship run: per-tile overlay results are written
    atomically under ``out_dir``; a rerun recomputes only missing tiles,
    then the (cheap) border stitch + finalize re-run over the union.
    Work lost on a crash is bounded by the tiles in flight."""
    from .. import stages
    from ..state import manifest

    cfg = cfg or ResolveConfig()
    input_refs, ds = stages.small_input_refs(ds)
    slim_fut = _slim_prefetch(ds)
    plan = prepare(ds, cfg, input_refs=input_refs)
    t = cfg.topology
    grid = plan.grid
    fp = manifest.config_fingerprint(cfg)

    # phase-granular restart (reference stop_at/start_at semantics): when
    # the stitched face set was already checkpointed for this config, the
    # overlay AND the stitch are skipped entirely — a crash during the
    # finalize join re-runs only the join
    if manifest.phase_valid(out_dir, "stitched", fp):
        stitched = manifest.checkpoint_phase(out_dir, "stitched", None, fp)
        return _finalize_join(stitched, ds, grid, t.utm, slim_fut=slim_fut)

    done = manifest.completed_tiles(out_dir, fp)
    unwrapped = ds.map_batches(stages.Unwrap(grid), batch_format="pyarrow")
    routed = unwrapped.map_batches(stages.Route(plan.cut), batch_format="pyarrow")
    if done:
        import numpy as np
        import pyarrow as pa

        done_arr = np.fromiter(done, dtype=np.int64, count=len(done))

        def drop_done(tb: "pa.Table") -> "pa.Table":
            keep = ~np.isin(tb["tile"].to_numpy(), done_arr)
            return tb.filter(pa.array(keep))

        routed = routed.map_batches(drop_done, batch_format="pyarrow")
    routed = routed.union(rd.from_arrow(_marker_table(plan, exclude=done)))
    coarse_level = _coarse_level(plan, t.base_level)
    writer = _TileOverlayWriter(
        grid, t.utm, cfg.clean.min_area_to_keep, coarse_level, out_dir, fp,
        clean=cfg.clean,
    )
    pending = stages.gated_groupby(ds, routed, "tile", writer)
    pending.count()  # drive the checkpointing pass

    faces = manifest.read_all(out_dir)
    stitched = _stitch_levels(faces, _mid_level(coarse_level))
    if cfg.clean.min_area_to_keep > 0:
        stitched = dissolve_small_faces(
            stitched, grid, t.utm, cfg.clean.min_area_to_keep
        )
    stitched = manifest.checkpoint_phase(out_dir, "stitched", stitched, fp)
    return _finalize_join(stitched, ds, grid, t.utm, slim_fut=slim_fut)


# ---------------------------------------------------------------------------
# cross-signature small-face dissolve (reference JT6 across cell borders:
# function_01_do_remove_small_areas_no_block.sql:52-93 applied after the
# master merge, looped to fixpoint).  The per-tile overlay dissolves small
# INTERIOR faces; faces that were border pieces only become final in the
# stitch, where their longest-boundary neighbour may carry a different
# coverage signature and therefore lives in a different stitch group.
#
# Scale shape (round-3 rework): the face set is materialized ONCE (with a
# uid + small column attached), and the face-adjacency EDGE table — one row
# per (small face, neighbour) boundary-sharing pair, built from one
# segment-key shuffle — is built ONCE.  Every later round only RELABELS the
# edge table through a broadcast uid-remap (absorbed uid -> merged uid) and
# merges the involved faces (a tiny fraction); no full-dataset pass or
# materialization happens per round.  The loop runs to FIXPOINT (no merge
# performed), capped at ``rounds``; area strictly grows on every merge so
# the loop terminates.
#
# Known approximation inherited from the degenerate-merge fallback: when a
# merge group fails to re-polygonize, the target's original geometry is
# kept (as before) while the edge relabel still credits the absorbed
# members' boundaries to it — only reachable on non-planar input that the
# noding quarantine already flags.
# ---------------------------------------------------------------------------


def _compress_remap(rm: dict) -> None:
    """Path-compress uid aliases so every entry points at a LIVE uid (or
    the universe sentinel).  Identity entries (failed-merge fallback keeps
    the target's geometry, hence its uid) terminate the walk."""
    for old in list(rm):
        live, sm = rm[old]
        seen = {old}
        while live in rm and live not in seen and rm[live][0] != live:
            seen.add(live)
            live, sm = rm[live]
        rm[old] = (live, sm)


@hash_shuffled
def dissolve_small_faces(stitched, grid, utm: bool, min_area: float,
                         rounds: int = 100, n_buckets: int | None = None,
                         max_driver_targets: int = 5_000_000):
    import hashlib

    import pandas as pd
    import ray as _ray

    from .. import stages as st_mod
    from ..dedup import _n_buckets_for
    from ..geom import core, noding, polygonize

    if min_area <= 0:
        return stitched

    def measure(rings) -> float:
        if utm:
            return core.planar_area(rings, grid.precision)
        return core.geodesic_area(rings, grid.origin_x, grid.origin_y, grid.precision)

    # ---- pass 0: uid + small columns; the ONE full materialize -----------
    def add_uid(t: pa.Table) -> pa.Table:
        rings_col = t["rings"].to_pylist()
        uids = [hashlib.md5(b).hexdigest()[:16] for b in rings_col]
        small = []
        for b in rings_col:
            rings, _ = st_mod.unpack_rings(b)
            small.append(measure(rings) < min_area)
        return t.append_column("uid", pa.array(uids, pa.string())).append_column(
            "small", pa.array(small, pa.bool_())
        )

    base = stitched.map_batches(add_uid, batch_format="pyarrow").materialize()
    if n_buckets is None:
        # scale shuffle-group count with the face count (a fixed count
        # would mean giant segment groups at 100 TB)
        n_buckets = _n_buckets_for(max(1, base.count()) * 16)

    # ---- pass 1: adjacency edges, built once -----------------------------
    def seg_rows(t: pa.Table) -> pa.Table:
        """One row per boundary segment of a face: (bucket, packed seg key,
        uid, small, len) — keys are two packed int64s (coords < 2^28 so
        x<<31|y is collision-free) and HASH-BUCKETED so each Ray group
        handles thousands of segment keys vectorized.  Whole-block
        vectorized: one parse of all packed buffers, one cyclic-next pass
        over the concatenated rings."""
        rings_col = t["rings"].to_pylist()
        coords, offs, lens, face_nr = st_mod.parse_packed_batch(rings_col)
        if not len(coords):
            return pa.table({
                "sb": pa.array([], pa.int32()), "k1": pa.array([], pa.int64()),
                "k2": pa.array([], pa.int64()), "uid": pa.array([], pa.string()),
                "small": pa.array([], pa.bool_()), "seg_len": pa.array([], pa.float64()),
            })
        # cyclic next vertex within each ring
        nxt_idx = np.arange(1, len(coords) + 1, dtype=np.int64)
        nz = lens > 0
        nxt_idx[(offs + lens)[nz] - 1] = offs[nz]
        a0 = coords
        b0 = coords[nxt_idx]
        fl = (a0[:, 0] > b0[:, 0]) | ((a0[:, 0] == b0[:, 0]) & (a0[:, 1] > b0[:, 1]))
        a_ = np.where(fl[:, None], b0, a0)
        b_ = np.where(fl[:, None], a0, b0)
        ln = np.hypot((b_[:, 0] - a_[:, 0]).astype(float), (b_[:, 1] - a_[:, 1]).astype(float))
        # per-segment face index: rings -> faces via repeat of ring lens
        pts_per_face = np.zeros(len(face_nr), np.int64)
        ri = 0
        for f in range(len(face_nr)):
            nr = int(face_nr[f])
            pts_per_face[f] = int(lens[ri : ri + nr].sum())
            ri += nr
        uid_col = np.repeat(np.asarray(t["uid"].to_pylist(), dtype=object), pts_per_face)
        small_col = np.repeat(t["small"].to_numpy(zero_copy_only=False), pts_per_face)
        keep = ln > 0
        k1 = (a_[keep, 0] << np.int64(31)) | a_[keep, 1]
        k2 = (b_[keep, 0] << np.int64(31)) | b_[keep, 1]
        uids_l = [uid_col[keep]]
        small_l = [small_col[keep]]
        ln_l = [ln[keep]]
        sb = np.abs(((k1 * np.int64(2654435761) + k2) % np.int64(n_buckets)).astype(np.int32))
        return pa.table(
            {
                "sb": pa.array(sb, pa.int32()),
                "k1": pa.array(k1, pa.int64()),
                "k2": pa.array(k2, pa.int64()),
                "uid": pa.array(np.concatenate(uids_l).tolist(), pa.string()),
                "small": pa.array(np.concatenate(small_l), pa.bool_()),
                "seg_len": pa.array(np.concatenate(ln_l), pa.float64()),
            }
        )

    # the empty uid is the UNIVERSE sentinel: a boundary segment shared
    # with no other face borders the (dropped) universe or a non-kept
    # region — both absorbing sinks, exactly like the overlay's
    # _merge_small_faces and the reference's ST_RemEdgeNewFace against
    # face 0 (the polygon is deleted from the coverage)
    UNIV = ""

    def edge_rows(g: pd.DataFrame) -> pd.DataFrame:
        """Per segment-key bucket: aggregate to face-adjacency edge rows
        (ua < ub, flags, shared len).  Only segments with >= 1 small side
        matter — merged faces only ever inherit edges of their members, and
        every member of a merge group was small or adjacent to one.

        Vectorized on the planar-arrangement guarantee that a segment
        borders at most two faces: after (key, uid) dedup, 1-uid keys are
        universe edges and 2-uid keys one pair, both emitted with numpy;
        >2-uid keys (non-planar input the noding quarantine already flags)
        take the per-key loop."""
        k1 = g["k1"].to_numpy()
        k2 = g["k2"].to_numpy()
        uid = g["uid"].to_numpy()
        small = g["small"].to_numpy()
        ln = g["seg_len"].to_numpy()
        order = np.lexsort((uid, k2, k1))
        k1, k2, uid, small, ln = k1[order], k2[order], uid[order], small[order], ln[order]
        # drop duplicate (key, uid) rows (keep first, like drop_duplicates)
        dup = np.zeros(len(k1), bool)
        if len(k1) > 1:
            dup[1:] = (k1[1:] == k1[:-1]) & (k2[1:] == k2[:-1]) & (uid[1:] == uid[:-1])
        k1, k2, uid, small, ln = k1[~dup], k2[~dup], uid[~dup], small[~dup], ln[~dup]
        if not len(k1):
            return pd.DataFrame({"ua": [], "ub": [], "sa": [], "sb_": [], "seg_len": []})
        starts = np.flatnonzero(np.r_[True, (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])])
        cnt = np.r_[starts[1:], len(k1)] - starts
        any_small = np.logical_or.reduceat(small, starts)
        out_a, out_b, out_sa, out_sb, out_ln = [], [], [], [], []
        one = starts[(cnt == 1) & any_small]
        if len(one):
            # frontier segments of small faces: the other side is the
            # universe sink
            out_a.append(np.full(len(one), UNIV, dtype=object))
            out_b.append(uid[one])
            out_sa.append(np.zeros(len(one), bool))
            out_sb.append(np.ones(len(one), bool))
            out_ln.append(ln[one])
        two = starts[(cnt == 2) & any_small]
        if len(two):
            ua, ub = uid[two], uid[two + 1]  # uid-sorted within key: ua < ub
            sa, sb_ = small[two], small[two + 1]
            out_a.append(ua)
            out_b.append(ub)
            out_sa.append(sa)
            out_sb.append(sb_)
            out_ln.append(ln[two])
        for s, c in zip(starts[(cnt > 2) & any_small], cnt[(cnt > 2) & any_small]):
            us = uid[s : s + c]
            sm = small[s : s + c]
            lnk = float(ln[s])
            for a in range(int(c)):
                for b in range(a + 1, int(c)):
                    if not (sm[a] or sm[b]):
                        continue
                    out_a.append(np.array([us[a]], dtype=object))
                    out_b.append(np.array([us[b]], dtype=object))
                    out_sa.append(np.array([sm[a]]))
                    out_sb.append(np.array([sm[b]]))
                    out_ln.append(np.array([lnk]))
        if not out_a:
            return pd.DataFrame({"ua": [], "ub": [], "sa": [], "sb_": [], "seg_len": []})
        df = pd.DataFrame(
            {
                "ua": np.concatenate(out_a),
                "ub": np.concatenate(out_b),
                "sa": np.concatenate(out_sa),
                "sb_": np.concatenate(out_sb),
                "seg_len": np.concatenate(out_ln),
            }
        )
        df = df.groupby(["ua", "ub"], as_index=False).agg(
            sa=("sa", "first"), sb_=("sb_", "first"), seg_len=("seg_len", "sum")
        )
        return df[["ua", "ub", "sa", "sb_", "seg_len"]]

    segd = base.map_batches(seg_rows, batch_format="pyarrow")
    edges = stages.gated_groupby(base, segd, "sb", edge_rows, batch_format="pandas")
    edges = edges.materialize()

    import zlib as _zlib

    def choose_targets(g: pd.DataFrame) -> pd.DataFrame:
        """Per bucket of small_uids: the neighbour (universe included) with
        the longest TOTAL shared boundary wins, ties by uid ascending —
        the reference's longest-edge rule generalized to total length.
        Cycles among mutually-preferring small faces are broken
        driver-side (the driver holds the full target map anyway)."""
        # fix the float-accumulation order BEFORE summing: group-internal
        # row order is arrival order (nondeterministic under hash
        # shuffle), and a ULP difference between two near-tied neighbour
        # totals would flip the target run-to-run
        g = g.sort_values(["small_uid", "nbr_uid", "seg_len"], kind="mergesort")
        out_s, out_t = [], []
        for su, idx in g.groupby("small_uid").indices.items():
            sub = g.iloc[idx]
            acc = sub.groupby("nbr_uid", as_index=False)["seg_len"].sum()
            best = acc.sort_values(["seg_len", "nbr_uid"], ascending=[False, True]).iloc[0]
            out_s.append(su)
            out_t.append(best["nbr_uid"])
        return pd.DataFrame({"small_uid": out_s, "target_uid": out_t})

    # driver-side per-round state — all bounded by the number of SMALL
    # faces ever seen (<< output size; same order as the reference's
    # small-area work queue), never by the face count:
    #   remap:     absorbed uid -> (live uid, live small flag)
    #   table_of:  live merged uid -> index into merged_tables
    #   kills:     per-source-table uids whose row was superseded
    remap: dict[str, tuple[str, bool]] = {}
    merged_tables: list = []
    table_of: dict[str, int] = {}
    kills: list[set] = [set()]  # kills[0] = base; kills[i+1] = merged_tables[i]

    def merge_group(g: pa.Table) -> pa.Table:
        mk = g["merge_key"][0].as_py()
        own = [g["uid"][i].as_py() for i in range(len(g))]
        try:
            tgt = own.index(mk)
        except ValueError:
            # defensive (unreachable: targets are live): emit nothing so
            # the absorbers stay live and simply retry next round
            return g.slice(0, 0)
        seg_list = []
        rings_col = g["rings"].to_pylist()
        for i in range(len(g)):
            rings, _ = st_mod.unpack_rings(rings_col[i])
            for r in rings:
                nxt = np.roll(r, -1, axis=0)
                seg_list.append(np.concatenate([r, nxt], axis=1))
        segs = np.concatenate(seg_list)
        flip = (segs[:, 0] > segs[:, 2]) | ((segs[:, 0] == segs[:, 2]) & (segs[:, 1] > segs[:, 3]))
        canon = segs.copy()
        canon[flip] = canon[flip][:, [2, 3, 0, 1]]
        order = np.lexsort((canon[:, 3], canon[:, 2], canon[:, 1], canon[:, 0]))
        canon_s = canon[order]
        same = np.r_[False, np.all(canon_s[1:] == canon_s[:-1], axis=1)]
        run = np.cumsum(~same)
        cnt = np.zeros(run.max() + 1, np.int64)
        np.add.at(cnt, run, 1)
        kept = canon_s[cnt[run] == 1]
        labels = [frozenset([(0, 1)])] * len(kept)
        segs2, labels2 = noding.node_segments(kept, labels)
        arr = polygonize.polygonize(segs2, labels2)
        best_rings = None
        for f in arr.faces:
            if best_rings is None or f.area2 > best_rings[0]:
                best_rings = (f.area2, [f.shell] + f.holes)
        out = g.take(pa.array([tgt], pa.int64())).drop_columns(["merge_key"])
        if best_rings is not None:
            new_rings = st_mod.pack_rings(best_rings[1])
            out = out.set_column(out.schema.get_field_index("rings"), "rings",
                                 pa.array([new_rings], pa.large_binary()))
            out = out.set_column(out.schema.get_field_index("area2"), "area2",
                                 pa.array([int(best_rings[0])], pa.int64()))
        # re-attribute over the merged coverage ledger — the same
        # area-weighted >50% rule the overlay applies when it dissolves
        # interior small faces (JT6 then JT7 order in the reference)
        from ..geom import arrangement as arr_mod

        ledger = [
            (int(g["area2"][i].as_py()),
             frozenset(int(c) for c in (g["cov"][i].as_py() or [])))
            for i in range(len(g))
        ]
        winner, others = arr_mod.attribution(ledger)
        out = out.set_column(out.schema.get_field_index("winner_pk"), "winner_pk",
                             pa.array([-1 if winner is None else int(winner)], pa.int64()))
        out = out.set_column(out.schema.get_field_index("others"), "others",
                             pa.array([[int(o) for o in others]], pa.list_(pa.int64())))
        iv = all(bool(g["is_valid"][i].as_py()) for i in range(len(g)))
        out = out.set_column(out.schema.get_field_index("is_valid"), "is_valid",
                             pa.array([iv], pa.bool_()))
        # fresh identity for the merged face
        new_buf = out["rings"][0].as_py()
        new_uid = hashlib.md5(new_buf).hexdigest()[:16]
        new_rs, _ = st_mod.unpack_rings(new_buf)
        new_small = measure(new_rs) < min_area
        out = out.set_column(out.schema.get_field_index("uid"), "uid",
                             pa.array([new_uid], pa.string()))
        out = out.set_column(out.schema.get_field_index("small"), "small",
                             pa.array([new_small], pa.bool_()))
        return out.append_column("merge_key", pa.array([mk], pa.string()))

    merge_group.__name__ = "dissolve_merge"

    def live_faces(with_kills=True):
        parts = []
        for i, tbl in enumerate([base] + merged_tables):
            kill = kills[i]
            if with_kills and kill:
                kref = _ray.put(frozenset(kill))

                def drop(t: pa.Table, _k=kref) -> pa.Table:
                    ks = _ray.get(_k)
                    mask = pa.array([u not in ks for u in t["uid"].to_pylist()])
                    return t.filter(mask)

                parts.append(tbl.map_batches(drop, batch_format="pyarrow"))
            else:
                parts.append(tbl)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    for _ in range(max(1, rounds)):
        rm_ref = _ray.put(dict(remap))

        def relabel(t: pa.Table) -> pa.Table:
            """Edge rows through the cumulative remap -> per-small candidate
            rows (small_uid, nbr_uid, nbr_small, seg_len), bucketed."""
            rm = _ray.get(rm_ref)
            ua = t["ua"].to_pylist()
            ub = t["ub"].to_pylist()
            sa = t["sa"].to_pylist()
            sb_ = t["sb_"].to_pylist()
            ln = t["seg_len"].to_pylist()
            out_s, out_n, out_ns, out_ln, out_tb = [], [], [], [], []
            for i in range(len(ua)):
                a, fa = rm.get(ua[i], (ua[i], sa[i]))
                b, fb = rm.get(ub[i], (ub[i], sb_[i]))
                if a == b:  # edge became interior to a merged face
                    continue
                if fa:
                    out_s.append(a); out_n.append(b); out_ns.append(fb)
                    out_ln.append(ln[i])
                    out_tb.append(_zlib.crc32(a.encode()) % n_buckets)
                if fb:
                    out_s.append(b); out_n.append(a); out_ns.append(fa)
                    out_ln.append(ln[i])
                    out_tb.append(_zlib.crc32(b.encode()) % n_buckets)
            return pa.table({
                "tb": pa.array(out_tb, pa.int32()),
                "small_uid": pa.array(out_s, pa.string()),
                "nbr_uid": pa.array(out_n, pa.string()),
                "nbr_small": pa.array(out_ns, pa.bool_()),
                "seg_len": pa.array(out_ln, pa.float64()),
            })

        relabeled = edges.map_batches(relabel, batch_format="pyarrow")
        targets_ds = stages.gated_groupby(
            edges, relabeled, "tb", choose_targets, batch_format="pandas"
        )
        targets_ds = targets_ds.materialize()
        # ENFORCED driver-pull bound (one row per surviving small face is
        # output-sized on an adversarial everything-is-small layer): over
        # the cap, merge only the deterministically-first cap targets this
        # round and let the fixpoint loop absorb the rest next rounds.
        n_targets = targets_ds.count()
        if n_targets > max_driver_targets:
            import logging

            logging.getLogger(__name__).warning(
                "dissolve_small_faces: %d merge targets exceed the %d "
                "driver cap; chunking across rounds",
                n_targets, max_driver_targets,
            )
            targets = (
                targets_ds.sort("small_uid").limit(max_driver_targets).to_pandas()
            )
        else:
            targets = targets_ds.to_pandas()
        if len(targets) == 0:
            break
        tmap = dict(zip(targets["small_uid"], targets["target_uid"]))

        def _kill(u: str) -> None:
            kills[(table_of[u] + 1) if u in table_of else 0].add(u)

        # universe-absorbed faces are DELETED from the coverage
        # (reference: ST_RemEdgeNewFace against face 0)
        deleted = {u for u, tg in tmap.items() if tg == UNIV}
        for u in deleted:
            tmap.pop(u)
            _kill(u)
            remap[u] = (UNIV, False)
        # faces that targeted a now-deleted neighbour re-choose next round
        # (their universe share grows by the shared boundary)
        for u in [u for u, tg in tmap.items() if tg in deleted]:
            tmap.pop(u)
        if deleted:
            _compress_remap(remap)
        # break cycles in the functional target graph: the minimal-uid
        # member of each cycle retries next round, when its neighbours
        # have become merge products
        color: dict[str, int] = {}
        for u0 in list(tmap):
            path, x = [], u0
            while x in tmap and color.get(x, 0) == 0:
                color[x] = 1
                path.append(x)
                x = tmap[x]
            if x in tmap and color.get(x) == 1:
                cyc, y = [x], tmap[x]
                while y != x:
                    cyc.append(y)
                    y = tmap[y]
                tmap.pop(min(cyc))
            for p in path:
                color[p] = 2
        # every chain in the (now acyclic) graph ends at a live target,
        # so tmap non-empty => at least one merge this round
        live_targets = {t for t in tmap.values() if t not in tmap}
        groups: dict[str, list[str]] = {mk: [] for mk in live_targets}
        for u, tg in tmap.items():
            if tg in live_targets:
                groups[tg].append(u)
        if not groups:
            if not deleted:
                break
            continue  # only deletions this round; re-derive targets
        involved = frozenset(live_targets) | frozenset(
            u for us in groups.values() for u in us
        )
        inv_ref = _ray.put(involved)
        tmap_ref = _ray.put({u: tg for u, tg in tmap.items() if tg in live_targets})

        def pick(t: pa.Table) -> pa.Table:
            inv = _ray.get(inv_ref)
            tm = _ray.get(tmap_ref)
            uids = t["uid"].to_pylist()
            mask = pa.array([u in inv for u in uids])
            t = t.filter(mask)
            mk = [tm.get(u, u) for u in t["uid"].to_pylist()]
            return t.append_column("merge_key", pa.array(mk, pa.string()))

        picked = live_faces().map_batches(pick, batch_format="pyarrow")
        # pick keeps only merge-involved faces (tiny)
        merged_new, picked = stages.small_group_fanout(
            None, picked, "merge_key", merge_group
        )
        if merged_new is None:
            # coalesce so the merge-key sort is not O(source_blocks^2) in
            # shuffle objects
            merged_new = (
                picked.repartition(int(_ray.cluster_resources().get("CPU", 32)) * 2)
                .groupby("merge_key")
                .map_groups(merge_group, batch_format="pyarrow")
            )
        merged_new = merged_new.materialize()  # tiny: one row per merge group
        # driver pull of (merge_key, uid, small) — merged-output-sized only
        info = merged_new.select_columns(["merge_key", "uid", "small"]).take_all()
        new_of = {r["merge_key"]: (r["uid"], bool(r["small"])) for r in info}

        # retire ONLY the rows of groups that actually merged, and point
        # every old uid (transitively) at the merge product
        for mk, (nu, nsm) in new_of.items():
            for u in groups[mk] + [mk]:
                _kill(u)
                remap[u] = (nu, nsm)
            table_of[nu] = len(merged_tables)
        _compress_remap(remap)
        kills.append(set())
        merged_tables.append(
            merged_new.map_batches(
                lambda t: t.drop_columns(["merge_key"]), batch_format="pyarrow"
            ).materialize()
        )
    else:
        import logging

        logging.getLogger(__name__).warning(
            "dissolve_small_faces: fixpoint not reached within %d rounds", rounds
        )

    out = live_faces().map_batches(
        lambda t: t.drop_columns(["uid", "small"]), batch_format="pyarrow"
    )
    # the per-round union-of-filtered-unions leaves O(rounds x base_blocks)
    # tiny blocks; downstream sort shuffles are O(blocks^2) in object count,
    # so coalesce once here.  Block target scales with bytes (64 MB each)
    # so a 100 TB output is never squeezed into a fixed count.
    n_blocks = max(
        int(_ray.cluster_resources().get("CPU", 32)) * 2,
        int(base.size_bytes() // (64 << 20)),
    )
    return out.repartition(n_blocks)
