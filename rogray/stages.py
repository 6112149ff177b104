"""Ray Data stages of the resolve-overlap-and-gap pipeline.

Stage graph (pipelines/resolve.py wires these together):

    read_parquet(documents)
      -> Unwrap            tasks: spans -> snapped rings
      -> (histogram pass)  partial counts per fine cell -> groupby sum ->
                           driver builds the content-balanced cut (tiny)
      -> Route             tasks: 1 row per (tile, polygon) + leaf markers
      -> groupby(tile).map_groups(TileOverlay)         the one big shuffle
      -> groupby(stitch_key).map_groups(stitch_local)  per-coarse-cell stitch
      -> groupby(stitch_key).map_groups(stitch_global) frontier-only stitch
      -> left hash join on winner_pk -> FinalizeJoined

Interior faces keep a per-tile stitch key (pass through both stitch
shuffles wholesale); border pieces bucket per coarse cell and assemble
per coverage signature inside the bucket: tile-border segments with
same-coverage faces on both sides cancel exactly (both tiles computed
bit-identical snapped coordinates), re-noding handles T-junctions between
different-level tiles, crossing-vertex healing removes the split
artifacts, and assembled regions re-polygonize.  Faces still touching an
uncancelled border escalate to 64 hashed global buckets; at the global
level, uncovered faces still touching a pure tile border are the universe
and are dropped.  This replaces the reference's serial master-topology
merge + JT2..JT6 border passes (function_resolve_overlap_gap_run.sql:200-446).

All per-record stages run as TASK pools: the overlay holds no per-actor
state (everything is per tile group), and task pools release CPUs the
moment a dataset finishes — actor pools were observed pinning CPUs after
execution, starving later pipelines sharing the session.  Actor pools
remain where per-actor state is real (multimodal decode, resumable
writer).
"""

from __future__ import annotations

import json
import os
import struct
import time

import numpy as np
import pyarrow as pa

from . import spans as spans_mod
from .config import GridConfig
from .ids import stable_pk
from .geom import arrangement, core, noding, polygonize, wkb
from .tiling import balance, quadkey

# ---------------------------------------------------------------------------
# ring (de)serialization: int32 nrings; per ring int32 npts, npts*2 int64 xy,
# npts uint8 tile-border mask
# ---------------------------------------------------------------------------


def pack_rings(rings: list[np.ndarray], masks: list[np.ndarray] | None = None) -> bytes:
    out = [struct.pack("<i", len(rings))]
    for k, r in enumerate(rings):
        r = np.ascontiguousarray(r, dtype="<i8")
        m = (
            np.ascontiguousarray(masks[k], dtype=np.uint8)
            if masks is not None
            else np.zeros(len(r), dtype=np.uint8)
        )
        out.append(struct.pack("<i", len(r)))
        out.append(r.tobytes())
        out.append(m.tobytes())
    return b"".join(out)


def unpack_rings(buf: bytes) -> tuple[list[np.ndarray], list[np.ndarray]]:
    (nr,) = struct.unpack_from("<i", buf, 0)
    off = 4
    rings, masks = [], []
    for _ in range(nr):
        (n,) = struct.unpack_from("<i", buf, off)
        off += 4
        r = np.frombuffer(buf, dtype="<i8", count=2 * n, offset=off).reshape(n, 2)
        off += 16 * n
        m = np.frombuffer(buf, dtype=np.uint8, count=n, offset=off)
        off += n
        rings.append(r.astype(np.int64))
        masks.append(m.copy())
    return rings, masks


def parse_packed_batch(
    bufs: list[bytes],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Parse MANY pack_rings buffers into one concatenated int64 (N,2)
    coordinate array + per-ring (offset, length) + per-face ring count —
    the layout the batched area/WKB kernels consume.  Masks are skipped.
    One frombuffer for the whole batch instead of two numpy allocations
    per ring."""
    ring_lens: list[int] = []
    face_nr = np.empty(len(bufs), np.int64)
    chunks: list[bytes] = []
    for f, buf in enumerate(bufs):
        (nr,) = struct.unpack_from("<i", buf, 0)
        face_nr[f] = nr
        off = 4
        for _ in range(nr):
            (n,) = struct.unpack_from("<i", buf, off)
            off += 4
            chunks.append(buf[off : off + 16 * n])
            off += 17 * n  # coords (16n) + tile-border mask (n)
            ring_lens.append(n)
    lens = np.asarray(ring_lens, dtype=np.int64)
    coords = np.frombuffer(b"".join(chunks), dtype="<i8").reshape(-1, 2)
    offs = (
        np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        if len(lens)
        else np.empty(0, np.int64)
    )
    return coords, offs, lens, face_nr


def _stage_log(stage: str, key, n_in: int, n_out: int, sec: float) -> None:
    """Optional per-group diagnostics (IO3 analogue of the reference's
    `<prefix>_long_time_log2` slow-job table, cell.sql:925-927): set
    ROGRAY_STAGE_LOG=<path> to append one JSON line per group.  Appends of
    short lines with O_APPEND are atomic enough for diagnostics."""
    path = os.environ.get("ROGRAY_STAGE_LOG")
    if not path:
        return
    line = json.dumps(
        {"stage": stage, "key": str(key), "n_in": n_in, "n_out": n_out,
         "sec": round(sec, 4), "pid": os.getpid()}
    )
    with open(path, "a") as f:
        f.write(line + "\n")


# ---------------------------------------------------------------------------
# small-input groupby fan-out: skip the all-to-all when the grouped table
# is driver-bounded
# ---------------------------------------------------------------------------

# grouped tables under this decoded size skip the Ray Data exchange and run
# as plain per-bucket Ray tasks (every exchange — hash or sort — has a
# multi-second fixed floor: aggregator actor spin-up + per-partition submit
# round trips, measured 2-5 s for an 8 MB groupby at 32 CPUs)
SMALL_FANOUT_LIMIT = 64 << 20

_fanout_task_remote = None


def _group_fanout_task(
    fn, tbl: pa.Table, keys, batch_format: str, whole_bucket: bool = False
) -> pa.Table:
    """Apply a per-group callable to every key-group inside one bucket.

    ``whole_bucket=True``: call ``fn`` ONCE on the whole bucket instead of
    per group — valid only when the caller declares fn group-union-safe
    (fn(A ∪ B) == fn(A) ∪ fn(B) for disjoint key sets, e.g. a
    drop-duplicates keyed at least as fine as the group key).  Skips the
    per-group take/convert loop, which dominates at thousands of tiny
    groups per bucket."""
    if whole_bucket:
        if batch_format == "pandas":
            r = fn(tbl.to_pandas())
            if r is None or not len(r):
                return None
            import pandas as pd  # noqa: F401

            return pa.Table.from_pandas(r, preserve_index=False)
        r = fn(tbl)
        return r
    starts, ends, order = _group_runs(tbl, keys)
    outs = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        sub = tbl.take(pa.array(order[s:e], pa.int64()))
        if batch_format == "pandas":
            # empties dropped: a column-typed empty frame arrow-casts to
            # null types and would poison the concat schema
            r = fn(sub.to_pandas())
            if r is not None and len(r):
                outs.append(r)
        else:
            # pyarrow fns own their schema: keep 0-row tables so the
            # streaming from_arrow_refs path always has a typed block
            r = fn(sub)
            if r is not None:
                outs.append(r)
    if not outs:
        if batch_format != "pandas":
            # pyarrow fns are schema-owning by contract: recover a typed
            # 0-row block from fn(empty) so a bucket whose every group was
            # dropped never emits a None block into from_arrow_refs
            try:
                return fn(tbl.slice(0, 0))
            except Exception:
                return None
        return None
    if batch_format == "pandas":
        # one pandas concat, then one Arrow conversion: pandas unifies
        # per-group dtype drift (e.g. int64 upcast to float64 only in the
        # groups whose Arrow input carried nulls) exactly the way the
        # map_groups pandas-block path does
        import pandas as pd

        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True), preserve_index=False
        )
    return pa.concat_tables(outs, promote_options="default")


def _group_runs(tbl: pa.Table, keys) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(starts, ends, order): contiguous key-group runs of a sorted view.

    Single int/float key: one argsort.  Multi-column (or string) keys:
    pandas ``ngroup`` codes (exact, hash-free) then the same run split.

    Keys must be NON-NULL (every call site computes them: crc32 buckets,
    tile ids, pair ids).  A null key would split into per-row groups here
    (NaN != NaN) while Ray's groupby makes one null group."""
    if isinstance(keys, str):
        keys = [keys]
    if len(keys) == 1 and pa.types.is_integer(tbl.schema.field(keys[0]).type):
        codes = tbl[keys[0]].to_numpy(zero_copy_only=False)
    else:
        import pandas as pd  # noqa: F401  (to_pandas needs it anyway)

        kdf = tbl.select(keys).to_pandas()
        codes = kdf.groupby(keys, sort=False).ngroup().to_numpy()
    order = np.argsort(codes, kind="stable")
    ks = codes[order]
    starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
    ends = np.concatenate([starts[1:], [len(ks)]])
    return starts, ends, order


# Kernels declared GROUP-UNION-SAFE (fn(A ∪ B) == fn(A) ∪ fn(B) for
# disjoint key sets) and therefore allowed to run ONCE per fan-out bucket
# instead of once per group.  Opting in requires BOTH a registration here
# (call sites pass the registered name, never a bare True) AND a
# differential union-safety test case of the same name —
# tests/test_fanout.py::test_whole_bucket_registry_covered fails when
# either side is missing, so a new kernel cannot silently opt in.
WHOLE_BUCKET_KERNELS = frozenset(
    {
        "exact_dedup.keep_first",
        "events_sessionize",
        "events_asof_join",
        "events_window_stats",
    }
)


def _check_whole_bucket(whole_bucket) -> bool:
    if not whole_bucket:
        return False
    if whole_bucket is True or whole_bucket not in WHOLE_BUCKET_KERNELS:
        raise ValueError(
            "whole_bucket must be a kernel name registered in "
            "stages.WHOLE_BUCKET_KERNELS (with a matching union-safety "
            f"differential test), got {whole_bucket!r}"
        )
    return True


def safe_size_bytes(ds):
    """Input size of ``ds`` WITHOUT executing anything, or ``None``.

    ``ds.size_bytes()`` on a derived (transformed) dataset EXECUTES its
    plan (verified on Ray 2.49), which would turn the "nothing executes
    on pre-screen rejection" guarantee of the fan-out gates into a full
    eager execution at 100 TB.  Instead: a materialized dataset reports
    its true in-memory size (metadata lookup); any other dataset reports
    the SUM OF ITS LEAF SOURCES' metadata sizes (compressed on-disk bytes
    for parquet ``Read`` leaves — the same pre-screen bound callers got
    by passing the source dataset directly, now derived automatically for
    ``read().map_batches()/filter()/union()``-shaped pipeline inputs).
    At 100 TB the leaf sum is huge and the gate rejects without running a
    single task; at small scale the gate's second stage (true size of the
    materialized grouped table) still guards against plan expansion.
    Returns ``None`` when any leaf lacks size metadata — callers treat
    that as gate-fail."""
    try:
        if ds._plan.has_computed_output():
            return ds.size_bytes()
        total = 0
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            deps = op.input_dependencies
            if deps:
                stack.extend(deps)
                continue
            sz = getattr(op.infer_metadata(), "size_bytes", None)
            if sz is None:
                return None
            total += sz
        return total
    except Exception:
        return None


def safe_count(ds):
    """Row count of ``ds`` WITHOUT executing anything, or ``None``:
    true count for materialized datasets, sum of leaf-source metadata row
    counts otherwise (exact for row-preserving plans, an upper bound for
    filters — callers use it only to SIZE bucket counts, never for
    correctness).  Same rationale as :func:`safe_size_bytes`:
    ``ds.count()`` on a derived dataset executes its plan."""
    try:
        if ds._plan.has_computed_output():
            return ds.count()
        total = 0
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            deps = op.input_dependencies
            if deps:
                stack.extend(deps)
                continue
            n = getattr(op.infer_metadata(), "num_rows", None)
            if n is None:
                return None
            total += n
        return total
    except Exception:
        return None


def small_group_fanout(
    hint_ds,
    grouped,
    key,
    fn,
    limit: int | None = None,
    batch_format: str = "pyarrow",
    whole_bucket: str | bool = False,
):
    """``grouped.groupby(key).map_groups(fn)`` without the all-to-all, for
    driver-bounded inputs.  ``whole_bucket`` must be a kernel name from
    :data:`WHOLE_BUCKET_KERNELS` (see :func:`_check_whole_bucket`).

    Returns ``(result_dataset_or_None, grouped_maybe_materialized)``: the
    caller falls back to the real groupby (on the returned dataset, which
    may already be materialized — no recompute) when the input fails the
    gate.  Two-stage gate: ``hint_ds.size_bytes()`` (the pipeline input —
    for parquet this is compressed on-disk size, a safe lower bound on
    the decoded grouped table; pass a list/tuple for multi-input
    pipelines and the sizes sum, or ``None`` when the direct upstream is
    already known-bounded) pre-screens without executing anything; only
    when it passes is ``grouped`` materialized and its true in-memory
    size checked.  ``key`` may be one column name or a list (exact
    multi-key groups via pandas ``ngroup`` codes).  ``batch_format``
    mirrors ``map_groups``: pyarrow fns stream task outputs through
    ``from_arrow_refs`` (results never touch the driver); pandas fns
    gather their (small, aggregate-shaped) outputs and re-emit one Arrow
    block — empty frames are dropped so mixed empty/non-empty buckets
    cannot poison the unified schema.  On the fan-out path the bounded table is pulled to the
    driver once, groups are bin-packed by row count into ~2 buckets per
    CPU (largest groups first, so the biggest tile starts first and never
    shares a straggler bucket), and each bucket runs as one plain Ray
    task via ``from_arrow_refs`` — scheduling starts immediately and
    overlaps whatever execution consumes the result.  At 100 TB the gate
    simply never passes and the hash-shuffle path runs unchanged."""
    import ray
    import ray.data as rd

    _check_whole_bucket(whole_bucket)
    if limit is None:
        limit = SMALL_FANOUT_LIMIT  # read at call time: tests patch the module global
    if limit <= 0:
        return None, grouped
    if hint_ds is not None:
        hints = hint_ds if isinstance(hint_ds, (list, tuple)) else (hint_ds,)
        # safe_size_bytes: a hint whose size cannot be read from metadata
        # (derived dataset) FAILS the pre-screen rather than executing its
        # plan — callers must pass the pre-transform read_parquet dataset
        # (a safe upper bound), a materialized dataset, or None.
        if sum((safe_size_bytes(h) or limit + 1) for h in hints) > limit:
            return None, grouped
    grouped = grouped.materialize()
    if (grouped.size_bytes() or limit + 1) > limit:
        return None, grouped
    tbls = [t for t in ray.get(grouped.to_arrow_refs()) if t is not None and len(t)]
    if not tbls:
        return None, grouped
    whole = pa.concat_tables(tbls, promote_options="default")
    return group_fanout_table(whole, key, fn, batch_format, whole_bucket=whole_bucket), grouped


def gated_groupby(
    hint_ds,
    grouped,
    key,
    fn,
    limit: int | None = None,
    batch_format: str = "pyarrow",
    whole_bucket: str | bool = False,
):
    """``grouped.groupby(key).map_groups(fn)`` with the driver-bounded
    fan-out fast path in front — THE canonical dual-path wiring.  Collapses
    the idiom every gated operator used to hand-write::

        out, g = small_group_fanout(hint, g, key, fn, ...)
        if out is None:
            out = g.groupby(key).map_groups(fn, batch_format=...)

    into one call, so the fallback chain cannot drift per call site.  The
    gate semantics are exactly :func:`small_group_fanout`'s (metadata-only
    pre-screen via :func:`safe_size_bytes`; at 100 TB the gate never
    passes and this IS the hash-shuffle groupby)."""
    out, grouped = small_group_fanout(
        hint_ds,
        grouped,
        key,
        fn,
        limit=limit,
        batch_format=batch_format,
        whole_bucket=whole_bucket,
    )
    if out is not None:
        return out
    return grouped.groupby(key).map_groups(fn, batch_format=batch_format)


def group_fanout_table(
    whole: pa.Table,
    key,
    fn,
    batch_format: str = "pyarrow",
    gather: bool = False,
    whole_bucket: str | bool = False,
):
    """The bin/submit half of :func:`small_group_fanout` for a table that is
    already driver-resident (the gated pull above, or the plain-task front
    end of :func:`small_input_refs`).  Returns the result Dataset, or None
    when every pandas-format bucket came back empty (the caller's tiny
    fallback groupby owns the schema in that case).  ``gather=True``
    (pandas format only) returns the unified ``pa.Table`` instead of
    re-emitting a Dataset — for callers that keep chaining driver-side."""
    import ray
    import ray.data as rd

    _check_whole_bucket(whole_bucket)
    starts, ends, order = _group_runs(whole, key)
    sizes = ends - starts
    by_size = np.argsort(-sizes, kind="stable")
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 0) or 0) or 8
    except Exception:
        ncpu = 8
    n_bins = max(1, min(2 * ncpu, len(starts)))
    bin_rows = np.zeros(n_bins, dtype=np.int64)
    bin_groups: list[list[int]] = [[] for _ in range(n_bins)]
    for g in by_size.tolist():
        b = int(np.argmin(bin_rows))
        bin_groups[b].append(g)
        bin_rows[b] += sizes[g]
    global _fanout_task_remote
    if _fanout_task_remote is None:
        _fanout_task_remote = ray.remote(num_cpus=1)(_group_fanout_task)
    # ship bins via ONE global permutation take then a contiguous take per
    # bin: N scattered takes cost ~20-30 ms each on a ring-payload table
    # (1.4 s at 64 bins — more than the overlay compute itself), while the
    # contiguous re-take both runs as a memcpy-like gather AND compacts
    # the payload (a zero-copy slice would pickle its parent's FULL
    # buffers: 41 MB per 1 MB bin, measured)
    perm_parts, bin_offs = [], []
    off = 0
    for b in range(n_bins):
        if not bin_groups[b]:
            continue
        idx = np.concatenate([order[starts[g]:ends[g]] for g in bin_groups[b]])
        perm_parts.append(idx)
        bin_offs.append((off, len(idx)))
        off += len(idx)
    packed = whole.take(pa.array(np.concatenate(perm_parts), pa.int64()))
    refs = [
        _fanout_task_remote.remote(
            fn,
            packed.take(pa.array(np.arange(a, a + n), pa.int64())),
            key,
            batch_format,
            whole_bucket,
        )
        for a, n in bin_offs
    ]
    if batch_format == "pandas":
        outs = [t for t in ray.get(refs) if t is not None and len(t)]
        if not outs:
            return None  # all-empty: the tiny fallback groupby owns schema
        # permissive: tasks may disagree on numeric width (pandas NaN
        # upcast in some buckets only) — same unification to_pandas would do
        unified = pa.concat_tables(outs, promote_options="permissive")
        if gather:
            return unified
        # re-slice into ~one block per task: a single giant block would
        # serialize every downstream map stage (measured 2.5x on the
        # ngram-jaccard attach+verify chain)
        n_out = max(1, min(len(refs), len(unified)))
        step = -(-len(unified) // n_out)
        # combine_chunks like the sibling call sites: a zero-copy slice
        # pickles its parent's FULL buffers into every emitted block
        slices = [
            unified.slice(i, step).combine_chunks() for i in range(0, len(unified), step)
        ]
        return rd.from_arrow(slices)
    return rd.from_arrow_refs(refs)


# ---------------------------------------------------------------------------
# small-input plain-task front end: skip Ray Data executions when the INPUT
# layer is driver-bounded
# ---------------------------------------------------------------------------


def small_input_refs(ds, limit: int | None = None):
    """``(block_refs | None, ds_maybe_materialized)`` — the gate for the
    plain-task front end (read → per-block unwrap/route/histogram as plain
    Ray tasks instead of Ray Data executions, each of which carries a
    1-2.5 s fixed floor at 32 CPUs: 64 streaming-executor task submits at
    20-30 ms each for ~3 CPU·s of useful work, measured on the sf0.1
    unwrap+route leg).

    Same two-stage gate as :func:`small_group_fanout`: ``ds.size_bytes()``
    (for parquet sources a metadata lookup of the compressed on-disk size,
    a lower bound on the decoded table) pre-screens without executing;
    only then is the input materialized and its true in-memory size
    checked.  On fallback the materialized dataset is returned so the
    caller's Ray Data path reuses the blocks instead of re-reading.  At
    100 TB the pre-screen never passes and nothing executes."""
    if limit is None:
        limit = SMALL_FANOUT_LIMIT
    # safe_size_bytes: pre-screen must stay metadata-only — a derived input
    # whose size cannot be read without executing fails the gate instead.
    if limit <= 0 or (safe_size_bytes(ds) or limit + 1) > limit:
        return None, ds
    m = ds.materialize()
    if (m.size_bytes() or limit + 1) > limit:
        return None, m
    import ray

    refs = list(m.to_arrow_refs())
    return (refs or None), m


class Compose:
    """Picklable left-to-right composition of batch callables."""

    def __init__(self, *fns):
        self.fns = fns

    def __call__(self, t):
        for f in self.fns:
            t = f(t)
        return t


def _block_map_task(fn, *tbls):
    """One plain-task wave member: fn over every input block, one concat.

    ``fn`` must be schema-owning on pyarrow tables (returns a typed table
    even for 0-row input) so all-empty groups still concat; a None return
    drops that block.  Zero-COLUMN blocks are dropped before fn: Ray Data
    emits schema-less empty bundles from pass-through operators (its map
    operators skip the UDF on them too)."""
    outs = [fn(t) for t in tbls if t is not None and t.num_columns]
    outs = [o for o in outs if o is not None]
    return pa.concat_tables(outs, promote_options="default") if outs else None


_block_map_remote = None


def block_map_refs(refs, fn, n_tasks: int | None = None):
    """Apply ``fn`` to materialized block refs as plain Ray tasks (no Ray
    Data execution), ~one task per CPU with round-robin block assignment.
    Returns output-table refs; a ref resolves to None when every block in
    its group was dropped — consumers filter after ``ray.get``."""
    import ray

    global _block_map_remote
    if _block_map_remote is None:
        _block_map_remote = ray.remote(num_cpus=1)(_block_map_task)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 0) or 0) or 8
    except Exception:
        ncpu = 8
    k = max(1, min(n_tasks or ncpu, len(refs)))
    groups = [refs[i::k] for i in range(k)]
    return [_block_map_remote.remote(fn, *g) for g in groups if g]


def table_map_refs(tbls, fn):
    """Apply ``fn`` to driver-resident tables as plain Ray tasks, one task
    per table (callers pre-slice to the wanted granularity — compact
    slices, or the parent buffers ship with every task)."""
    import ray

    global _block_map_remote
    if _block_map_remote is None:
        _block_map_remote = ray.remote(num_cpus=1)(_block_map_task)
    return [_block_map_remote.remote(fn, t) for t in tbls]


def cut_from_refs(
    refs,
    grid: GridConfig,
    base_level: int,
    fine_level: int,
    max_rows: int,
) -> "balance.CutIndex":
    """:func:`compute_cut` over driver-bounded block refs: one plain-task
    wave computes the EXACT fine-level centroid histogram (no sampling —
    the input already fits the :data:`SMALL_FANOUT_LIMIT` gate, so a full
    pass is cheaper than the sampled Ray Data execution's fixed floor).
    Identical cut to compute_cut whenever compute_cut would not sample
    (integer partials summed either way, order-independent); when it WOULD
    sample, the exact histogram is strictly better balanced and the cut
    stays performance-only (results are tiling-independent by test)."""
    import ray

    fine_level = min(fine_level, grid.max_level())
    base_level = min(base_level, fine_level)
    outs = [
        o
        for o in ray.get(block_map_refs(refs, _HistPartial(grid, fine_level)))
        if o is not None and len(o)
    ]
    acc: dict[int, int] = {}
    for o in outs:
        for c, n in zip(o["cell"].to_pylist(), o["n"].to_pylist()):
            acc[c] = acc.get(c, 0) + n
    cells = np.fromiter(acc.keys(), dtype=np.uint64, count=len(acc))
    counts = np.fromiter(acc.values(), dtype=np.int64, count=len(acc))
    cut = balance.build_cut(cells, counts, base_level, fine_level, max_rows)
    return balance.CutIndex(cut, base_level, fine_level, grid.span_px)


FACE_SCHEMA = pa.schema(
    [
        ("tile", pa.int64()),
        ("stitch_key", pa.string()),
        ("kind", pa.int8()),          # 0 final face, 1 border piece
        ("rings", pa.large_binary()),
        ("cov", pa.list_(pa.int64())),
        ("winner_pk", pa.int64()),    # -1 = gap (no attribution)
        ("others", pa.list_(pa.int64())),
        ("is_valid", pa.bool_()),
        ("area2", pa.int64()),        # 2 * area in px^2
    ]
)


# ---------------------------------------------------------------------------
# unwrap: documents -> snapped polygon rows
# ---------------------------------------------------------------------------


class Unwrap:
    """Span documents -> (pk, packed snapped rings, bbox, validity).

    Stateless-task stage (plain callable, pickled once into the task spec):
    decodes WKB, snaps to the global grid, normalizes orientation.  Kept as
    a task, not an actor pool, so small-CPU sessions don't starve the
    shuffles — only the heavy stages (TileOverlay, Finalize) hold actors.
    """

    def __init__(self, grid: GridConfig):
        self.grid = grid

    def __call__(self, t: pa.Table) -> pa.Table:
        g = self.grid
        wkbs = spans_mod.extract_geometry_wkb(t["spans"])
        doc_ids = t["doc_id"].to_pylist()
        out = {
            "doc_id": [],
            "pk": [],
            "rings": [],
            "minx": [],
            "miny": [],
            "maxx": [],
            "maxy": [],
            "valid": [],
            "spans_idx": [],
        }
        keep_rows = []
        # phase 1 (per-row decode): gather every ring of the batch; all
        # geometry math below runs ONCE over the concatenated rings
        row_rings_f: list[list[np.ndarray]] = []
        row_is_line: list[bool] = []
        row_src: list[int] = []
        for i, wb in enumerate(wkbs):
            if not wb:
                continue
            is_line = False
            try:
                gtype, parts = wkb.decode(wb)
            except wkb.WkbError:
                continue
            if gtype == wkb.LINESTRING:
                # companion border-line layer (reference AR5 `grense` mode,
                # overlap_gap_input_t2.sql): lines are noded into the
                # arrangement but carry no interior - they split faces
                # without toggling coverage
                is_line = True
                rings_f = [parts[0][0]]
            elif gtype in (wkb.POLYGON, wkb.MULTIPOLYGON):
                rings_f = [r for poly in (parts if gtype == wkb.MULTIPOLYGON else [parts[0]]) for r in poly]
            else:
                continue
            rings_f = [r for r in rings_f if len(r) >= (2 if is_line else 3)]
            if not rings_f:
                continue
            row_rings_f.append(rings_f)
            row_is_line.append(is_line)
            row_src.append(i)
        # phase 2 (batched): one snap over all coordinates, one simplicity
        # pass, one signed-area pass, one bbox pass (stages verified
        # term-for-term against the scalar kernels in tests/test_geom_kernel)
        flat_f = [r for rr in row_rings_f for r in rr]
        ring_counts = np.array([len(rr) for rr in row_rings_f], dtype=np.int64)
        if flat_f:
            lens = np.array([len(r) for r in flat_f], dtype=np.int64)
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
            snapped = core.snap(
                np.concatenate(flat_f).astype(np.float64),
                g.origin_x,
                g.origin_y,
                g.precision,
            )
            rings_all = [
                snapped[offs[j] : offs[j] + lens[j]] for j in range(len(flat_f))
            ]
            first_idx = np.concatenate(
                [[0], np.cumsum(ring_counts)[:-1]]
            ).astype(np.int64)
            shell_mask = np.zeros(len(flat_f), dtype=bool)
            shell_mask[first_idx] = True
            line_ring = np.repeat(np.array(row_is_line, dtype=bool), ring_counts)
            poly_idx = np.flatnonzero(~line_ring)
            simple = np.ones(len(flat_f), dtype=bool)
            if len(poly_idx):
                simple[poly_idx] = core.rings_are_simple_batch(
                    [rings_all[j] for j in poly_idx]
                )
                a2 = core.ring_signed_area2_batch(
                    [rings_all[j] for j in poly_idx]
                )
                want_ccw = shell_mask[poly_idx]
                flip = ((a2 < 0) & want_ccw) | ((a2 > 0) & ~want_ccw)
                for j in poly_idx[np.flatnonzero(flip)]:
                    rings_all[j] = rings_all[j][::-1]
            bb = core.bbox_of_rings_batch(rings_all)
        else:
            rings_all, simple, bb = [], np.empty(0, bool), np.empty((0, 4), np.int64)
            line_ring = np.empty(0, bool)
        pos = 0
        for ri, src in enumerate(row_src):
            nr = int(ring_counts[ri])
            rings = rings_all[pos : pos + nr]
            if row_is_line[ri]:
                valid = True
            else:
                valid = bool(simple[pos : pos + nr].all())
            rb = bb[pos : pos + nr]
            mnx = int(rb[:, 0].min())
            mny = int(rb[:, 1].min())
            mxx = int(rb[:, 2].max())
            mxy = int(rb[:, 3].max())
            pos += nr
            did = doc_ids[src]
            pk = stable_pk(did)
            out["doc_id"].append(did)
            out["pk"].append(pk)
            out["rings"].append(pack_rings(rings))
            out["minx"].append(mnx)
            out["miny"].append(mny)
            out["maxx"].append(mxx)
            out["maxy"].append(mxy)
            out["valid"].append(valid)
            out.setdefault("is_line", []).append(row_is_line[ri])
            keep_rows.append(src)
        res = pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "pk": pa.array(out["pk"], pa.int64()),
                "rings": pa.array(out["rings"], pa.large_binary()),
                "minx": pa.array(out["minx"], pa.int64()),
                "miny": pa.array(out["miny"], pa.int64()),
                "maxx": pa.array(out["maxx"], pa.int64()),
                "maxy": pa.array(out["maxy"], pa.int64()),
                "valid": pa.array(out["valid"], pa.bool_()),
                "is_line": pa.array(out.get("is_line", []), pa.bool_()),
            }
        )
        # spans ride along untouched (zero-copy take of the original column)
        res = res.append_column("spans", t["spans"].combine_chunks().take(pa.array(keep_rows, pa.int64())))
        return res


def _extent_partial(t: pa.Table) -> pa.Table:
    """Per-batch float bbox partial (picklable: shared by the Ray Data
    extent pass and the plain-task refs path)."""
    wkbs = spans_mod.extract_geometry_wkb(t["spans"])
    # bbox-only scan (covers line layers too — they participate in the
    # arrangement, so the frame must contain them)
    _, bmnx, bmny, bmxx, bmxy = wkb.scan_coord_bboxes(wkbs)
    if len(bmnx):
        mnx, mny = float(bmnx.min()), float(bmny.min())
        mxx, mxy = float(bmxx.max()), float(bmxy.max())
    else:
        mnx = mny = np.inf
        mxx = mxy = -np.inf
    return pa.table({"minx": [mnx], "miny": [mny], "maxx": [mxx], "maxy": [mxy]})


def extent_of_docs(ds, input_refs=None) -> tuple[float, float, float, float]:
    """One cheap pass: float bbox of all geometry (per-batch partials).
    With ``input_refs`` (from :func:`small_input_refs`) the partials run
    as one plain-task wave instead of a Ray Data execution."""
    if input_refs:
        import ray

        outs = [
            o
            for o in ray.get(block_map_refs(input_refs, _extent_partial))
            if o is not None and len(o)
        ]
        parts = [r for o in outs for r in o.to_pylist()]
    else:
        parts = ds.map_batches(_extent_partial, batch_format="pyarrow").take_all()
    mnx = min(p["minx"] for p in parts)
    mny = min(p["miny"] for p in parts)
    mxx = max(p["maxx"] for p in parts)
    mxy = max(p["maxy"] for p in parts)
    return mnx, mny, mxx, mxy


def world_grid(precision: float) -> GridConfig:
    """Fixed lon/lat world frame: origin (-181, -91), power-of-two span
    covering the globe with margin.  Using a FIXED frame (like H3/S2 cell
    ids) means no extent pass is needed and every dataset snaps to the
    same global grid."""
    span_px = 1
    need = int(512.0 / precision) + 2
    while span_px < need:
        span_px *= 2
    if span_px > core.MAX_SPAN_PX:
        raise ValueError(f"precision {precision} too fine for the world frame")
    return GridConfig(-181.0, -91.0, span_px * precision, precision)


class _HistPartial:
    """Per-batch centroid-cell partial counts (picklable: shared by the
    Ray Data histogram execution and the plain-task refs path).

    ``only_under`` (an ``ray.put`` ObjectRef of a frozenset of mid-level
    cells) restricts the count to rows whose centroid falls under one of
    those cells — the refinement stage of the two-stage histogram drops
    cold rows inside the task, so only hot-cell partials ever move."""

    def __init__(self, grid: GridConfig, fine_level: int,
                 only_under=None, mid_level: int | None = None):
        self.grid = grid
        self.fine_level = fine_level
        self.only_under = only_under
        self.mid_level = mid_level

    def __call__(self, t: pa.Table) -> pa.Table:
        grid = self.grid
        wkbs = spans_mod.extract_geometry_wkb(t["spans"])
        # bbox-only scan: no per-ring arrays, one reduceat per bound (same
        # float values as the per-row min-of-ring-mins path)
        _, mnx, mny, mxx, mxy = wkb.scan_coord_bboxes(wkbs)
        if not len(mnx):
            return pa.table({"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        g = core.snap(np.stack([(mnx + mxx) / 2, (mny + mxy) / 2], axis=1), grid.origin_x, grid.origin_y, grid.precision)
        cells = quadkey.cell_of_point_px(g[:, 0], g[:, 1], self.fine_level, grid.span_px)
        if self.only_under is not None:
            import ray as _ray

            hot = _ray.get(self.only_under)
            par = quadkey.parent(cells, self.mid_level)
            mask = np.fromiter((int(p) in hot for p in par), bool, len(par))
            cells = cells[mask]
            if not len(cells):
                return pa.table({"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": u.astype(np.int64), "n": c})


def histogram_cells(ds, grid: GridConfig, fine_level: int,
                    only_under=None, mid_level: int | None = None):
    """Cheap histogram pass: decode -> centroid fine cell partial counts.
    Skips the full unwrap work (validity O(k^2), packing) because only the
    bbox centre is needed for content balancing."""
    return ds.map_batches(
        _HistPartial(grid, fine_level, only_under, mid_level),
        batch_format="pyarrow",
    )


def grid_from_extent(
    minx: float, miny: float, maxx: float, maxy: float, precision: float
) -> GridConfig:
    """Global snap grid + power-of-two tiling square with a margin so data
    never touches the tiling-square boundary (universe detection relies on
    the outermost frontier being tile borders, not data)."""
    w = max(maxx - minx, maxy - miny)
    margin = max(w * 0.01, precision * 64)
    span_px = 1
    need = int((w + 2 * margin) / precision) + 2
    while span_px < need:
        span_px *= 2
    if span_px > core.MAX_SPAN_PX:
        raise ValueError(
            f"extent/precision needs {span_px} px > 2^28; raise precision"
        )
    return GridConfig(minx - margin, miny - margin, span_px * precision, precision)


# ---------------------------------------------------------------------------
# histogram -> content-balanced cut
# ---------------------------------------------------------------------------


def compute_cut(
    docs_ds,
    grid: GridConfig,
    base_level: int,
    fine_level: int,
    max_rows: int,
    sample_target: int = 200_000,
    refine_levels: int = 3,
    two_stage: bool | None = None,
) -> balance.CutIndex:
    """Content-balanced cut from a (sampled) centroid histogram.

    The cut only affects performance, never results (the output is
    tiling-independent by construction and by test), so at scale the
    histogram reads a seeded sample and scales the counts — one cheap
    metadata count() plus a fractional read instead of a full pass.

    Two-stage refinement (auto when sampling): a coarse pass at
    ``fine_level - refine_levels`` finds hot cells (count > max_rows, the
    split rule), then a second sample — its whole budget concentrated on
    hot rows — refines ONLY those at fine_level.  Cold cells are lumped on
    one fine descendant, which provably yields the same cut (a cell at or
    under max_rows never splits, so the distribution below it is unused).
    """
    fine_level = min(fine_level, grid.max_level())
    base_level = min(base_level, fine_level)

    n_rows = docs_ds.count()  # parquet metadata, no data read
    frac = min(1.0, sample_target / max(1, n_rows))
    mid_level = fine_level - refine_levels
    if two_stage is None:
        # auto: the refinement stage pays off only when the sample is a
        # real subsample AND the coarse stage is strictly coarser
        two_stage = frac < 1.0 and mid_level > base_level
    if not two_stage or mid_level <= base_level:
        hist_ds = docs_ds if frac >= 1.0 else docs_ds.random_sample(frac, seed=42)
        cells, counts = _collect_hist(histogram_cells(hist_ds, grid, fine_level), frac)
        cut = balance.build_cut(cells, counts, base_level, fine_level, max_rows)
        return balance.CutIndex(cut, base_level, fine_level, grid.span_px)

    # --- two-stage histogram (for 10^12-row layers a single fine-level
    # sample leaves ~0 rows per fine cell; the coarse pass finds the HOT
    # cells, then the whole refinement sample budget concentrates there) --
    import ray as _ray

    hist1 = docs_ds if frac >= 1.0 else docs_ds.random_sample(frac, seed=42)
    cells1, counts1 = _collect_hist(histogram_cells(hist1, grid, mid_level), frac)
    hot_mask = counts1 > max_rows  # exactly build_cut's split rule
    hot = frozenset(int(c) for c in cells1[hot_mask])
    # cold mid cells never split below mid_level, so LUMPING their count on
    # one fine descendant yields the identical cut (asserted in tests)
    _, cix, ciy = quadkey.decode(cells1[~hot_mask])
    d = fine_level - mid_level
    cold_cells = quadkey.encode(fine_level, cix << np.int64(d), ciy << np.int64(d))
    cold_counts = counts1[~hot_mask]
    if hot:
        est_hot = int(counts1[hot_mask].sum())
        frac2 = min(1.0, sample_target / max(1, est_hot))
        hist2 = docs_ds if frac2 >= 1.0 else docs_ds.random_sample(frac2, seed=43)
        hot_ref = _ray.put(hot)
        fine_cells, fine_counts = _collect_hist(
            histogram_cells(hist2, grid, fine_level,
                            only_under=hot_ref, mid_level=mid_level),
            frac2,
        )
        cells = np.concatenate([cold_cells, fine_cells])
        counts = np.concatenate([cold_counts, fine_counts])
    else:
        cells, counts = cold_cells, cold_counts
    cut = balance.build_cut(cells, counts, base_level, fine_level, max_rows)
    return balance.CutIndex(cut, base_level, fine_level, grid.span_px)


def _collect_hist(hist_out_ds, frac: float) -> tuple[np.ndarray, np.ndarray]:
    """Sum per-batch histogram partials driver-side (they are bounded by
    occupied cells, NOT raw data) and rescale sampled counts."""
    acc: dict[int, int] = {}
    for r in hist_out_ds.take_all():
        c = int(r["cell"])
        acc[c] = acc.get(c, 0) + int(r["n"])
    cells = np.fromiter(acc.keys(), dtype=np.uint64, count=len(acc))
    counts = np.fromiter(acc.values(), dtype=np.int64, count=len(acc))
    if frac < 1.0:
        counts = np.maximum(1, (counts / frac).astype(np.int64))
    return cells, counts


class Route:
    """1 row per (leaf tile, polygon) whose bboxes intersect.

    Reference: rows assigned to every grid cell their bbox overlaps
    (geo && cell, find_overlap_and_gap-pre.sql:197-206).  The CutIndex is
    shipped once per actor via the constructor.

    Giant polygons (>= ``giant_points`` ring points spanning >=
    ``giant_tiles`` tiles) are CLIPPED to each destination tile's
    rectangle instead of replicated whole — the per-tile fragment ships,
    bytes scale with the perimeter crossing each tile rather than
    tiles x ring size.  Clip crossings use the same exact rounding as the
    noding, and the clipped runs along the rect cancel in the stitch via
    the geometric border masks.  (Reference analogue: >10 000-point lines
    diverted to a serial pass, view_get_simplified_border_lines...:35.)
    """

    GIANT_POINTS = 1024
    GIANT_TILES = 4

    def __init__(self, cut: balance.CutIndex):
        self.cut = cut

    def __call__(self, t: pa.Table) -> pa.Table:
        from .geom import clip as clip_mod
        from .tiling import quadkey as qk

        mnx = t["minx"].to_numpy()
        mny = t["miny"].to_numpy()
        mxx = t["maxx"].to_numpy()
        mxy = t["maxy"].to_numpy()
        is_line = (
            t["is_line"].to_numpy(zero_copy_only=False)
            if "is_line" in t.column_names
            else np.zeros(len(t), dtype=bool)
        )
        # fast path (vectorized): bbox corners land in the same ACTUAL
        # partition tile -> exactly one destination; only border-crossing
        # rows (and rows in histogram-empty regions of split base cells,
        # where tile_of_points_px falls back to a non-partition base cell)
        # take the Python tree walk
        lo = self.cut.tile_of_points_px(mnx, mny)
        hi = self.cut.tile_of_points_px(mxx, mxy)
        single = (lo == hi) & self.cut.is_partition_tile(lo)
        idx_list = np.flatnonzero(single).tolist()
        tile_list = lo[single].astype(np.int64).tolist()
        clip_src: list[int] = []
        clip_tile: list[int] = []
        clip_packed: list[bytes] = []
        clip_bbox: list[tuple[int, int, int, int]] = []
        for i in np.flatnonzero(~single).tolist():
            tiles = self.cut.tiles_of_bbox_px(mnx[i], mny[i], mxx[i], mxy[i])
            rings = None
            if len(tiles) >= self.GIANT_TILES and not is_line[i]:
                rings, _ = unpack_rings(t["rings"][i].as_py())
                if sum(len(r) for r in rings) < self.GIANT_POINTS:
                    rings = None
            if rings is None:
                for tile in tiles:
                    idx_list.append(i)
                    tile_list.append(int(tile))
                continue
            for tile in tiles:
                x0, y0, x1, y1 = qk.cell_bounds_px_int(int(tile), self.cut.span_px)
                frag = clip_mod.clip_rings_to_rect(rings, x0, y0, x1, y1)
                if not frag:
                    continue  # bbox overlapped but the polygon does not
                bb = core.bbox_of_rings(frag)
                clip_src.append(i)
                clip_tile.append(int(tile))
                clip_packed.append(pack_rings(frag))
                clip_bbox.append(bb)
        taken = t.take(pa.array(idx_list, pa.int64())).append_column(
            "tile", pa.array(tile_list, pa.int64())
        )
        if not clip_src:
            return taken
        extra = t.take(pa.array(clip_src, pa.int64()))
        names = extra.column_names
        extra = extra.set_column(names.index("rings"), "rings",
                                 pa.array(clip_packed, pa.large_binary()))
        for col, vals in zip(
            ("minx", "miny", "maxx", "maxy"),
            zip(*clip_bbox),
        ):
            extra = extra.set_column(names.index(col), col,
                                     pa.array(list(vals), pa.int64()))
        extra = extra.append_column("tile", pa.array(clip_tile, pa.int64()))
        return pa.concat_tables([taken, extra])


# ---------------------------------------------------------------------------
# per-tile overlay (the stateful heavy stage)
# ---------------------------------------------------------------------------


class TileOverlay:
    """groupby(tile).map_groups worker: full snap-rounded overlay of one tile.

    Reference: resolve_overlap_gap_single_cell JT1 (build) + JT6 (small
    faces) + JT7 (extract/attribute), collapsed into one deterministic pass
    because there is no shared mutable topology to lock
    (cell.sql:189-423,758-913).
    """

    def __init__(self, grid: GridConfig, utm: bool, min_area: float, coarse_level: int = 0,
                 clean=None):
        self.__name__ = "TileOverlay"  # map_groups task-fn contract
        self.grid = grid
        self.utm = utm
        self.min_area = min_area
        self.coarse_level = coarse_level
        # JT5 smoothing params in px units (cell.sql:642-756): applied to
        # face-edge chains inside the tile; None/empty = cleaning off
        self.smooth = None
        if clean is not None and (
            clean.simplify_tolerance > 0 or clean.chaikins_n_iterations > 0
        ):
            self.smooth = {
                "simplify_tol_px": clean.simplify_tolerance / grid.precision,
                "chaikins_iters": clean.chaikins_n_iterations,
                "chaikins_min_deg": clean.chaikins_min_degrees,
                "chaikins_max_deg": clean.chaikins_max_degrees,
                "chaikins_max_len_px": (clean.chaikins_max_length / grid.precision
                                        if clean.chaikins_max_length else 0.0),
            }

    def __call__(self, group: pa.Table) -> pa.Table:
        g = self.grid
        tile = int(group["tile"][0].as_py())
        bounds = quadkey.cell_bounds_px(np.uint64(tile), g.span_px)
        pks = group["pk"].to_numpy()
        # synthetic leaf markers (pk < 0) ensure every leaf tile emits its
        # faces even with zero data rows -- needed so gaps spanning empty
        # tiles assemble correctly and the universe frontier is exactly the
        # tiling-square boundary
        valid = group["valid"].to_numpy()
        is_line = (
            group["is_line"].to_numpy(zero_copy_only=False)
            if "is_line" in group.column_names
            else np.zeros(len(group), dtype=bool)
        )
        valid_of = dict(zip(pks.tolist(), valid.tolist()))
        polys = []
        lines = []
        rings_col = group["rings"].to_pylist()
        for i in range(len(group)):
            if pks[i] < 0:
                continue  # leaf marker row
            rings, _ = unpack_rings(rings_col[i])
            if is_line[i]:
                lines.append((int(pks[i]), rings))
            else:
                polys.append((int(pks[i]), rings))
        if self.min_area > 0:
            if self.utm:
                min_area2 = 2.0 * self.min_area / (g.precision**2)
                area2_fn = None
            else:
                min_area2 = 2.0 * self.min_area
                area2_fn = lambda rings: 2.0 * core.geodesic_area(
                    rings, g.origin_x, g.origin_y, g.precision
                )
        else:
            min_area2, area2_fn = 0.0, None
        t0 = time.monotonic()
        faces = arrangement.overlay_tile(
            polys, bounds, min_area2, area2_fn, lines=lines, smooth=self.smooth
        )
        out = faces_to_table(faces, tile, valid_of, self.coarse_level)
        _stage_log("overlay", tile, len(group), len(out), time.monotonic() - t0)
        return out


def faces_to_table(
    faces: list[arrangement.TileFace],
    tile: int,
    valid_of: dict[int, bool],
    coarse_level: int = 0,
) -> pa.Table:
    tile_level = int(np.uint64(tile) >> np.uint64(quadkey.LEVEL_SHIFT))
    # tiles shallower than the coarse level are their own bucket; their
    # borders with deeper neighbours escalate to the global stitch instead
    coarse = int(
        quadkey.parent(
            np.asarray([tile], dtype=np.uint64), min(coarse_level, tile_level)
        )[0]
    )
    cols = {k: [] for k in ("tile", "stitch_key", "kind", "rings", "cov", "winner_pk", "others", "is_valid", "area2")}
    seq = 0
    for f in faces:
        cov_sorted = sorted(f.cov)
        is_valid = all(valid_of.get(p, True) for p in (f.touches | f.cov))
        if f.touches_border:
            key = f"b:{coarse}"
            cols["tile"].append(tile)
            cols["stitch_key"].append(key)
            cols["kind"].append(1)
            cols["rings"].append(pack_rings(f.rings, f.masks))
            cols["cov"].append(cov_sorted)
            cols["winner_pk"].append(-1)
            cols["others"].append([])
            cols["is_valid"].append(is_valid)
            cols["area2"].append(int(f.area2))
        else:
            winner, others = arrangement.attribution(f.ledger)
            cols["tile"].append(tile)
            # all interior faces of a tile share one stitch group (they are
            # final; grouping per tile keeps per-group overhead off the
            # hot path -- 1 group per tile, not per face)
            cols["stitch_key"].append(f"i:{tile}")
            seq += 1
            cols["kind"].append(0)
            cols["rings"].append(pack_rings(f.rings, f.masks))
            cols["cov"].append(cov_sorted)
            cols["winner_pk"].append(-1 if winner is None else int(winner))
            cols["others"].append([int(o) for o in others])
            cols["is_valid"].append(is_valid)
            cols["area2"].append(int(f.area2))
    return pa.table(
        {
            "tile": pa.array(cols["tile"], pa.int64()),
            "stitch_key": pa.array(cols["stitch_key"], pa.string()),
            "kind": pa.array(cols["kind"], pa.int8()),
            "rings": pa.array(cols["rings"], pa.large_binary()),
            "cov": pa.array(cols["cov"], pa.list_(pa.int64())),
            "winner_pk": pa.array(cols["winner_pk"], pa.int64()),
            "others": pa.array(cols["others"], pa.list_(pa.int64())),
            "is_valid": pa.array(cols["is_valid"], pa.bool_()),
            "area2": pa.array(cols["area2"], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# border stitch
# ---------------------------------------------------------------------------

_GROUP_LBL = 0
_TILEB_LBL = 1


def _heal_crossing_vertices(
    segs: np.ndarray, labels: list[frozenset], removable: set[tuple[int, int]]
) -> tuple[np.ndarray, list[frozenset]]:
    """Remove degree-2 vertices left where a real edge crossed a (now
    cancelled) tile border: merge the two near-collinear real halves back
    into the original whole segment.  The engine's cross-tile
    do_healedges analogue (function_01_do_healedges_no_block.sql)."""
    if not removable or len(segs) == 0:
        return segs, labels
    segs = [tuple(int(v) for v in s) for s in segs]
    labels = list(labels)
    for _ in range(16):  # reference bounds its heal loop at 15 (heal.sql:8)
        incid: dict[tuple[int, int], list[int]] = {}
        for k, s in enumerate(segs):
            if s is None:
                continue
            incid.setdefault((s[0], s[1]), []).append(k)
            incid.setdefault((s[2], s[3]), []).append(k)
        changed = False
        for v in list(removable):
            ks = incid.get(v, [])
            ks = [k for k in ks if segs[k] is not None]
            if len(ks) != 2 or ks[0] == ks[1]:
                continue
            k1, k2 = ks
            if any((_TILEB_LBL, sd) in labels[k] for k in (k1, k2) for sd in (1, -1)):
                continue
            s1, s2 = segs[k1], segs[k2]
            a = (s1[2], s1[3]) if (s1[0], s1[1]) == v else (s1[0], s1[1])
            b = (s2[2], s2[3]) if (s2[0], s2[1]) == v else (s2[0], s2[1])
            if a == b:
                continue
            cr = (v[0] - a[0]) * (b[1] - a[1]) - (v[1] - a[1]) * (b[0] - a[0])
            ab = float(np.hypot(b[0] - a[0], b[1] - a[1]))
            # 1.5 px: crossing rounding (0.5) can compound with hot-pixel
            # snapping and chained splits along one original edge
            if ab == 0 or abs(cr) > 1.5 * ab:
                continue
            # side of the group along direction a->v on s1 (flip if canonical
            # direction of s1 is v->a)
            s1_fwd = (s1[0], s1[1]) == a  # canonical dir equals a->v
            side = next((sd for g, sd in labels[k1] if g == _GROUP_LBL), 1)
            side_av = side if s1_fwd else -side
            # new segment a->b, canonicalized
            if (a[0], a[1]) < (b[0], b[1]):
                new_seg = (a[0], a[1], b[0], b[1])
                new_side = side_av
            else:
                new_seg = (b[0], b[1], a[0], a[1])
                new_side = -side_av
            segs[k1] = new_seg
            labels[k1] = frozenset([(_GROUP_LBL, new_side)])
            segs[k2] = None
            changed = True
        if not changed:
            break
    out_segs = [s for s in segs if s is not None]
    out_labels = [l for s, l in zip(segs, labels) if s is not None]
    return np.asarray(out_segs, dtype=np.int64).reshape(-1, 4), out_labels


def _face_table(rows: dict) -> pa.Table:
    return pa.table(
        {
            "tile": pa.array(rows["tile"], pa.int64()),
            "stitch_key": pa.array(rows["stitch_key"], pa.string()),
            "kind": pa.array(rows["kind"], pa.int8()),
            "rings": pa.array(rows["rings"], pa.large_binary()),
            "cov": pa.array(rows["cov"], pa.list_(pa.int64())),
            "winner_pk": pa.array(rows["winner_pk"], pa.int64()),
            "others": pa.array(rows["others"], pa.list_(pa.int64())),
            "is_valid": pa.array(rows["is_valid"], pa.bool_()),
            "area2": pa.array(rows["area2"], pa.int64()),
        }
    )


def _cyc_next(r: np.ndarray) -> np.ndarray:
    """Next vertex per row, cyclic — np.roll(r, -1, axis=0) without its
    ~25us fixed cost (these run per ring in the stitch hot path)."""
    nxt = np.empty_like(r)
    nxt[:-1] = r[1:]
    nxt[-1] = r[0]
    return nxt


def _default_esc_key(cov_sorted: list[int], min_tile: int) -> str:
    import zlib as _z

    sig_str = ",".join(map(str, cov_sorted))
    return f"g:{_z.crc32(sig_str.encode())}"


_EMPTY_COLS = ("tile", "stitch_key", "kind", "rings", "cov", "winner_pk", "others", "is_valid", "area2")


def _merge_cols(dst: dict, src: dict) -> None:
    for k in _EMPTY_COLS:
        dst[k].extend(src[k])


def _assemble(group: pa.Table, final: bool, esc_key_fn=_default_esc_key) -> pa.Table:
    return _face_table(_assemble_cols(group, final, esc_key_fn))


def _assemble_cols(group: pa.Table, final: bool, esc_key_fn=_default_esc_key) -> dict:
    """Assemble border pieces sharing a coverage signature (one stitch level).

    Cancels tile-border segments with same-coverage faces on both sides
    (bit-identical across tiles by the global snap grid), re-nodes
    T-junctions between different-level tiles, heals crossing vertices and
    re-polygonizes.

    final=False (local level, pieces grouped by (signature, coarse cell)):
    assembled faces still touching an uncancelled pure tile border escalate
    to the global group "g:<cov>"; the rest are final.
    final=True (global level): uncovered faces still touching a pure tile
    border are the universe (the tiling square frontier) and are dropped —
    the reference likewise never emits the universe face; enclosed gaps ARE
    emitted as NULL-attribute rows (resolve_overlap_and_gap_expected:2-8).
    """
    cov = frozenset(int(c) for c in (group["cov"][0].as_py() or []))
    seg_list = []
    mask_list = []
    rings_col = group["rings"].to_pylist()
    for i in range(len(group)):
        rings, masks = unpack_rings(rings_col[i])
        for r, m in zip(rings, masks):
            if len(r) < 2:
                continue
            nxt = _cyc_next(r)
            seg_list.append(np.concatenate([r, nxt], axis=1))
            mask_list.append(m.astype(np.int64))
    if not seg_list:
        return {k: [] for k in _EMPTY_COLS}
    segs = np.concatenate(seg_list)
    tileb = np.concatenate(mask_list)
    # --- vectorized pre-cancellation of exact opposite duplicates ---------
    side = np.ones(len(segs), dtype=np.int64)
    flip = (segs[:, 0] > segs[:, 2]) | ((segs[:, 0] == segs[:, 2]) & (segs[:, 1] > segs[:, 3]))
    segs = segs.copy()
    segs[flip] = segs[flip][:, [2, 3, 0, 1]]
    side[flip] = -1
    order = np.lexsort((segs[:, 3], segs[:, 2], segs[:, 1], segs[:, 0]))
    segs, side, tileb = segs[order], side[order], tileb[order]
    same_prev = np.empty(len(segs), dtype=bool)
    same_prev[0] = False
    np.all(segs[1:] == segs[:-1], axis=1, out=same_prev[1:])
    run_id = np.cumsum(~same_prev)
    pos = np.zeros(run_id.max() + 1, dtype=np.int64)
    neg = np.zeros(run_id.max() + 1, dtype=np.int64)
    brd = np.zeros(run_id.max() + 1, dtype=np.int64)
    np.add.at(pos, run_id, (side == 1).astype(np.int64))
    np.add.at(neg, run_id, (side == -1).astype(np.int64))
    np.add.at(brd, run_id, (tileb == 0).astype(np.int64))
    # cancel ONLY pure tile-border pairs: a zero-width collapsed REAL edge
    # also appears with both orientations in one signature group, but it is
    # genuine geometry separating two same-coverage faces (e.g. an enclosed
    # gap from the outside) and must survive
    both = (pos[run_id] > 0) & (neg[run_id] > 0) & (brd[run_id] == 0)
    dropped_pts = set(
        map(tuple, np.concatenate([segs[both][:, :2], segs[both][:, 2:]]).tolist())
    )
    segs, side, tileb = segs[~both], side[~both], tileb[~both]
    lab_list = []
    for k in range(len(segs)):
        lab = [(_GROUP_LBL, int(side[k]))]
        if tileb[k]:
            lab.append((_TILEB_LBL, 1))
        lab_list.append(frozenset(lab))
    segs, labels = noding.node_segments(segs, lab_list)
    # cancel T-junction remainders: group on both sides after noding AND
    # pure tile border (same degenerate-real-edge caveat as above)
    keep = []
    for k in range(len(segs)):
        if (
            (_GROUP_LBL, 1) in labels[k]
            and (_GROUP_LBL, -1) in labels[k]
            and any(p == _TILEB_LBL for p, _ in labels[k])
        ):
            sgm = segs[k]
            dropped_pts.add((int(sgm[0]), int(sgm[1])))
            dropped_pts.add((int(sgm[2]), int(sgm[3])))
        else:
            keep.append(k)
    segs = segs[keep]
    labels = [labels[k] for k in keep]
    segs, labels = _heal_crossing_vertices(segs, labels, dropped_pts)
    arr = polygonize.polygonize(segs, labels)
    min_tile = int(group["tile"].to_numpy().min())
    is_valid = bool(np.all(group["is_valid"].to_numpy()))
    is_gap = len(cov) == 0
    cols = {k: [] for k in ("tile", "stitch_key", "kind", "rings", "cov", "winner_pk", "others", "is_valid", "area2")}
    seq = 0

    def tileb_mask(segidx: np.ndarray) -> np.ndarray:
        return np.asarray(
            [1 if any(p == _TILEB_LBL for p, _ in arr.labels[int(i)]) else 0 for i in segidx],
            dtype=np.uint8,
        )

    for f in arr.faces:
        if _GROUP_LBL not in f.cov:
            continue
        frontier = _TILEB_LBL in f.touches
        if frontier and not final:
            # escalate to the next stitch level with masks preserved
            masks = [tileb_mask(f.shell_seg)] + [tileb_mask(h) for h in f.holes_seg]
            cols["tile"].append(min_tile)
            cols["stitch_key"].append(esc_key_fn(sorted(cov), min_tile))
            cols["kind"].append(1)
            cols["rings"].append(pack_rings([f.shell] + f.holes, masks))
            cols["cov"].append(sorted(cov))
            cols["winner_pk"].append(-1)
            cols["others"].append([])
            cols["is_valid"].append(is_valid)
            cols["area2"].append(int(f.area2))
            continue
        if frontier and final and is_gap:
            continue  # universe: outside the data, never emitted
        winner, others = arrangement.attribution([(f.area2, cov)])
        cols["tile"].append(min_tile)
        cols["stitch_key"].append(f"s:{min_tile}")
        seq += 1
        cols["kind"].append(0)
        cols["rings"].append(pack_rings([f.shell] + f.holes))
        cols["cov"].append(sorted(cov))
        cols["winner_pk"].append(-1 if winner is None else int(winner))
        cols["others"].append([int(o) for o in others])
        cols["is_valid"].append(is_valid)
        cols["area2"].append(int(f.area2))
    return cols


def _assemble_gap_final(group: pa.Table) -> pa.Table:
    """Final-level assembly of the cov=∅ (gap/universe) signature WITHOUT
    ever polygonizing the universe chain.

    The universe region's boundary is the square frontier plus every gap
    corridor reaching it — at scale that is a large fraction of all edge
    detail, and assembling it in one group was the pipeline's serial tail
    (it is then DROPPED anyway: the reference never emits the universe
    face).  Instead:

    1. every piece's pure tile-border segments are axis-aligned intervals
       on quantized border lines; a sweep per line glues pieces whose
       intervals overlap (opposite sides of the border) and marks pieces
       owning an interval stretch with no partner as EXPOSED (open to the
       outside — ultimately the tiling-square frontier);
    2. union-find over glue pairs yields the gap REGIONS as piece
       components;
    3. components containing an exposed piece are the universe: dropped
       wholesale, no noding, no polygonize;
    4. enclosed components assemble individually (small, local).

    T-junctions between different tile levels are handled by the interval
    sweep (partial overlaps glue; uncovered stretches expose), matching
    the noding-based semantics of the general path.
    """
    by_comp, comp_exposed = _glue_gap_components(group)
    cols = {k: [] for k in _EMPTY_COLS}
    for c in sorted(by_comp):
        if comp_exposed[c]:
            continue  # universe: connected to the outside, never emitted
        sub = group.take(pa.array(by_comp[c], pa.int64()))
        _merge_cols(cols, _assemble_cols(sub, final=True))
    return _face_table(cols)


def _glue_gap_components(group: pa.Table) -> tuple[dict[int, list[int]], dict[int, bool]]:
    """Union-find gap pieces by overlapping tile-border intervals.

    Returns (components: root -> piece indices, exposed: root -> bool).
    Exposed = some border stretch has no partner inside this group."""
    n = len(group)
    rings_col = group["rings"].to_pylist()
    # vectorized interval extraction: per masked border segment, the
    # (axis, line coord, lo, hi) of its axis-aligned stretch
    ax_l, co_l, lo_l, hi_l, pid_l = [], [], [], [], []
    for i in range(n):
        rings, masks = unpack_rings(rings_col[i])
        for r, m in zip(rings, masks):
            if len(r) < 2:
                continue
            mb = m.astype(bool)
            if not mb.any():
                continue
            a = r[mb]
            b = _cyc_next(r)[mb]
            vert = a[:, 0] == b[:, 0]
            lo_ = np.where(vert, np.minimum(a[:, 1], b[:, 1]), np.minimum(a[:, 0], b[:, 0]))
            hi_ = np.where(vert, np.maximum(a[:, 1], b[:, 1]), np.maximum(a[:, 0], b[:, 0]))
            keep = lo_ != hi_
            if not keep.any():
                continue
            ax_l.append(vert[keep])
            co_l.append(np.where(vert, a[:, 0], a[:, 1])[keep])
            lo_l.append(lo_[keep])
            hi_l.append(hi_[keep])
            pid_l.append(np.full(int(keep.sum()), i, np.int64))
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exposed = [False] * n
    if ax_l:
        axes = np.concatenate(ax_l)
        coords = np.concatenate(co_l)
        los = np.concatenate(lo_l)
        his = np.concatenate(hi_l)
        pids = np.concatenate(pid_l)
        order = np.lexsort((los, coords, axes))
    else:
        order = np.empty(0, np.int64)
    los_t, his_t, pids_t = (los.tolist(), his.tolist(), pids.tolist()) if len(order) else ([], [], [])
    order_t = order.tolist()
    k0 = 0
    while k0 < len(order_t):
        k1 = k0
        o0 = order_t[k0]
        while k1 < len(order_t) and axes[order_t[k1]] == axes[o0] and coords[order_t[k1]] == coords[o0]:
            k1 += 1
        evs = []
        for k in order_t[k0:k1]:
            evs.append((los_t[k], 1, pids_t[k]))
            evs.append((his_t[k], 0, pids_t[k]))
        evs.sort(key=lambda e: (e[0], e[1]))
        active: dict[int, int] = {}
        prev_pos = None
        for pos, kind, pid in evs:
            if prev_pos is not None and pos > prev_pos and len(active) == 1:
                exposed[next(iter(active))] = True
            if kind == 1:
                for other in active:
                    a, b = find(pid), find(other)
                    if a != b:
                        parent[a] = b
                active[pid] = active.get(pid, 0) + 1
            else:
                active[pid] -= 1
                if active[pid] == 0:
                    del active[pid]
            prev_pos = pos
        k0 = k1
    comp_exposed: dict[int, bool] = {}
    by_comp: dict[int, list[int]] = {}
    for i in range(n):
        c = find(i)
        comp_exposed[c] = comp_exposed.get(c, False) or exposed[i]
        by_comp.setdefault(c, []).append(i)
    return by_comp, comp_exposed


def _assemble_gap_partial(group: pa.Table, esc_key_fn) -> pa.Table:
    """Non-final levels of the cov=∅ signature: assemble only components
    fully enclosed within this group (they finalize here); frontier
    components' pieces are FORWARDED unassembled to the next level — the
    universe chain is never noded or polygonized at any level (the final
    level drops it wholesale via the same gluing)."""
    by_comp, comp_exposed = _glue_gap_components(group)
    cols = {k: [] for k in _EMPTY_COLS}
    fwd_idx: list[int] = []
    for c in sorted(by_comp):
        if comp_exposed[c]:
            fwd_idx.extend(by_comp[c])
        else:
            sub = group.take(pa.array(by_comp[c], pa.int64()))
            _merge_cols(cols, _assemble_cols(sub, final=False, esc_key_fn=esc_key_fn))
    outs = [_face_table(cols)] if cols["tile"] else []
    if fwd_idx:
        fwd = group.take(pa.array(sorted(fwd_idx), pa.int64()))
        tiles = fwd["tile"].to_pylist()
        keys = pa.array([esc_key_fn([], int(t)) for t in tiles], pa.string())
        fwd = fwd.set_column(fwd.schema.get_field_index("stitch_key"), "stitch_key", keys)
        outs.append(fwd)
    outs = [o for o in outs if len(o)]
    if not outs:
        return _face_table({k: [] for k in _EMPTY_COLS})
    return pa.concat_tables(outs)


def _lone_piece_forwardable(rings: list[np.ndarray], masks: list[np.ndarray]) -> bool:
    """True when a signature's single piece can skip assembly at a
    non-final level: it has frontier border segments (so it escalates) and
    no opposite-orientation duplicate border pair within itself (nothing
    the pre-cancellation or noding could change — its rings come out of
    one prior snap-round arrangement, so self-noding is the identity)."""
    segs = []
    for r, m in zip(rings, masks):
        if len(r) < 2:
            continue
        mb = m.astype(bool)
        if not mb.any():
            continue
        a = r[mb]
        b = _cyc_next(r)[mb]
        keep = (a[:, 0] != b[:, 0]) | (a[:, 1] != b[:, 1])
        if keep.any():
            segs.append(np.concatenate([a[keep], b[keep]], axis=1))
    if not segs:
        return False  # no positive-length frontier: must assemble/finalize
    s = np.concatenate(segs)
    flip = (s[:, 0] > s[:, 2]) | ((s[:, 0] == s[:, 2]) & (s[:, 1] > s[:, 3]))
    s[flip] = s[flip][:, [2, 3, 0, 1]]
    order = np.lexsort((s[:, 3], s[:, 2], s[:, 1], s[:, 0]))
    s = s[order]
    return not bool(np.any(np.all(s[1:] == s[:-1], axis=1)))


def _assemble_bucket(group: pa.Table, final: bool, esc_key_fn=_default_esc_key) -> pa.Table:
    """Split a bucket of border pieces by coverage signature and assemble
    each signature independently; one Ray group handles many signatures so
    the per-group scheduling overhead stays off the hot path.  Signatures
    with a single forwardable piece (the majority at the local level: their
    partner lives in another coarse cell) skip the noding/polygonize
    machinery entirely and escalate with only a key rewrite."""
    covs = group["cov"].to_pylist()
    by_sig: dict[tuple, list[int]] = {}
    for i, c in enumerate(covs):
        by_sig.setdefault(tuple(c or []), []).append(i)
    outs = []
    cols = {k: [] for k in _EMPTY_COLS}
    fwd_idx: list[int] = []
    fwd_keys: list[str] = []
    rings_col = group["rings"].to_pylist() if not final else None
    tiles = group["tile"].to_numpy() if not final else None
    for sig in sorted(by_sig):
        idx = by_sig[sig]
        if not final and len(idx) == 1:
            i = idx[0]
            rings, masks = unpack_rings(rings_col[i])
            if _lone_piece_forwardable(rings, masks):
                fwd_idx.append(i)
                fwd_keys.append(esc_key_fn(sorted(sig), int(tiles[i])))
                continue
        sub = group.take(pa.array(idx, pa.int64()))
        if sig == ():
            outs.append(
                _assemble_gap_final(sub)
                if final
                else _assemble_gap_partial(sub, esc_key_fn)
            )
        else:
            _merge_cols(cols, _assemble_cols(sub, final=final, esc_key_fn=esc_key_fn))
    if cols["tile"]:
        outs.append(_face_table(cols))
    if fwd_idx:
        fwd = group.take(pa.array(fwd_idx, pa.int64()))
        fwd = fwd.set_column(
            fwd.schema.get_field_index("stitch_key"),
            "stitch_key",
            pa.array(fwd_keys, pa.string()),
        )
        outs.append(fwd)
    outs = [o for o in outs if len(o)]
    if not outs:
        return _face_table({k: [] for k in _EMPTY_COLS})
    return pa.concat_tables(outs)


class StitchLocal:
    """Level-1 stitch: one bucket per coarse parent cell.  Escalation goes
    to the mid level (spatial buckets at ``mid_level``) when configured,
    else straight to the per-signature global groups.  The mid level is a
    pure optimization: pieces that miss each other at mid still meet at
    the global level, so ANY deterministic keying here is correct."""

    def __init__(self, mid_level: int | None = None):
        self.__name__ = "StitchLocal"  # map_groups task-fn contract
        self.mid_level = mid_level

    def _esc(self, cov_sorted: list[int], min_tile: int) -> str:
        if self.mid_level is None:
            return _default_esc_key(cov_sorted, min_tile)
        import zlib as _z

        lv, ix, iy = quadkey.decode_int(int(min_tile))
        pl = min(self.mid_level, lv)
        cell = quadkey.encode_int(pl, ix >> (lv - pl), iy >> (lv - pl))
        sig_str = ",".join(map(str, cov_sorted))
        return f"m:{_z.crc32(sig_str.encode())}:{cell}"

    def __call__(self, group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy()
        if (kinds == 0).all():
            return group  # interior faces: pass through
        t0 = time.monotonic()
        out = _assemble_bucket(group, final=False, esc_key_fn=self._esc)
        _stage_log("stitch_local", group["stitch_key"][0].as_py(), len(group), len(out), time.monotonic() - t0)
        return out


def stitch_local(group: pa.Table) -> pa.Table:
    """Level-1 stitch with direct-to-global escalation (no mid level)."""
    return StitchLocal(None)(group)


def stitch_mid(group: pa.Table) -> pa.Table:
    """Optional spatial mid level: assembles (signature, mid-cell) buckets
    so giant signature groups (the gap/universe network above all) are
    dissolved in parallel before the per-signature global groups."""
    kinds = group["kind"].to_numpy()
    if (kinds == 0).all():
        return group
    t0 = time.monotonic()
    out = _assemble_bucket(group, final=False, esc_key_fn=_default_esc_key)
    _stage_log("stitch_mid", group["stitch_key"][0].as_py(), len(group), len(out), time.monotonic() - t0)
    return out


def stitch_global(group: pa.Table) -> pa.Table:
    """Final stitch: per-signature global groups."""
    kinds = group["kind"].to_numpy()
    if (kinds == 0).all():
        return group
    t0 = time.monotonic()
    out = _assemble_bucket(group, final=True)
    _stage_log("stitch_global", group["stitch_key"][0].as_py(), len(group), len(out), time.monotonic() - t0)
    return out


def stitch_group(group: pa.Table) -> pa.Table:
    """Single-level stitch (kept for tests / small runs): assemble final."""
    kinds = group["kind"].to_numpy()
    if (kinds == 0).all():
        return group
    return _assemble_bucket(group, final=True)


# ---------------------------------------------------------------------------
# finalize: px rings -> WKB + areas + winner attributes / span rewrite
# ---------------------------------------------------------------------------


class FinalizeJoined:
    """Post-join finalizer: stitched face rows joined with (w_doc_id,
    w_spans) on winner_pk -> final output schema.  Runs as stateless tasks
    after the distributed hash join (Dataset.join), so no part of the input
    is ever materialized on the driver."""

    def __init__(self, grid: GridConfig, utm: bool):
        self.grid = grid
        self.utm = utm

    def __call__(self, t: pa.Table) -> pa.Table:
        g = self.grid
        n = len(t)
        rings_col = t["rings"].to_pylist()
        winner = t["winner_pk"].to_numpy(zero_copy_only=False)
        import json

        w_doc = t["w_doc_id"].to_pylist() if "w_doc_id" in t.column_names else [None] * n
        w_json = t["w_spans_json"].to_pylist() if "w_spans_json" in t.column_names else [None] * n
        # batched geometry kernels: ONE parse of all packed ring buffers,
        # one unsnap/trig pass, one memcpy per ring for the WKB payload —
        # bit- and byte-identical to the per-face path (differential test
        # in tests/test_geom_kernel.py pins this)
        coords, offs, lens, face_nr = parse_packed_batch(rings_col)
        F = core.unsnap(coords, g.origin_x, g.origin_y, g.precision)
        out_wkb = wkb.encode_polygons_packed(F, offs, lens, face_nr)
        if self.utm:
            out_area = core.planar_area_packed(coords, offs, lens, face_nr, g.precision)
        else:
            out_area = core.geodesic_area_packed(F, offs, lens, face_nr)
        # output spans column built as FLAT Arrow arrays (kind/text/ref/off
        # + list offsets) — pa.array over per-row lists of dicts was the
        # finalize stage's remaining hot spot.  Semantics identical to
        # rewrite_geometry_span: first geometry span's text becomes the
        # face's own WKB hex; everything else passes through in order.
        # All winner span-lists parse in ONE json.loads and the flat
        # columns build as single comprehensions over the chained rows —
        # the per-row append loop was ~60% of this stage's CPU.
        from itertools import chain

        GEOM = spans_mod.GEOMETRY_KIND
        hexes = [b.hex() for b in out_wkb]
        win_rows = [
            i
            for i in range(n)
            if winner[i] is not None and int(winner[i]) >= 0 and w_doc[i] is not None
        ]
        parsed = (
            json.loads("[%s]" % ",".join(w_json[i] for i in win_rows))
            if win_rows
            else []
        )
        out_docid: list = [None] * n
        rows_spans: list = [None] * n
        for i, spans in zip(win_rows, parsed):
            out_docid[i] = w_doc[i]
            bhex = hexes[i]
            for sp in spans:
                if sp[0] == GEOM:
                    sp[1] = bhex
                    break
            else:
                spans.append([GEOM, bhex, "", (spans[-1][3] + 1) if spans else 0])
            rows_spans[i] = spans
        for i in range(n):
            if rows_spans[i] is None:
                rows_spans[i] = [[GEOM, hexes[i], "", 0]]
        flat = list(chain.from_iterable(rows_spans))
        kinds_f = [s[0] for s in flat]
        texts_f = [s[1] for s in flat]
        refs_f = [s[2] for s in flat]
        offs_f = [s[3] for s in flat]
        row_off = np.zeros(n + 1, np.int32)
        row_off[1:] = np.cumsum([len(r) for r in rows_spans])
        spans_col = pa.ListArray.from_arrays(
            pa.array(row_off, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(kinds_f, pa.string()),
                    pa.array(texts_f, pa.string()),
                    pa.array(refs_f, pa.string()),
                    pa.array(offs_f, pa.int32()),
                ],
                fields=list(spans_mod.SPAN_TYPE),
            ),
        )
        win_col = [None if (w is None or int(w) < 0) else int(w) for w in winner]
        others = [
            [int(x) for x in (s or "").split(",") if x]
            for s in t["others_s"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(out_docid, pa.string()),
                "winner_pk": pa.array(win_col, pa.int64()),
                "other_intersect_id_list": pa.array(others, pa.list_(pa.int64())),
                "input_geo_is_valid": t["is_valid"].combine_chunks(),
                "wkb": pa.array(out_wkb, pa.large_binary()),
                "area": pa.array(out_area, pa.float64()),
                "tile": t["tile"].combine_chunks(),
                "spans": spans_col,
            }
        )
