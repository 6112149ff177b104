"""Cluster-scaled shuffle strategy for the geometry pipelines.

Ray Data's default sort-based shuffle plans one range-partition object
per (input block x output partition) pair and routes every one of them
through driver-coordinated reduce tasks.  On wide inputs that is the
classic tiny-object storm: at 960k polygons / 32 CPUs the resolve
pipeline's finalize execution (stitch ladder + reduce-side attribute
join) spent ~11 minutes in a single sort exchange with the driver pegged
at 100% CPU (mostly *system* time — plasma churn on hundreds of
thousands of KB-sized partition objects) while 30+ workers sat idle.
The cost is CPU-count-invariant, so it silently destroys strong scaling:
the same job measured 8-vs-32-CPU efficiency 0.22-0.40.

``scaled_hash_shuffle`` switches the groupby/repartition exchanges built
under it to Ray 2.49's actor-based hash shuffle (``HashShuffleOperator``
— each map task pushes hash-partitioned slices directly to a bounded
pool of aggregator actors; no driver-side reduce coordination, no M x R
object explosion) and sizes it to the cluster:

- ``default_hash_shuffle_parallelism``: 2 CPUs per partition keeps every
  core fed without scheduling thousands of near-empty partitions (the
  stock default of 200 partitions + up to 64 single-CPU aggregator
  actors deadlocks small clusters: on 8 CPUs the aggregator pool alone
  starves the map tasks).
- ``max_hash_shuffle_aggregators``: ~1/4 of the CPUs, so shuffle
  aggregation never crowds out the map/compute stages that feed it.

Measured at 960k polygons / 32 CPUs (single node): sort-based headline
leg 248.6 s; with hash shuffle genuinely applied to the whole lineage
(see Scoping below) 97-154 s across quiet/noisy box samples, identical
2 043 930 output faces.  (The round-4 first-cut figures — overlay 74 s
-> 45 s, finalize 785 s -> 142 s — were measured with the source dataset
created inside the scope; the committed entry points create it outside,
which is exactly the case the argument-stamping below exists for.)

Scoping: a Dataset copies the active ``DataContext`` once at CREATION
and every downstream transform SHARES the source's context object
(``ds.context is ds.map_batches(f).context``), and the shuffle planner
consults ``self._dataset.context`` — not the global singleton — when it
builds an exchange.  So the ``with`` block alone only covers datasets
created inside it; a pipeline built on a caller-created dataset keeps
the caller's sort strategy no matter what the builder scopes (this
silently reverted the geometry pipelines to sort shuffle when the bench
and driver entry points created the source dataset outside).
``hash_shuffled`` therefore also stamps the hash strategy onto the
plan context of every Dataset argument — claiming that dataset's whole
lineage for hash shuffle, which is the intent for the geometry
pipelines' inputs.  Datasets the caller creates elsewhere and never
passes in are untouched.  Sort-based shuffle remains the default for
the relational/dedup operators whose exchanges are pre-bucketed and
small per group; flip them by building under this context manager if a
deployment proves driver-bound there too.
"""

from __future__ import annotations

import functools
import os
from contextlib import contextmanager

import ray
from ray.data import DataContext
from ray.data.context import ShuffleStrategy

# partitions beyond this stop helping: each is already >= multiple blocks
# of work at any realistic block size, and aggregator fan-in costs grow
_MAX_PARTITIONS = 4096


def _cluster_cpus() -> int:
    try:
        n = int(ray.cluster_resources().get("CPU", 0) or 0)
    except Exception:  # ray not initialized: planner defaults
        n = 0
    return n or 8


def _patch_hash_shuffle_empty_partitions() -> None:
    """Work around a Ray 2.49 hash-shuffle crash on empty exchanges.

    ``_shuffle_block`` returns early for 0-row input blocks BEFORE the
    schema-broadcast fan-out, but the operator marks schemas as broadcast
    the moment it submits the first block.  If the first block of an
    input happens to be empty (all-empty exchanges — a converged dissolve
    fixpoint round, a border-free stitch, any filter that drains a tiny
    layer — or just an empty first block at low row counts), partitions
    that never receive a non-empty shard finalize a ZERO-COLUMN block and
    ``Concat.finalize``'s ``sort_by(key)`` raises ArrowInvalid ("No match
    for FieldRef").  Sorting an empty block is the identity, so skipping
    the sort for 0-row partitions is exact; the zero-column empty block
    then flows through ``_apply_udf_to_groups`` as zero groups.

    Patch mechanics: the aggregation factory is a driver-side lambda
    closing over the module-global ``Concat``; it is cloudpickled by
    value into the aggregator actors, and its class-valued global is
    pickled BY REFERENCE (module+qualname).  Patching the method on the
    class object therefore never reaches the actors (they re-import the
    stock module) — instead we rebind ``hash_shuffle.Concat`` to a
    subclass that lives HERE, so the pickled reference resolves to
    ``rogray.rayctx._EmptySafeConcat`` on the workers.  Idempotent;
    best-effort (a future Ray that drops these internals just skips it,
    and `ROGRAY_NO_HASH_SHUFFLE_PATCH=1` opts out)."""
    if os.environ.get("ROGRAY_NO_HASH_SHUFFLE_PATCH"):
        return
    try:
        from ray.data._internal.execution.operators import hash_shuffle as _hs

        if _hs.Concat is not _EmptySafeConcat and _EmptySafeConcat is not None:
            _hs.Concat = _EmptySafeConcat
        # Stock shard pushes to the stateful aggregator actors are NOT
        # idempotent: ``_shuffle_block`` awaits each ``aggregator.submit``
        # as it goes, so a worker crash BETWEEN the first accepted shard
        # and task completion followed by Ray's default task retry
        # (max_retries=3 on worker crash) re-submits the already-accepted
        # shards — silent row duplication, surfacing as e.g. residual
        # overlap pairs in a resolved layer.  At 100 TB, preemption/OOM
        # worker kills are routine, so the stock default would corrupt
        # results exactly when the cluster is under pressure.
        #
        # Fix: rebind the shuffle task and the aggregator actor (same
        # pickled-by-reference mechanics as the Concat rebind above) to
        # retry-safe versions — every push is tagged with the task's
        # retry-stable TaskID and the aggregator drops re-pushed
        # (task, sequence, partition) shards before accept, making the
        # push idempotent and worker-crash retries exact.  With the
        # rebind in place retries are re-enabled (default 3); if a future
        # Ray changes these internals the rebind is skipped and retries
        # stay DISABLED (fail loudly + resumable-job checkpoints rather
        # than silent duplication).
        retry_safe = (
            _RetrySafeAggregator is not None
            and _retry_safe_shuffle_block is not None
            and not os.environ.get("ROGRAY_NO_RETRY_SAFE_SHUFFLE")
        )
        if retry_safe:
            if _hs.HashShuffleAggregator is not _RetrySafeAggregator:
                _hs.HashShuffleAggregator = _RetrySafeAggregator
            if _hs._shuffle_block is not _retry_safe_shuffle_block:
                _hs._shuffle_block = _retry_safe_shuffle_block
        n_retries = int(
            os.environ.get("ROGRAY_SHUFFLE_TASK_RETRIES", "3" if retry_safe else "0")
        )
        _hs._shuffle_block._default_options["max_retries"] = n_retries
    except Exception:  # pragma: no cover - future-Ray guard
        pass


try:
    from ray.data._internal.execution.operators.hash_shuffle import Concat as _Concat

    class _EmptySafeConcat(_Concat):
        """Concat aggregation tolerating schema-less empty partitions
        (see _patch_hash_shuffle_empty_partitions)."""

        def finalize(self, partition_id: int):
            block = self._partition_block_builders[partition_id].build()
            if self._should_sort and block.num_rows > 0:
                block = block.sort_by(
                    [(k, "ascending") for k in self._key_columns]
                )
            return block

except Exception:  # pragma: no cover - future-Ray guard
    _EmptySafeConcat = None


# ---------------------------------------------------------------------------
# retry-safe shard push (see _patch_hash_shuffle_empty_partitions)
#
# The replacement shuffle task mirrors Ray 2.49's ``_shuffle_block``
# (hash-partition the block, push each shard to its aggregator, await all
# accepts) with ONE protocol change: every ``submit`` carries a
# ``push_key = (task_id, input_seq, partition)`` whose task component is
# STABLE ACROSS RETRIES (Ray re-executes a crashed task under the same
# TaskID with a bumped attempt number), and the aggregator refuses shards
# whose key it has already accepted.  A worker that crashes after pushing
# k of its n shards re-pushes all n on retry; the first k are dropped at
# the aggregator, so the exchange result is exactly-once regardless of
# where the crash landed.
# ---------------------------------------------------------------------------

_FAULT_ENV = "ROGRAY_SHUFFLE_FAULT_INJECT"


def _retry_safe_shuffle_block_impl(
    block,
    input_index: int,
    key_columns,
    pool,
    block_transformer=None,
    send_empty_blocks: bool = False,
    override_partition_id=None,
):
    from ray.data._internal.execution.operators import hash_shuffle as _hs

    stats = _hs.BlockExecStats.builder()
    assert (len(key_columns) > 0) ^ (override_partition_id is not None)

    if block_transformer is not None:
        block = block_transformer(block)
    block = _hs.TableBlockAccessor.try_convert_block_type(
        block, block_type=_hs.BlockType.ARROW
    )
    if block.num_rows == 0:
        empty = _hs.BlockAccessor.for_block(block).get_metadata(
            exec_stats=stats.build()
        )
        return (empty, {})

    num_partitions = pool.num_partitions
    if key_columns:
        block_partitions = _hs.hash_partition(
            block, hash_cols=key_columns, num_partitions=num_partitions
        )
    else:
        assert 0 <= override_partition_id < num_partitions
        block_partitions = {override_partition_id: block}

    # retry-stable identity: Ray keeps the TaskID constant across retries
    # of the same task (only the attempt number changes)
    rt = ray.get_runtime_context()
    task_key = rt.get_task_id()
    attempt = getattr(rt, "get_attempt_number", lambda: 0)()

    # test-only fault hook: crash THIS worker once, mid-push, to exercise
    # the retry path deterministically (never set outside tests)
    fault_path = os.environ.get(_FAULT_ENV)
    inject_fault = False
    if fault_path and attempt == 0:
        try:
            with open(fault_path, "x"):
                inject_fault = True  # first _shuffle_block task to get here
        except FileExistsError:
            pass

    partition_shards_stats = {}
    pending = []
    n_pushed = 0
    n_nonempty = sum(1 for p in block_partitions.values() if p.num_rows > 0)
    for partition_id in range(num_partitions):
        partition_shard = block_partitions.get(partition_id)
        if partition_shard is None:
            if not send_empty_blocks:
                continue
            partition_shard = _hs._create_empty_table(block.schema)
        if partition_shard.num_rows > 0:
            partition_shards_stats[partition_id] = _hs._PartitionStats.for_table(
                partition_shard
            )
        aggregator = pool.get_aggregator_for_partition(partition_id)
        partition_ref = ray.put(partition_shard)
        pending.append(
            aggregator.submit.remote(
                input_index,
                partition_id,
                partition_ref,
                (task_key, input_index, partition_id),
            )
        )
        if partition_shard.num_rows > 0:
            n_pushed += 1
            if inject_fault and n_pushed * 2 >= n_nonempty:
                # half the shards pushed AND accepted — now die like a
                # preempted worker would
                ray.get(pending)
                os._exit(1)

    while pending:
        _, pending = ray.wait(pending, num_returns=len(pending), timeout=1)

    meta = _hs.BlockAccessor.for_block(block).get_metadata(exec_stats=stats.build())
    return (meta, partition_shards_stats)


try:
    from ray.data._internal.execution.operators.hash_shuffle import (  # noqa: F401
        BlockMetadataWithSchema as _BMWS,
    )
    import threading as _threading

    _retry_safe_shuffle_block = ray.remote(_retry_safe_shuffle_block_impl)

    @ray.remote
    class _RetrySafeAggregator:
        """Drop-in for Ray 2.49's ``HashShuffleAggregator`` that drops
        re-pushed shards (same ``push_key``) before accept — the actor
        half of the retry-safe shard push above."""

        _DEFAULT_ACTOR_MAX_CONCURRENCY = 1

        def __init__(self, aggregator_id, target_partition_ids, agg_factory):
            self._lock = _threading.Lock()
            self._agg = agg_factory(aggregator_id, target_partition_ids)
            self._accepted_push_keys = set()
            # test-only: lets the crash-retry test prove it DETECTS the
            # stock duplication (a control run with dedup off must show
            # duplicated rows, or the exact-match assertion is vacuous)
            self._dedup = not os.environ.get("ROGRAY_SHUFFLE_DEDUP_OFF")

        def submit(self, input_seq_id, partition_id, partition_shard, push_key=None):
            with self._lock:
                if push_key is not None and self._dedup:
                    if push_key in self._accepted_push_keys:
                        return  # duplicate push from a retried task
                    self._accepted_push_keys.add(push_key)
                self._agg.accept(input_seq_id, partition_id, partition_shard)

        def finalize(self, partition_id):
            from ray.data._internal.execution.operators import hash_shuffle as _hs

            with self._lock:
                exec_stats_builder = _hs.BlockExecStats.builder()
                block = self._agg.finalize(partition_id)
                exec_stats = exec_stats_builder.build()
                self._agg.clear(partition_id)
                # release the dedup keys of the finalized partition
                self._accepted_push_keys = {
                    k for k in self._accepted_push_keys if k[2] != partition_id
                }
            yield block
            yield _BMWS.from_block(block, stats=exec_stats)

except Exception:  # pragma: no cover - future-Ray guard
    _retry_safe_shuffle_block = None
    _RetrySafeAggregator = None


def _stamp_hash_shuffle(ctx) -> None:
    """Size the given DataContext for cluster-scaled hash shuffle."""
    ncpu = _cluster_cpus()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = min(_MAX_PARTITIONS, max(16, 2 * ncpu))
    ctx.max_hash_shuffle_aggregators = max(1, min(64, ncpu // 4))


@contextmanager
def scaled_hash_shuffle():
    """Build pipelines under cluster-sized actor-based hash shuffle."""
    _patch_hash_shuffle_empty_partitions()
    ctx = DataContext.get_current()
    prev = (
        ctx.shuffle_strategy,
        ctx.default_hash_shuffle_parallelism,
        ctx.max_hash_shuffle_aggregators,
    )
    _stamp_hash_shuffle(ctx)
    try:
        yield ctx
    finally:
        (
            ctx.shuffle_strategy,
            ctx.default_hash_shuffle_parallelism,
            ctx.max_hash_shuffle_aggregators,
        ) = prev


def hash_shuffled(fn):
    """Decorator: build the wrapped pipeline under scaled_hash_shuffle.

    Also stamps the hash strategy onto the plan context of every Dataset
    passed in: the shuffle planner reads the SOURCE dataset's context
    (shared by its whole lineage, see module docstring), so scoping the
    global context alone misses pipelines built on caller-created
    datasets — exactly how the bench/driver entry points call these
    builders.  Safe to nest (inner scopes restore to the outer
    override)."""
    from ray.data import Dataset

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        for a in (*args, *kwargs.values()):
            if isinstance(a, Dataset):
                _stamp_hash_shuffle(a.context)
        with scaled_hash_shuffle():
            return fn(*args, **kwargs)

    return wrapper
