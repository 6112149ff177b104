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

Measured at 960k polygons / 32 CPUs (single node): overlay execution
74 s -> 45 s, finalize execution 785 s -> 142 s, identical output rows.

Datasets deep-copy the active ``DataContext`` at creation, so the
override is scoped: pipelines built inside the ``with`` keep hash
shuffle for their whole (lazy) lifetime, while datasets built outside
are untouched.  Sort-based shuffle remains the default for the
relational/dedup operators whose exchanges are pre-bucketed and small
per group; flip them by building under this context manager if a
deployment proves driver-bound there too.
"""

from __future__ import annotations

import functools
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


@contextmanager
def scaled_hash_shuffle():
    """Build pipelines under cluster-sized actor-based hash shuffle."""
    ctx = DataContext.get_current()
    prev = (
        ctx.shuffle_strategy,
        ctx.default_hash_shuffle_parallelism,
        ctx.max_hash_shuffle_aggregators,
    )
    ncpu = _cluster_cpus()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = min(_MAX_PARTITIONS, max(16, 2 * ncpu))
    ctx.max_hash_shuffle_aggregators = max(1, min(64, ncpu // 4))
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

    Safe to nest (inner scopes restore to the outer override)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with scaled_hash_shuffle():
            return fn(*args, **kwargs)

    return wrapper
