"""Retry-safe hash shuffle: a worker crash mid-exchange must not corrupt
results.

Ray 2.49's stock hash shuffle pushes partition shards to stateful
aggregator actors as it goes; a worker crash between the first accepted
shard and task completion followed by a task retry re-submits the
already-accepted shards — silent row duplication.  rogray's rebind
(rogray/rayctx.py) tags every push with the task's retry-stable TaskID
and drops re-pushed shards at the aggregator, making the push idempotent
so retries can stay enabled.

Both tests run in a fresh subprocess: the fault-injection env var must be
set before ray.init so the (new) raylet's workers inherit it, and the
session-scoped Ray fixture has already started without it.
"""

import os
import subprocess
import sys
import tempfile
import textwrap

_WORKLOAD = textwrap.dedent(
    """
    import os, sys
    import numpy as np, pyarrow as pa, pandas as pd
    import ray, ray.data as rd

    fault = sys.argv[1]
    os.environ["ROGRAY_SHUFFLE_FAULT_INJECT"] = fault
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from rogray.rayctx import scaled_hash_shuffle

    rng = np.random.default_rng(3)
    n = 400_000
    k = rng.integers(0, 5000, n)
    v = rng.integers(0, 1000, n)
    tbl = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v, pa.int64())})
    slices = [tbl.slice(i, 12500).combine_chunks() for i in range(0, n, 12500)]
    exp = (
        pd.DataFrame({"k": k, "v": v})
        .groupby("k", as_index=False)["v"].sum()
        .rename(columns={"v": "s"})
        .astype({"k": "int64", "s": "int64"})
        .sort_values("k").reset_index(drop=True)
    )

    def per_group(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": pa.array([t["k"][0].as_py()], pa.int64()),
            "s": pa.array([int(np.sum(t["v"].to_numpy()))], pa.int64()),
        })

    with scaled_hash_shuffle():
        ds = rd.from_arrow(slices)
        got = ds.groupby("k").map_groups(per_group, batch_format="pyarrow").to_pandas()
    got = got.sort_values("k").reset_index(drop=True)

    crashed = os.path.exists(fault)  # a _shuffle_block worker really died
    exact = bool(got.equals(exp))
    total_ok = int(got["s"].sum()) == int(exp["s"].sum())
    print(f"RESULT crashed={crashed} exact={exact} total_ok={total_ok}")
    ray.shutdown()
    """
)


def _run_workload(extra_env: dict) -> dict:
    fault = tempfile.mktemp(prefix="rogray_shuffle_fault_")
    env = {**os.environ, **extra_env}
    env.pop("ROGRAY_SHUFFLE_FAULT_INJECT", None)
    proc = subprocess.run(
        [sys.executable, "-c", _WORKLOAD, fault],
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
        cwd="/root/repo",
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return dict(kv.split("=") for kv in line.split()[1:])
    raise AssertionError(
        f"workload produced no RESULT line\nstdout:\n{proc.stdout[-2000:]}"
        f"\nstderr:\n{proc.stderr[-2000:]}"
    )


def test_worker_crash_mid_shuffle_is_exact():
    """Kill a worker halfway through its shard pushes: the retried task
    re-pushes everything, the aggregator drops the duplicates, and the
    grouped result is exactly correct."""
    r = _run_workload({})
    assert r["crashed"] == "True", "fault never fired — test exercised nothing"
    assert r["exact"] == "True", f"retry corrupted the exchange: {r}"


def test_crash_harness_detects_duplication_when_dedup_disabled():
    """Control: with dedup off (stock semantics) the same crash DOUBLES the
    re-pushed shards — proving the exact-match assertion above is not
    vacuous and the stock behavior is the defect being guarded against."""
    r = _run_workload({"ROGRAY_SHUFFLE_DEDUP_OFF": "1"})
    assert r["crashed"] == "True"
    assert r["total_ok"] == "False", (
        "dedup-off control matched exactly — the fault path is not "
        "duplicating, so the main test proves nothing"
    )
