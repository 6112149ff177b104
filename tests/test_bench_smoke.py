"""Smoke-guard for the driver-facing bench surface.

The per-round BENCH record comes from `python bench.py`; a regression
there silently loses the round's numbers, so pin the contract: the
headline-only mode (what --scaling runs per process) produces one JSON
line with the expected keys on a tiny input in a fresh process."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_headline_only_contract():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        ROGRAY_BENCH_ROWS="600",
        ROGRAY_HEADLINE_RUNS="1",  # the smoke test needs one run, not 3
        RAY_ADDRESS="",  # fresh local session inside the subprocess
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "resolve_overlap_gap_wall_sec"
    assert rec["n_polygons"] == 600
    assert rec["n_faces"] > 0
    assert rec["num_cpus"] == 4
    assert set(rec) >= {"value", "unit", "queries", "sf", "polygons_per_sec"}
    assert rec["queries"]["resolve_overlap_gap"] == rec["value"]
