"""The `ray job submit` deployable unit (jobs/resolve_job.py, north rule:
"runs via ray job submit on a fixed-size multi-node Ray cluster").

The container lacks the `ray[default]` Jobs-server extras, so the smoke
test drives tools/submit.py --local — which executes the exact entrypoint
command a job supervisor would (`python jobs/resolve_job.py config.json`)
in a fresh process — and asserts the output matches the in-process
pipeline bit-for-bit on sf0.001."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_result(tmp_path_factory):
    from rogray import sources

    root = tmp_path_factory.mktemp("job")
    out_dir = str(root / "out")
    n = sources.scale_rows(SF)
    config = {
        "input": sources.docs_path_for(SF, n),
        "out_dir": out_dir,
        "snap_tolerance": 1e-5,
        "max_rows_in_each_cell": 400,
        "base_level": 2,
    }
    cfg_path = str(root / "job.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit.py"),
         "--config", cfg_path, "--local"],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return config


def test_local_submit_matches_inprocess(job_result):
    import pyarrow.compute as pc
    import ray.data as rd

    import __ray_entry__ as e
    from rogray.pipelines import resolve

    out = rd.read_parquet(os.path.join(job_result["out_dir"], "result"))
    job_tbl = (
        out.select_columns(["winner_pk", "area", "tile"])
        .sort(["tile", "winner_pk", "area"])
        .to_pandas()
    )

    ds = rd.read_parquet(job_result["input"])
    ref = resolve.resolve_overlap_gap(ds, e._geo_cfg(max_rows=400, base_level=2))
    ref_tbl = (
        ref.select_columns(["winner_pk", "area", "tile"])
        .sort(["tile", "winner_pk", "area"])
        .to_pandas()
    )
    assert len(job_tbl) == len(ref_tbl) > 0
    assert (job_tbl["tile"].to_numpy() == ref_tbl["tile"].to_numpy()).all()
    jw, rw = job_tbl["winner_pk"].to_numpy(), ref_tbl["winner_pk"].to_numpy()
    assert ((jw == rw) | (np.isnan(jw) & np.isnan(rw))).all()
    assert np.allclose(job_tbl["area"].to_numpy(), ref_tbl["area"].to_numpy(), rtol=0, atol=0)


def test_resubmit_skips_finished_tiles(job_result):
    """A resubmitted job (same config fingerprint) reuses the stitched-phase
    checkpoint: the second run must succeed and leave the output identical."""
    import pyarrow.parquet as pq
    import ray.data as rd

    before = rd.read_parquet(os.path.join(job_result["out_dir"], "result")).count()
    root = os.path.dirname(job_result["out_dir"])
    cfg_path = os.path.join(root, "job.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit.py"),
         "--config", cfg_path, "--local"],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # the stitched-phase checkpoint must exist and be valid for this config
    work = job_result.get("work_dir") or os.path.join(job_result["out_dir"], "_work")
    assert os.path.isdir(work)
    after = rd.read_parquet(os.path.join(job_result["out_dir"], "result")).count()
    assert after == before
