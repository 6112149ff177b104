"""Cluster job entrypoint for the flagship resolve pipeline.

This is the deployable unit the north rule asks for — the analogue of the
reference's `CALL resolve_overlap_gap_run(...)` procedure (run.sql:2-455),
re-expressed as a Ray job: a `ray job submit` on a fixed-size multi-node
cluster executes THIS script inside the cluster (the job supervisor runs
`python jobs/resolve_job.py <config.json>` with the repo shipped as the
`working_dir` runtime env — see tools/submit.py).

The job is resumable: it drives resolve_overlap_gap_resumable, so per-tile
overlay output checkpoints atomically under `work_dir` and a resubmitted
job (same config fingerprint) recomputes only unfinished tiles, then
re-runs the cheap stitch + finalize over the union.  Final output is
partitioned parquet under `out_dir`.

Config JSON keys:
  input            parquet path/dir of the document table
                   (doc_id: string, spans: list<struct<kind, text,
                   media_ref, offset>>) — the mandated interleaved shape
  out_dir          final partitioned-parquet output directory
  work_dir         checkpoint root (default: <out_dir>/_work)
  snap_tolerance   float, default 1e-5
  utm              bool, default false (lon/lat world frame)
  max_rows_in_each_cell  int, default 5000
  base_level       int, default 3
  min_area_to_keep float, default 0.0 (cleaning mode when > 0)

Run standalone (single node, no job server):
  RAY_ADDRESS=local python jobs/resolve_job.py config.json
Ray is initialised lazily by Ray Data itself; inside a submitted job the
supervisor has already set RAY_ADDRESS to the cluster.
"""

from __future__ import annotations

import json
import os
import sys

# the repo root is the job's working_dir; when run as a plain script the
# interpreter only puts jobs/ on sys.path — add the root for rogray
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def run(config: dict) -> dict:
    import ray

    # inside `ray job submit` the supervisor provides the cluster address;
    # standalone runs let Ray Data auto-init a local session
    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            ignore_reinit_error=True,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from rogray.config import CleanConfig, ResolveConfig, TopologyConfig
    from rogray.pipelines import resolve

    cfg = ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=float(config.get("snap_tolerance", 1e-5)),
            utm=bool(config.get("utm", False)),
            max_rows_in_each_cell=int(config.get("max_rows_in_each_cell", 5000)),
            base_level=int(config.get("base_level", 3)),
        ),
        clean=CleanConfig(
            min_area_to_keep=float(config.get("min_area_to_keep", 0.0))
        ),
    )
    out_dir = config["out_dir"]
    work_dir = config.get("work_dir") or os.path.join(out_dir, "_work")
    os.makedirs(out_dir, exist_ok=True)

    ds = rd.read_parquet(config["input"])
    result = resolve.resolve_overlap_gap_resumable(ds, work_dir, cfg)
    # partitioned parquet, written to a temp dir and swapped in atomically:
    # a failed write reruns against the checkpointed stitched phase (never
    # the overlay), and a RESUBMIT replaces — not appends to — the output
    final_dir = os.path.join(out_dir, "result")
    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    result.write_parquet(tmp_dir)
    if os.path.exists(final_dir):
        import shutil

        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)

    out = rd.read_parquet(final_dir)
    summary = {
        "n_faces": out.count(),
        "out_dir": final_dir,
        "work_dir": work_dir,
    }
    print(json.dumps(summary))
    return summary


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__)
        return 2
    run(load_config(argv[1]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
