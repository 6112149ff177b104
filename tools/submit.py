"""Submit the resolve pipeline as a Ray job (the cluster deployable unit).

    python tools/submit.py --config job.json [--address http://head:8265]
    python tools/submit.py --config job.json --local   # no job server

Cluster path: packages the repo as the job's `working_dir` runtime env and
submits `python jobs/resolve_job.py <config>` through the Ray Jobs API —
the equivalent of

    ray job submit --address http://head:8265 \
        --working-dir . -- python jobs/resolve_job.py job.json

then tails the job to a terminal state.  The job itself is resumable
(per-tile checkpoints; see jobs/resolve_job.py), so resubmitting after a
crash completes the remainder.

Local fallback (`--local`, used automatically when the Jobs SDK is not
installed — it requires the `ray[default]` extras): runs the SAME
entrypoint script as a subprocess against a local Ray session, which is
exactly what the job supervisor would execute on the head node.  Result
parity between the two paths is pinned by tests/test_job_submit.py.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRYPOINT = os.path.join("jobs", "resolve_job.py")


def submit_cluster(address: str, config_path: str) -> str:
    """Submit through the Ray Jobs API; returns the terminal job status."""
    from ray.job_submission import JobStatus, JobSubmissionClient

    client = JobSubmissionClient(address)
    job_id = client.submit_job(
        entrypoint=f"python {ENTRYPOINT} {os.path.basename(config_path)}",
        runtime_env={
            "working_dir": REPO_ROOT,
            # ship only code + the config; fixtures/test data stay put
            "excludes": ["/tests/", "*.parquet", "/.git/"],
        },
    )
    print(f"submitted {job_id}")
    terminal = {JobStatus.SUCCEEDED, JobStatus.FAILED, JobStatus.STOPPED}
    while True:
        status = client.get_job_status(job_id)
        if status in terminal:
            break
        time.sleep(2)
    print(client.get_job_logs(job_id))
    print(f"job {job_id}: {status}")
    return str(status)


def submit_local(config_path: str) -> str:
    """Run the job entrypoint as a subprocess on a local Ray session —
    the single-node smoke path for environments without the Jobs server."""
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, ENTRYPOINT), config_path],
        env=env,
        cwd=REPO_ROOT,
    )
    return "SUCCEEDED" if proc.returncode == 0 else "FAILED"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--address", default=os.environ.get("RAY_JOB_ADDRESS", "http://127.0.0.1:8265"))
    ap.add_argument("--local", action="store_true")
    args = ap.parse_args()

    if not args.local:
        try:
            from ray.job_submission import JobSubmissionClient  # noqa: F401

            return 0 if submit_cluster(args.address, args.config) == "SUCCEEDED" else 1
        except (ImportError, RuntimeError) as e:
            print(f"Jobs SDK unavailable ({e}); falling back to --local")
    return 0 if submit_local(args.config) == "SUCCEEDED" else 1


if __name__ == "__main__":
    raise SystemExit(main())
