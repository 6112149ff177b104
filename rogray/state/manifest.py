"""Per-partition lineage + metrics manifest — resumable output.

Reference semantics: the `_job_list_donejobs` checkpoint lets a restarted
run skip finished cells (function_resolve_overlap_gap_job_list.sql:52-67,
cell.sql:125-132), and debug options allow stop/start at a phase boundary
(types_resolve_overlap.sql:105-142; regression restart test
resolve_overlap_and_gap.sql:97-186).

Ray-Data realisation: output is written as one parquet directory PER TILE
(the resume unit).  Each completed tile directory gets a `_MANIFEST.json`
with row counts, face counts, config fingerprint, and input lineage.  A
resumed run lists completed tiles, filters them out of the Route stage
(anti-join against the done set, broadcast once) and only computes the
remainder — the 'resume mid-shuffle' contract: work lost is at most the
tiles in flight, never finished ones.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict


def config_fingerprint(cfg) -> str:
    try:
        payload = json.dumps(asdict(cfg), sort_keys=True, default=str)
    except TypeError:
        payload = repr(cfg)
    return hashlib.md5(payload.encode()).hexdigest()[:16]


def tile_dir(root: str, tile: int) -> str:
    return os.path.join(root, f"tile={tile}")


def write_tile(root: str, tile: int, table, cfg_fp: str, metrics: dict) -> None:
    """Atomically write one tile's output + manifest (temp dir + rename)."""
    import pyarrow.parquet as pq

    final = tile_dir(root, tile)
    tmp = final + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
    manifest = {
        "tile": tile,
        "rows": table.num_rows,
        "config_fp": cfg_fp,
        "written_at": time.time(),
        **metrics,
    }
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    if os.path.exists(final):
        import shutil

        shutil.rmtree(final)
    os.replace(tmp, final)


def completed_tiles(root: str, cfg_fp: str | None = None) -> set[int]:
    """Tiles with a valid manifest (and matching config when given)."""
    done = set()
    if not os.path.isdir(root):
        return done
    for name in os.listdir(root):
        if not name.startswith("tile="):
            continue
        mpath = os.path.join(root, name, "_MANIFEST.json")
        try:
            with open(mpath) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if cfg_fp is not None and m.get("config_fp") != cfg_fp:
            continue
        done.add(int(m["tile"]))
    return done


def read_all(root: str):
    """The combined result Dataset of a (possibly resumed) run."""
    import ray.data as rd

    parts = [
        os.path.join(root, n, "part-0.parquet")
        for n in sorted(os.listdir(root))
        if n.startswith("tile=") and os.path.isdir(os.path.join(root, n))
    ]
    return rd.read_parquet(parts)


def phase_dir(root: str, phase: str) -> str:
    return os.path.join(root, f"phase={phase}")


def checkpoint_phase(root: str, phase: str, ds, cfg_fp: str):
    """Write-once PHASE checkpoint — the reference's stop_at/start_at
    phase-boundary restart semantics (types_resolve_overlap.sql:105-142,
    restart regression resolve_overlap_and_gap.sql:97-186) realised as a
    partitioned-parquet snapshot of an intermediate Dataset.

    If a valid checkpoint for this config fingerprint exists, ``ds`` is
    NOT consumed (the producing stages never run); otherwise ``ds`` is
    streamed to disk via a distributed ``write_parquet`` (atomic: temp
    dir + rename, manifest written last).  Returns a Dataset reading the
    checkpoint, so everything downstream re-runs from disk on a resume.
    """
    import shutil

    import ray.data as rd

    final = phase_dir(root, phase)
    mpath = os.path.join(final, "_PHASE.json")

    def _read():
        parts = [
            os.path.join(final, n)
            for n in sorted(os.listdir(final))
            if n.endswith(".parquet")
        ]
        return rd.read_parquet(parts)

    if os.path.exists(mpath):
        try:
            with open(mpath) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            m = None
        if m and m.get("config_fp") == cfg_fp:
            return _read()
        shutil.rmtree(final)

    tmp = final + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    with open(os.path.join(tmp, "_PHASE.json"), "w") as f:
        json.dump(
            {"phase": phase, "config_fp": cfg_fp, "written_at": time.time()}, f
        )
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    return _read()


def phase_valid(root: str, phase: str, cfg_fp: str) -> bool:
    mpath = os.path.join(phase_dir(root, phase), "_PHASE.json")
    try:
        with open(mpath) as f:
            return json.load(f).get("config_fp") == cfg_fp
    except (OSError, json.JSONDecodeError):
        return False
