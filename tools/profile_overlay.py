"""Serial per-core overlay-kernel throughput — the deployment-sizing number.

The headline wall time on one box is floor-bound, not kernel-bound
(BASELINE.md), but at 100 TB the bill is per-core throughput: nodes x
cores x polygons/s/core = layer/day.  This measures the TileOverlay
kernel in ISOLATION — unwrap+route driver-side, then a single-threaded
loop over per-tile groups with a perf_counter around each call — so the
number excludes Ray scheduling, shuffles, and stitch entirely.

  python tools/profile_overlay.py [n_polygons]   # default 60000 (sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rogray import sources, stages
    from rogray.config import ResolveConfig, TopologyConfig
    from rogray.pipelines import resolve

    cfg = ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1e-5, max_rows_in_each_cell=2400, base_level=2
        )
    )
    ds = rd.read_parquet(sources.docs_path_for("/root/testdata/sf0.1", n))
    refs, ds = stages.small_input_refs(ds, limit=1 << 34)  # force the wave path
    plan = resolve.prepare(ds, cfg, input_refs=refs)
    routed = resolve.routed_table_from_refs(refs, plan)
    mk = resolve._marker_table(plan)
    routed = pa.concat_tables(
        [routed, mk.select(routed.column_names)], promote_options="permissive"
    )

    overlay = stages.TileOverlay(
        plan.grid,
        cfg.topology.utm,
        cfg.clean.min_area_to_keep,
        resolve._coarse_level(plan, cfg.topology.base_level),
        clean=cfg.clean,
    )

    starts, ends, order = stages._group_runs(routed, "tile")
    serial = 0.0
    n_faces = 0
    n_tiles = 0
    for s, e in zip(starts.tolist(), ends.tolist()):
        sub = routed.take(pa.array(order[s:e], pa.int64()))
        t0 = time.perf_counter()
        out = overlay(sub)
        serial += time.perf_counter() - t0
        n_faces += len(out) if out is not None else 0
        n_tiles += 1

    print(
        {
            "n_polygons": n,
            "n_tiles": n_tiles,
            "n_faces_pre_stitch": n_faces,
            "overlay_serial_cpu_sec": round(serial, 2),
            "polygons_per_sec_per_core": round(n / serial, 1),
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
