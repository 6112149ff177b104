"""Benchmark runner.

  python bench.py             # headline + per-query timings, ONE JSON line
  python bench.py --scaling   # same headline at 8 and 32 CPUs in fresh
                              # processes; prints throughputs + efficiency

Input scale: $GRAFT_SF_DIR (default /root/testdata/sf0.1); CPU count:
$RAY_GRAFT_CPUS (default 32).  The headline is the flagship
resolve_overlap_gap pipeline over the synthetic polygon-document layer
sized to the scale factor (sf0.1 -> 60k polygons); the metric of record is
polygons resolved per second (BASELINE.json `metric`).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench(headline_only: bool = False) -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import numpy as np

    from rogray import dedup, relational, similarity, sources, textstats
    from rogray.config import ResolveConfig, TopologyConfig
    from rogray.pipelines import detect, resolve

    n_polys = int(os.environ.get("ROGRAY_BENCH_ROWS", "0")) or sources.scale_rows(sf_dir)
    docs_path = sources.docs_path_for(sf_dir, n_polys)
    # ~2-4k rows per tile keeps ~3 tiles per CPU at sf0.1 while cutting the
    # border-piece population (and with it the stitch group count) ~2x vs
    # the old 600-row tiles — measured 13-17 s vs 39-48 s on the round-4
    # box (face counts identical: the cut never affects results)
    cfg = ResolveConfig(
        topology=TopologyConfig(
            snap_tolerance=1e-5, max_rows_in_each_cell=2400, base_level=2
        )
    )

    queries: dict[str, float] = {}

    # warm the page cache + worker imports/startup (untimed tiny pipeline)
    rd.read_parquet(docs_path).count()
    warm = rd.read_parquet(sources.docs_path_for(sf_dir, 64))
    resolve.resolve_overlap_gap(warm, cfg).count()

    # median of 3 back-to-back runs: the shared box shows ±2x host-steal
    # spikes on identical code (documented in BASELINE.md round 4), so a
    # single sample is dominated by scheduler luck, not the engine
    import statistics

    runs = []
    for _ in range(int(os.environ.get("ROGRAY_HEADLINE_RUNS", "3"))):
        t0 = time.time()
        ds = rd.read_parquet(docs_path)
        n_faces = resolve.resolve_overlap_gap(
            ds, cfg, overlay_concurrency=(1, num_cpus)
        ).count()
        runs.append(time.time() - t0)
    headline = statistics.median(runs)
    queries["resolve_overlap_gap"] = round(headline, 3)
    headline_runs = [round(r, 3) for r in runs]

    if headline_only:
        ray.shutdown()
        sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
        return {
            "metric": "resolve_overlap_gap_wall_sec",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": float(sf) if sf else None,
            "num_cpus": num_cpus,
            "n_polygons": n_polys,
            "n_faces": n_faces,
            "polygons_per_sec": round(n_polys / headline, 1),
            "headline_runs": headline_runs,
        }

    t0 = time.time()
    detect.find_overlap_gap(rd.read_parquet(docs_path), cfg).count()
    queries["find_overlap_gap"] = round(time.time() - t0, 3)

    t0 = time.time()
    relational.pricing_summary(sf_dir).to_pandas()
    queries["pricing_summary"] = round(time.time() - t0, 3)

    t0 = time.time()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    dedup.minhash_lsh_pairs(docs).count()
    queries["dedup_minhash_lsh"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.exact_dedup(rd.read_parquet(f"{sf_dir}/documents.parquet")).count()
    queries["dedup_exact"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.ngram_jaccard_pairs(rd.read_parquet(f"{sf_dir}/documents.parquet")).count()
    queries["dedup_ngram_jaccard"] = round(time.time() - t0, 3)

    t0 = time.time()
    relational.events_sessionize(sf_dir).count()
    queries["events_sessionize"] = round(time.time() - t0, 3)

    t0 = time.time()
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qt = qt.filter(pc.less(qt["vec_id"], 4)).sort_by("vec_id")
    qm = np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)
    similarity.brute_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"), qm, qt["vec_id"].to_pylist()
    ).count()
    queries["ann_brute_topk"] = round(time.time() - t0, 3)

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    out = {
        "metric": "resolve_overlap_gap_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf else None,
        "num_cpus": num_cpus,
        "n_polygons": n_polys,
        "n_faces": n_faces,
        "polygons_per_sec": round(n_polys / headline, 1),
        "headline_runs": headline_runs,
    }
    ray.shutdown()
    return out


def run_scaling(pairs: int = 3) -> None:
    """Same headline job at two parallelism levels in fresh processes —
    the sandbox stand-in for the N vs 4N cluster-size criterion.  Each
    pair runs 8-then-32 CPUs back-to-back (headline pipeline only) so
    box-contention noise hits both sides of a ratio comparably; the
    reported efficiency is the MEDIAN pair.

    Input size: the scaling fixture defaults to 4x the sf0.1 row count
    (240k polygons, deterministic synthetic layer, same generator as the
    bench input).  A 4N-node cluster ingesting a web-scale layer has
    minutes of per-stage work per node; strong-scaling a ~20 s job
    measures Ray's fixed per-stage latency (~10 s of barrier/straggler
    floor at any CPU count) instead of the engine.  Override with
    ROGRAY_SCALING_ROWS; BASELINE.md records both the small-input and
    scale-representative numbers."""
    import statistics

    # 960k polygons: the fixture grows with the engine (round 3 used 240k;
    # the round-4 structural wins cut the 8-CPU leg there to ~90 s, which
    # re-exposed the ~20 s fixed floor — fitting t = C/p + F gave C ≈ 560
    # core-s, F ≈ 23 s → efficiency mechanically ~0.5 on code that is
    # strictly faster at both CPU counts).  At 960k each leg is minutes of
    # real work per CPU tier, the regime the N->4N cluster criterion
    # describes.  Legs are single runs (back-to-back pairing handles box
    # noise); ROGRAY_SCALING_ROWS overrides.
    rows = os.environ.get("ROGRAY_SCALING_ROWS", "960000")
    runs: list[dict] = []
    for _ in range(pairs):
        pair = {}
        for ncpu in (8, 32):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                ROGRAY_BENCH_ROWS=rows,
                ROGRAY_HEADLINE_RUNS="1",
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-only"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            pair[ncpu] = json.loads(out.strip().splitlines()[-1])
        t8, t32 = pair[8]["value"], pair[32]["value"]
        runs.append(
            {
                "sec_8cpu": t8,
                "sec_32cpu": t32,
                "throughput_8cpu_polys_per_sec": pair[8]["polygons_per_sec"],
                "throughput_32cpu_polys_per_sec": pair[32]["polygons_per_sec"],
                "scaling_efficiency": round((t8 / t32) / (32 / 8), 3),
            }
        )
    med = statistics.median(r["scaling_efficiency"] for r in runs)
    # report times/throughput from the MEDIAN pair, matching the selection
    # criterion of the reported efficiency (the best pair's times next to
    # the median efficiency would overstate throughput); raw pairs ride
    # along for anyone who wants a different cut
    med_pair = min(runs, key=lambda r: abs(r["scaling_efficiency"] - med))
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "sec_8cpu": med_pair["sec_8cpu"],
                "sec_32cpu": med_pair["sec_32cpu"],
                "throughput_8cpu_polys_per_sec": med_pair["throughput_8cpu_polys_per_sec"],
                "throughput_32cpu_polys_per_sec": med_pair["throughput_32cpu_polys_per_sec"],
                "scaling_efficiency": med,
                "pairs": runs,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--headline-only" in sys.argv:
        print(json.dumps(run_bench(headline_only=True)))
    else:
        print(json.dumps(run_bench()))
