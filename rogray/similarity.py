"""Similarity search over the embeddings table.

- brute-force cosine top-k (the exactness baseline): per-batch numpy matmul
  against a broadcast query matrix, partial top-k per batch, tiny final
  reduce.  Only (query, cand, score) partials shuffle — never the vectors.
- IVF-style variant (the scale path): vectors pre-bucketed by nearest of C
  coarse centroids; queries probe the P nearest buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import stages


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_topk(ds, queries: np.ndarray, query_ids: list[int], k: int = 10):
    """Exact cosine top-k.  queries: (Q, D) float matrix (broadcast to every
    batch — ship once via closure, it is tiny).  Returns
    (query_id, vec_id, sim_x1000) with deterministic tie-break on vec_id.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids)

    def partial(t: pa.Table) -> pa.Table:
        embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        sims = qn @ _normalize(embs).T  # (Q, N)
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(len(qids)):
            row = sims[qi]
            # partial top-k per batch (sort by -sim, then vec_id)
            order = np.lexsort((ids, -row))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["sim_x1000"] = np.floor(g["sim"] * 1000 + 0.5).astype(np.int64)
        return g[["query_id", "vec_id", "sim_x1000"]]

    part = ds.map_batches(partial, batch_format="pyarrow")
    # hint=None: the per-block partial top-k is a reduction (Q x k rows
    # per block), bounded regardless of corpus size
    return stages.gated_groupby(
        None, part, "query_id", reduce_group, batch_format="pandas"
    )


def brute_topk_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ",".join(map(str, query_ids))
    return f"""
        SELECT query_id, vec_id, CAST(round(sim * 1000) AS BIGINT) AS sim_x1000
        FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                 list_cosine_similarity(q.embedding, e.embedding) AS sim,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                            e.vec_id
                 ) AS rn
          FROM embeddings q JOIN embeddings e ON TRUE
          WHERE q.vec_id IN ({ids})
        ) WHERE rn <= {k}
    """


def _kmeans_lite(sample: np.ndarray, n_centroids: int, seed: int,
                 n_iter: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on a small sample (Lloyd iterations
    with cosine assignment) — the centroid-training step of IVF (public
    algorithm).  The sample is driver-side and bounded, never the dataset."""
    rng = np.random.default_rng(seed)
    sn = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(sn)
    cents = sn[rng.choice(n, size=min(n_centroids, n), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(sn @ cents.T, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = sn[mask].mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(ds, queries: np.ndarray, query_ids: list[int], k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 7,
             train_sample: int = 2048):
    """IVF-bucketed approximate top-k (the 100TB path).

    Centroids come from deterministic spherical k-means on a bounded
    RANDOM sample (seeded ``random_sample``; driver-side, tiny) — a
    head-of-dataset ``limit`` would train unrepresentative centroids on
    sorted or clustered input; vectors shuffle once by nearest centroid;
    each query scans only its n_probe nearest buckets.  Recall vs
    brute_topk is asserted in tests/test_ops.py.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    n_total = ds.count()
    if n_total == 0:
        raise ValueError("ivf_topk: empty dataset")
    if n_total <= train_sample:
        sample_rows = ds.take_all()
    else:
        frac = min(1.0, 1.5 * train_sample / n_total)
        sample_rows = (
            ds.random_sample(frac, seed=seed).limit(train_sample).take_all()
        )
        if not sample_rows:  # pathological sampling miss: fall back
            sample_rows = ds.limit(train_sample).take_all()
    sample = np.asarray([r["embedding"] for r in sample_rows], dtype=np.float64)
    cents = _kmeans_lite(sample, n_centroids, seed)
    q_probe = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    qids = list(query_ids)

    def bucket(t: pa.Table) -> pa.Table:
        embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        nv = _normalize(embs)
        b = np.argmax(nv @ cents.T, axis=1)
        return pa.table(
            {
                "bucket": pa.array(b.astype(np.int64), pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "nvec": pa.array(nv.tolist(), pa.list_(pa.float64())),
            }
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        probing = [qi for qi in range(len(qids)) if b in q_probe[qi]]
        if not probing:
            return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
        ids = g["vec_id"].to_numpy()
        vecs = np.asarray(g["nvec"].tolist())
        sims = qn[probing] @ vecs.T
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for row_i, qi in enumerate(probing):
            order = np.lexsort((ids, -sims[row_i]))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(sims[row_i][order].tolist())
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "sim": out_s})

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["sim_x1000"] = np.floor(g["sim"] * 1000 + 0.5).astype(np.int64)
        return g[["query_id", "vec_id", "sim_x1000"]]

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    scanned = stages.gated_groupby(ds, bucketed, "bucket", scan, batch_format="pandas")
    return stages.gated_groupby(
        None, scanned, "query_id", reduce_group, batch_format="pandas"
    )
