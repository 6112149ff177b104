"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine near-dup.

Patterns (partial aggregation inside map_batches, then a small groupby):
- exact: content-hash column in map_batches, then hash-partitioned
  groupby(hash).map_groups(keep min doc_id) — no full-text shuffle, only
  (hash, id) when texts are big (we keep it simple at test scale).
- MinHash-LSH: shingle -> 64 minhashes -> band rows -> groupby(band) ->
  candidate pairs -> exact-Jaccard verify.  All hashing is crc32-based so
  results are process- and machine-deterministic (no PYTHONHASHSEED).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_NPERM = 64
_BANDS = 16
_ROWS_PER_BAND = 4
_rng = np.random.default_rng(0xC0FFEE)
_A = _rng.integers(1, _MERSENNE, size=_NPERM, dtype=np.int64)
_B = _rng.integers(0, _MERSENNE, size=_NPERM, dtype=np.int64)


def _shingles(text: str, k: int = 5) -> np.ndarray:
    s = " ".join((text or "").lower().split())
    if len(s) < k:
        s = s + " " * (k - len(s))
    out = {zlib.crc32(s[i : i + k].encode("utf-8")) for i in range(len(s) - k + 1)}
    return np.fromiter(out, dtype=np.int64, count=len(out))


def _minhash(sh: np.ndarray) -> np.ndarray:
    # (a*h + b) mod p, p = 2^61-1; h < 2^32 so a*h < 2^93 -> use object? no:
    # keep a < 2^29 to stay in int64: fold a via modular split
    h = sh.astype(np.uint64)
    out = np.empty(_NPERM, dtype=np.uint64)
    for j in range(_NPERM):
        v = (np.uint64(_A[j]) * h + np.uint64(_B[j])) % np.uint64(_MERSENNE)
        out[j] = v.min()
    return out


def exact_dedup(ds, col: str = "text"):
    """Keep the min-doc_id row per distinct text. Returns doc_id ordered."""

    def add_hash(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        hs = [zlib.crc32((s or "").encode("utf-8")) for s in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                col: t[col].combine_chunks(),
                "h": pa.array(hs, pa.int64()),
            }
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # same hash may hold several distinct texts: min doc_id per text
        out = g.sort_values("doc_id").drop_duplicates(subset=[col], keep="first")
        return out[["doc_id"]]

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
    )


def exact_dedup_sql() -> str:
    return """
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn = 1
    """


def minhash_signatures(ds, col: str = "text"):
    """doc_id -> 64 minhash values (list column)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        sigs = [
            _minhash(_shingles(s)).astype(np.int64).tolist() for s in texts
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_lsh_pairs(ds, col: str = "text", jaccard_threshold: float = 0.8):
    """Near-duplicate candidate pairs via LSH banding, verified by the
    estimated Jaccard (fraction of matching minhashes).

    Returns (id_a, id_b, jaccard_x100) with id_a < id_b, deduplicated.
    """

    def band_rows(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        ids = t["doc_id"].to_pylist()
        b_band, b_hash, b_id, b_sig = [], [], [], []
        for did, s in zip(ids, texts):
            sig = _minhash(_shingles(s))
            for b in range(_BANDS):
                chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
                b_band.append(b)
                b_hash.append(int(zlib.crc32(chunk.tobytes())))
                b_id.append(did)
                b_sig.append(sig.astype(np.int64).tolist())
        return pa.table(
            {
                "band": pa.array(b_band, pa.int32()),
                "bhash": pa.array(b_hash, pa.int64()),
                "doc_id": pa.array(b_id),
                "sig": pa.array(b_sig, pa.list_(pa.int64())),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_x100": []})
        g = g.sort_values("doc_id").drop_duplicates(subset=["doc_id"])
        ids = g["doc_id"].tolist()
        sigs = np.asarray(g["sig"].tolist(), dtype=np.int64)
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            same = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for k, j in enumerate(same):
                if j >= jaccard_threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + k])
                    out_j.append(int(round(100 * j)))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard_x100": out_j})

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bhash"])
        .map_groups(pairs, batch_format="pandas")
    )

    # same pair can surface from several bands: dedup
    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(dedup, batch_format="pandas")


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (crc32-seeded, deterministic)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in (text or "").lower().split():
        h = zlib.crc32(w.encode("utf-8"))
        h2 = zlib.crc32((w + "#").encode("utf-8"))
        bits = (np.uint64(h) << np.uint64(32)) | np.uint64(h2)
        for i in range(64):
            acc[i] += 1 if (int(bits) >> i) & 1 else -1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(ds, col: str = "text", max_hamming: int = 3):
    """Near-dup pairs with SimHash hamming distance <= max_hamming, found
    via 4x16-bit block LSH (a pair within distance 3 matches >= 1 block)."""

    def rows(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        ids = t["doc_id"].to_pylist()
        blk, key, did, sh = [], [], [], []
        for d, s in zip(ids, texts):
            h = simhash64(s)
            for b in range(4):
                blk.append(b)
                key.append((h >> (16 * b)) & 0xFFFF)
                did.append(d)
                sh.append(h if h < (1 << 63) else h - (1 << 64))
        return pa.table(
            {
                "blk": pa.array(blk, pa.int32()),
                "key": pa.array(key, pa.int64()),
                "doc_id": pa.array(did),
                "sh": pa.array(sh, pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates(subset=["doc_id"])
        ids = g["doc_id"].tolist()
        hs = g["sh"].to_numpy(dtype=np.int64).astype(np.uint64)
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            x = hs[i + 1 :] ^ hs[i]
            # popcount via bit tricks
            d = np.zeros(len(x), dtype=np.int64)
            v = x.copy()
            while v.any():
                d += (v & np.uint64(1)).astype(np.int64)
                v >>= np.uint64(1)
            for k in np.flatnonzero(d <= max_hamming):
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + k])
                out_d.append(int(d[k]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_d})

    cand = (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby(["blk", "key"])
        .map_groups(pairs, batch_format="pandas")
    )
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def embedding_neardup_exact(ds, threshold: float = 0.4, n_blocks: int = 8):
    """EXACT embedding cosine near-dup pairs via a block nested-loop
    pair join: each vector is routed to every block pair (bi, bj) it
    belongs to, groups compute the cross-cosine between the two blocks.
    Exactly matches the DuckDB cross-join oracle; O(B) duplication.
    """

    def rows(t: pa.Table) -> pa.Table:
        embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        norm = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-12)
        out = {"pair": [], "vec_id": [], "blk": [], "nvec": []}
        for i in range(len(ids)):
            b = int(ids[i]) % n_blocks
            for other in range(n_blocks):
                lo, hi = min(b, other), max(b, other)
                out["pair"].append(lo * n_blocks + hi)
                out["vec_id"].append(int(ids[i]))
                out["blk"].append(b)
                out["nvec"].append(norm[i].tolist())
        return pa.table(
            {
                "pair": pa.array(out["pair"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "blk": pa.array(out["blk"], pa.int32()),
                "nvec": pa.array(out["nvec"], pa.list_(pa.float64())),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["vec_id"]).sort_values("vec_id")
        pair = int(g["pair"].iloc[0])
        lo, hi = pair // n_blocks, pair % n_blocks
        ids = g["vec_id"].to_numpy()
        blks = g["blk"].to_numpy()
        vecs = np.asarray(g["nvec"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "sim_x1000": []})
        sims = vecs @ vecs.T
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        # a pair is owned by exactly the group of its two blocks; this keeps
        # same-block pairs from being emitted by every (b, other) group
        own = (np.minimum(blks[ii], blks[jj]) == lo) & (
            np.maximum(blks[ii], blks[jj]) == hi
        )
        ii, jj = ii[own], jj[own]
        return pd.DataFrame(
            {
                "vec_id_a": ids[ii],
                "vec_id_b": ids[jj],
                "sim_x1000": np.floor(sims[ii, jj] * 1000 + 0.5).astype(np.int64),
            }
        )

    return (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(pairs, batch_format="pandas")
    )


def embedding_neardup_pairs(ds, threshold: float = 0.4):
    """Embedding cosine near-dup pairs (vec_id_a < vec_id_b, sim rounded).

    Hyperplane-LSH bucketed scan — the SCALE path (recall < 1 by design;
    ~99.7% at sim 0.98 with 4 bands of 4 bits).  Use
    embedding_neardup_exact for oracle-exact results.
    """

    def rows(t: pa.Table) -> pa.Table:
        embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        ids = t["vec_id"].to_pylist()
        norm = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(1234)
        planes = rng.standard_normal((norm.shape[1], 16))
        bits = (norm @ planes) > 0
        out_band, out_key, out_id, out_vec = [], [], [], []
        for i in range(len(ids)):
            h = int(np.packbits(bits[i]).view(np.uint16)[0])
            for b in range(4):
                out_band.append(b)
                out_key.append((h >> (4 * b)) & 0xF)
                out_id.append(ids[i])
                out_vec.append(norm[i].tolist())
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "nvec": pa.array(out_vec, pa.list_(pa.float64())),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").drop_duplicates(subset=["vec_id"])
        ids = g["vec_id"].to_numpy()
        vecs = np.asarray(g["nvec"].tolist())
        sims = vecs @ vecs.T
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {
                "vec_id_a": ids[ii],
                "vec_id_b": ids[jj],
                "sim_x1000": np.floor(sims[ii, jj] * 1000 + 0.5).astype(np.int64),
            }
        )

    cand = (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
    )
    return cand.groupby(["vec_id_a", "vec_id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def embedding_neardup_sql(threshold: float = 0.4) -> str:
    return f"""
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               CAST(round(list_cosine_similarity(a.embedding, b.embedding) * 1000) AS BIGINT) AS sim_x1000
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
    """


def _word_ngrams(text: str, n: int = 3) -> set:
    words = (text or "").lower().split()
    if len(words) < n:
        return {tuple(words)} if words else set()
    return {tuple(words[i : i + n]) for i in range(len(words) - n + 1)}


def ngram_jaccard_pairs(ds, col: str = "text", n: int = 3, threshold: float = 0.5):
    """Exact word-n-gram Jaccard over MinHash-LSH candidate pairs.

    LSH supplies the candidates (high recall at this threshold); the exact
    verify computes true Jaccard on the two documents' n-gram sets, so the
    emitted pairs are exact subject to LSH recall.  Texts travel with the
    band rows only for candidate groups (never a full cross join).
    """

    def band_rows(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        ids = t["doc_id"].to_pylist()
        b_band, b_hash, b_id, b_text = [], [], [], []
        for did, s in zip(ids, texts):
            sig = _minhash(_shingles(s))
            for b in range(_BANDS):
                chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
                b_band.append(b)
                b_hash.append(int(zlib.crc32(chunk.tobytes())))
                b_id.append(did)
                b_text.append(s)
        return pa.table(
            {
                "band": pa.array(b_band, pa.int32()),
                "bhash": pa.array(b_hash, pa.int64()),
                "doc_id": pa.array(b_id),
                "text": pa.array(b_text, pa.string()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates(subset=["doc_id"])
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_x1000": []})
        ids = g["doc_id"].tolist()
        grams = [_word_ngrams(s) for s in g["text"].tolist()]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(grams[i] & grams[j])
                union = len(grams[i] | grams[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(int(np.floor(jac * 1000 + 0.5)))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard_x1000": out_j})

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bhash"])
        .map_groups(pairs, batch_format="pandas")
    )
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
