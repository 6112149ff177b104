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

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from . import stages

_MERSENNE = (1 << 61) - 1
_NPERM = 64
_BANDS = 16
_ROWS_PER_BAND = 4
_rng = np.random.default_rng(0xC0FFEE)
_A = _rng.integers(1, _MERSENNE, size=_NPERM, dtype=np.int64)
_B = _rng.integers(0, _MERSENNE, size=_NPERM, dtype=np.int64)


def _shingles(text: str, k: int = 5, _memo: dict | None = None) -> np.ndarray:
    """Distinct char-k-gram hashes of whitespace-normalized text, as
    ``md5_number_lower(gram) % 2**32`` — DuckDB-expressible, so the LSH
    oracle recomputes identical shingle sets (crc32 is not in DuckDB)."""
    s = " ".join((text or "").lower().split())
    if len(s) < k:
        s = s + " " * (k - len(s))
    memo = _memo if _memo is not None else {}
    out = set()
    for i in range(len(s) - k + 1):
        g = s[i : i + k]
        h = memo.get(g)
        if h is None:
            h = (
                int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[8:], "little")
                & 0xFFFFFFFF
            )
            memo[g] = h
        out.add(h)
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

    # driver-bounded corpora: hash as a plain-task wave, group via the
    # fan-out — zero Ray Data executions (stages.small_input_refs note)
    input_refs, ds = stages.small_input_refs(ds)
    if input_refs:
        import ray

        outs = [
            t
            for t in ray.get(stages.block_map_refs(input_refs, add_hash))
            if t is not None and len(t)
        ]
        if outs:
            # keep_first is group-union-safe (drop_duplicates keyed on the
            # text itself, same text -> same h -> same bucket): one
            # vectorized call per bucket, not one per hash group
            out = stages.group_fanout_table(
                pa.concat_tables(outs, promote_options="default"),
                "h",
                keep_first,
                batch_format="pandas",
                whole_bucket="exact_dedup.keep_first",
            )
            if out is not None:
                return out
    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return stages.gated_groupby(
        ds, hashed, "h", keep_first, batch_format="pandas", whole_bucket="exact_dedup.keep_first"
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


_PAIR_TRIU: dict[int, tuple] = {}


def _pair_idx(k: int):
    got = _PAIR_TRIU.get(k)
    if got is None:
        got = np.triu_indices(k, k=1)
        if k <= 2048:
            _PAIR_TRIU[k] = got
    return got


def _n_buckets_for(n_rows: int) -> int:
    """Shuffle-group count scaled to input size: ~4k keys per bucket keeps
    groups big enough to amortize Ray's per-group scheduling cost while
    bounding the largest group at 100 TB pair volumes (a fixed 199 buckets
    would mean giant groups at scale)."""
    return int(min(100_003, max(67, n_rows // 4096 + 67)))


def _dedup_pairs(pairs_ds, n_buckets: int = 199, hint=None):
    """Global (id_a, id_b) dedup via hash buckets — one vectorized
    drop_duplicates per bucket instead of a map_groups group per pair.

    ``hint`` is the known-bounded upstream for the small-input fan-out
    gate (stages.small_group_fanout); None skips the pre-screen and
    gates on the materialized pair table directly."""

    def tag(t: pa.Table) -> pa.Table:
        a = t["id_a"].cast(pa.string()).to_pylist()
        b = t["id_b"].cast(pa.string()).to_pylist()
        pb = [zlib.crc32(f"{x}|{y}".encode()) % n_buckets for x, y in zip(a, b)]
        return t.append_column("pb", pa.array(pb, pa.int32()))

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["pb"])

    tagged = pairs_ds.map_batches(tag, batch_format="pyarrow")
    return stages.gated_groupby(hint, tagged, "pb", drop, batch_format="pandas")



def minhash_lsh_pairs(ds, col: str = "text", jaccard_threshold: float = 0.8):
    """Near-duplicate pairs via LSH banding, verified by the estimated
    Jaccard (fraction of matching minhashes).

    Shuffle hygiene: band rows carry ONLY (band, bhash, doc_id) — the
    64-value signature is NOT duplicated x16 through the banding shuffle.
    Candidate pairs (deduped across bands) fetch both signatures via the
    reduce-side blob attach, and the verify compares them there.

    Returns (id_a, id_b, jaccard_x100) with id_a < id_b, deduplicated.
    """
    id_type = ds.schema().base_schema.field("doc_id").type
    # driver-bounded corpora run the sig + band stages as plain-task waves
    # (each Ray Data execution carries a 1-2.5 s fixed floor that dwarfs
    # the ~4 CPU-s of minhash work at test scales); at 100 TB the metadata
    # pre-screen fails and the streaming chain below runs unchanged
    input_refs, ds = stages.small_input_refs(ds)

    def sig_rows(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        memo: dict = {}
        blobs = [
            _minhash(_shingles(s, _memo=memo)).astype(np.int64).tobytes()
            for s in texts
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "sig": pa.array(blobs, pa.large_binary()),
            }
        )

    # consumed by the banding pass AND both attach passes: pin the (small)
    # signature table once instead of recomputing the minhashes 3x
    if input_refs:
        import ray
        import ray.data as rd

        # a block_map_refs ref resolves to None when every block assigned
        # to its task was a schema-less empty bundle; from_arrow_refs
        # crashes on None blocks, so gather (the gate already bounds the
        # input to the driver) and keep the typed survivors
        sig_tbls = [
            t for t in ray.get(stages.block_map_refs(input_refs, sig_rows)) if t is not None
        ]
        if not sig_tbls:
            sig_tbls = [pa.table({"doc_id": pa.array([], id_type), "sig": pa.array([], pa.large_binary())})]
        sigs_ds = rd.from_arrow(sig_tbls).materialize()
    else:
        sigs_ds = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()
    nb = _n_buckets_for(sigs_ds.count())

    def band_rows(t: pa.Table) -> pa.Table:
        """One row per (doc, band) carrying the EXACT band key (the 4
        signature values, dash-joined) — not a hash of it, so a band
        match in the shuffle is true tuple equality and the SQL oracle's
        band join reproduces the identical candidate set.  The gb column
        hash-buckets the LSH buckets: each Ray group handles many of
        them vectorized (per-bucket map_groups groups cost milliseconds
        of scheduling each at 16 x n_docs band rows)."""
        ids = t["doc_id"].to_pylist()
        b_band, b_key, b_gb, b_id = [], [], [], []
        for did, blob in zip(ids, t["sig"].to_pylist()):
            sig = np.frombuffer(blob, dtype=np.int64)
            for b in range(_BANDS):
                chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
                key = "-".join(map(str, chunk.tolist()))
                b_band.append(b)
                b_key.append(key)
                b_gb.append((b * 1_000_003 + zlib.crc32(key.encode())) % nb)
                b_id.append(did)
        return pa.table(
            {
                "band": pa.array(b_band, pa.int32()),
                "bkey": pa.array(b_key, pa.string()),
                "gb": pa.array(b_gb, pa.int32()),
                "doc_id": pa.array(b_id, id_type),
            }
        )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        ids_all = g["doc_id"].to_numpy()
        for _, idx in g.groupby(["band", "bkey"]).indices.items():
            ids = np.unique(ids_all[idx])
            if len(ids) < 2:
                continue
            ii, jj = _pair_idx(len(ids))
            out_a.extend(ids[ii].tolist())
            out_b.extend(ids[jj].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).drop_duplicates()

    if input_refs:
        import ray

        outs = [
            t
            for t in ray.get(
                stages.block_map_refs(list(sigs_ds.to_arrow_refs()), band_rows)
            )
            if t is not None and len(t)
        ]
        cand_tbl = (
            stages.group_fanout_table(
                pa.concat_tables(outs, promote_options="default"),
                "gb",
                band_pairs,
                batch_format="pandas",
                gather=True,
            )
            if outs
            else None
        )
    else:
        banded = sigs_ds.map_batches(band_rows, batch_format="pyarrow")
        bp = stages.gated_groupby(
            sigs_ds, banded, "gb", band_pairs, batch_format="pandas"
        )
        cand = _dedup_pairs(bp, n_buckets=nb, hint=sigs_ds)
        withAB = _attach_pair_blobs(cand, sigs_ds, id_type, blob_col="sig",
                                    n_buckets=nb)

    out_schema = pa.schema(
        [("id_a", id_type), ("id_b", id_type), ("jaccard_x100", pa.int64())]
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "blob_a" not in t.column_names:
            return out_schema.empty_table()
        keep, out_j = [], []
        for i, (ba, bb) in enumerate(zip(t["blob_a"].to_pylist(), t["blob_b"].to_pylist())):
            if ba is None or bb is None:
                continue
            A = np.frombuffer(ba, dtype=np.int64)
            B = np.frombuffer(bb, dtype=np.int64)
            j = float((A == B).mean())
            if j >= jaccard_threshold:
                keep.append(i)
                # half-away rounding to match SQL round() (banker's
                # round() would diverge on exact .5 percentages)
                out_j.append(int(np.floor(100 * j + 0.5)))
        sub = t.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "id_a": sub["id_a"].combine_chunks(),
                "id_b": sub["id_b"].combine_chunks(),
                "jaccard_x100": pa.array(out_j, pa.int64()),
            },
            schema=out_schema,
        )

    if input_refs:
        import ray.data as rd

        if cand_tbl is None:  # no candidate bands anywhere
            return rd.from_arrow(out_schema.empty_table())
        return _verify_pairs_fast(cand_tbl, sigs_ds, "sig", verify, out_schema)
    return withAB.map_batches(verify, batch_format="pyarrow")


_SIMHASH_SHIFTS = np.arange(64, dtype=np.uint64)


def minhash_lsh_sql(jaccard_threshold: float = 0.8, k: int = 5) -> str:
    """DuckDB oracle recomputing minhash_lsh_pairs EXACTLY: identical
    shingle hashes (md5_number_lower % 2^32 of the whitespace-normalized
    char k-grams), identical permutations ((a*h+b) wrapped mod 2^64 like
    numpy uint64, then mod 2^61-1 — the _A/_B constants are inlined
    below), true band-tuple equality for candidates (the engine ships
    the exact band key, not a hash), and the same signature-match
    fraction threshold and rounding."""
    perm_rows = ",".join(
        f"({j},{int(_A[j])},{int(_B[j])})" for j in range(_NPERM)
    )
    return f"""
        WITH norm AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s0
          FROM documents
        ), padded AS (
          SELECT doc_id,
                 CASE WHEN length(s0) < {k} THEN rpad(s0, {k}, ' ')
                      ELSE s0 END AS s
          FROM norm
        ), sh AS (
          SELECT DISTINCT doc_id,
                 md5_number_lower(substr(s, i, {k})) % 4294967296 AS h
          FROM padded CROSS JOIN (
            SELECT unnest(generate_series(
              1, (SELECT CAST(MAX(length(s)) AS INT) FROM padded))) AS i) t
          WHERE i <= length(s) - {k - 1}
        ), perm(j, a, b) AS (VALUES {perm_rows}),
        sig AS (
          SELECT doc_id, j,
                 MIN(((CAST(a AS HUGEINT) * h + b)
                      % 18446744073709551616) % 2305843009213693951) AS mh
          FROM sh CROSS JOIN perm GROUP BY doc_id, j
        ), bands AS (
          SELECT doc_id, j // {_ROWS_PER_BAND} AS band,
                 list(mh ORDER BY j) AS bkey
          FROM sig GROUP BY doc_id, j // {_ROWS_PER_BAND}
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ), matched AS (
          SELECT c.id_a, c.id_b,
                 SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS m
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.id_a
          JOIN sig sb ON sb.doc_id = c.id_b AND sb.j = sa.j
          GROUP BY c.id_a, c.id_b
        )
        SELECT id_a, id_b,
               CAST(floor(100.0 * m / {_NPERM} + 0.5) AS BIGINT) AS jaccard_x100
        FROM matched
        WHERE CAST(m AS DOUBLE) / {_NPERM} >= {jaccard_threshold}
    """


def simhash64(text: str, _memo: dict | None = None) -> int:
    """64-bit SimHash over word features.

    Word bits are ``md5_number_lower(word)`` — the LAST 8 md5 digest bytes
    little-endian — exactly DuckDB's function of that name, so the SQL
    oracle recomputes the identical signature.  Pass a dict as ``_memo``
    to reuse per-word bit vectors across calls (vocabulary is tiny
    relative to corpus size)."""
    acc = np.zeros(64, dtype=np.int64)
    memo = _memo if _memo is not None else {}
    for w in (text or "").lower().split():
        steps = memo.get(w)
        if steps is None:
            h = np.uint64(
                int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[8:], "little")
            )
            steps = (((h >> _SIMHASH_SHIFTS) & np.uint64(1)).astype(np.int64) * 2) - 1
            memo[w] = steps
        acc += steps
    out = 0
    for i in np.flatnonzero(acc > 0):
        out |= 1 << int(i)
    return out


def simhash_pairs(ds, col: str = "text", max_hamming: int = 3):
    """Near-dup pairs with SimHash hamming distance <= max_hamming, found
    via 4x16-bit block LSH (a pair within distance 3 matches >= 1 block)."""

    def rows(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        ids = t["doc_id"].to_pylist()
        blk, key, did, sh = [], [], [], []
        memo: dict = {}
        for d, s in zip(ids, texts):
            h = simhash64(s, _memo=memo)
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

    rowed = ds.map_batches(rows, batch_format="pyarrow")
    cand = stages.gated_groupby(ds, rowed, ["blk", "key"], pairs, batch_format="pandas")
    head1 = lambda g: g.head(1)  # noqa: E731
    return stages.gated_groupby(
        ds, cand, ["id_a", "id_b"], head1, batch_format="pandas"
    )


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """DuckDB oracle recomputing the EXACT SimHash pair set: word bits are
    md5_number_lower (matching simhash64), the signature is the per-bit
    sign of the occurrence-weighted sum, and the 4x16-bit block LSH in
    simhash_pairs is exhaustive for hamming <= 3 (pigeonhole: 3 flipped
    bits leave >= 1 of 4 blocks intact), so an all-pairs hamming join is
    the exact same set."""
    return f"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
  FROM documents
), ww AS (
  SELECT doc_id, md5_number_lower(w) AS h FROM words WHERE w <> ''
), bits AS (
  SELECT doc_id, i.i AS i,
         SUM(CASE WHEN (h >> i.i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM ww CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i
  GROUP BY doc_id, i.i
), sh AS (
  SELECT doc_id,
         SUM(CASE WHEN acc > 0 THEN (1::UBIGINT << i) ELSE 0::UBIGINT END)::UBIGINT AS h
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.h, b.h))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= {max_hamming}
"""


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

    rowed = ds.map_batches(rows, batch_format="pyarrow")
    return stages.gated_groupby(ds, rowed, "pair", pairs, batch_format="pandas")


_EMB_BANDS = 4
_EMB_BITS = 4


def _hyperplanes(dim: int) -> np.ndarray:
    """Deterministic (dim, 16) hyperplane matrix — rng(1234) standard
    normals, identical constants inlined in embedding_lsh_sql so the
    DuckDB oracle reproduces the exact same sign bits."""
    return np.random.default_rng(1234).standard_normal(
        (dim, _EMB_BANDS * _EMB_BITS)
    )


def embedding_neardup_pairs(ds, threshold: float = 0.4):
    """Embedding cosine near-dup pairs (vec_id_a < vec_id_b, sim rounded).

    Hyperplane-LSH bucketed scan — the SCALE path (recall < 1 by design;
    ~99.7% at sim 0.98 with 4 bands of 4 bits).  Bit j is the sign of the
    RAW embedding's dot with plane j (sign is normalization-invariant),
    band keys pack 4 bits MSB-first, and only same-(band, key) vectors
    are compared — all DuckDB-expressible, so embedding_lsh_sql is an
    EXACT oracle of this algorithm (candidate set included), like the
    minhash_lsh_sql twin.
    """

    def rows(t: pa.Table) -> pa.Table:
        embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "key": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "nvec": pa.array([], pa.list_(pa.float64())),
                }
            )
        norm = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-12)
        bits = (embs @ _hyperplanes(embs.shape[1])) > 0
        weights = 1 << np.arange(_EMB_BITS - 1, -1, -1)  # MSB-first
        keys = (bits.reshape(n, _EMB_BANDS, _EMB_BITS) @ weights).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(_EMB_BANDS, dtype=np.int32), n), pa.int32()
                ),
                "key": pa.array(keys.ravel(), pa.int64()),
                "vec_id": pa.array(np.repeat(ids, _EMB_BANDS), pa.int64()),
                "nvec": pa.array(
                    np.repeat(norm, _EMB_BANDS, axis=0).tolist(),
                    pa.list_(pa.float64()),
                ),
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
                "id_a": ids[ii],
                "id_b": ids[jj],
                "sim_x1000": np.floor(sims[ii, jj] * 1000 + 0.5).astype(np.int64),
            }
        )

    rowed = ds.map_batches(rows, batch_format="pyarrow")
    cand = stages.gated_groupby(
        ds, rowed, ["band", "key"], pairs, batch_format="pandas"
    )
    # cross-band dedup: sim_x1000 is identical for every band's copy of a
    # pair (same two float64 vectors -> same BLAS dot), so keeping an
    # arbitrary first per (id_a, id_b) bucket is deterministic
    deduped = _dedup_pairs(cand, n_buckets=67, hint=ds)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["vec_id_a", "vec_id_b", "sim_x1000"])

    return deduped.map_batches(rename, batch_format="pyarrow")


def embedding_lsh_sql(threshold: float = 0.4, dim: int = 64) -> str:
    """DuckDB oracle recomputing embedding_neardup_pairs EXACTLY: the
    same rng(1234) hyperplane constants (inlined), the same sign bits
    (raw-embedding dot product cast to DOUBLE), the same MSB-first 4-bit
    band keys, true band-key equality for candidates, and the same
    cosine threshold + half-away rounding as embedding_neardup_sql."""
    planes = _hyperplanes(dim)
    rows = ",".join(
        "({}, CAST([{}] AS DOUBLE[]))".format(
            j, ",".join(repr(float(v)) for v in planes[:, j])
        )
        for j in range(_EMB_BANDS * _EMB_BITS)
    )
    return f"""
        WITH planes(j, p) AS (VALUES {rows}),
        bits AS (
          SELECT vec_id, j,
                 CASE WHEN list_dot_product(
                        CAST(embedding AS DOUBLE[]), p) > 0
                      THEN 1 ELSE 0 END AS bit
          FROM embeddings CROSS JOIN planes
        ), keys AS (
          SELECT vec_id, j // {_EMB_BITS} AS band,
                 SUM(bit * (1 << ({_EMB_BITS - 1} - (j % {_EMB_BITS})))) AS key
          FROM bits GROUP BY vec_id, j // {_EMB_BITS}
        ), cand AS (
          SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
          FROM keys a JOIN keys b
            ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
        )
        SELECT c.ia AS vec_id_a, c.ib AS vec_id_b,
               CAST(floor(list_cosine_similarity(ea.embedding, eb.embedding)
                          * 1000 + 0.5) AS BIGINT) AS sim_x1000
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.ia
        JOIN embeddings eb ON eb.vec_id = c.ib
        WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}
    """


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


def _gram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Sorted distinct 64-bit blake2b hashes of word n-grams.

    64-bit (not crc32): documents with 10^4-10^5 distinct grams would see
    birthday collisions at 32 bits, shifting the computed Jaccard off the
    string-based SQL oracle on threshold-boundary pairs."""
    import hashlib

    hs = {
        int.from_bytes(
            hashlib.blake2b(" ".join(g).encode("utf-8"), digest_size=8).digest(),
            "big",
            signed=True,
        )
        for g in _word_ngrams(text, n)
    }
    return np.array(sorted(hs), dtype=np.int64)


# Broadcast the per-doc blob table through the object store when it is
# smaller than this (materialized by workers, read zero-copy by every
# attach task); above the limit, the bucketed shuffle join below is the
# 100 TB path.  Same hybrid rule as the resolve finalize join.
_BCAST_BLOB_LIMIT = 256 << 20
_BCAST_BLOB_CACHE: dict = {}

# hot-gram document-frequency sample size for the AllPairs prefix filter
# (module-level so tests can shrink it to exercise the random-sample path)
_FREQ_SAMPLE = 20000


def _attach_verify_task(pairs_tbl: pa.Table, blob_tbl: pa.Table, verify_fn, out_schema):
    """One plain-task slice of the gated verify tail: dict-lookup both
    blobs, then the pipeline's own verify kernel."""
    ids = blob_tbl["doc_id"].to_pylist()
    bl = dict(zip(ids, blob_tbl[blob_tbl.column_names[1]].to_pylist()))
    t = pairs_tbl.append_column(
        "blob_a",
        pa.array([bl.get(x) for x in pairs_tbl["id_a"].to_pylist()], pa.large_binary()),
    )
    t = t.append_column(
        "blob_b",
        pa.array([bl.get(x) for x in pairs_tbl["id_b"].to_pylist()], pa.large_binary()),
    )
    out = verify_fn(t)
    return out if out is not None else out_schema.empty_table()


_attach_verify_remote = None


def _verify_pairs_fast(cand_tbl, blobs_ds, blob_col: str, verify_fn, out_schema):
    """Driver-bounded tail of the pair pipelines: global (id_a, id_b) dedup
    on the driver (the candidate table is already there from the fan-out
    gather), then blob attach + verify as ONE plain-task wave with the
    blob table shipped once via the object store — replaces the
    _dedup_pairs / _attach_pair_blobs / verify map_batches chain, which
    costs three Ray Data execution floors in the gated regime.  Semantics
    are identical: same drop_duplicates subset, same blob values, same
    verify kernel; the streaming chain stays the scale path."""
    import ray
    import ray.data as rd

    df = cand_tbl.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
    if not len(df):
        return rd.from_arrow(out_schema.empty_table())
    pairs = pa.Table.from_pandas(df[["id_a", "id_b"]], preserve_index=False)
    blob_tbl = pa.concat_tables(
        [
            t.select(["doc_id", blob_col])
            for t in ray.get(blobs_ds.to_arrow_refs())
            if t is not None and len(t)
        ],
        promote_options="default",
    )
    blob_ref = ray.put(blob_tbl)
    global _attach_verify_remote
    if _attach_verify_remote is None:
        _attach_verify_remote = ray.remote(num_cpus=1)(_attach_verify_task)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 0) or 0) or 8
    except Exception:
        ncpu = 8
    k = max(1, min(ncpu, len(pairs)))
    step = -(-len(pairs) // k)
    refs = [
        _attach_verify_remote.remote(
            pairs.slice(i, step).combine_chunks(), blob_ref, verify_fn, out_schema
        )
        for i in range(0, len(pairs), step)
    ]
    return rd.from_arrow_refs(refs)


def _slim_blobs(blob_ds, blob_col: str):
    """Materialized (k, blob) broadcast payload for the blob side."""

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["doc_id"].cast(pa.string()).combine_chunks(),
                "blob": t[blob_col].cast(pa.large_binary()).combine_chunks(),
            }
        )

    return blob_ds.map_batches(slim, batch_format="pyarrow").materialize()


def _attach_pair_blobs_broadcast(cand, mat, id_type, blob_col: str):
    refs = list(mat.to_arrow_refs())
    cache_key = tuple(r.hex() for r in refs)
    res_schema = pa.schema(
        [("id_a", id_type), ("id_b", id_type),
         ("blob_a", pa.large_binary()), ("blob_b", pa.large_binary())]
    )

    def attach(t: pa.Table) -> pa.Table:
        import ray

        d = _BCAST_BLOB_CACHE.get(cache_key)
        if d is None:
            parts = [p for p in ray.get(list(refs)) if len(p)]
            d = {}
            for p in parts:
                ks = p["k"].to_pylist()
                bs = p["blob"].to_pylist()
                d.update(zip(ks, bs))
            # bounded 2-entry FIFO: two interleaved attach stages (e.g.
            # grams + text blobs) in one worker must not evict each other
            # every batch — that rebuild is a ~256 MB-per-batch cliff
            while len(_BCAST_BLOB_CACHE) >= 2:
                _BCAST_BLOB_CACHE.pop(next(iter(_BCAST_BLOB_CACHE)))
            _BCAST_BLOB_CACHE[cache_key] = d
        ka = t["id_a"].cast(pa.string()).to_pylist()
        kb = t["id_b"].cast(pa.string()).to_pylist()
        return pa.table(
            {
                "id_a": t["id_a"].cast(id_type).combine_chunks(),
                "id_b": t["id_b"].cast(id_type).combine_chunks(),
                "blob_a": pa.array([d.get(k) for k in ka], pa.large_binary()),
                "blob_b": pa.array([d.get(k) for k in kb], pa.large_binary()),
            },
            schema=res_schema,
        )

    attach.__name__ = f"attach_{blob_col}_bcast"
    return cand.map_batches(attach, batch_format="pyarrow")


def _attach_pair_blobs(cand, blob_ds, id_type, blob_col: str = "grams",
                       n_buckets: int = 199):
    """Attach ``blob_ds``'s per-doc blob to candidate pairs on BOTH ids.

    Small blob side (by metadata bytes): object-store broadcast — the
    pairs never enter an all-to-all.  Large side, the scheme below:

    Single-union scheme: the blob table ships through exactly ONE shuffle
    (keyed by doc-id hash bucket) where each pair's two HALF rows pick up
    their side's blob; a second, pair-keyed shuffle — pair-sized, tiny —
    recombines the halves.  (The round-2 version ran two sequential attach
    joins and shipped the whole blob table through both.)  Buckets hold
    hundreds of keys each and join vectorized with a pandas merge —
    per-key map_groups groups would pay milliseconds of scheduling per
    doc.  cand: (id_a, id_b); blob_ds: (doc_id, <blob_col>).  Returns
    (id_a, id_b, blob_a, blob_b)."""
    # both call sites pass MATERIALIZED blob tables, so size_bytes() is a
    # free metadata lookup (a lazy ds would execute here — don't pass one).
    # Two-stage gate: the table's bytes only pre-screen; the binding gate
    # is the slim (k, blob) payload each worker actually holds.
    try:
        blob_bytes = blob_ds.size_bytes() or 0
    except Exception:
        blob_bytes = _BCAST_BLOB_LIMIT + 1
    if blob_bytes <= 2 * _BCAST_BLOB_LIMIT:
        mat = _slim_blobs(blob_ds, blob_col)
        if (mat.size_bytes() or 0) <= _BCAST_BLOB_LIMIT:
            return _attach_pair_blobs_broadcast(cand, mat, id_type, blob_col)
        # slim payload over the limit: fall through to the shuffle join

    def bucket_of_str(vals: list[str]) -> pa.Array:
        return pa.array(
            [zlib.crc32(v.encode()) % n_buckets for v in vals], pa.int32()
        )

    half_schema = pa.schema(
        [("b", pa.int32()), ("is_doc", pa.bool_()), ("k", pa.string()),
         ("doc_blob", pa.large_binary()), ("a_side", pa.bool_()),
         ("id_a", id_type), ("id_b", id_type)]
    )

    def tag_pairs(t: pa.Table) -> pa.Table:
        n_ = len(t)
        ka = t["id_a"].cast(pa.string()).to_pylist()
        kb = t["id_b"].cast(pa.string()).to_pylist()
        ca = t["id_a"].cast(id_type).combine_chunks()
        cb = t["id_b"].cast(id_type).combine_chunks()
        return pa.table(
            {
                "b": bucket_of_str(ka + kb),
                "is_doc": pa.array([False] * (2 * n_), pa.bool_()),
                "k": pa.array(ka + kb, pa.string()),
                "doc_blob": pa.array([None] * (2 * n_), pa.large_binary()),
                "a_side": pa.array([True] * n_ + [False] * n_, pa.bool_()),
                "id_a": pa.concat_arrays([ca, ca]),
                "id_b": pa.concat_arrays([cb, cb]),
            },
            schema=half_schema,
        )

    def tag_docs(t: pa.Table) -> pa.Table:
        n_ = len(t)
        ks = t["doc_id"].cast(pa.string()).to_pylist()
        return pa.table(
            {
                "b": bucket_of_str(ks),
                "is_doc": pa.array([True] * n_, pa.bool_()),
                "k": pa.array(ks, pa.string()),
                "doc_blob": t[blob_col].cast(pa.large_binary()).combine_chunks(),
                "a_side": pa.array([False] * n_, pa.bool_()),
                "id_a": pa.array([None] * n_, id_type),
                "id_b": pa.array([None] * n_, id_type),
            },
            schema=half_schema,
        )

    half_out_schema = pa.schema(
        [("pb", pa.int32()), ("a_side", pa.bool_()),
         ("id_a", id_type), ("id_b", id_type), ("blob", pa.large_binary())]
    )

    def pick_blob(g: pa.Table) -> pa.Table:
        is_doc = g["is_doc"].to_numpy(zero_copy_only=False)
        pair_idx = np.flatnonzero(~is_doc)
        if len(pair_idx) == 0:
            return half_out_schema.empty_table()
        doc_idx = np.flatnonzero(is_doc)
        prs = g.take(pa.array(pair_idx, pa.int64())).to_pandas()
        docs = g.take(pa.array(doc_idx, pa.int64())).to_pandas()
        merged = prs.merge(
            docs[["k", "doc_blob"]].rename(columns={"doc_blob": "blob"}),
            on="k", how="left",
        )
        pb = [
            zlib.crc32(f"{a}|{b}".encode()) % n_buckets
            for a, b in zip(merged["id_a"], merged["id_b"])
        ]
        return pa.table(
            {
                "pb": pa.array(pb, pa.int32()),
                "a_side": pa.array(merged["a_side"].tolist(), pa.bool_()),
                "id_a": pa.array(merged["id_a"].tolist(), id_type),
                "id_b": pa.array(merged["id_b"].tolist(), id_type),
                "blob": pa.array(
                    [v if isinstance(v, (bytes, bytearray)) else None
                     for v in merged["blob"]],
                    pa.large_binary(),
                ),
            },
            schema=half_out_schema,
        )

    pick_blob.__name__ = f"attach_{blob_col}"

    res_schema = pa.schema(
        [("id_a", id_type), ("id_b", id_type),
         ("blob_a", pa.large_binary()), ("blob_b", pa.large_binary())]
    )

    def recombine(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        a = df[df["a_side"]][["id_a", "id_b", "blob"]].rename(columns={"blob": "blob_a"})
        b = df[~df["a_side"]][["id_a", "id_b", "blob"]].rename(columns={"blob": "blob_b"})
        m = a.merge(b, on=["id_a", "id_b"], how="outer")

        def col(vals):
            return pa.array(
                [v if isinstance(v, (bytes, bytearray)) else None for v in vals],
                pa.large_binary(),
            )

        return pa.table(
            {
                "id_a": pa.array(m["id_a"].tolist(), id_type),
                "id_b": pa.array(m["id_b"].tolist(), id_type),
                "blob_a": col(m["blob_a"]),
                "blob_b": col(m["blob_b"]),
            },
            schema=res_schema,
        )

    recombine.__name__ = "recombine_pair_blobs"

    return (
        cand.map_batches(tag_pairs, batch_format="pyarrow")
        .union(blob_ds.map_batches(tag_docs, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(pick_blob, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(recombine, batch_format="pyarrow")
    )


def ngram_jaccard_pairs(ds, col: str = "text", n: int = 3, threshold: float = 0.5):
    """EXACT word-n-gram Jaccard similarity self-join via prefix filtering
    (the AllPairs/PPJoin family, Bayardo et al. WWW'07 / Xiao et al.
    ICDE'08 — public literature).

    Guarantee (unlike the MinHash path): every pair with true Jaccard >=
    threshold is emitted.  Pipeline shape:

      grams      map_batches: doc -> sorted distinct n-gram hashes (blob)
      prefix     each doc emits its first p = g - ceil(t*g) + 1 grams as
                 (gram, doc_id, g) rows — any qualifying pair MUST share a
                 prefix gram under a fixed global gram order (hash order
                 here; at 100 TB use a sampled document-frequency order,
                 broadcast like the tiling histogram, so hot grams don't
                 form giant candidate groups)
      candidates groupby(gram): pairs passing the size filter
                 ceil(t * max(ga, gb)) <= min(ga, gb), deduped
      verify     two sort-shuffle reduce-side joins attach each side's
                 gram blob (no full-text shuffle anywhere), then exact
                 |A∩B| / |A∪B|

    Returns (id_a, id_b, jaccard_x1000), id_a < id_b.
    """

    def gram_rows(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        blobs = [_gram_hashes(s, n).tobytes() for s in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "grams": pa.array(blobs, pa.large_binary()),
            }
        )

    # consumed by the prefix pass AND both attach passes: pin the gram
    # table once instead of recomputing the n-gram hashing 3x.  Driver-
    # bounded corpora run the gram + prefix stages as plain-task waves
    # (per-execution fixed floors dominate at test scales — see
    # stages.small_input_refs); at 100 TB the gate pre-screen fails and
    # the streaming chain runs unchanged.
    input_refs, ds = stages.small_input_refs(ds)
    grams_schema = pa.schema(
        [("doc_id", ds.schema().base_schema.field("doc_id").type), ("grams", pa.large_binary())]
    )
    if input_refs:
        import ray
        import ray.data as rd

        # gather + filter: a block_map_refs ref resolves to None when its
        # task's every block was a schema-less empty bundle, and a None
        # block crashes from_arrow_refs (input is driver-bounded here)
        gram_tbls = [
            t for t in ray.get(stages.block_map_refs(input_refs, gram_rows)) if t is not None
        ] or [grams_schema.empty_table()]
        grams_ds = rd.from_arrow(gram_tbls).materialize()
    else:
        grams_ds = ds.map_batches(gram_rows, batch_format="pyarrow").materialize()
    nb = _n_buckets_for(grams_ds.count())

    # prefix ORDER: any consistent global order is exact; ordering hot
    # (document-frequent) grams LAST keeps them out of prefixes, so the
    # candidate groups stay small (the AllPairs df-ordering, approximated
    # with a sampled frequency table broadcast to all tasks — the same
    # sample-then-broadcast pattern as the tiling histogram).  The sample
    # is a seeded RANDOM one, not head-of-dataset: on a sorted/clustered
    # corpus the first rows misestimate document frequency and candidate
    # groups blow up (same defect class fixed in similarity.ivf_topk).
    import collections

    import ray as _ray

    n_total = grams_ds.count()
    if n_total <= _FREQ_SAMPLE:
        sample_rows = grams_ds.take_all()
    else:
        frac = min(1.0, 1.5 * _FREQ_SAMPLE / n_total)
        sample_rows = (
            grams_ds.random_sample(frac, seed=11).limit(_FREQ_SAMPLE).take_all()
        )
        if not sample_rows:  # pathological sampling miss: fall back
            sample_rows = grams_ds.limit(_FREQ_SAMPLE).take_all()
    freq: collections.Counter = collections.Counter()
    n_sampled = 0
    for row in sample_rows:
        n_sampled += 1
        freq.update(np.frombuffer(row["grams"], dtype=np.int64).tolist())
    hot_cut = max(8, int(0.01 * max(1, n_sampled)))
    hot_ref = _ray.put(frozenset(h for h, c in freq.items() if c >= hot_cut))

    def prefix_rows(t: pa.Table) -> pa.Table:
        hot = _ray.get(hot_ref)
        ids = t["doc_id"].to_pylist()
        out_g, out_id, out_sz = [], [], []
        for did, blob in zip(ids, t["grams"].to_pylist()):
            hs = np.frombuffer(blob, dtype=np.int64)
            g = len(hs)
            if g == 0:
                continue
            p = g - int(np.ceil(threshold * g)) + 1
            # rarest-first order: cold grams (by hash) before hot grams
            order = sorted(hs.tolist(), key=lambda h: (h in hot, h))
            for h in order[:p]:
                out_g.append(int(h))
                out_id.append(did)
                out_sz.append(g)
        return pa.table(
            {
                "gram": pa.array(out_g, pa.int64()),
                "doc_id": pa.array(out_id),
                "gsize": pa.array(out_sz, pa.int64()),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        gb = (t["gram"].to_numpy() % nb).astype(np.int32)
        return t.append_column("gb", pa.array(gb, pa.int32()))

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        # many gram groups per Ray group, each vectorized: size filter is
        # J >= t  =>  |A∩B| >= t*max  =>  min(size) >= t*max(size)
        out_a, out_b = [], []
        ids_all = g["doc_id"].to_numpy()
        sz_all = g["gsize"].to_numpy()
        for _, idx in g.groupby("gram").indices.items():
            ids, first = np.unique(ids_all[idx], return_index=True)
            if len(ids) < 2:
                continue
            sz = sz_all[idx][first]
            ii, jj = _pair_idx(len(ids))
            ok = np.ceil(threshold * np.maximum(sz[ii], sz[jj])) <= np.minimum(sz[ii], sz[jj])
            out_a.extend(ids[ii[ok]].tolist())
            out_b.extend(ids[jj[ok]].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).drop_duplicates()

    if input_refs:
        import ray.data as rd

        outs = [
            t
            for t in _ray.get(
                stages.block_map_refs(
                    list(grams_ds.to_arrow_refs()),
                    stages.Compose(prefix_rows, add_bucket),
                )
            )
            if t is not None and len(t)
        ]
        cand_tbl = (
            stages.group_fanout_table(
                pa.concat_tables(outs, promote_options="default"),
                "gb",
                candidates,
                batch_format="pandas",
                gather=True,
            )
            if outs
            else None
        )
    else:
        prefixed = grams_ds.map_batches(
            prefix_rows, batch_format="pyarrow"
        ).map_batches(add_bucket, batch_format="pyarrow")
        cands = stages.gated_groupby(
            grams_ds, prefixed, "gb", candidates, batch_format="pandas"
        )
        cand = _dedup_pairs(cands, n_buckets=nb, hint=grams_ds)
        withAB = _attach_pair_blobs(cand, grams_ds,
                                    grams_schema.field("doc_id").type,
                                    n_buckets=nb)

    id_type = grams_schema.field("doc_id").type
    out_schema = pa.schema(
        [("id_a", id_type), ("id_b", id_type), ("jaccard_x1000", pa.int64())]
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "blob_a" not in t.column_names:
            return out_schema.empty_table()
        keep, out_j = [], []
        blobs_a = t["blob_a"].to_pylist()
        blobs_b = t["blob_b"].to_pylist()
        for i, (ba, bb) in enumerate(zip(blobs_a, blobs_b)):
            if ba is None or bb is None:
                continue
            A = np.frombuffer(ba, dtype=np.int64)
            B = np.frombuffer(bb, dtype=np.int64)
            inter = len(np.intersect1d(A, B, assume_unique=True))
            union = len(A) + len(B) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                keep.append(i)
                out_j.append(int(np.floor(jac * 1000 + 0.5)))
        sub = t.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "id_a": sub["id_a"].combine_chunks(),
                "id_b": sub["id_b"].combine_chunks(),
                "jaccard_x1000": pa.array(out_j, pa.int64()),
            },
            schema=out_schema,
        )

    if input_refs:
        import ray.data as rd

        if cand_tbl is None:  # no prefix collisions anywhere
            return rd.from_arrow(out_schema.empty_table())
        return _verify_pairs_fast(cand_tbl, grams_ds, "grams", verify, out_schema)
    return withAB.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.5) -> str:
    """DuckDB oracle: exact all-pairs word-n-gram Jaccard (the engine uses
    prefix filtering to avoid the cross join; results are identical)."""
    return f"""
        WITH words AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w
          FROM documents
        ), grams AS (
          SELECT doc_id,
                 CASE WHEN len(w) = 0 THEN []::VARCHAR[]
                      WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
                      ELSE list_distinct([array_to_string(w[i:i+{n - 1}], ' ')
                                          for i in generate_series(1, len(w) - {n - 1})])
                 END AS g
          FROM words
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(floor(1000.0 * len(list_intersect(a.g, b.g))
                          / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) + 0.5) AS BIGINT)
                 AS jaccard_x1000
        FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        WHERE len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) > 0
          AND len(list_intersect(a.g, b.g)) >= {threshold} *
              (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
    """

def substring_dedup_pairs(ds, gram_len: int = 50, max_df: int = 100,
                          col: str = "text"):
    """Cross-document EXACT substring duplication (the training-data
    near-dup signal of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better"): pairs of documents sharing at least
    one exact ``gram_len``-character substring, with the count of
    distinct shared substrings.

    Shape: every doc emits its DISTINCT char n-grams as 128-bit md5 keys
    (16 bytes each — the text itself never shuffles), hash-bucketed;
    each bucket groups by gram vectorized and emits pairs for grams with
    document frequency in [2, max_df] (higher-df grams are boilerplate —
    the cap both matches the SQL oracle and bounds the quadratic pair
    blowup of hot grams at scale); a second, pair-keyed tiny shuffle
    counts distinct shared grams per pair.  The scale path for the gram
    stream is stride/winnowing anchors (stride > 1); stride 1 here keeps
    the oracle exact.  Output: (id_a, id_b, n_shared)."""

    # gram volume ~= chars per doc; bucket count scaled like the other
    # dedup shuffles (a tiny fixed count means giant groups at scale, a
    # huge one pays Ray's per-group scheduling ms — the #1 trap)
    nb = _n_buckets_for(ds.count() * 1024)

    def gram_rows(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        ids = t["doc_id"].to_pylist()
        out_b, out_g, out_d = [], [], []
        for d, s in zip(ids, texts):
            s = s or ""
            grams = {s[i : i + gram_len] for i in range(len(s) - gram_len + 1)}
            for g in grams:
                h = hashlib.md5(g.encode("utf-8")).digest()
                out_b.append((h[0] | (h[1] << 8)) % nb)
                out_g.append(h)
                out_d.append(d)
        return pa.table(
            {
                "gb": pa.array(out_b, pa.int32()),
                "gh": pa.array(out_g, pa.binary(16)),
                "doc_id": pa.array(out_d, t["doc_id"].type),
            }
        )

    def gram_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_pb = [], [], []
        ids_all = g["doc_id"].to_numpy()
        for _, idx in g.groupby("gh").indices.items():
            ids = np.unique(ids_all[idx])
            if not (2 <= len(ids) <= max_df):
                continue
            ii, jj = _pair_idx(len(ids))
            out_a.extend(ids[ii].tolist())
            out_b.extend(ids[jj].tolist())
        pb = [zlib.crc32(f"{a}|{b}".encode()) % 67 for a, b in zip(out_a, out_b)]
        return pd.DataFrame({"pb": pb, "id_a": out_a, "id_b": out_b})

    def count_shared(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["id_a", "id_b"], as_index=False).size()
        out = out.rename(columns={"size": "n_shared"})
        out["n_shared"] = out["n_shared"].astype("int64")
        return out[["id_a", "id_b", "n_shared"]]

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")
    gp = stages.gated_groupby(ds, grams, "gb", gram_pairs, batch_format="pandas")
    return stages.gated_groupby(ds, gp, "pb", count_shared, batch_format="pandas")


def substring_dedup_sql(gram_len: int = 50, max_df: int = 100) -> str:
    """Oracle joins on the substring itself (no hashing), so a 128-bit
    md5 collision in the engine would surface as a mismatch."""
    return f"""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, i, {gram_len}) AS gram
          FROM documents
          CROSS JOIN (
            SELECT unnest(generate_series(
              1, (SELECT CAST(max(length(text)) AS INT) FROM documents))) AS i
          ) s
          WHERE i <= length(text) - {gram_len - 1}
        ), ok AS (
          SELECT gram FROM g GROUP BY gram
          HAVING COUNT(*) BETWEEN 2 AND {max_df}
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        JOIN ok ON ok.gram = a.gram
        GROUP BY a.doc_id, b.doc_id
    """
