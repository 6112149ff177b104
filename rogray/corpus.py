"""Corpus-level text statistics: TF-IDF keyword extraction, global heavy
hitters, per-source distinct-vocabulary counts (exact and HyperLogLog).

All shuffle-side work is hash-bucketed (terms and doc ids) so no Ray group
is ever one term or one doc — the tiny-group map_groups scheduling trap.
The exact operators mirror their DuckDB oracles term for term: the
tokenizer is ``[a-z0-9]+`` over ``lower(text)`` (ASCII-only, so Python and
DuckDB ``lower`` agree on any input), scores use a single libm ``log``
double op identical to DuckDB's ``ln``, and ranking ties break by term.

Reference parity note: the reference engine has no corpus operators (it is
a geospatial overlay tool); these extend the engine for LLM-data-pipeline
use per the build brief.
"""

from __future__ import annotations

import hashlib
import math
import re
import zlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN = re.compile(r"[a-z0-9]+")


def _n_buckets_for(n_rows: int) -> int:
    return int(min(100_003, max(67, n_rows // 4096 + 67)))


def _tf_rows(t: pa.Table) -> pa.Table:
    """One row per distinct (doc, term) with its in-doc frequency."""
    ids = t["doc_id"].to_pylist()
    out_id, out_term, out_tf = [], [], []
    for did, s in zip(ids, t["text"].to_pylist()):
        for term, tf in Counter(_TOKEN.findall((s or "").lower())).items():
            out_id.append(did)
            out_term.append(term)
            out_tf.append(tf)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
        }
    )


def tfidf_top_terms(ds, k: int = 5):
    """Per-document top-k TF-IDF terms.

    Plan (two bucketed shuffles, nothing driver-side):
      1. map_batches -> distinct (doc_id, term, tf) rows (a document is one
         input row, so its term counts complete inside the batch);
      2. shuffle by term-hash bucket -> df per term is the bucket-local
         row count of that term (each doc contributes exactly one row per
         term), attached vectorized via a pandas transform;
      3. shuffle by doc-hash bucket -> per-doc score + rank, top-k kept.

    score = tf * ln(N / df) computed with one libm log and one double
    multiply, exactly as DuckDB evaluates ``tf * ln(CAST(N AS DOUBLE) /
    df)`` — so tfidf_sql() is an exact oracle (score_x1000 half-away
    rounded; rank ordered by the double score desc, then term asc).
    """
    n_docs = ds.count()
    tf_ds = ds.map_batches(_tf_rows, batch_format="pyarrow")
    nb = _n_buckets_for(n_docs * 64)

    def tag_term(t: pa.Table) -> pa.Table:
        hb = [zlib.crc32(s.encode()) % nb for s in t["term"].to_pylist()]
        return t.append_column("hb", pa.array(hb, pa.int32()))

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("term")["term"].transform("size").astype(np.int64)
        return g.drop(columns=["hb"])

    def tag_doc(t: pa.Table) -> pa.Table:
        db = (t["doc_id"].to_numpy() % nb).astype(np.int32)
        return t.append_column("db", pa.array(db, pa.int32()))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        idf_cache: dict[int, float] = {}

        def idf(df_val: int) -> float:
            got = idf_cache.get(df_val)
            if got is None:
                got = math.log(n_docs / df_val)
                idf_cache[df_val] = got
            return got

        g = g.copy()
        g["score"] = g["tf"].to_numpy() * np.array(
            [idf(int(d)) for d in g["df"]], dtype=np.float64
        )
        g = g.sort_values(["doc_id", "score", "term"], ascending=[True, False, True])
        g["rnk"] = g.groupby("doc_id").cumcount() + 1
        g = g[g["rnk"] <= k]
        g["score_x1000"] = np.floor(1000.0 * g["score"] + 0.5).astype(np.int64)
        return g[["doc_id", "term", "tf", "df", "score_x1000", "rnk"]]

    return (
        tf_ds.map_batches(tag_term, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(attach_df, batch_format="pandas")
        .map_batches(tag_doc, batch_format="pyarrow")
        .groupby("db")
        .map_groups(topk, batch_format="pandas")
    )


def tfidf_sql(k: int = 5) -> str:
    return (
        """
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        ), df AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 tf.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                            / df.df) AS score
          FROM tf JOIN df USING (term)
        ), ranked AS (
          SELECT doc_id, term, tf, df,
                 CAST(floor(1000 * score + 0.5) AS BIGINT) AS score_x1000,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
          FROM scored
        )
        SELECT doc_id, term, tf, df, score_x1000, rnk
        FROM ranked WHERE rnk <= """
        + str(k)
    )


def heavy_hitters(ds, k: int = 50):
    """Global top-k most frequent terms (exact, combiner-style).

    Per-batch partial Counters collapse each batch to its local (term,
    cnt) rows BEFORE the shuffle — the classic pre-aggregation that keeps
    the groupby exchange proportional to vocabulary, not token count.
    The final sort+limit runs on vocabulary-sized data.  Ties at the
    boundary break by term ASC, matching the oracle's ORDER BY.
    """

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(_TOKEN.findall((s or "").lower()))
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("term").sum("cnt")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["term", "n"])

    return (
        agg.map_batches(rename, batch_format="pyarrow")
        .sort(["n", "term"], descending=[True, False])
        .limit(k)
    )


def heavy_hitters_sql(k: int = 50) -> str:
    return (
        """
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        )
        SELECT term, COUNT(*) AS n FROM toks
        GROUP BY term ORDER BY n DESC, term LIMIT """
        + str(k)
    )


def source_distinct_terms(ds):
    """Exact distinct-vocabulary size per source.

    Distinct (source, term) pairs are bucketed by term hash so each Ray
    group counts a disjoint slice of the vocabulary; per-source partial
    counts then sum in a 20-row groupby.  No vocabulary-sized data ever
    reaches one worker or the driver.
    """
    nb = 211

    def rows(t: pa.Table) -> pa.Table:
        seen = set()
        for src, s in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for term in set(_TOKEN.findall((s or "").lower())):
                seen.add((src, term))
        srcs = [s for s, _ in seen]
        terms = [w for _, w in seen]
        hb = [zlib.crc32(w.encode()) % nb for w in terms]
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "term": pa.array(terms, pa.string()),
                "hb": pa.array(hb, pa.int32()),
            }
        )

    def count_slice(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("source")["term"].nunique()
        return pd.DataFrame(
            {"source": n.index.to_numpy(), "n_part": n.to_numpy().astype(np.int64)}
        )

    agg = (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(count_slice, batch_format="pandas")
        .groupby("source")
        .sum("n_part")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["source", "n_distinct_terms"])

    return agg.map_batches(rename, batch_format="pyarrow")


def source_distinct_terms_sql() -> str:
    return """
        WITH toks AS (
          SELECT source,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        )
        SELECT source, COUNT(DISTINCT term) AS n_distinct_terms
        FROM toks GROUP BY source
    """


def unigram_logprob(ds):
    """Per-document corpus-unigram log-probability — the KenLM-style
    quality filter shape: a first pass learns the corpus unigram
    distribution, a second scores every document under it.

    Fully shuffle-based (no broadcast of the vocabulary, which is
    corpus-sized at 100 TB): global term counts form in the term-hash
    shuffle the (doc, term, tf) rows already travel through, each row's
    contribution ``tf * ln(cnt / n_corpus_tokens)`` is rounded to an
    int64 x1000 RIGHT THERE — so the per-doc reduce is an integer sum,
    order-independent, and unigram_logprob_sql() matches bit for bit
    (double SUM order is unspecified in SQL, so summing doubles would
    not be a stable oracle).

    Emits (doc_id, n_tokens, logprob_x1000); zero-token documents have
    no unigram rows and are omitted, same as the SQL twin.
    """
    # corpus token total: one cheap vectorized pre-pass (the alternative
    # — deriving it from the term-count shuffle — needs a barrier)
    n_tok = int(
        ds.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            sum(
                                len(_TOKEN.findall((s or "").lower()))
                                for s in t["text"].to_pylist()
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("n")
    )
    tf_ds = ds.map_batches(_tf_rows, batch_format="pyarrow")
    nb = 211

    def tag_term(t: pa.Table) -> pa.Table:
        hb = [zlib.crc32(s.encode()) % nb for s in t["term"].to_pylist()]
        return t.append_column("hb", pa.array(hb, pa.int32()))

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        cnt = g.groupby("term")["tf"].transform("sum").to_numpy(np.int64)
        # math.log (libm), not np.log (SIMD, may differ in the last ulp
        # from DuckDB's ln) — evaluated once per distinct count
        uniq, inv = np.unique(cnt, return_inverse=True)
        lp_u = np.array([math.log(int(u) / n_tok) for u in uniq], np.float64)
        logp = lp_u[inv]
        c = np.floor(1000.0 * g["tf"].to_numpy(np.float64) * logp + 0.5)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "tf": g["tf"].to_numpy(np.int64),
                "c": c.astype(np.int64),
            }
        )

    def tag_doc(t: pa.Table) -> pa.Table:
        db = (t["doc_id"].to_numpy() % nb).astype(np.int32)
        return t.append_column("db", pa.array(db, pa.int32()))

    def reduce_doc(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id").agg(
            n_tokens=("tf", "sum"), logprob_x1000=("c", "sum")
        )
        return agg.reset_index().astype(
            {"doc_id": np.int64, "n_tokens": np.int64, "logprob_x1000": np.int64}
        )

    return (
        tf_ds.map_batches(tag_term, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(contrib, batch_format="pandas")
        .map_batches(tag_doc, batch_format="pyarrow")
        .groupby("db")
        .map_groups(reduce_doc, batch_format="pandas")
    )


def unigram_logprob_sql() -> str:
    return """
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        ), cnt AS (
          SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY term
        ), tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cnt
        ), contrib AS (
          SELECT tf.doc_id, tf.tf,
                 CAST(floor(1000 * tf.tf
                            * ln(CAST(cnt.cnt AS DOUBLE) / (SELECT n FROM tot))
                            + 0.5) AS BIGINT) AS c
          FROM tf JOIN cnt USING (term)
        )
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               CAST(SUM(c) AS BIGINT) AS logprob_x1000
        FROM contrib GROUP BY doc_id
    """


_HLL_P = 12
_HLL_M = 1 << _HLL_P


def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def source_distinct_terms_hll(ds):
    """Approximate per-source vocabulary via HyperLogLog (p=12, ~1.6%
    standard error) — the 100 TB path, where the exact operator's
    vocabulary shuffle would dominate.

    Per-batch register arrays (4096 bytes per source) merge by
    elementwise max in a per-source reduce; only registers ever shuffle.
    No SQL oracle (sketch); pytest asserts each estimate within 5% of
    source_distinct_terms on the same input.
    """

    def partial(t: pa.Table) -> pa.Table:
        regs: dict[str, np.ndarray] = {}
        for src, s in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            r = regs.get(src)
            if r is None:
                r = np.zeros(_HLL_M, dtype=np.uint8)
                regs[src] = r
            for term in set(_TOKEN.findall((s or "").lower())):
                h = int.from_bytes(
                    hashlib.md5(term.encode()).digest()[:8], "big"
                )
                idx = h >> (64 - _HLL_P)
                rest = h & ((1 << (64 - _HLL_P)) - 1)
                rho = (64 - _HLL_P) - rest.bit_length() + 1
                if rho > r[idx]:
                    r[idx] = rho
        return pa.table(
            {
                "source": pa.array(list(regs.keys()), pa.string()),
                "regs": pa.array([r.tobytes() for r in regs.values()], pa.binary()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(_HLL_M, dtype=np.uint8)
        for blob in g["regs"]:
            np.maximum(acc, np.frombuffer(blob, dtype=np.uint8), out=acc)
        est = _hll_alpha(_HLL_M) * _HLL_M * _HLL_M / np.sum(
            np.exp2(-acc.astype(np.float64))
        )
        zeros = int(np.count_nonzero(acc == 0))
        if est <= 2.5 * _HLL_M and zeros > 0:
            est = _HLL_M * math.log(_HLL_M / zeros)
        return pd.DataFrame(
            {"source": [g["source"].iloc[0]], "n_est": [int(round(est))]}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(merge, batch_format="pandas")
    )
