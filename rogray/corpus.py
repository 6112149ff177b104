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

from . import stages

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

    terms = tf_ds.map_batches(tag_term, batch_format="pyarrow")
    withdf = stages.gated_groupby(None, terms, "hb", attach_df, batch_format="pandas")
    docs = withdf.map_batches(tag_doc, batch_format="pyarrow")
    return stages.gated_groupby(None, docs, "db", topk, batch_format="pandas")


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

    rowed = ds.map_batches(rows, batch_format="pyarrow")
    sliced = stages.gated_groupby(ds, rowed, "hb", count_slice, batch_format="pandas")
    agg = sliced.groupby("source").sum("n_part")

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

    terms = tf_ds.map_batches(tag_term, batch_format="pyarrow")
    contribd = stages.gated_groupby(None, terms, "hb", contrib, batch_format="pandas")
    docs = contribd.map_batches(tag_doc, batch_format="pyarrow")
    return stages.gated_groupby(None, docs, "db", reduce_doc, batch_format="pandas")


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

    part = ds.map_batches(partial, batch_format="pyarrow")
    return stages.gated_groupby(None, part, "source", merge, batch_format="pandas")


def bigram_pmi(ds, k: int = 50, min_count: int = 5):
    """Top-k collocations by pointwise mutual information (exact).

    Shape: per-batch partial Counters collapse token/bigram streams to
    (key, cnt) rows before any shuffle; unigram totals attach to the
    bigram table via TWO term-keyed bucket shuffles (first word, then
    second word) — no corpus-sized broadcast, no driver loop.  The final
    sort+limit runs on collocation-vocabulary-sized data.

    pmi = ln(c_ab) + 2*ln(T1) - ln(T2) - ln(c_a) - ln(c_b), evaluated
    left-to-right in doubles with libm ln — bit-identical to DuckDB's
    expression in bigram_pmi_sql(), so pmi_x1000 (half-away rounding)
    hash-matches exactly.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    def parts(t: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        bi: Counter = Counter()
        for s in t["text"].to_pylist():
            toks = _TOKEN.findall((s or "").lower())
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        keys = [f"u\x00{w}" for w in uni] + [f"b\x00{a}\x00{b}" for a, b in bi]
        cnts = list(uni.values()) + list(bi.values())
        return pa.table(
            {"key": pa.array(keys, pa.string()), "cnt": pa.array(cnts, pa.int64())}
        )

    counts = (
        ds.map_batches(parts, batch_format="pyarrow").groupby("key").sum("cnt")
    ).materialize()  # vocabulary-sized; read twice below (uni / bi split)

    def split(prefix: str):
        def f(t: pa.Table) -> pa.Table:
            keys = t["key"].to_pylist()
            cnt = t["sum(cnt)"].to_numpy()
            rows = [(kk.split("\x00"), int(c)) for kk, c in zip(keys, cnt)
                    if kk.startswith(prefix)]
            if prefix == "u\x00":
                return pa.table(
                    {
                        "term": pa.array([p[1] for p, _ in rows], pa.string()),
                        "c_term": pa.array([c for _, c in rows], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "w1": pa.array([p[1] for p, _ in rows], pa.string()),
                    "w2": pa.array([p[2] for p, _ in rows], pa.string()),
                    "c_ab": pa.array([c for _, c in rows], pa.int64()),
                }
            )

        f.__name__ = f"split_{prefix[0]}"
        return f

    uni_ds = counts.map_batches(split("u\x00"), batch_format="pyarrow")
    bi_ds = counts.map_batches(split("b\x00"), batch_format="pyarrow")
    t1 = int(uni_ds.aggregate(Sum("c_term", alias_name="s"))["s"])
    t2 = int(bi_ds.aggregate(Sum("c_ab", alias_name="s"))["s"])

    nb = _n_buckets_for(t1 // 64 + 1)

    def _attach(cur, word_col: str, out_col: str):
        """One bucketed shuffle: bigram rows and unigram rows meet at the
        hash bucket of `word_col`; counts attach via a pandas merge."""
        have_ca = word_col == "w2"
        schema = pa.schema(
            [
                ("wb", pa.int64()),
                ("w1", pa.string()),
                ("w2", pa.string()),
                ("c_ab", pa.int64()),
                ("c_a", pa.int64()),
                ("term", pa.string()),
                ("c_term", pa.int64()),
            ]
        )

        def tag_bi(t: pa.Table) -> pa.Table:
            n = len(t)
            w = t[word_col].to_pylist()
            return pa.table(
                {
                    "wb": pa.array(
                        [zlib.crc32(x.encode()) % nb for x in w], pa.int64()
                    ),
                    "w1": t["w1"].combine_chunks(),
                    "w2": t["w2"].combine_chunks(),
                    "c_ab": t["c_ab"].combine_chunks(),
                    "c_a": t["c_a"].combine_chunks()
                    if have_ca
                    else pa.nulls(n, pa.int64()),
                    "term": pa.nulls(n, pa.string()),
                    "c_term": pa.nulls(n, pa.int64()),
                },
                schema=schema,
            )

        def tag_uni(t: pa.Table) -> pa.Table:
            n = len(t)
            w = t["term"].to_pylist()
            return pa.table(
                {
                    "wb": pa.array(
                        [zlib.crc32(x.encode()) % nb for x in w], pa.int64()
                    ),
                    "w1": pa.nulls(n, pa.string()),
                    "w2": pa.nulls(n, pa.string()),
                    "c_ab": pa.nulls(n, pa.int64()),
                    "c_a": pa.nulls(n, pa.int64()),
                    "term": t["term"].combine_chunks(),
                    "c_term": t["c_term"].combine_chunks(),
                },
                schema=schema,
            )

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            bi_rows = g[g["term"].isna()][
                ["w1", "w2", "c_ab"] + (["c_a"] if have_ca else [])
            ]
            uni_rows = g[g["term"].notna()][["term", "c_term"]].rename(
                columns={"term": word_col, "c_term": out_col}
            )
            out = bi_rows.merge(uni_rows, on=word_col, how="left")
            out[out_col] = out[out_col].astype("int64")
            return out

        merge.__name__ = f"attach_{out_col}"
        tagged = cur.map_batches(tag_bi, batch_format="pyarrow").union(
            uni_ds.map_batches(tag_uni, batch_format="pyarrow")
        )
        return stages.gated_groupby(None, tagged, "wb", merge, batch_format="pandas")

    cur = _attach(bi_ds, "w1", "c_a")
    cur = _attach(cur, "w2", "c_b")

    def score(t: pa.Table) -> pa.Table:
        cab = t["c_ab"].to_numpy()
        ca = t["c_a"].to_numpy()
        cb = t["c_b"].to_numpy()
        keep = cab >= min_count
        t = t.take(pa.array(np.flatnonzero(keep), pa.int64()))
        cab, ca, cb = cab[keep], ca[keep], cb[keep]
        pmi = [
            math.log(float(a)) + 2.0 * math.log(float(t1)) - math.log(float(t2))
            - math.log(float(x)) - math.log(float(y))
            for a, x, y in zip(cab, ca, cb)
        ]
        px = np.asarray(pmi)
        px1000 = (np.sign(px) * np.floor(np.abs(px) * 1000.0 + 0.5)).astype(np.int64)
        bigram = [f"{a} {b}" for a, b in zip(t["w1"].to_pylist(), t["w2"].to_pylist())]
        return pa.table(
            {
                "bigram": pa.array(bigram, pa.string()),
                "c_ab": pa.array(cab, pa.int64()),
                "pmi_x1000": pa.array(px1000, pa.int64()),
            }
        )

    return (
        cur.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_x1000", "bigram"], descending=[True, False])
        .limit(k)
    )


def bigram_pmi_sql(k: int = 50, min_count: int = 5) -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id, u.tok AS tok, u.ord AS ord
          FROM documents,
               LATERAL (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
                        generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS ord) u
        ),
        uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        t1 AS (SELECT COUNT(*) AS n FROM toks),
        bi AS (
          SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS c_ab
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
          GROUP BY a.tok, b.tok
        ),
        t2 AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM bi)
        SELECT w1 || ' ' || w2 AS bigram,
               CAST(c_ab AS BIGINT) AS c_ab,
               CAST(round((ln(CAST(c_ab AS DOUBLE)) + 2.0 * ln(CAST(t1.n AS DOUBLE))
                     - ln(CAST(t2.n AS DOUBLE)) - ln(CAST(ua.c AS DOUBLE))
                     - ln(CAST(ub.c AS DOUBLE))) * 1000) AS BIGINT) AS pmi_x1000
        FROM bi, t1, t2
        JOIN uni ua ON ua.tok = bi.w1
        JOIN uni ub ON ub.tok = bi.w2
        WHERE c_ab >= {min_count}
        ORDER BY pmi_x1000 DESC, bigram
        LIMIT {k}
    """


def inverted_index_stats(ds, min_df: int = 2, top_docs: int = 3):
    """Posting-list statistics per term: document frequency, collection
    frequency, and the head of the posting list (top docs by tf, ties by
    doc_id) — the build step of a distributed inverted index.

    Shape: _tf_rows pre-aggregates (doc, term, tf) inside each batch, the
    single shuffle buckets terms by hash (~4k terms per Ray group), and
    each bucket computes df/cf/head vectorized in pandas.  Output is
    vocabulary-sized."""
    n_docs = ds.count()
    nb = _n_buckets_for(n_docs * 64)

    def tag(t: pa.Table) -> pa.Table:
        terms = t["term"].to_pylist()
        return t.append_column(
            "tb", pa.array([zlib.crc32(x.encode()) % nb for x in terms], pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "tf", "doc_id"], ascending=[True, False, True])
        agg = g.groupby("term", as_index=False).agg(
            df=("doc_id", "size"), cf=("tf", "sum")
        )
        heads = (
            g.groupby("term", as_index=False)
            .head(top_docs)
            .groupby("term", as_index=False)
            .agg(head_docs=("doc_id", lambda s: ",".join(map(str, s))))
        )
        out = agg.merge(heads, on="term")
        return out[out["df"] >= min_df][["term", "df", "cf", "head_docs"]]

    fn = lambda g: per_bucket(g.drop(columns=["tb"]))  # noqa: E731
    tagged = ds.map_batches(_tf_rows, batch_format="pyarrow").map_batches(
        tag, batch_format="pyarrow"
    )
    out = stages.gated_groupby(ds, tagged, "tb", fn, batch_format="pandas")
    return out.sort("term")


def inverted_index_stats_sql(min_df: int = 2, top_docs: int = 3) -> str:
    return f"""
        WITH tf AS (
          SELECT doc_id, tok AS term, COUNT(*) AS tf
          FROM documents,
               LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS u(tok)
          GROUP BY doc_id, tok
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY term
                                       ORDER BY tf DESC, doc_id) AS rn
          FROM tf
        )
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS cf,
               string_agg(CASE WHEN rn <= {top_docs} THEN CAST(doc_id AS VARCHAR) END,
                          ',' ORDER BY rn) AS head_docs
        FROM ranked
        GROUP BY term
        HAVING COUNT(*) >= {min_df}
        ORDER BY term
    """
