"""Text analysis operators over the documents table.

Each operator is a vectorized `map_batches` stage; the ones whose semantics
are SQL-expressible mirror their DuckDB oracle exactly (integer counts and
md5, no float formulas) so the driver's value-hash comparison passes.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\S+")
_PUNCT = re.compile(r"[.!?]")
_WORD = re.compile(r"[a-zA-Z]+")

# tiny per-language stopword lists (public knowledge) for the n-gram
# heuristic language id
_STOP = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "pour", "que"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "por", "con"},
}


def token_stats(ds):
    """doc_id, n_tokens (whitespace), n_punct (.!?), n_chars_obs."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tokens = [len(_WS.findall(s or "")) for s in texts]
        n_punct = [len(_PUNCT.findall(s or "")) for s in texts]
        n_chars = [len(s or "") for s in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_punct": pa.array(n_punct, pa.int64()),
                "n_chars_obs": pa.array(n_chars, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def token_stats_sql() -> str:
    return """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
               length(text) - length(regexp_replace(text, '[.!?]', '', 'g')) AS n_punct,
               length(text) AS n_chars_obs
        FROM documents
    """


def fingerprint(ds):
    """doc_id, md5 fingerprint of the normalized (lower/trim) text.

    Document fingerprinting for exact-dup detection; md5 so the DuckDB
    oracle matches byte for byte.
    """

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        fps = [
            hashlib.md5((s or "").strip().lower().encode("utf-8")).hexdigest()
            for s in texts
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "fp": pa.array(fps, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprint_sql() -> str:
    return "SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents"


def lang_id(ds):
    """doc_id, lang_pred by stopword-hit heuristic (rows-only oracle)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        preds = []
        for s in texts:
            words = set(w.lower() for w in _WORD.findall(s or ""))
            best, best_hits = "unk", 0
            for lang in sorted(_STOP):
                hits = len(words & _STOP[lang])
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "lang_pred": pa.array(preds, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(ds):
    """doc_id, integer quality components + a x1000 integer score so the
    DuckDB oracle is exactly expressible (no float hashing hazards).

    score_x1000 = 1000 * min(n_tokens, 100) / 100  (length component)
                + 500 if mean token length in [3, 12]
    """

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        rows_tok, rows_score = [], []
        for s in texts:
            toks = _WS.findall(s or "")
            n = len(toks)
            total_len = sum(len(w) for w in toks)
            score = (1000 * min(n, 100)) // 100
            if n > 0:
                mean_x100 = (100 * total_len) // n
                if 300 <= mean_x100 <= 1200:
                    score += 500
            rows_tok.append(n)
            rows_score.append(score)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "n_tokens": pa.array(rows_tok, pa.int64()),
                "score_x1000": pa.array(rows_score, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PII_URL = r"https?://[^\s]+"
_PII_PHONE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"


def pii_stats(ds):
    """doc_id, counts of email / URL / phone-shaped substrings, has_pii.

    Fully vectorized: pyarrow's RE2 `count_substring_regex` over the Arrow
    string column, zero row loops.  DuckDB's regexp functions are also
    RE2, so pii_stats_sql counts the identical non-overlapping matches.
    """

    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        n_em = pc.cast(pc.count_substring_regex(txt, _PII_EMAIL), pa.int64())
        n_url = pc.cast(pc.count_substring_regex(txt, _PII_URL), pa.int64())
        n_ph = pc.cast(pc.count_substring_regex(txt, _PII_PHONE), pa.int64())
        has = pc.cast(
            pc.greater(pc.add(n_em, n_ph), pa.scalar(0, pa.int64())), pa.int64()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "n_emails": n_em,
                "n_urls": n_url,
                "n_phones": n_ph,
                "has_pii": has,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def pii_stats_sql() -> str:
    return (
        "SELECT doc_id, "
        f"len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails, "
        f"len(regexp_extract_all(text, '{_PII_URL}')) AS n_urls, "
        f"len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones, "
        f"CASE WHEN len(regexp_extract_all(text, '{_PII_EMAIL}')) "
        f"+ len(regexp_extract_all(text, '{_PII_PHONE}')) > 0 "
        "THEN 1 ELSE 0 END AS has_pii "
        "FROM documents"
    )


_BPE_PAT = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(ds):
    """doc_id, n_bpe_tokens under a GPT-2-style pretokenizer regex
    (contraction suffixes / letter runs / digit runs / punct runs /
    whitespace).  A byte-pair merge only splits WITHIN pretokens, so this
    upper-bounds and closely tracks real BPE token counts — the usual
    budget estimator in training-data pipelines.  Vectorized RE2 via
    pyarrow; DuckDB's RE2 counts the identical matches."""

    def fn(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(t["text"].combine_chunks(), _BPE_PAT),
            pa.int64(),
        )
        return pa.table(
            {"doc_id": t["doc_id"].combine_chunks(), "n_bpe_tokens": n}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def bpe_token_count_sql() -> str:
    return (
        "SELECT doc_id, len(regexp_extract_all(text, '"
        + _BPE_PAT.replace("'", "''")
        + "')) AS n_bpe_tokens FROM documents"
    )


def quality_score_sql() -> str:
    return """
        WITH s AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                 length(regexp_replace(trim(text), '\\s+', '', 'g')) AS tok_chars
          FROM documents
        )
        SELECT doc_id, n_tokens,
               (1000 * least(n_tokens, 100)) // 100
               + CASE WHEN n_tokens > 0
                       AND (100 * tok_chars) // n_tokens BETWEEN 300 AND 1200
                      THEN 500 ELSE 0 END AS score_x1000
        FROM s
    """
