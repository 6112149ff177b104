"""Deterministic sampling operators for training-data mixture control.

Hash-based (not RNG-based) so runs are reproducible, resumable shards
agree, and a DuckDB oracle can replay the exact decision per row:
a document survives iff ``md5_number_lower(CAST(doc_id AS VARCHAR)) %
1000`` falls below its source's permille rate.  Rates themselves derive
from ``md5_number_lower(source)`` so the operator needs no config table
and works over any source vocabulary.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _md5_number_lower(s: str) -> int:
    """DuckDB ``md5_number_lower``: lower 8 md5 bytes, little-endian."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def source_permille(source: str) -> int:
    """Deterministic per-source sampling rate in [50, 949] permille."""
    return _md5_number_lower(source) % 900 + 50


def stratified_sample(ds):
    """Per-source deterministic sample of documents.

    Pure map_batches filter — embarrassingly parallel, no shuffle, no
    state; the decision for a row depends only on that row.  Emits the
    surviving (doc_id, source, permille) rows.
    """

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        rate_cache: dict[str, int] = {}
        keep, permille = [], []
        for i, (did, src) in enumerate(zip(ids, srcs)):
            r = rate_cache.get(src)
            if r is None:
                r = source_permille(src)
                rate_cache[src] = r
            if _md5_number_lower(str(did)) % 1000 < r:
                keep.append(i)
                permille.append(r)
        sub = t.select(["doc_id", "source"]).take(pa.array(keep, pa.int64()))
        return sub.append_column(
            "permille", pa.array(np.asarray(permille, dtype=np.int64), pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample_sql() -> str:
    return """
        SELECT doc_id, source,
               CAST(md5_number_lower(source) % 900 + 50 AS BIGINT) AS permille
        FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000
              < md5_number_lower(source) % 900 + 50
    """
