"""Process-stable primary keys for document ids.

Builtin ``hash(str)`` is salted per process (PYTHONHASHSEED), so two Ray
worker processes disagree on ``hash("a")`` — any join key derived from it
silently mismatches across stages.  Every pk in the engine therefore comes
from this one helper: numeric doc_ids keep their value (fast path, matches
the reference's integer ids), anything else gets a deterministic blake2b
prefix.  Reference analogue: the `id_column` pk carried through
resolve_overlap_gap_run (function_resolve_overlap_gap_run.sql:23).
"""

from __future__ import annotations

import hashlib

_PK_MASK = 0x7FFFFFFFFFFFFFFF


def stable_pk(doc_id) -> int:
    """Deterministic int64 pk for a doc_id (same value in every process)."""
    try:
        return int(doc_id)
    except (TypeError, ValueError):
        digest = hashlib.blake2b(str(doc_id).encode("utf-8"), digest_size=8).digest()
        return int.from_bytes(digest, "big") & _PK_MASK
