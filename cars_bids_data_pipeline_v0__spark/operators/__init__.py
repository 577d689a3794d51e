"""Relational operators: dedup, validity split, surrogate keys, merges,
set ops, and the large-scale extension operators (near-dup detection,
similarity search, text analysis)."""

from .dedup import keep_latest
from .keys import with_surrogate_key
from .merge import insert_if_absent, upsert_overwrite
from .split import validity_split

__all__ = [
    "keep_latest",
    "with_surrogate_key",
    "insert_if_absent",
    "upsert_overwrite",
    "validity_split",
]
