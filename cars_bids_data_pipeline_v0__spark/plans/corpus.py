"""Corpus preprocessing — the end-to-end shape of a training-data pipeline
over the ``documents`` table, composed from the extension operators:

    quality features → quality/language gate → exact dedup →
    near-dup candidate pairs (MinHash-LSH, exact-Jaccard verified) →
    connected components → one representative per duplicate cluster

Every stage is a narrow projection or an already-scale-audited operator;
the whole plan is lazy, so Catalyst prunes the `documents` scan to
(id, text) and pushes the null filter down.  At 100 TB the expensive
stages are the two dedup shuffles — both are keyed on 64-bit hashes, and
the LSH band join touches only colliding buckets.

SQL-expressible prefix (gate + exact dedup) is oracle-checked as
``q59_corpus_quality_gate``; the near-dup clustering tail is pinned by
``tests/test_corpus.py`` (chain-merging, representative choice) and
surfaced rows-only as ``q60_near_dup_clusters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import track
from ..operators import dedup_docs as DD
from ..operators import text as TXT
from ..operators.graph import connected_components, dedup_by_components


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    max_stopword_ratio: float = 0.7,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Filter documents by quality features and (optionally) language —
    one narrow projection, no shuffle."""
    feats = TXT.quality_features(text_col)
    out = df.filter(
        F.col(text_col).isNotNull()
        & (feats["n_tokens"] >= min_tokens)
        & (feats["alpha_ratio"] >= min_alpha_ratio)
        & (feats["stopword_ratio"] <= max_stopword_ratio)
    )
    if langs:
        out = out.filter(TXT.lang_id(text_col).isin(*langs))
    return out


def preprocess_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    max_stopword_ratio: float = 0.7,
    langs: tuple[str, ...] | None = None,
    near_dup_threshold: float | None = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """The full gate → exact-dedup → near-dedup pipeline.  Returns the
    surviving rows of ``df`` (min-id representative per duplicate
    cluster).  Set ``near_dup_threshold=None`` to stop after exact dedup."""
    gated = quality_gate(
        df, text_col, min_tokens, min_alpha_ratio, max_stopword_ratio, langs
    )
    exact = DD.dedup_exact(gated, text_col=text_col, id_col=id_col)
    if near_dup_threshold is None:
        return exact
    exact = track(exact.persist())
    pairs = DD.minhash_lsh_dedup(
        exact,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=near_dup_threshold,
    )
    return dedup_by_components(exact, pairs, id_col=id_col)


def near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """``(id, component)`` clusters over verified near-dup pairs."""
    pairs = DD.minhash_lsh_dedup(
        df, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, threshold=threshold,
    )
    return connected_components(pairs)
