"""Round-5 query batch.

Opens with q211: the document-frequency cap (the boilerplate/hot-shingle
skew guard of ``operators/dedup_docs.py``) exercised as a REGISTERED,
DuckDB-oracled query — before this, the guard was implemented and
unit-tested but no ``queries()`` entry ran it, so the scale guard itself
had no hash-level proof (round-4 VERDICT directive 5).

Reference parity: the reference pipeline has no dedup at all (loads are
trusted blindly, ``load_lambda/main.py``); this family is part of the
LLM-training-data surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup_docs as DD
from .queries import _t, register

# ---------------------------------------------------------------------------
# q211 — Jaccard near-dup pairs under a document-frequency cap
# ---------------------------------------------------------------------------

# Planted boilerplate: appended to every even doc_id, so each of its word
# 3-grams lands in ~half the corpus (df ≈ n_docs/2 ≫ cap) and the cap
# provably fires.  Nine words → 7 interior shingles, plus low-df boundary
# shingles where the footer meets each doc's own tail.
_Q211_FOOTER = (
    "subscribe to our newsletter for updates terms and conditions"
)
_Q211_CAP = 40
_Q211_THRESHOLD = 0.25


@register(
    "q211_jaccard_df_capped",
    f"""
    WITH docs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN text || ' {_Q211_FOOTER}'
                    ELSE text END AS text
        FROM documents
    ), sh AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        FROM (
            SELECT doc_id,
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       '\\s+') AS t
            FROM docs
        )
    ), inv AS (
        SELECT id, unnest(s) AS shingle FROM sh
    ), hot AS (
        SELECT shingle FROM inv GROUP BY 1 HAVING count(*) > {_Q211_CAP}
    ), kept AS (
        SELECT id, shingle FROM inv ANTI JOIN hot USING (shingle)
    ), sizes AS (
        SELECT id, count(*) AS sz FROM kept GROUP BY 1
    ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM kept a JOIN kept b USING (shingle)
        WHERE a.id < b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(CAST(inter AS DOUBLE)
                 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE round(CAST(inter AS DOUBLE)
                / (sa.sz + sb.sz - inter), 6) >= {_Q211_THRESHOLD}
    """,
    doc=(
        "n-gram Jaccard near-dup pairs with the document-frequency cap "
        "ACTIVE (df_cap drops shingles in > cap docs before the self-join; "
        "per-doc sizes recomputed over the retained shingle space — "
        "C4-style template scrub).  The corpus carries a planted viral "
        "footer on every even doc so the cap provably fires: without it "
        "the footer alone contributes (n_docs/2)² join rows.  Same plan "
        "as q53 plus one broadcast anti-join; the guard that makes exact "
        "Jaccard survive boilerplate-heavy corpora at 100 TB"
    ),
)
def q211(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" " + _Q211_FOOTER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return DD.ngram_jaccard_pairs(
        d, n=3, threshold=_Q211_THRESHOLD, df_cap=_Q211_CAP
    )
