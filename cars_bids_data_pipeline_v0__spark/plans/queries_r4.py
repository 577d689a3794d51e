"""Round-4 query batch: corpus screening surfaces.

Registered into the shared REGISTRY (plans/queries.py) like every other
batch; oracle discipline identical — alias parity, ROUND on doubles,
deterministic token semantics shared with q29/q50.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text import blocklist_stats
from .queries import _t, register

# The word-list gate every web-corpus pipeline runs before the (1000×
# costlier) ML toxicity classifiers.  The synthetic corpus is benign word
# soup, so the "bad words" here are ordinary tokens chosen to give the
# screen real selectivity at every SF.
_BLOCKLIST = ["slow", "spill", "skew", "leak"]


@register(
    "q163_blocklist_screen",
    """
    WITH toks AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents
    ), scored AS (
        SELECT doc_id, source,
               CAST(len(list_filter(t,
                    x -> list_contains(['slow','spill','skew','leak'], x)))
                    AS BIGINT) AS n_blocked,
               round(len(list_filter(t,
                    x -> list_contains(['slow','spill','skew','leak'], x)))
                     / CAST(greatest(len(t), 1) AS DOUBLE), 6)
                   AS blocked_frac
        FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_blocked >= 3 OR blocked_frac > 0.08
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
           CAST(sum(n_blocked) AS BIGINT) AS total_blocked,
           round(avg(blocked_frac), 6) AS avg_blocked_frac
    FROM scored
    GROUP BY source
    """,
    doc=(
        "word-blocklist screening (the C4-style 'bad words' gate): "
        "per-doc blocked-token counts/fractions from one codegen'd "
        "projection (list literal + array_contains, zero Python), rolled "
        "up per source with the quarantine rule n_blocked >= 3 OR "
        "blocked_frac > 0.08.  At 100 TB the scan is the whole cost — "
        "the rollup shuffles |sources| tiny rows"
    ),
)
def q163(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_blocked, frac = blocklist_stats("text", _BLOCKLIST)
    scored = d.select(
        "source",
        n_blocked.alias("n_blocked"),
        frac.alias("blocked_frac"),
    )
    quarantine = (F.col("n_blocked") >= 3) | (F.col("blocked_frac") > 0.08)
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(quarantine, 1).otherwise(0))
        .cast("long")
        .alias("n_quarantined"),
        F.sum("n_blocked").cast("long").alias("total_blocked"),
        F.round(F.avg("blocked_frac"), 6).alias("avg_blocked_frac"),
    )
