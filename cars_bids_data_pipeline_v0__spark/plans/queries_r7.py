"""Round-7 query batch.

q226 puts the new Change Data Feed (``sources/txlog.py::tx_changes``)
under the value-hash gate: the builder constructs a real commit-log table
from the ``orders`` corpus (two fenced appends + one copy-on-write
DELETE), then folds the reconstructed per-version change rows into an
auditable summary that DuckDB re-derives from the raw table and the same
deterministic splits.  The hash therefore covers append staging, the
delete rewrite, AND the exceptAll change-reconstruction arithmetic.

q227 is hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.
2009): a sparse keyword arm over ``documents`` and a dense cosine arm
over ``embeddings`` fused by summed reciprocal ranks — the standard
first-stage retriever for RAG/training-data curation, expressed as two
rankings and one join (no UDFs anywhere).

Reference parity: none (the reference has neither a transaction log nor
a retrieval surface); these extend the engine's ACID and similarity
families.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from .queries import _t, register

# ---------------------------------------------------------------------------
# q226 — Change Data Feed over a txlog table built from orders
# ---------------------------------------------------------------------------

_Q226_DELETE_MOD = 10  # delete o_orderkey % 10 == 3 (cuts across partitions)


def _q226_table_path(sf_dir: str) -> str:
    """Content-fingerprinted scratch table (the q223 discipline): the key
    hashes every orders file's (relpath, size, mtime_ns), so a
    regenerated corpus rebuilds instead of replaying against stale
    commits."""
    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    root = os.path.join(sf_dir, "orders.parquet")
    entries = []
    if os.path.isdir(root):
        for dirpath, _dirs, files in os.walk(root):
            for name in files:
                fp = os.path.join(dirpath, name)
                st = os.stat(fp)
                entries.append(
                    (os.path.relpath(fp, root), st.st_size, st.st_mtime_ns)
                )
    elif os.path.exists(root):
        st = os.stat(root)
        entries.append((os.path.basename(root), st.st_size, st.st_mtime_ns))
    for entry in sorted(entries):
        h.update(repr(entry).encode())
    return os.path.join(
        tempfile.gettempdir(), f"spark_graft_q226_{h.hexdigest()[:12]}"
    )


def _q226_oracle() -> str:
    return f"""
    WITH expected AS (
        SELECT 0 AS commit_version, 'append' AS commit_op,
               'insert' AS change_type,
               count(*) AS n_rows,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT 1, 'append', 'insert', count(*), round(sum(o_totalprice), 2)
        FROM orders WHERE o_orderkey % 2 = 1
        UNION ALL
        SELECT 2, 'delete', 'delete', count(*), round(sum(o_totalprice), 2)
        FROM orders WHERE o_orderkey % {_Q226_DELETE_MOD} = 3
    )
    SELECT * FROM expected ORDER BY commit_version, change_type
    """


def _q226_build(spark, sf_dir) -> str:
    """Idempotent 3-commit builder (v0 append evens, v1 append odds, v2
    cross-partition delete): each step is guarded by the version the
    PREVIOUS step committed, so a crashed builder resumes, a finished
    builder no-ops, and the appends are additionally txn-fenced.
    Shared by q226 (the CDF itself) and q228 (incremental matview)."""
    from ..sources.txlog import (
        TransactionLog,
        tx_append_partitioned,
        tx_delete_where,
    )

    orders = _t(spark, sf_dir, "orders")
    path = _q226_table_path(sf_dir)
    log = TransactionLog(path)
    if log.version() < 0:
        tx_append_partitioned(
            spark,
            orders.filter(F.col("o_orderkey") % 2 == 0),
            path,
            partition_by="o_orderpriority",
            txn={"app": "q226", "batch": 0},
        )
    if log.version() < 1:
        tx_append_partitioned(
            spark,
            orders.filter(F.col("o_orderkey") % 2 == 1),
            path,
            partition_by="o_orderpriority",
            txn={"app": "q226", "batch": 1},
        )
    if log.version() < 2:
        tx_delete_where(
            spark,
            path,
            f"o_orderkey % {_Q226_DELETE_MOD} = 3",
            partition_by="o_orderpriority",
        )
    return path


@register(
    "q226_tx_change_feed",
    _q226_oracle(),
    doc=(
        "Change Data Feed under the value-hash gate: the builder commits "
        "orders into a txlog table as two fenced appends (even / odd "
        "order keys, partitioned by priority) plus one copy-on-write "
        "DELETE that cuts ACROSS partitions (o_orderkey % 10 = 3, so "
        "every touched file is rewritten, not dropped), then "
        "tx_changes() reconstructs per-version inserts/deletes from the "
        "commit log's own file actions — removed exceptAll added — and "
        "the summary (rows + total price per version/op/type) must equal "
        "DuckDB's re-derivation from the raw table.  Scale: each "
        "version's reconstruction touches only that version's files; "
        "append history is pure scan, the delete's exceptAll shuffles "
        "are delta-sized (sources/txlog.py::tx_changes)"
    ),
)
def q226(spark, sf_dir):
    from ..sources.txlog import tx_changes

    path = _q226_build(spark, sf_dir)
    ch = tx_changes(spark, path)
    return (
        ch.groupBy(
            F.col("_commit_version").cast("int").alias("commit_version"),
            F.col("_commit_op").alias("commit_op"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("commit_version", "change_type")
    )


# ---------------------------------------------------------------------------
# q227 — hybrid retrieval: sparse keyword arm + dense cosine arm, RRF-fused
# ---------------------------------------------------------------------------

_Q227_TERMS = ("merge", "window", "stream")  # sparse query keywords
_Q227_QVEC = 0       # dense query: embedding of vec_id 0
_Q227_ARM_N = 20     # per-arm candidate depth
_Q227_RRF_K = 60     # the standard RRF dampening constant
_Q227_TOPN = 10


def _q227_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _Q227_TERMS)
    return f"""
    WITH sparse_scored AS (
        SELECT doc_id AS id,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t IN ({terms}))) AS hits
        FROM documents
    ), sparse AS (
        SELECT id, row_number() OVER (ORDER BY hits DESC, id) AS srank
        FROM sparse_scored QUALIFY srank <= {_Q227_ARM_N}
    ), base AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), qv AS (
        SELECT v AS q FROM base WHERE id = {_Q227_QVEC}
    ), dense_scored AS (
        SELECT b.id,
               round(list_dot_product(b.v, qv.q)
                     / (sqrt(list_dot_product(b.v, b.v))
                        * sqrt(list_dot_product(qv.q, qv.q))), 6) AS cos
        FROM base b, qv WHERE b.id <> {_Q227_QVEC}
    ), dense AS (
        SELECT id, row_number() OVER (ORDER BY cos DESC, id) AS drank
        FROM dense_scored QUALIFY drank <= {_Q227_ARM_N}
    ), fused AS (
        SELECT coalesce(s.id, d.id) AS id,
               s.srank AS sparse_rank,
               d.drank AS dense_rank,
               round(coalesce(1.0 / ({_Q227_RRF_K} + s.srank), 0)
                     + coalesce(1.0 / ({_Q227_RRF_K} + d.drank), 0), 6)
                   AS rrf_score
        FROM sparse s FULL OUTER JOIN dense d ON s.id = d.id
    )
    SELECT id, sparse_rank, dense_rank, rrf_score,
           row_number() OVER (ORDER BY rrf_score DESC, id) AS final_rank
    FROM fused QUALIFY final_rank <= {_Q227_TOPN}
    ORDER BY final_rank
    """


@register(
    "q227_hybrid_rrf",
    _q227_oracle(),
    doc=(
        "Hybrid first-stage retrieval with Reciprocal Rank Fusion: a "
        "sparse arm (whole-token keyword hits over documents) and a "
        "dense arm (cosine vs a query embedding, the q187 broadcast "
        "shape) each produce a top-20 ranking; RRF fuses them as "
        "sum(1/(60+rank)) over the arms a document appears in — rank "
        "fusion needs no score calibration between arms, which is why "
        "it is the standard BM25+vector combiner.  Scale: each arm is "
        "one corpus scan (the dense arm broadcasts ONE query vector); "
        "the fusion join is over 2xN candidate rows, trivially "
        "broadcast; integer ranks make the fused scores exactly "
        "reproducible across engines"
    ),
)
def q227(spark, sf_dir):
    # ranking discipline: NO global windows anywhere (the registry-wide
    # plan audit).  Each arm takes its top-N with a distributed
    # orderBy+limit (TakeOrderedAndProject — parallel partial top-N,
    # driver-merged), then assigns rank numbers on the N surviving rows
    # with the range-partitioned assigner's bounded single-range path.
    from ..operators.keys import with_surrogate_key
    from ..operators.similarity import as_double, cosine

    def ranked_topn(scored, neg_col, rank_col, n):
        top = scored.orderBy(neg_col, "id").limit(n)
        return with_surrogate_key(
            top, [neg_col, "id"], id_col=rank_col, num_partitions=1
        )

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    sparse_scored = docs.select(
        F.col("doc_id").alias("id"),
        (
            -F.size(F.filter(toks, lambda t: t.isin(*_Q227_TERMS)))
        ).alias("neg_hits"),
    )
    sparse = ranked_topn(sparse_scored, "neg_hits", "srank", _Q227_ARM_N)

    base = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), as_double("embedding").alias("v")
    )
    qv = base.filter(F.col("id") == _Q227_QVEC).select(
        F.col("v").alias("q")
    )
    dense_scored = (
        base.filter(F.col("id") != _Q227_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            "id",
            (-F.round(cosine(F.col("v"), F.col("q")), 6)).alias("neg_cos"),
        )
    )
    dense = ranked_topn(dense_scored, "neg_cos", "drank", _Q227_ARM_N)

    fused = (
        sparse.select("id", "srank")
        .join(dense.select("id", "drank"), "id", "full_outer")
        .select(
            "id",
            F.col("srank").alias("sparse_rank"),
            F.col("drank").alias("dense_rank"),
            F.round(
                F.coalesce(1.0 / (_Q227_RRF_K + F.col("srank")), F.lit(0.0))
                + F.coalesce(
                    1.0 / (_Q227_RRF_K + F.col("drank")), F.lit(0.0)
                ),
                6,
            ).alias("rrf_score"),
        )
        .withColumn("neg_rrf", -F.col("rrf_score"))
    )
    return (
        ranked_topn(fused, "neg_rrf", "final_rank", _Q227_TOPN)
        .select(
            "id", "sparse_rank", "dense_rank", "rrf_score", "final_rank"
        )
        .orderBy("final_rank")
    )


# ---------------------------------------------------------------------------
# q228 — incremental materialized view maintained FROM the change feed
# ---------------------------------------------------------------------------


def _q228_oracle() -> str:
    return f"""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS total_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    WHERE o_orderkey % {_Q226_DELETE_MOD} <> 3
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


@register(
    "q228_incremental_matview_cdf",
    _q228_oracle(),
    doc=(
        "Incremental view maintenance driven by the Change Data Feed "
        "(operators/matview.py::matview_apply_changes): the view's "
        "partials are maintained commit-by-commit from tx_changes — "
        "the append versions fold in as insert partials, the DELETE "
        "version folds SIGNED (subtractable count/sum, delta-sized "
        "shuffle) with min/max repaired by a touched-groups-only "
        "recompute from the snapshot — and the final view must equal "
        "DuckDB's from-scratch aggregate over the surviving rows.  "
        "This is the 100 TB answer to reference "
        "load_lambda/main.py:60-108's recompute-the-warehouse-per-"
        "batch: history is never re-scanned, each refresh costs the "
        "delta plus the deleted groups"
    ),
)
def q228(spark, sf_dir):
    from ..operators.matview import (
        matview_apply_changes,
        matview_finalize,
        matview_partials,
    )
    from ..sources.txlog import tx_changes, tx_read

    path = _q226_build(spark, sf_dir)
    keys = ["o_orderpriority"]
    measures = {"o_totalprice": ("sum", "cnt", "min", "max", "avg")}

    # v0: bootstrap the view from the first commit's inserts
    view = matview_partials(
        tx_changes(spark, path, since=-1, upto=0).drop(
            "_change_type", "_commit_version", "_commit_op"
        ),
        keys,
        measures,
    )
    # v1: insert-only delta — no base needed
    view = matview_apply_changes(
        view, tx_changes(spark, path, since=0, upto=1), keys, measures
    )
    # v2: the delete — signed fold + touched-group min/max repair
    view = matview_apply_changes(
        view,
        tx_changes(spark, path, since=1, upto=2),
        keys,
        measures,
        base=tx_read(spark, path),
    )
    return (
        matview_finalize(view, avg_of=["o_totalprice"])
        .select(
            "o_orderpriority",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("sum_o_totalprice"), 2).alias("total_price"),
            F.col("min_o_totalprice").alias("min_price"),
            F.col("max_o_totalprice").alias("max_price"),
            F.round(F.col("avg_o_totalprice"), 6).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )
