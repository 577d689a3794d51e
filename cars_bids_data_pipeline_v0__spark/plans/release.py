"""Corpus RELEASE — the end-to-end run a data curator executes to turn
an accumulated/ingested corpus into a versioned training artifact
(VERDICT r8 directive 6), chaining the already-proven pieces:

    q59 quality gate  →  dedup_incoming vs the previously-RELEASED
    corpus (incremental: re-releases never re-pay released×released
    work)  →  q191 quantile-normalized length gate (drop each source's
    bottom decile — fair across sources with different length
    distributions — and record the Q-Q-normalized score)  →
    optional DSIR selection (q267/q269's operator: importance-score vs
    a target domain, Gumbel-max resample to a token budget)  →
    optional k-center CORESET selection (q277/q281's operator:
    farthest-point traversal over the kept docs' embeddings keeps the
    ``coreset_k`` most diverse — distribution-matching DSIR and
    diversity-maximizing coreset compose, DSIR first)  →
    chunk → pack → `write_training_shards` (loader manifest)  →
    fenced append of the released docs to the ACID release table so the
    NEXT release dedups against them.

At 100 TB: the gate and the quantile step are one scan + two
partial-merging decile aggregates (the Q-Q table is |sources|×9,
broadcast); dedup_incoming is incoming×released inverted-index work
(never released²); chunk/pack are narrow + one per-shard window; the
shard write is the only full-corpus shuffle (by shard key).  Nothing
collects to the driver.

The streaming shape — JSON batches → `corpus_ingest_stream` (epoch-
fenced exactly-once ACID ingest) → this release run — is pinned
end-to-end by ``tests/test_release.py::test_stream_ingest_then_release_capstone``;
the sf1 wall time is the ``corpus_release`` entry of BENCH's sf1
section."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import track_persist
from ..operators.chunking import chunk_documents
from ..operators.dedup_docs import dedup_exact, dedup_incoming
from ..operators.packing import pack_chunks
from ..sources.sinks import write_training_shards
from ..sources.txlog import TransactionLog, tx_append_partitioned, tx_read
from .corpus import quality_gate

_QQ_PS = [i / 10.0 for i in range(1, 10)]


def quantile_release_gate(
    df: DataFrame,
    score_col: str = "n_chars",
    source_col: str = "source",
    norm_col: str = "score_norm",
    min_decile: int = 1,
    reference: DataFrame | None = None,
) -> DataFrame:
    """Quantile-normalized gate over a per-source score (q191's Q-Q
    table, applied): compute each source's deciles and the global
    deciles (two partial-merging aggregates, broadcast back), keep rows
    at or above their source's ``min_decile`` cut (default: drop each
    source's bottom decile — a fixed absolute cutoff would gut
    short-document sources and never touch long ones), and record
    ``norm_col`` = the GLOBAL cut at the row's within-source decile —
    the Q-Q-normalized score downstream samplers can mix on without
    per-source bias.  ``reference`` (default ``df``) is the population
    the cuts are computed over — an incremental release passes the FULL
    gated candidate corpus so the table describes the corpus, not the
    increment (else a re-release would re-admit previously-cut rows
    against their own shifted distribution)."""
    ref = reference if reference is not None else df
    per = ref.groupBy(source_col).agg(
        F.array(
            *[F.percentile(score_col, F.lit(p)) for p in _QQ_PS]
        ).alias("__src_cuts")
    )
    glob = ref.agg(
        F.array(
            *[F.percentile(score_col, F.lit(p)) for p in _QQ_PS]
        ).alias("__global_cuts")
    )
    # within-source decile bucket = #{cuts <= score}, 0..9.  Name-based
    # F.expr, NOT a python lambda capturing the score Column: the
    # broadcast sides derive from df itself, and a captured pre-join
    # attribute id dies in the self-join rewrite
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    bucket = F.expr(
        f"size(filter(__src_cuts, c -> {score_col} >= c))"
    )
    return (
        df.join(F.broadcast(per), source_col)
        .crossJoin(F.broadcast(glob))
        .withColumn("__bucket", bucket)
        .filter(F.col("__bucket") >= min_decile)
        .withColumn(
            norm_col,
            # clamp to [1, 9]: bucket 0 rows exist when min_decile=0
            # (keep-everything mode) and element_at is 1-indexed —
            # without the greatest() they crash INVALID_INDEX_OF_ZERO
            # (round-13 fix); their normalized score is the p10 cut,
            # consistent with the least() cap on the top end
            F.element_at(
                "__global_cuts",
                F.greatest(
                    F.least(F.col("__bucket"), F.lit(9)), F.lit(1)
                ),
            ),
        )
        .drop("__src_cuts", "__global_cuts", "__bucket")
    )


def release_corpus(
    spark: SparkSession,
    candidates: DataFrame,
    release_table: str,
    shards_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    max_stopword_ratio: float = 0.7,
    near_dup_threshold: float = 0.8,
    dedup_df_cap: int | None = 64,
    min_decile: int = 1,
    model_gate: bool = False,
    model_weights: dict | None = None,
    dsir_target: str | None = None,
    dsir_token_budget: int | None = None,
    chunk_size: int = 128,
    overlap: int = 32,
    budget: int = 256,
    num_shards: int = 8,
    txn: dict | None = None,
    coreset_k: int | None = None,
    embeddings: DataFrame | None = None,
    dedup_index_table: str | None = None,
) -> DataFrame:
    """One incremental release run (see module docstring for the chain).
    Each increment writes its shards under
    ``shards_dir/release=<version>`` (the release table's next commit
    version — `write_training_shards` overwrites its target, and prior
    increments are published artifacts a loader may still be reading).
    Returns the loader manifest ``(shard, n_files, n_rows, n_packs)``
    of THIS increment, read back from the written shards; releasing the
    same candidates twice writes nothing the second time (everything
    dedups against the release table the first run appended to).

    The Q-Q gate is BATCH-RELATIVE (cuts computed over this run's gated
    candidates): a doc cut in one increment can legitimately clear a
    later increment's cut if the candidate population shifted — the
    gate tracks the distribution, it is not a per-doc verdict ledger.

    DSIR selection (``dsir_target`` + ``dsir_token_budget``) is
    likewise PER-INCREMENT: each run scores this increment's fresh
    survivors and releases the Gumbel-max race's leaders up to the
    token budget.  Re-submitting the same candidates therefore releases
    the docs the budget CUT last time (still fresh, next-best in the
    race) — the ledger of what's released is the table itself, and no
    doc is ever released twice (dedup_incoming guards that).  True
    crash-replays stay no-ops via the txn fence BEFORE any selection
    runs; only the selection-less capstone has the stronger
    "all-dup re-delivery writes nothing" property."""
    gated = quality_gate(
        candidates, text_col, min_tokens, min_alpha_ratio,
        max_stopword_ratio,
    )
    # model gate (the FineWeb-Edu shape): after the rule gates, a
    # pretrained linear classifier (operators/quality_model, the q275
    # operator) cuts low-scoring docs — EARLY, so everything downstream
    # (dedup's inverted index, the Q-Q table, DSIR's bag models) works
    # on the model-approved slice only.  Deterministic (sign of an
    # exact-integer-ratio linear score), so crash-retries of an
    # increment gate identically.
    if model_gate:
        from ..operators.quality_model import score_quality

        # persist barrier: `gated` feeds BOTH the dedup path and the
        # Q-Q gate's reference below — without it the classifier's
        # explode + two aggregations re-run per consumer (measured
        # 19.0 → ~14 s on the sf1 release leg)
        gated = track_persist(
            score_quality(
                gated, text_col=text_col, id_col=id_col,
                weights=model_weights,
            ).where(F.col("quality_kept")).drop(
                "quality_score", "quality_kept"
            )
        )
    if "n_chars" not in gated.columns:
        gated = gated.withColumn("n_chars", F.length(text_col))
    # within-batch exact dedup (min-id survivor): a release must never
    # emit two identical documents even when the candidates arrive raw
    # (dedup_incoming only guards against the already-RELEASED corpus)
    gated = dedup_exact(gated, text_col=text_col, id_col=id_col)
    prev = tx_read(spark, release_table)
    # multi-release chain compaction (round-13): with a
    # ``dedup_index_table``, the corpus side of the incremental dedup
    # is a PERSISTED (fp, hashed-shingle set, size) index instead of
    # the released corpus TEXT — the text path re-pays normalization +
    # shingling over every released doc on every release, forever;
    # the index path reads four columnar fields and is result-
    # identical (test-pinned).  The index self-heals: any released doc
    # missing from it (pre-index table, or a crash between the release
    # append and the index append below) gets its rows rebuilt here
    # before the dedup join, so the corpus side is always exactly the
    # released set.
    idx = None
    if dedup_index_table is not None and prev is not None:
        from ..operators.dedup_docs import (
            build_dedup_index, dedup_incoming_indexed,
        )

        idx = tx_read(spark, dedup_index_table)
        gap = prev.select(id_col, text_col)
        if idx is not None:
            gap = gap.join(
                idx.select(F.col("doc_id").alias(id_col)),
                id_col,
                "left_anti",
            )
        gap_rows = build_dedup_index(
            gap, text_col=text_col, id_col=id_col
        )
        if not gap_rows.isEmpty():
            tx_append_partitioned(
                spark, gap_rows, dedup_index_table,
                partition_by="bucket",
            )
        idx = tx_read(spark, dedup_index_table)
    if prev is None:
        fresh = gated
    elif idx is not None:
        fresh = dedup_incoming_indexed(
            gated,
            idx,
            text_col=text_col,
            id_col=id_col,
            threshold=near_dup_threshold,
            df_cap=dedup_df_cap,
        )
    else:
        fresh = dedup_incoming(
            gated,
            prev.select(id_col, text_col),
            text_col=text_col,
            id_col=id_col,
            threshold=near_dup_threshold,
            # boilerplate guard (the q211 discipline): without the
            # document-frequency cap, template shingles shared by
            # thousands of docs blow the incoming×released inverted
            # join up quadratically — measured 53.6 s -> ~8 s at sf1
            df_cap=dedup_df_cap,
        )
    kept = track_persist(
        quantile_release_gate(
            fresh, "n_chars", source_col,
            min_decile=min_decile, reference=gated,
        )
    )
    # DSIR selection (Xie 2023, the paper's actual end-to-end: score →
    # resample → release): when a target-domain predicate and a token
    # budget are given, keep the Gumbel-max race's leading docs ∝
    # exp(importance weight) until the budget fills — the bag models
    # are estimated over THIS increment's gated survivors (the corpus
    # slice actually competing for the budget), so a domain-skewed
    # increment reweights itself.  RNG-free and deterministic: a
    # crash-retry of the same increment selects the same docs, which
    # the exactly-once release contract requires.
    if dsir_target is not None and dsir_token_budget is not None:
        from ..operators.dsir import dsir_resample

        kept = track_persist(
            dsir_resample(
                kept,
                F.expr(dsir_target),
                dsir_token_budget,
                text_col=text_col,
                id_col=id_col,
            ).drop("dsir_w", "race_key")
        )
    # k-center coreset selection (Sener 2018, the q277/q281 operator as
    # a release stage — round-11 VERDICT directive 7): after every
    # gate (and after DSIR when both are on — coreset then diversifies
    # the budgeted slice), keep the ``coreset_k`` docs a farthest-point
    # traversal over their embeddings selects.  Diversity-maximizing
    # where DSIR is distribution-matching: the coreset covers the
    # increment's embedding space with k representatives (every kept
    # doc is within the traversal radius of a released one — audit the
    # coverage with q281's Voronoi assignment over the released
    # embeddings).  Deterministic (lowest-id seed, argmax tiebreak on
    # vec_id), so crash-retries select identically — the exactly-once
    # contract.  Scale: the join is id-keyed; the traversal is the
    # measured batched operator (bounded TakeOrdered per round, never
    # a pairwise matrix).  Docs with no embedding row cannot be placed
    # and are dropped from the increment (the join is inner —
    # embed-before-release is the pipeline contract this stage assumes).
    if coreset_k is not None:
        if embeddings is None:
            raise ValueError("coreset_k needs embeddings= (id ↔ vector)")
        from ..operators.similarity import as_double, kcenter_traverse

        n_gated = kept.count()
        pts = track_persist(
            kept.select(id_col)
            .join(
                embeddings.select(
                    F.col(id_col),
                    as_double(F.col("embedding")).alias("v"),
                ),
                id_col,
            )
            .select(F.col(id_col).alias("vec_id"), "v")
        )
        n_pts = pts.count()
        if n_pts < n_gated:
            # LOUD partial-coverage signal (round-12 ADVICE): the inner
            # join drops every gated doc without an embedding row, and
            # with zero coverage the whole increment silently empties —
            # surface the broken embed-before-release contract instead
            # (the txlog parallel-build fallback discipline)
            import sys

            print(
                f"release_corpus: coreset embeddings cover {n_pts} of "
                f"{n_gated} gated docs — {n_gated - n_pts} dropped for "
                "missing embedding rows (embed-before-release contract "
                "violated upstream)",
                file=sys.stderr,
            )
        if n_pts:
            centers = kcenter_traverse(
                pts, k=min(coreset_k, n_pts), batch=16
            )
            sel = sorted(int(vid) for _, vid, _, _ in centers)
            # k is a selection budget (bounded), so the id list is a
            # broadcast-sized literal filter, not a join
            kept = kept.filter(F.col(id_col).isin(sel))
        else:
            kept = kept.limit(0)
    # empty increment (an all-dup re-release): write nothing, append
    # nothing — the manifest read from the shard dir still reports the
    # PREVIOUS release's artifact untouched
    if kept.isEmpty():
        empty = spark.createDataFrame(
            [], "shard int, n_files long, n_rows long, n_packs long"
        )
        return empty
    chunks = chunk_documents(
        kept, chunk_size=chunk_size, overlap=overlap,
        text_col=text_col, id_col=id_col,
    )
    packed = pack_chunks(
        chunks, budget=budget, num_shards=num_shards, id_col=id_col
    )
    increment = TransactionLog(release_table).version() + 1
    manifest = write_training_shards(
        packed, os.path.join(shards_dir, f"release={increment}")
    )
    # record the release increment under the ACID log, partitioned by
    # source (the natural prune key for later per-source re-releases) —
    # the NEXT run's dedup_incoming target
    tx_append_partitioned(
        spark, kept, release_table, partition_by=source_col, txn=txn
    )
    if dedup_index_table is not None:
        # index rows for THIS increment's released docs, appended AFTER
        # the release commit: a crash in between leaves release ⊇ index
        # and the next run's self-heal pass rebuilds exactly the gap
        # (never the reverse order — an index row without its released
        # doc would dedup future increments against a ghost)
        from ..operators.dedup_docs import build_dedup_index

        tx_append_partitioned(
            spark,
            build_dedup_index(
                kept.select(id_col, text_col),
                text_col=text_col,
                id_col=id_col,
            ),
            dedup_index_table,
            partition_by="bucket",
        )
    return manifest


def release_stream(
    spark: SparkSession,
    docs_dir: str,
    release_table: str,
    shards_dir: str,
    checkpoint_dir: str,
    stream_id: str = "corpus-release",
    schema=None,
    **release_kw,
):
    """Continuous curation: every micro-batch of candidate documents
    becomes ONE release increment (`release_corpus` — gate → dedup vs
    everything already released → Q-Q gate → versioned shards → fenced
    append).  Exactly-once by two independent layers, the
    `corpus_ingest_stream` discipline:

    * the append carries an epoch-scoped idempotence token, so a
      same-checkpoint crash-replay of a committed batch is fenced to a
      no-op before any work;
    * a LOST checkpoint (fresh epoch, batch ids restart, files
      re-delivered) is not falsely fenced — content-level
      dedup_incoming then drops everything already released and an
      all-dup re-delivery writes nothing at all.

    A crash BETWEEN the shard write and the append self-heals: the
    release-table version did not advance, so the retry rebuilds the
    same ``release=N`` directory (write_training_shards overwrites) and
    then commits."""
    from pyspark.sql import types as T

    from ..cache import release_build_caches
    from ..sources.txlog import TransactionLog, checkpoint_epoch_app_id

    app_id = checkpoint_epoch_app_id(stream_id, checkpoint_dir)
    schema = schema or T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(docs_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        log = TransactionLog(release_table)
        try:
            if log.txn_seen(app_id, int(batch_id)):
                return  # same-checkpoint replay of a committed increment
            release_corpus(
                batch_df.sparkSession,
                batch_df,
                release_table,
                shards_dir,
                txn={"app": app_id, "batch": int(batch_id)},
                **release_kw,
            )
        finally:
            # the one indefinitely-lived consumer must drain per batch
            release_build_caches()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
