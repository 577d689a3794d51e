"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, and embedding-cosine near-dup.

Scale design (the point of each variant):

* **exact** — one hash-shuffle on an 8/16-byte key; the baseline.
* **n-gram Jaccard** — exact pairwise similarity via a shingle-inverted
  index (explode → self-join on shingle → count).  Quadratic in the worst
  case; use only under a blocking key or as the LSH verify step.
* **MinHash+LSH** — the 100 TB path: k hash-mins per doc (one scan), band
  signatures, candidate pairs only within equal band buckets (shuffle on
  band signature), then exact-Jaccard verification of the tiny candidate
  set.  No all-pairs stage ever materializes.
* **SimHash** — constant-size (64-bit) signature per doc; hamming-ball
  lookups via rotate-and-block; cheapest signature, coarsest recall.
* **embedding cosine** — semantic near-dup over `array<float>`; brute-force
  within blocks, or random-hyperplane LSH buckets at scale.

All of it is native DataFrame/expression code — no Python UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import track, track_persist
from .text import normalize_text, tokenize


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition to the session's parallelism before expression-heavy
    stages — but ONLY when the input is under-partitioned.  Test corpora
    arrive as a single parquet row-group → one input partition →
    shingling/hashing runs on one core without this.  On a real cluster the
    reader already splits by row-group/file and the partition count clears
    the threshold, so no extra shuffle is ever added at scale."""
    n = int(
        df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
        )
    )
    # inputFiles() is a plan-metadata lookup (no RDD translation, no job);
    # a frame fed by many files — or by any shuffle, where the count below
    # is 0 but shuffle.partitions already applies — needs no extra fan-out.
    # Round 2 used df.rdd.getNumPartitions(), which forced RDD conversion
    # of the logical plan on every dedup call.
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        return df
    if nfiles == 0 or nfiles >= max(2, n // 2):
        # 0 files = not a file scan (shuffle output / localRelation) —
        # shuffle.partitions or default.parallelism already applies
        return df
    return df.repartition(n)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents:
    ``(fingerprint, n_dups, keep_id)`` for groups with >1 member.
    keep_id = min id (deterministic survivor)."""
    from .text import fingerprint_md5

    return (
        df.select(fingerprint_md5(text_col).alias("fingerprint"),
                  F.col(id_col).alias("id"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("id").alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (min id) per distinct normalized text — a single
    hash-shuffle on the fingerprint."""
    from ..operators.dedup import keep_latest
    from .text import fingerprint_md5

    with_fp = df.withColumn("__fp", fingerprint_md5(text_col))
    # keep_latest orders DESC on order_by; negate the id so min id survives
    return keep_latest(with_fp, "__fp", order_by=-F.col(id_col)).drop("__fp")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word ``n``-grams of the normalized text.  Documents with
    fewer than ``n`` tokens yield a single shingle of the whole text.

    The token array is LET-BOUND through a single-element ``transform``
    so the inner lambda's ``slice`` reads a bound variable: inlining
    ``tokenize(normalize_text(c))`` directly into the lambda body makes
    codegen re-evaluate the whole regex chain once per SHINGLE —
    O(len²) regex work per document, measured 53 s → 7 s materializing
    the 50k-doc sf1 shingle table (round-10; the projection-side
    sibling of the round-9 explode-fusion tax)."""
    grams = F.flatten(
        F.transform(
            F.array(tokenize(normalize_text(c))),
            lambda t: F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))
                ),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        )
    )
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via inverted shingle index
# ---------------------------------------------------------------------------


def _drop_hot_shingles(
    inv: DataFrame,
    df_cap: int | None = None,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Remove shingles whose document frequency exceeds ``df_cap`` from an
    inverted index before a pair join.

    A boilerplate shingle shared by k documents contributes k² rows to the
    shingle self-join — one viral template can dominate the whole shuffle.
    After the drop, per-doc set sizes are RECOMPUTED over the retained
    shingles, so the scores downstream are Jaccard/containment over the
    non-boilerplate shingle space (C4-style: scrub templates, then dedup).
    Exact clones still score 1.0 however much boilerplate they carry;
    docs sharing ONLY boilerplate produce no index rows at all and can
    never pair.  The hot set is tiny by construction (heavy hitters), so
    the anti-join is a broadcast; the size recompute is one window over
    the doc id and only runs in capped mode.

    Pass either ``df_cap`` (hot set measured on ``inv`` itself — the
    self-join callers) or a precomputed ``hot`` frame of shingle keys
    (cross-corpus callers measure document frequency on the corpus side
    and scrub BOTH indexes with the same set)."""
    if df_cap is None and hot is None:
        # without the guard, F.col("__df") > None filters the hot frame
        # to empty and the "cap" silently becomes a no-op scrub
        raise ValueError("_drop_hot_shingles needs df_cap or hot")
    if hot is None:
        hot = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > df_cap)
            .select("shingle")
        )
    kept = inv.join(F.broadcast(hot), "shingle", "left_anti")
    return kept.withColumn(
        "sh_size", F.count("*").over(Window.partitionBy("id")).cast("int")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.

    Plan: explode distinct shingles → inverted index → self-join on shingle
    (the only shuffle is on the shingle key) → per-pair intersection count →
    Jaccard against the per-doc set sizes.  At scale, feed this CANDIDATE
    pairs (from LSH) instead of the raw corpus — see `minhash_lsh_dedup`.

    The shingle table is persisted (it feeds the self-join twice; Catalyst
    does not reuse non-identical exchanges) and the self-join is hinted
    shuffle-hash — a broadcast of the inverted index would both duplicate
    the shingle computation and ship the whole index to every task.
    Measured 4× on the sf0.1 corpus.

    Two shuffle-size choices that matter at corpus scale: the inverted
    index shuffles 64-bit ``xxhash64(shingle)`` keys instead of shingle
    strings (8 bytes vs tens; intersection counts are unchanged short of a
    2^-64 collision), and each doc's set size rides along in the index row
    so Jaccard needs no post-hoc size joins — the per-pair aggregate is
    the last shuffle in the plan.

    ``df_cap`` (document-frequency cap) drops shingles present in more
    than that many documents before the self-join and rescores over the
    retained shingle space — see :func:`_drop_hot_shingles` for the
    boilerplate-scrubbed semantics and why this bounds the k² blow-up.
    ``None`` (the default, used by the oracled q53) keeps exact
    semantics; corpus-scale callers should set it
    (``boilerplate_ngram_stats`` measures how much a corpus needs it).
    """
    sh = track(
        fan_out(df)
        .select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
        .withColumn("sh_size", F.size("sh"))
        .persist()
    )
    inv = sh.select(
        "id", "sh_size", F.explode("sh").alias("__s")
    ).select("id", "sh_size", F.xxhash64("__s").alias("shingle"))
    if df_cap is not None:
        # persist the CAPPED index: the self-join below references it on
        # both sides, and without a barrier the whole scrub subtree —
        # hot-shingle aggregate, broadcast anti-join, and the per-doc
        # size-recompute window (a full shuffle of the index) — executed
        # once PER SIDE (two duplicate Window+Exchange subtrees in q211's
        # physical plan, round-13 optimization pass).  Size class is the
        # already-persisted shingle table's, so no new memory hazard.
        inv = track_persist(_drop_hot_shingles(inv, df_cap))
    pairs = (
        inv.alias("a")
        .hint("shuffle_hash")
        .join(inv.alias("b"), on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh_size").alias("size_a"),
            F.col("b.sh_size").alias("size_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_incoming(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Survivors of an INCOMING batch deduplicated against an EXISTING
    corpus: drops exact duplicates (md5 fingerprint of normalized text)
    and near-duplicates (shingle Jaccard ≥ ``threshold`` against ANY
    corpus document).  Returns the surviving ``new_df`` rows unchanged.

    This is the steady-state ingestion op: once a training corpus exists,
    every new crawl must be deduped AGAINST it — re-running all-pairs
    dedup over old ∪ new re-pays the old×old work forever.  Here corpus
    rows only ever join against incoming rows (the inverted-index join
    keys on the shingle, and the corpus side never self-joins), so cost
    is O(|new| · overlap), independent of |corpus|².  The streaming twin
    (`streaming/incremental.py` corpus-dedup stream) maintains the
    fingerprint store incrementally; this is the batch form with the
    near-dup stage added.

    ``df_cap`` (optional) measures shingle document frequency on the
    CORPUS side and drops hot (boilerplate) shingles from both sides
    before the join, with per-doc sizes recomputed over the retained
    space — same semantics as :func:`ngram_jaccard_pairs`'s cap.
    """
    from .text import fingerprint_md5

    # stage 1: exact fingerprint anti-join (8/16-byte shuffle keys)
    corpus_fp = corpus_df.select(
        fingerprint_md5(text_col).alias("__fp")
    ).distinct()
    stage1 = (
        new_df.withColumn("__fp", fingerprint_md5(text_col))
        .join(corpus_fp, "__fp", "left_anti")
        .drop("__fp")
    )

    # stage 2: near-dup anti-join via a new-index × corpus-index join.
    # The shingle array is PERSISTED before the explode (the
    # ngram_jaccard_pairs discipline): fused into one codegen stage,
    # explode(word_shingles(...)) re-evaluates the whole shingle
    # expression per OUTPUT row — measured 50 s vs 3.5 s for the same
    # 50k-doc index at sf1
    def index_of(df: DataFrame) -> DataFrame:
        sh = track(
            fan_out(df)
            .select(
                F.col(id_col).alias("id"),
                word_shingles(text_col, n).alias("sh"),
            )
            .withColumn("sh_size", F.size("sh"))
            .persist()
        )
        return sh.select(
            "id", "sh_size", F.explode("sh").alias("__s")
        ).select("id", "sh_size", F.xxhash64("__s").alias("shingle"))

    inv_new = index_of(stage1)
    inv_old = index_of(corpus_df)
    if df_cap is not None:
        # document frequency measured on the CORPUS side; both indexes
        # scrubbed with the same hot set (shared rescoring semantics)
        hot = (
            inv_old.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > df_cap)
            .select("shingle")
        )
        inv_new = _drop_hot_shingles(inv_new, hot=hot)
        inv_old = _drop_hot_shingles(inv_old, hot=hot)
    dup_ids = (
        inv_new.alias("a")
        .hint("shuffle_hash")
        .join(inv_old.alias("b"), on="shingle")
        .groupBy(
            F.col("a.id").alias("__nid"),
            F.col("b.id").alias("__oid"),
            F.col("a.sh_size").alias("__sa"),
            F.col("b.sh_size").alias("__sb"),
        )
        .agg(F.count("*").alias("__inter"))
        .filter(
            F.col("__inter")
            / (F.col("__sa") + F.col("__sb") - F.col("__inter"))
            >= threshold
        )
        .select(F.col("__nid").alias(id_col))
        .distinct()
    )
    return stage1.join(dup_ids, on=id_col, how="left_anti")


def build_dedup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """The PERSISTENT dedup-index rows for a document batch:
    ``(doc_id, fp, sh, sh_size)`` with ``fp`` the exact-dup md5
    fingerprint and ``sh`` the xxhash64'd word-``n``-gram shingle set
    (8 bytes/shingle — the q140/q290 hashed-key discipline; hashing
    inside the array ≡ hashing after explode, so joins against it are
    bit-identical to the text-derived index).

    Round-13 multi-release depth: `dedup_incoming` re-derives
    fingerprints AND shingles from the full released corpus TEXT on
    every release — O(corpus) regex/shingle work per increment,
    forever.  Persisting these rows once per released doc turns the
    steady-state release into O(incoming) compute: the corpus side of
    the dedup join reads four columnar fields and never touches text
    again.  `release_corpus(dedup_index_table=...)` maintains the
    index and self-heals any gap (crash between the release append and
    the index append, or a pre-index table) by rebuilding exactly the
    missing docs' rows."""
    from .text import fingerprint_md5

    return (
        fan_out(df)
        .select(
            F.col(id_col).alias("doc_id"),
            fingerprint_md5(text_col).alias("fp"),
            word_shingles(text_col, n).alias("__sh_raw"),
        )
        .select(
            "doc_id",
            "fp",
            F.transform(
                "__sh_raw", lambda s: F.xxhash64(s)
            ).alias("sh"),
            F.size("__sh_raw").alias("sh_size"),
            # layout key for the ACID index table (tx_append_partitioned
            # wants one); 16 hash buckets keep append parallelism and
            # file counts sane at any corpus size.  Readers ignore it.
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(16))
            .cast("string")
            .alias("bucket"),
        )
    )


def dedup_incoming_indexed(
    new_df: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """`dedup_incoming` with the corpus side supplied as a PERSISTED
    index (`build_dedup_index` rows) instead of raw text — result-
    identical by construction (test-pinned), but the corpus cost is a
    columnar read of (fp, sh, sh_size): no text normalization, no
    shingle regex, no md5 over already-released documents.

    Same two stages: exact-fingerprint anti-join, then the hashed-
    shingle inverted-index join with document frequency measured on
    the CORPUS side when ``df_cap`` is set (both sides scrubbed with
    the same hot set, sizes rescored — `_drop_hot_shingles`)."""
    from .text import fingerprint_md5

    # stage 1: exact fingerprint anti-join against the index's fp set
    corpus_fp = index_df.select(
        F.col("fp").alias("__fp")
    ).distinct()
    stage1 = (
        new_df.withColumn("__fp", fingerprint_md5(text_col))
        .join(corpus_fp, "__fp", "left_anti")
        .drop("__fp")
    )

    # stage 2: incoming text-derived index × persisted corpus index
    sh = track(
        fan_out(stage1)
        .select(
            F.col(id_col).alias("id"),
            word_shingles(text_col, n).alias("sh"),
        )
        .withColumn("sh_size", F.size("sh"))
        .persist()
    )
    inv_new = sh.select(
        "id", "sh_size", F.explode("sh").alias("__s")
    ).select("id", "sh_size", F.xxhash64("__s").alias("shingle"))
    inv_old = index_df.select(
        F.col("doc_id").alias("id"),
        "sh_size",
        F.explode("sh").alias("shingle"),
    )
    if df_cap is not None:
        hot = (
            inv_old.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > df_cap)
            .select("shingle")
        )
        inv_new = _drop_hot_shingles(inv_new, hot=hot)
        inv_old = _drop_hot_shingles(inv_old, hot=hot)
    dup_ids = (
        inv_new.alias("a")
        .hint("shuffle_hash")
        .join(inv_old.alias("b"), on="shingle")
        .groupBy(
            F.col("a.id").alias("__nid"),
            F.col("b.id").alias("__oid"),
            F.col("a.sh_size").alias("__sa"),
            F.col("b.sh_size").alias("__sb"),
        )
        .agg(F.count("*").alias("__inter"))
        .filter(
            F.col("__inter")
            / (F.col("__sa") + F.col("__sb") - F.col("__inter"))
            >= threshold
        )
        .select(F.col("__nid").alias(id_col))
        .distinct()
    )
    return stage1.join(dup_ids, on=id_col, how="left_anti")


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    df_cap: int | None = None,
) -> DataFrame:
    """DIRECTED near-containment pairs: ``(id_a, id_b, containment)`` with
    containment = |A ∩ B| / |A| ≥ threshold, A ≠ B.

    Jaccard misses sub-document duplication — a doc pasted inside a much
    larger one scores |A|/|B| ≈ 0 on Jaccard but 1.0 on containment, and
    web corpora are full of exactly that (quoted articles, boilerplate
    wrappers).  Same inverted-index plan as `ngram_jaccard_pairs` (one
    shuffle on 8-byte hashed shingles, set sizes ride in the index rows);
    only the final scoring divides by ONE side's size and keeps both
    directions.  Feed LSH candidates instead of the raw corpus at scale.
    """
    sh = track(
        fan_out(df)
        .select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
        .withColumn("sh_size", F.size("sh"))
        .persist()
    )
    inv = sh.select(
        "id", "sh_size", F.explode("sh").alias("__s")
    ).select("id", "sh_size", F.xxhash64("__s").alias("shingle"))
    if df_cap is not None:
        # same self-join-reads-it-twice barrier as ngram_jaccard_pairs
        # (round-13 optimization pass)
        inv = track_persist(_drop_hot_shingles(inv, df_cap))
    pairs = (
        inv.alias("a")
        .hint("shuffle_hash")
        .join(inv.alias("b"), on="shingle")
        .filter(F.col("a.id") != F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh_size").alias("size_a"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.withColumn(
            "containment", F.round(F.col("inter") / F.col("size_a"), 6)
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def boilerplate_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n: int = 3,
    doc_frac: float = 0.25,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate exposure: the fraction of a doc's word
    ``n``-grams that are *boilerplate* — shingles occurring in more than
    ``doc_frac`` of the documents from the same ``group_col`` (site /
    crawl / template family).  C4-style template scrubbing works exactly
    this way (there line-level; shingle-level is robust to reflowed text).

    Returns ``(doc_id, n_shingles, n_boiler, boiler_ratio)``.

    Plan: one inverted index (shingles already distinct per doc, so
    ``count(*)`` IS document frequency), a broadcast of per-group doc
    counts, and a final per-doc aggregate — two shuffles total, both on
    keys that shrink with dedup.  The boilerplate set is per-group, so a
    100 TB corpus never builds a global frequency table.

    Groups with fewer than ``min_docs`` documents contribute no
    boilerplate — in a 1-doc group EVERY shingle trivially clears any
    document-frequency threshold, so the metric degenerates without the
    floor.
    """
    base = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        word_shingles(text_col, n).alias("sh"),
    )
    inv = track(base.select(
        "id", "grp", F.explode("sh").alias("shingle")
    ).persist())
    group_sizes = inv.groupBy("grp").agg(
        F.count_distinct("id").alias("n_docs")
    )
    doc_freq = inv.groupBy("grp", "shingle").agg(
        F.count("*").alias("df")
    )
    boiler = (
        doc_freq.join(F.broadcast(group_sizes), on="grp")
        .filter(
            (F.col("n_docs") >= min_docs)
            & (F.col("df") > F.col("n_docs") * doc_frac)
        )
        .select("grp", "shingle", F.lit(1).alias("is_boiler"))
    )
    return (
        inv.join(boiler, on=["grp", "shingle"], how="left")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("is_boiler"), F.lit(0)).alias("n_boiler"),
        )
        .withColumn(
            "boiler_ratio",
            F.round(F.col("n_boiler") / F.col("n_shingles"), 6),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """``(id, sh)`` — each document's distinct shingle set, computed once.
    Callers that need both signatures and exact verification share this
    frame (persist it) so the corpus is shingled a single time."""
    return fan_out(df).select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )


def portable_hash60(c: Column | str, salt: str) -> Column:
    """60-bit salted hash computable identically in any engine with md5:
    the first 15 hex chars of ``md5(salt || value)`` as a non-negative
    BIGINT.  ~4× slower than xxhash64 (md5 + string slicing) — use for
    cross-engine-verifiable runs; keep xxhash64 for production throughput.
    DuckDB twin: ``CAST(('0x' || substr(md5(salt || v), 1, 15)) AS BIGINT)``.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    shingles: DataFrame | None = None,
    portable: bool = False,
) -> DataFrame:
    """k min-hashes per document as ``(id, mh0..mh{k-1})``.

    Shape matters at scale: explode shingles once, hash each shingle k ways
    in a single projection, and take k ``min()`` aggregates in one shuffle
    on the doc id.  (The tempting all-expression form — k
    ``array_min(transform(...))`` columns — gets inlined by CollapseProject
    into every downstream reference and recomputes the whole signature per
    band: measured 16× slower.)

    ``portable=True`` swaps xxhash64 for :func:`portable_hash60` so the
    whole signature is reproducible in other engines (oracle-verifiable).
    """
    sh = shingles if shingles is not None else shingle_table(df, text_col, id_col, n)
    exploded = sh.select("id", F.explode("sh").alias("shingle"))

    def h(k: int) -> Column:
        if portable:
            return portable_hash60("shingle", f"mh{k}:")
        return F.xxhash64(F.concat(F.lit(f"mh{k}:"), F.col("shingle")))

    return exploded.groupBy("id").agg(
        *[F.min(h(k)).alias(f"mh{k}") for k in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    shingles: DataFrame | None = None,
    portable: bool = False,
    bucket_cap: int | None = None,
    bucket_salts: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows/band = num_hashes/bands; two docs collide when any band of their
    signatures is identical.  The only shuffles are the signature agg and
    the groupBy on band signature; bucket sizes stay small because a band
    signature is rows×64 bits of hash.  Returns distinct (id_a < id_b)
    candidates.

    ``portable=True`` uses md5-derived signature hashes and keeps the
    band bucket as the raw comma-joined signature string (decimal
    rendering is engine-independent; xxhash64 of it is not) — the whole
    candidate set is then bit-reproducible in any md5-capable engine.

    ``bucket_cap``: skew guard for the bucket self-join.  A bucket of k
    documents emits k² join rows in ONE task; a boilerplate-driven mega
    bucket (every doc sharing a viral template collides in some band) can
    stall the stage.  When set, rows in buckets larger than ``bucket_cap``
    are salted: the left side gets ``pmod(xxhash64(id), bucket_salts)``
    and the right side is replicated across all ``bucket_salts`` salt
    values, so the join key becomes (band, bucket, salt).  The candidate
    PAIR SET IS IDENTICAL — each (a, b) still meets exactly once, at salt
    = salt(a) — but the mega bucket's k² work is spread over
    ``bucket_salts`` tasks (the right-side replication is k·salts extra
    rows, negligible next to k²).  Small buckets keep salt 0 on both
    sides and pay nothing.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes,
                             shingles=shingles, portable=portable)

    def bucket(b: int) -> Column:
        joined = F.concat_ws(
            ",", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
        )
        return joined if portable else F.xxhash64(joined)

    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        bucket(b).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    # The bucket join references ``banded`` on BOTH sides (and the
    # bucket_cap path a third time, for the size table); Catalyst does
    # not reuse non-identical subtree exchanges, so without a persist
    # barrier the whole signature aggregation (shingle explode + k mins,
    # the dominant scan) ran once PER SIDE — visible as two duplicate
    # Generate→HashAggregate→Exchange subtrees in q56's physical plan
    # (round-13 optimization pass).  |docs|×bands rows of (id, band,
    # bucket) — 3 longs each — so the block is tiny at any scale.
    banded = track_persist(banded)
    if bucket_cap is None:
        return (
            banded.alias("x")
            .join(banded.alias("y"), on=["band", "bucket"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
    sizes = banded.groupBy("band", "bucket").agg(
        F.count("*").alias("__bsize")
    )
    hot = F.col("__bsize") > bucket_cap
    sized = banded.join(sizes, ["band", "bucket"])
    left = sized.withColumn(
        "salt",
        F.when(hot, F.pmod(F.xxhash64(F.col("id")), F.lit(bucket_salts)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    all_salts = F.array(*[F.lit(i) for i in range(bucket_salts)])
    right = sized.withColumn(
        "salt",
        F.explode(F.when(hot, all_salts).otherwise(F.array(F.lit(0)))),
    )
    return (
        left.alias("x")
        .join(right.alias("y"), on=["band", "bucket", "salt"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    portable: bool = False,
    bucket_cap: int | None = None,
    bucket_salts: int = 16,
) -> DataFrame:
    """LSH candidates → exact-Jaccard verify → pairs ≥ threshold.
    Output schema matches `ngram_jaccard_pairs` (its sparse superset's
    subset): LSH may miss pairs (probabilistic recall), never emits a
    below-threshold pair (the verify step is exact).

    The corpus is shingled ONCE: the persisted shingle table feeds both the
    signature aggregation and the exact-verify joins."""
    sh = track(shingle_table(df, text_col, id_col, n).persist())
    cands = minhash_lsh_candidates(
        df, text_col, id_col, n, num_hashes, bands, shingles=sh,
        portable=portable, bucket_cap=bucket_cap, bucket_salts=bucket_salts,
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(c: Column | str) -> Column:
    """64-bit SimHash of the token multiset: bit i is 1 when the sum of
    (±1 per token, by that token's hash bit i) is positive.  One pass,
    constant output size — the cheapest near-dup signature."""
    toks = tokenize(normalize_text(c))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc + (F.getbit(h, i).cast("long") * 2 - 1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(F.shiftleft(F.element_at(bits, i + 1), i))
    return sig


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """``(id, sig)`` SimHash signatures via explode→aggregate: tokens are
    hashed ONCE, the per-bit ±1 sums are one grouped aggregation (single
    shuffle on the doc id), and the packing references each sum exactly once
    — immune to the CollapseProject recompute blow-up of the pure-expression
    form (see `minhash_signatures`).

    ``portable=True`` uses the 60-bit md5-derived token hash
    (:func:`portable_hash60`) so the signature is reproducible in other
    engines; the production path keeps 64-bit xxhash64."""
    bits = 60 if portable else 64
    tok = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(normalize_text(text_col))).alias("t"),
    )
    tok = tok.select(
        "id",
        (
            portable_hash60("t", "sh:") if portable else F.xxhash64(F.col("t"))
        ).alias("h"),
    )
    agg = tok.groupBy("id").agg(
        *[
            F.sum(F.getbit(F.col("h"), F.lit(i)).cast("long") * 2 - 1).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return agg.select("id", sig.alias("sig"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via the
    block-permutation trick: split the signature into ``blocks`` chunks;
    any pair within the hamming ball shares ≥1 exact chunk (pigeonhole,
    needs blocks > max_hamming), so candidates come from equality joins
    on (block_idx, chunk) — no all-pairs scan."""
    assert blocks > max_hamming, "pigeonhole requires blocks > max_hamming"
    width = (60 if portable else 64) // blocks
    mask = (1 << width) - 1
    sig = simhash_signatures(df, text_col, id_col, portable=portable)
    chunks = sig.select(
        "id", "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("sig"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bc"),
    ).select("id", "sig", "bc.blk", "bc.chunk")
    # same self-join barrier as minhash_lsh_candidates' banded frame:
    # without it the whole signature aggregation (token explode + 64
    # per-bit sums) executed once per join side (round-13 optimization
    # pass); |docs|×blocks rows of 4 longs — tiny at any scale
    chunks = track_persist(chunks)
    return (
        chunks.alias("x")
        .join(chunks.alias("y"), on=["blk", "chunk"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            hamming64(F.col("x.sig"), F.col("y.sig")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# prefix-filtered exact Jaccard (PPJoin-style all-pairs)
# ---------------------------------------------------------------------------


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold —
    identical output to :func:`ngram_jaccard_pairs`, via prefix filtering
    (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07)
    instead of the full inverted-index self-join.

    Order every doc's shingles by ascending global document frequency
    (rarest first; ties by hash).  For Jaccard threshold ``t`` a doc of
    set size ``s`` only needs its first ``s - ceil(t*s) + 1`` shingles in
    the index: if two sets share NO prefix token, every common token sits
    in both suffixes, so ``|A∩B| ≤ min(ceil(t|A|), ceil(t|B|)) - 1 <
    t*min(|A|,|B|)`` — but ``J ≥ t`` forces ``|A∩B| ≥
    t(|A|+|B|)/(1+t)``, which (for t < 1) strictly exceeds
    ``t*min(|A|,|B|)``.  Contradiction, so
    candidate generation over prefixes alone has perfect recall, and the
    exact verify step (array_intersect on the persisted full sets) makes
    precision exact too.

    Scale story vs the full index: at ``t=0.8`` the index shrinks ~5×
    (only ~0.2·s + 1 entries per doc), and because prefixes are the
    RAREST shingles by construction, hot boilerplate shingles — exactly
    the ones that blow up the self-join's per-key fan-out — fall out of
    the index unless a doc is mostly boilerplate.  Verification cost is
    per-candidate and array-local (no second index join): set sizes are
    document-bounded, not corpus-bounded.

    Shuffles: shingle-df aggregation, per-doc rank window (partitioned by
    doc — never global), prefix self-join on the 8-byte hashed shingle,
    candidate distinct, two joins back to the persisted shingle-array
    table.  Each key space is documents or shingles — no corpus² stage.
    """
    sh = track(
        shingle_table(df, text_col, id_col, n)
        .withColumn("sz", F.size("sh"))
        .persist()
    )
    inv = sh.select("id", "sz", F.explode("sh").alias("__s")).select(
        "id", "sz", F.xxhash64("__s").alias("g")
    )
    freq = inv.groupBy("g").agg(F.count("*").alias("__df"))
    prefix_len = (
        F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")) + 1
    )
    prefix = (
        inv.join(freq, "g")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("__df", "g")
            ),
        )
        .filter(F.col("__rn") <= prefix_len)
        .select("id", "g")
    )
    cand = (
        prefix.alias("a")
        .hint("shuffle_hash")
        .join(prefix.alias("b"), on="g")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    scored = (
        cand.join(
            sh.select(
                F.col("id").alias("id_a"),
                F.col("sh").alias("__sa"),
                F.col("sz").alias("__za"),
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("id").alias("id_b"),
                F.col("sh").alias("__sb"),
                F.col("sz").alias("__zb"),
            ),
            "id_b",
        )
        .withColumn("__inter", F.size(F.array_intersect("__sa", "__sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__za") + F.col("__zb") - F.col("__inter")),
                6,
            ),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )
