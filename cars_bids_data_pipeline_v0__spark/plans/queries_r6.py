"""Round-6 query batch.

Opens with q223: the STREAMING ANN index's probe path
(``streaming/ann_index.py::ivf_index_probe``) under the value-hash gate.
Until now the probe was pinned only by tests (probe ≡ batch ``ivf_topk``
bit-for-bit) and benched for cost; no ``queries()`` entry put its RESULT
in front of the DuckDB oracle (round-5 VERDICT directive 6).  The builder
really builds the index — two exactly-once-fenced ``tx_append_partitioned``
batches into a cell-partitioned commit-log table — then probes it, so the
hash evidence covers codebook → cell assignment → fenced append → probed-
cell pruning → exact re-rank → the recall arithmetic itself.

Reference parity: none (the reference has no vector surface,
``load_lambda/main.py`` trusts loads blindly); this closes the similarity
family's last unproven path.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from ..operators import similarity as SIM
from .queries import _t, register

# ---------------------------------------------------------------------------
# q223 — streaming IVF index probe: recall@k vs the exact baseline
# ---------------------------------------------------------------------------

# Deterministic codebook: the embeddings of vec_id 0..NLIST-1, in vec_id
# order — so centroid id == vec_id and DuckDB can reconstruct the exact
# same codebook from the table itself (no k-means in the oracle).  The
# assignment argmin compares UNROUNDED cosines exactly as
# ``nearest_centroid_ids`` does ((-cos, cid) lexicographic); both engines
# sum the dot product left-to-right in doubles, the q187 discipline.
_Q223_NLIST = 8
_Q223_NPROBE = 3
_Q223_K = 10
_Q223_EVERY = 41  # query set: vec_id % 41 == 0 (~13 queries at sf0.01)


def _q223_oracle() -> str:
    cos = (
        "round(list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    rawcos = (
        "list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
    WITH base AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), cents AS (
        SELECT id AS cid, v AS cv FROM base WHERE id < {_Q223_NLIST}
    ), assign AS (  -- every corpus vector's nearest-centroid cell
        SELECT id, cid AS cell FROM (
            SELECT b.id, c.cid, row_number() OVER (
                PARTITION BY b.id
                ORDER BY {rawcos.format(a='b.v', b='c.cv')} DESC, c.cid ASC
            ) AS rn
            FROM base b CROSS JOIN cents c
        ) WHERE rn = 1
    ), q AS (
        SELECT id, v FROM base WHERE id % {_Q223_EVERY} = 0
    ), qcells AS (  -- each query's nprobe nearest cells
        SELECT id, cid AS cell FROM (
            SELECT q.id, c.cid, row_number() OVER (
                PARTITION BY q.id
                ORDER BY {rawcos.format(a='q.v', b='c.cv')} DESC, c.cid ASC
            ) AS rn
            FROM q CROSS JOIN cents c
        ) WHERE rn <= {_Q223_NPROBE}
    ), probe AS (  -- candidates live in probed cells only; re-rank exact
        SELECT qid, cid2 FROM (
            SELECT qc.id AS qid, a.id AS cid2, row_number() OVER (
                PARTITION BY qc.id
                ORDER BY {cos.format(a='q.v', b='b.v')} DESC, a.id ASC
            ) AS rn
            FROM qcells qc
            JOIN assign a ON a.cell = qc.cell
            JOIN q ON q.id = qc.id
            JOIN base b ON b.id = a.id
        ) WHERE rn <= {_Q223_K}
    ), exact AS (
        SELECT qid, cid2 FROM (
            SELECT q.id AS qid, b.id AS cid2, row_number() OVER (
                PARTITION BY q.id
                ORDER BY {cos.format(a='q.v', b='b.v')} DESC, b.id ASC
            ) AS rn
            FROM q CROSS JOIN base b
        ) WHERE rn <= {_Q223_K}
    ), hit AS (
        SELECT e.qid, count(*) AS n_hit
        FROM exact e JOIN probe p ON p.qid = e.qid AND p.cid2 = e.cid2
        GROUP BY e.qid
    ), per_q AS (
        SELECT q.id AS qid, coalesce(hit.n_hit, 0) AS n_hit
        FROM q LEFT JOIN hit ON hit.qid = q.id
    )
    SELECT CAST({_Q223_K} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(n_hit / {_Q223_K}.0), 6) AS mean_recall,
           round(min(n_hit / {_Q223_K}.0), 6) AS min_recall,
           round(avg(CASE WHEN n_hit = {_Q223_K} THEN 1.0 ELSE 0.0 END), 6)
               AS full_recall_frac
    FROM per_q
    """


def _q223_index_path(sf_dir: str) -> str:
    """Deterministic per-corpus scratch location: re-running the builder
    (driver gate, oracle re-checks, bench) finds the fenced batches
    already committed and the appends no-op — idempotent by the txlog's
    own exactly-once contract, not by fragile existence checks.

    The key fingerprints the corpus CONTENT (every embeddings file's
    relative path, size, mtime_ns), not just the directory path — if the
    corpus at the same path is regenerated, the fingerprint changes and a
    fresh index is built instead of silently probing the stale one
    (round-6 ADVICE)."""
    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    root = os.path.join(sf_dir, "embeddings.parquet")
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
    key = h.hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_q223_{key}")


@register(
    "q223_ivf_probe_recall",
    _q223_oracle(),
    doc=(
        "Streaming ANN index probe under the value-hash gate: the builder "
        "appends the corpus into a cell-partitioned commit-log index in "
        "two exactly-once-fenced batches (ivf_index_sink → "
        "tx_append_partitioned), probes it with ivf_index_probe (reads "
        "ONLY the probed cells' files via commit-log partition metadata "
        "— at 100 TB the scan touches nprobe/nlist of the index), and "
        "scores recall@10 against the exact broadcast baseline.  The "
        "codebook is the first NLIST corpus vectors, so DuckDB "
        "independently reconstructs assignment, probing, re-rank, and "
        "the recall arithmetic — streaming-built index ≡ batch IVF is "
        "already pinned bit-for-bit in tests/test_ann_index.py; this "
        "entry puts the probe RESULT itself under the driver's hash"
    ),
)
def q223(spark, sf_dir):
    from ..streaming.ann_index import ivf_index_probe, ivf_index_sink

    e = _t(spark, sf_dir, "embeddings")
    cents = (
        e.filter(F.col("vec_id") < _Q223_NLIST)
        .select("vec_id", SIM.as_double("embedding").alias("v"))
        .orderBy("vec_id")
        .collect()
    )  # NLIST·dim scalars — driver-bounded by the codebook, never the data
    centroids = [list(r.v) for r in cents]

    index = _q223_index_path(sf_dir)
    sink = ivf_index_sink(index, centroids, stream_id="q223")
    sink(e.filter(F.col("vec_id") % 2 == 0), 0)
    sink(e.filter(F.col("vec_id") % 2 == 1), 1)

    q = e.filter(F.col("vec_id") % _Q223_EVERY == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    probe = ivf_index_probe(
        spark, index, q, centroids, k=_Q223_K, nprobe=_Q223_NPROBE
    ).select("q_id", "vec_id")
    exact = SIM.cosine_topk(q, e, k=_Q223_K).select("q_id", "vec_id")

    hits = exact.join(probe, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count("*").alias("n_hit")
    )
    per_q = (
        q.select(F.col("q_id"))
        .join(hits, "q_id", "left")
        .select("q_id", F.coalesce("n_hit", F.lit(0)).alias("n_hit"))
    )
    return per_q.agg(
        F.lit(_Q223_K).cast("long").alias("k"),
        F.count("*").alias("n_queries"),
        F.round(F.avg(F.col("n_hit") / _Q223_K), 6).alias("mean_recall"),
        F.round(F.min(F.col("n_hit") / _Q223_K), 6).alias("min_recall"),
        F.round(
            F.avg(F.when(F.col("n_hit") == _Q223_K, 1.0).otherwise(0.0)), 6
        ).alias("full_recall_frac"),
    )


# ---------------------------------------------------------------------------
# q224 — SemDeDup-style semantic dedup: cluster-scoped cosine prune
# ---------------------------------------------------------------------------

# The published SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540):
# k-means the embedding space, then look for near-duplicate pairs ONLY
# within a cluster — |corpus|²/nlist pairwise work instead of |corpus|²,
# and at 100 TB each cluster's pairs co-locate in one shuffle partition
# keyed by cell.  Distinct from q55/q93 (hyperplane-LSH blocking): the
# blocking structure here is the SAME IVF cell assignment the ANN index
# uses, so one clustering serves retrieval AND dedup.  Deterministic
# survivor rule: a vector is dropped iff some SMALLER-id cell-mate
# matches at >= threshold; its keeper is the smallest such id.
_Q224_NLIST = 8   # floor; nlist scales with the corpus (see _Q224_PER_CELL)
_Q224_TAU = 0.99  # corpus max natural cosine ~0.51; planted twins ~0.9997
_Q224_EVERY = 20  # plant: every 20th vector re-added, perturbed, id+1e6
# SemDeDup's pair work is |corpus|²/nlist: with a FIXED nlist that is
# quadratic in the corpus — the paper scales k with the corpus (k≈10k
# for LAION).  nlist = max(floor, ceil(n/256)) keeps cells ~256 vectors,
# so pair work is ~n·256 — linear — and the cell join fans out across
# the cluster instead of 8 hot partitions.  At sf<=0.1 (n<=2048) the
# adaptive value equals the floor, so small-SF oracle results are
# bit-identical to the fixed-nlist vintage.
_Q224_PER_CELL = 256


def _q224_oracle() -> str:
    cos = (
        "round(list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    rawcos = (
        "list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
    WITH base AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), corpus AS (
        SELECT id, v FROM base
        UNION ALL
        -- DuckDB lambda index i is 1-BASED; Spark's transform index is
        -- 0-based, hence (i-1) here so the perturbations agree bit-for-bit
        SELECT id + 1000000 AS id,
               list_transform(v, (x, i) -> x * (1 + 0.005 * (((i - 1) % 7) - 3)))
        FROM base WHERE id % {_Q224_EVERY} = 0
    ), cents AS (
        SELECT id AS cid, v AS cv FROM base
        WHERE id < (SELECT greatest({_Q224_NLIST},
                                    CAST(ceil(count(*) / {_Q224_PER_CELL}.0)
                                         AS BIGINT))
                    FROM base)
    ), assign AS (
        SELECT id, v, cid AS cell FROM (
            SELECT c2.id, c2.v, c.cid, row_number() OVER (
                PARTITION BY c2.id
                ORDER BY {rawcos.format(a='c2.v', b='c.cv')} DESC, c.cid ASC
            ) AS rn
            FROM corpus c2 CROSS JOIN cents c
        ) WHERE rn = 1
    ), pairs AS (
        SELECT a.id AS keeper, b.id AS dropped,
               {cos.format(a='a.v', b='b.v')} AS sim
        FROM assign a JOIN assign b
          ON a.cell = b.cell AND a.id < b.id
        WHERE {cos.format(a='a.v', b='b.v')} >= {_Q224_TAU}
    )
    SELECT dropped AS dropped_id,
           min(keeper) AS keeper_id,
           min_by(sim, keeper) AS sim
    FROM pairs GROUP BY dropped
    """


@register(
    "q224_semantic_dedup",
    _q224_oracle(),
    doc=(
        "SemDeDup-style semantic dedup (Abbas et al. 2023): k-means-cell "
        "blocking (the q223 deterministic codebook — one clustering "
        "serves ANN retrieval and dedup), then cosine>=0.99 pairs WITHIN "
        "a cell only, smallest-id keeper per dropped vector.  Planted "
        "perturbed twins (every 20th vector, cos~0.9997) give ground "
        "truth; corpus max natural cosine ~0.51 keeps the output exactly "
        "the plant set.  At 100 TB the pair join shuffles by cell id — "
        "|corpus|²/nlist bounded, never all-pairs — and the oracle "
        "recomputes assignment, blocking, and survivorship independently"
    ),
)
def q224(spark, sf_dir):
    from ..streaming.ann_index import assign_cells

    e = _t(spark, sf_dir, "embeddings")
    base = e.select("vec_id", SIM.as_double("embedding").alias("v"))
    planted = base.filter(F.col("vec_id") % _Q224_EVERY == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: x * (1.0 + 0.005 * ((i % 7) - 3.0))
        ).alias("v"),
    )
    from ..operators.dedup_docs import fan_out

    # fan_out: the assignment fold (|corpus|·nlist cosines) is a narrow
    # map — an under-partitioned parquet (one row group) would otherwise
    # run it on two cores at 10× volume
    corpus = fan_out(base.unionByName(planted))

    # adaptive codebook size: cells stay ~_Q224_PER_CELL vectors, so the
    # within-cell pair join is linear in the corpus, not |corpus|²/8
    # (one bounded driver scalar + a <=nlist-row collect, never data)
    import math as _math

    n_base = base.count()
    nlist = max(_Q224_NLIST, _math.ceil(n_base / _Q224_PER_CELL))
    cents = (
        base.filter(F.col("vec_id") < nlist).orderBy("vec_id").collect()
    )
    centroids = [list(r.v) for r in cents]
    from ..cache import track_persist

    # persist: both sides of the cell self-join read the assignment —
    # without this the |corpus|·nlist cosine fold runs twice
    assigned = track_persist(assign_cells(corpus, centroids, vec_col="v"))

    a = assigned.select(
        F.col("vec_id").alias("keeper"),
        F.col("v").alias("av"),
        F.col("__ivf_cell").alias("cell"),
    )
    b = assigned.select(
        F.col("vec_id").alias("dropped"),
        F.col("v").alias("bv"),
        F.col("__ivf_cell").alias("cell"),
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("keeper") < F.col("dropped"))
        .select(
            "keeper",
            "dropped",
            F.round(SIM.cosine(F.col("av"), F.col("bv")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= _Q224_TAU)
    )
    return pairs.groupBy(F.col("dropped").alias("dropped_id")).agg(
        F.min("keeper").alias("keeper_id"),
        F.min(F.struct("keeper", "sim")).getField("sim").alias("sim"),
    )


# ---------------------------------------------------------------------------
# q225 — distributed BPE merge step (tokenizer training support)
# ---------------------------------------------------------------------------

# The byte-pair-encoding training loop (Sennrich et al. 2016, the
# algorithm behind GPT/Llama tokenizer vocabularies): count adjacent
# symbol pairs ACROSS THE WORD-FREQUENCY TABLE (never the raw corpus —
# the standard trick that makes each iteration O(|vocab|), not
# O(|corpus|)), merge the argmax pair everywhere, recount.  Two
# iterations here — enough to pin the whole loop shape (count → argmax
# → merge application → recount) under one value hash.  The merged
# symbol is the 0x01 sentinel (one char, so position-window pair
# generation keeps working), rendered as '_' in the output.
_Q225_TOPK = 10


def _q225_oracle() -> str:
    return f"""
    WITH words AS (
        SELECT w AS word, count(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        GROUP BY w
    ), p1 AS (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS freq FROM (
            SELECT unnest(list_transform(
                       generate_series(1, len(word) - 1),
                       i -> substr(word, i, 2))) AS pair,
                   freq
            FROM words
        ) GROUP BY pair
    ), top1 AS (
        SELECT pair FROM p1 ORDER BY freq DESC, pair LIMIT 1
    ), w2 AS (
        SELECT replace(word, (SELECT pair FROM top1), chr(1)) AS word, freq
        FROM words
    ), p2 AS (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS freq FROM (
            SELECT unnest(list_transform(
                       generate_series(1, len(word) - 1),
                       i -> substr(word, i, 2))) AS pair,
                   freq
            FROM w2 WHERE len(word) >= 2
        ) GROUP BY pair
    ), ranked AS (
        SELECT 1 AS iter, pair, freq,
               CAST(row_number() OVER (ORDER BY freq DESC, pair) AS INT)
                   AS rank
        FROM p1
        UNION ALL
        SELECT 2, pair, freq,
               CAST(row_number() OVER (ORDER BY freq DESC, pair) AS INT)
        FROM p2
    )
    SELECT iter, replace(pair, chr(1), '_') AS pair, freq, rank
    FROM ranked WHERE rank <= {_Q225_TOPK}
    """


@register(
    "q225_bpe_merge_step",
    _q225_oracle(),
    doc=(
        "distributed BPE tokenizer-training loop, two iterations under "
        "one value hash: adjacent-pair counts over the WORD-FREQUENCY "
        "table (each iteration costs O(|vocab|), never O(|corpus|) — "
        "the corpus is scanned exactly once to build word counts), "
        "argmax merge via a broadcast one-row join kept fully in-plan "
        "(no driver collect), literal string replace applies the merge "
        "as a narrow map, recount, top-10 per iteration.  Pair counts "
        "partial-aggregate map-side and the pair space is "
        "alphabet²-bounded, so at 100 TB the only corpus-sized work is "
        "the initial word count — exactly how production BPE trainers "
        "shard (complements q184's fixed fertility proxy with the real "
        "algorithm)"
    ),
)
def q225(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
        )
        .filter(
            F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2)
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )

    def pair_counts(w):
        return (
            w.filter(F.length("word") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.length("word") - 1),
                        lambda i: F.col("word").substr(i, F.lit(2)),
                    )
                ).alias("pair"),
                "freq",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("freq"))
        )

    p1 = pair_counts(words)
    # argmax pair via min(struct(-freq, pair)): lexicographic struct
    # ordering IS the (freq DESC, pair ASC) tiebreak, and unlike a
    # row_number window the aggregate partial-combines map-side
    top1 = p1.agg(
        F.min(F.struct((-F.col("freq")).alias("nf"), F.col("pair")))
        .getField("pair")
        .alias("top_pair")
    )
    w2 = words.crossJoin(F.broadcast(top1)).select(
        F.replace(F.col("word"), F.col("top_pair"), F.lit("\x01")).alias(
            "word"
        ),
        "freq",
    )
    p2 = pair_counts(w2)

    ranked = p1.select(F.lit(1).alias("iter"), "pair", "freq").unionByName(
        p2.select(F.lit(2).alias("iter"), "pair", "freq")
    )
    w_rank = Window.partitionBy("iter").orderBy(
        F.col("freq").desc(), F.col("pair").asc()
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _Q225_TOPK)
        .select(
            "iter",
            F.replace(F.col("pair"), F.lit("\x01"), F.lit("_")).alias("pair"),
            "freq",
            "rank",
        )
    )
