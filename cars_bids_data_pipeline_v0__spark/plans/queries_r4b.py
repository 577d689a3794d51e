"""Round-4 query batch, second half (q180+): set-similarity joins via
prefix filtering, planner-aid join-size estimation, privacy/governance
audits, positional phrase search, tokenizer economics, bounded graph
expansion, and grid-blocked spatial nearest neighbor.

Registered into the shared REGISTRY (plans/queries.py) like every other
batch; oracle discipline identical — alias parity, ROUND on doubles,
tokenization shared with q29/q50/q53.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..cache import track
from ..operators.dedup_docs import prefix_filter_jaccard_pairs
from ..operators.sampling import md5_unit
from ..operators.text import bpe_ish_token_count, normalize_text, tokenize
from .queries import _t, register

# ---------------------------------------------------------------------------
# q180 — prefix-filtered exact Jaccard pairs (PPJoin-style).  Same answer
# as q53 (same shingles, same threshold), different — strictly smaller —
# candidate space: only document-frequency-ordered prefixes enter the
# self-join.  The oracle is therefore q53's oracle verbatim: the whole
# point of prefix filtering is that it changes the plan, not the result.
# ---------------------------------------------------------------------------


@register(
    "q180_prefix_filter_jaccard",
    """
    WITH sh AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        FROM (
            SELECT doc_id,
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       '\\s+') AS t
            FROM documents
        )
    ), inv AS (
        SELECT id, unnest(s) AS shingle FROM sh
    ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM inv a JOIN inv b USING (shingle)
        WHERE a.id < b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(CAST(inter AS DOUBLE)
                 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM pairs
    JOIN (SELECT id, len(s) AS sz FROM sh) sa ON sa.id = id_a
    JOIN (SELECT id, len(s) AS sz FROM sh) sb ON sb.id = id_b
    WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= 0.25
    """,
    doc=(
        "prefix-filtered exact 3-gram Jaccard pairs (Bayardo/PPJoin): "
        "index only each doc's s - ceil(t*s) + 1 RAREST shingles "
        "(global-df order), self-join prefixes for candidates, verify "
        "exactly on the persisted full sets.  Perfect recall by the "
        "prefix pigeonhole bound, so the oracle is q53's inverted-index "
        "SQL verbatim — equality with q53 is also pinned by a test.  At "
        "corpus scale the index shrinks ~(1-t)x and boilerplate "
        "(high-df) shingles drop out of the join key space entirely — "
        "the hot-key blow-up q53 needs df_cap for never forms here"
    ),
)
def q180(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(d, n=3, threshold=0.25)


# ---------------------------------------------------------------------------
# q181 — join-size estimation from per-key count tables (the planner aid:
# predict |A JOIN B| and its skew WITHOUT executing the join)
# ---------------------------------------------------------------------------

_EDGES = [
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


def _edge_sql(edge, lt, lk, rt, rk):
    return f"""
    SELECT '{edge}' AS edge,
           (SELECT count(*) FROM {lt}) AS n_left,
           (SELECT count(*) FROM {rt}) AS n_right,
           CAST(count(*) AS BIGINT) AS n_matching_keys,
           CAST(sum(cl * cr) AS BIGINT) AS est_join_rows,
           CAST(max(cl * cr) AS BIGINT) AS max_key_rows,
           round(max(cl * cr) * count(*)
                 / CAST(sum(cl * cr) AS DOUBLE), 6) AS skew_factor
    FROM (SELECT {lk} AS k, count(*) AS cl FROM {lt} GROUP BY 1) L
    JOIN (SELECT {rk} AS k, count(*) AS cr FROM {rt} GROUP BY 1) R
    USING (k)
    """


@register(
    "q181_join_size_estimate",
    "\nUNION ALL\n".join(_edge_sql(*e) for e in _EDGES)
    + "\nORDER BY edge",
    doc=(
        "planner-aid join cardinality + skew estimation: per-key count "
        "tables on each side, joined on the key (a |keys|-sized join, "
        "not a |rows|-sized one), then sum(cl*cr) = EXACT output "
        "cardinality of the equi-join, max(cl*cr) = the heaviest key's "
        "share, and skew_factor = max/mean — the number that says "
        "whether the real join needs salting/AQE before anyone pays for "
        "running it.  At 100 TB this is two partial-agg scans plus a "
        "tiny key-space join; the estimated join itself never executes"
    ),
)
def q181(spark, sf_dir):
    outs = []
    for edge, lt, lk, rt, rk in _EDGES:
        left = _t(spark, sf_dir, lt)
        right = _t(spark, sf_dir, rt)
        cl = left.groupBy(F.col(lk).alias("k")).agg(
            F.count("*").alias("cl")
        )
        cr = right.groupBy(F.col(rk).alias("k")).agg(
            F.count("*").alias("cr")
        )
        per_key = cl.join(cr, "k").select(
            (F.col("cl") * F.col("cr")).alias("kr")
        )
        est = per_key.agg(
            F.count("*").cast("long").alias("n_matching_keys"),
            F.sum("kr").cast("long").alias("est_join_rows"),
            F.max("kr").cast("long").alias("max_key_rows"),
            F.round(
                F.max("kr") * F.count("*") / F.sum("kr").cast("double"), 6
            ).alias("skew_factor"),
        )
        # one-row × one-row × one-row: broadcast of scalar aggregates,
        # the established bounded-crossJoin shape (cf. q116/q164)
        totals = left.agg(F.count("*").alias("n_left")).crossJoin(
            right.agg(F.count("*").alias("n_right"))
        )
        outs.append(
            totals.crossJoin(est).select(
                F.lit(edge).alias("edge"),
                "n_left",
                "n_right",
                "n_matching_keys",
                "est_join_rows",
                "max_key_rows",
                "skew_factor",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("edge")


# ---------------------------------------------------------------------------
# q182 — k-anonymity audit over quasi-identifiers (release-governance
# gate: can this table ship without re-identification risk?)
# ---------------------------------------------------------------------------

_K_ANON = 5


@register(
    "q182_k_anonymity_audit",
    f"""
    WITH g AS (
        SELECT c_mktsegment AS segment, c_nationkey,
               CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
               count(*) AS c
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_combos,
           CAST(sum(CASE WHEN c < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS risky_combos,
           CAST(sum(CASE WHEN c < {_K_ANON} THEN c ELSE 0 END) AS BIGINT)
               AS risky_rows,
           CAST(min(c) AS BIGINT) AS k_anonymity
    FROM g
    GROUP BY segment
    """,
    doc=(
        "k-anonymity release audit: group sizes over the "
        "quasi-identifier tuple (segment, nation, balance sign); a combo "
        "with fewer than k=5 members re-identifies its customers, so the "
        "per-segment report carries the risky combo/row counts and the "
        "achieved k (min group size).  Two partial aggregations — the "
        "QI space, not the row space, crosses the shuffle"
    ),
)
def q182(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy(
        F.col("c_mktsegment").alias("segment"),
        "c_nationkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .otherwise("pos")
        .alias("bal_sign"),
    ).agg(F.count("*").alias("c"))
    risky = F.col("c") < _K_ANON
    return g.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_combos"),
        F.sum(F.when(risky, 1).otherwise(0)).cast("long").alias(
            "risky_combos"
        ),
        F.sum(F.when(risky, F.col("c")).otherwise(0))
        .cast("long")
        .alias("risky_rows"),
        F.min("c").cast("long").alias("k_anonymity"),
    )


# ---------------------------------------------------------------------------
# q183 — positional phrase search over an inverted index with positions
# (the two-stage retrieval primitive BM25 (q101) can't express: term
# ADJACENCY, not term presence)
# ---------------------------------------------------------------------------

_PHRASES = [
    ("hash join", "hash", "join"),
    ("table scan", "table", "scan"),
    ("row group", "row", "group"),
]


@register(
    "q183_phrase_search",
    f"""
    WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   '\\s+') AS tk
        FROM documents
    ), p(phrase, w1, w2) AS (
        VALUES {", ".join(f"('{p}', '{a}', '{b}')" for p, a, b in _PHRASES)}
    ), hits AS (
        SELECT doc_id, phrase,
               len(list_filter(generate_series(1, len(tk) - 1),
                               i -> tk[i] = w1 AND tk[i+1] = w2)) AS n
        FROM t, p
    )
    SELECT phrase,
           CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_occurrences
    FROM hits
    GROUP BY phrase
    """,
    doc=(
        "exact phrase search via a positional inverted index: posexplode "
        "tokens, filter to the phrase vocabulary BEFORE the shuffle "
        "(the index only ever contains query terms — at 100 TB that "
        "predicate rides the scan and the index is miniscule), then "
        "first-word positions join second-word positions at pos+1 per "
        "doc.  Adjacency via equi-join keys only (doc, pos+1) — no "
        "range or theta join.  Output: per-phrase doc and occurrence "
        "counts"
    ),
)
def q183(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    terms = sorted({w for _, a, b in _PHRASES for w in (a, b)})
    toks = (
        d.select(
            "doc_id",
            F.posexplode(tokenize(normalize_text("text"))).alias(
                "pos", "tok"
            ),
        )
        # selective filter before any shuffle: only phrase vocabulary
        # enters the positional index
        .filter(F.col("tok").isin(terms))
    )
    phrases = d.sparkSession.createDataFrame(
        _PHRASES, "phrase string, w1 string, w2 string"
    )
    first = toks.join(
        F.broadcast(phrases), F.col("tok") == F.col("w1")
    ).select("doc_id", "phrase", "pos", "w2")
    second = toks.select(
        F.col("doc_id").alias("doc_id2"),
        F.col("pos").alias("pos2"),
        F.col("tok").alias("tok2"),
    )
    matched = first.join(
        second,
        (F.col("doc_id") == F.col("doc_id2"))
        & (F.col("pos2") == F.col("pos") + 1)
        & (F.col("tok2") == F.col("w2")),
    )
    counts = matched.groupBy("phrase").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_occurrences"),
    )
    # phrases with zero hits must still report (0, 0) — LEFT join from
    # the phrase list keeps the contract engine-independent
    return (
        phrases.select("phrase")
        .join(counts, "phrase", "left")
        .select(
            "phrase",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_occurrences", F.lit(0))
            .cast("long")
            .alias("n_occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# q184 — tokenizer economics per source: fertility (pieces per word),
# compression (chars per piece), OOV rate against the corpus top-k vocab
# ---------------------------------------------------------------------------

_VOCAB_K = 20


@register(
    "q184_tokenizer_fertility",
    f"""
    WITH tok AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents
    ), vocab AS (
        SELECT w FROM (
            SELECT w, count(*) AS c FROM tok
            GROUP BY w ORDER BY c DESC, w ASC LIMIT {_VOCAB_K}
        )
    ), words AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(CASE WHEN w IN (SELECT w FROM vocab)
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
        FROM tok GROUP BY source
    ), pieces AS (
        SELECT source,
               CAST(sum(len_sum) AS BIGINT) AS n_pieces,
               CAST(sum(length(text)) AS BIGINT) AS n_chars
        FROM (
            SELECT source, text,
                   list_aggregate(list_transform(
                       regexp_split_to_array(trim(lower(text)),
                                             '[^a-z0-9]+'),
                       x -> CAST(ceil(length(x) / 4.0) AS BIGINT)),
                       'sum') AS len_sum
            FROM documents
        )
        GROUP BY source
    )
    SELECT w.source, w.n_words, p.n_pieces, p.n_chars, w.n_oov,
           round(p.n_pieces / CAST(w.n_words AS DOUBLE), 6) AS fertility,
           round(p.n_chars / CAST(p.n_pieces AS DOUBLE), 6)
               AS chars_per_piece,
           round(w.n_oov / CAST(w.n_words AS DOUBLE), 6) AS oov_rate
    FROM words w JOIN pieces p USING (source)
    """,
    doc=(
        "tokenizer cost model per source: whitespace words, BPE-ish "
        "pieces (ceil(len/4) word pieces — the q29-family proxy), "
        "fertility = pieces/word, compression = chars/piece, and OOV "
        "rate against the corpus-global top-20 vocabulary "
        "(count-desc, word-asc tie-break — deterministic in both "
        "engines).  The vocab is a 31-row aggregate → TakeOrdered → "
        "broadcast; the corpus is scanned twice (token explode + "
        "piece-sum projection), both scan-bound.  This table is how "
        "you catch a tokenizer mismatch (fertility spike) per source "
        "before burning GPU-hours on a mis-tokenized corpus"
    ),
)
def q184(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(tokenize(F.trim(F.lower(F.col("text"))))).alias("w"),
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(_VOCAB_K)
        .select("w")
    )
    words = (
        tok.join(
            F.broadcast(vocab.withColumn("__in", F.lit(1))), "w", "left"
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    pieces = d.groupBy("source").agg(
        F.sum(bpe_ish_token_count("text")).cast("long").alias("n_pieces"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )
    return words.join(pieces, "source").select(
        "source",
        "n_words",
        "n_pieces",
        "n_chars",
        "n_oov",
        F.round(F.col("n_pieces") / F.col("n_words").cast("double"), 6)
        .alias("fertility"),
        F.round(F.col("n_chars") / F.col("n_pieces").cast("double"), 6)
        .alias("chars_per_piece"),
        F.round(F.col("n_oov") / F.col("n_words").cast("double"), 6)
        .alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# q185 — bounded two-hop expansion over the co-purchase graph (the
# "customers also bought" reach, with the df-cap discipline from the
# dedup family applied to graph fan-out)
# ---------------------------------------------------------------------------

_RARE_PART_CAP = 20


@register(
    "q185_copurchase_two_hop",
    f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), rare AS (
        SELECT p FROM cp GROUP BY p
        HAVING count(*) <= {_RARE_PART_CAP}
    ), deg AS (
        SELECT a.c AS c, CAST(count(DISTINCT b.c) AS BIGINT)
               AS two_hop_degree
        FROM cp a JOIN rare USING (p) JOIN cp b USING (p)
        WHERE a.c <> b.c
        GROUP BY a.c
    )
    SELECT two_hop_degree, CAST(count(*) AS BIGINT) AS n_customers
    FROM deg GROUP BY two_hop_degree
    """,
    doc=(
        "two-hop reach over the customer-part co-purchase bipartite "
        "graph, reported as a degree histogram (no global ranking "
        "window).  The expansion joins only through RARE parts "
        "(<= 20 distinct buyers) — the same hot-key cap the shingle "
        "joins use, because a part bought by k customers contributes "
        "k^2 pairs: without the cap one commodity part is a quadratic "
        "bomb at 100 TB, with it the per-key fan-out is bounded by "
        "construction.  Hot parts are exactly the uninformative ones "
        "for 'customers-like-you' reach, so the cap is semantics, not "
        "just defense"
    ),
)
def q185(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cp = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    cp = track(cp)
    rare = cp.groupBy("p").agg(F.count("*").alias("__n")).filter(
        F.col("__n") <= _RARE_PART_CAP
    )
    pairs = (
        cp.alias("a")
        .join(rare.select("p"), "p")
        .join(cp.alias("b"), "p")
        .filter(F.col("a.c") != F.col("b.c"))
    )
    deg = pairs.groupBy(F.col("a.c").alias("c")).agg(
        F.countDistinct(F.col("b.c")).cast("long").alias("two_hop_degree")
    )
    return deg.groupBy("two_hop_degree").agg(
        F.count("*").cast("long").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# q186 — grid-blocked spatial nearest neighbor (geohash-style cell
# blocking: candidates come from the 3x3 neighborhood, never all pairs)
# ---------------------------------------------------------------------------

_CELL = 10.0  # grid cell size on the synthetic [0,100)^2 plane


def _coord_sql(axis):
    return (
        f"CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':{axis}'),"
        f" 1, 4)) AS INT) / 65536.0 * 100"
    )


@register(
    "q186_grid_nearest_neighbor",
    f"""
    WITH pts AS (
        SELECT c_custkey AS k,
               {_coord_sql('x')} AS x,
               {_coord_sql('y')} AS y
        FROM customer
    ), cells AS (
        SELECT k, x, y,
               CAST(floor(x / {_CELL}) AS INT) AS cx,
               CAST(floor(y / {_CELL}) AS INT) AS cy
        FROM pts
    ), offs(dx, dy) AS (
        VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
    ), cand AS (
        SELECT a.k AS k, b.k AS nn,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                   AS dist2
        FROM cells a
        JOIN offs o ON true
        JOIN cells b
          ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy AND b.k <> a.k
    )
    SELECT k AS c_custkey, nn AS nn_custkey, round(dist2, 6) AS dist2
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY k ORDER BY dist2, nn) = 1
    """,
    doc=(
        "grid-blocked nearest neighbor on a deterministic synthetic "
        "plane (md5-uniform coords, the engine-portable q19 recipe): "
        "points land in 10x10 cells, candidates come from the 3x3 cell "
        "neighborhood via 9 equi-join probes (explode of a constant "
        "offset array — never a distance theta-join), argmin per point "
        "with a (dist2, key) tie-break window partitioned BY POINT.  "
        "Because any neighbor closer than one cell width is provably "
        "inside the 3x3 block, the result equals brute force whenever "
        "the true NN is within 10 units (pinned by a test); points "
        "whose whole neighborhood is empty drop out.  This is the "
        "geohash/S2 join shape: cost is density-bounded per cell, "
        "never |points|^2"
    ),
)
def q186(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    x = md5_unit(F.concat(key.cast("string"), F.lit(":x"))) * 100
    y = md5_unit(F.concat(key.cast("string"), F.lit(":y"))) * 100
    pts = c.select(
        key.alias("k"),
        x.alias("x"),
        y.alias("y"),
    ).select(
        "k",
        "x",
        "y",
        F.floor(F.col("x") / _CELL).cast("int").alias("cx"),
        F.floor(F.col("y") / _CELL).cast("int").alias("cy"),
    ).persist()
    pts = track(pts)
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = pts.select(
        "k", "x", "y", "cx", "cy", F.explode(offs).alias("o")
    ).select(
        "k",
        "x",
        "y",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    cand = probes.join(
        pts.select(
            F.col("k").alias("nn"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.col("cx").alias("jx"),
            F.col("cy").alias("jy"),
        ),
        ["jx", "jy"],
    ).filter(F.col("nn") != F.col("k"))
    scored = cand.select(
        "k",
        "nn",
        (
            (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
            + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
        ).alias("dist2"),
    )
    # argmin via min(struct(dist2, nn)): lexicographic struct ordering is
    # exactly the (dist2, nn) tie-break, and unlike a row_number window
    # the aggregate partial-combines map-side — the |candidates| rows
    # never sort, only |points| cells shuffle (measured 26 s -> ~8 s at
    # sf0.1)
    best = scored.groupBy("k").agg(
        F.min(F.struct("dist2", "nn")).alias("b")
    )
    return best.select(
        F.col("k").alias("c_custkey"),
        F.col("b.nn").alias("nn_custkey"),
        F.round(F.col("b.dist2"), 6).alias("dist2"),
    )


# ---------------------------------------------------------------------------
# q187 — ANN recall evaluation harness: recall@k of hyperplane-LSH
# candidate generation against exact cosine top-k, both recomputed
# independently by the oracle (the q93 inlined-hyperplane recipe)
# ---------------------------------------------------------------------------

_Q187_DIM = 64
_Q187_PLANES = 4   # few planes ...
_Q187_TABLES = 8   # ... many tables: the general-top-k tuning (lsh_topk doc)
_Q187_K = 10
_Q187_EVERY = 25   # query set: vec_id % 25 == 0


def _q187_oracle() -> str:
    from ..operators.similarity import _plane_signs

    def bucket_expr(salt: str) -> str:
        cases = []
        for p in range(_Q187_PLANES):
            comps = ", ".join(
                repr(x) for x in _plane_signs(_Q187_DIM, p, salt)
            )
            cases.append(
                f"(CASE WHEN list_dot_product(v, [{comps}]) >= 0 "
                f"THEN CAST(1 AS BIGINT) << {p} ELSE 0 END)"
            )
        return "\n                 + ".join(cases)

    tables = "\n            UNION ALL\n".join(
        f"""            SELECT id, {t} AS tbl,
                   {bucket_expr(f't{t}')} AS bucket
            FROM base"""
        for t in range(_Q187_TABLES)
    )
    return f"""
    WITH base AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), q AS (
        SELECT * FROM base WHERE id % {_Q187_EVERY} = 0
    ), exact AS (
        SELECT q.id AS qid, b.id AS cid
        FROM q JOIN base b ON b.id <> q.id
        QUALIFY row_number() OVER (
            PARTITION BY q.id
            ORDER BY round(list_dot_product(q.v, b.v)
                           / (sqrt(list_dot_product(q.v, q.v))
                              * sqrt(list_dot_product(b.v, b.v))), 6) DESC,
                     b.id
        ) <= {_Q187_K}
    ), buckets AS (
{tables}
    ), cand AS (
        SELECT DISTINCT x.id AS qid, y.id AS cid
        FROM buckets x JOIN buckets y USING (tbl, bucket)
        WHERE x.id % {_Q187_EVERY} = 0 AND y.id <> x.id
    ), cnt AS (
        SELECT qid, count(*) AS n_cand FROM cand GROUP BY qid
    ), hit AS (
        SELECT e.qid, count(*) AS n_hit
        FROM exact e JOIN cand c ON c.qid = e.qid AND c.cid = e.cid
        GROUP BY e.qid
    ), per_q AS (
        SELECT q.id AS qid,
               coalesce(cnt.n_cand, 0) AS n_cand,
               coalesce(hit.n_hit, 0) AS n_hit
        FROM q
        LEFT JOIN cnt ON cnt.qid = q.id
        LEFT JOIN hit ON hit.qid = q.id
    )
    SELECT CAST({_Q187_K} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(n_cand), 6) AS avg_candidates,
           round(avg(n_hit / {_Q187_K}.0), 6) AS mean_recall,
           round(min(n_hit / {_Q187_K}.0), 6) AS min_recall,
           round(avg(CASE WHEN n_hit = {_Q187_K} THEN 1.0 ELSE 0.0 END), 6)
               AS full_recall_frac
    FROM per_q
    """


@register(
    "q187_ann_recall_eval",
    _q187_oracle(),
    doc=(
        "ANN evaluation harness: recall@10 of hyperplane-LSH candidate "
        "generation (4 planes x 8 tables — the few-planes/many-tables "
        "general-top-k tuning) measured against exact cosine top-10, "
        "plus candidate-set cost (avg_candidates = what the re-rank "
        "stage pays).  The deterministic sha256 hyperplanes are inlined "
        "into the oracle so DuckDB independently recomputes signatures, "
        "bucket joins, exact ranking, and the recall arithmetic — the "
        "eval itself is under the value-hash gate, not just the index.  "
        "This is the query you run before trusting an ANN index config "
        "at 100 TB: recall/cost trade-off from ONE corpus scan per "
        "table, queries broadcast, no all-pairs stage outside the "
        "broadcast-bounded exact baseline (|Q| x |corpus|, |Q| tiny)"
    ),
)
def q187(spark, sf_dir):
    from ..operators.similarity import as_double, cosine, hyperplane_signature

    base = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), as_double("embedding").alias("v")
    )
    q = base.filter(F.col("id") % _Q187_EVERY == 0)
    # exact top-k baseline: broadcast the tiny query set over one corpus
    # scan (the q54 shape), self excluded, (rounded cosine, id) ranking
    scored = (
        base.crossJoin(
            F.broadcast(
                q.select(F.col("id").alias("qid"), F.col("v").alias("qv"))
            )
        )
        .filter(F.col("id") != F.col("qid"))
        .select(
            "qid",
            F.col("id").alias("cid"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    exact = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _Q187_K)
        .select("qid", "cid")
    )
    # LSH candidate generation: one signature array per vector, exploded
    # into (table, bucket) probes; candidates join on equal buckets only
    buckets = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        hyperplane_signature(
                            "v", _Q187_DIM, _Q187_PLANES, salt=f"t{t}"
                        ).alias("bucket"),
                    )
                    for t in range(_Q187_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    cand = (
        buckets.filter(F.col("id") % _Q187_EVERY == 0)
        .select(F.col("id").alias("qid"), "tbl", "bucket")
        .join(buckets.select(F.col("id").alias("cid"), "tbl", "bucket"),
              ["tbl", "bucket"])
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid")
        .distinct()
    )
    cnt = cand.groupBy("qid").agg(F.count("*").alias("n_cand"))
    hit = exact.join(cand, ["qid", "cid"]).groupBy("qid").agg(
        F.count("*").alias("n_hit")
    )
    per_q = (
        q.select(F.col("id").alias("qid"))
        .join(cnt, "qid", "left")
        .join(hit, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
    )
    kf = float(_Q187_K)
    return per_q.agg(
        F.lit(_Q187_K).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg("n_cand"), 6).alias("avg_candidates"),
        F.round(F.avg(F.col("n_hit") / kf), 6).alias("mean_recall"),
        F.round(F.min(F.col("n_hit") / kf), 6).alias("min_recall"),
        F.round(
            F.avg(F.when(F.col("n_hit") == _Q187_K, 1.0).otherwise(0.0)), 6
        ).alias("full_recall_frac"),
    )


# ---------------------------------------------------------------------------
# q188 — last-touch revenue attribution (as-of join as an analytics
# primitive, not just enrichment: which touch type "causes" purchases?)
# ---------------------------------------------------------------------------


@register(
    "q188_last_touch_attribution",
    """
    WITH p AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type <> 'purchase'
    ), j AS (
        SELECT p.user_id, p.ts, p.value, t.event_type AS et, t.ts AS tts
        FROM p ASOF LEFT JOIN t
          ON p.user_id = t.user_id AND p.ts > t.ts
    )
    SELECT coalesce(et, 'none') AS attributed_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 6) AS total_value,
           round(avg(epoch_ms(ts) - epoch_ms(tts)) / 60000.0, 6)
               AS avg_gap_min
    FROM j
    GROUP BY 1
    """,
    doc=(
        "last-touch attribution: every purchase credited to the user's "
        "most recent STRICTLY-earlier non-purchase event via the as-of "
        "union trick (operators/asof.py — one window shuffle, O(|L|+|R|), "
        "never a per-key range explosion), rolled up per attributed type "
        "with revenue and the time-to-convert gap.  Purchases with no "
        "prior touch report as 'none' (LEFT as-of semantics).  The gap "
        "average is computed over exact integer milliseconds and divided "
        "once — bit-identical across engines, no float-sum order "
        "sensitivity.  Oracle: DuckDB's native ASOF LEFT JOIN replays "
        "the match independently"
    ),
)
def q188(spark, sf_dir):
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    touches = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_type"
    )
    j = asof_join(
        purchases,
        touches,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_type"],
        allow_exact_matches=False,
    )
    # events.ts is TIMESTAMP_NTZ — the epoch_millis_encode cast handles
    # it (C1 recipe); the zone offset cancels in the difference
    from ..functions.scalar import epoch_millis_encode

    gap_ms = epoch_millis_encode("ts") - epoch_millis_encode("ts_asof")
    return (
        j.select(
            F.coalesce(F.col("event_type_asof"), F.lit("none")).alias(
                "attributed_type"
            ),
            "value",
            gap_ms.alias("gap_ms"),
        )
        .groupBy("attributed_type")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.round(F.avg("gap_ms") / 60000.0, 6).alias("avg_gap_min"),
        )
    )


# ---------------------------------------------------------------------------
# q189 — Pareto frontier (skyline) without a global window: bucketed
# two-phase prefix-max, the distributed-skyline shape
# ---------------------------------------------------------------------------


@register(
    "q189_pareto_frontier",
    """
    SELECT a.o_orderkey, a.o_totalprice, a.o_orderdate
    FROM orders a
    WHERE NOT EXISTS (
        SELECT 1 FROM orders b
        WHERE b.o_totalprice < a.o_totalprice
          AND b.o_orderdate > a.o_orderdate
    )
    """,
    doc=(
        "2-D Pareto frontier (skyline: no other order is BOTH strictly "
        "cheaper AND strictly more recent) computed WITHOUT the naive "
        "quadratic anti-join and WITHOUT a global sort window: orders "
        "land in price-range buckets (approx_percentile cut-points — "
        "bucket BALANCE depends on the sketch, bucket CORRECTNESS "
        "doesn't, since any monotone price bucketing preserves the "
        "prefix-max recurrence and ties always co-locate), each bucket "
        "computes its strict-prefix max order-date over DISTINCT prices "
        "(bounded per-bucket window), and cross-bucket prefix maxima "
        "come from a |buckets|-sized self-join — a row is dominated iff "
        "some strictly-cheaper price carries a strictly-later date.  "
        "The oracle states the definition directly as NOT EXISTS; the "
        "engine plan is the one you can run on 100 TB (the only "
        "unbounded shuffles are the bucket groupBys)"
    ),
)
def q189(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    d = o.withColumn(
        "dl", F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
    )
    cuts = o.agg(
        F.expr(
            "approx_percentile(o_totalprice, "
            "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)"
        ).alias("cuts")
    )
    b = (
        d.crossJoin(F.broadcast(cuts))
        .withColumn(
            "bucket",
            F.size(
                F.filter("cuts", lambda c: F.col("o_totalprice") > c)
            ),
        )
        .drop("cuts")
    )
    pg = b.groupBy("bucket", "o_totalprice").agg(F.max("dl").alias("gmax"))
    w = (
        Window.partitionBy("bucket")
        .orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pg2 = pg.select(
        "bucket",
        "o_totalprice",
        F.max("gmax").over(w).alias("prev_in_bucket"),
    )
    bs = pg.groupBy("bucket").agg(F.max("gmax").alias("bmax"))
    prevb = (
        bs.alias("x")
        .join(bs.alias("y"), F.col("y.bucket") < F.col("x.bucket"), "left")
        .groupBy(F.col("x.bucket").alias("bucket"))
        .agg(F.max(F.col("y.bmax")).alias("prev_bucket_max"))
    )
    neg = F.lit(-(1 << 40))
    dominated = (
        F.greatest(
            F.coalesce(F.col("prev_in_bucket"), neg),
            F.coalesce(F.col("prev_bucket_max"), neg),
        )
        > F.col("dl")
    )
    return (
        b.join(pg2, ["bucket", "o_totalprice"])
        .join(F.broadcast(prevb), "bucket", "left")
        .filter(~dominated)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# q190 — centroid silhouette audit: per-label cohesion/separation of the
# embedding space (the label-quality companion to q154/q168)
# ---------------------------------------------------------------------------


@register(
    "q190_embedding_silhouette",
    """
    WITH unnested AS (
        SELECT vec_id, label, u.pos, CAST(u.val AS DOUBLE) AS val
        FROM embeddings,
             LATERAL (SELECT unnest(embedding) AS val,
                             generate_subscripts(embedding, 1) AS pos) u
    ), comp AS (
        SELECT label, pos, round(avg(val), 6) AS m
        FROM unnested GROUP BY 1, 2
    ), cent AS (
        SELECT label AS clabel, list(m ORDER BY pos) AS cv FROM comp
        GROUP BY 1
    ), base AS (
        SELECT vec_id, label,
               list(CAST(val AS DOUBLE) ORDER BY pos) AS v
        FROM unnested GROUP BY 1, 2
    ), sims AS (
        SELECT b.vec_id, b.label, c.clabel,
               round(list_dot_product(b.v, c.cv)
                     / (sqrt(list_dot_product(b.v, b.v))
                        * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
        FROM base b, cent c
    ), per_vec AS (
        SELECT vec_id, label,
               1 - max(CASE WHEN label = clabel THEN sim END) AS a,
               1 - max(CASE WHEN label <> clabel THEN sim END) AS b
        FROM sims GROUP BY 1, 2
    ), scored AS (
        SELECT label, a, b,
               CASE WHEN greatest(a, b) > 0
                    THEN round((b - a) / greatest(a, b), 6)
                    ELSE 0.0 END AS s,
               CASE WHEN b < a THEN 1 ELSE 0 END AS mis
        FROM per_vec
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(a), 4) AS mean_cohesion_dist,
           round(avg(b), 4) AS mean_separation_dist,
           round(avg(s), 4) AS mean_silhouette,
           CAST(sum(mis) AS BIGINT) AS n_misassigned
    FROM scored
    GROUP BY label
    """,
    doc=(
        "centroid-based silhouette audit per label: cohesion = cosine "
        "distance to own centroid, separation = cosine distance to the "
        "nearest OTHER centroid, silhouette = (b-a)/max(a,b), plus the "
        "count of vectors sitting closer to a foreign centroid "
        "(label-noise candidates — the aggregate view of q146's "
        "instance-level miner).  Centroid components are rounded to 6 "
        "before use (the q168 bit-stability recipe: per-dim means of "
        "float32 inputs are exact in double, so the rounded centroids "
        "are engine-identical); per-vector sims round to 6, cross-row "
        "means to 4 (the q154 convention).  Linear cost: |labels| x dim "
        "centroid cells map-side, then one broadcast of the centroid "
        "table over one corpus scan — no pairwise stage"
    ),
)
def q190(spark, sf_dir):
    from ..operators.similarity import as_double, cosine

    e = _t(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", "label", as_double("embedding").alias("v"))
    comp = (
        ev.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
    )
    cent = comp.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: F.round(s["m"], 6),
        ).alias("cv")
    )
    sims = ev.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("sim"),
    )
    per_vec = sims.groupBy("vec_id", "label").agg(
        (
            1
            - F.max(
                F.when(F.col("label") == F.col("clabel"), F.col("sim"))
            )
        ).alias("a"),
        (
            1
            - F.max(
                F.when(F.col("label") != F.col("clabel"), F.col("sim"))
            )
        ).alias("b"),
    )
    scored = per_vec.select(
        "label",
        "a",
        "b",
        F.when(
            F.greatest("a", "b") > 0,
            F.round((F.col("b") - F.col("a")) / F.greatest("a", "b"), 6),
        )
        .otherwise(0.0)
        .alias("s"),
        F.when(F.col("b") < F.col("a"), 1).otherwise(0).alias("mis"),
    )
    return scored.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(F.avg("a"), 4).alias("mean_cohesion_dist"),
        F.round(F.avg("b"), 4).alias("mean_separation_dist"),
        F.round(F.avg("s"), 4).alias("mean_silhouette"),
        F.sum("mis").cast("long").alias("n_misassigned"),
    )


# ---------------------------------------------------------------------------
# q191 — grouped quantile (Q-Q) normalization table: per-source deciles
# of a score against the global deciles — the broadcastable lookup a
# quantile normalizer applies at scale
# ---------------------------------------------------------------------------

_Q191_PS = [i / 10.0 for i in range(1, 10)]


@register(
    "q191_quantile_normalization_table",
    f"""
    WITH per AS (
        SELECT source,
               quantile_cont(n_chars, 0.1) AS c0,
               quantile_cont(n_chars, 0.2) AS c1,
               quantile_cont(n_chars, 0.3) AS c2,
               quantile_cont(n_chars, 0.4) AS c3,
               quantile_cont(n_chars, 0.5) AS c4,
               quantile_cont(n_chars, 0.6) AS c5,
               quantile_cont(n_chars, 0.7) AS c6,
               quantile_cont(n_chars, 0.8) AS c7,
               quantile_cont(n_chars, 0.9) AS c8
        FROM documents GROUP BY source
    ), g AS (
        SELECT quantile_cont(n_chars, 0.1) AS g0,
               quantile_cont(n_chars, 0.2) AS g1,
               quantile_cont(n_chars, 0.3) AS g2,
               quantile_cont(n_chars, 0.4) AS g3,
               quantile_cont(n_chars, 0.5) AS g4,
               quantile_cont(n_chars, 0.6) AS g5,
               quantile_cont(n_chars, 0.7) AS g6,
               quantile_cont(n_chars, 0.8) AS g7,
               quantile_cont(n_chars, 0.9) AS g8
        FROM documents
    ), src_rows AS (
        SELECT source, CAST(0.1 AS DOUBLE) AS p, c0 AS src_cut FROM per
        UNION ALL SELECT source, CAST(0.2 AS DOUBLE) AS p, c1 AS src_cut FROM per
        UNION ALL SELECT source, CAST(0.3 AS DOUBLE) AS p, c2 AS src_cut FROM per
        UNION ALL SELECT source, CAST(0.4 AS DOUBLE) AS p, c3 AS src_cut FROM per
        UNION ALL SELECT source, CAST(0.5 AS DOUBLE) AS p, c4 AS src_cut FROM per
        UNION ALL SELECT source, CAST(0.6 AS DOUBLE) AS p, c5 AS src_cut FROM per
        UNION ALL SELECT source, CAST(0.7 AS DOUBLE) AS p, c6 AS src_cut FROM per
        UNION ALL SELECT source, CAST(0.8 AS DOUBLE) AS p, c7 AS src_cut FROM per
        UNION ALL SELECT source, CAST(0.9 AS DOUBLE) AS p, c8 AS src_cut FROM per
    ), g_rows AS (
        SELECT CAST(0.1 AS DOUBLE) AS p, g0 AS global_cut FROM g
        UNION ALL SELECT CAST(0.2 AS DOUBLE) AS p, g1 AS global_cut FROM g
        UNION ALL SELECT CAST(0.3 AS DOUBLE) AS p, g2 AS global_cut FROM g
        UNION ALL SELECT CAST(0.4 AS DOUBLE) AS p, g3 AS global_cut FROM g
        UNION ALL SELECT CAST(0.5 AS DOUBLE) AS p, g4 AS global_cut FROM g
        UNION ALL SELECT CAST(0.6 AS DOUBLE) AS p, g5 AS global_cut FROM g
        UNION ALL SELECT CAST(0.7 AS DOUBLE) AS p, g6 AS global_cut FROM g
        UNION ALL SELECT CAST(0.8 AS DOUBLE) AS p, g7 AS global_cut FROM g
        UNION ALL SELECT CAST(0.9 AS DOUBLE) AS p, g8 AS global_cut FROM g
    )
    SELECT s.source, s.p,
           round(s.src_cut, 2) AS src_cut,
           round(gr.global_cut, 2) AS global_cut,
           round(s.src_cut - gr.global_cut, 2) AS cut_gap
    FROM src_rows s JOIN g_rows gr USING (p)
    """,
    doc=(
        "quantile-normalization lookup table: exact interpolated deciles "
        "of doc length per source vs the global deciles (integer inputs "
        "keep R-7 interpolation engine-identical — the q122 recipe).  "
        "Mapping a score x in source s onto "
        "global_cut(ECDF_s(x)) IS quantile normalization; this |sources| "
        "x 9 table is the broadcast side of that map at 100 TB, and "
        "cut_gap is the per-source distribution-drift readout.  Cost: "
        "two partial-merging aggregates over one scan each — the row "
        "space never shuffles"
    ),
)
def q191(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        *[
            F.percentile("n_chars", F.lit(p)).alias(f"c{i}")
            for i, p in enumerate(_Q191_PS)
        ]
    )
    glob = d.agg(
        *[
            F.percentile("n_chars", F.lit(p)).alias(f"g{i}")
            for i, p in enumerate(_Q191_PS)
        ]
    )
    # unpivot both decile vectors to (p, cut) rows, then join on p
    src_rows = per_src.select(
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("p"), F.col(f"c{i}").alias("src_cut")
                    )
                    for i, p in enumerate(_Q191_PS)
                ]
            )
        ).alias("r"),
    ).select("source", F.col("r.p").alias("p"), F.col("r.src_cut").alias("src_cut"))
    glob_rows = glob.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("p"),
                        F.col(f"g{i}").alias("global_cut"),
                    )
                    for i, p in enumerate(_Q191_PS)
                ]
            )
        ).alias("r")
    ).select(F.col("r.p").alias("p"), F.col("r.global_cut").alias("global_cut"))
    return src_rows.join(F.broadcast(glob_rows), "p").select(
        "source",
        "p",
        F.round("src_cut", 2).alias("src_cut"),
        F.round("global_cut", 2).alias("global_cut"),
        F.round(F.col("src_cut") - F.col("global_cut"), 2).alias("cut_gap"),
    )


# ---------------------------------------------------------------------------
# q192 — hierarchical (subtree) rollup over a synthetic customer forest:
# transitive closure by bounded iterative expansion, no recursion in the
# engine — the BOM / org-chart rollup shape
# ---------------------------------------------------------------------------


@register(
    "q192_hierarchy_rollup",
    """
    WITH RECURSIVE anc(node, anc) AS (
        SELECT c_custkey, c_custkey FROM customer
        UNION ALL
        SELECT a.node, a.anc // 10 FROM anc a WHERE a.anc >= 10
    ), rev AS (
        SELECT o_custkey, sum(o_totalprice) AS r FROM orders GROUP BY 1
    )
    SELECT a.anc AS c_custkey,
           round(sum(coalesce(rev.r, 0)), 2) AS subtree_revenue,
           CAST(count(*) AS BIGINT) AS n_subtree_nodes
    FROM anc a LEFT JOIN rev ON rev.o_custkey = a.node
    GROUP BY 1
    """,
    doc=(
        "hierarchical subtree rollup (the BOM/org-chart aggregate): "
        "customers form a synthetic decimal forest (parent = custkey/10), "
        "and every node reports total revenue and node count of its "
        "subtree, self included.  The engine builds the ancestor closure "
        "by BOUNDED iterative parent-hops — depth = ceil(log10(max key)) "
        "read from one scalar aggregate, so a 1500-key forest takes 4 "
        "chained broadcast-joins and a 100 TB key space takes ~12 — "
        "never a recursive driver loop per row, never an unbounded "
        "iteration.  The oracle states the same closure as a RECURSIVE "
        "CTE (the q136/q175 discipline).  Closure size is "
        "nodes x depth — linear, not quadratic, because the tree fans "
        "IN, and the rollup is one groupBy on the ancestor key"
    ),
)
def q192(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("node"))
    o = _t(spark, sf_dir, "orders")
    # bounded scalar: forest depth (same discipline as keys.py max-id)
    max_key = c.agg(F.max("node")).collect()[0][0] or 1
    depth = len(str(int(max_key)))
    anc = c.select("node", F.col("node").alias("anc"))
    frontier = c.select("node", F.col("node").alias("anc"))
    for _ in range(depth):
        frontier = frontier.filter(F.col("anc") >= 10).select(
            "node", F.floor(F.col("anc") / 10).cast("long").alias("anc")
        )
        anc = anc.unionByName(frontier)
    rev = o.groupBy(F.col("o_custkey").alias("node")).agg(
        F.sum("o_totalprice").alias("r")
    )
    return (
        anc.join(rev, "node", "left")
        .groupBy(F.col("anc").alias("c_custkey"))
        .agg(
            F.round(F.sum(F.coalesce("r", F.lit(0.0))), 2).alias(
                "subtree_revenue"
            ),
            F.count("*").cast("long").alias("n_subtree_nodes"),
        )
    )


# ---------------------------------------------------------------------------
# q193 — M4 time-series downsampling: per (series, time-bucket)
# min/max/first/last — the lossless-for-rendering downsample used by
# every observability backend
# ---------------------------------------------------------------------------

_Q193_BUCKETS = 100


@register(
    "q193_m4_downsample",
    f"""
    WITH bounds AS (
        SELECT epoch_ms(min(ts)) AS lo, epoch_ms(max(ts)) AS hi FROM events
    ), pts AS (
        SELECT event_type, event_id, value,
               CAST(((epoch_ms(ts) - b.lo) * {_Q193_BUCKETS})
                    // (b.hi - b.lo + 1) AS BIGINT) AS bucket,
               epoch_ms(ts) AS ms
        FROM events, bounds b
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ms, event_id) AS ra,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ms DESC, event_id DESC) AS rd
        FROM pts
    )
    SELECT event_type, bucket,
           CAST(count(*) AS BIGINT) AS n_points,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(max(CASE WHEN ra = 1 THEN value END), 6) AS first_value,
           round(max(CASE WHEN rd = 1 THEN value END), 6) AS last_value
    FROM ranked
    GROUP BY 1, 2
    """,
    doc=(
        "M4 downsampling (Jugel et al., VLDB'14): per series and "
        "fixed-width time bucket keep min/max/first/last — the four "
        "points that make a line-chart render pixel-identical to the "
        "full series at any zoom level.  Bucket index from exact integer "
        "epoch-ms arithmetic (scalar min/max bounds broadcast from one "
        "aggregate); first/last picked by bounded per-(series, bucket) "
        "rank windows with (ms, event_id) tie-breaks so both engines "
        "choose identically.  At 100 TB this is ONE shuffle on "
        "(series, bucket) — the downsample output is "
        "|series| x {_Q193_BUCKETS} rows no matter how many points come "
        "in"
    ),
)
def q193(spark, sf_dir):
    from ..functions.scalar import epoch_millis_encode

    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(epoch_millis_encode("ts")).alias("lo"),
        F.max(epoch_millis_encode("ts")).alias("hi"),
    )
    pts = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "event_id",
        "value",
        epoch_millis_encode("ts").alias("ms"),
        (
            (epoch_millis_encode("ts") - F.col("lo")) * _Q193_BUCKETS
        ).cast("long").alias("__num"),
        (F.col("hi") - F.col("lo") + 1).alias("__den"),
    ).select(
        "event_type",
        "event_id",
        "value",
        "ms",
        (F.col("__num") - (F.col("__num") % F.col("__den")))
        .cast("long")
        .alias("__flr"),
        "__den",
    ).select(
        "event_type",
        "event_id",
        "value",
        "ms",
        (F.col("__flr") / F.col("__den")).cast("long").alias("bucket"),
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ms").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ms").desc(), F.col("event_id").desc()
    )
    ranked = pts.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.max(F.when(F.col("ra") == 1, F.col("value"))), 6).alias(
            "first_value"
        ),
        F.round(F.max(F.when(F.col("rd") == 1, F.col("value"))), 6).alias(
            "last_value"
        ),
    )


# ---------------------------------------------------------------------------
# q194 — CUPED variance-reduced A/B readout (pre-period covariate
# adjustment): the experimentation-platform primitive that turns weeks
# of extra runtime into one co-moment pass
# ---------------------------------------------------------------------------


@register(
    "q194_cuped_adjusted_ab",
    """
    WITH per_user AS (
        SELECT user_id,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 2 AS variant,
               sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15'
                        THEN value ELSE 0 END) AS pre,
               sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-15'
                        THEN value ELSE 0 END) AS post
        FROM events GROUP BY user_id
    ), moments AS (
        SELECT avg(pre) AS mean_pre,
               (avg(pre * post) - avg(pre) * avg(post))
               / nullif(avg(pre * pre) - avg(pre) * avg(pre), 0) AS theta
        FROM per_user
    ), adjusted AS (
        SELECT u.variant, u.post,
               u.post - m.theta * (u.pre - m.mean_pre) AS adj
        FROM per_user u, moments m
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(post), 4) AS mean_post,
           round(avg(adj), 4) AS mean_adjusted,
           round(avg(post * post) - avg(post) * avg(post), 4) AS var_post,
           round(avg(adj * adj) - avg(adj) * avg(adj), 4) AS var_adjusted
    FROM adjusted
    GROUP BY variant
    """,
    doc=(
        "CUPED (Deng et al., WSDM'13) variance-reduced A/B metric: "
        "pre-period spend as the covariate, theta = cov(pre, post) / "
        "var(pre) fitted on the pooled population in ONE co-moment "
        "aggregate (the q178 recipe), adjusted metric = post - "
        "theta*(pre - mean_pre), reported per md5-hash variant "
        "(the q149 assignment).  var_adjusted < var_post is the whole "
        "point — the same experiment reaches significance on fewer "
        "users.  Every statistic is a partial-aggregable moment: 100 TB "
        "of events reduce map-side to per-user rows, then to two cells"
    ),
)
def q194(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("date")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts").cast("date") < cutoff, F.col("value")).otherwise(
                0.0
            )
        ).alias("pre"),
        F.sum(
            F.when(
                F.col("ts").cast("date") >= cutoff, F.col("value")
            ).otherwise(0.0)
        ).alias("post"),
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        "pre",
        "post",
    )
    moments = per_user.agg(
        F.avg("pre").alias("mean_pre"),
        (
            (F.avg(F.col("pre") * F.col("post")) - F.avg("pre") * F.avg("post"))
            / F.nullif(
                F.avg(F.col("pre") * F.col("pre"))
                - F.avg("pre") * F.avg("pre"),
                F.lit(0.0),
            )
        ).alias("theta"),
    )
    adjusted = per_user.crossJoin(F.broadcast(moments)).select(
        "variant",
        "post",
        (
            F.col("post") - F.col("theta") * (F.col("pre") - F.col("mean_pre"))
        ).alias("adj"),
    )
    return adjusted.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("post"), 4).alias("mean_post"),
        F.round(F.avg("adj"), 4).alias("mean_adjusted"),
        F.round(
            F.avg(F.col("post") * F.col("post"))
            - F.avg("post") * F.avg("post"),
            4,
        ).alias("var_post"),
        F.round(
            F.avg(F.col("adj") * F.col("adj")) - F.avg("adj") * F.avg("adj"),
            4,
        ).alias("var_adjusted"),
    )


# ---------------------------------------------------------------------------
# q195 — dedup pipeline evaluation harness: recall & candidate precision
# of the portable MinHash-LSH banding against exhaustive ground truth on
# a corpus with planted perturbed near-dups (the q187 discipline applied
# to the dedup family)
# ---------------------------------------------------------------------------


def _q195_oracle() -> str:
    from .queries_r2 import _Q90_BAND_CASE, _Q90_BANDS, _Q90_MH

    return f"""
    WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               regexp_replace(text, '^\\s*\\S+\\s*', '')
        FROM documents WHERE doc_id % 10 = 0
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
            FROM base
        )
    ), inv AS (
        SELECT id, unnest(s) AS shingle FROM sh
    ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM inv a JOIN inv b USING (shingle)
        WHERE a.id < b.id
        GROUP BY 1, 2
    ), truth AS (
        SELECT id_a, id_b
        FROM pairs
        JOIN (SELECT id, len(s) AS sz FROM sh) sa ON sa.id = id_a
        JOIN (SELECT id, len(s) AS sz FROM sh) sb ON sb.id = id_b
        WHERE round(CAST(inter AS DOUBLE)
                    / (sa.sz + sb.sz - inter), 6) >= 0.25
    ), sig AS (
        SELECT id,
               {_Q90_MH}
        FROM inv GROUP BY id
    ), banded AS (
        SELECT id, bt.band,
               CASE bt.band
                 {_Q90_BAND_CASE}
               END AS bucket
        FROM sig, (SELECT unnest(range({_Q90_BANDS})) AS band) bt
    ), cands AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM banded x JOIN banded y USING (band, bucket)
        WHERE x.id < y.id
    ), verified AS (
        SELECT id_a, id_b FROM cands c
        JOIN sh sa ON sa.id = c.id_a
        JOIN sh sb ON sb.id = c.id_b
        WHERE round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(sa.s, sb.s))), 6) >= 0.25
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(count(*) AS BIGINT) FROM cands) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM verified) AS n_verified,
           round((SELECT count(*) FROM verified)
                 / CAST((SELECT count(*) FROM truth) AS DOUBLE), 6)
               AS recall,
           round((SELECT count(*) FROM verified)
                 / CAST((SELECT count(*) FROM cands) AS DOUBLE), 6)
               AS candidate_precision
    """


@register(
    "q195_dedup_recall_eval",
    _q195_oracle(),
    doc=(
        "dedup-config evaluation harness: plant a perturbed near-dup "
        "(first token dropped, J ~ 0.87) for every 10th document, then "
        "measure the portable MinHash-LSH banding (q90's 16 hashes x 4 "
        "bands) against EXHAUSTIVE inverted-index ground truth at "
        "t=0.25 — recall = verified/truth, candidate_precision = "
        "verified/candidates (what fraction of bucket-join pairs "
        "survive the verify, i.e. what the verify stage costs).  Both "
        "the banding AND the ground truth replay in DuckDB, so the "
        "eval's own numbers sit under the value-hash gate.  This is the "
        "query you run before committing an LSH config to a 100 TB "
        "dedup pass; the exhaustive truth stage is the |corpus|-bounded "
        "part you only pay at sample scale"
    ),
)
def q195(spark, sf_dir):
    from ..operators import dedup_docs as DD

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.regexp_replace("text", r"^\s*\S+\s*", "").alias("text"),
    )
    corpus = d.unionByName(perturbed)
    # the corpus is shingled ONCE; the persisted table feeds all three
    # stages (exhaustive truth, LSH candidates, exact verify) — the
    # first cut of this harness shingled it three times (review finding)
    sh = track(DD.shingle_table(corpus, n=3).withColumn(
        "sz", F.size("sh")
    ).persist())
    inv = sh.select("id", "sz", F.explode("sh").alias("__s")).select(
        "id", "sz", F.xxhash64("__s").alias("g")
    )
    truth = (
        inv.alias("a")
        .hint("shuffle_hash")
        .join(inv.alias("b"), on="g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("za"),
            F.col("b.sz").alias("zb"),
        )
        .agg(F.count("*").alias("inter"))
        .filter(
            F.round(
                F.col("inter")
                / (F.col("za") + F.col("zb") - F.col("inter")),
                6,
            )
            >= 0.25
        )
        .select("id_a", "id_b")
    )
    cand = DD.minhash_lsh_candidates(
        corpus, n=3, num_hashes=16, bands=4, portable=True,
        shingles=sh.select("id", "sh"),
    )
    verified = (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .filter(
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            )
            >= 0.25
        )
        .select("id_a", "id_b")
    )
    t = truth.agg(F.count("*").cast("long").alias("n_truth"))
    c = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    v = verified.agg(F.count("*").cast("long").alias("n_verified"))
    return (
        t.crossJoin(c)
        .crossJoin(v)
        .select(
            "n_truth",
            "n_candidates",
            "n_verified",
            F.round(
                F.col("n_verified") / F.col("n_truth").cast("double"), 6
            ).alias("recall"),
            F.round(
                F.col("n_verified") / F.col("n_candidates").cast("double"), 6
            ).alias("candidate_precision"),
        )
    )


# ---------------------------------------------------------------------------
# q196 — PSI drift monitor (population stability index) between the two
# halves of the month, per event series — the standard "is this feature
# drifting" production gate
# ---------------------------------------------------------------------------

_PSI_EDGES = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0]  # 8 buckets


def _psi_bucket_sql(col):
    return (
        "CAST("
        + " + ".join(f"CASE WHEN {col} > {e} THEN 1 ELSE 0 END"
                     for e in _PSI_EDGES)
        + " AS BIGINT)"
    )


@register(
    "q196_psi_drift",
    f"""
    WITH pts AS (
        SELECT event_type,
               CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                    THEN 'a' ELSE 'b' END AS period,
               {_psi_bucket_sql('value')} AS bucket
        FROM events
    ), cells AS (
        SELECT event_type, period, bucket, count(*) AS n
        FROM pts GROUP BY 1, 2, 3
    ), grid AS (
        SELECT t.event_type, b.bucket,
               coalesce(a.n, 0) AS na, coalesce(bb.n, 0) AS nb
        FROM (SELECT DISTINCT event_type FROM pts) t
        CROSS JOIN (SELECT unnest(range({len(_PSI_EDGES) + 1})) AS bucket) b
        LEFT JOIN cells a ON a.event_type = t.event_type
                         AND a.bucket = b.bucket AND a.period = 'a'
        LEFT JOIN cells bb ON bb.event_type = t.event_type
                          AND bb.bucket = b.bucket AND bb.period = 'b'
    ), tot AS (
        SELECT event_type, sum(na) AS ta, sum(nb) AS tb FROM grid GROUP BY 1
    ), frac AS (
        SELECT g.event_type, g.bucket,
               (g.na + 0.5) / (t.ta + 0.5 * {len(_PSI_EDGES) + 1}) AS pa,
               (g.nb + 0.5) / (t.tb + 0.5 * {len(_PSI_EDGES) + 1}) AS pb
        FROM grid g JOIN tot t USING (event_type)
    )
    SELECT event_type,
           round(sum((pa - pb) * ln(pa / pb)), 6) AS psi,
           CAST(count(*) AS BIGINT) AS n_buckets
    FROM frac
    GROUP BY event_type
    """,
    doc=(
        "population stability index per event series between the first "
        "and second half of the window: FIXED log-spaced value edges "
        "(engine-identical bucketing — no data-dependent quantile "
        "interpolation on doubles), Laplace 0.5 smoothing so empty "
        "buckets never produce ln(0), PSI = sum (pa-pb)ln(pa/pb).  "
        "Complements q106 (token JS divergence) on the numeric-feature "
        "side; PSI > 0.2 is the classic retrain trigger.  One count "
        "aggregate over the scan; the bucket grid is |series| x 8"
    ),
)
def q196(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    nb = len(_PSI_EDGES) + 1
    bucket = sum(
        (F.when(F.col("value") > edge, 1).otherwise(0) for edge in _PSI_EDGES),
        F.lit(0),
    ).cast("long")
    pts = e.select(
        "event_type",
        F.when(
            F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), "a"
        )
        .otherwise("b")
        .alias("period"),
        bucket.alias("bucket"),
    )
    cells = pts.groupBy("event_type", "period", "bucket").agg(
        F.count("*").alias("n")
    )
    types = pts.select("event_type").distinct()
    buckets = types.sparkSession.range(nb).select(
        F.col("id").alias("bucket")
    )
    grid = (
        types.crossJoin(F.broadcast(buckets))
        .join(
            cells.filter(F.col("period") == "a").select(
                "event_type", "bucket", F.col("n").alias("na")
            ),
            ["event_type", "bucket"],
            "left",
        )
        .join(
            cells.filter(F.col("period") == "b").select(
                "event_type", "bucket", F.col("n").alias("nb")
            ),
            ["event_type", "bucket"],
            "left",
        )
        .select(
            "event_type",
            "bucket",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    tot = grid.groupBy("event_type").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    frac = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        ((F.col("na") + 0.5) / (F.col("ta") + 0.5 * nb)).alias("pa"),
        ((F.col("nb") + 0.5) / (F.col("tb") + 0.5 * nb)).alias("pb"),
    )
    return frac.groupBy("event_type").agg(
        F.round(
            F.sum(
                (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))
            ),
            6,
        ).alias("psi"),
        F.count("*").cast("long").alias("n_buckets"),
    )


# ---------------------------------------------------------------------------
# q197 — HDR-style log2-bucketed latency percentiles: inter-event gaps
# per series, exact integer bucketing, interpolated p50/p90/p99 from the
# bucket histogram — the observability-sketch estimate, deterministic
# ---------------------------------------------------------------------------


@register(
    "q197_log_histogram_latency",
    """
    WITH gaps AS (
        SELECT event_type,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
        QUALIFY gap IS NOT NULL AND gap > 0
    ), b AS (
        SELECT event_type, length(bin(gap)) AS bl, gap FROM gaps
    ), hist AS (
        SELECT event_type, bl,
               CAST(count(*) AS BIGINT) AS n,
               CAST(1 AS BIGINT) << (bl - 1) AS lo,
               (CAST(1 AS BIGINT) << bl) - 1 AS hi
        FROM b GROUP BY event_type, bl
    ), cum AS (
        SELECT *,
               sum(n) OVER (PARTITION BY event_type ORDER BY bl
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS cum_before,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM hist
    ), est AS (
        SELECT event_type, p,
               max(CASE WHEN (p * total + 99) // 100
                             > coalesce(cum_before, 0)
                         AND (p * total + 99) // 100
                             <= coalesce(cum_before, 0) + n
                    THEN round(lo + (hi - lo)
                               * ((p * total + 99) // 100
                                  - coalesce(cum_before, 0) - 1)
                               / CAST(n AS DOUBLE), 4)
               END) AS est_gap_ms
        FROM cum, (SELECT unnest([50, 90, 99]) AS p)
        GROUP BY event_type, p
    )
    SELECT event_type, CAST(p AS BIGINT) AS p, est_gap_ms FROM est
    """,
    doc=(
        "HdrHistogram-style latency percentiles: per-user inter-event "
        "gaps (exact integer ms), log2 buckets via length(bin(gap)) — "
        "pure integer bit-length, no float log to straddle a power of "
        "two — then p50/p90/p99 interpolated inside the owning bucket "
        "from cumulative counts.  Rank targets use integer ceil "
        "division ((p*N + 99) // 100), so every branch decision is "
        "integer-exact in both engines; only the final interpolation "
        "divides.  The histogram is |series| x ~30 rows — THIS is what "
        "ships to the driver at 100 TB, never the raw gaps; estimates "
        "are reconstructible from the sketch alone (mergeable counts)"
    ),
)
def q197(spark, sf_dir):
    from ..functions.scalar import epoch_millis_encode

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    ms = epoch_millis_encode("ts")
    gaps = (
        e.select("event_type", (ms - F.lag(ms).over(w)).alias("gap"))
        .filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
    )
    b = gaps.select("event_type", F.length(F.bin("gap")).alias("bl"))
    hist = b.groupBy("event_type", "bl").agg(
        F.count("*").cast("long").alias("n")
    ).select(
        "event_type",
        "bl",
        "n",
        F.expr("shiftleft(cast(1 as bigint), cast(bl - 1 as int))").alias(
            "lo"
        ),
        F.expr("shiftleft(cast(1 as bigint), cast(bl as int)) - 1").alias(
            "hi"
        ),
    )
    wc = Window.partitionBy("event_type").orderBy("bl").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "*",
        F.sum("n").over(wc).alias("cum_before"),
        F.sum("n").over(wt).alias("total"),
    )
    ps = cum.sparkSession.createDataFrame([(50,), (90,), (99,)], "p int")
    j = cum.crossJoin(F.broadcast(ps))
    target = (F.col("p") * F.col("total") + 99) - (
        (F.col("p") * F.col("total") + 99) % 100
    )
    target = (target / 100).cast("long")
    cb = F.coalesce(F.col("cum_before"), F.lit(0))
    owning = (target > cb) & (target <= cb + F.col("n"))
    est = j.groupBy("event_type", "p").agg(
        F.max(
            F.when(
                owning,
                F.round(
                    F.col("lo")
                    + (F.col("hi") - F.col("lo"))
                    * (target - cb - 1)
                    / F.col("n").cast("double"),
                    4,
                ),
            )
        ).alias("est_gap_ms")
    )
    return est.select(
        "event_type", F.col("p").cast("long").alias("p"), "est_gap_ms"
    )


# ---------------------------------------------------------------------------
# q198 — nested sample manifests: 1% ⊂ 5% ⊂ 25% deterministic corpus
# samples from ONE hash — the learning-curve / scaling-law sampling
# contract (a bigger budget must extend, never replace, a smaller run's
# data)
# ---------------------------------------------------------------------------

_Q198_RATES = [(1, 1), (5, 5), (25, 25)]  # (label_pct, pct threshold)


@register(
    "q198_nested_sample_manifests",
    f"""
    WITH h AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INT) AS u
        FROM documents
    )
    SELECT r.pct, h.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(h.n_tokens) AS BIGINT) AS n_tokens
    FROM h
    JOIN (SELECT unnest([{", ".join(str(p) for p, _ in _Q198_RATES)}])
                 AS pct) r
      ON h.u * 100 < r.pct * 65536
    GROUP BY r.pct, h.source
    """,
    doc=(
        "nested learning-curve samples: membership at rate p is "
        "md5_unit(doc_id) < p, ONE hash per doc, so the 1% sample is a "
        "strict subset of the 5% which is a strict subset of the 25% — "
        "the scaling-law experiment contract (each budget EXTENDS the "
        "previous corpus; re-sampling would invalidate cross-budget "
        "comparisons).  Thresholding uses exact integer arithmetic "
        "(u*100 < p*65536 over the 16-bit hash grain — no float "
        "boundary).  Output: per (rate, source) doc and token budgets.  "
        "Nesting is additionally pinned by a subset test"
    ),
)
def q198(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    from ..operators.text import token_count

    h = d.select(
        "doc_id",
        "source",
        token_count("text").alias("n_tokens"),
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        )
        .cast("int")
        .alias("u"),
    )
    rates = d.sparkSession.createDataFrame(
        [(p,) for p, _ in _Q198_RATES], "pct int"
    )
    return (
        h.join(
            F.broadcast(rates),
            F.col("u") * 100 < F.col("pct") * 65536,
        )
        .groupBy("pct", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q199 — catalog ANALYZE: per-table row counts + key-column statistics
# across the whole star schema (the stats table planners and q181-style
# estimators consume)
# ---------------------------------------------------------------------------

_ANALYZE = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


@register(
    "q199_catalog_analyze",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{t}' AS table_name, '{k}' AS key_col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT {k}) AS BIGINT) AS n_distinct_key,
           CAST(sum(CASE WHEN {k} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_key,
           CAST(min({k}) AS BIGINT) AS key_min,
           CAST(max({k}) AS BIGINT) AS key_max
    FROM {t}"""
        for t, k in _ANALYZE
    )
    + "\nORDER BY table_name",
    doc=(
        "catalog-wide ANALYZE: one stats row per table (rows, key "
        "distinct count, key nulls, key range) across all ten tables — "
        "the statistics layer q181's join estimator and the zone-map "
        "pruner consume, produced by ten independent partial-merging "
        "aggregates (each scans only its key column thanks to parquet "
        "column pruning; Spark runs them as concurrent jobs in the "
        "union).  key_distinct == n_rows is the primary-key integrity "
        "assertion made continuously auditable"
    ),
)
def q199(spark, sf_dir):
    outs = []
    for t, k in _ANALYZE:
        d = _t(spark, sf_dir, t)
        outs.append(
            d.agg(
                F.count("*").cast("long").alias("n_rows"),
                F.countDistinct(k).cast("long").alias("n_distinct_key"),
                F.sum(F.when(F.col(k).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null_key"),
                F.min(k).cast("long").alias("key_min"),
                F.max(k).cast("long").alias("key_max"),
            ).select(
                F.lit(t).alias("table_name"),
                F.lit(k).alias("key_col"),
                "n_rows",
                "n_distinct_key",
                "n_null_key",
                "key_min",
                "key_max",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name")


# ---------------------------------------------------------------------------
# q200 — join-strategy advisor: turn q181's measured cardinality + skew
# into the physical-strategy decision a planner (or a human tuning a
# 100 TB job) would make — broadcast / shuffle-hash / salted
# ---------------------------------------------------------------------------

_Q200_BROADCAST_MAX = 100_000  # rows on the build side
_Q200_SKEW_SALT = 4.0          # skew_factor above this → salt


def _q200_sql() -> str:
    inner = (
        "\nUNION ALL\n".join(_edge_sql(*e) for e in _EDGES)
    )
    return f"""
    WITH est AS (
{inner}
    )
    SELECT edge, est_join_rows, max_key_rows, skew_factor,
           CASE WHEN n_right <= {_Q200_BROADCAST_MAX} THEN 'broadcast'
                WHEN skew_factor > {_Q200_SKEW_SALT} THEN 'salted_shuffle'
                ELSE 'shuffle_hash' END AS strategy,
           CASE WHEN n_right > {_Q200_BROADCAST_MAX}
                 AND skew_factor > {_Q200_SKEW_SALT}
                THEN CAST(least(ceil(skew_factor), 32) AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS salt_factor
    FROM est
    ORDER BY edge
    """


@register(
    "q200_join_strategy_advisor",
    _q200_sql(),
    doc=(
        "the planner-advisor capstone on q181's estimates: per join "
        "edge, decide broadcast (build side under the driver-safe row "
        "bound), salted shuffle (measured skew_factor beyond the AQE "
        "comfort zone — salt = ceil(skew) capped at 32, the "
        "operators/skew.py recipe), or plain shuffle-hash — the exact "
        "decision table a 100 TB job author works through, emitted as "
        "data so it can gate CI (a new hot key flips an edge to "
        "'salted_shuffle' and the diff shows up in review).  Costs "
        "nothing beyond q181's per-key count tables; the advised joins "
        "never run"
    ),
)
def q200(spark, sf_dir):
    est = q181(spark, sf_dir)
    strategy = (
        F.when(F.col("n_right") <= _Q200_BROADCAST_MAX, "broadcast")
        .when(F.col("skew_factor") > _Q200_SKEW_SALT, "salted_shuffle")
        .otherwise("shuffle_hash")
    )
    salt = (
        F.when(
            (F.col("n_right") > _Q200_BROADCAST_MAX)
            & (F.col("skew_factor") > _Q200_SKEW_SALT),
            F.least(F.ceil("skew_factor"), F.lit(32)),
        )
        .otherwise(1)
        .cast("long")
    )
    return est.select(
        "edge",
        "est_join_rows",
        "max_key_rows",
        "skew_factor",
        strategy.alias("strategy"),
        salt.alias("salt_factor"),
    ).orderBy("edge")


# ---------------------------------------------------------------------------
# q201 — item-item collaborative filtering: cosine similarity over the
# implicit user-item matrix, top-k neighbors per item (the classic
# "customers also bought" recommender primitive)
# ---------------------------------------------------------------------------

_Q201_MAX_ITEMS_PER_USER = 30  # fan-out cap: a user's pair
# contribution is quadratic in their basket size
_Q201_TOPK = 5
_Q201_MIN_CO = 2  # noise floor: one shared buyer is not a signal


@register(
    "q201_item_item_cf",
    f"""
    WITH ui AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), capped AS (
        SELECT u, i FROM (
            SELECT u, i,
                   count(*) OVER (PARTITION BY u) AS n_items
            FROM ui
        ) WHERE n_items <= {_Q201_MAX_ITEMS_PER_USER}
    ), deg AS (
        SELECT i, count(*) AS d FROM capped GROUP BY i
    ), co AS (
        SELECT a.i AS i_a, b.i AS i_b, count(*) AS c
        FROM capped a JOIN capped b USING (u)
        WHERE a.i < b.i
        GROUP BY 1, 2
        HAVING count(*) >= {_Q201_MIN_CO}
    ), scored AS (
        SELECT i_a, i_b,
               round(c / sqrt(da.d * CAST(db.d AS DOUBLE)), 6) AS cosine
        FROM co
        JOIN deg da ON da.i = i_a
        JOIN deg db ON db.i = i_b
    ), sym AS (
        SELECT i_a AS item, i_b AS neighbor, cosine FROM scored
        UNION ALL
        SELECT i_b AS item, i_a AS neighbor, cosine FROM scored
    )
    SELECT item, neighbor, cosine, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY item ORDER BY cosine DESC, neighbor) AS rk
        FROM sym
    ) WHERE rk <= {_Q201_TOPK}
    """,
    doc=(
        "item-item collaborative filtering over implicit feedback: "
        "binary user-item matrix from orders x lineitem, co-occurrence "
        "counts via the per-user pair join (capped at 30 items/user — "
        "the quadratic fan-out guard, same discipline as q185's rare-"
        "part cap; power-buyers contribute noise, not signal), cosine = "
        "co / sqrt(deg_a * deg_b), then top-5 neighbors per item from a "
        "per-item ranking window (bounded by that item's candidate "
        "count, never global).  The min-co floor of 2 kills the "
        "single-shared-buyer long tail BEFORE the degree joins.  This "
        "is the Amazon-style 'also bought' table, emitted as data"
    ),
)
def q201(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ui = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .distinct()
    )
    wun = Window.partitionBy("u")
    capped = (
        ui.withColumn("n_items", F.count("*").over(wun))
        .filter(F.col("n_items") <= _Q201_MAX_ITEMS_PER_USER)
        .select("u", "i")
        .persist()
    )
    capped = track(capped)
    deg = capped.groupBy("i").agg(F.count("*").alias("d"))
    co = (
        capped.alias("a")
        .join(capped.alias("b"), "u")
        .filter(F.col("a.i") < F.col("b.i"))
        .groupBy(F.col("a.i").alias("i_a"), F.col("b.i").alias("i_b"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= _Q201_MIN_CO)
    )
    scored = (
        co.join(deg.select(F.col("i").alias("i_a"), F.col("d").alias("da")),
                "i_a")
        .join(deg.select(F.col("i").alias("i_b"), F.col("d").alias("db")),
              "i_b")
        .select(
            "i_a",
            "i_b",
            F.round(
                F.col("c")
                / F.sqrt(F.col("da") * F.col("db").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    sym = scored.select(
        F.col("i_a").alias("item"), F.col("i_b").alias("neighbor"), "cosine"
    ).unionByName(
        scored.select(
            F.col("i_b").alias("item"),
            F.col("i_a").alias("neighbor"),
            "cosine",
        )
    )
    wr = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor")
    )
    return (
        sym.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _Q201_TOPK)
        .select("item", "neighbor", "cosine", F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# q202 — functional-dependency violation audit on a deterministically
# dirtied dimension (the data-repair primitive: which keys break the
# declared FD, and how badly?)
# ---------------------------------------------------------------------------


@register(
    "q202_fd_violation_audit",
    """
    WITH dirty AS (
        SELECT n_nationkey, n_regionkey FROM nation
        UNION ALL
        SELECT n_nationkey, (n_regionkey + 1) % 5
        FROM nation WHERE n_nationkey % 7 = 0
        UNION ALL
        SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey % 3 = 0
    ), per_key AS (
        SELECT n_nationkey,
               count(*) AS n_rows,
               count(DISTINCT n_regionkey) AS n_variants,
               min(n_regionkey) AS region_a,
               max(n_regionkey) AS region_b
        FROM dirty GROUP BY n_nationkey
    )
    SELECT n_nationkey,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_variants AS BIGINT) AS n_variants,
           CAST(region_a AS BIGINT) AS region_a,
           CAST(region_b AS BIGINT) AS region_b
    FROM per_key
    WHERE n_variants > 1
    """,
    doc=(
        "functional-dependency audit (nationkey -> regionkey must be "
        "functional): the dimension is deterministically dirtied — "
        "every 7th key re-asserted with a shifted region (a genuine FD "
        "break), every 3rd re-asserted consistently (a harmless "
        "duplicate that must NOT flag) — and the audit reports exactly "
        "the keys with >1 distinct dependent value plus the conflicting "
        "range.  One count-distinct aggregate on the determinant key; "
        "at 100 TB this is the profile you run before trusting any "
        "dimension join, and consistent re-assertions stay silent "
        "(count(*) > 1 alone would false-positive them)"
    ),
)
def q202(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    dirty = (
        n.unionByName(
            n.filter(F.col("n_nationkey") % 7 == 0).select(
                "n_nationkey",
                ((F.col("n_regionkey") + 1) % 5).alias("n_regionkey"),
            )
        )
        .unionByName(n.filter(F.col("n_nationkey") % 3 == 0))
    )
    per_key = dirty.groupBy("n_nationkey").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("n_regionkey").cast("long").alias("n_variants"),
        F.min("n_regionkey").cast("long").alias("region_a"),
        F.max("n_regionkey").cast("long").alias("region_b"),
    )
    return per_key.filter(F.col("n_variants") > 1)


# ---------------------------------------------------------------------------
# q203 — FIFO supply/demand allocation: the classic "hard in SQL"
# inventory-matching problem, solved distributively with cumulative
# intervals + an overlap join (no loops, no recursion)
# ---------------------------------------------------------------------------

_Q203_ORDER = "l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice"


@register(
    "q203_fifo_allocation",
    f"""
    WITH li AS (
        SELECT l_partkey AS part, l_orderkey, l_linenumber, l_quantity,
               l_extendedprice, l_shipdate
        FROM lineitem
    ), s AS (
        SELECT part,
               row_number() OVER w AS s_seq,
               sum(l_quantity) OVER w AS s_end,
               sum(l_quantity) OVER w - l_quantity AS s_start
        FROM li WHERE l_orderkey % 2 = 0
        WINDOW w AS (PARTITION BY part ORDER BY {_Q203_ORDER}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), d AS (
        SELECT part,
               row_number() OVER w AS d_seq,
               sum(l_quantity) OVER w AS d_end,
               sum(l_quantity) OVER w - l_quantity AS d_start
        FROM li WHERE l_orderkey % 2 = 1
        WINDOW w AS (PARTITION BY part ORDER BY {_Q203_ORDER}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT s.part, CAST(s_seq AS BIGINT) AS s_seq,
           CAST(d_seq AS BIGINT) AS d_seq,
           round(least(s_end, d_end) - greatest(s_start, d_start), 2)
               AS qty_allocated
    FROM s JOIN d ON s.part = d.part
                 AND s.s_start < d.d_end AND d.d_start < s.s_end
    """,
    doc=(
        "FIFO inventory allocation (supply lots = even orders, demand "
        "lots = odd): each side becomes cumulative-quantity intervals "
        "[cum - qty, cum) per part in first-in order (a bounded per-part "
        "window with a fully deterministic ordering tuple — "
        "(l_orderkey, l_linenumber) is NOT unique in this corpus, so "
        "the order key includes quantity and price), and an allocation "
        "is the overlap of a supply interval with a demand interval — "
        "the procedural 'consume lots in order' loop becomes one "
        "equi-join on part with an interval-overlap residual.  Per-part "
        "chain structure means each lot overlaps O(1) opposing lots on "
        "average (output ~ |supply| + |demand|); a part with a huge "
        "history can bucket its cumulative ranges through "
        "operators/rangejoin.py — the documented scale path"
    ),
)
def q203(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_shipdate",
    )
    order_cols = [
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    ]

    def side(df, prefix):
        w = (
            Window.partitionBy("part")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wseq = Window.partitionBy("part").orderBy(*order_cols)
        return df.select(
            "part",
            F.row_number().over(wseq).alias(f"{prefix}_seq"),
            F.sum("l_quantity").over(w).alias(f"{prefix}_end"),
            (F.sum("l_quantity").over(w) - F.col("l_quantity")).alias(
                f"{prefix}_start"
            ),
        )

    s = side(li.filter(F.col("l_orderkey") % 2 == 0), "s")
    d = side(li.filter(F.col("l_orderkey") % 2 == 1), "d")
    return (
        s.join(
            d,
            (s["part"] == d["part"])
            & (F.col("s_start") < F.col("d_end"))
            & (F.col("d_start") < F.col("s_end")),
        )
        .select(
            s["part"].alias("part"),
            F.col("s_seq").cast("long").alias("s_seq"),
            F.col("d_seq").cast("long").alias("d_seq"),
            F.round(
                F.least("s_end", "d_end") - F.greatest("s_start", "d_start"),
                2,
            ).alias("qty_allocated"),
        )
    )


# ---------------------------------------------------------------------------
# q204 — multi-touch (linear) attribution over a 24 h lookback: the
# range join bounded by day-bucket blocking, the companion to q188's
# single-touch as-of
# ---------------------------------------------------------------------------

_DAY_MS = 86_400_000


@register(
    "q204_multi_touch_attribution",
    f"""
    WITH p AS (
        SELECT event_id AS pid, user_id, epoch_ms(ts) AS pms, value
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, epoch_ms(ts) AS tms, event_type,
               epoch_ms(ts) // {_DAY_MS} AS tday
        FROM events WHERE event_type <> 'purchase'
    ), probe AS (
        SELECT pid, user_id, pms, value,
               pms // {_DAY_MS} - d.off AS tday
        FROM p, (SELECT unnest([0, 1]) AS off) d
    ), cand AS (
        SELECT pr.pid, pr.pms, pr.value, t.event_type
        FROM probe pr JOIN t USING (user_id, tday)
        WHERE t.tms < pr.pms AND t.tms >= pr.pms - {_DAY_MS}
    ), weighted AS (
        SELECT event_type,
               value / count(*) OVER (PARTITION BY pid) AS credit
        FROM cand
    ), credited AS (
        SELECT event_type AS attributed_type,
               CAST(count(*) AS BIGINT) AS n_credits,
               round(sum(credit), 4) AS credited_value
        FROM weighted GROUP BY 1
    ), untouched AS (
        SELECT 'none' AS attributed_type,
               CAST(count(*) AS BIGINT) AS n_credits,
               round(sum(value), 4) AS credited_value
        FROM p WHERE pid NOT IN (SELECT pid FROM cand)
        HAVING count(*) > 0
    )
    SELECT * FROM credited UNION ALL SELECT * FROM untouched
    """,
    doc=(
        "linear multi-touch attribution: every non-purchase touch in the "
        "STRICT 24 h lookback before a purchase shares that purchase's "
        "value equally (credit = value / n_touches — the per-purchase "
        "count window is lookback-bounded).  The user x time-range join "
        "is blocked by DAY BUCKETS: each purchase probes exactly its own "
        "and the previous epoch-day bucket (integer ms arithmetic), so "
        "the join is two equi-probes per purchase, never a per-user "
        "cross product — the rangejoin.py recipe inlined.  Purchases "
        "with no touches land in the 'none' bucket at full value, so "
        "credited_value totals exactly to purchase revenue "
        "(conservation pinned by a test).  Complements q188: last-touch "
        "says who closed, linear says who participated"
    ),
)
def q204(spark, sf_dir):
    from ..functions.scalar import epoch_millis_encode

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        epoch_millis_encode("ts").alias("pms"),
        "value",
    )
    t = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        epoch_millis_encode("ts").alias("tms"),
        "event_type",
    )
    # the 24h lookback is a point-in-interval join: touch time in
    # [pms - DAY, pms) — exactly operators/rangejoin.py's closed-open
    # contract, bucketed at one day so each purchase interval covers at
    # most two buckets (an earlier cut of this builder inlined the same
    # plumbing by hand; review finding)
    from ..operators.rangejoin import range_join

    cand = range_join(
        t,
        p.withColumn("lo", F.col("pms") - _DAY_MS),
        left_val="tms",
        right_lo="lo",
        right_hi="pms",
        bucket_width=_DAY_MS,
        extra_keys=["user_id"],
    )
    wn = Window.partitionBy("pid")
    weighted = cand.select(
        "event_type",
        (F.col("value") / F.count("*").over(wn)).alias("credit"),
        "pid",
    )
    credited = weighted.groupBy(
        F.col("event_type").alias("attributed_type")
    ).agg(
        F.count("*").cast("long").alias("n_credits"),
        F.round(F.sum("credit"), 4).alias("credited_value"),
    )
    untouched = (
        p.join(cand.select("pid").distinct(), "pid", "left_anti")
        .agg(
            F.count("*").cast("long").alias("n_credits"),
            F.round(F.sum("value"), 4).alias("credited_value"),
        )
        .filter(F.col("n_credits") > 0)
        .select(
            F.lit("none").alias("attributed_type"),
            "n_credits",
            "credited_value",
        )
    )
    return credited.unionByName(untouched)


# ---------------------------------------------------------------------------
# q205 — verbatim-span scrub accounting: the REMOVAL half of ExactSubstr
# dedup (q169 detects shared 20-token runs; this measures exactly which
# token positions the later document would lose)
# ---------------------------------------------------------------------------

_Q205_N = 20


@register(
    "q205_verbatim_span_scrub",
    f"""
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   '\\s+') AS t
        FROM documents
    ), wins AS (
        SELECT doc_id, len(t) AS n_tokens, i AS pos,
               list_aggregate(list_slice(t, i, i + {_Q205_N} - 1),
                              'string_agg', ' ') AS g
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1,
                          greatest(len(t) - {_Q205_N} + 1, 1))) AS i)
    ), owner AS (
        SELECT g, min(doc_id) AS first_doc FROM wins GROUP BY g
    ), foreign_wins AS (
        SELECT w.doc_id, w.n_tokens, w.pos
        FROM wins w JOIN owner o USING (g)
        WHERE o.first_doc < w.doc_id
    ), covered AS (
        SELECT doc_id, n_tokens, count(DISTINCT p) AS n_covered
        FROM foreign_wins, LATERAL (
            SELECT unnest(generate_series(pos,
                          least(pos + {_Q205_N} - 1, n_tokens))) AS p)
        GROUP BY doc_id, n_tokens
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_covered AS BIGINT) AS n_covered,
           round(n_covered / CAST(n_tokens AS DOUBLE), 6) AS scrub_frac
    FROM covered
    """,
    doc=(
        "ExactSubstr scrub accounting (the removal half of q169, per "
        "'Deduplicating Training Data Makes Language Models Better'): "
        "every 20-token window whose exact text already appears in an "
        "EARLIER document (global min-doc ownership — one aggregate on "
        "the window hash space) marks its positions for removal in the "
        "later doc; the per-doc report is distinct covered positions "
        "and the scrub fraction.  Position coverage is a bounded "
        "explode (≤ n_tokens rows per doc), the ownership table is one "
        "shuffle on the window key — no pair join at all, which is why "
        "production ExactSubstr scales where pairwise dedup cannot"
    ),
)
def q205(spark, sf_dir):
    from ..operators.text import normalize_text, tokenize

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", tokenize(normalize_text("text")).alias("t")
    ).withColumn("n_tokens", F.size("t"))
    count = F.greatest(F.col("n_tokens") - (_Q205_N - 1), F.lit(1))
    wins = toks.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(
                        F.slice("t", i, _Q205_N), " "
                    ).alias("g"),
                ),
            )
        ).alias("w"),
    ).select(
        "doc_id",
        "n_tokens",
        F.col("w.pos").alias("pos"),
        F.col("w.g").alias("g"),
    )
    # ownership groups on the raw window text so the oracle replays
    # exactly; at corpus scale the shuffle key would be xxhash64(g)
    # (8 bytes vs ~120 — the q53 recipe)
    owner = wins.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    foreign = (
        wins.join(owner, "g")
        .filter(F.col("first_doc") < F.col("doc_id"))
        .select("doc_id", "n_tokens", "pos")
    )
    covered = (
        foreign.select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.sequence(
                    F.col("pos"),
                    F.least(
                        F.col("pos") + (_Q205_N - 1), F.col("n_tokens")
                    ),
                )
            ).alias("p"),
        )
        .groupBy("doc_id", "n_tokens")
        .agg(F.countDistinct("p").alias("n_covered"))
    )
    return covered.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_covered").cast("long").alias("n_covered"),
        F.round(
            F.col("n_covered") / F.col("n_tokens").cast("double"), 6
        ).alias("scrub_frac"),
    )


# ---------------------------------------------------------------------------
# q206 — daily session-quality report: bounce rate, conversion rate, and
# depth per day, built on q79's sessionization rule (gap > 30 min)
# ---------------------------------------------------------------------------


@register(
    "q206_session_quality_daily",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
        SELECT user_id, ts, event_type,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_n
        FROM flagged),
    sessions AS (
        SELECT user_id, session_n,
               CAST(min(ts) AS DATE) AS day,
               count(*) AS n_events,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM numbered GROUP BY user_id, session_n)
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS bounce_rate,
           round(sum(converted) / CAST(count(*) AS DOUBLE), 6)
               AS conversion_rate,
           round(avg(n_events), 6) AS avg_depth
    FROM sessions
    GROUP BY day
    """,
    doc=(
        "daily session-quality scorecard on q79's sessionization rule "
        "(gap > 30 min): bounce rate (single-event sessions), session "
        "conversion rate (any purchase), and average depth, keyed by the "
        "session's START day.  Same single user_id hash partitioning "
        "carries the lag flag, the running session number, and the "
        "session aggregate; the daily rollup shuffles |days| tiny rows. "
        "The web-analytics headline triple, derived — not sampled — "
        "from the raw event log"
    ),
)
def q206(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_n"),
    )
    sessions = numbered.groupBy("user_id", "session_n").agg(
        F.min("ts").cast("date").alias("day"),
        F.count("*").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return sessions.groupBy("day").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum(bounce).cast("long").alias("n_bounces"),
        F.round(F.sum(bounce) / F.count("*").cast("double"), 6).alias(
            "bounce_rate"
        ),
        F.round(
            F.sum("converted") / F.count("*").cast("double"), 6
        ).alias("conversion_rate"),
        F.round(F.avg("n_events"), 6).alias("avg_depth"),
    )


# ---------------------------------------------------------------------------
# q207 — cumulative gains / lift table: the model-evaluation primitive
# (rank by a score, walk deciles best-first, report captured positives
# vs random) — here scoring customers by account balance against a
# "heavy buyer" outcome
# ---------------------------------------------------------------------------

_Q207_POS_ORDERS = 12  # outcome: customer placed at least this many orders


@register(
    "q207_cumulative_gains",
    f"""
    WITH scored AS (
        SELECT c.c_custkey,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS score_cents,
               CASE WHEN coalesce(o.n, 0) >= {_Q207_POS_ORDERS}
                    THEN 1 ELSE 0 END AS positive
        FROM customer c
        LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders
                   GROUP BY 1) o
          ON o.o_custkey = c.c_custkey
    ), cuts AS (
        SELECT [quantile_cont(score_cents, 0.1), quantile_cont(score_cents, 0.2),
                quantile_cont(score_cents, 0.3), quantile_cont(score_cents, 0.4),
                quantile_cont(score_cents, 0.5), quantile_cont(score_cents, 0.6),
                quantile_cont(score_cents, 0.7), quantile_cont(score_cents, 0.8),
                quantile_cont(score_cents, 0.9)] AS cs
        FROM scored
    ), bucketed AS (
        SELECT s.*, len(list_filter(c.cs, x -> s.score_cents > x)) AS bucket
        FROM scored s, cuts c
    ), cells AS (
        SELECT bucket, count(*) AS n, sum(positive) AS pos
        FROM bucketed GROUP BY bucket
    ), tot AS (
        SELECT sum(n) AS tn, sum(pos) AS tp FROM cells
    )
    SELECT CAST(10 - a.bucket AS BIGINT) AS decile_best_first,
           CAST(a.n AS BIGINT) AS n_customers,
           CAST(a.pos AS BIGINT) AS n_positive,
           CAST(sum(b.n) AS BIGINT) AS cum_customers,
           CAST(sum(b.pos) AS BIGINT) AS cum_positive,
           round(sum(b.pos) / CAST(any_value(t.tp) AS DOUBLE), 6) AS gain,
           round((sum(b.pos) / CAST(any_value(t.tp) AS DOUBLE))
                 / (sum(b.n) / CAST(any_value(t.tn) AS DOUBLE)), 6) AS lift
    FROM cells a JOIN cells b ON b.bucket >= a.bucket, tot t
    GROUP BY a.bucket, a.n, a.pos
    """,
    doc=(
        "cumulative gains / lift table for a scoring rule (acctbal "
        "scoring the heavy-buyer outcome): decile assignment via exact "
        "interpolated percentile cut-points over INTEGER cents (the "
        "q122 engine-parity rule — never interpolate raw doubles), "
        "cumulative best-first sums via a |deciles|-sized self-join "
        "(b.bucket >= a.bucket — no global window, the q189 prefix "
        "pattern), lift = captured-positive share over customer share.  "
        "lift@decile1 is the 'how much better than random' number every "
        "targeting model is judged by; the whole curve costs two "
        "aggregates and a 10x10 join"
    ),
)
def q207(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n_orders = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("n")
    )
    scored = c.join(n_orders, "c_custkey", "left").select(
        F.round(F.col("c_acctbal") * 100)
        .cast("long")
        .alias("score_cents"),
        F.when(F.coalesce("n", F.lit(0)) >= _Q207_POS_ORDERS, 1)
        .otherwise(0)
        .alias("positive"),
    )
    cuts = scored.agg(
        F.expr(
            "percentile(score_cents, "
            "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("cs")
    )
    bucketed = scored.crossJoin(F.broadcast(cuts)).withColumn(
        "bucket",
        F.size(F.filter("cs", lambda x: F.col("score_cents") > x)),
    )
    cells = bucketed.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("positive").alias("pos")
    )
    tot = cells.agg(
        F.sum("n").alias("tn"), F.sum("pos").alias("tp")
    )
    cum = (
        cells.alias("a")
        .join(cells.alias("b"), F.col("b.bucket") >= F.col("a.bucket"))
        .groupBy(
            F.col("a.bucket").alias("bucket"),
            F.col("a.n").alias("n"),
            F.col("a.pos").alias("pos"),
        )
        .agg(
            F.sum(F.col("b.n")).alias("cum_n"),
            F.sum(F.col("b.pos")).alias("cum_pos"),
        )
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        (F.lit(10) - F.col("bucket")).cast("long").alias(
            "decile_best_first"
        ),
        F.col("n").cast("long").alias("n_customers"),
        F.col("pos").cast("long").alias("n_positive"),
        F.col("cum_n").cast("long").alias("cum_customers"),
        F.col("cum_pos").cast("long").alias("cum_positive"),
        F.round(
            F.col("cum_pos") / F.col("tp").cast("double"), 6
        ).alias("gain"),
        F.round(
            (F.col("cum_pos") / F.col("tp").cast("double"))
            / (F.col("cum_n") / F.col("tn").cast("double")),
            6,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# q208 — cross-correlation function between two daily revenue series:
# which lag best aligns BUILDING-segment demand with MACHINERY's?
# ---------------------------------------------------------------------------

_Q208_LAGS = list(range(-3, 4))


@register(
    "q208_revenue_cross_correlation",
    f"""
    WITH daily AS (
        SELECT c.c_mktsegment AS seg, o.o_orderdate AS day,
               sum(o.o_totalprice) AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY 1, 2
    ), a AS (SELECT day, rev FROM daily WHERE seg = 'BUILDING'),
    b AS (SELECT day, rev FROM daily WHERE seg = 'MACHINERY'),
    lagged AS (
        SELECT l.lag, a.rev AS ra, b.rev AS rb
        FROM (SELECT unnest([{", ".join(str(x) for x in _Q208_LAGS)}])
                     AS lag) l
        JOIN a ON true
        JOIN b ON b.day = a.day + to_days(CAST(l.lag AS INT))
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n_days,
           round((avg(ra * rb) - avg(ra) * avg(rb))
                 / nullif(sqrt((avg(ra * ra) - avg(ra) * avg(ra))
                               * (avg(rb * rb) - avg(rb) * avg(rb))), 0),
                 6) AS corr
    FROM lagged
    GROUP BY lag
    """,
    doc=(
        "cross-correlation function between two segment revenue series "
        "at lags -3..+3 days: daily partial aggregates (the only "
        "row-space shuffle), then a |lags| x |days| equi-join on the "
        "shifted date and one co-moment correlation per lag (the "
        "q156/q178 recipe).  The argmax lag is the lead/lag "
        "relationship a demand-planning pipeline acts on; at 100 TB the "
        "daily table is tiny regardless of order volume"
    ),
)
def q208(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(F.col("c_mktsegment").alias("seg"),
                 F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    a = daily.filter(F.col("seg") == "BUILDING").select(
        "day", F.col("rev").alias("ra")
    )
    b = daily.filter(F.col("seg") == "MACHINERY").select(
        F.col("day").alias("bday"), F.col("rev").alias("rb")
    )
    lags = a.sparkSession.createDataFrame(
        [(x,) for x in _Q208_LAGS], "lag int"
    )
    lagged = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("bday") == F.date_add(F.col("day"), F.col("lag")),
        )
    )
    num = F.avg(F.col("ra") * F.col("rb")) - F.avg("ra") * F.avg("rb")
    var_a = F.avg(F.col("ra") * F.col("ra")) - F.avg("ra") * F.avg("ra")
    var_b = F.avg(F.col("rb") * F.col("rb")) - F.avg("rb") * F.avg("rb")
    return lagged.groupBy(F.col("lag").cast("long").alias("lag")).agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(num / F.nullif(F.sqrt(var_a * var_b), F.lit(0.0)), 6).alias(
            "corr"
        ),
    )


# ---------------------------------------------------------------------------
# q209 — lexical richness per source: type-token ratio and Herdan's C,
# the vocabulary-growth corpus-quality signal
# ---------------------------------------------------------------------------


@register(
    "q209_lexical_richness",
    """
    WITH tok AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT w) AS BIGINT) AS n_types,
           round(count(DISTINCT w) / CAST(count(*) AS DOUBLE), 6) AS ttr,
           round(ln(count(DISTINCT w)) / ln(count(*)), 6) AS herdan_c
    FROM tok
    GROUP BY source
    """,
    doc=(
        "lexical richness per source: type-token ratio and Herdan's C "
        "(log-log vocabulary growth exponent — unlike raw TTR it is "
        "comparable across sources of different sizes).  A source whose "
        "C collapses is template spam; one whose C rises is genuinely "
        "diverse text — the one-line corpus-quality signal next to "
        "q129's per-doc entropy.  One explode + one distinct-count "
        "aggregate; the distinct shuffles (source, word) pairs, which "
        "the 31-word synthetic vocabulary keeps tiny and a real corpus "
        "bounds at |sources| x |vocab|"
    ),
)
def q209(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(tokenize(F.trim(F.lower(F.col("text"))))).alias("w"),
    )
    return tok.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("n_types"),
        F.round(
            F.countDistinct("w") / F.count("*").cast("double"), 6
        ).alias("ttr"),
        F.round(F.log(F.countDistinct("w")) / F.log(F.count("*")), 6).alias(
            "herdan_c"
        ),
    )


# ---------------------------------------------------------------------------
# q210 — warehouse health scorecard: the audit family distilled into one
# tall (metric, value) table — what an SRE dashboard actually reads
# ---------------------------------------------------------------------------


@register(
    "q210_warehouse_health",
    """
    WITH fk AS (
        SELECT CAST(
            (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
          + (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
          + (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
            AS DOUBLE) AS v
    ), pk AS (
        SELECT CAST(
            (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
          + (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
          + (SELECT count(*) - count(DISTINCT doc_id) FROM documents)
            AS DOUBLE) AS v
    ), dup AS (
        SELECT CAST(count(*) AS DOUBLE) AS v FROM (
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS fp
            FROM documents GROUP BY 1 HAVING count(*) > 1)
    ), kanon AS (
        SELECT CAST(min(c) AS DOUBLE) AS v FROM (
            SELECT count(*) AS c FROM customer
            GROUP BY c_mktsegment, c_nationkey,
                     CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END)
    ), span AS (
        SELECT CAST(date_diff('day', min(o_orderdate), max(o_orderdate))
                    AS DOUBLE) AS v
        FROM orders
    )
    SELECT 'fk_orphan_rows' AS metric, round(v, 6) AS value FROM fk
    UNION ALL SELECT 'pk_duplicate_rows', round(v, 6) FROM pk
    UNION ALL SELECT 'exact_dup_doc_groups', round(v, 6) FROM dup
    UNION ALL SELECT 'min_k_anonymity', round(v, 6) FROM kanon
    UNION ALL SELECT 'order_date_span_days', round(v, 6) FROM span
    """,
    doc=(
        "warehouse health scorecard: the audit family (q173 FK "
        "integrity, q199 PK uniqueness, q52 exact-dup detection, q182 "
        "k-anonymity, freshness span) distilled to one tall "
        "(metric, value) table — the contract a monitoring dashboard or "
        "a CI data-quality gate consumes.  Every metric is an "
        "independent partial-merging aggregate (anti-joins for the FK "
        "orphans are broadcast where the dimension is small); the union "
        "is five one-row frames.  At 100 TB this is the cheapest "
        "continuously-run query in the warehouse and the first one "
        "paged when it changes"
    ),
)
def q210(spark, sf_dir):
    from ..operators.dedup_docs import exact_dup_groups

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    d = _t(spark, sf_dir, "documents")

    def one(metric, frame):
        return frame.select(
            F.lit(metric).alias("metric"),
            F.round(F.col("v").cast("double"), 6).alias("value"),
        )

    orphans = (
        o.join(F.broadcast(c.select("c_custkey")),
               o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("a"))
        .crossJoin(
            li.join(o.select("o_orderkey"),
                    li.l_orderkey == o.o_orderkey, "left_anti")
            .agg(F.count("*").alias("b"))
        )
        .crossJoin(
            li.join(F.broadcast(p.select("p_partkey")),
                    li.l_partkey == p.p_partkey, "left_anti")
            .agg(F.count("*").alias("cc"))
        )
        .select((F.col("a") + F.col("b") + F.col("cc")).alias("v"))
    )
    pk = (
        o.agg((F.count("*") - F.countDistinct("o_orderkey")).alias("a"))
        .crossJoin(
            c.agg((F.count("*") - F.countDistinct("c_custkey")).alias("b"))
        )
        .crossJoin(
            d.agg((F.count("*") - F.countDistinct("doc_id")).alias("cc"))
        )
        .select((F.col("a") + F.col("b") + F.col("cc")).alias("v"))
    )
    dup = exact_dup_groups(d).agg(F.count("*").alias("v"))
    kanon = (
        c.groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos"),
        )
        .agg(F.count("*").alias("n"))
        .agg(F.min("n").alias("v"))
    )
    span = o.agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("v")
    )
    return (
        one("fk_orphan_rows", orphans)
        .unionByName(one("pk_duplicate_rows", pk))
        .unionByName(one("exact_dup_doc_groups", dup))
        .unionByName(one("min_k_anonymity", kanon))
        .unionByName(one("order_date_span_days", span))
    )
