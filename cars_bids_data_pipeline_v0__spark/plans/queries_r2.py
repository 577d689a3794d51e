"""Third extension batch (round 2): multimodal binary profiling, dynamic
pivot, fuzzy string matching, re-aggregable rollups, multi-hop star joins,
calendar spines.

Scale notes (100 TB):
* q84 profiles an opaque binary ``media`` column with pure JVM expressions
  (substring/hex/sha2 on BinaryType) — the oracle recomputes the same
  bytes from first principles, so the engine's binary plumbing (header
  slicing, payload digests) is value-verified, not just shape-verified.
* q85 discovers pivot keys with one tiny distinct scan (driver-side list
  of ~3 values), then pivots with EXPLICIT values — never the implicit
  two-pass pivot on a 100 TB fact.
* q86 blocks the fuzzy self-join on p_brand (equi-join shuffle, then
  per-block levenshtein) — the all-pairs comparison never materializes
  across blocks.  At extreme block skew, sub-block on name length bands.
* q87 is the partial-aggregate pattern: daily partials (sum/count/min/max
  are all re-aggregable) merge into weekly rollups without touching raw
  events twice — the shape of incremental warehouse maintenance.
* q88 (TPC-H Q7 shape) joins the fact once against each broadcast dim;
  only the orders⋈lineitem join shuffles.
* q89 generates the calendar spine with ``sequence`` + ``explode`` from a
  1-row aggregate — no driver-side date loop, and the anti-join against
  distinct order dates is a broadcast at any scale (dates are bounded).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, register

# ---------------------------------------------------------------------------
# q84 — multimodal: binary payload profiling with JVM expressions
# ---------------------------------------------------------------------------

# hex of the 8-byte magic written by operators.multimodal.synthesize_media
_MAGIC_HEX = "46414b45494d4731"  # b"FAKEIMG1"


@register(
    "q84_binary_media_profile",
    f"""
    SELECT doc_id,
           CAST(16 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
           lower('{_MAGIC_HEX}'
                 || lpad(hex(doc_id % 64 + 16), 8, '0')
                 || lpad(hex(doc_id % 48 + 16), 8, '0')) AS header_hex,
           sha256(text) AS payload_sha256
    FROM documents
    """,
    doc=(
        "opaque-binary media profiling: the engine synthesizes a binary "
        "column (magic + packed header + utf-8 payload, operators."
        "multimodal.synthesize_media) and profiles it by slicing REAL "
        "bytes — substring/hex/sha2 on BinaryType, whole-stage codegen, "
        "no Python.  The oracle recomputes header and digest from first "
        "principles, so a byte-offset bug anywhere in the plumbing "
        "hash-fails"
    ),
)
def q84(spark, sf_dir):
    from ..operators.multimodal import synthesize_media

    d = _t(spark, sf_dir, "documents")
    m = synthesize_media(d, text_col="text", id_col="doc_id")
    return m.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(media, 1, 16)"))).alias("header_hex"),
        F.sha2(F.expr("substring(media, 17, 2147483647)"), 256).alias(
            "payload_sha256"
        ),
    )


# ---------------------------------------------------------------------------
# q85 — dynamic pivot (runtime-discovered pivot keys)
# ---------------------------------------------------------------------------


@register(
    "q85_dynamic_pivot",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_F,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_O,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_P
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc=(
        "dynamic pivot: pivot keys discovered at plan time from a tiny "
        "distinct scan (sorted for determinism), then a single-shuffle "
        "pivot with EXPLICIT values — the implicit value-discovery pass "
        "Spark would otherwise run over the full fact is avoided.  The "
        "oracle hardcodes the same keys"
    ),
)
def q85(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    statuses = sorted(
        r[0] for r in o.select("o_orderstatus").distinct().collect()
    )
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .count()
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}")
            for s in statuses
        ],
    )


# ---------------------------------------------------------------------------
# q86 — fuzzy (edit-distance) matching, blocked self-join
# ---------------------------------------------------------------------------


@register(
    "q86_fuzzy_name_pairs",
    """
    SELECT p1.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_close_pairs,
           round(avg(levenshtein(p1.p_name, p2.p_name)), 3) AS avg_dist
    FROM part p1
    JOIN part p2
      ON p1.p_brand = p2.p_brand AND p1.p_partkey < p2.p_partkey
    WHERE levenshtein(p1.p_name, p2.p_name) <= 3
    GROUP BY p1.p_brand
    """,
    doc=(
        "fuzzy duplicate detection by edit distance, blocked on p_brand: "
        "the self-join is a hash equi-join on the block key, and "
        "levenshtein runs only within blocks — never the unblocked "
        "all-pairs cross product.  Both engines share identical "
        "levenshtein semantics"
    ),
)
def q86(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    p1 = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("k1"),
        F.col("p_name").alias("name1"),
    )
    p2 = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("k2"),
        F.col("p_name").alias("name2"),
    )
    dist = F.levenshtein("name1", "name2")
    return (
        p1.join(p2, "brand")
        .filter((F.col("k1") < F.col("k2")) & (dist <= 3))
        .groupBy("brand")
        .agg(
            F.count("*").alias("n_close_pairs"),
            F.round(F.avg(dist), 3).alias("avg_dist"),
        )
    )


# ---------------------------------------------------------------------------
# q87 — re-aggregable rollup: daily partials merged into weekly
# ---------------------------------------------------------------------------


@register(
    "q87_partial_rollup_merge",
    """
    SELECT event_type,
           CAST(date_trunc('week', ts) AS DATE) AS week_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "incremental-rollup pattern: per-day partial aggregates "
        "(count/sum/min/max — all mergeable) roll up into weekly finals "
        "by RE-aggregating the partials, never rescanning raw events.  "
        "The oracle computes weekly directly from raw — the hash match "
        "proves partial-merge ≡ direct aggregation, the invariant that "
        "lets a warehouse maintain rollups incrementally at 100 TB"
    ),
)
def q87(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count("*").alias("pn"),
        F.sum("value").alias("psum"),
        F.min("value").alias("pmin"),
        F.max("value").alias("pmax"),
    )
    return (
        daily.groupBy(
            "event_type",
            F.date_trunc("week", "day").cast("date").alias("week_start"),
        )
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("psum"), 2).alias("total_value"),
            F.min("pmin").alias("min_value"),
            F.max("pmax").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# q88 — TPC-H Q7 shape: bilateral trade volume between nations
# ---------------------------------------------------------------------------


@register(
    "q88_bilateral_trade",
    """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                          * 10000, 0) AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN supplier s  ON s.s_suppkey  = l.l_suppkey
    JOIN customer c  ON c.c_custkey  = o.o_custkey
    JOIN nation n1   ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2   ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q7 shape: cross-nation trade matrix.  supplier/customer/"
        "nation are broadcast (dims), so the only shuffle is "
        "lineitem⋈orders on orderkey plus the final aggregate — the "
        "multi-hop star join never repartitions the fact more than once"
    ),
)
def q88(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            # sum in scaled integers: the volume has exactly 4 decimal
            # digits, so the int sum is associative — immune to the
            # partition-order float drift that a double sum shows at this
            # magnitude.  No final rounding: identical ints divided by
            # the same constant give bit-identical IEEE doubles on both
            # engines, while round(x, 2) itself diverges at half-cent
            # boundaries (engines disagree on the tie rule)
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10000,
                        0,
                    ).cast("long")
                )
                / 10000.0
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q89 — calendar spine + anti-join: days with no orders
# ---------------------------------------------------------------------------


@register(
    "q89_calendar_gaps",
    """
    WITH b AS (
        SELECT CAST(min(o_orderdate) AS DATE) AS d0,
               CAST(max(o_orderdate) AS DATE) AS d1
        FROM orders),
    spine AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS d
        FROM b)
    SELECT CAST(date_trunc('month', d) AS DATE) AS month,
           CAST(count(*) AS BIGINT) AS n_gap_days
    FROM spine
    WHERE d NOT IN (SELECT CAST(o_orderdate AS DATE) FROM orders)
    GROUP BY 1
    """,
    doc=(
        "calendar-spine gap detection: the spine comes from sequence() "
        "over a 1-row min/max aggregate (exploded distributed — no "
        "driver-side date loop), anti-joined against distinct order "
        "dates.  Distinct-date sides are bounded (days, not rows), so "
        "the anti-join broadcasts at any fact size"
    ),
)
def q89(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    spine = (
        o.agg(
            F.min(F.to_date("o_orderdate")).alias("d0"),
            F.max(F.to_date("o_orderdate")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    order_days = o.select(F.to_date("o_orderdate").alias("d")).distinct()
    return (
        spine.join(F.broadcast(order_days), "d", "left_anti")
        .groupBy(F.trunc("d", "month").alias("month"))
        .agg(F.count("*").alias("n_gap_days"))
    )


# ---------------------------------------------------------------------------
# q90 — portable MinHash+LSH: the FULL near-dup pipeline, oracle-verified
# ---------------------------------------------------------------------------

_Q90_K = 16      # minhash functions
_Q90_BANDS = 4   # LSH bands (4 rows per band)
_Q90_ROWS = _Q90_K // _Q90_BANDS

_Q90_MH = ",\n               ".join(
    f"min(CAST(('0x' || substr(md5('mh{k}:' || shingle), 1, 15)) AS BIGINT))"
    f" AS mh{k}"
    for k in range(_Q90_K)
)
_Q90_BAND_CASE = "\n                 ".join(
    "WHEN {b} THEN concat_ws(',', {cols})".format(
        b=b,
        cols=", ".join(
            f"mh{b * _Q90_ROWS + r}" for r in range(_Q90_ROWS)
        ),
    )
    for b in range(_Q90_BANDS)
)

_Q90_ORACLE = f"""
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
    )
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
    FROM cands
    JOIN sh sa ON sa.id = id_a
    JOIN sh sb ON sb.id = id_b
    WHERE round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                / len(list_distinct(list_concat(sa.s, sb.s))), 6) >= 0.25
"""


@register(
    "q90_minhash_lsh_portable",
    _Q90_ORACLE,
    doc=(
        "the FULL MinHash+LSH near-dup pipeline under the value-hash "
        "oracle gate: 60-bit md5-derived signature hashes "
        "(operators.dedup_docs.portable_hash60) and raw band-signature "
        "buckets make every stage — shingling, signatures, banding, "
        "candidate join, exact-Jaccard verify — bit-reproducible in "
        "DuckDB.  Complements q56, which keeps the xxhash64 production "
        "path (rows-only check)"
    ),
)
def q90(spark, sf_dir):
    from ..operators import dedup_docs as DD

    d = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_dedup(
        d, n=3, num_hashes=_Q90_K, bands=_Q90_BANDS, threshold=0.25,
        portable=True,
    )


# ---------------------------------------------------------------------------
# q91 — portable SimHash near-dup, oracle-verified
# ---------------------------------------------------------------------------

_Q91_BITS = 60
_Q91_BLOCKS = 4
_Q91_WIDTH = _Q91_BITS // _Q91_BLOCKS
_Q91_MASK = (1 << _Q91_WIDTH) - 1
_Q91_MAXH = 3

_Q91_BITSUMS = ",\n               ".join(
    f"sum(((h >> {i}) & 1) * 2 - 1) AS b{i}" for i in range(_Q91_BITS)
)
_Q91_PACK = "\n               + ".join(
    f"(CASE WHEN b{i} > 0 THEN CAST(1 AS BIGINT) << {i} ELSE 0 END)"
    for i in range(_Q91_BITS)
)

_Q91_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id AS id,
               unnest(regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   '\\s+')) AS t
        FROM documents
    ), h AS (
        SELECT id,
               CAST(('0x' || substr(md5('sh:' || t), 1, 15)) AS BIGINT) AS h
        FROM tok
    ), bitsums AS (
        SELECT id,
               {_Q91_BITSUMS}
        FROM h GROUP BY id
    ), sig AS (
        SELECT id,
               {_Q91_PACK} AS sig
        FROM bitsums
    ), chunks AS (
        SELECT id, sig, bt.blk,
               (sig >> (bt.blk * {_Q91_WIDTH})) & {_Q91_MASK} AS chunk
        FROM sig, (SELECT unnest(range({_Q91_BLOCKS})) AS blk) bt
    ), cands AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b,
               bit_count(xor(x.sig, y.sig)) AS hamming
        FROM chunks x JOIN chunks y USING (blk, chunk)
        WHERE x.id < y.id
    )
    SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
    FROM cands WHERE hamming <= {_Q91_MAXH}
"""


@register(
    "q91_simhash_portable",
    _Q91_ORACLE,
    doc=(
        "SimHash near-dup under the value-hash oracle gate: 60-bit "
        "md5-derived token hashes, per-bit majority aggregation, block-"
        "permutation candidate join (pigeonhole: hamming ≤ 3 ⇒ one of 4 "
        "15-bit chunks equal), bit_count(xor) verify — every stage "
        "reproduced in DuckDB SQL.  Complements q57's xxhash64 "
        "production path (rows-only check)"
    ),
)
def q91(spark, sf_dir):
    from ..operators import dedup_docs as DD

    d = _t(spark, sf_dir, "documents")
    out = DD.simhash_near_dup_pairs(
        d, max_hamming=_Q91_MAXH, blocks=_Q91_BLOCKS, portable=True
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


# ---------------------------------------------------------------------------
# q92 — duplicate clusters: connected components, oracle-verified
# ---------------------------------------------------------------------------


@register(
    "q92_dup_clusters_portable",
    """
    WITH RECURSIVE sh AS (
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
    ), raw_pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM inv a JOIN inv b USING (shingle)
        WHERE a.id < b.id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_a, id_b
        FROM raw_pairs
        JOIN (SELECT id, len(s) AS sz FROM sh) sa ON sa.id = id_a
        JOIN (SELECT id, len(s) AS sz FROM sh) sb ON sb.id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.25
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach AS (
        SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
    )
    SELECT src AS id, min(dst) AS component
    FROM reach GROUP BY src
    """,
    doc=(
        "near-dup clusters under the value-hash oracle gate: exact-Jaccard "
        "pairs (the q53 edge set) → iterative min-label propagation "
        "(operators.graph.connected_components).  The oracle computes the "
        "same components via a recursive transitive-closure CTE — safe on "
        "bounded dup-cluster sizes, while the engine's label-propagation "
        "loop is the unbounded-scale path (state per vertex, not per "
        "reachable pair)"
    ),
)
def q92(spark, sf_dir):
    from ..operators import dedup_docs as DD
    from ..operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(d, n=3, threshold=0.25)
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# q93 — embedding near-dup via hyperplane LSH, oracle-verified
# ---------------------------------------------------------------------------

_Q93_DIM = 64
_Q93_PLANES = 8
_Q93_TABLES = 2
_Q93_THRESHOLD = 0.99


def _q93_oracle() -> str:
    """The hyperplanes are deterministic sha256-derived ±1 constants
    (operators.similarity._plane_signs) — inline the exact same values
    into the oracle so DuckDB recomputes signature bits, buckets,
    candidate pairs, and the cosine verify independently.  ±1.0
    multiplications are IEEE-exact, so the only FP sensitivity is the
    addition order, which list_dot_product shares with Spark's
    index-order fold."""
    from ..operators.similarity import _plane_signs

    def bucket_expr(salt: str) -> str:
        cases = []
        for p in range(_Q93_PLANES):
            comps = ", ".join(
                repr(x) for x in _plane_signs(_Q93_DIM, p, salt)
            )
            cases.append(
                f"(CASE WHEN list_dot_product(v, [{comps}]) >= 0 "
                f"THEN CAST(1 AS BIGINT) << {p} ELSE 0 END)"
            )
        return "\n                 + ".join(cases)

    tables = "\n            UNION ALL\n".join(
        f"""            SELECT id, v, {t} AS tbl,
                   {bucket_expr(f'nd{t}')} AS bucket
            FROM base"""
        for t in range(_Q93_TABLES)
    )
    # planting mirrors q55: every 20th vector re-added slightly perturbed
    # (cos ≈ 0.9997); the double→FLOAT→double round-trip matches Spark's
    # ``.cast("float")`` bit-for-bit (IEEE round-to-nearest both engines)
    return f"""
    WITH base AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000,
               [CAST(CAST(CAST(embedding[i] AS DOUBLE)
                          * (1.0 + 0.005 * (((i - 1) % 7) - 3.0))
                          AS FLOAT) AS DOUBLE)
                for i in generate_series(1, len(embedding))]
        FROM embeddings WHERE vec_id % 20 = 0
    ), buckets AS (
{tables}
    ), cands AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM buckets x JOIN buckets y USING (tbl, bucket)
        WHERE x.id < y.id
    )
    SELECT id_a, id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine_sim
    FROM cands
    JOIN base a ON a.id = id_a
    JOIN base b ON b.id = id_b
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6)
          >= {_Q93_THRESHOLD}
    """


@register(
    "q93_embedding_near_dup_portable",
    _q93_oracle(),
    doc=(
        "embedding-cosine near-dup via hyperplane-LSH blocking + exact "
        "cosine verify, under the value-hash oracle gate: the "
        "deterministic sha256-derived hyperplanes are inlined into the "
        "oracle, so DuckDB independently recomputes sign bits, buckets, "
        "the candidate join, and the verify.  Same pipeline as q55 at "
        "smaller table/plane counts (oracle SQL stays readable)"
    ),
)
def q93(spark, sf_dir):
    from ..operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # plant near-dups exactly as q55 does (cos ≈ 0.9997 per planted pair)
    perturbed = e.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x.cast("double") * (1.0 + 0.005 * ((i % 7) - 3.0))
            ).cast("float"),
        ).alias("embedding"),
    )
    return embedding_near_dup_pairs(
        e.unionByName(perturbed), dim=_Q93_DIM, threshold=_Q93_THRESHOLD,
        num_planes=_Q93_PLANES, num_tables=_Q93_TABLES,
    )


# ---------------------------------------------------------------------------
# q94 — table diff / reconciliation
# ---------------------------------------------------------------------------


@register(
    "q94_table_diff",
    """
    WITH old AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
    ), new AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 13 = 0
                    THEN round(c_acctbal + 10.5, 2) ELSE c_acctbal END
                   AS c_acctbal,
               CASE WHEN c_custkey % 31 = 0 THEN NULL ELSE c_mktsegment END
                   AS c_mktsegment
        FROM customer WHERE c_custkey % 97 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 101 = 0
    )
    SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           coalesce(array_to_string(
               CASE WHEN o.c_custkey IS NULL OR n.c_custkey IS NULL THEN []
                    ELSE list_filter(
                        [CASE WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                              THEN 'c_acctbal' END,
                         CASE WHEN o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                              THEN 'c_mktsegment' END,
                         CASE WHEN o.c_name IS DISTINCT FROM n.c_name
                              THEN 'c_name' END],
                        x -> x IS NOT NULL) END, '|'), '') AS changed_cols
    FROM old o FULL OUTER JOIN new n USING (c_custkey)
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
       OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
       OR o.c_name IS DISTINCT FROM n.c_name
    """,
    doc=(
        "table reconciliation (operators.diff.table_diff): two snapshots "
        "full-outer-joined once on the key; added/removed/changed rows "
        "with the null-safe list of differing columns.  The 'new' "
        "snapshot is derived deterministically (drops, value changes, "
        "NULL-outs, inserts) so both engines reconstruct it identically; "
        "changed_cols is projected to a '|'-joined scalar so the result "
        "surface stays hashable for any pandas/Arrow canonicalizer"
    ),
)
def q94(spark, sf_dir):
    from ..operators.diff import table_diff

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    new = (
        c.filter(F.col("c_custkey") % 97 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(
                F.col("c_custkey") % 13 == 0,
                F.round(F.col("c_acctbal") + 10.5, 2),
            )
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            F.when(F.col("c_custkey") % 31 == 0, F.lit(None))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 101 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_name",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    )
    # changed_cols is already sorted (table_diff emits column names in
    # sorted order); join to a scalar so the result schema is flat.
    return table_diff(c, new, keys=["c_custkey"]).select(
        "c_custkey",
        "change_type",
        F.array_join(F.col("changed_cols"), "|").alias("changed_cols"),
    )


# ---------------------------------------------------------------------------
# q95 — product-quantization ADC top-k (codebook inlined into the oracle)
# ---------------------------------------------------------------------------

_Q95_DIM, _Q95_M, _Q95_K = 64, 4, 8
_Q95_TOPK = 10


def _q95_codebooks():
    from ..operators.pq import pq_codebooks_random

    return pq_codebooks_random(_Q95_DIM, _Q95_M, _Q95_K, salt="q95")


def _q95_oracle() -> str:
    """DuckDB re-derives PQ codes and ADC scores from the SAME deterministic
    codebook floats (operators.pq.pq_codebooks_random, sha256-based), so
    encoding (per-subspace argmin of squared L2), the code→codeword
    lookups, and the cosine-ADC arithmetic are all independently
    recomputed and value-hashed.  Float ops are sequenced identically to
    the Spark folds (leading 0.0, left-assoc) for bit-equal ties."""
    cbs = _q95_codebooks()
    ds = _Q95_DIM // _Q95_M

    def dlist(floats):
        return "CAST([" + ", ".join(repr(float(x)) for x in floats) + "] AS DOUBLE[])"

    def dmat(mat):
        return (
            "CAST(["
            + ", ".join("[" + ", ".join(repr(float(x)) for x in row) + "]" for row in mat)
            + "] AS DOUBLE[][])"
        )

    sub_cols = ", ".join(
        f"v[{m * ds + 1}:{(m + 1) * ds}] AS s{m}" for m in range(_Q95_M)
    )
    diff_cols = ",\n               ".join(
        f"[s{m}[i] - ({dlist(cbs[m][k])})[i] for i in generate_series(1, {ds})] AS f_{m}_{k}"
        for m in range(_Q95_M)
        for k in range(_Q95_K)
    )
    d2_cols = ",\n               ".join(
        f"list_dot_product(f_{m}_{k}, f_{m}_{k}) AS d_{m}_{k}"
        for m in range(_Q95_M)
        for k in range(_Q95_K)
    )

    def code_col(m):
        ds_list = "[" + ", ".join(f"d_{m}_{k}" for k in range(_Q95_K)) + "]"
        return (
            f"list_position({ds_list}, list_min({ds_list})) - 1 AS c{m}"
        )

    code_cols = ",\n               ".join(code_col(m) for m in range(_Q95_M))
    num = " + ".join(
        f"list_dot_product(q.s{m}, ({dmat(cbs[m])})[c.c{m} + 1])"
        for m in range(_Q95_M)
    )
    norm_consts = [
        [sum(x * x for x in code) for code in cbs[m]] for m in range(_Q95_M)
    ]
    rnorm = " + ".join(
        f"({dlist(norm_consts[m])})[c.c{m} + 1]" for m in range(_Q95_M)
    )
    return f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), subs AS (
        SELECT vec_id, v, {sub_cols} FROM base
    ), diffs AS (
        SELECT vec_id,
               {diff_cols}
        FROM subs
    ), d2 AS (
        SELECT vec_id,
               {d2_cols}
        FROM diffs
    ), codes AS (
        SELECT vec_id,
               {code_cols}
        FROM d2
    ), scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               round((CAST(0.0 AS DOUBLE) + {num})
                     / ((sqrt(list_dot_product(q.v, q.v)))
                        * sqrt(CAST(0.0 AS DOUBLE) + {rnorm})), 6)
                   AS adc_sim
        FROM codes c
        CROSS JOIN (SELECT * FROM subs WHERE vec_id % 100 = 0) q
    )
    SELECT q_id, vec_id, adc_sim, rank FROM (
        SELECT q_id, vec_id, adc_sim,
               CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY adc_sim DESC, vec_id ASC
               ) AS INT) AS rank
        FROM scored)
    WHERE rank <= {_Q95_TOPK}
    """


@register(
    "q95_pq_adc_topk",
    _q95_oracle(),
    doc=(
        "similarity search under 16x compression: product-quantization "
        "codes (4 subspaces x 8 codewords over 64-dim embeddings) scored "
        "by asymmetric distance computation — per query ONE subspace "
        "dot-product table, then M array lookups per corpus row instead "
        "of a 64-length dot.  operators/pq.py; codebook floats are "
        "deterministic (sha256), inlined into both engines"
    ),
)
def q95(spark, sf_dir):
    from ..operators.pq import pq_encode, pq_topk_adc

    cbs = _q95_codebooks()
    emb = _t(spark, sf_dir, "embeddings")
    codes = pq_encode(emb, cbs).select("vec_id", "pq_codes")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return pq_topk_adc(queries, codes, cbs, k=_Q95_TOPK)


# ---------------------------------------------------------------------------
# q96 — bloom-prefiltered semi-join (exact result, pruned shuffle)
# ---------------------------------------------------------------------------

_Q96_PRICE = 450000.0


@register(
    "q96_bloom_semi_join",
    f"""
    SELECT l_returnflag,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_orderkey = l_orderkey AND o_totalprice > {_Q96_PRICE}
    )
    GROUP BY l_returnflag
    """,
    doc=(
        "selective fact semi-join with a Bloom prefilter "
        "(operators/bloom.py): the high-value order keys fold into a "
        "64 Kbit sketch (one bounded agg), bit_get against the literal "
        "words prunes the lineitem scan BEFORE any shuffle, and the "
        "broadcast semi-join removes false positives — result is exact "
        "(oracle: plain EXISTS), only the shuffle volume changes"
    ),
)
def q96(spark, sf_dir):
    from ..operators.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    hot = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > _Q96_PRICE)
        .select("o_orderkey")
    )
    return (
        bloom_semi_join(li, hot, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q97 — document chunking (pretraining shard prep)
# ---------------------------------------------------------------------------

_Q97_SIZE, _Q97_OVERLAP = 32, 8
_Q97_STRIDE = _Q97_SIZE - _Q97_OVERLAP


@register(
    "q97_chunk_documents",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), chunks AS (
        SELECT doc_id, t, unnest(
            [i for i in generate_series(
                1, greatest(len(t) - {_Q97_OVERLAP}, 1), {_Q97_STRIDE})]
        ) AS chunk_start
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST((chunk_start - 1) / {_Q97_STRIDE} AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           CAST(len(t[chunk_start:chunk_start + {_Q97_SIZE} - 1]) AS INT)
               AS chunk_tokens,
           array_to_string(t[chunk_start:chunk_start + {_Q97_SIZE} - 1], ' ')
               AS chunk_text
    FROM chunks
    """,
    doc=(
        "fixed-token-window chunking with overlap "
        "(operators/chunking.py): tokenize once, `sequence` generates "
        "chunk starts, posexplode fans out — all native generators, a "
        "narrow map with no shuffle; trailing partial chunks kept"
    ),
)
def q97(spark, sf_dir):
    from ..operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"),
        chunk_size=_Q97_SIZE,
        overlap=_Q97_OVERLAP,
    )


# ---------------------------------------------------------------------------
# q98 — deterministic training-mixture sampling
# ---------------------------------------------------------------------------

_Q98_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


@register(
    "q98_mixture_sample",
    f"""
    WITH w(source, wt) AS (
        VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)
    ), counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    ), binding AS (
        SELECT min(n / wt) AS c FROM counts JOIN w USING (source)
    ), rates AS (
        SELECT source, (wt * c) / n AS rate
        FROM counts JOIN w USING (source) CROSS JOIN binding
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INT)
           / 65536.0) < r.rate
    """,
    doc=(
        "corpus mixture rebalancing (operators/sampling.py::"
        "mixture_sample): per-source keep-rates derived from target "
        "weights and source sizes (binding source keeps 100%), "
        "membership a pure md5 function of the doc id — the same rows "
        "are selected on every run, partitioning, and engine"
    ),
)
def q98(spark, sf_dir):
    from ..operators.sampling import mixture_sample

    return mixture_sample(
        _t(spark, sf_dir, "documents"), _Q98_WEIGHTS
    ).select("doc_id", "source")


# ---------------------------------------------------------------------------
# q99 — incremental materialized view: partials merged across delta batches
# ---------------------------------------------------------------------------


@register(
    "q99_incremental_matview",
    """
    WITH batched AS (
        SELECT o_orderpriority, o_totalprice, o_orderkey % 3 AS b
        FROM orders
    ), partials AS (
        SELECT o_orderpriority, b,
               count(*) AS n_rows,
               sum(o_totalprice) AS sum_p,
               min(o_totalprice) AS min_p,
               max(o_totalprice) AS max_p
        FROM batched GROUP BY o_orderpriority, b
    )
    SELECT o_orderpriority,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           round(sum(sum_p), 2) AS sum_price,
           round(min(min_p), 2) AS min_price,
           round(max(max_p), 2) AS max_price,
           round(sum(sum_p) / sum(n_rows), 4) AS avg_price
    FROM partials GROUP BY o_orderpriority
    """,
    doc=(
        "incremental view maintenance (operators/matview.py): the fact "
        "arrives as three delta batches; each folds into count/sum/min/"
        "max partials (delta-sized work, map-side combine) and merges "
        "into the running view — history is never re-scanned.  The "
        "oracle recomputes the same partial→merge shape in SQL"
    ),
)
def q99(spark, sf_dir):
    from ..operators.matview import (
        matview_finalize,
        matview_merge,
        matview_partials,
    )

    o = _t(spark, sf_dir, "orders")
    keys = ["o_orderpriority"]
    measures = {"o_totalprice": ("sum", "min", "max", "avg")}
    view = None
    for b in range(3):  # three delta arrivals
        delta = o.filter(F.col("o_orderkey") % 3 == b)
        part = matview_partials(delta, keys, measures)
        view = part if view is None else matview_merge(view, part)
    final = matview_finalize(view, avg_of=["o_totalprice"])
    return final.select(
        "o_orderpriority",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round("sum_o_totalprice", 2).alias("sum_price"),
        F.round("min_o_totalprice", 2).alias("min_price"),
        F.round("max_o_totalprice", 2).alias("max_price"),
        F.round("avg_o_totalprice", 4).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# q100 — sequence packing over chunked documents
# ---------------------------------------------------------------------------

_Q100_BUDGET, _Q100_SHARDS = 256, 8


@register(
    "q100_pack_chunks",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), chunks AS (
        SELECT doc_id, t, unnest(
            [i for i in generate_series(
                1, greatest(len(t) - {_Q97_OVERLAP}, 1), {_Q97_STRIDE})]
        ) AS chunk_start
        FROM toks WHERE len(t) > 0
    ), sized AS (
        SELECT doc_id,
               CAST((chunk_start - 1) / {_Q97_STRIDE} AS INT) AS chunk_idx,
               CAST(len(t[chunk_start:chunk_start + {_Q97_SIZE} - 1]) AS INT)
                   AS chunk_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
                   % {_Q100_SHARDS} AS shard
        FROM chunks
    ), packed AS (
        SELECT shard,
               CAST(floor(coalesce(sum(chunk_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {_Q100_BUDGET}) AS BIGINT) AS pack_id,
               chunk_tokens
        FROM sized
    )
    SELECT shard, pack_id,
           count(*) AS n_chunks,
           CAST(sum(chunk_tokens) AS BIGINT) AS n_tokens
    FROM packed GROUP BY shard, pack_id
    """,
    doc=(
        "training-batch assembly (operators/packing.py): chunks pack "
        f"into {_Q100_BUDGET}-token sequences within md5-hash shards — one "
        "window exchange, no driver loop; packs overflow by at most one "
        "chunk (trainer truncates).  Oracle replays chunking + the "
        "cumulative-sum bucket assignment + the manifest rollup"
    ),
)
def q100(spark, sf_dir):
    from ..operators.chunking import chunk_documents
    from ..operators.packing import pack_chunks, pack_manifest

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"),
        chunk_size=_Q97_SIZE,
        overlap=_Q97_OVERLAP,
    )
    packed = pack_chunks(
        chunks, budget=_Q100_BUDGET, num_shards=_Q100_SHARDS
    )
    return pack_manifest(packed)


# ---------------------------------------------------------------------------
# q101 — BM25 relevance scoring (corpus curation retrieval)
# ---------------------------------------------------------------------------

_Q101_TERMS = ("spark", "table", "window")
_Q101_K1, _Q101_B = 1.2, 0.75


@register(
    "q101_bm25_scores",
    f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), sized AS (
        SELECT doc_id, t, len(t) AS dl FROM base
    ), stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM sized
    ), terms AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM sized, unnest(t) AS u(term)
        WHERE term IN ('spark', 'table', 'window')
        GROUP BY doc_id, dl, term
    ), dfs AS (
        SELECT term, count(*) AS df FROM terms GROUP BY term
    )
    SELECT doc_id,
           round(sum(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf / (tf + {_Q101_K1} * (1 - {_Q101_B}
                                          + {_Q101_B} * dl / avgdl))
           ), 6) AS bm25
    FROM terms JOIN dfs USING (term) CROSS JOIN stats
    GROUP BY doc_id
    """,
    doc=(
        "Okapi BM25 scoring against a fixed term bag "
        "(operators/text.py::bm25_scores): postings restricted to query "
        "terms before any shuffle, corpus stats as a 1-row broadcast — "
        "the retrieval face of corpus curation.  Scores ranked on "
        "ROUNDED values (float-sum order differs across engines)"
    ),
)
def q101(spark, sf_dir):
    from ..operators.text import bm25_scores

    return bm25_scores(
        _t(spark, sf_dir, "documents"),
        list(_Q101_TERMS),
        k1=_Q101_K1,
        b=_Q101_B,
    )


# ---------------------------------------------------------------------------
# q102 — robust outlier detection (median / MAD)
# ---------------------------------------------------------------------------

_Q102_CUTOFF = 3.0 * 1.4826  # 3 sigma-equivalents under normality


@register(
    "q102_mad_outliers",
    f"""
    WITH med AS (
        SELECT o_orderpriority, median(o_totalprice) AS med_price
        FROM orders GROUP BY o_orderpriority
    ), mad AS (
        SELECT o.o_orderpriority,
               median(abs(o.o_totalprice - m.med_price)) AS mad_price
        FROM orders o JOIN med m USING (o_orderpriority)
        GROUP BY o.o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(any_value(m.med_price), 4) AS med_price,
           round(any_value(d.mad_price), 4) AS mad_price,
           CAST(count(*) FILTER (
               abs(o.o_totalprice - m.med_price)
               > {_Q102_CUTOFF} * d.mad_price
           ) AS BIGINT) AS n_outliers
    FROM orders o
    JOIN med m USING (o_orderpriority)
    JOIN mad d USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
    doc=(
        "robust per-group outlier detection: median + MAD (median "
        "absolute deviation) instead of mean/stddev, so the detector "
        "itself is not dragged by the outliers it hunts.  Two grouped "
        "exact-median passes + one flagging pass; group stats broadcast "
        "back.  Cutoff 3·1.4826·MAD ≈ 3σ under normality"
    ),
)
def q102(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med_price")
    )
    mad = (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.median(F.abs(F.col("o_totalprice") - F.col("med_price"))).alias(
                "mad_price"
            )
        )
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.any_value("med_price"), 4).alias("med_price"),
            F.round(F.any_value("mad_price"), 4).alias("mad_price"),
            F.count_if(
                F.abs(F.col("o_totalprice") - F.col("med_price"))
                > _Q102_CUTOFF * F.col("mad_price")
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# q103 — time-series gap filling with linear interpolation
# ---------------------------------------------------------------------------


@register(
    "q103_gap_interpolation",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               floor(sum(value) * 100 + 0.5) / 100 AS v
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT min(h) AS lo, max(h) AS hi FROM hourly
    ), spine AS (
        SELECT et.event_type, s.h
        FROM (SELECT DISTINCT event_type FROM hourly) et
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds) s
    ), joined AS (
        SELECT sp.event_type, sp.h, hv.v
        FROM spine sp LEFT JOIN hourly hv USING (event_type, h)
    ), ctx AS (
        SELECT event_type, h, v,
               last_value(v IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER w_prev AS pt,
               first_value(v IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER w_next AS nt
        FROM joined
        WINDOW w_prev AS (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h,
           -- floor(x*1e4 + 0.5)/1e4 instead of round(x, 4): both engines
           -- floor identical doubles identically, while their round()
           -- implementations disagree by 1 ulp on exact .xxxx5 boundaries
           -- (caught by the sf0.001 oracle sweep)
           floor(CASE
               WHEN v IS NOT NULL THEN v
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               -- fraction divided FIRST to match the engine's
               -- (nv-pv)*frac association: ((nv-pv)*dt1)/dt2 differs by
               -- 1 ulp from (nv-pv)*(dt1/dt2) on the same inputs
               ELSE pv + (nv - pv)
                    * ((floor(epoch(h)) - floor(epoch(pt)))
                       / (floor(epoch(nt)) - floor(epoch(pt))))
           END * 10000 + 0.5) / 10000 AS value_filled,
           v IS NULL AS was_gap
    FROM ctx
    """,
    doc=(
        "time-series gap fill: hourly rollup left-joined onto a "
        "generated hour spine (sequence+explode — no driver loop), "
        "missing hours linearly interpolated between the nearest "
        "non-null neighbors via IGNORE NULLS window lookups (two frames "
        "sharing one partitioning); edges carry the nearest value.  "
        "Interpolation runs on hour-aligned epoch integers (exact in "
        "both engines) over ROUNDED hourly sums"
    ),
)
def q103(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg((F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("v"))
    bounds = hourly.agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = (
        hourly.select("event_type")
        .distinct()
        .join(
            F.broadcast(
                bounds.select(
                    F.explode(
                        F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
                    ).alias("h")
                )
            )
        )
    )
    joined = spine.join(hourly, ["event_type", "h"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    marked = F.when(F.col("v").isNotNull(), F.col("h"))
    ctx = joined.select(
        "event_type",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(marked, ignorenulls=True).over(w_prev).alias("pt"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(marked, ignorenulls=True).over(w_next).alias("nt"),
    )
    frac = (
        F.unix_timestamp("h") - F.unix_timestamp("pt")
    ) / (F.unix_timestamp("nt") - F.unix_timestamp("pt"))
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return ctx.select(
        "event_type",
        "h",
        # floor-based 4-decimal quantize — see the oracle SQL comment
        (F.floor(filled * 10000 + F.lit(0.5)) / 10000).alias("value_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


# ---------------------------------------------------------------------------
# q104 — event-sequence Markov transition matrix
# ---------------------------------------------------------------------------


@register(
    "q104_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events WHERE user_id IS NOT NULL
    ), pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM pairs
    """,
    doc=(
        "first-order Markov transition matrix over per-user event "
        "sequences: one lead() window (ordered by ts with event_id "
        "tiebreak — deterministic), one grouped count, probabilities "
        "normalized per source state with a partitioned window over the "
        "TINY transition matrix, never the raw events"
    ),
)
def q104(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wn = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wn), 6
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# q105 — systematic weighted sampling (exact integer arithmetic)
# ---------------------------------------------------------------------------

_Q105_TARGET = 60


@register(
    "q105_weighted_sample",
    f"""
    WITH base AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w
        FROM documents
    ), cum AS (
        SELECT doc_id, source, w,
               sum(w) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS c,
               sum(w) OVER () AS total
        FROM base
    )
    SELECT doc_id, source, w AS weight
    FROM cum
    WHERE (c // greatest(total // {_Q105_TARGET}, 1))
        > ((c - w) // greatest(total // {_Q105_TARGET}, 1))
    """,
    doc=(
        "weighted sampling without RNG or floats (operators/sampling.py"
        "::systematic_weighted_sample): grid points every total/target "
        "weight units along the integer cumulative-weight line select "
        "rows with probability proportional to n_chars — pure integer "
        "div, bit-identical on every engine/run.  The single-shard query "
        "form uses one global cumsum over 500 rows; the operator's "
        "num_shards path runs the same math per hash shard with no "
        "global window"
    ),
)
def q105(spark, sf_dir):
    from ..operators.sampling import systematic_weighted_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("weight")
    )
    return systematic_weighted_sample(
        d, "weight", target=_Q105_TARGET, id_col="doc_id"
    )


# ---------------------------------------------------------------------------
# q106 — corpus drift: Jensen-Shannon divergence of token distributions
# ---------------------------------------------------------------------------

_Q106_REF = "src0"


@register(
    "q106_token_drift",
    f"""
    WITH toks AS (
        SELECT source,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
    ), counts AS (
        SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2
    ), totals AS (
        SELECT source, sum(n) AS t FROM counts GROUP BY 1
    ), dist AS (
        SELECT source, tok, n / t AS p
        FROM counts JOIN totals USING (source)
    ), ref AS (
        SELECT tok, p AS pr FROM dist WHERE source = '{_Q106_REF}'
    ), oth AS (
        SELECT source, tok, p FROM dist WHERE source <> '{_Q106_REF}'
    ), grid AS (
        SELECT s.source, r.tok, r.pr
        FROM (SELECT DISTINCT source FROM oth) s CROSS JOIN ref r
    ), aligned AS (
        SELECT source,
               coalesce(pr, 0.0) AS pr,
               coalesce(p, 0.0) AS pq
        FROM grid FULL OUTER JOIN oth USING (source, tok)
    )
    SELECT source,
           round(sum(
               CASE WHEN pr > 0 THEN pr * ln(pr / ((pr + pq) / 2))
                    ELSE 0.0 END
             + CASE WHEN pq > 0 THEN pq * ln(pq / ((pr + pq) / 2))
                    ELSE 0.0 END
           ) / 2, 6) AS jsd
    FROM aligned GROUP BY source
    """,
    doc=(
        "training-mix drift monitor (operators/drift.py): per-source "
        "token distributions compared to a reference source by "
        "Jensen-Shannon divergence — symmetric, finite on disjoint "
        "support, bounded by ln 2.  After the two (slice, category) "
        "count shuffles everything operates on distribution-sized "
        "frames; divergences are rounded (float-sum order differs "
        "across engines)"
    ),
)
def q106(spark, sf_dir):
    from ..operators.drift import categorical_distribution, js_divergence

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit("")
            )
        ).alias("tok"),
    )
    dist = categorical_distribution(toks, "source", "tok")
    return js_divergence(
        dist, _Q106_REF, slice_col="source", category_col="tok"
    )


# ---------------------------------------------------------------------------
# q107 — sweep-line interval concurrency (peak overlap per event type)
# ---------------------------------------------------------------------------


@register(
    "q107_peak_concurrency",
    """
    WITH intervals AS (
        SELECT event_type, ts AS s, ts + INTERVAL 30 MINUTE AS e
        FROM events
    ), points AS (
        SELECT event_type, s AS t, 1 AS delta FROM intervals
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta FROM intervals
    ), swept AS (
        SELECT event_type, t,
               sum(delta) OVER (
                   PARTITION BY event_type
                   ORDER BY t, delta DESC
                   ROWS UNBOUNDED PRECEDING) AS live
        FROM points
    )
    SELECT event_type,
           CAST(max(live) AS BIGINT) AS peak_concurrency,
           min(t) FILTER (live = (SELECT max(live) FROM swept s2
                                  WHERE s2.event_type = swept.event_type))
               AS first_peak_at
    FROM swept
    GROUP BY event_type
    """,
    doc=(
        "interval-overlap analytics without a self-join: each interval "
        "emits +1/-1 boundary points, one partitioned running sum sweeps "
        "the timeline (starts before ends on ties -> inclusive overlap), "
        "max of the sweep is the peak concurrency.  O(n log n) per "
        "partition vs the O(n^2) interval self-join; the window is "
        "partitioned by event_type, never global"
    ),
)
def q107(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    points = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "event_type", F.col("e").alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = points.withColumn("live", F.sum("delta").over(w))
    wmax = Window.partitionBy("event_type")
    return (
        swept.withColumn("peak", F.max("live").over(wmax))
        .groupBy("event_type")
        .agg(
            F.max("live").cast("long").alias("peak_concurrency"),
            F.min(F.when(F.col("live") == F.col("peak"), F.col("t"))).alias(
                "first_peak_at"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q108 — deterministic per-group mode (most frequent value)
# ---------------------------------------------------------------------------


@register(
    "q108_group_mode",
    """
    WITH counted AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS n
        FROM customer WHERE c_mktsegment IS NOT NULL
        GROUP BY 1, 2
    ), ranked AS (
        SELECT c_nationkey, c_mktsegment, n,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY n DESC, c_mktsegment ASC) AS rn
        FROM counted
    )
    SELECT c_nationkey,
           c_mktsegment AS mode_segment,
           CAST(n AS BIGINT) AS n_customers
    FROM ranked WHERE rn = 1
    """,
    doc=(
        "per-group mode with a DETERMINISTIC tie-break (count desc, then "
        "value asc) — Spark's mode() and DuckDB's mode() both break ties "
        "arbitrarily, so the portable form is count + row_number; the "
        "count shuffle is the only data-sized exchange, the ranking "
        "window runs over |groups x values|"
    ),
)
def q108(spark, sf_dir):
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isNotNull()
    )
    counted = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("n").desc(), F.col("c_mktsegment").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_mktsegment").alias("mode_segment"),
            F.col("n").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# q109 — ratio-to-report + Pareto cumulative share
# ---------------------------------------------------------------------------


@register(
    "q109_pareto_share",
    """
    WITH rev AS (
        SELECT n.n_name AS nation,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    )
    SELECT nation, revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share,
           round(sum(revenue) OVER (ORDER BY revenue DESC, nation ASC
                                    ROWS UNBOUNDED PRECEDING)
                 / sum(revenue) OVER (), 6) AS cum_share,
           (round(sum(revenue) OVER (ORDER BY revenue DESC, nation ASC
                                     ROWS UNBOUNDED PRECEDING)
                  / sum(revenue) OVER (), 6) <= 0.8) AS in_pareto_head
    FROM rev
    """,
    doc=(
        "ratio-to-report + Pareto analysis: revenue rolls up per nation "
        "(data-sized shuffles end there), then share / cumulative share "
        "/ 80%-head flag are windows over the BOUNDED nation frame.  "
        "The cumulative window partitions on a non-foldable constant "
        "hash so the plan keeps an explicit partition spec (dim-bounded, "
        "one task) — shares computed on ROUNDED revenue"
    ),
)
def q109(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    # bounded frame (one row per nation): pseudo-partition on a
    # column-derived always-zero hash — a literal would be constant-
    # folded out of the window partition spec
    bucket = F.pmod(F.xxhash64(F.col("nation")), F.lit(1))
    w_tot = Window.partitionBy(bucket)
    w_cum = Window.partitionBy(bucket).orderBy(
        F.col("revenue").desc(), F.col("nation").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum_share = F.round(
        F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_tot), 6
    )
    return rev.select(
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w_tot), 6).alias(
            "share"
        ),
        cum_share.alias("cum_share"),
        (cum_share <= 0.8).alias("in_pareto_head"),
    )


# ---------------------------------------------------------------------------
# q110 — equi-width histogram (explicit bin arithmetic, both engines)
# ---------------------------------------------------------------------------

_Q110_LO, _Q110_HI, _Q110_BINS = 0.0, 600000.0, 24


@register(
    "q110_price_histogram",
    f"""
    SELECT CAST(least(floor((o_totalprice - {_Q110_LO})
                      / (({_Q110_HI} - {_Q110_LO}) / {_Q110_BINS})),
                      {_Q110_BINS} - 1) AS INT) AS bin,
           round({_Q110_LO} + least(floor((o_totalprice - {_Q110_LO})
                      / (({_Q110_HI} - {_Q110_LO}) / {_Q110_BINS})),
                      {_Q110_BINS} - 1)
                 * (({_Q110_HI} - {_Q110_LO}) / {_Q110_BINS}), 2) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS bin_revenue
    FROM orders
    GROUP BY 1, 2
    """,
    doc=(
        "equi-width histogram with EXPLICIT bin arithmetic (floor + "
        "least clamp) — width_bucket isn't portable (absent in DuckDB), "
        "and floor avoids DuckDB's round-on-bigint-cast.  One grouped "
        "pass; bin count bounded so the result is always tiny"
    ),
)
def q110(spark, sf_dir):
    width = (_Q110_HI - _Q110_LO) / _Q110_BINS
    bin_expr = F.least(
        F.floor((F.col("o_totalprice") - _Q110_LO) / width),
        F.lit(_Q110_BINS - 1),
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            bin_expr.cast("int").alias("bin"),
            F.round(_Q110_LO + bin_expr * width, 2).alias("bin_lo"),
            "o_totalprice",
        )
        .groupBy("bin", "bin_lo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("bin_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q111 — decile stats via cut-points (the scale path q38 documents)
# ---------------------------------------------------------------------------


@register(
    "q111_decile_cutpoints",
    """
    WITH cuts AS (
        SELECT quantile_cont(c_acctbal,
                             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                   AS qs
        FROM customer
    )
    SELECT CAST(1 + len(list_filter(qs, q -> q < c_acctbal)) AS INT)
               AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(min(c_acctbal), 2) AS lo,
           round(max(c_acctbal), 2) AS hi
    FROM customer CROSS JOIN cuts
    GROUP BY 1
    """,
    doc=(
        "the documented cluster-scale replacement for q38's global NTILE: "
        "nine exact percentile cut-points from ONE aggregate (partial-"
        "merging, no global sort), broadcast back as a 1-row frame, "
        "bucket = count of cut-points strictly below the value.  Unlike "
        "NTILE this never funnels the table through one reducer; "
        "boundary semantics (ties land in the lower bucket) are explicit "
        "and identical in both engines"
    ),
)
def q111(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    cuts = c.agg(
        F.percentile(
            "c_acctbal", F.array(*[F.lit(x / 10.0) for x in range(1, 10)])
        ).alias("qs")
    )
    bucket = 1 + F.size(
        F.filter(F.col("qs"), lambda q: q < F.col("c_acctbal"))
    )
    return (
        c.join(F.broadcast(cuts))
        .select(bucket.cast("int").alias("decile"), "c_acctbal")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# q112 — cumulative distinct users (running COUNT DISTINCT, exactly)
# ---------------------------------------------------------------------------


@register(
    "q112_cumulative_distinct_users",
    """
    WITH first_seen AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id
    ), per_day AS (
        SELECT d, count(*) AS n_new FROM first_seen GROUP BY d
    ), days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT days.d AS day,
           CAST(coalesce(n_new, 0) AS BIGINT) AS n_new_users,
           CAST(sum(coalesce(n_new, 0)) OVER (
               ORDER BY days.d ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_distinct_users
    FROM days LEFT JOIN per_day ON per_day.d = days.d
    """,
    doc=(
        "running COUNT DISTINCT without running-distinct state: each "
        "user collapses to a first-seen date (one grouped min), daily "
        "first-seen counts cumsum into the exact cumulative distinct "
        "curve.  The naive windowed count(distinct) is not even "
        "supported over a running frame and would hold per-day user "
        "sets as state; this is two bounded aggregates and a window "
        "over |days| rows (partitioned on the bounded date frame)"
    ),
)
def q112(spark, sf_dir):
    from pyspark.sql import Window

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("d"))
    )
    first_seen = e.groupBy("user_id").agg(F.min("d").alias("d"))
    per_day = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    days = e.select("d").distinct()
    joined = days.join(per_day, "d", "left").select(
        F.col("d").alias("day"),
        F.coalesce("n_new", F.lit(0)).alias("n_new_users"),
    )
    # |days| is bounded; column-derived zero hash keeps the partition spec
    w = (
        Window.partitionBy(F.pmod(F.xxhash64(F.col("day")), F.lit(1)))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "day",
        F.col("n_new_users").cast("long").alias("n_new_users"),
        F.sum("n_new_users").over(w).cast("long").alias(
            "cum_distinct_users"
        ),
    )


# ---------------------------------------------------------------------------
# q113 — trigram-cosine string similarity join (blocked)
# ---------------------------------------------------------------------------

_Q113_THRESHOLD = 0.7


@register(
    "q113_trigram_cosine_pairs",
    f"""
    WITH grams AS (
        SELECT p_brand AS brand, p_partkey AS k,
               unnest([substring(p_name, i, 3)
                       for i in generate_series(1, length(p_name) - 2)])
                   AS g
        FROM part
    ), tf AS (
        SELECT brand, k, g, count(*) AS n FROM grams GROUP BY 1, 2, 3
    ), norms AS (
        SELECT brand, k, sqrt(CAST(sum(n * n) AS DOUBLE)) AS nrm
        FROM tf GROUP BY 1, 2
    ), dots AS (
        SELECT a.brand, a.k AS k1, b.k AS k2,
               CAST(sum(a.n * b.n) AS DOUBLE) AS dp
        FROM tf a JOIN tf b ON a.brand = b.brand AND a.g = b.g
                            AND a.k < b.k
        GROUP BY 1, 2, 3
    )
    SELECT d.brand,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(d.dp / (na.nrm * nb.nrm)), 6) AS avg_cosine
    FROM dots d
    JOIN norms na ON na.brand = d.brand AND na.k = d.k1
    JOIN norms nb ON nb.brand = d.brand AND nb.k = d.k2
    WHERE d.dp / (na.nrm * nb.nrm) >= {_Q113_THRESHOLD}
    GROUP BY d.brand
    """,
    doc=(
        "third string-similarity metric (after jaccard q53 and "
        "levenshtein q86): cosine over character-trigram count vectors, "
        "blocked on p_brand.  The inner products come from an inverted "
        "trigram index equi-join (integer-exact sums; floats only at "
        "the final normalize), so the all-pairs comparison never "
        "materializes across blocks — the same posting-list shape as "
        "the n-gram jaccard operator"
    ),
)
def q113(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
    )
    grams = p.select(
        "brand",
        "k",
        F.explode(
            # sequence(1, n) runs DESCENDING when n < 1 (names shorter
            # than 3 chars would emit spurious grams the oracle's empty
            # generate_series never sees) — guard with an empty array
            F.when(
                F.length("name") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.length("name") - 2),
                    lambda i: F.col("name").substr(i, F.lit(3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    tf = grams.groupBy("brand", "k", "g").agg(F.count(F.lit(1)).alias("n"))
    norms = tf.groupBy("brand", "k").agg(
        F.sqrt(F.sum(F.col("n") * F.col("n")).cast("double")).alias("nrm")
    )
    a = tf.select(
        "brand", F.col("k").alias("k1"), "g", F.col("n").alias("na")
    )
    b = tf.select(
        "brand", F.col("k").alias("k2"), "g", F.col("n").alias("nb")
    )
    dots = (
        a.join(b, ["brand", "g"])
        .filter(F.col("k1") < F.col("k2"))
        .groupBy("brand", "k1", "k2")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("double").alias("dp"))
    )
    cos = F.col("dp") / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        dots.join(
            norms.select(
                "brand", F.col("k").alias("k1"), F.col("nrm").alias("nrm_a")
            ),
            ["brand", "k1"],
        )
        .join(
            norms.select(
                "brand", F.col("k").alias("k2"), F.col("nrm").alias("nrm_b")
            ),
            ["brand", "k2"],
        )
        .filter(cos >= _Q113_THRESHOLD)
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg(cos), 6).alias("avg_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# q114 — weighted median (cumulative-weight crossing)
# ---------------------------------------------------------------------------


@register(
    "q114_weighted_median",
    """
    WITH w AS (
        SELECT l_returnflag AS flag, l_extendedprice AS price,
               CAST(l_quantity AS BIGINT) AS wt
        FROM lineitem
    ), ranked AS (
        SELECT flag, price, wt,
               sum(wt) OVER (PARTITION BY flag
                             ORDER BY price, wt
                             ROWS UNBOUNDED PRECEDING) AS cw,
               sum(wt) OVER (PARTITION BY flag) AS total
        FROM w
    )
    SELECT flag,
           round(min(price), 2) AS weighted_median_price,
           CAST(any_value(total) AS BIGINT) AS total_weight
    FROM ranked
    WHERE 2 * cw >= total
    GROUP BY flag
    """,
    doc=(
        "weighted median (quantity-weighted price): the first value "
        "whose cumulative weight reaches half the total, found with one "
        "partitioned cumulative sum over integer weights — the crossing "
        "test (2*cw >= total) is pure integer arithmetic, so the "
        "selected row is identical in both engines; no sort-to-driver, "
        "no percentile approximation"
    ),
)
def q114(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price", "wt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("flag")
    ranked = li.select(
        "flag",
        "price",
        F.sum("wt").over(w_cum).alias("cw"),
        F.sum("wt").over(w_tot).alias("total"),
    )
    return (
        ranked.filter(2 * F.col("cw") >= F.col("total"))
        .groupBy("flag")
        .agg(
            F.round(F.min("price"), 2).alias("weighted_median_price"),
            F.any_value("total").cast("long").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
# q115 — top-k tokens per language (partitioned ranking over counts)
# ---------------------------------------------------------------------------

_Q115_K = 5


@register(
    "q115_top_tokens_per_lang",
    f"""
    WITH toks AS (
        SELECT lang,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
    ), counts AS (
        SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2
    )
    SELECT lang, tok, CAST(n AS BIGINT) AS n, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT lang, tok, n,
               row_number() OVER (
                   PARTITION BY lang ORDER BY n DESC, tok ASC) AS rnk
        FROM counts)
    WHERE rnk <= {_Q115_K}
    """,
    doc=(
        "per-language vocabulary heads: one (lang, token) count shuffle, "
        "then ranking windows over the distribution-sized frame with a "
        "deterministic (count desc, token asc) tie-break — the top-k "
        "never sorts row-level data, only the grouped counts"
    ),
)
def q115(spark, sf_dir):
    from pyspark.sql import Window

    toks = _t(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit("")
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("tok").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _Q115_K)
        .select("lang", "tok", F.col("n").cast("long").alias("n"),
                F.col("rnk").cast("int").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# q116 — Welch's t statistic between customer segments
# ---------------------------------------------------------------------------


@register(
    "q116_welch_t",
    """
    WITH stats AS (
        SELECT c_mktsegment AS seg,
               count(*) AS n,
               avg(c_acctbal) AS mu,
               var_samp(c_acctbal) AS v
        FROM customer WHERE c_mktsegment IS NOT NULL
        GROUP BY 1
    ), ref AS (
        SELECT n AS n0, mu AS mu0, v AS v0 FROM stats
        WHERE seg = 'AUTOMOBILE'
    )
    SELECT seg,
           CAST(n AS BIGINT) AS n,
           round(mu, 4) AS mean_bal,
           round((mu - mu0) / sqrt(v / n + v0 / n0), 4) AS welch_t
    FROM stats CROSS JOIN ref
    WHERE seg <> 'AUTOMOBILE'
    """,
    doc=(
        "two-sample Welch's t statistic of every segment against a "
        "reference segment: per-group count/mean/variance from ONE "
        "grouped pass (var_samp partial-merges), the reference as a "
        "1-row broadcast, the statistic a projection — experiment "
        "analysis with zero row-level recomputation.  Rounded (variance "
        "accumulation order differs across engines)"
    ),
)
def q116(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isNotNull()
    )
    stats = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("c_acctbal").alias("mu"),
        F.var_samp("c_acctbal").alias("v"),
    )
    ref = (
        stats.filter(F.col("seg") == "AUTOMOBILE")
        .select(
            F.col("n").alias("n0"),
            F.col("mu").alias("mu0"),
            F.col("v").alias("v0"),
        )
    )
    return (
        stats.filter(F.col("seg") != "AUTOMOBILE")
        .join(F.broadcast(ref))
        .select(
            "seg",
            F.col("n").cast("long").alias("n"),
            F.round("mu", 4).alias("mean_bal"),
            F.round(
                (F.col("mu") - F.col("mu0"))
                / F.sqrt(F.col("v") / F.col("n") + F.col("v0") / F.col("n0")),
                4,
            ).alias("welch_t"),
        )
    )


# ---------------------------------------------------------------------------
# q117 — header/detail reconciliation audit (order totals vs line sums)
# ---------------------------------------------------------------------------

_Q117_TOL = 0.01


@register(
    "q117_totals_reconciliation",
    f"""
    WITH line_sums AS (
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS line_total
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (line_total IS NULL) AS BIGINT)
               AS n_no_lines,
           CAST(count(*) FILTER (
               line_total IS NOT NULL
               AND abs(o_totalprice - line_total) > {_Q117_TOL}
           ) AS BIGINT) AS n_mismatched,
           round(avg(abs(o_totalprice - line_total)) FILTER (
               line_total IS NOT NULL), 2) AS avg_abs_delta
    FROM orders LEFT JOIN line_sums ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
    doc=(
        "header/detail reconciliation — the audit the reference's loads "
        "never run: per-order line totals (one grouped pass) left-joined "
        "to headers, mismatches and orphan headers counted per status.  "
        "Line totals are ROUNDED before comparison so the tolerance "
        "test is on identical doubles in both engines"
    ),
)
def q117(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    line_sums = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("line_total")
    )
    j = o.join(line_sums, o.o_orderkey == line_sums.l_orderkey, "left")
    delta = F.abs(F.col("o_totalprice") - F.col("line_total"))
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("line_total").isNull()).alias("n_no_lines"),
        F.count_if(
            F.col("line_total").isNotNull() & (delta > _Q117_TOL)
        ).alias("n_mismatched"),
        F.round(
            F.avg(F.when(F.col("line_total").isNotNull(), delta)), 2
        ).alias("avg_abs_delta"),
    )


# ---------------------------------------------------------------------------
# q118 — numeric-proximity duplicate candidates (same payer, close dates)
# ---------------------------------------------------------------------------


@register(
    "q118_proximity_dup_orders",
    """
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS k1, b.o_orderkey AS k2,
           round(abs(a.o_totalprice - b.o_totalprice), 2) AS price_gap,
           CAST(date_diff('day', CAST(a.o_orderdate AS DATE),
                          CAST(b.o_orderdate AS DATE)) AS INT) AS day_gap
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND floor(a.o_totalprice / 1000) = floor(b.o_totalprice / 1000)
     AND a.o_orderkey < b.o_orderkey
    WHERE abs(a.o_totalprice - b.o_totalprice) <= 500
      AND abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                        CAST(b.o_orderdate AS DATE))) <= 90
    """,
    doc=(
        "duplicate-payment-style detection: candidate pairs block on "
        "(customer, 1000-unit amount bucket) — an equi-join — then pass "
        "amount- and date-proximity filters; the all-pairs comparison "
        "never leaves the block (pairs straddling a bucket boundary are "
        "missed — the standard blocking recall tradeoff, same as the "
        "text near-dup family; run twice with offset buckets for full "
        "recall)"
    ),
)
def q118(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.col("o_orderdate").cast("date").alias("d"),
    )
    bucket = F.floor(F.col("o_totalprice") / 1000)
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_totalprice").alias("p1"),
        bucket.alias("bkt"),
        F.col("d").alias("d1"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_totalprice").alias("p2"),
        bucket.alias("bkt"),
        F.col("d").alias("d2"),
    )
    gap = F.datediff(F.col("d2"), F.col("d1"))
    return (
        a.join(b, ["custkey", "bkt"])
        .filter(
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.col("p1") - F.col("p2")) <= 500)
            & (F.abs(gap) <= 90)
        )
        .select(
            "custkey", "k1", "k2",
            F.round(F.abs(F.col("p1") - F.col("p2")), 2).alias("price_gap"),
            gap.cast("int").alias("day_gap"),
        )
    )


# ---------------------------------------------------------------------------
# q119 — month-over-month growth (lag over the bounded month frame)
# ---------------------------------------------------------------------------


@register(
    "q119_mom_growth",
    """
    WITH monthly AS (
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT CAST(month AS DATE) AS month, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2)
               AS delta,
           round((revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month) * 100, 4)
               AS pct_change
    FROM monthly
    """,
    doc=(
        "month-over-month revenue growth: the data-sized work ends at "
        "the monthly rollup; lag/delta/percent run over the bounded "
        "month frame (pseudo-partitioned on a column-derived constant "
        "hash so the plan keeps an explicit partition spec).  Growth "
        "computed on ROUNDED monthly sums"
    ),
)
def q119(spark, sf_dir):
    from pyspark.sql import Window

    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("month")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy(
        F.pmod(F.xxhash64(F.col("month")), F.lit(1))
    ).orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias(
            "pct_change"
        ),
    )


# ---------------------------------------------------------------------------
# q120 — capstone: gate → dedup → chunk → pack, one composed pipeline
# ---------------------------------------------------------------------------


def _q120_oracle() -> str:
    from .queries_ext import _STOP_EN_SQL

    return f"""
    WITH feats AS (
        SELECT doc_id, text,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               CASE WHEN length(text) > 0
                    THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                              AS DOUBLE) / length(text)
                    ELSE 0.0 END AS alpha_ratio,
               CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
                    THEN CAST(len(list_filter(
                             regexp_split_to_array(trim(lower(text)), '\\s+'),
                             t -> list_contains({_STOP_EN_SQL}, t)))
                         AS DOUBLE)
                         / len(regexp_split_to_array(trim(text), '\\s+'))
                    ELSE 0.0 END AS stopword_ratio
        FROM documents
    ), gated AS (
        SELECT doc_id, text FROM feats
        WHERE text IS NOT NULL AND n_tokens >= 5
          AND alpha_ratio >= 0.5 AND stopword_ratio <= 0.7
    ), deduped AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text, row_number() OVER (
                PARTITION BY
                    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                ORDER BY doc_id ASC) AS rn
            FROM gated
        ) WHERE rn = 1
    ), toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS t
        FROM deduped
    ), chunks AS (
        SELECT doc_id, t, unnest(
            [i for i in generate_series(
                1, greatest(len(t) - {_Q97_OVERLAP}, 1), {_Q97_STRIDE})]
        ) AS chunk_start
        FROM toks WHERE len(t) > 0
    ), sized AS (
        SELECT doc_id,
               CAST((chunk_start - 1) / {_Q97_STRIDE} AS INT) AS chunk_idx,
               CAST(len(t[chunk_start:chunk_start + {_Q97_SIZE} - 1]) AS INT)
                   AS chunk_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
                   % {_Q100_SHARDS} AS shard
        FROM chunks
    ), packed AS (
        SELECT shard,
               CAST(floor(coalesce(sum(chunk_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {_Q100_BUDGET}) AS BIGINT) AS pack_id,
               chunk_tokens
        FROM sized
    )
    SELECT shard, pack_id,
           count(*) AS n_chunks,
           CAST(sum(chunk_tokens) AS BIGINT) AS n_tokens
    FROM packed GROUP BY shard, pack_id
    """


@register(
    "q120_corpus_prep_pipeline",
    _q120_oracle(),
    doc=(
        "the composed training-corpus preparation pipeline under ONE "
        "value-hash gate: quality gate (token/alpha/stopword thresholds) "
        "-> exact dedup (min-id per md5 fingerprint) -> overlapping "
        "token-window chunking -> budget packing -> shard manifest.  "
        "Every stage is an operator verified on its own (q59/q97/q100); "
        "this query pins their COMPOSITION — the handoff columns, "
        "ordering assumptions, and determinism of the whole chain"
    ),
)
def q120(spark, sf_dir):
    from ..operators.chunking import chunk_documents
    from ..operators.packing import pack_chunks, pack_manifest
    from .corpus import preprocess_corpus

    docs = _t(spark, sf_dir, "documents")
    clean = preprocess_corpus(
        docs,
        min_tokens=5,
        min_alpha_ratio=0.5,
        max_stopword_ratio=0.7,
        near_dup_threshold=None,
    ).select("doc_id", "text")
    chunks = chunk_documents(
        clean, chunk_size=_Q97_SIZE, overlap=_Q97_OVERLAP
    )
    packed = pack_chunks(
        chunks, budget=_Q100_BUDGET, num_shards=_Q100_SHARDS
    )
    return pack_manifest(packed)


# ---------------------------------------------------------------------------
# q121 — shuffle-key skew diagnosis report
# ---------------------------------------------------------------------------

_Q121_TOPN = 3


@register(
    "q121_skew_report",
    f"""
    WITH keyed AS (
        SELECT 'lineitem.l_orderkey' AS table_key,
               CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
        UNION ALL
        SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
    ), counts AS (
        SELECT table_key, k, count(*) AS n FROM keyed GROUP BY 1, 2
    ), stats AS (
        SELECT table_key,
               count(*) AS n_keys,
               sum(n) AS n_rows,
               max(n) AS max_key_rows,
               round(avg(n), 4) AS avg_key_rows,
               round(max(n) / avg(n), 4) AS skew_factor
        FROM counts GROUP BY table_key
    ), heavy AS (
        SELECT table_key, k, n FROM (
            SELECT table_key, k, n, row_number() OVER (
                PARTITION BY table_key ORDER BY n DESC, k ASC) AS rn
            FROM counts) WHERE rn <= {_Q121_TOPN}
    )
    SELECT s.table_key,
           CAST(s.n_keys AS BIGINT) AS n_keys,
           CAST(s.n_rows AS BIGINT) AS n_rows,
           CAST(s.max_key_rows AS BIGINT) AS max_key_rows,
           s.avg_key_rows, s.skew_factor,
           array_to_string(list_sort(list(h.k || ':' || h.n)), '|')
               AS heavy_keys
    FROM stats s JOIN heavy h USING (table_key)
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
    doc=(
        "shuffle-key skew diagnosis — the measurement half of "
        "operators/skew.py: per join-key cardinality, max/avg skew "
        "factor, and the top heavy keys for each audited (table, key) "
        "pair, all from one grouped count per key.  The number that "
        "decides whether a join needs salting/AQE-skew-split BEFORE the "
        "job runs, not after it straggles"
    ),
)
def q121(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_orderkey").alias("table_key"),
        F.col("l_orderkey").cast("string").alias("k"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.lit("orders.o_custkey").alias("table_key"),
        F.col("o_custkey").cast("string").alias("k"),
    )
    counts = (
        li.unionByName(o)
        .groupBy("table_key", "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = counts.groupBy("table_key").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.round(F.avg("n"), 4).alias("avg_key_rows"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_factor"),
    )
    w = Window.partitionBy("table_key").orderBy(
        F.col("n").desc(), F.col("k").asc()
    )
    heavy = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _Q121_TOPN)
        .groupBy("table_key")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.concat_ws(":", "k", "n"))),
                "|",
            ).alias("heavy_keys")
        )
    )
    return stats.join(heavy, "table_key").select(
        "table_key",
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("max_key_rows").cast("long").alias("max_key_rows"),
        "avg_key_rows",
        "skew_factor",
        "heavy_keys",
    )


# ---------------------------------------------------------------------------
# q122 — fulfillment-latency percentiles (date-diff distributions)
# ---------------------------------------------------------------------------


@register(
    "q122_ship_latency",
    """
    WITH lat AS (
        SELECT o_orderpriority AS priority,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(days) AS BIGINT) AS min_days,
           round(quantile_cont(days, 0.5), 2) AS p50_days,
           round(quantile_cont(days, 0.9), 2) AS p90_days,
           CAST(max(days) AS BIGINT) AS max_days
    FROM lat GROUP BY priority
    """,
    doc=(
        "SLA/latency distribution: order→ship day gaps per priority with "
        "exact interpolated percentiles — the date-diff happens once at "
        "the (broadcast-joined) scan, then one partial-merging aggregate "
        "per group; integer day gaps make the percentile interpolation "
        "identical in both engines"
    ),
)
def q122(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate").isNotNull() & F.col("o_orderdate").isNotNull()
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("days"),
        )
    )
    return lat.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("days").cast("long").alias("min_days"),
        F.round(F.percentile("days", F.lit(0.5)), 2).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.9)), 2).alias("p90_days"),
        F.max("days").cast("long").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# q123 — event debounce (drop repeats within a quiet window)
# ---------------------------------------------------------------------------

_Q123_QUIET_MIN = 10


@register(
    "q123_event_debounce",
    f"""
    WITH seq AS (
        SELECT user_id, event_type, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM seq
    WHERE prev_ts IS NULL
       OR ts - prev_ts >= INTERVAL {_Q123_QUIET_MIN} MINUTE
    GROUP BY user_id, event_type
    """,
    doc=(
        "event debounce: within each (user, event_type) stream, a repeat "
        "arriving less than {qm} minutes after its predecessor is noise "
        "and dropped — one lag window over the keyed order (ts with "
        "event_id tiebreak — deterministic), no self-join.  NOTE the "
        "lag chains off RAW predecessors (true debounce would chain off "
        "KEPT rows — inherently sequential; this is the standard "
        "window-parallel approximation, exact whenever bursts are "
        "shorter than the quiet window)".format(qm=_Q123_QUIET_MIN)
    ),
)
def q123(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    seq = e.select(
        "user_id", "event_type", "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    kept = seq.filter(
        F.col("prev_ts").isNull()
        | (
            F.col("ts") - F.col("prev_ts")
            >= F.expr(f"INTERVAL {_Q123_QUIET_MIN} MINUTES")
        )
    )
    return kept.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_kept")
    )


# ---------------------------------------------------------------------------
# q124 — chi-square test of independence from the contingency table
# ---------------------------------------------------------------------------


@register(
    "q124_chi_square_independence",
    """
    WITH cont AS (
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
               count(*) AS n
        FROM orders GROUP BY 1, 2
    ), totals AS (
        SELECT sum(n) AS total FROM cont
    ), margins AS (
        SELECT c.pri, c.st, c.n,
               rp.n_pri, cs.n_st, t.total
        FROM cont c
        JOIN (SELECT pri, sum(n) AS n_pri FROM cont GROUP BY pri) rp
          USING (pri)
        JOIN (SELECT st, sum(n) AS n_st FROM cont GROUP BY st) cs
          USING (st)
        CROSS JOIN totals t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(any_value(total) AS BIGINT) AS n_rows,
           round(sum(
               power(n - (n_pri * n_st / CAST(total AS DOUBLE)), 2)
               / (n_pri * n_st / CAST(total AS DOUBLE))
           ), 4) AS chi_square
    FROM margins
    """,
    doc=(
        "chi-square independence statistic (priority x status) computed "
        "entirely from the contingency counts: one grouped count over "
        "the fact, then marginals and the statistic over the tiny "
        "|priorities x statuses| frame — the categorical complement to "
        "q116's Welch t.  Rounded: the per-cell term order differs "
        "across engines"
    ),
)
def q124(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cont = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).alias("n"))
    rp = cont.groupBy("pri").agg(F.sum("n").alias("n_pri"))
    cs = cont.groupBy("st").agg(F.sum("n").alias("n_st"))
    tot = cont.agg(F.sum("n").alias("total"))
    m = (
        cont.join(F.broadcast(rp), "pri")
        .join(F.broadcast(cs), "st")
        .join(F.broadcast(tot))
    )
    expected = F.col("n_pri") * F.col("n_st") / F.col("total").cast("double")
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.any_value("total").cast("long").alias("n_rows"),
        F.round(
            F.sum(F.pow(F.col("n") - expected, 2) / expected), 4
        ).alias("chi_square"),
    )


# ---------------------------------------------------------------------------
# q125 — top-k per group WITH ties (rank, not row_number)
# ---------------------------------------------------------------------------


@register(
    "q125_topk_with_ties",
    """
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               rank() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY round(c_acctbal, 0) DESC) AS rnk
        FROM customer)
    WHERE rnk <= 3
    """,
    doc=(
        "top-k per group with TIES KEPT: rank() over a coarsened "
        "(rounded-to-unit) balance admits every row sharing a podium "
        "value, unlike q08's row_number which arbitrarily cuts ties — "
        "the distinction between 'exactly k rows' and 'the top k "
        "VALUES'.  Ranking on the rounded key keeps the tie structure "
        "identical across engines"
    ),
)
def q125(spark, sf_dir):
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.round("c_acctbal", 0).desc()
    )
    return (
        c.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_nationkey", "c_custkey", "c_acctbal",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# q126 — grouped linear trend (regr_slope / regr_intercept)
# ---------------------------------------------------------------------------

_Q126_EPOCH = "1995-01-01"


@register(
    "q126_revenue_trend",
    f"""
    WITH daily AS (
        SELECT o_orderpriority AS pri,
               date_diff('day', DATE '{_Q126_EPOCH}',
                         CAST(o_orderdate AS DATE)) AS x,
               round(sum(o_totalprice), 2) AS y
        FROM orders GROUP BY 1, 2
    )
    SELECT pri,
           CAST(count(*) AS BIGINT) AS n_days,
           round(regr_slope(y, x), 4) AS slope_per_day,
           round(regr_intercept(y, x), 2) AS intercept,
           round(corr(y, x), 6) AS r
    FROM daily GROUP BY pri
    """,
    doc=(
        "per-group least-squares trend of daily revenue: regr_slope / "
        "regr_intercept / corr partial-merge in ONE aggregate pass over "
        "the daily rollup.  x is days since a fixed epoch (small "
        "integers) — regressing against raw epoch seconds ~1e9 loses "
        "the 2nd decimal to catastrophic cancellation (the round-1 "
        "covariance gotcha); y is the ROUNDED daily sum"
    ),
)
def q126(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(_Q126_EPOCH).cast("date")
        ).alias("x"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    return daily.groupBy("pri").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.regr_slope("y", "x"), 4).alias("slope_per_day"),
        F.round(F.regr_intercept("y", "x"), 2).alias("intercept"),
        F.round(F.corr("y", "x"), 6).alias("r"),
    )


# ---------------------------------------------------------------------------
# q127 — relational division (customers active in EVERY month)
# ---------------------------------------------------------------------------


@register(
    "q127_relational_division",
    """
    WITH months AS (
        SELECT DISTINCT date_trunc('month', CAST(o_orderdate AS DATE)) AS m
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1995-04-01'
    ), activity AS (
        SELECT DISTINCT o_custkey,
               date_trunc('month', CAST(o_orderdate AS DATE)) AS m
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1995-04-01'
    )
    SELECT o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_active_months
    FROM activity
    GROUP BY o_custkey
    HAVING count(*) = (SELECT count(*) FROM months)
    """,
    doc=(
        "relational division (the 'for all' join): customers with "
        "activity in EVERY month of the window — distinct (customer, "
        "month) pairs, grouped counts, kept where the count equals the "
        "divisor cardinality (a 1-row broadcast scalar).  No NOT EXISTS "
        "double negation, no month-by-month self-joins; one shuffle of "
        "the deduped pairs regardless of divisor size"
    ),
)
def q127(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1995-04-01"))
    )
    activity = o.select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
    ).distinct()
    n_months = activity.select("m").distinct().count()
    return (
        activity.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_active_months"))
        .filter(F.col("n_active_months") == n_months)
    )
