"""Second extension batch: relational breadth + training-data analytics.

Relational: subquery shapes (correlated scalar, [NOT] EXISTS / [NOT] IN),
ranking/distribution windows (NTILE / PERCENT_RANK / CUME_DIST / deciles),
conditional (FILTERed) aggregation, GROUPING SETS, UNPIVOT, deterministic
LISTAGG, calendar bucketing, retention cohorts, ordered funnels, SCD2
history.  Training-data: Gopher-style repetition signals, corpus bigram
frequencies, per-document TF-IDF, deterministic stratified sampling, PII
redaction, mergeable HLL distinct-count rollups.

Scale notes (100 TB):
* q31 decorrelates the scalar subquery into a per-key aggregate + equi-join —
  the same rewrite Catalyst applies to correlated scalar subqueries — so it
  runs as two shuffles on l_partkey, no per-row re-scan.
* q32/q39 express EXISTS / IN as LEFT SEMI / LEFT ANTI hash joins (no
  row-multiplying join then distinct).
* q33 partitions its window by o_orderpriority — no single-partition global
  sort.  q38's decile NTILE is intentionally global (that is what a decile
  is); at cluster scale swap for approx_percentile bucketing (documented).
* q35/q64 are pure higher-order expressions (TRANSFORM/AGGREGATE/FILTER) —
  whole-stage-codegen'd JVM loops, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..cache import track
from .queries import _t, register

# ---------------------------------------------------------------------------
# subquery shapes
# ---------------------------------------------------------------------------


@register(
    "q31_small_qty_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 5
      AND l.l_quantity < (
            SELECT 0.2 * (sum(l2.l_quantity) / count(*))
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
    """,
    doc=(
        "correlated scalar subquery (TPC-H Q17 shape), decorrelated into a "
        "per-part aggregate + equi-join: two shuffles on l_partkey, no "
        "re-scan per outer row"
    ),
)
def q31(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # sum/count (not avg) so the threshold is bit-identical to the oracle:
    # quantities are integral doubles, so the sum is exact in any order.
    per_part = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count("*"))).alias("qty_thresh")
    )
    small_parts = part.filter(F.col("p_size") <= 5).select("p_partkey")
    return (
        li.join(
            F.broadcast(small_parts), li.l_partkey == small_parts.p_partkey
        )
        .join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@register(
    "q32_idle_suppliers",
    """
    SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey
          AND l.l_shipdate >= TIMESTAMP '2001-11-01 00:00:00')
    """,
    doc="NOT EXISTS as a LEFT ANTI hash join (no row multiplication)",
)
def q32(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    recent = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate")
            >= F.lit("2001-11-01 00:00:00").cast("timestamp")
        )
        .select("l_suppkey")
    )
    return s.join(
        recent, s.s_suppkey == recent.l_suppkey, "left_anti"
    ).select(
        "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal")
    )


@register(
    "q39_segment_orders",
    """
    SELECT o.o_orderstatus,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_value
    FROM orders o
    WHERE o.o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o.o_custkey NOT IN (
            SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    GROUP BY o.o_orderstatus
    """,
    doc="IN / NOT IN subqueries as LEFT SEMI + LEFT ANTI joins",
)
def q39(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    negative = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return (
        o.join(
            F.broadcast(building),
            o.o_custkey == building.c_custkey,
            "left_semi",
        )
        .join(
            F.broadcast(negative),
            o.o_custkey == negative.c_custkey,
            "left_anti",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# ranking / distribution windows
# ---------------------------------------------------------------------------


@register(
    "q33_price_rank_functions",
    """
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4)       OVER w AS price_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc=(
        "NTILE / PERCENT_RANK / CUME_DIST over a partitioned, total-ordered "
        "window (tie-break on the unique key keeps every rank deterministic)"
    ),
)
def q33(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q38_acctbal_deciles",
    """
    WITH d AS (
        SELECT c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer)
    SELECT decile,
           count(*) AS n_customers,
           round(min(c_acctbal), 2) AS lo,
           round(max(c_acctbal), 2) AS hi,
           round(avg(c_acctbal), 4) AS mean_bal
    FROM d
    GROUP BY decile
    """,
    doc=(
        "global decile assignment + per-decile stats.  A literal NTILE "
        "window is inherently single-partition, so the builder instead "
        "computes exact global row numbers with the range-partitioned "
        "two-phase assigner (operators/keys.py, the M4 machinery) and "
        "applies NTILE's bucket formula — first n%%k buckets get "
        "floor(n/k)+1 rows — as a plain expression against the broadcast "
        "row count.  Bit-identical to NTILE over (acctbal, custkey) "
        "because that order is total; every stage parallel"
    ),
)
def q38(spark, sf_dir):
    from ..operators.keys import with_surrogate_key

    c = _t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    ranked = with_surrogate_key(
        c, ["c_acctbal", "c_custkey"], id_col="__i"
    )
    tot = c.agg(F.count("*").cast("long").alias("__n"))
    base = F.floor(F.col("__n") / 10).cast("long")
    rem = (F.col("__n") % 10).cast("long")
    boundary = rem * (base + 1)
    i = F.col("__i")
    decile = (
        F.when(i <= boundary, F.floor((i - 1) / (base + 1)) + 1)
        # greatest(base, 1): when n < k the otherwise branch is dead
        # (boundary == n) but ANSI mode would still reject the /0
        .otherwise(
            rem + F.floor((i - boundary - 1) / F.greatest(base, F.lit(1))) + 1
        )
        .cast("int")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("c_acctbal", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
            F.round(F.avg("c_acctbal"), 4).alias("mean_bal"),
        )
    )


# ---------------------------------------------------------------------------
# conditional aggregation
# ---------------------------------------------------------------------------


@register(
    "q34_conditional_agg",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           round(coalesce(
               sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'),
               0.0), 2) AS open_value,
           round(avg(CASE WHEN o_orderstatus = 'F'
                          THEN o_totalprice END), 4) AS avg_finished_value
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc=(
        "FILTERed / conditional aggregates — one scan, one shuffle, the "
        "CASE routing happens map-side inside the partial aggregate"
    ),
)
def q34(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    is_o = F.col("o_orderstatus") == "O"
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count(F.when(is_f, True)).alias("n_finished"),
        F.round(
            F.coalesce(
                F.sum(F.when(is_o, F.col("o_totalprice"))), F.lit(0.0)
            ),
            2,
        ).alias("open_value"),
        F.round(F.avg(F.when(is_f, F.col("o_totalprice"))), 4).alias(
            "avg_finished_value"
        ),
    )


# ---------------------------------------------------------------------------
# higher-order array math (embeddings)
# ---------------------------------------------------------------------------


@register(
    "q35_vector_stats",
    """
    SELECT vec_id, label,
           len(embedding) AS n_dims,
           round(sqrt(list_aggregate(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum')), 4) AS l2_norm,
           round(list_aggregate(
               list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')
               / len(embedding), 4) AS mean_val,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val
    FROM embeddings
    """,
    doc=(
        "higher-order array expressions (TRANSFORM + AGGREGATE): in-order "
        "left fold in both engines, whole-stage codegen, no UDF, no explode "
        "shuffle"
    ),
)
def q35(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        F.transform(
            "embedding", lambda x: x.cast("double") * x.cast("double")
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    val_sum = F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x)
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("n_dims"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(val_sum / F.size("embedding"), 4).alias("mean_val"),
        F.round(F.array_max(as_double), 4).alias("max_val"),
    )


# ---------------------------------------------------------------------------
# ordered string aggregation
# ---------------------------------------------------------------------------


@register(
    "q36_nation_rosters",
    """
    SELECT n.n_name AS nation,
           count(*) AS n_customers,
           string_agg(c.c_name, '|' ORDER BY c.c_name) AS roster
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc=(
        "deterministic LISTAGG: collect_list is order-nondeterministic "
        "under parallelism, so sort the array before joining — same string "
        "on every run and every partitioning.  Bounded by group size (a "
        "roster op), not table size"
    ),
)
def q36(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.array_join(
                F.array_sort(F.collect_list("c_name")), "|"
            ).alias("roster"),
        )
    )


# ---------------------------------------------------------------------------
# calendar bucketing
# ---------------------------------------------------------------------------


@register(
    "q37_weekday_traffic",
    """
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           isodow(ts) AS dow,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    doc=(
        "calendar bucketing: ISO week start + ISO day-of-week (Mon=1..Sun=7; "
        "Spark's dayofweek is Sun=1, remapped with (d+5)%7+1)"
    ),
)
def q37(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    isodow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("long")
    return (
        e.groupBy(
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("week_start"),
            isodow.alias("dow"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# document repetition signals (Gopher-rule style)
# ---------------------------------------------------------------------------


@register(
    "q65_scd2_user_status",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev IS NULL OR event_type <> prev)
    SELECT user_id,
           event_type,
           ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current
    FROM runs
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc=(
        "SCD2 (type-2 slowly changing dimension) history: collapse the "
        "event log into [valid_from, valid_to) intervals per user — both "
        "windows share one hash partitioning on user_id, so the whole "
        "history build is a single shuffle"
    ),
)
def q65(spark, sf_dir):
    from ..operators.scd2 import scd2_snapshot

    e = _t(spark, sf_dir, "events")
    return scd2_snapshot(
        e, key="user_id", tracked="event_type", order_col="ts",
        tie_col="event_id",
    )


@register(
    "q66_stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
          < CASE lang WHEN 'en' THEN 77
                      WHEN 'fr' THEN 256
                      WHEN 'de' THEN 128
                      ELSE 26 END
    """,
    doc=(
        "deterministic stratified sampling (training-mix rebalancing): "
        "downsample 'en' to 30%, keep 'fr', halve 'de', 10% for the rest — "
        "membership a pure md5 function of doc_id, one scan, no shuffle, "
        "identical row set on every run/partitioning (vs sampleBy's RNG)"
    ),
)
def q66(spark, sf_dir):
    from ..operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    return stratified_sample(
        d, "doc_id", "lang",
        {"en": 0.3, "fr": 1.0, "de": 0.5},
        default_fraction=0.1,
    ).select("doc_id", "lang")


@register(
    "q67_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
    doc=(
        "explicit GROUPING SETS (beyond rollup q07 / cube q17) with "
        "GROUPING() disambiguation of placeholder NULLs — one Expand + "
        "one hash agg, not three scans"
    ),
)
def q67(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gsets")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_value
        FROM orders_gsets
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


@register(
    "q68_top_bigrams",
    """
    WITH w AS (
        SELECT regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents
        WHERE length(trim(text)) > 0),
    b AS (
        SELECT unnest(list_transform(
                   generate_series(1, len(words) - 1),
                   i -> words[i] || ' ' || words[i + 1])) AS bigram
        FROM w
        WHERE len(words) >= 2)
    SELECT bigram, count(*) AS n
    FROM b
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
    doc=(
        "corpus n-gram frequency (contamination / repetition analysis): "
        "bigrams built as a higher-order array expression (no self-join), "
        "one explode, partial-agg count, TakeOrderedAndProject top-50 with "
        "deterministic (count, bigram) tie-break"
    ),
)
def q68(spark, sf_dir):
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(F.split(F.trim(F.col("text")), r"\s+").alias("words"))
        .filter(F.size("words") >= 2)
    )
    # sequence() flips to a descending range when start > stop, so the
    # size>=2 filter above is load-bearing, not just an optimization
    bigrams = d.select(
        F.transform(
            F.sequence(F.lit(1), F.size("words") - 1),
            lambda i: F.concat_ws(
                " ", F.get("words", i - 1), F.get("words", i)
            ),
        ).alias("bigrams")
    )
    return (
        bigrams.select(F.explode("bigrams").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )


@register(
    "q64_word_repetition",
    """
    SELECT doc_id,
           len(words) AS n_words,
           len(list_distinct(words)) AS n_unique_words,
           round(1.0 - CAST(len(list_distinct(words)) AS DOUBLE)
                       / len(words), 4) AS dup_word_ratio,
           round(CAST(list_aggregate(
                    list_transform(words, w -> length(w)), 'sum') AS DOUBLE)
                 / len(words), 4) AS mean_word_len,
           round(CAST(list_aggregate(
                    list_transform(list_distinct(words),
                        w -> len(list_filter(words, x -> x = w))),
                    'max') AS DOUBLE)
                 / len(words), 4) AS top_word_ratio
    FROM (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents
        WHERE length(trim(text)) > 0)
    """,
    doc=(
        "Gopher-style repetition signals per document: duplicate-word "
        "fraction, mean word length, most-frequent-word share — all "
        "higher-order array expressions, no explode shuffle, no UDF"
    ),
)
def q64(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    d = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    )
    n_words = F.size("words")
    n_unique = F.size(F.array_distinct(F.col("words")))
    word_lens = F.transform("words", F.length)
    len_sum = F.aggregate(
        word_lens, F.lit(0), lambda a, x: a + x
    )
    top_count = F.array_max(
        F.transform(
            F.array_distinct(F.col("words")),
            lambda w: F.size(
                F.filter(F.col("words"), lambda x: x == w)
            ),
        )
    )
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_unique.cast("long").alias("n_unique_words"),
        F.round(
            F.lit(1.0) - n_unique.cast("double") / n_words, 4
        ).alias("dup_word_ratio"),
        F.round(len_sum.cast("double") / n_words, 4).alias(
            "mean_word_len"
        ),
        F.round(top_count.cast("double") / n_words, 4).alias(
            "top_word_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# reshaping, cohorts, funnels, tf-idf
# ---------------------------------------------------------------------------


@register(
    "q69_unpivot_metrics",
    """
    SELECT metric,
           round(sum(value), 2) AS total,
           count(*) AS n
    FROM (
        SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT 'l_tax', l_tax FROM lineitem)
    GROUP BY metric
    """,
    doc=(
        "wide→long UNPIVOT (melt) + per-metric aggregate: Spark's unpivot "
        "is one Expand over one scan — the oracle's UNION-ALL spelling "
        "would be four scans; same result, 4× the IO"
    ),
)
def q69(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return long.groupBy("metric").agg(
        F.round(F.sum("value"), 2).alias("total"),
        F.count("*").alias("n"),
    )


@register(
    "q70_retention_cohorts",
    """
    WITH firstseen AS (
        SELECT user_id,
               min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS active_week
        FROM events)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7
                AS BIGINT) AS week_n,
           count(*) AS n_active
    FROM firstseen f
    JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    doc=(
        "retention cohort matrix: first-seen week per user, distinct "
        "(user, week) activity, weeks-since-cohort offset.  Both "
        "aggregations and the join hash-partition on user_id — one "
        "logical shuffle chain, no window needed"
    ),
)
def q70(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    week = F.to_date(F.date_trunc("week", F.col("ts")))
    firstseen = e.groupBy("user_id").agg(
        F.min(week).alias("cohort_week")
    )
    activity = e.select(
        "user_id", week.alias("active_week")
    ).distinct()
    return (
        firstseen.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("long").alias("week_n"),
        )
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "q71_funnel_stages",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e
        JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e
        JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id)
    SELECT stage, n_users FROM (
        SELECT '1_view' AS stage, count(*) AS n_users FROM v
        UNION ALL SELECT '2_click', count(*) FROM c
        UNION ALL SELECT '3_purchase', count(*) FROM p)
    """,
    doc=(
        "ordered funnel (view → click → purchase): each stage is a "
        "min-aggregate + join on user_id, strictly-after semantics.  All "
        "stages co-partition on user_id; at scale this is the "
        "sessionization-free funnel shape (no per-user sort)"
    ),
)
def q71(spark, sf_dir):
    e = _t(spark, sf_dir, "events")

    def first_after(prev, etype, tcol, prev_t):
        step = e.filter(F.col("event_type") == etype)
        if prev is None:
            return step.groupBy("user_id").agg(F.min("ts").alias(tcol))
        return (
            step.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = first_after(None, "view", "t1", None)
    c = first_after(v, "click", "t2", "t1")
    p = first_after(c, "purchase", "t3", "t2")
    spark_counts = None
    for stage, frame in (("1_view", v), ("2_click", c), ("3_purchase", p)):
        one = frame.agg(
            F.lit(stage).alias("stage"), F.count("*").alias("n_users")
        )
        spark_counts = one if spark_counts is None else spark_counts.unionByName(one)
    return spark_counts


@register(
    "q72_tfidf_top_terms",
    """
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS words
        FROM documents WHERE length(trim(text)) > 0),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, any_value(n_tokens) AS n_tokens
        FROM (SELECT doc_id, unnest(words) AS term,
                     len(words) AS n_tokens FROM toks)
        GROUP BY doc_id, term),
    idf AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM toks),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round((CAST(tf.tf AS DOUBLE) / tf.n_tokens)
                     * ln((n.n_docs + 1.0) / (idf.df + 1.0)), 6) AS tfidf
        FROM tf JOIN idf USING (term) CROSS JOIN n)
    SELECT doc_id, term, tfidf
    FROM (SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    doc=(
        "per-document top-3 TF-IDF terms (corpus keyword extraction): "
        "token explode → (doc,term) counts → document-frequency join → "
        "smoothed-idf score, ranked inside a per-doc window.  Ranking on "
        "the ROUNDED score (then term) keeps the top-3 deterministic "
        "across engines — never rank on raw float expressions"
    ),
)
def q72(spark, sf_dir):
    from pyspark.sql import Window

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("words"),
        )
    )
    toks = d.select(
        "doc_id", F.size("words").alias("n_tokens"),
        F.explode("words").alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.any_value("n_tokens").alias("n_tokens")
    )
    idf = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.count()  # scalar: one job, broadcast as a literal
    scored = tf.join(idf, "term").select(
        "doc_id",
        "term",
        F.round(
            (F.col("tf").cast("double") / F.col("n_tokens"))
            * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "q73_hll_weekly_rollup",
    None,  # DataSketches estimates are engine-specific → rows-only check
    doc=(
        "mergeable distinct-count store: per-(week, event_type) HLL "
        "partials rolled up to event_type WITHOUT re-scanning raw events — "
        "the 100 TB dashboard pattern (work ∝ buckets, not rows).  "
        "Estimates are approximate; the merge itself is union-exact "
        "(tests/test_sketch.py pins rollup == direct-from-raw)"
    ),
)
def q73(spark, sf_dir):
    from ..operators.sketch import hll_partials, hll_rollup

    e = _t(spark, sf_dir, "events")
    week = F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    partials = hll_partials(
        e.select(week, "event_type", "user_id"),
        ["week", "event_type"],
        "user_id",
    )
    return hll_rollup(partials, ["event_type"]).select(
        "event_type",
        F.col("approx_distinct").cast("long").alias("approx_users"),
        "n_rows",
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"(?:\+?\d{1,3}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b"


@register(
    "q74_pii_redaction",
    f"""
    WITH dirty AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN
                        text || ' contact user' || doc_id || '@example.com'
                    WHEN doc_id % 7 = 0 THEN
                        text || ' call 555-123-'
                             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE text END AS text
        FROM documents),
    em AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_email,
               regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g') AS t1
        FROM dirty)
    SELECT doc_id, n_email,
           len(regexp_extract_all(t1, '{_PHONE_RE}')) AS n_phone,
           regexp_replace(t1, '{_PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM em
    """,
    doc=(
        "PII scrubbing for training corpora: email/phone redaction with "
        "per-kind audit counts — a pure regexp_replace chain (JVM-side, "
        "codegen, scan-bound; no UDF).  The PII is manufactured "
        "deterministically from doc_id (the corpus has none), per the "
        "standard synthetic-dirt rule"
    ),
)
def q74(spark, sf_dir):
    from ..operators.text import PII_PATTERNS

    d = _t(spark, sf_dir, "documents")
    dirty = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"), F.lit(" call 555-123-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    email, phone = PII_PATTERNS["EMAIL"], PII_PATTERNS["PHONE"]
    em = dirty.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(email), F.lit(0))
        ).alias("n_email"),
        F.regexp_replace("text", email, "[EMAIL]").alias("t1"),
    )
    return em.select(
        "doc_id",
        "n_email",
        F.size(
            F.regexp_extract_all(F.col("t1"), F.lit(phone), F.lit(0))
        ).alias("n_phone"),
        F.regexp_replace("t1", phone, "[PHONE]").alias("redacted"),
    )


# ---------------------------------------------------------------------------
# window frames, positions, moments, sessionization
# ---------------------------------------------------------------------------


@register(
    "q75_rolling_hour_sum",
    """
    SELECT event_id,
           event_type,
           round(sum(value) OVER (
               PARTITION BY event_type
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
               AS hour_sum
    FROM events
    WHERE value IS NOT NULL
    """,
    doc=(
        "time-RANGE window frame (value-based, not row-based): rolling "
        "1-hour sum per event type — frame membership is defined by the "
        "timestamp value, so ties enter together and the result is "
        "deterministic without a tie-break"
    ),
)
def q75(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(F.sum("value").over(w), 2).alias("hour_sum"),
    )


@register(
    "q76_leading_terms",
    """
    SELECT doc_id, pos, term FROM (
        SELECT doc_id, 0 AS pos, words[1] AS term FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents WHERE length(trim(text)) > 0) WHERE len(words) >= 1
        UNION ALL
        SELECT doc_id, 1, words[2] FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents WHERE length(trim(text)) > 0) WHERE len(words) >= 2
        UNION ALL
        SELECT doc_id, 2, words[3] FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents WHERE length(trim(text)) > 0) WHERE len(words) >= 3)
    """,
    doc=(
        "positional explode (POSEXPLODE): term + ordinal position in one "
        "generator pass — the oracle's UNION-ALL spelling re-scans per "
        "position; Spark emits (pos, term) pairs in a single Generate"
    ),
)
def q76(spark, sf_dir):
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
        )
    )
    exploded = d.select(
        "doc_id", F.posexplode("words").alias("pos", "term")
    )
    return exploded.filter(F.col("pos") < 3).select(
        "doc_id", F.col("pos").cast("int").alias("pos"), "term"
    )


@register(
    "q77_first_last_events",
    """
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           round(first_value(value) OVER w, 2) AS first_value,
           nth_value(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
    doc=(
        "FIRST_VALUE / LAST_VALUE / NTH_VALUE over an explicit full-frame "
        "window (the default frame stops at CURRENT ROW — last_value "
        "without the explicit frame is the classic silent bug)"
    ),
)
def q77(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.round(F.first("value").over(w), 2).alias("first_value"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    ).distinct()


@register(
    "q78_value_moments",
    """
    SELECT event_type,
           count(*) AS n,
           round(stddev_samp(value), 4) AS sd,
           round(var_samp(value), 4) AS variance,
           round(covar_samp(value,
                 CAST(floor(epoch(ts)) AS DOUBLE) - 1704067200), 2)
               AS cov_with_time,
           round(corr(value,
                 CAST(floor(epoch(ts)) AS DOUBLE) - 1704067200), 4)
               AS corr_with_time
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    doc=(
        "second-moment statistics (stddev/variance/covariance/"
        "correlation) as single-pass partial aggregates — Spark merges "
        "per-partition moment sketches, no two-pass mean-then-deviation"
    ),
)
def q78(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # center the epoch on a fixed baseline: covariance is shift-invariant,
    # and ~1e9-magnitude seconds would hit catastrophic cancellation that
    # makes the last digits engine-dependent
    t = F.unix_timestamp("ts").cast("double") - 1704067200
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.stddev_samp("value"), 4).alias("sd"),
        F.round(F.var_samp("value"), 4).alias("variance"),
        F.round(F.covar_samp(F.col("value"), t), 2).alias("cov_with_time"),
        F.round(F.corr(F.col("value"), t), 4).alias("corr_with_time"),
    )


@register(
    "q79_sessionize_events",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
        SELECT user_id, ts,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n
        FROM flagged)
    SELECT user_id, session_n,
           count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
               AS duration_s
    FROM numbered
    GROUP BY user_id, session_n
    """,
    doc=(
        "sessionization with per-event session ids (gap > 30 min starts a "
        "new session): lag-flag + running sum, both windows and the final "
        "aggregate share ONE hash partitioning on user_id — complements "
        "q42's session_window aggregate, which cannot label rows"
    ),
)
def q79(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.select(
        "user_id", "ts", "event_id",
        F.when(
            F.lag("ts").over(w).isNull() | (gap > 1800), 1
        ).otherwise(0).alias("new_session"),
    )
    numbered = flagged.select(
        "user_id", "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_n"),
    )
    return numbered.groupBy("user_id", "session_n").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).cast("long").alias("duration_s"),
    )


@register(
    "q80_merge_into",
    """
    WITH src AS (
        SELECT c_custkey, c_name, round(c_acctbal + 1000, 2) AS new_bal
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, round(c_acctbal, 2)
        FROM customer WHERE c_custkey <= 5)
    SELECT coalesce(t.c_custkey, s.c_custkey) AS c_custkey,
           CASE WHEN t.c_custkey IS NOT NULL THEN t.c_name
                ELSE s.c_name END AS c_name,
           CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
                     THEN s.new_bal
                WHEN t.c_custkey IS NOT NULL THEN round(t.c_acctbal, 2)
                ELSE s.new_bal END AS acctbal
    FROM customer t
    FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
               AND t.c_acctbal < 0)
    """,
    doc=(
        "MERGE INTO under the hash gate: matched-update (acctbal refresh), "
        "matched-delete (negative balances), not-matched-insert (new "
        "keys) — the operator runs ONE full-outer join; the oracle spells "
        "the same semantics as FULL OUTER JOIN + CASE"
    ),
)
def q80(spark, sf_dir):
    from ..operators.merge import merge_into

    c = _t(spark, sf_dir, "customer")
    updates = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .select(
            "c_custkey", "c_name",
            F.round(F.col("c_acctbal") + 1000, 2).alias("new_bal"),
        )
    )
    inserts = (
        c.filter(F.col("c_custkey") <= 5)
        .select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            "c_name",
            F.round("c_acctbal", 2).alias("new_bal"),
        )
    )
    src = updates.unionByName(inserts)
    target = c.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("new_bal")
    )
    merged = merge_into(
        target,
        src,
        on=["c_custkey"],
        when_matched_update={"new_bal": F.col("__s.new_bal")},
        when_matched_delete=F.col("__t.new_bal") < 0,
    )
    return merged.select(
        "c_custkey", "c_name", F.col("new_bal").alias("acctbal")
    )


@register(
    "q81_benchmark_decontamination",
    """
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS words
        FROM documents WHERE length(trim(text)) > 0),
    sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(words) - 2),
                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                   AS shingle
        FROM toks WHERE len(words) >= 3),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT s.doc_id, count(DISTINCT s.shingle) AS n_shared
    FROM sh s JOIN bench b USING (shingle)
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
    doc=(
        "test-set decontamination (cross-set, unlike the within-corpus "
        "dedup family): flag training docs sharing any 3-gram with the "
        "benchmark split.  The benchmark shingle set is the small side — "
        "broadcast hash join, so the corpus scan never shuffles until the "
        "tiny flagged aggregate; at 100 TB this is one pass over the "
        "corpus + a KB-to-MB broadcast"
    ),
)
def q81(spark, sf_dir):
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("words"),
        )
        .filter(F.size("words") >= 3)
    )
    # persisted: feeds both the benchmark-set branch and the corpus branch
    # (Catalyst will not reuse non-identical exchanges across the two)
    shingled = d.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("words") - 2),
            lambda i: F.concat_ws(
                " ",
                F.get("words", i - 1), F.get("words", i),
                F.get("words", i + 1),
            ),
        ).alias("shingles"),
    ).select("doc_id", F.explode("shingles").alias("shingle")).persist()
    shingled = track(shingled)
    bench = (
        shingled.filter(F.col("doc_id") % 97 == 0)
        .select("shingle")
        .distinct()
    )
    return (
        shingled.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )


@register(
    "q82_group_median",
    """
    SELECT o_orderpriority,
           round(median(o_totalprice), 4) AS med_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           round(quantile_disc(o_totalprice, 0.5), 2) AS med_disc
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc=(
        "exact per-group median / continuous p90 / discrete median — "
        "single aggregate pass (Spark's exact percentile aggregates "
        "partial-merge; the approx_quantiles sketch in operators/sketch.py "
        "is the documented 100 TB alternative)"
    ),
)
def q82(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 4).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias(
            "p90_price"
        ),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"),
            2,
        ).alias("med_disc"),
    )


_STOPLIST_SQL = "['the','a','of','and','is','to','in','value','row','key']"


@register(
    "q83_vocab_set_ops",
    f"""
    WITH w AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(trim(lower(text)),
                                                   '\\s+')) AS vocab
        FROM documents WHERE length(trim(text)) > 0)
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_filter(vocab,
               t -> list_contains({_STOPLIST_SQL}, t))), '|'), '')
               AS stop_hits,
           len(list_filter(vocab,
               t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
           len(list_filter(vocab,
               t -> NOT list_contains({_STOPLIST_SQL}, t))) AS n_content
    FROM w
    """,
    doc=(
        "array set algebra (ARRAY_INTERSECT / ARRAY_EXCEPT against a "
        "literal vocabulary): per-document stopword overlap as pure "
        "higher-order expressions; arrays are sorted before comparison — "
        "set-valued columns must never rely on engine-internal element "
        "order; result surface is scalar (array_join) so any pandas/Arrow "
        "canonicalizer can hash it"
    ),
)
def q83(spark, sf_dir):
    stop = F.array(
        *[F.lit(t) for t in
          ["the", "a", "of", "and", "is", "to", "in", "value", "row", "key"]]
    )
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.array_distinct(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("vocab"),
        )
    )
    hits = F.array_intersect(F.col("vocab"), stop)
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(hits), "|").alias("stop_hits"),
        F.size(hits).cast("long").alias("n_stop"),
        F.size(F.array_except(F.col("vocab"), stop)).cast("long").alias(
            "n_content"
        ),
    )
