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

from pyspark.sql import Window
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


# ---------------------------------------------------------------------------
# q213 — as-of tolerance window (operators/asof.py, round-4 operator; the
# tolerance/gap-voiding path had no oracled query before this)
# ---------------------------------------------------------------------------


@register(
    "q213_asof_attribution_rollup",
    """
    WITH j AS (
        SELECT p.user_id, p.value,
               CASE WHEN c.ts IS NOT NULL
                         AND epoch_ms(p.ts) - epoch_ms(c.ts) <= 3600000
                    THEN 1 ELSE 0 END AS attributed
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT user_id,
           count(*) AS n_purchases,
           CAST(sum(attributed) AS BIGINT) AS n_attributed,
           round(sum(CASE WHEN attributed = 1 THEN value ELSE 0 END), 2)
               AS attributed_value
    FROM j
    GROUP BY user_id
    """,
    doc=(
        "as-of join with a tolerance window: purchases attributed to a "
        "click within 1h, rolled up per user.  First oracled consumer of "
        "the operator's tolerance_seconds (gap-voiding) path — which "
        "exposed a latent TIMESTAMP_NTZ cast bug, now fixed via the "
        "epoch-millis discipline (both engines compare truncated millis, "
        "so the window boundary is bit-identical); unmatched and "
        "out-of-window purchases stay in the denominator exactly as the "
        "oracle's ASOF LEFT JOIN keeps them"
    ),
)
def q213(spark, sf_dir):
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    j = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="cts",
        right_cols=[], tolerance_seconds=3600.0,
    )
    attributed = F.col("cts_asof").isNotNull()
    return j.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.sum(attributed.cast("long")).alias("n_attributed"),
        F.round(
            F.sum(F.when(attributed, F.col("value")).otherwise(0.0)), 2
        ).alias("attributed_value"),
    )


# ---------------------------------------------------------------------------
# q214/q215 — nonparametric two-sample tests (operators/rankstats.py)
# ---------------------------------------------------------------------------


@register(
    "q214_ks_two_sample",
    """
    WITH s AS (
        SELECT o_totalprice AS v,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), c AS (
        SELECT v, sum(g) AS n1v, sum(1 - g) AS n2v FROM s GROUP BY v
    ), cc AS (
        SELECT v,
               sum(n1v) OVER (ORDER BY v) AS c1,
               sum(n2v) OVER (ORDER BY v) AS c2
        FROM c
    ), t AS (
        SELECT CAST(sum(n1v) AS BIGINT) AS n1,
               CAST(sum(n2v) AS BIGINT) AS n2
        FROM c
    )
    SELECT n1, n2,
           round(max(abs(CAST(c1 AS DOUBLE) / n1
                         - CAST(c2 AS DOUBLE) / n2)), 6) AS ks_d
    FROM cc, t GROUP BY n1, n2
    """,
    doc=(
        "two-sample Kolmogorov–Smirnov D between URGENT and LOW order "
        "price distributions.  The textbook SQL needs a GLOBAL ordered "
        "cumulative window (single task sees every row); the builder "
        "instead runs the distributed prefix-sum (operators/rankstats.py "
        "— range exchange, per-partition cumsums, broadcast offsets, the "
        "keys.py two-phase pattern), so every stage stays parallel while "
        "the oracle's window replays the same cumulative counts"
    ),
)
def q214(spark, sf_dir):
    from ..operators.rankstats import ks_two_sample

    o = _t(spark, sf_dir, "orders")
    r = ks_two_sample(
        o, value_col="o_totalprice", group_col="o_orderpriority",
        g1="1-URGENT", g2="5-LOW",
    )
    return r.select("n1", "n2", F.round("ks_d", 6).alias("ks_d"))


@register(
    "q215_mann_whitney_u",
    """
    WITH s AS (
        SELECT value AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
        FROM events WHERE event_type IN ('click', 'view')
    ), c AS (
        SELECT v, sum(g) AS n1v, count(*) AS tv FROM s GROUP BY v
    ), cc AS (
        SELECT *, sum(tv) OVER (ORDER BY v) AS cumtv FROM c
    ), a AS (
        SELECT CAST(sum(n1v) AS BIGINT) AS n1,
               CAST(sum(tv) - sum(n1v) AS BIGINT) AS n2,
               sum(n1v * (cumtv - tv + (tv + 1) / 2.0)) AS r1,
               CAST(sum(tv * tv * tv - tv) AS BIGINT) AS tie
        FROM cc
    )
    SELECT n1, n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 4) AS u1,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt((n1 * n2 / 12.0)
                        * ((n1 + n2 + 1)
                           - tie / CAST((n1 + n2) * (n1 + n2 - 1)
                                        AS DOUBLE))), 6) AS z
    FROM a
    """,
    doc=(
        "Mann–Whitney U (tie-corrected rank-sum z) between click and view "
        "event values.  Average ranks come from distinct-value prefix "
        "sums (rank arithmetic on halves is EXACT in doubles, so the "
        "distributed partial sums match the oracle's sequential window "
        "bit-for-bit); the tie correction Σ(t³−t) is an integral "
        "aggregate of the same frame"
    ),
)
def q215(spark, sf_dir):
    from ..operators.rankstats import mann_whitney_u

    e = _t(spark, sf_dir, "events")
    r = mann_whitney_u(
        e, value_col="value", group_col="event_type",
        g1="click", g2="view",
    )
    return r.select(
        "n1", "n2",
        F.round("u1", 4).alias("u1"),
        F.round("z", 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# q217 — CUSUM changepoint scan over the daily revenue series
# ---------------------------------------------------------------------------


@register(
    "q217_cusum_changepoint",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100, 0)
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ), cum AS (
        SELECT day,
               sum(cents) OVER (ORDER BY day) AS cum_cents,
               sum(1) OVER (ORDER BY day) AS rnk
        FROM daily
    ), tot AS (
        SELECT CAST(sum(cents) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily
    ), scored AS (
        SELECT day, n_days,
               abs(CAST(cum_cents AS DOUBLE)
                   - rnk * (CAST(total AS DOUBLE) / n_days)) / 100.0
                   AS dev
        FROM cum, tot
    )
    SELECT n_days, day AS cp_day, round(dev, 4) AS max_cusum
    FROM scored
    QUALIFY row_number() OVER (ORDER BY dev DESC, day ASC) = 1
    """,
    doc=(
        "CUSUM changepoint scan: the day where the cumulative daily "
        "revenue most departs from the constant-rate line (argmax of "
        "|cumsum − rank·mean|).  Daily sums collapse to integer cents "
        "before the cumulative pass, so the distributed prefix sums "
        "(operators/rankstats.py, second consumer) are exact and "
        "order-independent; the final argmax tie-breaks on the day.  "
        "The series length is the DATE domain (bounded), but no stage "
        "here is single-task even if it weren't"
    ),
)
def q217(spark, sf_dir):
    from ..operators.rankstats import prefix_sums_by_value

    li = _t(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * 100,
                0,
            )
            .cast("long")
            .alias("cents")
        )
        .withColumn("one", F.lit(1).cast("long"))
    )
    cum = prefix_sums_by_value(daily, "day", ["cents", "one"])
    tot = daily.agg(
        F.sum("cents").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_days"),
    )
    scored = cum.join(F.broadcast(tot)).select(
        "day",
        "n_days",
        (
            F.abs(
                F.col("cum_cents").cast("double")
                - F.col("cum_one")
                * (F.col("total").cast("double") / F.col("n_days"))
            )
            / 100.0
        ).alias("dev"),
    )
    best = scored.agg(
        F.max_by(
            F.struct(F.col("day").alias("cp_day"), F.col("dev")),
            F.struct(F.col("dev"), F.lit(-1) * F.unix_date(F.col("day"))),
        ).alias("b"),
        F.first("n_days").alias("n_days"),
    )
    return best.select(
        "n_days",
        F.col("b.cp_day").alias("cp_day"),
        F.round("b.dev", 4).alias("max_cusum"),
    )


# ---------------------------------------------------------------------------
# q218/q219 — the hard TPC-H correlation shapes (Q20/Q21), decorrelated
# ---------------------------------------------------------------------------


@register(
    "q218_dominant_suppliers",
    """
    WITH sp AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS sq
        FROM lineitem GROUP BY 1, 2
    ), p AS (
        SELECT l_partkey, sum(l_quantity) AS pq FROM lineitem GROUP BY 1
    ), dom AS (
        SELECT sp.l_suppkey, count(*) AS n_dominated
        FROM sp JOIN p USING (l_partkey)
        WHERE sp.sq > 0.12 * p.pq
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(d.n_dominated AS BIGINT) AS n_dominated
    FROM supplier s JOIN dom d ON d.l_suppkey = s.s_suppkey
    WHERE d.n_dominated >= 3
    """,
    doc=(
        "TPC-H Q20 shape (nested IN + correlated quantity subquery) "
        "decorrelated: per-(supplier,part) and per-part shipped-quantity "
        "aggregates joined once on the part key — the correlated "
        "sub-scan becomes two grouped passes over the same fact, no "
        "per-row re-aggregation.  Quantities are integral doubles, so "
        "both engines' sums are exact in any order and the share "
        "threshold is bit-identical"
    ),
)
def q218(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    p = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("pq"))
    dom = (
        sp.join(p, "l_partkey")
        .filter(F.col("sq") > 0.12 * F.col("pq"))
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("n_dominated"))
        .filter(F.col("n_dominated") >= 3)
    )
    return dom.join(
        F.broadcast(s), dom.l_suppkey == s.s_suppkey
    ).select("s_suppkey", "s_name", "n_dominated")


@register(
    "q219_sole_late_supplier",
    """
    WITH flags AS (
        SELECT l.l_orderkey, l.l_suppkey,
               max(CASE WHEN l.l_shipdate
                             > CAST(o.o_orderdate AS TIMESTAMP)
                               + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), per_order AS (
        SELECT l_orderkey,
               count(*) AS n_suppliers,
               sum(late) AS n_late
        FROM flags GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM flags f
    JOIN per_order po USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = f.l_suppkey
    WHERE f.late = 1 AND po.n_suppliers > 1 AND po.n_late = 1
    GROUP BY 1, 2
    """,
    doc=(
        "TPC-H Q21 shape (EXISTS + NOT EXISTS correlated on the same "
        "fact: the supplier who was the ONLY late shipper on a "
        "multi-supplier order) decorrelated into one grouped pass: "
        "per-(order,supplier) late flags, per-order supplier/late "
        "counts, then a filter — the double correlated re-scan becomes "
        "two aggregations over one shuffle on the order key.  'Late' = "
        "shipped > 60 days after the order date"
    ),
)
def q219(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = F.max(
        (
            F.col("l_shipdate")
            > F.col("o_orderdate").cast("timestamp")
            + F.expr("INTERVAL 60 DAY")
        ).cast("int")
    ).alias("late")
    flags = (
        li.join(o.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late)
    )
    per_order = flags.groupBy("l_orderkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("late").alias("n_late"),
    )
    return (
        flags.join(per_order, "l_orderkey")
        .filter(
            (F.col("late") == 1)
            & (F.col("n_suppliers") > 1)
            & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q220 — weekday seasonal decomposition of the daily revenue series
# ---------------------------------------------------------------------------


@register(
    "q220_seasonal_decomposition",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100, 0)
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ), nb AS (
        SELECT d.day + to_days(CAST(o.off AS INTEGER)) AS day, d.cents
        FROM daily d, (SELECT unnest(range(-3, 4)) AS off) o
    ), trend AS (
        SELECT day, CAST(sum(cents) AS BIGINT) AS trend7
        FROM nb GROUP BY 1 HAVING count(*) = 7
    ), detr AS (
        SELECT d.day,
               dayofweek(d.day) + 1 AS dow,
               d.cents,
               7 * d.cents - t.trend7 AS detr7
        FROM daily d JOIN trend t USING (day)
    ), seas AS (
        SELECT dow,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(detr7) AS BIGINT) AS sum_detr7
        FROM detr GROUP BY 1
    ), fit AS (
        SELECT round(1.0 - var_samp(d.detr7 / 7.0
                                    - s.sum_detr7
                                      / (7.0 * s.n_days))
                           / var_samp(CAST(d.cents AS DOUBLE)), 6)
                   AS var_explained
        FROM detr d JOIN seas s USING (dow)
    )
    SELECT s.dow, s.n_days,
           round(s.sum_detr7 / (7.0 * s.n_days) / 100.0, 4)
               AS seasonal_dollars,
           f.var_explained
    FROM seas s, fit f
    """,
    doc=(
        "weekday seasonal decomposition of daily revenue (STL-lite): "
        "7-day centered-moving-average trend, per-weekday seasonal "
        "index over the detrended series, residual variance explained.  "
        "The centered MA is a bounded ±3-day explode + keyed re-group "
        "(the q148 trick — never a global ordered window), and the "
        "detrending is kept in 7×-scaled INTEGER cents (7·cents − "
        "Σ₇cents), so every aggregate before the final divisions is "
        "exact in any order; variance-explained is a ratio of two "
        "variances over identical rows, robust to last-bit noise"
    ),
)
def q220(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * 100,
            0,
        )
        .cast("long")
        .alias("cents")
    )
    offs = F.array(*[F.lit(i) for i in range(-3, 4)])
    nb = daily.select(
        F.explode(offs).alias("off"), "day", "cents"
    ).select(F.expr("date_add(day, off)").alias("day"), "cents")
    trend = (
        nb.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n7"),
            F.sum("cents").cast("long").alias("trend7"),
        )
        .filter(F.col("n7") == 7)
        .drop("n7")
    )
    detr = daily.join(trend, "day").select(
        "day",
        F.dayofweek("day").alias("dow"),
        "cents",
        (7 * F.col("cents") - F.col("trend7")).alias("detr7"),
    )
    seas = detr.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("detr7").cast("long").alias("sum_detr7"),
    )
    fit = (
        detr.join(F.broadcast(seas), "dow")
        .agg(
            F.round(
                1.0
                - F.var_samp(
                    F.col("detr7") / 7.0
                    - F.col("sum_detr7") / (7.0 * F.col("n_days"))
                )
                / F.var_samp(F.col("cents").cast("double")),
                6,
            ).alias("var_explained")
        )
    )
    return seas.join(F.broadcast(fit)).select(
        "dow",
        "n_days",
        F.round(
            F.col("sum_detr7") / (7.0 * F.col("n_days")) / 100.0, 4
        ).alias("seasonal_dollars"),
        "var_explained",
    )


# ---------------------------------------------------------------------------
# q221 — sliding-window distinct via mergeable KMV sketches
# ---------------------------------------------------------------------------

_Q221_K = 32
_Q221_HEX = 13  # 52 bits: exact in a double in both engines


@register(
    "q221_sliding_kmv_wau",
    f"""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), hv AS (
        SELECT day, user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1,
                               {_Q221_HEX}))::BIGINT AS h
        FROM du
    ), daily AS (
        SELECT day, list_sort(list(h)) AS sk FROM (
            SELECT day, h, row_number() OVER (
                PARTITION BY day ORDER BY h, user_id) AS rn
            FROM hv) WHERE rn <= {_Q221_K}
        GROUP BY day
    ), contrib AS (
        SELECT d.day + to_days(CAST(o.off AS INTEGER)) AS day, d.sk
        FROM daily d, (SELECT unnest(range(0, 7)) AS off) o
    ), merged AS (
        SELECT c.day,
               list_sort(list_distinct(flatten(list(c.sk)))) AS u
        FROM contrib c JOIN daily t ON t.day = c.day
        GROUP BY c.day
    ), est AS (
        SELECT day,
               CAST(least(len(u), {_Q221_K}) AS BIGINT) AS k_seen,
               CASE WHEN len(u) >= {_Q221_K} THEN u[{_Q221_K}] END
                   AS kth_hash,
               CASE WHEN len(u) < {_Q221_K}
                    THEN CAST(len(u) AS DOUBLE)
                    ELSE round(({_Q221_K} - 1) * power(16.0, {_Q221_HEX})
                               / u[{_Q221_K}], 2) END AS est_wau
        FROM merged
    ), exact AS (
        SELECT c.day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS exact_wau
        FROM (SELECT d.day + to_days(CAST(o.off AS INTEGER)) AS day,
                     d.user_id
              FROM du d, (SELECT unnest(range(0, 7)) AS off) o) c
        JOIN daily t ON t.day = c.day
        GROUP BY c.day
    )
    SELECT CAST(e.day AS DATE) AS day, exact_wau, k_seen, kth_hash,
           est_wau,
           round(abs(est_wau - exact_wau) / exact_wau, 4) AS rel_err
    FROM est e JOIN exact USING (day)
    """,
    doc=(
        "7-day rolling distinct users via MERGEABLE KMV sketches: one "
        "k-smallest-md5 sketch per day, sliding windows merge 7 sketches "
        "(union → k smallest) through the bounded ×7 explode — the scale "
        "path where q148's exact rolling WAU would re-shuffle every "
        "(day,user) pair 7×, this moves only k·7 hashes per window "
        "however many users exist.  md5 + 52-bit prefixes keep the "
        "sketch engine-neutral, so the oracle verifies the merged kth "
        "hash itself, and the exact rolling count rides along with the "
        "relative error — the estimate's quality is part of the checked "
        "result"
    ),
)
def q221(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    hv = du.withColumn(
        "h",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, _Q221_HEX),
            16, 10,
        ).cast("long"),
    )
    wd = Window.partitionBy("day").orderBy("h", "user_id")
    daily = (
        hv.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= _Q221_K)
        .groupBy("day")
        .agg(F.array_sort(F.collect_list("h")).alias("sk"))
    )
    days = daily.select("day")
    offs = F.array(*[F.lit(i) for i in range(7)])
    contrib = daily.select(
        F.explode(offs).alias("off"), "day", "sk"
    ).select(F.expr("date_add(day, off)").alias("day"), "sk")
    merged = (
        contrib.join(days, "day")
        .groupBy("day")
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("sk")))
            ).alias("u")
        )
    )
    est = merged.select(
        "day",
        F.least(F.size("u"), F.lit(_Q221_K)).cast("long").alias("k_seen"),
        F.when(
            F.size("u") >= _Q221_K, F.element_at("u", _Q221_K)
        ).alias("kth_hash"),
        F.when(F.size("u") < _Q221_K, F.size("u").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(_Q221_K - 1)) * F.pow(F.lit(16.0), _Q221_HEX)
                / F.element_at("u", _Q221_K),
                2,
            )
        )
        .alias("est_wau"),
    )
    exact = (
        du.select(F.explode(offs).alias("off"), "day", "user_id")
        .select(F.expr("date_add(day, off)").alias("day"), "user_id")
        .join(days, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact_wau"))
    )
    return est.join(exact, "day").select(
        "day",
        "exact_wau",
        "k_seen",
        "kth_hash",
        "est_wau",
        F.round(
            F.abs(F.col("est_wau") - F.col("exact_wau"))
            / F.col("exact_wau"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# q222 — DP-style noised release (the mechanism, deterministically seeded)
# ---------------------------------------------------------------------------

_Q222_EPS = 0.5  # budget for a sensitivity-1 count query → Laplace b = 2


@register(
    "q222_dp_noised_release",
    f"""
    WITH agg AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS true_count
        FROM customer GROUP BY 1
    ), seeded AS (
        SELECT *,
               (('0x' || substr(md5('q222:' || c_mktsegment), 1, 4))::BIGINT
                + 0.5) / 65536.0 AS u
        FROM agg
    )
    SELECT c_mktsegment, true_count,
           round(true_count
                 - (1.0 / {_Q222_EPS})
                   * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
                   * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS noised_count,
           CAST({_Q222_EPS} AS DOUBLE) AS epsilon
    FROM seeded
    """,
    doc=(
        "differentially-private release mechanism, deterministically "
        "seeded: sensitivity-1 group counts + Laplace(1/ε) noise via the "
        "inverse CDF over an md5-derived uniform (u offset half a grain "
        "off the edges, so ln never sees 0).  A REAL release draws fresh "
        "randomness — this query pins the mechanism itself (scale, "
        "inverse-CDF shape, budget bookkeeping) cross-engine, the part a "
        "100 TB release pipeline must get right before the RNG is wired "
        "in.  Complements the k-anonymity audit (q182) and PII redaction "
        "(q74) in the privacy family"
    ),
)
def q222(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("true_count")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("q222:"), F.col("c_mktsegment"))), 1, 4
            ),
            16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / 65536.0
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = (
        F.lit(-1.0 / _Q222_EPS)
        * sign
        * F.log(F.lit(1.0) - 2.0 * F.abs(u - F.lit(0.5)))
    )
    return agg.select(
        "c_mktsegment",
        "true_count",
        F.round(F.col("true_count") + noise, 4).alias("noised_count"),
        F.lit(_Q222_EPS).alias("epsilon"),
    )
