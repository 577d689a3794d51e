"""Fifth extension batch (round 3, cont.): conversion-window funnels,
graph triangle counting, interval-weighted aggregates, rolling anomaly
detection, and three ML-data-curation staples (out-of-fold target
encoding, kNN label-error mining, per-dimension rank normalization).

Scale notes (100 TB):
* q141 funnel: three CHAINED WINDOW MINS over one ``user_id``
  partitioning — Catalyst plans one Exchange and three Window operators
  back-to-back, so the whole funnel costs a single shuffle where the
  join-back-per-step plan (q71's shape) costs three.  Unlike q71 it also
  applies per-step CONVERSION WINDOWS (1 day), the product-analytics
  default.
* q142 triangle count: canonical-orientation wedge-close joins; edge
  explosion is bounded by order size, not corpus size.
* q143 time-weighted average: lead() + conditional sum — one window
  exchange per user, no self-join on adjacent rows.
* q144 rolling z-score: bounded ROWS frame (5 preceding) keeps per-row
  state O(frame), and the anomaly filter runs before anything wide.
* q145 OOF target encoding: global-minus-own-fold arithmetic — two
  narrow aggs + a broadcast join, never a per-row leave-one-out pass.
* q146 kNN label disagreement: brute-force scorer as the correctness
  baseline, IVF cells (q58) as the documented scale path.
* q147 rank normalization: the window exchange keys on DIMENSION INDEX,
  which is uniformly distributed by construction — skew-free at any
  corpus size.
* q148 rolling WAU: windowed COUNT DISTINCT via bounded 7-way fan-out +
  one distinct-agg — never a range self-join that rescans a week per day.
* q149 A/B z-test: md5 bucketing + two partial-aggregable reductions;
  100 TB of events reduce map-side to two cells.
* q150 streaks: gaps-and-islands (day − rank) — one window + aggs, all
  sharing the user partitioning.
* q151 seasonality: weekday origin pinned to ISO once (Spark weekday()+1
  == DuckDB isodow) instead of leaking off-by-one per query.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..cache import track
from .queries import _t, register


@register(
    "q141_event_funnel",
    """
    WITH t1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'signup' THEN ts END)
                   OVER (PARTITION BY user_id) AS ts_signup
        FROM events
    ), t2 AS (
        SELECT *,
               min(CASE WHEN event_type = 'click' AND ts >= ts_signup
                        AND ts <= ts_signup + INTERVAL 1 DAY
                        THEN ts END)
                   OVER (PARTITION BY user_id) AS ts_click
        FROM t1
    ), t3 AS (
        SELECT *,
               min(CASE WHEN event_type = 'purchase' AND ts >= ts_click
                        AND ts <= ts_click + INTERVAL 1 DAY
                        THEN ts END)
                   OVER (PARTITION BY user_id) AS ts_purchase
        FROM t2
    ), per_user AS (
        SELECT user_id,
               CASE WHEN any_value(ts_purchase) IS NOT NULL THEN 3
                    WHEN any_value(ts_click) IS NOT NULL THEN 2
                    WHEN any_value(ts_signup) IS NOT NULL THEN 1
                    ELSE 0 END AS stage
        FROM t3 GROUP BY user_id
    )
    SELECT stage, CAST(count(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY stage
    """,
    doc=(
        "first-occurrence event funnel (signup → click → purchase) with a "
        "1-day conversion window per step: each step's anchor is the "
        "earliest qualifying event at-or-after the previous step's anchor "
        "and within its window.  All three anchors are chained window "
        "mins over ONE user_id partitioning — a single shuffle end-to-end, "
        "where the textbook join-back-per-step plan costs three"
    ),
)
def q141(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = e.withColumn(
        "ts_signup",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    day = F.expr("INTERVAL 1 DAY")
    t2 = t1.withColumn(
        "ts_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("ts_signup"))
                & (F.col("ts") <= F.col("ts_signup") + day),
                F.col("ts"),
            )
        ).over(w),
    )
    t3 = t2.withColumn(
        "ts_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("ts_click"))
                & (F.col("ts") <= F.col("ts_click") + day),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = t3.groupBy("user_id").agg(
        F.when(F.any_value("ts_purchase").isNotNull(), F.lit(3))
        .when(F.any_value("ts_click").isNotNull(), F.lit(2))
        .when(F.any_value("ts_signup").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("stage")
    )
    return per_user.groupBy("stage").agg(
        F.count("*").cast("long").alias("n_users")
    )


@register(
    "q142_triangle_count",
    """
    WITH pairs AS (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS pa,
                        greatest(a.l_partkey, b.l_partkey) AS pb
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
    )
    SELECT (SELECT CAST(count(*) AS BIGINT)
            FROM pairs e1
            JOIN pairs e2 ON e2.pa = e1.pb
            JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
               AS n_triangles,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges
    """,
    doc=(
        "triangle counting on the part co-purchase graph (parts sharing an "
        "order are connected): canonical a<b edge orientation makes each "
        "triangle countable exactly once via the two-join wedge-close "
        "pattern — the standard distributed triangle plan.  Edge "
        "generation is per-order quadratic in ORDER SIZE (bounded, ~4), "
        "never corpus size; the closing joins shuffle on part keys.  At "
        "100 TB the known refinement is degree-ordered orientation "
        "(orient edges low-degree→high-degree) so wedge lists stay "
        "bounded under power-law degree skew"
    ),
)
def q142(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .distinct()
        # persisted: the edge list feeds all three join legs and the edge
        # count — without it the pair-generation shuffle runs 4×
        .persist()
    )
    pairs = track(pairs)
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    n_edges = pairs.agg(F.count("*").cast("long").alias("n_edges"))
    return tri.crossJoin(n_edges)


@register(
    "q143_time_weighted_avg",
    """
    WITH stepped AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
        FROM events
    )
    SELECT user_id,
           round(sum(value * dt_us) / sum(dt_us), 6) AS twa_value,
           CAST(count(dt_us) AS BIGINT) AS n_intervals
    FROM stepped
    WHERE dt_us IS NOT NULL
    GROUP BY user_id
    HAVING sum(dt_us) > 0
    """,
    doc=(
        "time-weighted average of a gauge value per user: each reading is "
        "weighted by how long it was current (microseconds to the next "
        "reading; the final reading carries no weight).  lead() over one "
        "user-keyed window — no self-join on adjacent rows, which is the "
        "trap translation from the SQL-Server LAG-less era.  Weights in "
        "epoch MICROseconds so both engines do exact integer arithmetic "
        "until the single final division"
    ),
)
def q143(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
            ).alias("twa_value"),
            F.count("dt_us").cast("long").alias("n_intervals"),
            F.sum("dt_us").alias("_tot"),
        )
        .filter(F.col("_tot") > 0)
        .drop("_tot")
    )


@register(
    "q144_rolling_zscore_anomalies",
    """
    WITH framed AS (
        SELECT user_id, event_id, value,
               avg(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sigma,
               count(value) OVER w AS n_prior
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           round((value - mu) / sigma, 4) AS zscore
    FROM framed
    WHERE n_prior >= 3 AND sigma > 1e-12
      AND abs((value - mu) / sigma) > 2.5
    """,
    doc=(
        "rolling z-score anomaly detection: each reading scored against "
        "the mean/stddev of its user's previous ≤5 readings (never its "
        "own — the frame ends at 1 PRECEDING, so an outlier can't mask "
        "itself).  Bounded ROWS frame = O(frame) state per row in one "
        "user-keyed window exchange; the |z|>2.5 filter runs before "
        "anything wide.  This is the batch twin of the streaming "
        "per-key-state scorer (transformWithState family)"
    ),
)
def q144(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, -1)
    )
    framed = e.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
        F.count("value").over(w).alias("n_prior"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        framed.filter(
            (F.col("n_prior") >= 3)
            & (F.col("sigma") > 1e-12)
            & (F.abs(z) > 2.5)
        )
        .select("user_id", "event_id", F.round(z, 4).alias("zscore"))
    )


@register(
    "q145_oof_target_encoding",
    """
    WITH base AS (
        SELECT c.c_nationkey AS nationkey,
               CAST(abs(hash_md5_long) % 5 AS INT) AS fold,
               o.o_totalprice AS target
        FROM (
            SELECT o_custkey, o_totalprice,
                   CAST(('0x' || substring(
                       md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                       AS BIGINT) AS hash_md5_long
            FROM orders
        ) o
        JOIN customer c ON c.c_custkey = o.o_custkey
    ), per_fold AS (
        SELECT nationkey, fold,
               sum(target) AS fold_sum,
               CAST(count(*) AS BIGINT) AS fold_n
        FROM base GROUP BY 1, 2
    ), tot AS (
        SELECT nationkey, sum(fold_sum) AS tot_sum,
               sum(fold_n) AS tot_n
        FROM per_fold GROUP BY 1
    )
    SELECT p.nationkey, p.fold,
           round((t.tot_sum - p.fold_sum) / (t.tot_n - p.fold_n), 4)
               AS oof_mean_target,
           p.fold_n AS n_rows_in_fold
    FROM per_fold p JOIN tot t USING (nationkey)
    WHERE t.tot_n > p.fold_n
    """,
    doc=(
        "out-of-fold target encoding (the leakage-free categorical "
        "encoder): each (category, fold) cell gets the target mean "
        "computed over every OTHER fold, so a row never sees its own "
        "target.  Fold membership is md5-deterministic (RNG-free, "
        "engine-neutral, reproducible across reruns — the q19/q137 "
        "discipline).  The encode is two narrow aggs (per-fold, then "
        "per-category) + a broadcast-size join: global-minus-own-fold "
        "arithmetic, never a per-row leave-one-out scan.  At 100 TB the "
        "per-fold partials combine map-side; category cardinality bounds "
        "all shuffled state"
    ),
)
def q145(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    base = (
        o.withColumn(
            "fold",
            (
                F.abs(
                    F.conv(
                        F.substring(
                            F.md5(F.col("o_orderkey").cast("string")), 1, 15
                        ),
                        16,
                        10,
                    ).cast("long")
                )
                % 5
            ).cast("int"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.col("c_nationkey").alias("nationkey"),
            "fold",
            F.col("o_totalprice").alias("target"),
        )
    )
    per_fold = base.groupBy("nationkey", "fold").agg(
        F.sum("target").alias("fold_sum"),
        F.count("*").cast("long").alias("fold_n"),
    )
    tot = per_fold.groupBy("nationkey").agg(
        F.sum("fold_sum").alias("tot_sum"), F.sum("fold_n").alias("tot_n")
    )
    return (
        per_fold.join(F.broadcast(tot), "nationkey")
        .filter(F.col("tot_n") > F.col("fold_n"))
        .select(
            "nationkey",
            "fold",
            F.round(
                (F.col("tot_sum") - F.col("fold_sum"))
                / (F.col("tot_n") - F.col("fold_n")),
                4,
            ).alias("oof_mean_target"),
            F.col("fold_n").alias("n_rows_in_fold"),
        )
    )


@register(
    "q146_knn_label_disagreement",
    """
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS q_id, q.label AS q_label,
               c.vec_id AS c_id, c.label AS c_label,
               round(list_dot_product(q.ev, c.ev)
                     / (sqrt(list_dot_product(q.ev, q.ev))
                        * sqrt(list_dot_product(c.ev, c.ev))), 6) AS sim
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rk
        FROM scored
    )
    SELECT q_id AS vec_id, any_value(q_label) AS label,
           CAST(sum(CASE WHEN c_label <> q_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disagree
    FROM ranked WHERE rk <= 5
    GROUP BY q_id
    HAVING sum(CASE WHEN c_label <> q_label THEN 1 ELSE 0 END) >= 4
    """,
    doc=(
        "label-error mining via kNN disagreement (confident-learning "
        "shape): flag vectors whose 5 nearest cosine neighbors almost all "
        "carry a different label — the standard candidate list for "
        "mislabeled training examples.  Ranking is over ROUND(sim, 6) "
        "with vec_id tiebreak (the q54 float discipline), so the neighbor "
        "set is identical cross-engine.  The registered scorer is the IVF "
        "cell-restricted kNN (similarity.ivf_topk) with nprobe == nlist, "
        "which scores the identical pair set as brute force (so the "
        "quadratic SQL oracle stays exact) but distributes the work "
        "across centroid cells instead of one broadcast-NLJ task; "
        "q146_bruteforce below is the test-only differential.  At corpus "
        "scale the same call with nprobe < nlist is the approximate path"
    ),
)
def q146(spark, sf_dir):
    from ..operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    labels = e.select("vec_id", "label")
    knn = ivf_topk(
        e.select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        ),
        e,
        k=5,
        nlist=16,
        nprobe=16,  # == nlist: every cell probed → exact, still cell-parallel
        exclude_self=True,
    )
    disagree = F.sum(
        F.when(F.col("c_label") != F.col("q_label"), 1).otherwise(0)
    )
    return (
        knn.join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("q_id"),
                    F.col("label").alias("q_label"),
                )
            ),
            "q_id",
        )
        .join(
            F.broadcast(
                labels.select("vec_id", F.col("label").alias("c_label"))
            ),
            "vec_id",
        )
        .groupBy(F.col("q_id").alias("vec_id"))
        .agg(
            F.any_value("q_label").alias("label"),
            disagree.cast("long").alias("n_disagree"),
        )
        .filter(F.col("n_disagree") >= 4)
    )


def q146_bruteforce(spark, sf_dir):
    """The original O(n²) broadcast-NLJ scorer, kept ONLY as the
    differential baseline for tests/test_queries_r3b.py — the registered
    q146 must produce identical rows via the cell-parallel IVF scorer."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "ev"
        ),
    )
    q, c = v.alias("q"), v.alias("c")
    dot = F.aggregate(
        F.zip_with("q.ev", "c.ev", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qn = F.sqrt(
        F.aggregate(
            F.transform("q.ev", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cn = F.sqrt(
        F.aggregate(
            F.transform("c.ev", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        q.join(F.broadcast(c), F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("q_id"),
            F.col("q.label").alias("q_label"),
            F.col("c.vec_id").alias("c_id"),
            F.col("c.label").alias("c_label"),
            F.round(dot / (qn * cn), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("c_id").asc()
    )
    ranked = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5
    )
    disagree = F.sum(
        F.when(F.col("c_label") != F.col("q_label"), 1).otherwise(0)
    )
    return (
        ranked.groupBy(F.col("q_id").alias("vec_id"))
        .agg(
            F.any_value("q_label").alias("label"),
            disagree.cast("long").alias("n_disagree"),
        )
        .filter(F.col("n_disagree") >= 4)
    )


@register(
    "q147_rank_normalized_dims",
    """
    WITH unnested AS (
        SELECT vec_id, u.pos, CAST(u.val AS DOUBLE) AS val
        FROM embeddings,
             LATERAL (SELECT unnest(embedding) AS val,
                             generate_subscripts(embedding, 1) AS pos) u
    ), pr AS (
        SELECT vec_id, pos,
               percent_rank() OVER (PARTITION BY pos ORDER BY val) AS p
        FROM unnested
    )
    SELECT vec_id, round(avg(p), 6) AS mean_quantile,
           round(max(p), 6) AS max_quantile
    FROM pr GROUP BY vec_id
    """,
    doc=(
        "per-dimension rank normalization (quantile scaling): every "
        "embedding coordinate is replaced by its percent-rank WITHIN that "
        "dimension — the distribution-free feature scaling that survives "
        "heavy-tailed dims where z-scoring breaks.  posexplode → one "
        "window exchange keyed by dimension index (64 balanced "
        "partitions regardless of row skew) → re-aggregate per vector.  "
        "percent_rank assigns equal values equal ranks in both engines, "
        "and the ranked values are bit-identical FLOAT inputs, so no "
        "float-comparison hazard exists before the final rounding"
    ),
)
def q147(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    unnested = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "valf")
    ).select("vec_id", "pos", F.col("valf").cast("double").alias("val"))
    w = Window.partitionBy("pos").orderBy("val")
    pr = unnested.select(
        "vec_id", F.percent_rank().over(w).alias("p")
    )
    return pr.groupBy("vec_id").agg(
        F.round(F.avg("p"), 6).alias("mean_quantile"),
        F.round(F.max("p"), 6).alias("max_quantile"),
    )


@register(
    "q148_rolling_wau",
    """
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), span AS (
        SELECT min(day) AS lo, max(day) AS hi FROM active
    ), contrib AS (
        SELECT DISTINCT user_id,
               CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM active
    ), wau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS wau FROM contrib
        GROUP BY day
    ), dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM active
        GROUP BY day
    )
    SELECT w.day, coalesce(d.dau, 0) AS dau, w.wau,
           round(coalesce(d.dau, 0) / CAST(w.wau AS DOUBLE), 4)
               AS stickiness
    FROM wau w LEFT JOIN dau d USING (day), span
    WHERE w.day <= span.hi
    """,
    doc=(
        "rolling 7-day distinct users per day (WAU) + DAU + the "
        "DAU/WAU stickiness ratio.  Windowed COUNT DISTINCT has no "
        "streaming-friendly window form, so each (user, active-day) pair "
        "is EXPLODED into the ≤7 window-end days it serves — a bounded "
        "fan-out followed by one distinct-agg, instead of the range "
        "self-join whose probe side rescans a week of data per day.  At "
        "100 TB the fan-out factor stays exactly 7 regardless of data "
        "volume, and the distinct shuffles once on (day, user)"
    ),
)
def q148(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    active = (
        e.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        # persisted: feeds the WAU fan-out, the DAU agg, and the span max
        .persist()
    )
    active = track(active)
    hi = active.agg(F.max("day").alias("hi"))
    contrib = (
        active.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.date_add(F.col("day"), 6),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day"),
        )
        .distinct()
    )
    wau = contrib.groupBy("day").agg(
        F.count("*").cast("long").alias("wau")
    )
    dau = active.groupBy("day").agg(
        F.count("*").cast("long").alias("dau")
    )
    return (
        wau.join(dau, "day", "left")
        .crossJoin(F.broadcast(hi))
        .filter(F.col("day") <= F.col("hi"))
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
            F.round(
                F.coalesce("dau", F.lit(0)) / F.col("wau").cast("double"), 4
            ).alias("stickiness"),
        )
    )


@register(
    "q149_ab_conversion_ztest",
    """
    WITH assigned AS (
        SELECT user_id,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 2 AS bucket,
               max(CASE WHEN event_type = 'purchase' AND value > 80
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ), cells AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(converted) AS BIGINT) AS conv
        FROM assigned GROUP BY bucket
    ), wide AS (
        SELECT
            max(CASE WHEN bucket = 0 THEN n END) AS n0,
            max(CASE WHEN bucket = 0 THEN conv END) AS c0,
            max(CASE WHEN bucket = 1 THEN n END) AS n1,
            max(CASE WHEN bucket = 1 THEN conv END) AS c1
        FROM cells
    )
    SELECT n0, c0, n1, c1,
           round((CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0)
                 / nullif(sqrt((CAST(c0+c1 AS DOUBLE)/(n0+n1))
                               * (1 - CAST(c0+c1 AS DOUBLE)/(n0+n1))
                               * (1.0/n0 + 1.0/n1)), 0), 4) AS z_stat
    FROM wide
    """,
    doc=(
        "two-proportion z-test for an A/B conversion experiment: users "
        "split 50/50 by md5 (deterministic, engine-neutral — the same "
        "RNG-free assignment q19/q137/q145 use, and exactly how real "
        "experiment frameworks bucket by hashed unit id), conversion = "
        "any high-value purchase, pooled-variance z on the rate delta "
        "(null-safe when a pooled rate degenerates to 0 or 1).  One "
        "per-user agg + one 2-row agg; every moment is partial-aggregable "
        "so 100 TB of events reduce map-side to two cells"
    ),
)
def q149(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    assigned = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 80),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("bucket"),
        "converted",
    )
    cells = assigned.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    wide = cells.agg(
        F.max(F.when(F.col("bucket") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("bucket") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("bucket") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("bucket") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(
            F.try_divide(
                p1 - p0,
                F.nullif(
                    F.sqrt(
                        pp
                        * (1 - pp)
                        * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
                    ),
                    F.lit(0.0),
                ),
            ),
            4,
        ).alias("z_stat"),
    )


@register(
    "q150_activity_streaks",
    """
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), grouped AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY day) AS INT) AS grp
        FROM active
    ), streaks AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS streak_len
        FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           max(streak_len) AS longest_streak,
           CAST(sum(streak_len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    """,
    doc=(
        "longest consecutive-day activity streak per user — the "
        "gaps-and-islands pattern: day minus its per-user rank is "
        "constant exactly within a consecutive run, so streaks fall out "
        "of one window + one agg, with no self-join on adjacent days.  "
        "The window and both aggs share the user_id partitioning — a "
        "single logical shuffle chain at any scale"
    ),
)
def q150(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = active.withColumn(
        "grp",
        F.date_sub(
            F.col("day"), F.row_number().over(w)
        ),
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").cast("long").alias("n_active_days"),
    )


@register(
    "q151_dow_seasonality",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               sum(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ), overall AS (
        SELECT avg(rev) AS mean_daily FROM daily
    )
    SELECT CAST(isodow(d) AS INT) AS iso_dow,
           round(avg(rev), 2) AS avg_daily_revenue,
           round(avg(rev) / any_value(overall.mean_daily), 4)
               AS seasonality_index
    FROM daily, overall
    GROUP BY 1
    """,
    doc=(
        "day-of-week seasonality index: average daily revenue per ISO "
        "weekday over the grand mean of daily revenue.  Two narrow aggs "
        "(per-day, then per-weekday) + a broadcast scalar; the weekday "
        "mapping is pinned to ISO (1=Monday) because the engines' default "
        "dayofweek() origins differ — Spark's weekday()+1 equals DuckDB's "
        "isodow(), an alignment chosen once here instead of leaking "
        "off-by-one into every calendar query"
    ),
)
def q151(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.sum("o_totalprice").alias("rev"))
    overall = daily.agg(F.avg("rev").alias("mean_daily"))
    return (
        daily.crossJoin(F.broadcast(overall))
        .groupBy((F.weekday("d") + 1).cast("int").alias("iso_dow"))
        .agg(
            F.round(F.avg("rev"), 2).alias("avg_daily_revenue"),
            F.round(
                F.avg("rev") / F.any_value("mean_daily"), 4
            ).alias("seasonality_index"),
        )
    )


@register(
    "q152_ewma",
    """
    WITH ordered AS (
        SELECT user_id, value,
               row_number() OVER w AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(any_value(n) AS BIGINT) AS n_readings,
           round(sum(CASE WHEN rn = 1
                          THEN value * power(0.8, n - 1)
                          ELSE value * 0.2 * power(0.8, n - rn) END), 4)
               AS ewma
    FROM ordered GROUP BY user_id
    """,
    doc=(
        "exponentially-weighted moving average (α=0.2) of each user's "
        "gauge series, closed form: the recursion ewma_k = αv_k + "
        "(1−α)ewma_{k−1} unrolls to per-row weights α(1−α)^{n−k} (seed "
        "row carries (1−α)^{n−1}), so the whole series folds in ONE "
        "window pass + one agg — no iterative loop, no UDAF.  Weights "
        "are ≤1 by construction (computed as (1−α)^{n−k}, never the "
        "overflowing (1−α)^{−k} form).  This is the batch twin of the "
        "monitoring EWMA a stateful stream op would maintain"
    ),
)
def q152(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    ordered = e.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    term = F.when(
        F.col("rn") == 1,
        F.col("value") * F.pow(F.lit(0.8), F.col("n") - 1),
    ).otherwise(
        F.col("value") * 0.2 * F.pow(F.lit(0.8), F.col("n") - F.col("rn"))
    )
    return ordered.groupBy("user_id").agg(
        F.any_value("n").cast("long").alias("n_readings"),
        F.round(F.sum(term), 4).alias("ewma"),
    )


@register(
    "q153_bigram_perplexity",
    """
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
        FROM documents WHERE length(trim(text)) > 0
    ), doc_bigrams AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1))
                     AS i
              FROM toks)
    ), bg AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM doc_bigrams GROUP BY w1, w2
    ), ug AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM doc_bigrams
        GROUP BY w1
    ), vocab AS (
        SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM doc_bigrams
    ), scored AS (
        SELECT d.doc_id,
               -log2((bg.c12 + 0.5) / (ug.c1 + 0.5 * vocab.v)) AS bits
        FROM doc_bigrams d
        JOIN bg ON bg.w1 = d.w1 AND bg.w2 = d.w2
        JOIN ug ON ug.w1 = d.w1
        CROSS JOIN vocab
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(bits), 4) AS bits_per_bigram
    FROM scored GROUP BY doc_id
    """,
    doc=(
        "statistical-LM quality scoring (the CCNet/KenLM perplexity "
        "filter shape, self-trained): an add-k-smoothed bigram model is "
        "fit on the corpus itself, then every document is scored by its "
        "average negative log2 bigram probability — boilerplate and "
        "gibberish both surface as outliers.  The model IS two count "
        "tables (vocab- and vocab²-bounded, partial-aggregable); scoring "
        "is the postings-shape join of doc bigrams against them, "
        "shuffling on bigram keys.  No LM binary, no UDF, fully "
        "cross-engine-checkable"
    ),
)
def q153(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.split(F.trim(F.lower("text")), r"\s+").alias("ws"),
    )
    doc_bigrams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(slice(ws, 1, size(ws) - 1),"
                " (x, i) -> struct(x as w1, ws[i + 1] as w2))"
            )
        ).alias("_i", "bgr"),
    ).select("doc_id", "bgr.w1", "bgr.w2")
    # persisted: tokenization feeds the bigram counts, the unigram
    # counts, the vocab size, AND the scoring probe — one corpus pass
    # instead of four
    doc_bigrams = track(doc_bigrams.persist())
    bg = doc_bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c12")
    )
    ug = doc_bigrams.groupBy("w1").agg(
        F.count("*").cast("long").alias("c1")
    )
    vocab = doc_bigrams.agg(
        F.countDistinct("w2").cast("double").alias("v")
    )
    scored = (
        doc_bigrams.join(bg, ["w1", "w2"])
        .join(ug, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.col("c12") + 0.5)
                    / (F.col("c1") + 0.5 * F.col("v"))
                )
            ).alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("bits"), 4).alias("bits_per_bigram"),
    )


@register(
    "q154_class_centroid_similarity",
    """
    WITH unnested AS (
        SELECT label, u.pos, CAST(u.val AS DOUBLE) AS val
        FROM embeddings,
             LATERAL (SELECT unnest(embedding) AS val,
                             generate_subscripts(embedding, 1) AS pos) u
    ), centroids AS (
        SELECT label, pos, avg(val) AS c FROM unnested GROUP BY 1, 2
    ), norms AS (
        SELECT label, sqrt(sum(c * c)) AS nrm FROM centroids GROUP BY 1
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sum(a.c * b.c) / (any_value(na.nrm) * any_value(nb.nrm)),
                 4) AS centroid_cosine
    FROM centroids a
    JOIN centroids b ON a.pos = b.pos AND a.label < b.label
    JOIN norms na ON na.label = a.label
    JOIN norms nb ON nb.label = b.label
    GROUP BY a.label, b.label
    """,
    doc=(
        "class-centroid similarity matrix: per-label mean embedding, "
        "then pairwise cosine between centroids — the confusable-class / "
        "near-duplicate-class audit run before training a classifier or "
        "stratifying a corpus by cluster.  100 TB of vectors reduce "
        "map-side to |labels|×dim centroid cells; only the "
        "|labels|²-bounded centroid table is ever joined.  Complements "
        "q133 (instance-level mutual-NN) at the aggregate level"
    ),
)
def q154(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    unnested = e.select(
        "label", F.posexplode("embedding").alias("pos", "valf")
    ).select("label", "pos", F.col("valf").cast("double").alias("val"))
    centroids = unnested.groupBy("label", "pos").agg(
        F.avg("val").alias("c")
    )
    norms = centroids.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm")
    )
    a, b = centroids.alias("a"), centroids.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .join(
            F.broadcast(norms.select(F.col("label").alias("la"),
                                     F.col("nrm").alias("na"))),
            F.col("la") == F.col("a.label"),
        )
        .join(
            F.broadcast(norms.select(F.col("label").alias("lb"),
                                     F.col("nrm").alias("nb"))),
            F.col("lb") == F.col("b.label"),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.round(
                F.sum(F.col("a.c") * F.col("b.c"))
                / (F.any_value("na") * F.any_value("nb")),
                4,
            ).alias("centroid_cosine")
        )
    )


@register(
    "q155_top_event_paths",
    """
    WITH stepped AS (
        SELECT event_type || '>' || lead(event_type, 1) OVER w
                          || '>' || lead(event_type, 2) OVER w AS path
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), counted AS (
        SELECT path, CAST(count(*) AS BIGINT) AS n FROM stepped
        WHERE path IS NOT NULL GROUP BY path
    )
    SELECT path, n FROM (
        SELECT *, row_number() OVER (ORDER BY n DESC, path ASC) AS rk
        FROM counted
    ) WHERE rk <= 10
    """,
    doc=(
        "behavioral path mining: the 10 most common 3-step event "
        "sequences across all user journeys (the funnel-DISCOVERY "
        "counterpart to q141's fixed funnel — this finds which funnels "
        "exist).  Two leads over one user-keyed window build the "
        "sliding trigram; string concat makes the path a single "
        "shuffle-friendly key.  The alphabet-bounded path table "
        "(|event_types|³ ≤ 125 here) is what reaches the final top-k, so "
        "100 TB of events reduce to a constant-size ranking problem"
    ),
)
def q155(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.lead("event_type", 2).over(w).alias("_l2"),
    ).filter(F.col("_l2").isNotNull())
    counted = stepped.groupBy("path").agg(
        F.count("*").cast("long").alias("n")
    )
    # top-k via orderBy+limit → TakeOrderedAndProject, never a global
    # rank window over the (unbounded) distinct-path table
    return (
        counted.orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
        .select("path", "n")
    )


@register(
    "q156_price_qty_correlation",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4)
               AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "grouped Pearson correlation + sample covariance between quantity "
        "and extended price: both are single-pass co-moment aggregates "
        "(partial-aggregable sums of x, y, xy, x², y²), so 100 TB reduces "
        "map-side to five scalars per group — the same shape DuckDB and "
        "Spark both implement, making the comparison engine-neutral "
        "after one final rounding"
    ),
)
def q156(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


@register(
    "q157_decayed_popularity",
    """
    WITH anchor AS (
        SELECT max(l_shipdate) AS maxd FROM lineitem
    ), scored AS (
        SELECT l_partkey,
               round(sum(exp(-date_diff('day', l_shipdate, anchor.maxd)
                             / 30.0)), 4) AS decayed_score,
               CAST(count(*) AS BIGINT) AS n_sales
        FROM lineitem, anchor
        GROUP BY l_partkey, anchor.maxd
    )
    SELECT l_partkey, decayed_score, n_sales FROM (
        SELECT *, row_number() OVER (
            ORDER BY decayed_score DESC, l_partkey ASC) AS rk
        FROM scored
    ) WHERE rk <= 20
    """,
    doc=(
        "recency-decayed popularity ranking (the recommendation/trending "
        "staple): each sale contributes exp(−age/30d), so popularity "
        "decays smoothly instead of cliff-dropping at a window edge.  The "
        "decay sum is partial-aggregable per part (one narrow shuffle); "
        "ranking happens on the ROUNDED score with an id tiebreak (the "
        "q54 float discipline) over the |parts|-bounded score table"
    ),
)
def q157(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    anchor = li.agg(F.max("l_shipdate").alias("maxd"))
    scored = (
        li.crossJoin(F.broadcast(anchor))
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(
                    F.exp(
                        -F.datediff(F.col("maxd"), F.col("l_shipdate"))
                        / 30.0
                    )
                ),
                4,
            ).alias("decayed_score"),
            F.count("*").cast("long").alias("n_sales"),
        )
    )
    # top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    # top-20, tiny combine) instead of a row_number window that would
    # single-partition the whole |parts|-sized score table
    return (
        scored.orderBy(
            F.col("decayed_score").desc(), F.col("l_partkey").asc()
        )
        .limit(20)
        .select("l_partkey", "decayed_score", "n_sales")
    )


@register(
    "q158_benford_first_digit",
    """
    WITH digits AS (
        SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                   AS VARCHAR),
                              1, 1) AS INT) AS d
        FROM orders WHERE o_totalprice >= 1
    ), obs AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ), tot AS (SELECT sum(n) AS total FROM obs)
    SELECT d, n,
           round(n / CAST(tot.total AS DOUBLE), 6) AS observed_frac,
           round(log10(1 + 1.0 / d), 6) AS benford_frac,
           round(pow(n / CAST(tot.total AS DOUBLE)
                     - log10(1 + 1.0 / d), 2)
                 / log10(1 + 1.0 / d) * tot.total, 4) AS chi2_term
    FROM obs, tot
    """,
    doc=(
        "Benford's-law first-digit audit (the classic fraud / synthetic- "
        "data detector): observed first-significant-digit distribution of "
        "order totals vs log10(1+1/d), with per-digit chi-square "
        "contributions.  The digit extraction is integer/string only (no "
        "float formatting ambiguity cross-engine); everything reduces to "
        "a 9-row table regardless of scale"
    ),
)
def q158(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    # floor before the integer cast: DuckDB's double→BIGINT cast rounds
    # half-even while Spark's truncates — floor() agrees everywhere
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").cast("long").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    benford = F.log10(1 + 1.0 / F.col("d"))
    obs_frac = F.col("n") / F.col("total").cast("double")
    return obs.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(obs_frac, 6).alias("observed_frac"),
        F.round(benford, 6).alias("benford_frac"),
        F.round(
            F.pow(obs_frac - benford, 2) / benford * F.col("total"), 4
        ).alias("chi2_term"),
    )


@register(
    "q159_gini_revenue",
    """
    WITH per_cust AS (
        SELECT o_custkey, sum(o_totalprice) AS rev
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev ASC, o_custkey ASC) AS i,
               count(*) OVER () AS n,
               sum(rev) OVER () AS tot
        FROM per_cust
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_customers,
           round(sum((2.0 * i - n - 1) * rev)
                 / (any_value(n) * any_value(tot)), 6) AS gini
    FROM ranked
    """,
    doc=(
        "Gini coefficient of revenue concentration (the inequality "
        "summary behind every 'top X% of customers drive Y%' claim — "
        "complements q109's Pareto shares with a single comparable "
        "scalar): G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx) over ascending revenues.  "
        "The global sort runs over the |customers|-bounded aggregate, "
        "not raw orders; ties are broken by key so the rank assignment "
        "is deterministic cross-engine even though tied revenues "
        "contribute symmetrically either way.  When even the aggregate "
        "outgrows one partition, the distributed two-phase rank "
        "assigner (operators/keys.py::with_surrogate_key, "
        "range-partitioned) replaces the single-partition window — same "
        "i, no 1-partition sort"
    ),
)
def q159(spark, sf_dir):
    from ..operators.keys import with_surrogate_key

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    # rank i via the range-partitioned two-phase assigner (keys.py) —
    # identical to row_number() OVER (ORDER BY rev, o_custkey) because
    # the order is total, but no single-partition sort; n and Σx arrive
    # as a broadcast one-row aggregate instead of whole-frame windows
    ranked = with_surrogate_key(
        per_cust, ["rev", "o_custkey"], id_col="i"
    ).crossJoin(
        F.broadcast(
            per_cust.agg(
                F.count("*").cast("long").alias("n"),
                F.sum("rev").alias("tot"),
            )
        )
    )
    return ranked.agg(
        F.any_value("n").cast("long").alias("n_customers"),
        F.round(
            F.sum(
                (2.0 * F.col("i") - F.col("n") - 1) * F.col("rev")
            )
            / (F.any_value("n") * F.any_value("tot")),
            6,
        ).alias("gini"),
    )


@register(
    "q160_mutual_information",
    """
    WITH joint AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y,
               CAST(count(*) AS BIGINT) AS nxy
        FROM orders GROUP BY 1, 2
    ), mx AS (
        SELECT x, sum(nxy) AS nx FROM joint GROUP BY x
    ), my AS (
        SELECT y, sum(nxy) AS ny FROM joint GROUP BY y
    ), tot AS (SELECT sum(nxy) AS n FROM joint)
    SELECT round(sum((nxy / CAST(tot.n AS DOUBLE))
                     * log2(nxy * CAST(tot.n AS DOUBLE)
                            / (mx.nx * CAST(my.ny AS DOUBLE)))), 6)
               AS mutual_information_bits,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM joint JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    """,
    doc=(
        "mutual information between two categoricals (order priority × "
        "status) in bits: I(X;Y) = Σ p(x,y)·log2(p(x,y)/(p(x)p(y))) — "
        "the dependence measure that, unlike q124's chi-square, is "
        "directly comparable across tables and feature pairs (feature- "
        "selection staple).  One shuffle builds the joint table; "
        "marginals derive from it without touching raw rows again; "
        "everything after is |X|·|Y|-bounded"
    ),
)
def q160(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    joint = (
        o.groupBy(
            F.col("o_orderpriority").alias("x"),
            F.col("o_orderstatus").alias("y"),
        )
        .agg(F.count("*").cast("long").alias("nxy"))
        .persist()  # feeds marginals + total + the final sum
    )
    joint = track(joint)
    mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
    tot = joint.agg(F.sum("nxy").alias("n"))
    p_xy = F.col("nxy") / F.col("n").cast("double")
    lift = (
        F.col("nxy") * F.col("n").cast("double")
        / (F.col("nx") * F.col("ny").cast("double"))
    )
    return (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(p_xy * F.log2(lift)), 6).alias(
                "mutual_information_bits"
            ),
            F.count("*").cast("long").alias("n_cells"),
        )
    )


@register(
    "q161_pmi_word_pairs",
    """
    WITH doc_tokens AS (
        SELECT DISTINCT doc_id, t AS w
        FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)),
                                                '\\s+')) AS t
            FROM documents WHERE length(trim(text)) > 0
        ) WHERE length(t) > 3
    ), pairs AS (
        SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS c12
        FROM doc_tokens a
        JOIN doc_tokens b ON a.doc_id = b.doc_id AND a.w < b.w
        GROUP BY a.w, b.w HAVING count(*) >= 50
    ), uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM doc_tokens GROUP BY w
    ), nd AS (
        SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM doc_tokens
    ), scored AS (
        SELECT w1, w2, c12,
               round(log2(c12 * CAST(nd.n AS DOUBLE)
                          / (u1.c * CAST(u2.c AS DOUBLE))), 4) AS pmi
        FROM pairs
        JOIN uni u1 ON u1.w = pairs.w1
        JOIN uni u2 ON u2.w = pairs.w2
        CROSS JOIN nd
    )
    SELECT w1, w2, c12, pmi FROM (
        SELECT *, row_number() OVER (
            ORDER BY pmi DESC, w1 ASC, w2 ASC) AS rk
        FROM scored
    ) WHERE rk <= 20
    """,
    doc=(
        "pointwise mutual information over document-level co-occurrence "
        "(not adjacency — the collocation/word-association complement to "
        "q68's bigrams): PMI = log2(P(w1,w2)/(P(w1)P(w2))) on "
        "per-document DISTINCT tokens.  The pair blow-up is per-document "
        "quadratic in DISTINCT vocab per doc (bounded by doc length), "
        "never corpus-wide; the ≥50-doc support filter runs inside the "
        "pair aggregation before anything joins; ranking is on the "
        "ROUNDED score (q54 discipline)"
    ),
)
def q161(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    doc_tokens = (
        d.filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("w"),
        )
        .filter(F.length("w") > 3)
        .distinct()
        .persist()  # feeds pairs, unigram counts, and the doc total
    )
    doc_tokens = track(doc_tokens)
    a, b = doc_tokens.alias("a"), doc_tokens.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count("*").cast("long").alias("c12"))
        .filter(F.col("c12") >= 50)
    )
    uni = doc_tokens.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    nd = doc_tokens.agg(
        F.countDistinct("doc_id").cast("long").alias("n")
    )
    scored = (
        pairs.join(
            F.broadcast(uni.select(F.col("w").alias("w1"),
                                   F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"),
                                   F.col("c").alias("c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log2(
                    F.col("c12") * F.col("n").cast("double")
                    / (F.col("c1") * F.col("c2").cast("double"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    # top-k via orderBy+limit → TakeOrderedAndProject — the word-pair
    # space is the one table here that can be huge, so it must never
    # funnel through a single-partition rank window
    return (
        scored.orderBy(
            F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(20)
        .select("w1", "w2", "c12", "pmi")
    )


@register(
    "q162_survival_curve",
    """
    WITH spans AS (
        SELECT user_id,
               date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
                   AS lifespan
        FROM events GROUP BY user_id
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM spans),
    offsets AS (
        SELECT CAST(unnest(generate_series(0, lifespan)) AS INT) AS d
        FROM spans
    )
    SELECT d, CAST(count(*) AS BIGINT) AS n_surviving,
           round(count(*) / CAST(any_value(tot.n) AS DOUBLE), 6)
               AS surviving_frac
    FROM offsets, tot
    GROUP BY d
    """,
    doc=(
        "user survival curve: fraction of users whose observed lifespan "
        "(first→last activity) reaches at least d days, for every d — "
        "the churn/retention summary a subscription business reads "
        "daily.  Each user explodes into lifespan+1 offset rows (bounded "
        "by the observation window, 30 here), then one count per offset: "
        "the same bounded-fan-out trick as q148, avoiding a per-day "
        "rescan.  Monotone non-increasing by construction"
    ),
)
def q162(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")),
            F.min(F.col("ts").cast("date")),
        ).alias("lifespan")
    )
    tot = spans.agg(F.count("*").cast("long").alias("n"))
    offsets = spans.select(
        F.explode(F.sequence(F.lit(0), F.col("lifespan"))).alias("d")
    )
    return (
        offsets.crossJoin(F.broadcast(tot))
        .groupBy("d")
        .agg(
            F.count("*").cast("long").alias("n_surviving"),
            F.round(
                F.count("*") / F.any_value("n").cast("double"), 6
            ).alias("surviving_frac"),
        )
    )
