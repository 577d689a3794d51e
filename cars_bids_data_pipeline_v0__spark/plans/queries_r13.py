"""Round-13 batch (q314+): behavioral/event-stream depth (sessions,
funnels, anomalies), corpus divergence + duplication structure, and
embedding-space audits.

* **q314 session size/duration stats** — 30-minute-gap sessionization
  (the q42/q308 timeout, applied) with per-size-bucket session counts
  and duration quantiles: the engagement-shape readout behind every
  retention dashboard.
* **q315 ordered funnel conversion** — view → click-after-view →
  purchase-after-click with strict timestamp ordering (min-ts chain,
  three keyed aggregates — never a per-user sequence collect).
* **q316 per-source unigram KL divergence** — KL(source ‖ corpus) in
  bits over the global top-100 vocabulary (deterministic count-desc/
  word-asc tie-break), add-½ smoothing: the distribution-shift score
  DSIR-style mixing reads.
* **q317 embedding anisotropy** — per label: mean vector norm and the
  exact mean pairwise cosine of normalized vectors via the closed form
  (‖Σu‖² − n)/(n(n−1)) — two bounded aggregates, no pairwise join.
* **q318 duplicate-cluster histogram** — per-source fingerprint-family
  size distribution (how MANY k-clone clusters, not just a dup rate).
* **q319 daily volume anomalies** — per-type day counts z-scored
  against that type's own mean/stddev_pop; |z| ≥ 1.5 rows only.
  Integer day counts make both engines' moments bit-exact.
* **q320 receipt-lag percentiles** — monthly p50/p90 of
  receipt-minus-ship days per ship mode (exact interpolated
  percentiles, q289 discipline).
* **q321 word-length entropy** — per-source Shannon entropy of the
  word-length distribution (capped at 20), a tokenizer-free prose
  shape signal.
* **q322 asymmetric int8 quantization error** — zero-point (min/max)
  int8 quantization per vector, relative MSE per label — the
  asymmetric twin of q310's symmetric sweep.
* **q323 props JSON field stats** — per-type stats of the ``k``
  payload field extracted with the same guarded regexp in both
  engines (ANSI-safe try_cast).
* **q324 dedup-index audit** — the round-13 persistent dedup index's
  rows (fingerprint + shingle-set size) recomputed from scratch by
  the SQL oracle: the index build itself under the value-hash gate.
* **q325 revenue concentration** — Lorenz-by-decile over per-customer
  revenue in integer cents (exact-percentile 9-cut broadcast, never a
  global rank window).
* **q326 weekly activity profile** — per-type (dow × hour) heatmap
  peak + share + 168-cell entropy (human rhythm vs machine traffic).

Reference parity: none — LLM-pipeline/event-analytics extensions
(SURVEY §2 addenda).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, register
from .queries_r12 import _Q299_DOCS_SQL

# ---------------------------------------------------------------------------
# q314 — session size/duration stats (30-minute gap sessionization)
# ---------------------------------------------------------------------------

_Q314_GAP_US = 30 * 60 * 1_000_000


@register(
    "q314_session_stats",
    f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_us
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN prev_us IS NULL
                         OR us - prev_us > {_Q314_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM ordered
    ), sess AS (
        SELECT user_id, us,
               sum(brk) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM flagged
    ), per_sess AS (
        SELECT user_id, sid,
               CAST(count(*) AS BIGINT) AS n_events,
               (max(us) - min(us)) / 1000000.0 AS dur_sec
        FROM sess GROUP BY user_id, sid
    ), bucketed AS (
        SELECT CASE WHEN n_events = 1 THEN '1'
                    WHEN n_events <= 3 THEN '2-3'
                    WHEN n_events <= 7 THEN '4-7'
                    ELSE '8+' END AS size_bucket,
               n_events, dur_sec
        FROM per_sess
    )
    SELECT size_bucket,
           CAST(count(*) AS BIGINT) AS n_sessions,
           round(avg(n_events), 4) AS avg_events,
           round(avg(dur_sec), 4) AS avg_dur_sec,
           round(quantile_cont(dur_sec, 0.9), 4) AS p90_dur_sec
    FROM bucketed GROUP BY size_bucket ORDER BY size_bucket
    """,
    doc=(
        "30-minute-gap sessionization with per-size-bucket stats: two "
        "KEYED windows (lag for the break flag, running sum for the "
        "session id — both partitioned by user_id, never global), one "
        "per-session aggregate, one 4-row bucket rollup.  Gap math in "
        "integer microseconds (q308's unix_micros discipline: the "
        "NTZ→TS cast offset cancels in differences).  At 100 TB the "
        "shuffle is one exchange on user_id reused by both windows "
        "and the session aggregate"
    ),
)
def q314(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull()
            | (us - F.lag(us).over(w) > _Q314_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id", "us", F.sum("brk").over(w2).alias("sid")
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        ((F.max("us") - F.min("us")) / 1000000.0).alias("dur_sec"),
    )
    bucketed = per_sess.select(
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") <= 3, "2-3")
        .when(F.col("n_events") <= 7, "4-7")
        .otherwise("8+")
        .alias("size_bucket"),
        "n_events",
        "dur_sec",
    )
    return (
        bucketed.groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
            F.round(F.avg("dur_sec"), 4).alias("avg_dur_sec"),
            F.round(
                F.percentile("dur_sec", F.lit(0.9)), 4
            ).alias("p90_dur_sec"),
        )
        .orderBy("size_bucket")
    )


# ---------------------------------------------------------------------------
# q315 — ordered funnel conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------


@register(
    "q315_funnel_conversion",
    """
    WITH ua AS (
        SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), ub AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
        FROM events e JOIN ua ON ua.user_id = e.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > ua.t_view
        GROUP BY e.user_id
    ), uc AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy
        FROM events e JOIN ub ON ub.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > ub.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
               AS n_users,
           (SELECT CAST(count(*) AS BIGINT) FROM ua) AS n_viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM ub) AS n_clicked_after,
           (SELECT CAST(count(*) AS BIGINT) FROM uc) AS n_purchased_after,
           round((SELECT count(*) FROM ub) * 1.0
                 / nullif((SELECT count(*) FROM ua), 0), 6)
               AS view_to_click,
           round((SELECT count(*) FROM uc) * 1.0
                 / nullif((SELECT count(*) FROM ub), 0), 6)
               AS click_to_purchase
    """,
    doc=(
        "strict-order funnel: first view, first click AFTER that "
        "view, first purchase AFTER that click — three keyed min-ts "
        "aggregates chained by user_id equi-joins (the scalable shape; "
        "never collect_list-of-events-per-user).  Single-row output "
        "assembled from broadcast one-row frames"
    ),
)
def q315(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = e.select("user_id", "event_type", us.alias("us"))
    ua = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    ub = (
        ev.filter(F.col("event_type") == "click")
        .join(ua, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    uc = (
        ev.filter(F.col("event_type") == "purchase")
        .join(ub, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_buy"))
    )
    tot = ev.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    na = ua.agg(F.count(F.lit(1)).cast("long").alias("n_viewed"))
    nb = ub.agg(
        F.count(F.lit(1)).cast("long").alias("n_clicked_after")
    )
    nc = uc.agg(
        F.count(F.lit(1)).cast("long").alias("n_purchased_after")
    )
    return (
        tot.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_users",
            "n_viewed",
            "n_clicked_after",
            "n_purchased_after",
            F.round(
                F.col("n_clicked_after")
                * 1.0
                / F.nullif(F.col("n_viewed"), F.lit(0)),
                6,
            ).alias("view_to_click"),
            F.round(
                F.col("n_purchased_after")
                * 1.0
                / F.nullif(F.col("n_clicked_after"), F.lit(0)),
                6,
            ).alias("click_to_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# q316 — per-source unigram KL divergence vs the corpus
# ---------------------------------------------------------------------------

_Q316_TOPV = 100


@register(
    "q316_source_kl_divergence",
    f"""
    WITH words AS (
        SELECT source,
               unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS w
        FROM documents WHERE len(trim(text)) > 0
    ), vocab AS (
        SELECT w FROM (
            SELECT w, count(*) AS c FROM words GROUP BY w
            ORDER BY c DESC, w LIMIT {_Q316_TOPV}
        )
    ), vn AS (
        SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab
    ), cw AS (
        SELECT w.w AS w, CAST(count(*) AS BIGINT) AS c
        FROM words w JOIN vocab USING (w) GROUP BY w.w
    ), ct AS (
        SELECT CAST(sum(c) AS DOUBLE) AS t FROM cw
    ), srcs AS (
        SELECT DISTINCT source FROM documents
    ), sw AS (
        SELECT w.source, w.w AS w, CAST(count(*) AS BIGINT) AS c
        FROM words w JOIN vocab USING (w) GROUP BY w.source, w.w
    ), st AS (
        SELECT source, CAST(sum(c) AS DOUBLE) AS t FROM sw
        GROUP BY source
    ), grid AS (
        SELECT s.source, v.w,
               coalesce(sw.c, 0) AS cs,
               cw.c AS cc
        FROM srcs s CROSS JOIN vocab v
        JOIN cw ON cw.w = v.w
        LEFT JOIN sw ON sw.source = s.source AND sw.w = v.w
    )
    SELECT g.source,
           CAST(coalesce(max(st.t), 0) AS BIGINT) AS n_vocab_tokens,
           round(sum(
               ((g.cs + 0.5) / (coalesce(st.t, 0) + 0.5 * vn.v))
               * log2(((g.cs + 0.5) / (coalesce(st.t, 0) + 0.5 * vn.v))
                      / ((g.cc + 0.5) / (ct.t + 0.5 * vn.v)))
           ), 6) AS kl_bits
    FROM grid g
    LEFT JOIN st ON st.source = g.source
    CROSS JOIN ct CROSS JOIN vn
    GROUP BY g.source ORDER BY g.source
    """,
    doc=(
        "KL(source ‖ corpus) in bits over the global top-100 "
        "vocabulary (count-desc/word-asc tie-break — deterministic "
        "LIMIT), add-½ smoothing on both distributions restricted to "
        "the vocab.  The vocab and per-source totals are broadcast-"
        "sized; the only corpus-scale pass is the word count.  The "
        "distribution-shift readout a DSIR/DoReMi mixing decision "
        "reads per source"
    ),
)
def q316(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = d.filter(F.length(F.trim("text")) > 0).select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_Q316_TOPV)
        .select("w")
    )
    restricted = words.join(F.broadcast(vocab), "w")
    cw = restricted.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("cc")
    )
    ct = cw.agg(F.sum("cc").cast("double").alias("t"))
    vn = vocab.agg(F.count(F.lit(1)).cast("double").alias("v"))
    srcs = d.select("source").distinct()
    sw = restricted.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    st = sw.groupBy("source").agg(
        F.sum("cs").cast("double").alias("ts")
    )
    grid = (
        srcs.crossJoin(F.broadcast(vocab))
        .join(F.broadcast(cw), "w")
        .join(F.broadcast(sw), ["source", "w"], "left")
        .select(
            "source", "w", F.coalesce("cs", F.lit(0)).alias("cs"), "cc"
        )
    )
    ps = (F.col("cs") + 0.5) / (
        F.coalesce(F.col("ts"), F.lit(0.0)) + 0.5 * F.col("v")
    )
    pc = (F.col("cc") + 0.5) / (F.col("t") + 0.5 * F.col("v"))
    return (
        grid.join(F.broadcast(st), "source", "left")
        .crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(vn))
        .groupBy("source")
        .agg(
            F.coalesce(F.max("ts"), F.lit(0.0))
            .cast("long")
            .alias("n_vocab_tokens"),
            F.round(
                F.sum(ps * F.log2(ps / pc)), 6
            ).alias("kl_bits"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q317 — embedding anisotropy (exact mean pairwise cosine, closed form)
# ---------------------------------------------------------------------------


@register(
    "q317_embedding_anisotropy",
    """
    WITH v AS (
        SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), n AS (
        SELECT label, e,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
        FROM v
    ), stats AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
               avg(nrm) AS mean_norm
        FROM n GROUP BY label
    ), u AS (
        SELECT label,
               unnest(list_transform(e, x -> x / nrm)) AS val,
               unnest(generate_series(1, len(e))) AS pos
        FROM n WHERE nrm > 0
    ), s AS (
        SELECT label, pos, sum(val) AS sv FROM u GROUP BY label, pos
    ), ss AS (
        SELECT label, sum(sv * sv) AS s2 FROM s GROUP BY label
    )
    SELECT st.label, st.n_vecs,
           round(st.mean_norm, 6) AS mean_norm,
           round((ss.s2 - st.n_vecs) / (st.n_vecs * (st.n_vecs - 1)), 6)
               AS mean_pairwise_cos
    FROM stats st JOIN ss ON ss.label = st.label
    WHERE st.n_vecs > 1
    ORDER BY st.label
    """,
    doc=(
        "per-label anisotropy audit: mean vector norm plus the EXACT "
        "mean pairwise cosine of the normalized vectors via the "
        "closed form (‖Σu‖² − n)/(n(n−1)) — a posexplode + two keyed "
        "aggregates (label, then label×64 dims), never an O(n²) "
        "self-join.  High mean cosine = collapsed (anisotropic) "
        "embedding space — the representation-health check run before "
        "trusting cosine-based dedup/ANN ops on a new encoder"
    ),
)
def q317(spark, sf_dir):
    from ..operators.similarity import as_double

    e = _t(spark, sf_dir, "embeddings").select(
        "label", as_double(F.col("embedding")).alias("e")
    )
    n = e.select(
        "label",
        "e",
        F.sqrt(
            F.aggregate(
                "e", F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("nrm"),
    )
    stats = n.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.avg("nrm").alias("mean_norm"),
    )
    u = n.filter(F.col("nrm") > 0).select(
        "label",
        F.posexplode(
            F.transform("e", lambda x: x / F.col("nrm"))
        ).alias("pos0", "val"),
    )
    s = u.groupBy("label", "pos0").agg(F.sum("val").alias("sv"))
    ss = s.groupBy("label").agg(
        F.sum(F.col("sv") * F.col("sv")).alias("s2")
    )
    return (
        stats.join(ss, "label")
        .filter(F.col("n_vecs") > 1)
        .select(
            "label",
            "n_vecs",
            F.round("mean_norm", 6).alias("mean_norm"),
            F.round(
                (F.col("s2") - F.col("n_vecs"))
                / (F.col("n_vecs") * (F.col("n_vecs") - 1)),
                6,
            ).alias("mean_pairwise_cos"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q318 — duplicate-cluster size histogram per source
# ---------------------------------------------------------------------------


@register(
    "q318_dup_cluster_histogram",
    f"""
    WITH docs AS ({_Q299_DOCS_SQL}),
    fp AS (
        SELECT source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS f
        FROM docs
    ), cl AS (
        SELECT source, f, CAST(count(*) AS BIGINT) AS k
        FROM fp GROUP BY source, f
    )
    SELECT source, k, CAST(count(*) AS BIGINT) AS n_clusters
    FROM cl GROUP BY source, k ORDER BY source, k
    """,
    doc=(
        "fingerprint-family size distribution per source: how many "
        "1-clone, 2-clone, k-clone clusters each source carries (the "
        "STRUCTURE behind q247's flat dup rate — a few giant families "
        "vs many pairs demand different dedup strategies).  Two "
        "hash-group-bys over the q299 planted-dup corpus; output is "
        "|sources| × |distinct k| rows"
    ),
)
def q318(spark, sf_dir):
    from ..operators.text import fingerprint_md5

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    extra = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
    )
    docs = d.unionByName(extra)
    fp = docs.select(
        "source", fingerprint_md5(F.col("text")).alias("f")
    )
    cl = fp.groupBy("source", "f").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    return (
        cl.groupBy("source", "k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .orderBy("source", "k")
    )


# ---------------------------------------------------------------------------
# q319 — daily volume anomalies (per-type z-scores)
# ---------------------------------------------------------------------------

_Q319_Z = 1.5


@register(
    "q319_daily_volume_anomaly",
    f"""
    WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ), s AS (
        SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sd
        FROM d GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n,
           round((d.n - s.mu) / s.sd, 4) AS z
    FROM d JOIN s ON s.event_type = d.event_type
    WHERE s.sd > 0 AND abs((d.n - s.mu) / s.sd) >= {_Q319_Z}
    ORDER BY d.event_type, d.day
    """,
    doc=(
        "day-level volume anomalies per event type: each day's count "
        "z-scored against that type's own mean/stddev_pop across all "
        "days, |z| ≥ 1.5 surfaced.  Counts are integers, so both "
        "engines' moments are bit-exact (integer sums in double) and "
        "the threshold filter cannot flip between them.  Two bounded "
        "aggregates + a broadcast join on event_type"
    ),
)
def q319(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = d.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sd")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        d.join(F.broadcast(s), "event_type")
        .filter((F.col("sd") > 0) & (F.abs(z) >= _Q319_Z))
        .select(
            "event_type", "day", "n", F.round(z, 4).alias("z")
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q320 — receipt-lag percentiles by month and ship mode
# ---------------------------------------------------------------------------


@register(
    "q320_ship_lag_percentiles",
    """
    SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE)
               AS order_month,
           o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(quantile_cont(
               date_diff('day', o.o_orderdate, l.l_shipdate), 0.5), 4)
               AS p50_lag_days,
           round(quantile_cont(
               date_diff('day', o.o_orderdate, l.l_shipdate), 0.9), 4)
               AS p90_lag_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY date_trunc('month', o.o_orderdate), o.o_orderpriority
    ORDER BY order_month, o_orderpriority
    """,
    doc=(
        "monthly p50/p90 of the order-to-ship lag per order priority "
        "— the fulfillment-SLA trend (does URGENT actually ship "
        "faster, and is it drifting?).  One orderkey equi-join, exact "
        "interpolated percentiles over integer day lags (q289's "
        "quantile_cont ↔ F.percentile equivalence), months × "
        "priorities output"
    ),
)
def q320(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    lag = F.datediff("l_shipdate", "o_orderdate")
    return (
        j.groupBy(
            F.date_trunc("month", "o_orderdate")
            .cast("date")
            .alias("order_month"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(
                F.percentile(lag, F.lit(0.5)), 4
            ).alias("p50_lag_days"),
            F.round(
                F.percentile(lag, F.lit(0.9)), 4
            ).alias("p90_lag_days"),
        )
        .orderBy("order_month", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q321 — word-length distribution entropy per source
# ---------------------------------------------------------------------------

_Q321_CAP = 20


@register(
    "q321_wordlen_entropy",
    f"""
    WITH words AS (
        SELECT source,
               unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS w
        FROM documents WHERE len(trim(text)) > 0
    ), wl AS (
        SELECT source, least(len(w), {_Q321_CAP}) AS l FROM words
    ), c AS (
        SELECT source, l, CAST(count(*) AS BIGINT) AS n
        FROM wl GROUP BY source, l
    ), t AS (
        SELECT source, sum(n) AS tt FROM c GROUP BY source
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_lengths,
           round(-sum((c.n * 1.0 / t.tt) * log2(c.n * 1.0 / t.tt)), 6)
               AS len_entropy
    FROM c JOIN t ON t.source = c.source
    GROUP BY c.source ORDER BY c.source
    """,
    doc=(
        "Shannon entropy of each source's word-length distribution "
        "(lengths capped at 20): tokenizer-free prose-shape signal — "
        "tables/code/boilerplate have degenerate length profiles, "
        "natural prose a characteristic entropy band.  One corpus "
        "word pass, then |sources| × ≤20 count rows (q309's entropy "
        "shape over lengths instead of languages)"
    ),
)
def q321(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = d.filter(F.length(F.trim("text")) > 0).select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )
    c = words.select(
        "source",
        F.least(F.length("w"), F.lit(_Q321_CAP)).alias("l"),
    ).groupBy("source", "l").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("source").agg(F.sum("n").alias("tt"))
    p = F.col("n") * 1.0 / F.col("tt")
    return (
        c.join(F.broadcast(t), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lengths"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("len_entropy"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q322 — asymmetric (zero-point) int8 quantization error
# ---------------------------------------------------------------------------


@register(
    "q322_asymmetric_quant_error",
    """
    WITH v AS (
        SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
        SELECT label, e, list_min(e) AS mn, list_max(e) AS mx FROM v
    ), er AS (
        SELECT label,
               CASE WHEN mx = mn THEN 0.0 ELSE round(
                   list_sum(list_transform(e, x ->
                       pow(round((x - mn) / ((mx - mn) / 255), 0)
                           * ((mx - mn) / 255) + mn - x, 2)))
                   / list_sum(list_transform(e, x -> x * x)), 9)
               END AS rel_err
        FROM q
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(rel_err), 6) AS mean_rel_err,
           round(max(rel_err), 6) AS max_rel_err
    FROM er GROUP BY label ORDER BY label
    """,
    doc=(
        "zero-point int8 quantization (scale = (max−min)/255, the "
        "asymmetric twin of q310's symmetric sweep): per-vector "
        "relative reconstruction error, aggregated per label.  The "
        "quantize-dequantize fold stays inside one HOF per vector "
        "with the scale as a per-row column (no per-literal codegen "
        "recompiles — the r11 codegen-tax rule); round() is HALF_UP "
        "in both engines"
    ),
)
def q322(spark, sf_dir):
    from ..operators.similarity import as_double

    e = _t(spark, sf_dir, "embeddings").select(
        "label", as_double(F.col("embedding")).alias("e")
    )
    q = e.select(
        "label",
        "e",
        F.array_min("e").alias("mn"),
        F.array_max("e").alias("mx"),
    )
    scale = (F.col("mx") - F.col("mn")) / 255.0
    dequant_err = lambda x: (
        F.round((x - F.col("mn")) / scale, 0) * scale
        + F.col("mn")
        - x
    )
    er = q.select(
        "label",
        F.when(F.col("mx") == F.col("mn"), 0.0)
        .otherwise(
            F.round(
                F.aggregate(
                    "e",
                    F.lit(0.0),
                    lambda acc, x: acc + F.pow(dequant_err(x), 2),
                )
                / F.aggregate(
                    "e", F.lit(0.0), lambda acc, x: acc + x * x
                ),
                9,
            )
        )
        .alias("rel_err"),
    )
    return (
        er.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.avg("rel_err"), 6).alias("mean_rel_err"),
            F.round(F.max("rel_err"), 6).alias("max_rel_err"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q323 — props JSON field stats per event type
# ---------------------------------------------------------------------------


@register(
    "q323_props_field_stats",
    """
    WITH x AS (
        SELECT event_type,
               TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1)
                   AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(k) AS BIGINT) AS n_with_k,
           round(avg(k), 4) AS avg_k,
           round(quantile_cont(k, 0.9), 4) AS p90_k
    FROM x GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "semi-structured payload stats: the integer ``k`` field pulled "
        "out of the props JSON string with the SAME guarded regexp in "
        "both engines (regexp_extract + try_cast — ANSI-safe, "
        "no-match rows count in n_events but not the stats).  The "
        "cheap schema-on-read path for payloads too ragged for a "
        "parsed column"
    ),
)
def q323(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        F.regexp_extract("props", r'"k": (\d+)', 1)
        .try_cast("long")
        .alias("k"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_with_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.round(
                F.percentile("k", F.lit(0.9)), 4
            ).alias("p90_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q324 — dedup-index audit (the round-13 persistent index, oracled)
# ---------------------------------------------------------------------------


@register(
    "q324_dedup_index_audit",
    """
    WITH d AS (
        SELECT doc_id, source,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                   AS norm
        FROM documents
    ), t AS (
        SELECT doc_id, source, norm,
               string_split(norm, ' ') AS tk
        FROM d
    ), g AS (
        SELECT doc_id, source,
               md5(norm) AS fp,
               len(list_distinct(list_transform(
                   range(1, greatest(len(tk) - 2, 1) + 1),
                   i -> array_to_string(tk[i:i+2], ' ')))) AS sh_size
        FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
           round(avg(sh_size), 4) AS avg_sh_size,
           CAST(max(sh_size) AS BIGINT) AS max_sh_size
    FROM g GROUP BY source ORDER BY source
    """,
    doc=(
        "per-source audit of the round-13 PERSISTENT dedup index "
        "(operators.dedup_docs.build_dedup_index — the rows "
        "release_corpus(dedup_index_table=) maintains): doc count, "
        "distinct exact-dup fingerprints, and the shingle-set size "
        "profile.  The oracle recomputes the md5-of-normalized-text "
        "fingerprint AND the distinct word-3-gram count (with the "
        "<3-token whole-text rule) from scratch in SQL, so the index "
        "build itself sits under the value-hash gate — the proof that "
        "what the multi-release chain dedups against is exactly the "
        "text-derived state"
    ),
)
def q324(spark, sf_dir):
    from ..operators.dedup_docs import build_dedup_index

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    idx = build_dedup_index(d)
    return (
        idx.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("fp").cast("long").alias("n_distinct_fp"),
            F.round(F.avg("sh_size"), 4).alias("avg_sh_size"),
            F.max("sh_size").cast("long").alias("max_sh_size"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q325 — customer revenue concentration (Lorenz by decile)
# ---------------------------------------------------------------------------

_Q325_PS = tuple((i + 1) / 10 for i in range(9))


@register(
    "q325_revenue_concentration",
    f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY o_custkey
    ), cuts AS (
        SELECT quantile_cont(rev_c, {list(_Q325_PS)}) AS c FROM cust
    ), marked AS (
        SELECT cust.o_custkey, cust.rev_c,
               len(list_filter(cuts.c, x -> cust.rev_c >= x)) AS decile
        FROM cust CROSS JOIN cuts
    ), tot AS (
        SELECT CAST(sum(rev_c) AS DOUBLE) AS t,
               CAST(count(*) AS DOUBLE) AS n
        FROM cust
    )
    SELECT m.decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(m.rev_c) AS BIGINT) AS revenue_cents,
           round(sum(m.rev_c) / tot.t, 6) AS revenue_share,
           round(count(*) / tot.n, 6) AS customer_share
    FROM marked m CROSS JOIN tot
    GROUP BY m.decile, tot.t, tot.n
    ORDER BY m.decile
    """,
    doc=(
        "customer revenue concentration — the Lorenz-curve readout by "
        "revenue decile (what share of revenue the top decile of "
        "customers carries): per-customer revenue in integer CENTS "
        "(the money discipline), deciles via one exact-percentile "
        "9-value broadcast (q289/q304 — never a global rank window), "
        "two bounded aggregates.  The 80/20 audit every account team "
        "asks for, shaped to survive 100 TB"
    ),
)
def q325(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("rev_c")
    )
    cuts = cust.agg(
        F.array(
            *[F.percentile("rev_c", F.lit(p)) for p in _Q325_PS]
        ).alias("c")
    )
    tot = cust.agg(
        F.sum("rev_c").cast("double").alias("t"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    marked = cust.crossJoin(F.broadcast(cuts)).select(
        "rev_c",
        F.expr("size(filter(c, x -> rev_c >= x))").alias("decile"),
    )
    return (
        marked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("rev_c").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "revenue_cents",
            F.round(F.col("revenue_cents") / F.col("t"), 6).alias(
                "revenue_share"
            ),
            F.round(F.col("n_customers") / F.col("n"), 6).alias(
                "customer_share"
            ),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q326 — weekly activity profile per event type
# ---------------------------------------------------------------------------


@register(
    "q326_weekly_activity_profile",
    """
    WITH cells AS (
        SELECT event_type,
               dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, dayofweek(ts), hour(ts)
    ), tot AS (
        SELECT event_type, sum(n) AS t FROM cells GROUP BY event_type
    ), peak AS (
        SELECT event_type,
               min(dow * 100 + hod) FILTER (
                   WHERE n = mx
               ) AS peak_cell
        FROM (
            SELECT c.*, max(n) OVER (PARTITION BY event_type) AS mx
            FROM cells c
        ) GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(count(*) AS BIGINT) AS n_active_cells,
           CAST(max(p.peak_cell) // 100 AS BIGINT) AS peak_dow,
           CAST(max(p.peak_cell) % 100 AS BIGINT) AS peak_hour,
           round(max(c.n) * 1.0 / max(t.t), 6) AS peak_share,
           round(-sum((c.n * 1.0 / t.t) * log2(c.n * 1.0 / t.t)), 6)
               AS cell_entropy
    FROM cells c
    JOIN tot t ON t.event_type = c.event_type
    JOIN peak p ON p.event_type = c.event_type
    GROUP BY c.event_type ORDER BY c.event_type
    """,
    doc=(
        "weekly activity heatmap profile per event type: active "
        "(dow × hour) cells, the deterministic peak cell (max count, "
        "smallest dow*100+hod tiebreak), its traffic share, and the "
        "Shannon entropy of the 168-cell distribution — flat entropy "
        "= machine traffic, low entropy = human/weekly rhythm.  The "
        "per-type window is over the ≤168-cell frame (the q109 "
        "bounded-frame discipline), everything else is keyed "
        "aggregates"
    ),
)
def q326(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cells.groupBy("event_type").agg(F.sum("n").alias("t"))
    w = Window.partitionBy("event_type")
    peak = (
        cells.withColumn("mx", F.max("n").over(w))
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("n") == F.col("mx"),
                    F.col("dow") * 100 + F.col("hod"),
                )
            ).alias("peak_cell")
        )
    )
    p = F.col("n") * 1.0 / F.col("t")
    return (
        cells.join(F.broadcast(tot), "event_type")
        .join(F.broadcast(peak), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active_cells"),
            F.floor(F.max("peak_cell") / 100)
            .cast("long")
            .alias("peak_dow"),
            (F.max("peak_cell") % 100).cast("long").alias("peak_hour"),
            F.round(
                F.max("n") * 1.0 / F.max("t"), 6
            ).alias("peak_share"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("cell_entropy"),
        )
        .orderBy("event_type")
    )
