"""Plan-shape + sharp-edge semantics for the fifth query batch
(queries_r3b.py).  Values are pinned by the DuckDB oracle; these tests pin
(a) the physical plans that decide 100 TB behavior and (b) the semantic
edges the oracle can't distinguish because both engines run the same
reading (e.g. the funnel's conversion-window bound, the z-score frame
excluding the scored row itself)."""

from __future__ import annotations

import datetime as dt
import io
from contextlib import redirect_stdout

from pyspark.sql import Row

from cars_bids_data_pipeline_v0__spark.plans.queries import (
    REGISTRY,
    _load_extensions,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _q(spark, name, sf=SF):
    _load_extensions()
    return REGISTRY[name].builder(spark, sf)


def _events_dir(spark, tmp_path, rows):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m),
                user_id=u,
                event_type=t,
                value=float(v),
                props="{}",
            )
            for i, (u, m, t, v) in enumerate(rows)
        ]
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")
    return path


def test_q141_funnel_is_single_window_shuffle(spark):
    plan = plan_of(_q(spark, "q141_event_funnel"))
    # three chained window mins over ONE user_id partitioning: the three
    # Window operators must not each force their own exchange, and no
    # global (SinglePartition) window may appear
    assert plan.count("Window") >= 3
    assert "SinglePartition" not in plan
    # exactly 2 shuffles: one feeding all three Windows + the per-user
    # agg, one for the final stage histogram ("hashpartitioning" appears
    # once per Exchange node's detail block)
    assert plan.count("hashpartitioning") == 2


def test_q141_click_before_signup_does_not_convert(spark, tmp_path):
    # user 1: click at t+0, signup at t+10 → click precedes the anchor so
    # the funnel must stop at stage 1 (a naive min-click-per-user would
    # wrongly advance it)
    sf = _events_dir(
        spark,
        tmp_path,
        [
            (1, 0, "click", 1.0),
            (1, 10, "signup", 1.0),
            # user 2: proper ordering within the window → stage 3
            (2, 0, "signup", 1.0),
            (2, 5, "click", 1.0),
            (2, 9, "purchase", 1.0),
        ],
    )
    got = {
        r["stage"]: r["n_users"]
        for r in _q(spark, "q141_event_funnel", sf).collect()
    }
    assert got == {1: 1, 3: 1}


def test_q141_conversion_window_bounds_each_step(spark, tmp_path):
    # click arrives 25h after signup — outside the 1-day window → stage 1
    sf = _events_dir(
        spark,
        tmp_path,
        [(1, 0, "signup", 1.0), (1, 25 * 60, "click", 1.0)],
    )
    got = {
        r["stage"]: r["n_users"]
        for r in _q(spark, "q141_event_funnel", sf).collect()
    }
    assert got == {1: 1}


def test_q142_triangle_count_on_known_graph(spark, tmp_path):
    # orders as cliques: order 1 = {10,20,30} (1 triangle), order 2 =
    # {10,20} (duplicate edge, no new triangle), order 3 = {40,50} (edge,
    # no triangle) → 1 triangle, 4 distinct edges
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [
            Row(l_orderkey=o, l_partkey=p)
            for o, parts in [(1, [10, 20, 30]), (2, [10, 20]), (3, [40, 50])]
            for p in parts
        ]
    ).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    row = _q(spark, "q142_triangle_count", path).collect()[0]
    assert (row["n_triangles"], row["n_edges"]) == (1, 4)


def test_q143_last_reading_carries_no_weight(spark, tmp_path):
    # user 1: value 10 held for 60s, then value 99 (final — no weight);
    # TWA must be exactly 10, not pulled toward 99.  Single-reading user 2
    # has no interval at all and must not appear.
    sf = _events_dir(
        spark,
        tmp_path,
        [(1, 0, "view", 10.0), (1, 1, "view", 99.0), (2, 0, "view", 5.0)],
    )
    rows = _q(spark, "q143_time_weighted_avg", sf).collect()
    assert len(rows) == 1
    assert rows[0]["user_id"] == 1
    assert rows[0]["twa_value"] == 10.0
    assert rows[0]["n_intervals"] == 1


def test_q144_outlier_cannot_mask_itself(spark, tmp_path):
    # five flat readings then a spike: the spike is scored against the
    # PRIOR frame only (ROWS ... 1 PRECEDING), so it must be flagged even
    # though including it in its own frame would inflate sigma enough to
    # hide it
    base = [(1, m, "view", 10.0 + 0.1 * (m % 3)) for m in range(5)]
    sf = _events_dir(spark, tmp_path, base + [(1, 5, "view", 1000.0)])
    rows = _q(spark, "q144_rolling_zscore_anomalies", sf).collect()
    assert [r["event_id"] for r in rows] == [5]
    assert rows[0]["zscore"] > 2.5


def test_q145_oof_mean_excludes_own_fold(spark, tmp_path):
    # two synthetic folds via md5 parity is awkward to pin by hand, so
    # assert the invariant instead: for every (category, fold) row the
    # encoding differs from the category's global mean whenever the fold's
    # own mean differs — i.e. the row's own fold was really left out
    df = _q(spark, "q145_oof_target_encoding")
    rows = df.collect()
    assert rows, "encoder returned no cells"
    by_cat: dict[int, list] = {}
    for r in rows:
        by_cat.setdefault(r["nationkey"], []).append(r)
    for cat, cells in by_cat.items():
        assert len({c["fold"] for c in cells}) == len(cells), cat
        encodings = {c["oof_mean_target"] for c in cells}
        # distinct folds leave out distinct slices → encodings vary
        if len(cells) > 1:
            assert len(encodings) > 1, cat


def test_q146_disagreement_plan_is_broadcast_no_shuffle_blowup(spark):
    plan = plan_of(_q(spark, "q146_knn_label_disagreement"))
    # the UN-exploded query side is broadcast once and the corpus scan is
    # fanned out across tasks — the quadratic scorer must neither
    # sort-merge 250k scored rows nor run as the round-3 single-task
    # stage (fan_out keeps the streamed side multi-partition)
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    # fan_out's repartition of the streamed corpus is what prevents the
    # single-task stage on a one-file corpus
    assert "RoundRobinPartitioning" in plan


def test_q146_ivf_scorer_matches_bruteforce(spark):
    # the registered cell-parallel scorer is bit-identical to the O(n²)
    # broadcast-NLJ differential (nprobe == nlist scores every pair)
    from cars_bids_data_pipeline_v0__spark.plans.queries_r3b import (
        q146_bruteforce,
    )

    got = {
        tuple(r)
        for r in _q(spark, "q146_knn_label_disagreement").collect()
    }
    want = {tuple(r) for r in q146_bruteforce(spark, SF).collect()}
    assert got == want and len(got) > 0


def test_q147_rank_window_keys_on_dimension(spark):
    plan = plan_of(_q(spark, "q147_rank_normalized_dims"))
    # the percent_rank window partitions by pos (the dimension index) —
    # never a global single-partition sort
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan


def test_q148_wau_counts_each_user_once_per_window(spark, tmp_path):
    # user 1 active on day 1 and day 3 (within one week) → WAU for days
    # 3..7 must still count them ONCE; DAU day 3 = 2 (users 1 and 2)
    sf = _events_dir(
        spark,
        tmp_path,
        [
            (1, 0, "view", 1.0),
            (1, 2 * 24 * 60, "view", 1.0),
            (2, 2 * 24 * 60, "view", 1.0),
        ],
    )
    rows = {
        str(r["day"]): (r["dau"], r["wau"], r["stickiness"])
        for r in _q(spark, "q148_rolling_wau", sf).collect()
    }
    assert rows["2024-01-01"] == (1, 1, 1.0)
    assert rows["2024-01-03"] == (2, 2, 1.0)
    # trailing grid day after the last activity: dau 0, wau carries
    assert "2024-01-04" not in rows or rows["2024-01-04"][0] == 0


def test_q149_degenerate_rates_yield_null_not_crash(spark, tmp_path):
    # every user converts → pooled rate 1 → variance 0; the z must be
    # NULL (nullif/try_divide), not a DIVIDE_BY_ZERO under ANSI mode
    sf = _events_dir(
        spark,
        tmp_path,
        [(u, 0, "purchase", 99.0) for u in range(1, 9)],
    )
    rows = _q(spark, "q149_ab_conversion_ztest", sf).collect()
    assert len(rows) == 1
    assert rows[0]["z_stat"] is None


def test_q150_streak_breaks_on_gap(spark, tmp_path):
    # user 1: days 1,2,3 then 5,6 → longest 3, active 5; a second event
    # on day 2 must not inflate anything (distinct day collapse)
    day = 24 * 60
    sf = _events_dir(
        spark,
        tmp_path,
        [
            (1, 0 * day, "view", 1.0),
            (1, 1 * day, "view", 1.0),
            (1, 1 * day + 5, "click", 1.0),
            (1, 2 * day, "view", 1.0),
            (1, 4 * day, "view", 1.0),
            (1, 5 * day, "view", 1.0),
        ],
    )
    rows = _q(spark, "q150_activity_streaks", sf).collect()
    assert len(rows) == 1
    assert (rows[0]["longest_streak"], rows[0]["n_active_days"]) == (3, 5)


def test_q151_weekday_origin_is_iso(spark):
    rows = _q(spark, "q151_dow_seasonality").collect()
    dows = sorted(r["iso_dow"] for r in rows)
    assert dows == [1, 2, 3, 4, 5, 6, 7]
    # index averages to ~1 across weekdays (weighted by day counts it
    # need not be exact, but it must be centered, not offset by a
    # dayofweek-origin mismatch)
    mean_idx = sum(r["seasonality_index"] for r in rows) / 7
    assert 0.9 < mean_idx < 1.1


def test_q152_ewma_matches_recursion(spark, tmp_path):
    # closed form must equal the textbook recursion ewma_k = 0.2 v_k +
    # 0.8 ewma_{k-1} seeded with v_1
    vals = [10.0, 20.0, 5.0, 40.0]
    sf = _events_dir(
        spark, tmp_path, [(1, m, "view", v) for m, v in enumerate(vals)]
    )
    expect = vals[0]
    for v in vals[1:]:
        expect = 0.2 * v + 0.8 * expect
    rows = _q(spark, "q152_ewma", sf).collect()
    assert len(rows) == 1
    assert rows[0]["n_readings"] == 4
    assert abs(rows[0]["ewma"] - round(expect, 4)) < 1e-9


def test_q153_rare_bigrams_score_higher(spark):
    # a document whose bigrams are corpus-common must score (strictly)
    # fewer bits than the corpus-wide max — sanity that the model orders
    # documents, plus every doc with >=2 tokens is scored
    df = _q(spark, "q153_bigram_perplexity")
    rows = df.collect()
    assert len(rows) == 500
    bits = [r["bits_per_bigram"] for r in rows]
    assert min(bits) < max(bits)
    assert all(b > 0 for b in bits)


def test_q154_identical_clusters_have_cosine_one(spark, tmp_path):
    # two labels whose vectors are identical multiples of one direction →
    # centroid cosine exactly 1; orthogonal third label → cosine 0
    path = str(tmp_path / "tbl")
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0], label=0),
        Row(vec_id=2, embedding=[3.0, 0.0], label=0),
        Row(vec_id=3, embedding=[2.0, 0.0], label=1),
        Row(vec_id=4, embedding=[0.0, 5.0], label=2),
    ]
    spark.createDataFrame(rows).selectExpr(
        "vec_id", "CAST(embedding AS array<float>) AS embedding", "label"
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    got = {
        (r["label_a"], r["label_b"]): r["centroid_cosine"]
        for r in _q(spark, "q154_class_centroid_similarity", path).collect()
    }
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 0.0
    assert got[(1, 2)] == 0.0


def test_fact_scan_is_dynamically_pruned_by_dim_filter(spark, tmp_path):
    # dynamic partition pruning: a date-partitioned fact joined to a dim
    # whose filter selects one date must push a runtime dynamicpruning
    # subquery into the fact scan's PartitionFilters — the mechanism that
    # keeps a 100 TB fact scan proportional to the dim filter, not the
    # calendar
    fact_path = str(tmp_path / "fact")
    rows = [
        Row(k=i, day=f"2024-03-0{1 + i % 3}", v=float(i)) for i in range(60)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(fact_path)
    dim = spark.createDataFrame(
        [
            Row(day="2024-03-01", kind="keep"),
            Row(day="2024-03-02", kind="drop"),
            Row(day="2024-03-03", kind="drop"),
        ]
    )
    fact = spark.read.parquet(fact_path)
    joined = fact.join(dim.filter(dim.kind == "keep"), "day").groupBy(
        "day"
    ).count()
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain(True)
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower()
    assert [r["count"] for r in joined.collect()] == [20]


def test_q155_paths_respect_user_boundaries(spark, tmp_path):
    # trigram paths must never straddle two users' streams: user 1 has
    # exactly 3 events (1 path), user 2 has 2 (none) — a cross-user leak
    # would invent a second path
    sf = _events_dir(
        spark,
        tmp_path,
        [
            (1, 0, "view", 1.0),
            (1, 1, "click", 1.0),
            (1, 2, "purchase", 1.0),
            (2, 3, "view", 1.0),
            (2, 4, "error", 1.0),
        ],
    )
    rows = _q(spark, "q155_top_event_paths", sf).collect()
    assert [(r["path"], r["n"]) for r in rows] == [("view>click>purchase", 1)]


def test_q157_ranking_is_on_rounded_score(spark):
    # ties at 4 decimals must break by part key ascending — the float
    # discipline that keeps the top-20 identical cross-engine
    rows = _q(spark, "q157_decayed_popularity").collect()
    assert len(rows) == 20
    seen = [(r["decayed_score"], r["l_partkey"]) for r in rows]
    assert seen == sorted(seen, key=lambda t: (-t[0], t[1]))


def test_q158_benford_fractions_sum_to_one(spark):
    rows = _q(spark, "q158_benford_first_digit").collect()
    assert sorted(r["d"] for r in rows) == list(range(1, 10))
    assert abs(sum(r["observed_frac"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_frac"] for r in rows) - 1.0) < 1e-4


def test_q159_gini_bounds_and_known_case(spark, tmp_path):
    # equal revenues → gini ~ 0; one customer owning everything → → 1
    path = str(tmp_path / "tbl")
    from pyspark.sql import Row as R

    spark.createDataFrame(
        [R(o_orderkey=i, o_custkey=i, o_totalprice=100.0) for i in range(10)]
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    equal = _q(spark, "q159_gini_revenue", path).collect()[0]
    assert equal["gini"] == 0.0
    spark.createDataFrame(
        [R(o_orderkey=0, o_custkey=0, o_totalprice=10000.0)]
        + [R(o_orderkey=i, o_custkey=i, o_totalprice=0.01) for i in range(1, 10)]
    ).write.mode("overwrite").parquet(f"{path}2/orders.parquet")
    skew = _q(spark, "q159_gini_revenue", str(tmp_path / "tbl2")).collect()[0]
    assert skew["gini"] > 0.85


def test_q160_mi_zero_for_independent_and_positive_for_dependent(spark, tmp_path):
    from pyspark.sql import Row as R

    path = str(tmp_path / "ind")
    # perfectly independent 2x2 grid, balanced — MI must be exactly 0
    rows = [
        R(o_orderkey=i, o_orderpriority=p, o_orderstatus=s)
        for i, (p, s) in enumerate(
            [(p, s) for p in ("a", "b") for s in ("x", "y")] * 5
        )
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{path}/orders.parquet"
    )
    mi = _q(spark, "q160_mutual_information", path).collect()[0]
    assert mi["mutual_information_bits"] == 0.0 and mi["n_cells"] == 4
    # perfectly dependent (y = f(x)) — MI = H(X) = 1 bit for a fair split
    path2 = str(tmp_path / "dep")
    rows = [
        R(o_orderkey=i, o_orderpriority=p, o_orderstatus="x" if p == "a" else "y")
        for i, p in enumerate(["a", "b"] * 10)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{path2}/orders.parquet"
    )
    mi = _q(spark, "q160_mutual_information", path2).collect()[0]
    assert mi["mutual_information_bits"] == 1.0


def test_q162_survival_curve_is_monotone_from_one(spark):
    rows = sorted(
        _q(spark, "q162_survival_curve").collect(), key=lambda r: r["d"]
    )
    assert rows[0]["d"] == 0 and rows[0]["surviving_frac"] == 1.0
    fracs = [r["surviving_frac"] for r in rows]
    assert all(a >= b for a, b in zip(fracs, fracs[1:]))
