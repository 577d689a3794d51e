"""Round-10b query-surface tests: classifier monotonicity on planted
docs, the Poisson-bootstrap law + determinism, and farthest-point
traversal geometry — the semantics the DuckDB oracle can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.plans import queries_r10b as R10B

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# q275 — quality classifier
# ---------------------------------------------------------------------------


def test_q275_planted_quality_ordering(spark):
    """A one-token boilerplate doc must score below a diverse doc with
    stopwords — the two ends of every feature the model weighs."""
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam", "x"),
            (2, "the quick brown fox jumps over a lazy sleeping dog", "x"),
        ],
        "doc_id long, text string, source string",
    )
    orig = R10B._t
    try:
        R10B._t = lambda s, d, n: docs if n == "documents" else orig(s, d, n)
        rows = {r["doc_id"]: r for r in R10B.q275(spark, SF_DIR).collect()}
    finally:
        R10B._t = orig
    assert rows[1]["score"] < rows[2]["score"]
    assert not rows[1]["kept"]  # top_frac=1.0, ttr=0.1 → deep negative z
    assert 0.0 <= rows[1]["score"] <= 1.0 and 0.0 <= rows[2]["score"] <= 1.0


def test_q275_score_matches_sigmoid_of_features(spark):
    """Spot-check one corpus doc's score against a hand-computed
    sigmoid over its integer features."""
    out = R10B.q275(spark, SF_DIR)
    row = out.orderBy("doc_id").first()
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") == row["doc_id"])
        .first()
    )
    toks = d["text"].strip().split()
    n = len(toks)
    dist = len(set(toks))
    top = max(toks.count(t) for t in set(toks))
    chars = sum(len(t) for t in toks)
    stop = sum(1 for t in toks if t in R10B._Q275_STOPWORDS)
    z = (
        R10B._Q275_B
        + R10B._Q275_W_TTR * (dist / n)
        + R10B._Q275_W_TOP * (top / n)
        + R10B._Q275_W_LEN * (chars / n)
        + R10B._Q275_W_STOP * (stop / n)
        + R10B._Q275_W_LOGN * math.log(n)
    )
    assert abs(row["score"] - 1.0 / (1.0 + math.exp(-z))) < 5e-5
    assert row["kept"] == (z > 0)


# ---------------------------------------------------------------------------
# q276 — Poisson bootstrap
# ---------------------------------------------------------------------------


def test_q276_poisson_weight_law(spark):
    """The inverse-CDF draw must reproduce Poisson(1): mean(k) ~ 1 and
    P(k=0) ~ 1/e over a large deterministic sample."""
    n = 20_000
    from cars_bids_data_pipeline_v0__spark.operators.dedup_docs import (
        portable_hash60,
    )

    df = spark.range(n).select(
        (
            (portable_hash60(F.col("id").cast("string"), "law:") + F.lit(1.0))
            / F.lit(R10B._Q276_HASH_SPACE + 2.0)
        ).alias("u")
    )
    k = df.select(R10B._q276_k_spark(F.col("u")).alias("k"))
    row = k.agg(
        F.avg("k").alias("mean"),
        F.avg((F.col("k") == 0).cast("double")).alias("p0"),
        F.max("k").alias("kmax"),
    ).first()
    assert abs(row["mean"] - 1.0) < 0.03
    assert abs(row["p0"] - math.exp(-1)) < 0.02
    assert row["kmax"] <= 6


def test_q276_ci_brackets_point_and_is_deterministic(spark):
    out1 = {r["segment"]: r for r in R10B.q276(spark, SF_DIR).collect()}
    out2 = {r["segment"]: r for r in R10B.q276(spark, SF_DIR).collect()}
    assert out1.keys() == out2.keys() and len(out1) >= 2
    for seg, r in out1.items():
        assert r["boot_lo"] <= r["mean_price"] <= r["boot_hi"]
        # RNG-free: byte-identical across runs
        assert (r["boot_lo"], r["boot_hi"]) == (
            out2[seg]["boot_lo"],
            out2[seg]["boot_hi"],
        )


# ---------------------------------------------------------------------------
# q277 — greedy k-center
# ---------------------------------------------------------------------------


def test_q277_radius_curve_non_increasing(spark):
    rows = R10B.q277(spark, SF_DIR).orderBy("step").collect()
    assert len(rows) == R10B._Q277_K
    assert rows[0]["radius"] is None
    radii = [r["radius"] for r in rows[1:]]
    assert all(
        radii[i] >= radii[i + 1] - 1e-9 for i in range(len(radii) - 1)
    ), radii
    # k distinct centers
    assert len({r["vec_id"] for r in rows}) == R10B._Q277_K


def test_q277_picks_cluster_representatives(spark):
    """Four tight clusters + duplicates: the first four centers must
    cover all four clusters before any duplicate is picked (the
    2-approximation's defining behavior)."""
    pts = []
    corners = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)]
    vid = 0
    for cx, cy in corners:
        for dx in (0.0, 0.1, 0.2):  # cluster of 3 near-duplicates
            pts.append((vid, [cx + dx, cy]))
            vid += 1
    emb = spark.createDataFrame(
        pts, "vec_id long, embedding array<double>"
    )
    orig = R10B._t
    try:
        R10B._t = lambda s, d, n: emb if n == "embeddings" else orig(s, d, n)
        rows = (
            R10B.q277(spark, SF_DIR)
            .orderBy("step")
            .limit(4)
            .collect()
        )
    finally:
        R10B._t = orig
    cluster_of = {i: i // 3 for i in range(12)}
    assert {cluster_of[r["vec_id"]] for r in rows} == {0, 1, 2, 3}


# ---------------------------------------------------------------------------
# q278 — curriculum schedule
# ---------------------------------------------------------------------------


def test_q278_phases_partition_corpus_and_scores_descend(spark):
    out = R10B.q278(spark, SF_DIR).orderBy("phase").collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total_docs = docs.count()
    assert sum(r["n_docs"] for r in out) == total_docs
    # phases are contiguous 1..P
    assert [r["phase"] for r in out] == list(range(1, len(out) + 1))
    # the curriculum ordering: each phase's worst score is no better
    # than the previous phase's best, and within-phase hi >= lo
    for i, r in enumerate(out):
        assert r["score_hi"] >= r["score_lo"]
        if i > 0:
            assert out[i - 1]["score_lo"] >= r["score_hi"] - 1e-9
    # every full phase ends within one document of the token budget
    for r in out[:-1]:
        assert r["phase_tokens"] >= 1


# ---------------------------------------------------------------------------
# q279 — Wilson lower bound
# ---------------------------------------------------------------------------


def test_q279_wilson_bound_properties(spark):
    rows = R10B.q279(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lb"] <= r["kept_rate"] <= 1.0
        assert r["n_kept"] <= r["n_docs"]
    # the small-sample penalty: a tiny all-kept source must lower-bound
    # strictly below a large mostly-kept source
    import math

    def wilson(k, n, z=1.96):
        ph = k / n
        z2 = z * z
        return (ph + z2 / (2 * n)
                - z * math.sqrt((ph * (1 - ph) + z2 / (4 * n)) / n)) / (
            1 + z2 / n)

    assert wilson(3, 3) < wilson(180, 200)


# ---------------------------------------------------------------------------
# q280 — MinHash estimation error
# ---------------------------------------------------------------------------


def test_q280_estimates_are_sixteenths_and_err_consistent(spark):
    rows = R10B.q280(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # estimate is an exact multiple of 1/16 in [0, 1]
        assert abs(r["est"] * 16 - round(r["est"] * 16)) < 1e-9
        assert 0.0 <= r["est"] <= 1.0
        assert abs(r["abs_err"] - round(abs(r["jaccard"] - r["est"]), 6)) \
            <= 1e-9
    # LSH candidates with 4 bands of 4 rows: every exact-dup pair (the
    # corpus plants some) must estimate 1.0 with zero error
    dups = [r for r in rows if r["jaccard"] == 1.0]
    assert all(r["est"] == 1.0 and r["abs_err"] == 0.0 for r in dups)


# ---------------------------------------------------------------------------
# q281 — k-center assignment
# ---------------------------------------------------------------------------


def test_q281_cells_partition_corpus(spark):
    rows = R10B.q281(spark, SF_DIR).orderBy("step").collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert sum(r["n_points"] for r in rows) == emb.count()
    assert len(rows) == R10B._Q277_K
    sel = {r["vec_id"] for r in R10B.q277(spark, SF_DIR).collect()}
    assert {r["center_id"] for r in rows} == sel
    # every center sits in its own cell: radius >= 0, population >= 1
    for r in rows:
        assert r["n_points"] >= 1 and r["cell_radius"] >= 0.0


def test_q281_assignment_is_nearest_center(spark):
    """Spot-check: a point's cell radius upper-bounds its distance to
    the OWN center and no other center is strictly nearer (constructed
    2-D case with unambiguous geometry)."""
    pts = [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.1, 0.0]),
           (3, [9.9, 0.0]), (4, [5.0, 0.0]), (5, [10.0, 1.0]),
           (6, [0.0, 1.0]), (7, [6.0, 0.0]), (8, [4.0, 0.0]),
           (9, [10.0, 2.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    orig = R10B._t
    try:
        R10B._t = lambda s, d, n: emb if n == "embeddings" else orig(s, d, n)
        import cars_bids_data_pipeline_v0__spark.plans.queries_r10b as M
        old_k = M._Q277_K
        # k=2: centers are 0 (seed) and its farthest point; cells split
        # at x=5 with the tie (vec 4, dist 25 both ways) to center 1
        M._Q277_K = 2
        try:
            rows = {r["step"]: r for r in R10B.q281(spark, SF_DIR).collect()}
        finally:
            M._Q277_K = old_k
    finally:
        R10B._t = orig
    assert rows[1]["center_id"] == 0
    # farthest from 0 is (10, 2) = vec 9 (dist^2 104)
    assert rows[2]["center_id"] == 9
    assert rows[1]["n_points"] + rows[2]["n_points"] == 10


# ---------------------------------------------------------------------------
# q282 — trimmed mean
# ---------------------------------------------------------------------------


def test_q282_trim_bounds_and_counts(spark):
    rows = R10B.q282(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # 10% two-sided trim keeps ~80% (interpolated cuts so not exact)
        assert 0.7 * r["n_all"] <= r["n_kept"] <= r["n_all"]
        assert r["trimmed_mean"] > 0
        # trimming a right-skewed price distribution pulls the mean in;
        # at minimum the trimmed mean stays within the raw envelope
        assert r["trimmed_mean"] <= r["raw_mean"] * 1.5


# ---------------------------------------------------------------------------
# q283 — Holt linear-trend smoothing
# ---------------------------------------------------------------------------


def test_q283_exact_on_linear_series(spark):
    """On a perfectly linear daily series the recurrence is a fixed
    point: h stays on the line, b equals the slope, every one-step
    error is exactly zero (h2 = a*x2 + (1-a)*(x1+m) = x2, inductively)."""
    import datetime as dt

    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i),
         float(100_00 + 7_00 * i))  # $100 start, $7/day slope, in cents
        for i in range(50)
    ]
    daily = spark.createDataFrame(rows, "d date, x double")
    orders = daily.select(
        F.col("d").cast("timestamp").alias("o_orderdate"),
        (F.col("x") / 100.0).alias("o_totalprice"),
    )
    orig = R10B._t
    try:
        R10B._t = lambda s, dd, n: orders if n == "orders" else orig(s, dd, n)
        row = R10B.q283(spark, SF_DIR).first()
    finally:
        R10B._t = orig
    assert row["n_days"] == 50
    assert row["trend"] == 7.0
    assert row["rmse_1step"] == 0.0
    assert row["level"] == 100.0 + 7.0 * 49
    assert row["forecast_7"] == 100.0 + 7.0 * 56


def test_q283_real_series_shape(spark):
    row = R10B.q283(spark, SF_DIR).first()
    assert row["n_days"] > 100
    assert row["level"] > 0 and row["rmse_1step"] > 0


# ---------------------------------------------------------------------------
# q284 — Mann-Kendall trend test
# ---------------------------------------------------------------------------


def test_q284_known_trends(spark):
    """Strictly increasing series: S = n(n-1)/2 exactly, z > 0; the
    reversed series mirrors to -S."""
    import datetime as dt

    def series(vals):
        rows = [
            (dt.date(2024, 1, 1) + dt.timedelta(days=i), float(v))
            for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, "d date, v double"
        ).select(
            F.col("d").cast("timestamp").alias("o_orderdate"),
            F.col("v").alias("o_totalprice"),
        )

    orig = R10B._t
    try:
        up = series(range(1, 21))
        R10B._t = lambda s, dd, n: up if n == "orders" else orig(s, dd, n)
        r = R10B.q284(spark, SF_DIR).first()
        assert r["s_stat"] == 20 * 19 // 2
        assert r["direction"] == "increasing" and r["z"] > 0
        down = series(range(20, 0, -1))
        R10B._t = lambda s, dd, n: down if n == "orders" else orig(s, dd, n)
        r2 = R10B.q284(spark, SF_DIR).first()
        assert r2["s_stat"] == -r["s_stat"] and r2["z"] == -r["z"]
    finally:
        R10B._t = orig


def test_q284_real_series(spark):
    r = R10B.q284(spark, SF_DIR).first()
    assert r["n_days"] > 100
    assert abs(r["s_stat"]) <= r["n_days"] * (r["n_days"] - 1) // 2
    assert r["var18"] > 0
