"""Mergeable HLL sketches: error bounds vs exact, and the algebraic
mergeability law (rollup of partials == direct sketch of raw)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.sketch import (
    SKETCH_COL,
    approx_quantiles,
    hll_partials,
    hll_rollup,
)
from cars_bids_data_pipeline_v0__spark.sources.ingest import read_table

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_error_bound(spark):
    e = read_table(spark, SF, "events")
    partials = hll_partials(e, ["event_type"], "user_id")
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(partials, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2.0, 0.05 * n), (k, est[k], n)


def test_rollup_estimate_equals_direct_estimate(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the property that
    makes per-day partials valid forever: rolling up fine buckets gives
    the IDENTICAL estimate to a from-raw rebuild, not merely a close one."""
    e = read_table(spark, SF, "events")
    fine = hll_partials(
        e, ["event_type"], "user_id"
    )  # fine grain: per type
    rolled = hll_rollup(fine, []).collect()[0]["approx_distinct"]
    direct = (
        e.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("d")
        ).collect()[0]["d"]
    )
    assert rolled == direct


def test_partials_are_small_and_appendable(spark):
    e = read_table(spark, SF, "events")
    partials = hll_partials(e, ["event_type"], "user_id")
    row = partials.limit(1).collect()[0]
    assert isinstance(row[SKETCH_COL], (bytes, bytearray))
    assert len(row[SKETCH_COL]) < (1 << 13) + 1024  # ~2^lgk bytes + header
    # appending a new batch = unionByName of partial frames, then rollup
    two_batches = partials.unionByName(partials)
    merged = hll_rollup(two_batches, ["event_type"])
    one = hll_rollup(partials, ["event_type"])
    a = {r["event_type"]: r["approx_distinct"] for r in merged.collect()}
    b = {r["event_type"]: r["approx_distinct"] for r in one.collect()}
    assert a == b  # self-union is a no-op on the sketch lattice


def test_approx_quantiles_bracket_exact(spark):
    c = read_table(spark, SF, "customer")
    got = approx_quantiles(c, "c_acctbal", [0.25, 0.5, 0.75]).collect()[0][
        "quantiles"
    ]
    exact = c.selectExpr(
        "percentile(c_acctbal, array(0.25, 0.5, 0.75)) AS q"
    ).collect()[0]["q"]
    n = c.count()
    # rank error ≤ n/accuracy → with accuracy 10k and n≪10k it's exact-ish;
    # allow a loose value tolerance anyway
    for g, x in zip(got, exact):
        assert abs(g - x) <= max(50.0, 0.05 * abs(x) + 1e-9), (g, x, n)


def test_cms_estimates_upper_bound_true_counts(spark):
    """Count-Min invariant: every estimate ≥ its true count (hash
    collisions only ever ADD), and exact for the corpus's clear heavy
    hitters at this sketch width."""
    from cars_bids_data_pipeline_v0__spark.plans import queries as Q

    Q._load_extensions()
    rows = Q.REGISTRY["q132_cms_heavy_hitters"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 20
    assert all(r["cms_est"] >= r["true_cnt"] for r in rows)
    # relative error of the min-estimate stays modest for heavy hitters
    assert all(r["cms_est"] <= r["true_cnt"] * 2 for r in rows)


def test_kmv_sketch_merge_law(spark):
    """The 'mergeable' claim behind q128: keeping the k smallest hashes of
    a UNION equals merging two halves' k-smallest sets and re-taking the
    k smallest — so per-partition partial sketches compose exactly."""
    from pyspark.sql import functions as F

    k = 16
    base = spark.range(0, 600).select(
        F.col("id"),
        F.conv(
            F.substring(F.md5(F.col("id").cast("string")), 1, 13), 16, 10
        ).cast("long").alias("hv"),
    )
    halves = [base.filter(F.col("id") % 2 == i) for i in (0, 1)]

    def k_smallest(df):
        return [r["hv"] for r in df.orderBy("hv", "id").limit(k).collect()]

    merged_partials = sorted(k_smallest(halves[0]) + k_smallest(halves[1]))[:k]
    direct = k_smallest(base)
    assert merged_partials == direct


def test_cms_sketch_merge_law(spark):
    """CMS partial sketches add cell-wise: sketch(A ∪ B) = sketch(A) +
    sketch(B) for every (row, bucket) cell — the property that lets a
    100 TB frequency pass ship d×w cells per partition."""
    from pyspark.sql import functions as F

    def sketch(df):
        def bucket(i):
            return (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"cms{i}:"), F.col("tok"))), 1, 8
                    ), 16, 10,
                ).cast("long") % 64
            )

        rows = df.select(
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("i"), bucket(i).alias("b"))
                    for i in range(3)
                ])
            ).alias("ib")
        ).groupBy("ib.i", "ib.b").agg(F.count("*").alias("c"))
        return {(r["i"], r["b"]): r["c"] for r in rows.collect()}

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    )
    full = sketch(toks)
    a = sketch(toks.filter(F.col("doc_id") % 2 == 0))
    b = sketch(toks.filter(F.col("doc_id") % 2 == 1))
    summed = {}
    for part in (a, b):
        for cell, c in part.items():
            summed[cell] = summed.get(cell, 0) + c
    assert summed == full


def test_kmv_overlap_estimates_close_to_exact(spark):
    """q164's sketch algebra: union and Jaccard estimates must track the
    exact set sizes it also emits (k=64 → ~12% standard error; assert a
    generous 3-sigma band so the test pins correctness, not luck)."""
    from cars_bids_data_pipeline_v0__spark.plans.queries import (
        REGISTRY,
        _load_extensions,
    )

    _load_extensions()
    rows = REGISTRY["q164_kmv_source_overlap"].builder(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 6  # C(4,2) source pairs
    for r in rows:
        assert abs(r["est_union"] / r["exact_union"] - 1.0) < 0.4, r
        exact_jac = r["exact_inter"] / r["exact_union"]
        assert abs(r["jaccard_est"] - exact_jac) < 0.3, r
