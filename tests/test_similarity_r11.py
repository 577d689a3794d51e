"""Batched k-center traversal (round-11, VERDICT r10 directive 2).

The sequential traversal pays one job round-trip per center (~0.33 s
floor); ``batch>1`` amortizes it with a per-round top-B TakeOrdered plus
a driver-side threshold prune.  These tests pin:

* exact equivalence of the ``batch=1`` path with itself across calls
  (determinism) and of the batched path's FIRST pick with sequential;
* the pairwise-separation invariant every batched run must satisfy
  (centers ≥ alpha · final-radius apart — the fact the approximation
  proof rests on);
* the (2/alpha)-approximation bound on constructed geometries with a
  KNOWN optimum;
* batched ≈ sequential coverage quality on clustered data.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators import similarity as S


def _frame(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, v array<double>",
    )


def _dist(a, b):
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))


def _radius(pts, centers):
    """Max over points of distance to the nearest center."""
    return max(
        min(_dist(p, c[3]) for c in centers) for p in pts
    )


def _cluster_grid(n_clusters=6, per=8, spread=0.1, gap=100.0):
    """Well-separated clusters on a line: OPT radius for k=n_clusters
    is bounded by the intra-cluster spread."""
    pts = []
    for c in range(n_clusters):
        for j in range(per):
            # deterministic jitter in [-spread, spread], 2-d
            pts.append(
                (
                    c * gap + spread * math.sin(7.0 * j + c),
                    spread * math.cos(3.0 * j - c),
                )
            )
    return pts


def test_batch1_is_deterministic_and_matches_batched_first_pick(spark):
    pts = _cluster_grid()
    e = _frame(spark, pts)
    seq1 = S.kcenter_traverse(e, 4)
    seq2 = S.kcenter_traverse(e, 4)
    assert [c[1] for c in seq1] == [c[1] for c in seq2]
    bat = S.kcenter_traverse(e, 4, batch=4)
    # seed identical; the batched round's first acceptance is exactly
    # the sequential argmax of the same state
    assert bat[0][1] == seq1[0][1]
    assert bat[1][1] == seq1[1][1]


def test_batched_returns_k_distinct_centers(spark):
    pts = _cluster_grid()
    e = _frame(spark, pts)
    for b in (2, 3, 8):
        centers = S.kcenter_traverse(e, 9, batch=b)
        ids = [c[1] for c in centers]
        assert len(ids) == 9 and len(set(ids)) == 9
        steps = [c[0] for c in centers]
        assert steps == list(range(1, 10))


def test_batched_pairwise_separation_invariant(spark):
    """Every pair of selected centers is ≥ alpha·R apart, where R is
    the final coverage radius — the invariant the (2/alpha) proof uses.
    (Sequential Gonzalez satisfies it with alpha=1.)"""
    pts = _cluster_grid(n_clusters=5, per=10)
    e = _frame(spark, pts)
    alpha = 0.5
    centers = S.kcenter_traverse(e, 8, batch=4, alpha=alpha)
    r = _radius(pts, centers)
    for i in range(len(centers)):
        for j in range(i + 1, len(centers)):
            d = _dist(centers[i][3], centers[j][3])
            assert d >= alpha * r - 1e-9, (i, j, d, r)


def test_batched_two_over_alpha_approximation_bound(spark):
    """Constructed geometry with a known optimum: k clusters of radius
    ≤ rho separated by ``gap`` — OPT ≤ rho.  The batched traversal's
    radius must be ≤ (2/alpha)·OPT (OPT ≤ the √2·rho jitter-box
    half-diagonal)... which the separation makes much stronger in
    practice: it must land one center per cluster, giving radius ≤ the
    2√2·rho cluster diameter."""
    rho, k = 0.2, 6
    pts = _cluster_grid(n_clusters=k, per=8, spread=rho, gap=50.0)
    e = _frame(spark, pts)
    diam = 2.0 * math.sqrt(2.0) * rho
    for b, alpha in ((3, 0.5), (6, 0.5), (4, 0.25)):
        centers = S.kcenter_traverse(e, k, batch=b, alpha=alpha)
        r = _radius(pts, centers)
        # the hard guarantee, with OPT bounded by the half-diagonal
        assert r <= (2.0 / alpha) * (diam / 2.0) + 1e-9
        # and the geometric expectation: one center per cluster
        owners = {round(c[3][0] / 50.0) for c in centers}
        assert len(owners) == k
        assert r <= diam + 1e-9


def test_batched_quality_close_to_sequential_on_clusters(spark):
    pts = _cluster_grid(n_clusters=4, per=12, spread=0.3, gap=20.0)
    e = _frame(spark, pts)
    seq = S.kcenter_traverse(e, 6)
    bat = S.kcenter_traverse(e, 6, batch=3)
    r_seq = _radius(pts, seq)
    r_bat = _radius(pts, bat)
    assert r_bat <= 2.0 * r_seq + 1e-9


def test_batched_handles_k_near_corpus_size(spark):
    pts = [(float(i), 0.0) for i in range(5)]
    e = _frame(spark, pts)
    centers = S.kcenter_traverse(e, 5, batch=4)
    assert sorted(c[1] for c in centers) == [0, 1, 2, 3, 4]


def test_batched_sq_dist_consistent_with_geometry(spark):
    """The recorded sq_dist_at_selection of each accepted center is its
    true squared distance to the centers chosen BEFORE it (previous
    rounds + earlier acceptances this round), within float tolerance."""
    pts = _cluster_grid(n_clusters=4, per=6, spread=0.5, gap=10.0)
    e = _frame(spark, pts)
    centers = S.kcenter_traverse(e, 7, batch=3)
    for idx in range(1, len(centers)):
        prior = centers[:idx]
        c = centers[idx]
        true_d2 = min(_dist(c[3], p[3]) ** 2 for p in prior)
        assert c[2] == pytest.approx(true_d2, rel=1e-9, abs=1e-9)


def test_batched_invariants_hold_on_random_geometries(spark):
    """Property check over random-but-deterministic geometries: for a
    grid of (batch, alpha) settings the separation invariant (every
    center pair ≥ alpha·R apart) and the k-distinct contract must hold
    — the deterministic analogue of a hypothesis sweep (seeded math,
    no RNG state, so failures replay exactly)."""
    import math as _m

    for seed in (3, 11):
        pts = [
            (
                7.0 * _m.sin(0.7 * i + seed) + 2.0 * _m.cos(2.3 * i),
                7.0 * _m.cos(1.1 * i - seed) + 2.0 * _m.sin(3.7 * i),
                0.5 * _m.sin(5.0 * i + 2 * seed),
            )
            for i in range(60)
        ]
        e = _frame(spark, pts)
        for batch, alpha in ((2, 0.5), (5, 0.5), (4, 0.3)):
            centers = S.kcenter_traverse(e, 10, batch=batch, alpha=alpha)
            ids = [c[1] for c in centers]
            assert len(set(ids)) == 10, (seed, batch, alpha)
            r = _radius(pts, centers)
            for i in range(len(centers)):
                for j in range(i + 1, len(centers)):
                    d = _dist(centers[i][3], centers[j][3])
                    assert d >= alpha * r - 1e-9, (
                        seed, batch, alpha, i, j, d, r,
                    )
