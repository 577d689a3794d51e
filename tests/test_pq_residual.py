"""Residual IVF-PQ (round-11): FAISS-style codes over cell residuals.

Pins the three claims the operator makes:

* residual reconstruction error is strictly below raw-vector PQ on
  clustered data (the reason the layout exists);
* recall@k against exact cosine is at least the no-residual variant's
  on the same codebook budget, and meets an absolute floor;
* streaming sink + probe equals the batch ``ivf_pq_topk(residual=True)``
  bit-for-bit (codes are a pure function of the vector under the
  frozen centroid+codebook pair);
* with zero residuals (vectors sitting exactly on centroids), the
  residual ADC score equals exact cosine — the degenerate case where
  the reconstruction is lossless.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.pq import (
    ivf_pq_topk,
    pq_codebooks_random,
    pq_decode,
    pq_encode,
)
from cars_bids_data_pipeline_v0__spark.operators.similarity import (
    cosine_topk,
)

DIM, M, K = 16, 4, 8

CENTROIDS = [
    [5.0 if d % 4 == c else 0.3 * c for d in range(DIM)]
    for c in range(4)
]


def _offset(i: int, d: int) -> float:
    return 0.35 * math.sin(3.1 * i + 1.7 * d)


def _corpus_rows(n: int = 160):
    rows = []
    for i in range(n):
        c = i % 4
        rows.append(
            (
                i,
                [
                    CENTROIDS[c][d] + _offset(i, d)
                    for d in range(DIM)
                ],
            )
        )
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        _corpus_rows(), "vec_id long, embedding array<double>"
    )
    df.persist().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(spark):
    rows = [
        (1000 + j, [CENTROIDS[j % 4][d] + _offset(97 + j, d) for d in range(DIM)])
        for j in range(8)
    ]
    return spark.createDataFrame(
        rows, "q_id long, q_vec array<double>"
    )


def _cells(df):
    from cars_bids_data_pipeline_v0__spark.operators.similarity import (
        as_double,
        nearest_centroid_ids,
    )

    return df.withColumn(
        "cell",
        nearest_centroid_ids(as_double("embedding"), CENTROIDS, 1)[0],
    )


def _recon_err(spark, corpus, residual: bool) -> float:
    cb = pq_codebooks_random(DIM, M, K, salt="resid-test")
    with_cell = _cells(corpus)
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in CENTROIDS]
    )
    center = (
        F.element_at(cent_lit, F.col("cell") + 1) if residual else None
    )
    coded = pq_encode(with_cell, cb, center=center)
    recon = pq_decode(F.col("pq_codes"), cb)
    if residual:
        recon = F.zip_with(
            recon,
            F.element_at(cent_lit, F.col("cell") + 1),
            lambda r, c: r + c,
        )
    err = coded.select(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    recon,
                    F.col("embedding"),
                    lambda r, v: (r - v) * (r - v),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("e")
    )
    return err.agg(F.avg("e")).first()[0]


def test_residual_reconstruction_beats_raw(spark, corpus):
    e_res = _recon_err(spark, corpus, residual=True)
    e_raw = _recon_err(spark, corpus, residual=False)
    # residuals live in a tiny ball around the origin; the shared
    # codebook covers them far more densely than the raw spread
    assert e_res < e_raw * 0.5, (e_res, e_raw)


def _recall(topk_df, truth_df, q_ids) -> float:
    got = {
        (r["q_id"], r["vec_id"])
        for r in topk_df.select("q_id", "vec_id").collect()
    }
    want = {
        (r["q_id"], r["vec_id"])
        for r in truth_df.select("q_id", "vec_id").collect()
    }
    return len(got & want) / len(want)


def test_residual_recall_at_least_raw(spark, corpus, queries):
    cb = pq_codebooks_random(DIM, M, K, salt="resid-test")
    truth = cosine_topk(queries, corpus, k=10)
    kw = dict(
        k=10, nlist=4, nprobe=2, centroids=CENTROIDS,
    )
    r_res = _recall(
        ivf_pq_topk(queries, corpus, cb, residual=True, **kw),
        truth,
        None,
    )
    r_raw = _recall(
        ivf_pq_topk(queries, corpus, cb, residual=False, **kw),
        truth,
        None,
    )
    assert r_res >= r_raw - 1e-9, (r_res, r_raw)
    assert r_res >= 0.8, r_res


def test_residual_adc_score_matches_reconstruction_cosine(
    spark, corpus, queries
):
    """The scoring identity itself: adc_sim must equal the exact
    cosine of the query against ``centroid[cell] + decode(codes)``,
    recomputed independently in Python — this pins the
    ``_residual_tables`` norm algebra and the ``__qcdot`` plumbing
    (residual PQ is NOT lossless, so exact-cosine-vs-raw is the wrong
    oracle; cosine-vs-reconstruction is exact by construction)."""
    cb = pq_codebooks_random(DIM, M, K, salt="resid-test")
    got = ivf_pq_topk(
        queries, corpus, cb,
        k=10, nlist=4, nprobe=4, centroids=CENTROIDS, residual=True,
    ).collect()
    # independent reconstruction: encode in-plan (the operator under
    # test for scoring is the ADC, not the encoder), decode in Python
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in CENTROIDS]
    )
    coded = pq_encode(
        _cells(corpus), cb,
        center=F.element_at(cent_lit, F.col("cell") + 1),
    ).select("vec_id", "cell", "pq_codes").collect()
    ds = DIM // M
    recon = {}
    for r in coded:
        cell, codes = r["cell"], r["pq_codes"]
        vec = list(CENTROIDS[cell])
        for mi, ki in enumerate(codes):
            for d, x in enumerate(cb[mi][ki]):
                vec[mi * ds + d] += x
        recon[r["vec_id"]] = vec
    qvecs = {r["q_id"]: r["q_vec"] for r in queries.collect()}
    for row in got:
        q, rv = qvecs[row["q_id"]], recon[row["vec_id"]]
        num = sum(a * b for a, b in zip(q, rv))
        den = math.sqrt(sum(a * a for a in q)) * math.sqrt(
            sum(b * b for b in rv)
        )
        assert row["adc_sim"] == pytest.approx(num / den, abs=2e-6), row


def test_stream_residual_probe_equals_batch(spark, corpus, queries, tmp_path):
    from cars_bids_data_pipeline_v0__spark.streaming.ann_index import (
        ivf_pq_index_probe,
        ivf_pq_index_sink,
    )

    cb = pq_codebooks_random(DIM, M, K, salt="resid-test")
    index = str(tmp_path / "pq_res_index")
    sink = ivf_pq_index_sink(
        index, CENTROIDS, cb, stream_id="t", residual=True
    )
    sink(corpus.filter(F.col("vec_id") % 2 == 0), 0)
    sink(corpus.filter(F.col("vec_id") % 2 == 1), 1)
    got = ivf_pq_index_probe(
        spark, index, queries, CENTROIDS, cb,
        k=10, nprobe=2, residual=True,
    )
    want = ivf_pq_topk(
        queries, corpus, cb,
        k=10, nlist=4, nprobe=2, centroids=CENTROIDS, residual=True,
    )
    g = sorted(
        (r["q_id"], r["vec_id"], r["adc_sim"], r["rank"])
        for r in got.collect()
    )
    w = sorted(
        (r["q_id"], r["vec_id"], r["adc_sim"], r["rank"])
        for r in want.collect()
    )
    assert g == w

    # replay fencing: re-delivering batch 1 must change nothing
    sink(corpus.filter(F.col("vec_id") % 2 == 1), 1)
    again = ivf_pq_index_probe(
        spark, index, queries, CENTROIDS, cb,
        k=10, nprobe=2, residual=True,
    )
    assert sorted(
        (r["q_id"], r["vec_id"], r["adc_sim"], r["rank"])
        for r in again.collect()
    ) == g
