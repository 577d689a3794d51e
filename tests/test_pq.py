"""Product quantization (operators/pq.py): encoding, ADC search, training."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.pq import (
    pq_codebooks_random,
    pq_decode,
    pq_encode,
    pq_topk_adc,
    pq_train,
)
from cars_bids_data_pipeline_v0__spark.operators.similarity import (
    as_double,
    cosine_topk,
    dot,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"
D, M, K = 64, 8, 16


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(EMB).persist()
    df.count()
    yield df
    df.unpersist()


def test_pq_encode_shape_and_determinism(spark, emb):
    cbs = pq_codebooks_random(D, M, K)
    codes = pq_encode(emb, cbs).select("vec_id", "pq_codes")
    r = codes.select(
        F.min(F.size("pq_codes")).alias("lo_n"),
        F.max(F.size("pq_codes")).alias("hi_n"),
        F.min(F.array_min("pq_codes")).alias("lo"),
        F.max(F.array_max("pq_codes")).alias("hi"),
    ).first()
    assert r["lo_n"] == r["hi_n"] == M
    assert 0 <= r["lo"] and r["hi"] <= K - 1
    a = {t["vec_id"]: list(t["pq_codes"]) for t in codes.collect()}
    b = {t["vec_id"]: list(t["pq_codes"])
         for t in pq_encode(emb, cbs).select("vec_id", "pq_codes").collect()}
    assert a == b


def test_pq_train_reduces_reconstruction_error(spark, emb):
    random_cbs = pq_codebooks_random(D, M, K)
    trained_cbs = pq_train(emb, D, m=M, k=K, iters=2)
    assert trained_cbs != random_cbs

    def mean_err(cbs):
        codes = pq_encode(emb, cbs)
        diff = F.zip_with(
            as_double("embedding"),
            pq_decode(F.col("pq_codes"), cbs),
            lambda a, b: a - b,
        )
        return codes.select(
            F.avg(F.sqrt(dot(diff, diff))).alias("e")
        ).first()["e"]

    assert mean_err(trained_cbs) < mean_err(random_cbs)
    # training is deterministic (no RNG state anywhere)
    assert pq_train(emb, D, m=M, k=K, iters=2) == trained_cbs


def test_pq_adc_topk_recall_and_self_match(spark, emb):
    cbs = pq_train(emb, D, m=M, k=K, iters=2)
    codes = pq_encode(emb, cbs).select("vec_id", "pq_codes")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    approx = pq_topk_adc(q, codes, cbs, k=10)
    exact = cosine_topk(q, emb, k=10)
    a = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    b = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    assert len(a & b) / len(a) >= 0.2  # lossy, but far above random (10/n)
    # ranks are 1..10 per query, no duplicate (q, c) pairs
    per_q = {}
    for r in approx.collect():
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_ivf_pq_exact_when_probing_all_cells(spark, emb):
    from cars_bids_data_pipeline_v0__spark.operators.pq import ivf_pq_topk

    cbs = pq_codebooks_random(D, M, K)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    full = pq_topk_adc(
        q, pq_encode(emb, cbs).select("vec_id", "pq_codes"), cbs, k=5
    )
    ivf_all = ivf_pq_topk(q, emb, cbs, k=5, nlist=8, nprobe=8)
    a = {(r["q_id"], r["vec_id"], r["adc_sim"], r["rank"])
         for r in full.collect()}
    b = {(r["q_id"], r["vec_id"], r["adc_sim"], r["rank"])
         for r in ivf_all.collect()}
    assert a == b  # nprobe == nlist degenerates to plain ADC

    # pruned probing returns valid dense ranks and a subset of the cells
    pruned = ivf_pq_topk(q, emb, cbs, k=5, nlist=8, nprobe=2)
    per_q = {}
    for r in pruned.collect():
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
