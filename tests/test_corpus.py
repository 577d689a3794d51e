"""Corpus-preprocessing semantics: connected components must merge
transitive near-dup chains; the pipeline must keep exactly one
representative per cluster and drop gated junk."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.graph import (
    connected_components,
    dedup_by_components,
)
from cars_bids_data_pipeline_v0__spark.plans.corpus import (
    preprocess_corpus,
    quality_gate,
)


def test_connected_components_merges_chains(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
    )
    cc = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_connected_components_long_chain_converges(spark):
    # a 12-hop chain exercises multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    cc = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(cc.values()) == {0}
    assert len(cc) == 13


def test_dedup_by_components_keeps_min_and_untouched(spark):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 7, 8, 9]], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"] for r in dedup_by_components(df, pairs).collect()
    )
    assert kept == [1, 7, 9]  # 9 has no edges → untouched


def _corpus(spark):
    good = "the quick brown fox jumps over the lazy dog again and again"
    near = good + " tail"          # high-Jaccard neighbor of `good`
    rows = [
        (1, good),
        (2, good),                  # exact dup of 1
        (3, near),                  # near dup of 1 (transitive cluster)
        (4, "12345 67890 !!! ### $$$ %%%"),           # fails alpha ratio
        (5, "too short"),                              # fails token count
        (6, "completely different well formed text about spark engines"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_quality_gate_drops_junk(spark):
    kept = sorted(r["doc_id"] for r in quality_gate(_corpus(spark)).collect())
    assert kept == [1, 2, 3, 6]


def test_preprocess_corpus_end_to_end(spark):
    out = preprocess_corpus(
        _corpus(spark), near_dup_threshold=0.5, num_hashes=32, bands=16
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 2 exact-duped into 1; 3 near-duped into 1's cluster; 4,5 gated out
    assert kept == [1, 6]


def test_connected_components_star_path_graph_olog_rounds(spark):
    """Kiveris large-star/small-star: a 10k-vertex PATH (diameter 9999 —
    min-label propagation would need ~10k rounds) must converge within 30
    alternating rounds (O(log n)-ish) with every vertex labeled 0."""
    from cars_bids_data_pipeline_v0__spark.operators.graph import (
        connected_components_star,
    )

    n = 10_000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    cc = connected_components_star(pairs, max_iter=30)  # raises if not converged
    assert cc.count() == n
    assert cc.filter(F.col("component") != 0).count() == 0


def test_connected_components_star_matches_label_propagation(spark):
    from cars_bids_data_pipeline_v0__spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    # several components incl. a star, a triangle-with-tail, and isolates-by-pair
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11), (11, 12),
             (20, 21), (30, 31), (31, 32), (32, 33), (33, 34)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {r["id"]: r["component"]
            for r in connected_components_star(pairs).collect()}
    prop = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert star == prop


def test_containment_catches_subdocument_dup(spark):
    """A doc pasted inside a much larger one: Jaccard small, containment
    of the small doc ≈ 1.0 — only the directed metric flags it."""
    from cars_bids_data_pipeline_v0__spark.operators.dedup_docs import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i} tok{i*7%13}" for i in range(60))
    big = filler + " " + small + " " + filler[::-1].replace("w", "v")
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated text with other tokens here")],
        "doc_id long, text string",
    )
    cont = {(r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(docs, n=3, threshold=0.9).collect()}
    assert (1, 2) in cont and cont[(1, 2)] >= 0.9   # small ⊂ big
    assert (2, 1) not in cont                        # big ⊄ small
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert not any(r["id_a"] == 1 and r["id_b"] == 2 for r in jac)


def test_boilerplate_ngram_stats_flags_shared_template(spark):
    from cars_bids_data_pipeline_v0__spark.operators.dedup_docs import (
        boilerplate_ngram_stats,
    )

    template = "click here to subscribe now"
    rows = [
        (i, f"{template} unique{i} body{i} content{i} text{i}", "siteA")
        for i in range(8)
    ] + [(100, "independent doc on siteB with no template", "siteB")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in
           boilerplate_ngram_stats(docs, n=3, doc_frac=0.5).collect()}
    # the template's 3-grams appear in 8/8 siteA docs → boilerplate
    assert all(out[i]["n_boiler"] >= 3 for i in range(8))
    assert all(out[i]["boiler_ratio"] > 0.3 for i in range(8))
    assert out[100]["n_boiler"] == 0 and out[100]["boiler_ratio"] == 0.0
