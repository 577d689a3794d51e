"""Independent-implementation cross-check: pyspark.ml MinHashLSH.

The dedup family's primary oracles are DuckDB SQL twins; this adds a
THIRD, fully independent implementation — Spark MLlib's
CountVectorizer + MinHashLSH.approxSimilarityJoin — and pins that our
expression-based inverted-index Jaccard (q53's operator) produces the
same near-dup pair set with the same exact scores.  MLlib computes the
distance column as the TRUE Jaccard distance of the binary shingle
vectors, so score agreement is exact, not approximate; the candidate
recall is seeded and deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators import dedup_docs as DD

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.25


def test_jaccard_pairs_match_mllib_minhash_lsh(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    d = spark.read.parquet(f"{SF}/documents.parquet")

    ours = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(
            d, n=3, threshold=THRESHOLD
        ).collect()
    }
    assert ours, "fixture corpus lost its planted near-dups"

    # MLlib pipeline over the SAME shingle sets
    sh = d.select("doc_id", DD.word_shingles("text", 3).alias("sh"))
    vecs = (
        CountVectorizer(inputCol="sh", outputCol="vec", binary=True)
        .fit(sh)
        .transform(sh)
        .select("doc_id", "vec")
    )
    model = MinHashLSH(
        inputCol="vec", outputCol="hashes", numHashTables=8, seed=42
    ).fit(vecs)
    theirs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in model.approxSimilarityJoin(
            vecs, vecs, 1.0 - THRESHOLD, distCol="jd"
        )
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
            F.round(1 - F.col("jd"), 6).alias("jaccard"),
        )
        .collect()
    }

    # same pair set, same exact scores (MLlib's distCol is true Jaccard)
    assert theirs == ours
