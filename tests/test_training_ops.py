"""Training-data pipeline operators added in round 2: document chunking,
mixture sampling, incremental materialized views."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.chunking import chunk_documents
from cars_bids_data_pipeline_v0__spark.operators.matview import (
    matview_finalize,
    matview_merge,
    matview_partials,
)
from cars_bids_data_pipeline_v0__spark.operators.sampling import mixture_sample


def test_chunking_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, "x"),
         (4, ""), (5, " \t\n ")],  # empty / whitespace-only -> no chunks
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_size=32, overlap=8)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_start"], r["chunk_tokens"])
        for r in chunks.collect()
    )
    # doc 1: starts stop at n-overlap=92, so 1, 25, 49, 73 — the would-be
    # chunk@97 is a pure suffix of chunk@73 and must NOT be emitted
    assert [(s, n) for d, i, s, n in rows if d == 1] == [
        (1, 32), (25, 32), (49, 32), (73, 28)
    ]
    # short docs yield exactly one chunk of their full length
    assert [(s, n) for d, i, s, n in rows if d == 2] == [(1, 2)]
    assert [(s, n) for d, i, s, n in rows if d == 3] == [(1, 1)]
    assert not [r for r in rows if r[0] in (4, 5)]
    # every token appears: union of chunk texts covers the whole doc
    c1 = {r["chunk_idx"]: r["chunk_text"].split(" ")
          for r in chunks.filter("doc_id = 1").collect()}
    assert c1[0][-8:] == c1[1][:8]  # consecutive chunks share the overlap
    covered = set()
    for toks in c1.values():
        covered.update(toks)
    assert covered == {f"t{i}" for i in range(100)}


def test_mixture_sample_proportions_and_determinism(spark):
    rows = [(i, f"s{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"s0": 0.6, "s1": 0.3, "s2": 0.1}  # s3 dropped
    out = mixture_sample(df, weights)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"s0", "s1", "s2"}
    assert counts["s0"] == 1000  # binding source keeps 100%
    # mixture ratios within hash-sampling tolerance
    assert abs(counts["s1"] / counts["s0"] - 0.5) < 0.1
    assert abs(counts["s2"] / counts["s0"] - 1 / 6) < 0.07
    again = {r["doc_id"] for r in mixture_sample(df, weights).collect()}
    assert again == {r["doc_id"] for r in out.collect()}


def test_matview_merge_matches_full_recompute(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i % 17)) for i in range(3000)],
        "id long, g string, x double",
    )
    keys, measures = ["g"], {"x": ("sum", "min", "max", "avg")}
    view = None
    for b in range(4):  # four out-of-order delta batches
        delta = df.filter(F.col("id") % 4 == (3 - b))
        part = matview_partials(delta, keys, measures)
        view = part if view is None else matview_merge(view, part)
    got = {
        r["g"]: (r["n_rows"], r["sum_x"], r["min_x"], r["max_x"], r["avg_x"])
        for r in matview_finalize(view, avg_of=["x"]).collect()
    }
    want = {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"], r["m"])
        for r in df.groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("s"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
            F.avg("x").alias("m"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for g in got:
        gn, gs, glo, ghi, gm = got[g]
        wn, ws, wlo, whi, wm = want[g]
        assert (gn, glo, ghi) == (wn, wlo, whi)
        assert gs == pytest.approx(ws, rel=1e-12)
        assert gm == pytest.approx(wm, rel=1e-12)


def test_matview_rejects_non_mergeable(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, g string, x double")
    with pytest.raises(ValueError):
        matview_partials(df, ["g"], {"x": ("median",)})


def test_pack_chunks_budget_invariants(spark):
    from cars_bids_data_pipeline_v0__spark.operators.chunking import (
        chunk_documents,
    )
    from cars_bids_data_pipeline_v0__spark.operators.packing import (
        pack_chunks,
        pack_manifest,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(20 + i % 50))) for i in range(200)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_size=16, overlap=4)
    packed = pack_chunks(chunks, budget=64, num_shards=4)
    # every chunk assigned exactly once
    assert packed.count() == chunks.count()
    man = pack_manifest(packed).collect()
    # max chunk is 16 tokens: every non-final pack is within one chunk of
    # the 64-token budget (short by a predecessor's overflow, over by at
    # most one chunk); no pack ever exceeds budget + chunk
    by_shard = {}
    for r in man:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["pack_id"])
        # pack ids are dense 0..n-1 (no bucket ever skipped)
        assert [r["pack_id"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert 64 - 15 <= r["n_tokens"] < 64 + 16, (shard, dict(r.asDict()))
        assert rows[-1]["n_tokens"] < 64 + 16
    # deterministic across recomputation
    again = {(r["shard"], r["pack_id"], r["n_chunks"], r["n_tokens"])
             for r in pack_manifest(
                 pack_chunks(chunks, budget=64, num_shards=4)).collect()}
    assert again == {(r["shard"], r["pack_id"], r["n_chunks"], r["n_tokens"])
                     for r in man}


def test_matview_avg_correct_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "g", 10.0), (2, "g", None), (3, "g", 20.0), (4, "h", None)],
        "id long, g string, x double",
    )
    part = matview_partials(df, ["g"], {"x": ("avg",)})
    out = {r["g"]: (r["n_rows"], r["avg_x"])
           for r in matview_finalize(part, avg_of=["x"]).collect()}
    assert out["g"] == (3, 15.0)  # NULL excluded from avg, counted in rows
    assert out["h"] == (1, None)  # all-NULL group -> NULL avg, like F.avg


def test_matview_rejects_colliding_key_names(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "n_rows long, g string, x double")
    with pytest.raises(ValueError):
        matview_partials(df, ["n_rows"], {"x": ("sum",)})
    df2 = spark.createDataFrame([(1, "a", 1.0)], "sum_region long, g string, x double")
    with pytest.raises(ValueError):
        matview_partials(df2, ["sum_region"], {"x": ("sum",)})


def test_bm25_ranks_relevant_docs_first(spark):
    from cars_bids_data_pipeline_v0__spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),      # heavy on the query term
            (2, "spark appears once here today"),
            (3, "completely unrelated words only"),
            (4, "common common common common"),    # term in every other doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert set(out) == {1, 2}              # only matching docs scored
    assert out[1] > out[2] > 0             # higher tf -> higher score
    # repeated-everywhere terms score low idf but still positive (Lucene ln(1+x))
    out2 = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["common"]).collect()}
    assert set(out2) == {4} and out2[4] > 0


def test_systematic_weighted_sample_properties(spark):
    from cars_bids_data_pipeline_v0__spark.operators.sampling import (
        systematic_weighted_sample,
    )

    # 1000 light rows (w=1) + 10 heavy rows (w=500): heavy rows dominate
    rows = [(i, 1) for i in range(1000)] + [(1000 + i, 500) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = systematic_weighted_sample(df, "w", target=100, id_col="doc_id")
    got = {r["doc_id"] for r in out.collect()}
    # total weight 6000, step 60: every heavy row (w=500 >= step) selected
    assert {1000 + i for i in range(10)} <= got
    # exact replication of the grid math in pure Python
    step = 6000 // 100
    cum, expect = 0, set()
    for doc_id, w in sorted(rows):
        prev = cum
        cum += w
        if cum // step > prev // step:
            expect.add(doc_id)
    assert got == expect
    # deterministic
    again = {r["doc_id"]
             for r in systematic_weighted_sample(
                 df, "w", target=100, id_col="doc_id").collect()}
    assert again == got
    # sharded path: no global window, same row-hit semantics per shard —
    # count lands near the unsharded count (heavy rows absorb multiple
    # grid points, so both are well under the raw target)
    sharded = systematic_weighted_sample(
        df, "w", target=100, id_col="doc_id", num_shards=4
    )
    hit = {r["doc_id"] for r in sharded.collect()}
    assert len(got) / 2 <= len(hit) <= len(got) * 2
    assert {1000 + i for i in range(10)} <= hit  # heavies survive sharding
    assert "doc_id" in sharded.columns and "w" in sharded.columns


def test_drift_detects_shifted_distribution(spark):
    from cars_bids_data_pipeline_v0__spark.operators.drift import (
        categorical_distribution,
        js_divergence,
    )

    rows = (
        [("ref", "a")] * 50 + [("ref", "b")] * 30 + [("ref", "c")] * 20
        + [("same", "a")] * 50 + [("same", "b")] * 30 + [("same", "c")] * 20
        + [("shifted", "a")] * 5 + [("shifted", "b")] * 5
        + [("shifted", "z")] * 90   # mostly a category ref never saw
    )
    df = spark.createDataFrame(rows, "source string, category string")
    dist = categorical_distribution(df, "source", "category")
    out = {r["source"]: r["jsd"]
           for r in js_divergence(dist, "ref", "source", "category").collect()}
    assert out["same"] == 0.0                 # identical distribution
    assert 0.3 < out["shifted"] <= 0.693148   # large but bounded by ln 2
    assert set(out) == {"same", "shifted"}    # reference itself excluded


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.operators.chunking import (
        chunk_documents,
    )
    from cars_bids_data_pipeline_v0__spark.operators.packing import pack_chunks
    from cars_bids_data_pipeline_v0__spark.sources.sinks import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(30))) for i in range(100)],
        "doc_id long, text string",
    )
    packed = pack_chunks(
        chunk_documents(docs, chunk_size=16, overlap=4), budget=64,
        num_shards=3,
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(packed, out, rows_per_file=50)
    man = {r["shard"]: (r["n_files"], r["n_rows"], r["n_packs"])
           for r in manifest.collect()}
    assert set(man) == {0, 1, 2}
    assert sum(m[1] for m in man.values()) == packed.count()
    # maxRecordsPerFile respected -> multiple files where rows > 50
    for shard, (n_files, n_rows, _) in man.items():
        assert n_files >= (n_rows + 49) // 50
    # written data round-trips with the shard partition column
    back = spark.read.parquet(out)
    assert back.count() == packed.count()
    assert "shard" in back.columns and "pack_id" in back.columns


def test_drift_raises_on_missing_reference(spark):
    from cars_bids_data_pipeline_v0__spark.operators.drift import (
        categorical_distribution,
        js_divergence,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "source string, category string"
    )
    dist = categorical_distribution(df, "source", "category")
    with pytest.raises(ValueError, match="matches no rows"):
        js_divergence(dist, "typo_source", "source", "category")


# ---------------------------------------------------------------------------
# matview_apply_changes: CDF-driven incremental view maintenance (round 7)
# ---------------------------------------------------------------------------


def _chg(spark, rows):
    """(key, x, change_type) rows shaped like a tx_changes batch."""
    return spark.createDataFrame(
        [(k, x, c) for k, x, c in rows],
        "k string, x double, _change_type string",
    )


def test_matview_apply_changes_signed_fold_matches_recompute(spark):
    from cars_bids_data_pipeline_v0__spark.operators.matview import (
        matview_apply_changes,
        matview_finalize,
        matview_partials,
    )

    measures = {"x": ("sum", "cnt", "avg")}
    base_rows = [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", None)]
    base = spark.createDataFrame(base_rows, "k string, x double")
    view = matview_partials(base, ["k"], measures)

    # delta: insert (a,4), delete (a,1), delete (b,NULL)
    delta = _chg(
        spark,
        [("a", 4.0, "insert"), ("a", 1.0, "delete"), ("b", None, "delete")],
    )
    got = matview_finalize(
        matview_apply_changes(view, delta, ["k"], measures), avg_of=["x"]
    )
    rows = {r["k"]: r for r in got.collect()}
    # a: {2,4} — n=2 sum=6 avg=3 ; b: {5} — n=1 sum=5 avg=5
    assert rows["a"]["n_rows"] == 2 and rows["a"]["sum_x"] == 6.0
    assert rows["a"]["avg_x"] == 3.0
    assert rows["b"]["n_rows"] == 1 and rows["b"]["avg_x"] == 5.0


def test_matview_apply_changes_minmax_repair_touched_groups_only(spark):
    from cars_bids_data_pipeline_v0__spark.operators.matview import (
        matview_apply_changes,
        matview_partials,
    )

    measures = {"x": ("min", "max", "sum", "cnt")}
    before = spark.createDataFrame(
        [("a", 1.0), ("a", 9.0), ("b", 3.0), ("b", 7.0)],
        "k string, x double",
    )
    view = matview_partials(before, ["k"], measures)
    # delete a's current max AND min boundary-mates; b untouched
    delta = _chg(spark, [("a", 9.0, "delete"), ("a", 0.5, "insert")])
    after = spark.createDataFrame(  # the post-change snapshot (base=)
        [("a", 1.0), ("a", 0.5), ("b", 3.0), ("b", 7.0)],
        "k string, x double",
    )
    got = {
        r["k"]: r
        for r in matview_apply_changes(
            view, delta, ["k"], measures, base=after
        ).collect()
    }
    assert (got["a"]["min_x"], got["a"]["max_x"]) == (0.5, 1.0)
    assert (got["b"]["min_x"], got["b"]["max_x"]) == (3.0, 7.0)
    assert got["a"]["n_rows"] == 2 and got["a"]["sum_x"] == 1.5

    # min/max under deletes without base= is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="base="):
        matview_apply_changes(view, delta, ["k"], measures)
    # ...but an insert-only delta needs no base even with min/max
    ins_only = _chg(spark, [("b", 11.0, "insert")])
    got2 = {
        r["k"]: r
        for r in matview_apply_changes(
            view, ins_only, ["k"], measures
        ).collect()
    }
    assert got2["b"]["max_x"] == 11.0 and got2["b"]["n_rows"] == 3


def test_matview_apply_changes_drops_emptied_groups(spark):
    from cars_bids_data_pipeline_v0__spark.operators.matview import (
        matview_apply_changes,
        matview_partials,
    )

    measures = {"x": ("sum", "cnt")}
    view = matview_partials(
        spark.createDataFrame([("a", 2.0), ("b", 3.0)], "k string, x double"),
        ["k"],
        measures,
    )
    delta = _chg(spark, [("a", 2.0, "delete")])
    got = matview_apply_changes(view, delta, ["k"], measures)
    assert [r["k"] for r in got.collect()] == ["b"]
