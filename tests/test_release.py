"""The release capstone (VERDICT r8 directive 6): streaming ingest →
incremental quantile-normalized deduplicated release → training shards.

Chain under test: JSON batches → `corpus_ingest_stream` (epoch-fenced
exactly-once ACID ingest) → `release_corpus` (q59 gate → dedup_incoming
vs the released table → q191 Q-Q decile gate → chunk → pack →
`write_training_shards`), with the loader manifest and the incremental
re-release semantics asserted."""

from __future__ import annotations

import json
import os
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cars_bids_data_pipeline_v0__spark.operators.chunking import (
    chunk_documents,
)
from cars_bids_data_pipeline_v0__spark.plans.release import (
    quantile_release_gate,
    release_corpus,
)
from cars_bids_data_pipeline_v0__spark.sources.txlog import tx_read
from cars_bids_data_pipeline_v0__spark.streaming.incremental import (
    corpus_ingest_stream,
)

_WORDS = (
    "the quick brown fox jumps over a lazy dog while many other "
    "animals watch from the tall green grass near the old stone wall"
).split()


def _text(seed: int, n_tokens: int) -> str:
    # every 3rd token is doc-unique so every 3-gram shingle contains one
    # — distinct docs share ZERO shingles (no accidental near-dups from
    # the tiny cycling vocabulary), while same-(seed, length) docs stay
    # byte-identical (the intentional exact-dup pairs)
    return " ".join(
        f"w{seed}x{i}" if i % 3 == 0
        else _WORDS[(seed * 7 + i * 3) % len(_WORDS)]
        for i in range(n_tokens)
    )


def _docs_batch_1():
    # source "web": lengths 8..30 tokens (12 docs); source "books":
    # lengths 40..62 (12 docs) — disjoint length regimes so the Q-Q
    # gate's per-source cut differs from any global cut
    docs = []
    for i in range(12):
        docs.append(
            {"doc_id": 100 + i, "text": _text(i, 8 + 2 * i),
             "source": "web"}
        )
        docs.append(
            {"doc_id": 200 + i, "text": _text(20 + i, 40 + 2 * i),
             "source": "books"}
        )
    # quality-gate bait: too short, and an exact dup of doc 105
    docs.append({"doc_id": 900, "text": "tiny", "source": "web"})
    docs.append(
        {"doc_id": 901, "text": _text(5, 18), "source": "web"}
    )  # exact dup of doc_id 105 (same seed/length)
    return docs


def _write_batch(docs_dir: str, name: str, docs) -> None:
    os.makedirs(docs_dir, exist_ok=True)
    tmp = os.path.join(docs_dir, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")
    os.rename(tmp, os.path.join(docs_dir, name))


_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def test_quantile_release_gate_drops_bottom_decile_per_source(spark):
    rows = [(i, "web", 10 + i) for i in range(20)] + [
        (100 + i, "books", 1000 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    kept = quantile_release_gate(df, "n_chars", "source")
    got = {r["doc_id"] for r in kept.collect()}
    # each source loses exactly its own below-p10 rows — the short
    # "web" docs are NOT gutted by the long "books" distribution
    assert {i for i in range(2, 20)} <= got
    assert {100 + i for i in range(2, 20)} <= got
    assert 0 not in got and 100 not in got
    # the normalized score is the GLOBAL cut at the within-source
    # decile: the web p50-ish row and the books p50-ish row normalize
    # to the SAME value
    norm = {
        r["doc_id"]: r["score_norm"] for r in kept.collect()
    }
    assert norm[10] == norm[110]


def test_stream_ingest_then_release_capstone(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    ingest = str(tmp_path / "ingest_tbl")
    ckpt = str(tmp_path / "ckpt")
    release_tbl = str(tmp_path / "release_tbl")
    shards = str(tmp_path / "shards")

    # --- streaming ingest: two micro-batches through the ACID table ---
    _write_batch(docs_dir, "b1.json", _docs_batch_1())
    q = corpus_ingest_stream(
        spark, docs_dir, ingest, ckpt, schema=_SCHEMA, min_tokens=5
    )
    q.awaitTermination(120)
    batch2 = [
        {"doc_id": 300 + i, "text": _text(50 + i, 30 + 3 * i),
         "source": "web"}
        for i in range(6)
    ] + [
        {"doc_id": 902, "text": _text(3, 14), "source": "web"}
    ]  # exact re-delivery of doc 103's content: must not land twice
    _write_batch(docs_dir, "b2.json", batch2)
    q2 = corpus_ingest_stream(
        spark, docs_dir, ingest, ckpt, schema=_SCHEMA, min_tokens=5
    )
    q2.awaitTermination(120)

    corpus = tx_read(spark, ingest)
    ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert 900 not in ids  # quality gate
    assert 901 not in ids and 902 not in ids  # exact dups never landed
    assert {100, 111, 200, 211, 300, 305} <= ids

    # --- release run 1: full chain to training shards -----------------
    manifest = release_corpus(
        spark,
        corpus,
        release_tbl,
        shards,
        chunk_size=16,
        overlap=4,
        budget=32,
        num_shards=4,
    )
    rows = manifest.collect()
    assert rows, "first release must write shards"
    released = tx_read(spark, release_tbl)
    rel_ids = {r["doc_id"] for r in released.select("doc_id").collect()}
    # Q-Q gate drops each source's bottom decile, nothing else missing
    assert rel_ids <= ids and len(rel_ids) >= len(ids) - 6
    assert "score_norm" in released.columns
    # the manifest counts the exact chunk rows the released docs produce
    expect_chunks = chunk_documents(
        released, chunk_size=16, overlap=4
    ).count()
    assert sum(r["n_rows"] for r in rows) == expect_chunks
    assert os.path.isdir(os.path.join(shards, "release=0"))
    # every shard's packs respect the budget's pack-count lower bound
    assert all(r["n_packs"] >= 1 and r["n_files"] >= 1 for r in rows)

    # --- release run 2: all-dup re-release is a no-op ------------------
    again = release_corpus(
        spark, corpus, release_tbl, shards,
        chunk_size=16, overlap=4, budget=32, num_shards=4,
    )
    assert again.collect() == []
    assert not os.path.isdir(os.path.join(shards, "release=1"))
    assert tx_read(spark, release_tbl).count() == len(rel_ids)

    # --- release run 3: one genuinely new doc → one-doc increment ------
    new_doc = spark.createDataFrame(
        [(400, _text(80, 45), "books")], "doc_id long, text string, source string"
    )
    inc = release_corpus(
        spark,
        corpus.unionByName(new_doc),
        release_tbl,
        shards,
        chunk_size=16,
        overlap=4,
        budget=32,
        num_shards=4,
    )
    inc_rows = inc.collect()
    inc_chunks = chunk_documents(
        new_doc, chunk_size=16, overlap=4
    ).count()
    assert sum(r["n_rows"] for r in inc_rows) == inc_chunks
    assert 400 in {
        r["doc_id"]
        for r in tx_read(spark, release_tbl).select("doc_id").collect()
    }
    # increments are versioned dirs: the first artifact is untouched
    assert os.path.isdir(os.path.join(shards, "release=0"))
    assert len(
        [d for d in os.listdir(shards) if d.startswith("release=")]
    ) == 2


def test_release_stream_exactly_once_and_checkpoint_loss(spark, tmp_path):
    """Continuous curation: each micro-batch is one fenced release
    increment; a lost checkpoint's re-delivery releases nothing new
    (content dedup), and increments land in versioned shard dirs."""
    import shutil

    from cars_bids_data_pipeline_v0__spark.plans.release import (
        release_stream,
    )

    docs_dir = str(tmp_path / "cands")
    release_tbl = str(tmp_path / "rel_tbl")
    shards = str(tmp_path / "rel_shards")
    ckpt = str(tmp_path / "rel_ckpt")

    kw = dict(chunk_size=16, overlap=4, budget=32, num_shards=4)
    _write_batch(docs_dir, "c1.json", _docs_batch_1())
    q = release_stream(spark, docs_dir, release_tbl, shards, ckpt, **kw)
    q.awaitTermination(120)
    rel1 = {
        r["doc_id"]
        for r in tx_read(spark, release_tbl).select("doc_id").collect()
    }
    assert rel1 and 900 not in rel1 and 901 not in rel1
    assert os.path.isdir(os.path.join(shards, "release=0"))

    # batch 2: re-deliveries of RELEASED batch-1 docs (mid-distribution,
    # so the Q-Q gate released them) plus two genuinely new docs.
    # Batch-1 docs the gate CUT are deliberately not re-sent: the
    # quantile gate is batch-relative, so a cut doc re-arriving in a
    # different population may legitimately clear the new cut.
    redeliver = [5, 6, 7]
    batch2 = [
        {"doc_id": 500 + i, "text": _text(90 + i, 25 + i), "source": "web"}
        for i in range(2)
    ] + [
        {"doc_id": 100 + i, "text": _text(i, 8 + 2 * i), "source": "web"}
        for i in redeliver
    ] + [
        {"doc_id": 200 + i, "text": _text(20 + i, 40 + 2 * i),
         "source": "books"}
        for i in redeliver
    ]
    for d in batch2[2:]:
        assert d["doc_id"] in rel1, "test precondition: re-send released docs"

    _write_batch(docs_dir, "c2.json", batch2)
    q2 = release_stream(spark, docs_dir, release_tbl, shards, ckpt, **kw)
    q2.awaitTermination(120)
    rel2 = {
        r["doc_id"]
        for r in tx_read(spark, release_tbl).select("doc_id").collect()
    }
    assert {500, 501} <= rel2
    # the re-delivered batch-1 docs did not release twice
    assert len(rel2) == len(rel1) + 2
    dirs_before = sorted(
        d for d in os.listdir(shards) if d.startswith("release=")
    )

    # checkpoint loss: every file re-delivers under a fresh epoch —
    # content dedup must drop everything, nothing new lands anywhere
    shutil.rmtree(ckpt)
    q3 = release_stream(spark, docs_dir, release_tbl, shards, ckpt, **kw)
    q3.awaitTermination(120)
    rel3 = {
        r["doc_id"]
        for r in tx_read(spark, release_tbl).select("doc_id").collect()
    }
    assert rel3 == rel2
    assert sorted(
        d for d in os.listdir(shards) if d.startswith("release=")
    ) == dirs_before


def test_release_model_gate_cuts_boilerplate(spark, tmp_path):
    """model_gate=True (round-10b): the pretrained linear classifier
    runs after the rule gates and before dedup — boilerplate docs (one
    token repeated: top_frac=1, ttr→0) never reach the release table,
    diverse stopword-bearing docs do, and a crash-style re-run gates
    identically (the increment replay stays a no-op)."""
    release_tbl = str(tmp_path / "rel_mg")
    shards = str(tmp_path / "shards_mg")
    good = [
        (i, _text(i, 24 + i % 7), "web") for i in range(10)
    ]  # diverse vocab + 'the'/'a' stopwords → positive score
    spam = [
        (100 + i, " ".join(["spam"] * 30), "web") for i in range(3)
    ]  # exact dups of each other AND deep-negative score
    junk = [
        (200, " ".join(f"u{j}" for j in range(12)) + " " +
         " ".join(["zz"] * 20), "web"),
    ]  # no stopwords, heavy top-token dominance → cut by the model
    corpus = spark.createDataFrame(
        good + spam + junk, "doc_id long, text string, source string"
    )
    # custom weights: shift the decision boundary for THIS corpus's
    # feature ranges (the default intercept is tuned for the synthetic
    # testdata corpus) — also exercises the model_weights override
    mw = {"intercept": -6.3}
    manifest = release_corpus(
        spark, corpus, release_tbl, shards,
        model_gate=True, model_weights=mw,
        chunk_size=16, overlap=4, budget=32, num_shards=2,
    )
    assert manifest.collect(), "model-gated release still writes shards"
    released = tx_read(spark, release_tbl)
    rel_ids = {r["doc_id"] for r in released.select("doc_id").collect()}
    assert not rel_ids & {100, 101, 102, 200}, rel_ids
    assert len(rel_ids & set(range(10))) >= 8  # Q-Q gate may trim p10
    # helper columns never leak into the release table
    assert "quality_score" not in released.columns
    assert "quality_kept" not in released.columns
    # replay: the same candidates release nothing new
    again = release_corpus(
        spark, corpus, release_tbl, shards,
        model_gate=True, model_weights=mw,
        chunk_size=16, overlap=4, budget=32, num_shards=2,
    )
    assert again.collect() == []


def test_release_full_stack_stage_order_and_interaction(
    spark, tmp_path, monkeypatch
):
    """The FULL production shape in one run (round-10 VERDICT directive
    3): model gate + DSIR selection + incremental dedup + Q-Q gate all
    on.  Pins (a) the stage ORDER — rule gate → model gate → exact
    dedup → incremental dedup → Q-Q gate → DSIR — by tracing the actual
    call sequence, and (b) the stage INTERACTIONS: DSIR's bag models
    see the model-gated slice (release.py's documented design), dedup
    runs against the previously-released table, and the DSIR budget
    bounds this increment's released tokens."""
    import cars_bids_data_pipeline_v0__spark.operators.dsir as dsir_mod
    import cars_bids_data_pipeline_v0__spark.operators.quality_model as qm_mod
    import cars_bids_data_pipeline_v0__spark.plans.release as rel_mod

    calls: list[str] = []

    def trace(mod, name, label):
        real = getattr(mod, name)

        def wrapped(*a, **k):
            calls.append(label)
            return real(*a, **k)

        monkeypatch.setattr(mod, name, wrapped)

    trace(rel_mod, "quality_gate", "rule")
    trace(qm_mod, "score_quality", "model")
    trace(rel_mod, "dedup_exact", "exact")
    trace(rel_mod, "dedup_incoming", "incr")
    trace(rel_mod, "quantile_release_gate", "qq")
    trace(dsir_mod, "dsir_resample", "dsir")

    release_tbl = str(tmp_path / "rel_full")
    shards = str(tmp_path / "shards_full")
    kw = dict(
        model_gate=True,
        model_weights={"intercept": -6.3},
        dsir_target="source = 'web'",
        dsir_token_budget=400,
        chunk_size=16,
        overlap=4,
        budget=32,
        num_shards=2,
    )
    docs = []
    for i in range(10):
        docs.append((i, _text(i, 24 + i % 7), "web"))
        docs.append((50 + i, _text(30 + i, 30 + i % 5), "books"))
    spam = [(100 + i, " ".join(["spam"] * 30), "web") for i in range(3)]
    corpus = spark.createDataFrame(
        docs + spam, "doc_id long, text string, source string"
    )
    # seed release: the even-id half (the bench_corpus_release shape)
    release_corpus(
        spark, corpus.filter(F.col("doc_id") % 2 == 0),
        release_tbl, shards, **kw,
    )
    seeded = {
        r["doc_id"]
        for r in tx_read(spark, release_tbl).select("doc_id").collect()
    }
    assert seeded and all(d % 2 == 0 for d in seeded)

    calls.clear()
    manifest = release_corpus(spark, corpus, release_tbl, shards, **kw)

    # (a) exact stage order of the incremental run
    assert calls == ["rule", "model", "exact", "incr", "qq", "dsir"]

    # (b) interactions
    released = tx_read(spark, release_tbl)
    rel_ids = {r["doc_id"] for r in released.select("doc_id").collect()}
    new_ids = rel_ids - seeded
    # model gate cut the spam before anything downstream
    assert not rel_ids & {100, 101, 102}
    # incremental dedup: nothing seeded was re-released (ids unique)
    assert released.count() == len(rel_ids)
    # DSIR budget bounds the increment's whitespace tokens
    toks = (
        released.filter(F.col("doc_id").isin([int(x) for x in new_ids]))
        .select(
            F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("t")
        )
        .first()["t"]
    )
    assert toks is not None and toks <= kw["dsir_token_budget"]
    # the increment still produced a loader manifest
    assert manifest.collect()


def test_release_coreset_stage(spark, tmp_path, monkeypatch):
    """k-center coreset selection as a release stage (round-12, VERDICT
    r11 directive 7): with ``coreset_k``/``embeddings`` on, the
    increment releases exactly the k docs the farthest-point traversal
    selects (the q277 operator — its input/output captured here), the
    stage runs AFTER the Q-Q gate, and a re-release composes with
    incremental dedup (released docs never re-selected)."""
    import cars_bids_data_pipeline_v0__spark.operators.similarity as sim_mod
    import cars_bids_data_pipeline_v0__spark.plans.release as rel_mod

    calls: list[str] = []
    captured: dict = {}
    real_kc = sim_mod.kcenter_traverse

    def traced_kc(pts, k, **kw):
        calls.append("coreset")
        out = real_kc(pts, k, **kw)
        captured["n_in"] = pts.count()
        captured["centers"] = out
        return out

    monkeypatch.setattr(sim_mod, "kcenter_traverse", traced_kc)
    real_qq = rel_mod.quantile_release_gate

    def traced_qq(*a, **k):
        calls.append("qq")
        return real_qq(*a, **k)

    monkeypatch.setattr(rel_mod, "quantile_release_gate", traced_qq)

    # 20 docs on a 2-d grid of embeddings: corners are the diverse picks
    docs = [(i, _text(i, 20 + i % 5), "web") for i in range(20)]
    corpus = spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    )
    emb = spark.createDataFrame(
        [
            (i, [float(i % 5) * 10.0, float(i // 5) * 10.0])
            for i in range(20)
        ],
        "doc_id long, embedding array<double>",
    )
    release_tbl = str(tmp_path / "rel_cs")
    shards = str(tmp_path / "shards_cs")
    manifest = release_corpus(
        spark, corpus, release_tbl, shards,
        coreset_k=4, embeddings=emb,
        chunk_size=16, overlap=4, budget=32, num_shards=2,
    )
    # coreset ran, and AFTER the Q-Q gate
    assert calls.index("qq") < calls.index("coreset")
    released = tx_read(spark, release_tbl)
    rel_ids = sorted(r["doc_id"] for r in released.collect())
    assert len(rel_ids) == 4
    # the released increment IS the traversal's selection (the stage
    # filters to the operator's centers, nothing more or less)
    want = sorted(int(vid) for _, vid, _, _ in captured["centers"])
    assert rel_ids == want
    # the traversal saw only GATE SURVIVORS with an embedding row
    assert captured["n_in"] < 20
    assert manifest.collect()
    # re-release of the same candidates: the 4 released docs dedup away
    # and the others re-compete — the next coreset is 4 FRESH docs
    release_corpus(
        spark, corpus, release_tbl, shards,
        coreset_k=4, embeddings=emb,
        chunk_size=16, overlap=4, budget=32, num_shards=2,
    )
    rel2 = sorted(
        r["doc_id"] for r in tx_read(spark, release_tbl).collect()
    )
    assert len(rel2) == 8 and set(rel_ids) < set(rel2)


def test_release_coreset_partial_embedding_coverage_is_loud(
    spark, tmp_path, capfd
):
    """Round-12 ADVICE: gated docs with no embedding row are dropped by
    the coreset's inner join — the stage must SAY so (stderr), not
    shrink the release silently; the covered docs still release."""
    docs = [(i, _text(i, 25), "web") for i in range(12)]
    corpus = spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    )
    # embeddings for only half the ids
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(0, 12, 2)],
        "doc_id long, embedding array<double>",
    )
    release_tbl = str(tmp_path / "rel_pc")
    manifest = release_corpus(
        spark, corpus, release_tbl, str(tmp_path / "shards_pc"),
        coreset_k=3, embeddings=emb,
        chunk_size=16, overlap=4, budget=32, num_shards=2,
    )
    err = capfd.readouterr().err
    assert "coreset embeddings cover" in err
    assert "embed-before-release" in err
    released = sorted(
        r["doc_id"] for r in tx_read(spark, release_tbl).collect()
    )
    assert len(released) == 3
    assert all(i % 2 == 0 for i in released)  # only covered ids placed
    assert manifest.collect()


def test_release_coreset_requires_embeddings(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(1, _text(1, 30), "web")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="embeddings"):
        release_corpus(
            spark, corpus, str(tmp_path / "t"), str(tmp_path / "s"),
            coreset_k=4,
        )


# ---------------------------------------------------------------------------
# round-13: the persistent dedup index (multi-release chain compaction)
# ---------------------------------------------------------------------------


def _near_dup_of(text: str) -> str:
    """Append one token: large shingle overlap, Jaccard just under 1."""
    return text + " zz_tail"


def test_dedup_incoming_indexed_matches_text_path(spark):
    from cars_bids_data_pipeline_v0__spark.operators.dedup_docs import (
        build_dedup_index,
        dedup_incoming,
        dedup_incoming_indexed,
    )

    corpus_rows = [(i, _text(i, 30), "web") for i in range(10)]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id long, text string, source string"
    )
    incoming = spark.createDataFrame(
        [
            (100, corpus_rows[0][1], "web"),          # exact dup
            (101, _near_dup_of(corpus_rows[1][1]), "web"),  # near dup
            (102, _text(50, 30), "web"),              # fresh
            (103, _text(51, 12), "web"),              # fresh short
        ],
        "doc_id long, text string, source string",
    )
    for cap in (None, 4):
        want = sorted(
            r["doc_id"]
            for r in dedup_incoming(
                incoming, corpus, threshold=0.5, df_cap=cap
            ).collect()
        )
        got = sorted(
            r["doc_id"]
            for r in dedup_incoming_indexed(
                incoming,
                build_dedup_index(corpus),
                threshold=0.5,
                df_cap=cap,
            ).collect()
        )
        assert got == want, (cap, got, want)
        assert 100 not in got and 101 not in got
        assert {102, 103} <= set(got)


def test_release_chain_with_index_matches_without(spark, tmp_path):
    """Three increments released through the persistent dedup index
    must match the text-path chain doc-for-doc, and the index table
    must hold exactly the released ids."""
    batches = [
        [(100 + i, _text(i, 20 + i), "web") for i in range(8)],
        # batch 2: two dups of batch 1 + fresh
        [
            (200, _text(0, 20), "web"),            # exact dup of 100
            (201, _near_dup_of(_text(1, 21)), "web"),  # near dup of 101
            (202, _text(60, 25), "web"),
            (203, _text(61, 26), "web"),
        ],
        # batch 3: dup of batch 2's release + fresh
        [
            (300, _text(60, 25), "web"),           # exact dup of 202
            (301, _text(70, 24), "web"),
        ],
    ]
    kw = dict(min_tokens=2, min_alpha_ratio=0.0, max_stopword_ratio=1.0,
              near_dup_threshold=0.5, min_decile=0,
              chunk_size=16, overlap=4, budget=64, num_shards=2)
    chains = {}
    for mode in ("text", "indexed"):
        rel = str(tmp_path / f"rel_{mode}")
        shards = str(tmp_path / f"shards_{mode}")
        idx = str(tmp_path / "didx") if mode == "indexed" else None
        per_incr = []
        for b in batches:
            df = spark.createDataFrame(
                b, "doc_id long, text string, source string"
            )
            release_corpus(
                spark, df, rel, shards, dedup_index_table=idx, **kw
            )
            per_incr.append(
                sorted(
                    r["doc_id"]
                    for r in tx_read(spark, rel).collect()
                )
            )
        chains[mode] = per_incr
    assert chains["indexed"] == chains["text"]
    # the index holds exactly the released ids
    idx_df = tx_read(spark, str(tmp_path / "didx"))
    assert sorted(r["doc_id"] for r in idx_df.collect()) == \
        chains["indexed"][-1]
    # duplicate candidates were really dropped across increments
    final = set(chains["indexed"][-1])
    assert 200 not in final and 201 not in final and 300 not in final
    assert {202, 203, 301} <= final


def test_release_index_self_heals_gap_and_migration(spark, tmp_path):
    """(a) A release table that predates the index (migration) and
    (b) a destroyed index (the crash-between-appends gap) both rebuild
    exactly the released docs' rows before the next dedup join."""
    import shutil

    kw = dict(min_tokens=2, min_alpha_ratio=0.0, max_stopword_ratio=1.0,
              near_dup_threshold=0.5, min_decile=0,
              chunk_size=16, overlap=4, budget=64, num_shards=2)
    rel = str(tmp_path / "rel")
    shards = str(tmp_path / "shards")
    idx = str(tmp_path / "didx")
    b1 = spark.createDataFrame(
        [(100 + i, _text(i, 20 + i), "web") for i in range(6)],
        "doc_id long, text string, source string",
    )
    # migration: first release WITHOUT an index table
    release_corpus(spark, b1, rel, shards, **kw)
    assert not os.path.exists(idx)
    # second release WITH the index: self-heal builds rows for every
    # already-released doc, and the dup of a release-1 doc still drops
    b2 = spark.createDataFrame(
        [(200, _text(0, 20), "web"), (201, _text(80, 22), "web")],
        "doc_id long, text string, source string",
    )
    release_corpus(spark, b2, rel, shards, dedup_index_table=idx, **kw)
    released = sorted(r["doc_id"] for r in tx_read(spark, rel).collect())
    assert 200 not in released and 201 in released
    idx_ids = sorted(
        r["doc_id"] for r in tx_read(spark, idx).collect()
    )
    assert idx_ids == released
    # crash gap: destroy the index entirely; the next release heals it
    shutil.rmtree(idx)
    b3 = spark.createDataFrame(
        [(300, _text(80, 22), "web"), (301, _text(90, 23), "web")],
        "doc_id long, text string, source string",
    )
    release_corpus(spark, b3, rel, shards, dedup_index_table=idx, **kw)
    released3 = sorted(
        r["doc_id"] for r in tx_read(spark, rel).collect()
    )
    assert 300 not in released3 and 301 in released3
    assert sorted(
        r["doc_id"] for r in tx_read(spark, idx).collect()
    ) == released3
