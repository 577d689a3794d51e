"""BPE training-loop unit tests (q266's engine, `_train_bpe`).

The oracled q266 pins the sequential K=6 semantics end-to-end against
DuckDB; these tests pin the pieces the oracle can't reach — the
batched scale path's equivalence contract, mid-batch budget stops, and
vocabulary exhaustion (the round-10 K-curve crash).
"""

from __future__ import annotations

from cars_bids_data_pipeline_v0__spark.plans.queries_r9 import (
    _bpe_pair_counts,
    _train_bpe,
)


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


def test_batched_equals_sequential_on_symbol_disjoint_argmaxes(spark):
    # four disjoint alphabets with strictly decreasing pair counts: the
    # next 4 argmaxes are ab > cd > ef > gh, pairwise symbol-disjoint,
    # and every pair a merge creates (e.g. chr(1)chr(1) at freq 100)
    # counts strictly below the last kept pair — the documented
    # exactness condition, so batch=4 must reproduce sequential
    # training verbatim (pairs, counts, AND sentinel numbering)
    rows = [("abab", 100), ("cdcd", 90), ("efef", 80), ("ghgh", 70)]
    seq = _train_bpe(_words(spark, rows), 4, batch=1)
    bat = _train_bpe(_words(spark, rows), 4, batch=4)
    assert seq == bat
    assert [p for _s, p, _f in seq] == ["ab", "cd", "ef", "gh"]
    assert [f for _s, _p, f in seq] == [200, 180, 160, 140]


def test_batched_skips_overlapping_pairs_within_a_batch(spark):
    # "abc": pairs ab and bc tie at 100; rank order (freq desc, pair
    # asc) puts ab first, bc shares 'b' so the batch must NOT apply it
    # blindly — it recounts next iteration, exactly like sequential
    rows = [("abc", 100)]
    seq = _train_bpe(_words(spark, rows), 2, batch=1)
    bat = _train_bpe(_words(spark, rows), 2, batch=8)
    assert seq == bat
    assert seq[0][1] == "ab"
    # after ab -> chr(1), the only remaining pair is chr(1)c
    assert seq[1][1] == chr(1) + "c"


def test_batched_respects_merge_budget_mid_batch(spark):
    # k=3 with a batch of 4 disjoint candidates: the batch must stop at
    # the budget, not overrun it
    rows = [("abab", 100), ("cdcd", 90), ("efef", 80), ("ghgh", 70)]
    got = _train_bpe(_words(spark, rows), 3, batch=4)
    assert [(s, p) for s, p, _f in got] == [(1, "ab"), (2, "cd"), (3, "ef")]


def test_training_stops_at_vocabulary_exhaustion(spark):
    # one 2-char word: after ONE merge every word is a single symbol,
    # the pair table is empty and training must stop early (returned
    # int(None) crash found on the round-10 K-curve) — both paths
    rows = [("ab", 5)]
    for batch in (1, 4):
        got = _train_bpe(_words(spark, rows), 10, batch=batch)
        assert got == [(1, "ab", 5)], (batch, got)


def test_pair_counts_weight_by_word_frequency(spark):
    rows = [("aa", 3), ("aaa", 2)]
    got = {
        r["pair"]: r["freq"]
        for r in _bpe_pair_counts(_words(spark, rows)).collect()
    }
    # "aa" contributes 1 window x3, "aaa" contributes 2 windows x2
    assert got == {"aa": 7}
