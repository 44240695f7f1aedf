"""Distributed BPE tokenizer training (functions/bpe.py)."""

import pytest
from fonduer_spark.functions import bpe


def test_word_frequencies(spark):
    docs = spark.createDataFrame(
        [(0, "the cat the"), (1, "cat  hat")], "doc_id long, text string")
    got = {r.word: r.freq
           for r in bpe.word_frequencies(docs).collect()}
    assert got == {"the": 2, "cat": 2, "hat": 1}


def test_bpe_train_merges_and_overlap(spark):
    # 'aaaa' x3: pairs (a,a) count 9 -> merge 'aa'; leftmost non-overlap
    # rewrites 'a a a a' -> 'aa aa', so round 2 merges (aa,aa) -> 'aaaa'
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa"), (1, "aaaa ab")], "doc_id long, text string")
    rows = bpe.bpe_train(docs, rounds=2).collect()
    assert [(r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
            for r in rows] == [
        (1, "a", "a", "aa", 9),       # 3 per 'aaaa' * freq 3
        (2, "aa", "aa", "aaaa", 3),   # 'aa aa' once per 'aaaa'
    ]


def test_bpe_train_tiebreak_lexicographic(spark):
    # 'ab' and 'cd' both count 1 -> winner (a,b) by (left, right) order
    docs = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    r = bpe.bpe_train(docs, rounds=1).collect()[0]
    assert (r.left_sym, r.right_sym, r.pair_count) == ("a", "b", 1)


def test_bpe_train_rejects_zero_rounds(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="rounds"):
        bpe.bpe_train(docs, rounds=0)
