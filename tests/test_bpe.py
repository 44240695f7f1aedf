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


def _py_bpe(word_freqs, rounds):
    """Textbook greedy BPE reference: returns (merges, final symbol seqs).
    Independent of the string-encoding trick the Spark path uses."""
    seqs = {w: [list(w), f] for w, f in word_freqs.items()}
    merges = []
    for _ in range(rounds):
        counts = {}
        for syms, freq in seqs.values():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + freq
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, l + r, cnt))
        for w, (syms, freq) in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w][0] = out
    return merges, seqs


def test_bpe_matches_textbook_reference_on_adversarial_corpora(spark):
    """Random small-alphabet corpora (runs + count ties everywhere — the
    adversarial case for the double-space encoding) must reproduce the
    textbook greedy trainer's merge table AND per-doc token counts."""
    import random

    for seed in (7, 19, 23):
        rng = random.Random(seed)
        docs_py = [
            (d, " ".join(
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
                for _ in range(20)))
            for d in range(8)
        ]
        docs = spark.createDataFrame(docs_py, "doc_id long, text string")
        freqs = {}
        for _d, t in docs_py:
            for w in t.split():
                freqs[w] = freqs.get(w, 0) + 1
        want_merges, want_seqs = _py_bpe(freqs, rounds=3)

        merges_df = bpe.bpe_train(docs, rounds=3)
        got = merges_df.collect()
        assert [(r.left_sym, r.right_sym, r.merged, r.pair_count)
                for r in got] == want_merges, f"seed {seed}"

        got_counts = {r.doc_id: r.n_tokens
                      for r in bpe.bpe_encode(docs, merges_df).collect()}
        want_counts = {
            d: sum(len(want_seqs[w][0]) for w in t.split())
            for d, t in docs_py
        }
        assert got_counts == want_counts, f"seed {seed}"


def test_bpe_encode_counts(spark):
    docs = spark.createDataFrame(
        [(0, "aaaa ab"), (1, "b aaaa aaaa")], "doc_id long, text string")
    merges = bpe.bpe_train(docs, rounds=2)  # learns (a,a)->aa, (aa,aa)->aaaa
    got = {r.doc_id: r.n_tokens
           for r in bpe.bpe_encode(docs, merges).collect()}
    # doc0: 'aaaa'->[aaaa](1) + 'ab'->[a,b](2) = 3
    # doc1: 'b'(1) + 'aaaa'(1) + 'aaaa'(1) = 3
    assert got == {0: 3, 1: 3}


def test_bpe_train_early_stop_and_encode_survives(spark):
    # pairs exhaust after round 1 ('ab' fully merged); asking for 3 rounds
    # must return 1 merge row, and encode must still count every doc —
    # including the whitespace-only doc at n_tokens=0
    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "ab"), (2, "   ")], "doc_id long, text string")
    merges = bpe.bpe_train(docs, rounds=3)
    rows = merges.collect()
    assert [(r.round, r.left_sym, r.right_sym) for r in rows] \
        == [(1, "a", "b")]
    got = {r.doc_id: r.n_tokens
           for r in bpe.bpe_encode(docs, merges).collect()}
    assert got == {0: 2, 1: 1, 2: 0}
