"""Matcher algebra + mention-space semantics (reference
tests/candidates/test_matchers.py analogues)."""

import pytest

from fonduer_spark.matchers import (
    Concat,
    DictionaryMatch,
    DoNothingMatcher,
    Intersect,
    Inverse,
    LambdaFunctionMatcher,
    RegexMatchEach,
    RegexMatchSpan,
    Union,
)
from fonduer_spark.mention_spaces import MentionSentences, Ngrams
from fonduer_spark.spans import SentenceView, Span


def sent(text: str, **extra):
    words = text.split()
    offs = [0]
    for w in words[:-1]:
        offs.append(offs[-1] + len(w) + 1)
    row = {
        "url": "u0",
        "stable_id": "u0::sentence:0:%d" % len(text),
        "position": 0,
        "text": text,
        "words": words,
        "char_offsets": offs,
        "abs_char_offsets": offs,
        "lemmas": [""] * len(words),
        "pos_tags": [""] * len(words),
        "ner_tags": extra.get("ner_tags", [""] * len(words)),
    }
    row.update(extra)
    return SentenceView(row)


def spans(sv, matcher, n_max=3):
    return [m.get_span() for m in matcher.apply(Ngrams(n_max=n_max).apply(sv))]


def test_ngrams_longest_first_and_dedup():
    sv = sent("a b c")
    got = [s.get_span() for s in Ngrams(n_max=3).apply(sv)]
    assert got == ["a b c", "a b", "b c", "a", "b", "c"]


def test_ngrams_split_tokens():
    sv = sent("x BC546-BC548 y")
    got = [s.get_span() for s in Ngrams(n_max=1, split_tokens=["-"]).apply(sv)]
    assert "BC546-BC548" in got and "BC546" in got and "BC548" in got


def test_dictionary_match_case_and_inverse():
    sv = sent("Alpha beta gamma")
    d = DictionaryMatch(d=["alpha", "gamma"])
    assert sorted(spans(sv, d, n_max=1)) == ["Alpha", "gamma"]
    d2 = DictionaryMatch(d=["alpha"], ignore_case=False)
    assert spans(sv, d2, n_max=1) == []
    d3 = DictionaryMatch(d=["alpha", "gamma"], inverse=True,
                         longest_match_only=False)
    assert spans(sv, d3, n_max=1) == ["beta"]


def test_regex_span_full_match_vs_search():
    sv = sent("ab12 xy")
    assert spans(sv, RegexMatchSpan(rgx=r"[a-z]+\d+"), n_max=1) == ["ab12"]
    # full_match wraps with $: 'ab' alone must not match inside 'ab12'
    assert spans(sv, RegexMatchSpan(rgx=r"[a-z]{2}"), n_max=1) == ["xy"]
    got = spans(sv, RegexMatchSpan(rgx=r"\d+", search=True, full_match=False),
                n_max=1)
    assert got == ["ab12"]


def test_regex_each_over_ner_tags():
    sv = sent("Barack Obama here", ner_tags=["PERSON", "PERSON", ""])
    m = RegexMatchEach(rgx="PERSON", attrib="ner_tags")
    got = spans(sv, m, n_max=2)
    # longest-match-only suppresses the contained unigrams
    assert got == ["Barack Obama"]


def test_union_intersect_inverse():
    sv = sent("aa bb cc")
    a = DictionaryMatch(d=["aa"])
    b = DictionaryMatch(d=["bb"])
    assert sorted(spans(sv, Union(a, b), n_max=1)) == ["aa", "bb"]
    assert spans(sv, Intersect(a, b), n_max=1) == []
    assert sorted(spans(sv, Inverse(a, longest_match_only=False), n_max=1)) \
        == ["bb", "cc"]
    with pytest.raises(ValueError):
        Inverse(a, b)


def test_concat():
    sv = sent("10 Obama")
    num = RegexMatchSpan(rgx=r"\d+")
    word = RegexMatchSpan(rgx=r"[A-Za-z]+")
    got = spans(sv, Concat(num, word), n_max=2)
    assert got == ["10 Obama"]
    # permutations
    sv2 = sent("Obama 10")
    assert spans(sv2, Concat(num, word), n_max=2) == []
    assert spans(sv2, Concat(num, word, permutations=True), n_max=2) \
        == ["Obama 10"]


def test_longest_match_only_toggle():
    sv = sent("aa aa")
    m = DictionaryMatch(d=["aa", "aa aa"])
    assert spans(sv, m) == ["aa aa"]  # contained spans suppressed
    m2 = DictionaryMatch(d=["aa", "aa aa"], longest_match_only=False)
    assert spans(sv, m2) == ["aa aa", "aa", "aa"]


def test_lambda_matcher_default_not_longest():
    sv = sent("aa aa")
    m = LambdaFunctionMatcher(func=lambda s: True)
    got = [x.get_span() for x in m.apply(Ngrams(n_max=2).apply(sv))]
    assert got == ["aa aa", "aa", "aa"]


def test_do_nothing_and_sentence_space():
    sv = sent("hello world")
    got = [s.get_span() for s in DoNothingMatcher().apply(
        MentionSentences().apply(sv))]
    assert got == ["hello world"]


def test_span_slicing_and_word_math():
    sv = sent("alpha beta gamma")
    sp = Span(sv, 0, 14)  # "alpha beta gam"... use full span of 2 words
    sp2 = Span(sv, 6, 9)  # "beta"
    assert sp2.get_span() == "beta"
    assert sp2.get_word_start_index() == 1
    assert sp2 in Span(sv, 0, 15)
    assert Span(sv, 0, 15)[6:10].get_span() == "beta"
