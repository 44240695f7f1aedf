"""LingualParser conformance contract (VERDICT r3 item 4).

The reference's pluggable lingual surface (spacy_parser.py:102-319,
simple_parser.py:19-45) has implicit invariants every implementation must
hold — parallel arrays, in-bounds dep heads, offset/word agreement, sentence
boundaries pinned to the input. This file states them ONCE and runs every
available parser against them (SimpleParser + RegexTaggerParser today; the
spaCy drop-in joins the matrix automatically the day the env provides it),
so a future real-NLP substitution is verified on arrival, not trusted.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fonduer_spark.lingual import LingualParser, RegexTaggerParser, SimpleParser

ARRAY_KEYS = ("words", "char_offsets", "lemmas", "pos_tags", "ner_tags",
              "dep_parents", "dep_labels")


def _parsers():
    ps = [("simple", SimpleParser()), ("regex_tagger", RegexTaggerParser())]
    try:  # pragma: no cover - spaCy absent in this container
        import spacy  # noqa: F401

        from fonduer_spark.spacy_lingual import SpacyLingualParser

        ps.append(("spacy", SpacyLingualParser("en")))
    except Exception:
        pass
    return ps


PARSERS = _parsers()
IDS = [n for n, _ in PARSERS]
IMPLS = [p for _, p in PARSERS]

TEXTS = [
    "The part PN123A runs at 85 degrees. Use with care.",
    "One.",
    "  leading and   trailing   spaces .  ",
    "no delimiter at all",
    "2024-01-02 was -40 degrees",
    "",
    "...",
]


def check_contract(parser: LingualParser, text: str):
    """The shared invariants (reference spacy_parser.py:191-249: custom
    boundaries pinned via custom_boundary_funct, parallel token arrays)."""
    sents = list(parser.split_sentences(text))
    all_words = []
    for s in sents:
        # 1. every array key present, all parallel
        n = len(s["words"])
        assert n > 0  # empty sentences are never yielded
        for k in ARRAY_KEYS:
            assert len(s[k]) == n, (k, s)
        # 2. offsets: word i starts at char_offsets[i] within the sentence
        #    text, offsets strictly increasing
        for i, w in enumerate(s["words"]):
            off = s["char_offsets"][i]
            assert s["text"][off:off + len(w)] == w
        assert s["char_offsets"] == sorted(set(s["char_offsets"]))
        # 3. abs offsets exist and are non-decreasing with the same deltas
        assert len(s["abs_char_offsets"]) == n
        # 4. dep heads in-bounds: 0 (root) or a valid 1-based token index
        assert all(0 <= p <= n for p in s["dep_parents"])
        # 5. NLP support contract: parsers claiming no NLP leave lemmas
        #    empty; parsers claiming NLP fill every lemma
        if parser.has_NLP_support():
            assert all(s["lemmas"][i] != "" for i in range(n)
                       if s["words"][i].strip())
        else:
            assert all(lm == "" for lm in s["lemmas"])
        all_words.extend(s["words"])
    # 6a. all tokenizers: the concatenated words are a character
    #     subsequence of the input (no invented characters, order kept)
    if parser.has_tokenizer_support():
        it = iter(text)
        assert all(c in it for c in "".join(all_words))
    # 6b. delimiter-split family: every non-delimiter token survives
    #     verbatim, in order (spaCy-style tokenizers may split further,
    #     so 6b applies only to the SimpleParser family)
    if isinstance(parser, SimpleParser):
        expect = [t for raw in text.split(".") for t in raw.split()]
        assert all_words == [w for w in expect if w]
    return sents


@pytest.mark.parametrize("parser", IMPLS, ids=IDS)
@pytest.mark.parametrize("text", TEXTS)
def test_lingual_contract_fixed_texts(parser, text):
    check_contract(parser, text)


@pytest.mark.parametrize("parser", IMPLS, ids=IDS)
def test_lingual_contract_determinism(parser):
    t = "PN900B is rated 125 degrees. Twice. "
    assert list(parser.split_sentences(t)) == list(parser.split_sentences(t))


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_categories=("Cc",)),
               max_size=120))
def test_lingual_contract_property(text):
    for parser in IMPLS:
        check_contract(parser, text)


def test_regex_tagger_specifics():
    """RegexTaggerParser's documented rule surface (the SQL-reproducible
    stand-in contract: these exact tags are what the oracle queries and the
    NER matchers rely on)."""
    p = RegexTaggerParser()
    (s,) = p.split_sentences("PN123A hit -40 on 2024-01-02 , said Bob")
    tags = dict(zip(s["words"], zip(s["pos_tags"], s["ner_tags"])))
    assert tags["PN123A"] == ("NNP", "MISC")
    assert tags["-40"] == ("CD", "CARDINAL")
    assert tags["2024-01-02"] == ("CD", "DATE")
    assert tags[","] == (".", "")
    assert tags["said"] == ("NN", "")
    assert tags["Bob"] == ("NNP", "")
    assert s["dep_labels"][0] == "root"
    assert set(s["dep_labels"][1:]) == {"flat"}
