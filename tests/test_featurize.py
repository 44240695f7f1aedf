"""Featurization libraries (reference tests/features/test_features.py
analogue)."""

import pytest
from pyspark.sql import functions as F

from fonduer_spark.candidates_op import extract_candidates, same_row
from fonduer_spark.featurize import aligned_ngram_features, feature_keys, featurize
from fonduer_spark.pipeline import kg_stages

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stages(spark):
    st = kg_stages(spark, SF, max_docs=20)
    yield st
    st["mentions"].unpersist()


@pytest.fixture(scope="module")
def feats(spark, stages):
    return featurize(stages["candidates"], stages["parsed"]).persist()


def test_feature_shape_and_determinism(spark, stages, feats):
    rows = feats.limit(50).collect()
    assert rows
    for r in rows:
        assert len(r.keys) == len(r.values)
        assert all(v == 1.0 for v in r.values)
        assert len(set(r.keys)) == len(r.keys)  # no dup keys per candidate


def test_expected_feature_families(spark, feats):
    keys = {r.key for r in feature_keys(feats).collect()}
    # slot-prefixed unary families (LEFT_/RIGHT_ windows are empty on this
    # corpus: every mention's sentence is a single-token table cell — the
    # window path is covered by test_window_features below)
    assert any(k.startswith("e0_CONTAINS_[") for k in keys)
    assert any(k.startswith("e0_ROW_NUM_[") for k in keys)
    assert any(k.startswith("e0_TAG_[") for k in keys)
    assert any(k.startswith("e0_ANCESTOR_TAG_[") for k in keys)
    # binary relation features: same-row throttled candidates
    assert "SAME_TABLE" in keys
    assert "SAME_TABLE_ROW_DIFF_[0]" in keys
    assert not any(k == "SAME_CELL" for k in keys)  # part/temp in diff cells


def test_feature_key_classes(spark, feats):
    fk = feature_keys(feats).collect()
    assert all(r.candidate_classes == ["part_temp"] for r in fk)


def test_tabular_binary_diff_table(spark, stages):
    from fonduer_spark.candidates_op import same_table
    # candidates WITHOUT the same-row throttler include cross-table pairs
    cands = extract_candidates(
        stages["mentions"], "part_temp_all", "part", "temp")
    f = featurize(cands.limit(500))
    keys = {k for r in f.collect() for k in r.keys}
    assert "DIFF_TABLE" in keys or "SAME_TABLE" in keys


def test_aligned_ngram_features(spark, stages):
    row_ng = aligned_ngram_features(stages["mentions"], axis="row").collect()
    assert row_ng
    # a row vocabulary contains both the part code and its temps
    by_key = {(r.url, r.table_sid, r.pos): set(r.ngrams) for r in row_ng}
    some = next(iter(by_key.values()))
    assert some


def test_window_features(spark):
    """LEFT_/RIGHT_ windows + _NUMBER normalization on a multi-word sentence."""
    from fonduer_spark.candidates_op import extract_candidates
    from fonduer_spark.mentions_op import MENTION_COLUMNS, MENTION_SCHEMA
    from fonduer_spark.parse import CONTEXT_COLUMNS, CONTEXT_SCHEMA

    def m(mtype, ws, we, cs, ce, text, sid_i):
        r = dict.fromkeys(MENTION_COLUMNS)
        r.update(mention_type=mtype, url="d",
                 stable_id=f"d::span_mention:{sid_i}:{sid_i+ce-cs}",
                 sentence_sid="d::sentence:0:30", sentence_position=0,
                 char_start=cs, char_end=ce, word_start=ws, word_end=we,
                 span_text=text, emit_seq=0)
        return tuple(r[c] for c in MENTION_COLUMNS)

    mentions = spark.createDataFrame(
        [m("A", 2, 2, 10, 14, "PN10A", 0), m("B", 4, 4, 19, 20, "85", 19)],
        MENTION_SCHEMA)
    s = dict.fromkeys(CONTEXT_COLUMNS)
    s.update(url="d", stable_id="d::sentence:0:30", ctx_type="sentence",
             position=0, text="the part PN10A rated 85 degrees",
             words="the part PN10A rated 85 degrees".split(),
             char_offsets=[0, 4, 9, 15, 21, 24],
             abs_char_offsets=[0, 4, 9, 15, 21, 24])
    sentences = spark.createDataFrame(
        [tuple(s[c] for c in CONTEXT_COLUMNS)], CONTEXT_SCHEMA)
    cands = extract_candidates(mentions, "AB", "A", "B")
    keys = {k for r in featurize(cands, sentences).collect() for k in r.keys}
    assert "e0_LEFT_[part]" in keys
    assert "e0_RIGHT_[rated]" in keys
    assert "e1_LEFT_[rated]" in keys
    assert "e1_CONTAINS_[_NUMBER]" in keys  # number normalization
    assert "SAME_SENTENCE" in keys
    assert "e0_STARTS_WITH_CAPITAL" in keys


def test_lingual_features_gated_and_active(spark):
    """Lingual features no-op under SimpleParser (empty arrays) and activate
    when lemma/pos/dep arrays are populated (spaCy-style input)."""
    from fonduer_spark.candidates_op import extract_candidates
    from fonduer_spark.mentions_op import MENTION_COLUMNS, MENTION_SCHEMA
    from fonduer_spark.parse import CONTEXT_COLUMNS, CONTEXT_SCHEMA

    def m(mtype, ws, we, cs, ce, text, sid_i):
        r = dict.fromkeys(MENTION_COLUMNS)
        r.update(mention_type=mtype, url="d",
                 stable_id=f"d::span_mention:{sid_i}:{sid_i+ce-cs}",
                 sentence_sid="d::sentence:0:20", sentence_position=0,
                 char_start=cs, char_end=ce, word_start=ws, word_end=we,
                 span_text=text, emit_seq=0)
        return tuple(r[c] for c in MENTION_COLUMNS)

    mentions = spark.createDataFrame(
        [m("A", 0, 0, 0, 3, "cats", 0), m("B", 2, 2, 10, 13, "mice", 10)],
        MENTION_SCHEMA)
    s = dict.fromkeys(CONTEXT_COLUMNS)
    s.update(url="d", stable_id="d::sentence:0:20", ctx_type="sentence",
             position=0, text="cats chase mice", words=["cats", "chase", "mice"],
             char_offsets=[0, 5, 11], abs_char_offsets=[0, 5, 11],
             lemmas=["cat", "chase", "mouse"], pos_tags=["NOUN", "VERB", "NOUN"],
             dep_labels=["nsubj", "ROOT", "dobj"], dep_parents=[1, 1, 1])
    sentences = spark.createDataFrame(
        [tuple(s[c] for c in CONTEXT_COLUMNS)], CONTEXT_SCHEMA)
    cands = extract_candidates(mentions, "AB", "A", "B")
    keys = {k for r in featurize(cands, sentences).collect() for k in r.keys}
    assert "e0_LEMMA_SEQ_[cat]" in keys
    assert "e0_POS_SEQ_[NOUN]" in keys
    assert "e0_DEP_LABEL_[nsubj]" in keys
    assert "e0_DEP_HEAD_LEMMA_[chase]" in keys

    # SimpleParser-style empty arrays -> lingual features absent
    s2 = dict(s)
    s2.update(lemmas=["", "", ""], pos_tags=["", "", ""],
              dep_labels=["", "", ""], dep_parents=[0, 0, 0])
    sentences2 = spark.createDataFrame(
        [tuple(s2[c] for c in CONTEXT_COLUMNS)], CONTEXT_SCHEMA)
    keys2 = {k for r in featurize(cands, sentences2).collect() for k in r.keys}
    assert not any("LEMMA_SEQ" in k or "DEP_" in k for k in keys2)


def test_span_text_fallback_without_sentences(spark, stages):
    f = featurize(stages["candidates"].limit(20), sentences=None)
    keys = {k for r in f.collect() for k in r.keys}
    assert any(k.startswith("e0_CONTAINS_[") for k in keys)
    # window features need sentence context; absent in fallback
    assert not any(k.startswith("e0_LEFT_[") for k in keys)
