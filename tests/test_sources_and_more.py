"""Sources/preprocessors, context mention spaces, implicit expanders,
LF helpers, driver-side learning."""

import re

import pytest
from pyspark.sql import functions as F

from fonduer_spark import sources
from fonduer_spark.data_model_utils import (
    col_ngrams,
    get_matches,
    is_superset,
    neighbor_sentence_ngrams,
    overlap,
    row_ngrams,
)
from fonduer_spark.expanders import NgramsPartRange, expand_part_range
from fonduer_spark.mentions_op import extract_context_mentions
from fonduer_spark.parse import parse_webpages
from fonduer_spark.pipeline import kg_stages
from fonduer_spark.spans import ImplicitSpan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stages(spark):
    st = kg_stages(spark, SF, max_docs=12)
    yield st
    st["mentions"].unpersist()


# --- sources ----------------------------------------------------------------
def test_tsv_and_text_sources(spark, tmp_path):
    p = tmp_path / "docs.tsv"
    p.write_text("doc1\thello world. second sentence.\ndoc2\tbye now.\n")
    pages = sources.tsv_docs(spark, str(p))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    parsed = parse_webpages(pages)
    sents = parsed.where(parsed.ctx_type == "sentence")
    got = {(r.url, r.text) for r in sents.collect()}
    assert ("doc1", "hello world") in got
    assert ("doc2", "bye now") in got


def test_csv_source(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("name,title,body\nd1,Hello,World one.\nd2,Bye,World two.\n")
    pages = sources.csv_docs(spark, str(p), name_col="name")
    parsed = parse_webpages(pages)
    sents = parsed.where(parsed.ctx_type == "sentence")
    texts = {r.text for r in sents.where(F.col("url") == "d1").collect()}
    assert texts == {"Hello", "World one"}


def test_html_source(spark, tmp_path):
    (tmp_path / "a.html").write_text(
        "<html><body><p>alpha beta.</p></body></html>")
    pages = sources.html_docs(spark, str(tmp_path))
    parsed = parse_webpages(pages)
    assert parsed.where(parsed.ctx_type == "sentence").count() == 1


# --- context mention spaces ---------------------------------------------------
def test_figure_and_cell_mentions(spark, stages):
    figs = extract_context_mentions(
        stages["parsed"], "figure", figure_types=[".png"])
    rows = figs.limit(5).collect()
    assert rows and all(r.fig_url.endswith(".png") for r in rows)
    assert all("::figure_mention:" in r.stable_id for r in rows)
    none = extract_context_mentions(
        stages["parsed"], "figure", figure_types=[".jpg"])
    assert none.count() == 0
    cells = extract_context_mentions(stages["parsed"], "cell")
    r = cells.limit(1).collect()[0]
    assert re.match(r".+::cell_mention:\d+:\d+:\d+$", r.stable_id)


# --- implicit expanders -------------------------------------------------------
def test_expand_part_range():
    assert list(expand_part_range("PN100A-PN102A")) == \
        ["PN100A", "PN101A", "PN102A"]
    # shorthand second half (prefix elided) also expands
    assert list(expand_part_range("PN100A-102A")) == \
        ["PN100A", "PN101A", "PN102A"]
    assert list(expand_part_range("PN100A-PN099A")) == []
    assert list(expand_part_range("PN100A-PN102B")) == []


def test_ngrams_part_range_space():
    from tests.test_matchers import sent

    sv = sent("see PN200B-PN202B spec")
    spans = list(NgramsPartRange(n_max=1).apply(sv))
    implicit = [s for s in spans if isinstance(s, ImplicitSpan)]
    assert [s.get_span() for s in implicit] == ["PN200B", "PN201B", "PN202B"]
    sids = {s.get_stable_id() for s in implicit}
    assert len(sids) == 3
    assert all("implicit_span_mention" in s for s in sids)


# --- LF helpers ---------------------------------------------------------------
def test_row_col_ngrams(spark, stages):
    rn = row_ngrams(stages["parsed"])
    row1 = rn.where(
        (F.col("table_sid") == "https://fixture.test/d000001::table:0")
        & (F.col("row") == 1)).collect()
    assert len(row1) == 1
    from fonduer_spark.corpus import part_code, temp_max, temp_min
    toks = set(row1[0].ngrams)
    assert part_code(1, 0, 0).lower() in toks
    assert str(temp_max(1, 0, 0)) in toks and str(temp_min(1, 0, 0)) in toks
    cn = col_ngrams(stages["parsed"])
    col0 = cn.where(
        (F.col("table_sid") == "https://fixture.test/d000001::table:0")
        & (F.col("col") == 0)).collect()[0]
    assert "part" in col0.ngrams  # header token


def test_neighbor_sentence_ngrams(spark, stages):
    nb = neighbor_sentence_ngrams(stages["parsed"], d=1)
    r = nb.limit(1).collect()[0]
    assert r.neighborhood


def test_python_helpers():
    assert overlap(["a", "b"], ["b", "c"])
    assert not overlap(["a"], ["c"])
    assert is_superset(["a", "b", "c"], ["a", "c"])
    pat = re.compile(r"\d+")
    assert get_matches(pat, ["a1", "bb", "2c"]) == ["a1", "2c"]


# --- learning -----------------------------------------------------------------
def test_logreg_learns_separation(spark, stages):
    from fonduer_spark.featurize import featurize
    from fonduer_spark.learning import score_with_model, train_logreg

    feats = featurize(stages["candidates"]).persist()
    marg = stages["scored"].select("candidate_sid", "prob")
    weights, bias = train_logreg(feats, marg, epochs=120)
    scored = score_with_model(feats, weights, bias)
    joined = scored.join(marg, "candidate_sid")
    rows = joined.select("prob", "model_prob").collect()
    pos = [r.model_prob for r in rows if r.prob >= 0.5]
    neg = [r.model_prob for r in rows if r.prob < 0.5]
    assert pos and neg
    # the discriminative model separates label-model positives from negatives
    assert min(pos) > max(neg) or (
        sum(pos) / len(pos) > sum(neg) / len(neg) + 0.2)
    feats.unpersist()


def test_config_search_and_merge(tmp_path, monkeypatch):
    import json
    from fonduer_spark.config import DEFAULTS, get_config

    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    (tmp_path / ".fonduer-spark.json").write_text(json.dumps(
        {"featurization": {"textual": {"window_feature": {"size": 5}}}}))
    cfg = get_config(str(sub))  # found via parent-dir search
    assert cfg["featurization"]["textual"]["window_feature"]["size"] == 5
    # untouched defaults survive the merge
    assert cfg["featurization"]["textual"]["word_feature"]["window"] == 7
    assert get_config("/")["learning"]["logreg"]["epochs"] == \
        DEFAULTS["learning"]["logreg"]["epochs"]


def test_window_column_helpers(spark):
    from fonduer_spark.data_model_utils import (
        get_between_ngrams_col, get_left_ngrams_col, get_right_ngrams_col)

    df = spark.createDataFrame(
        [(["a", "b", "c", "d", "e", "f"], 2, 2, 4)],
        "words array<string>, ws int, we int, b_ws int")
    r = df.select(
        get_left_ngrams_col(F.col("words"), F.col("ws"), 2).alias("l"),
        get_right_ngrams_col(F.col("words"), F.col("we"), 2).alias("r"),
        get_between_ngrams_col(F.col("words"), F.col("we"), F.col("b_ws"))
        .alias("btw"),
    ).collect()[0]
    assert r.l == ["a", "b"]        # the 2 tokens immediately left of index 2
    assert r.r == ["d", "e"]        # 2 tokens right of index 2
    assert r.btw == ["d"]           # strictly between we=2 and b_ws=4


def test_concat_separator_check():
    from fonduer_spark.matchers import Concat, RegexMatchSpan
    from tests.test_matchers import sent

    num = RegexMatchSpan(rgx=r"\d+")
    word = RegexMatchSpan(rgx=r"[A-Za-z]+")
    sv = sent("10 Obama")
    # sep=' ' with ignore_sep=False: the split char must BE the separator
    got = [m.get_span() for m in
           Concat(num, word, ignore_sep=False, sep=" ").apply(
               __import__("fonduer_spark.mention_spaces",
                          fromlist=["Ngrams"]).Ngrams(n_max=2).apply(sv))]
    assert got == ["10 Obama"]


def test_with_row_ngrams_join(spark, stages):
    from fonduer_spark.data_model_utils import with_row_ngrams

    cands = stages["candidates"].limit(50)
    joined = with_row_ngrams(cands, stages["parsed"], slot="b_")
    rows = joined.where(F.col("b_row_ngrams").isNotNull()).limit(5).collect()
    assert rows
    for r in rows:
        # the row vocabulary contains the temp's own token
        assert r.b_span_text.lower() in r.b_row_ngrams
        # and the part code that shares its row
        assert r.a_span_text.lower() in r.b_row_ngrams


HOCR_FIXTURE = """<html>
<head><meta name="ocr-capabilities" content="ocr_page ocr_carea ocr_par ocr_line ocrx_word"/></head>
<body>
<div class="ocr_page" title="bbox 0 0 600 800; ppageno 0">
 <p class="ocr_par">
  <span class="ocr_line" title="bbox 10 10 300 30">
   <span class="ocrx_word" title="bbox 10 10 60 30">Part</span>
   <span class="ocrx_word" title="bbox 70 10 140 30">PN10A</span>
  </span>
  <span class="ocr_line" title="bbox 10 40 300 60">
   <span class="ocrx_word" title="bbox 10 40 50 60">rated</span>
   <span class="ocrx_word" title="bbox 60 40 90 60">85.</span>
   <span class="ocrx_word" title="bbox 100 40 190 60">Stable now</span>
  </span>
 </p>
</div>
<div class="ocr_page" title="bbox 0 0 600 800; ppageno 1">
 <p class="ocr_par">
  <span class="ocrx_word" title="bbox 10 10 90 30">Appendix</span>
 </p>
</div>
</body></html>"""


def test_hocr_rewrite_and_visual_parse(spark):
    """hOCR end to end: rewrite_hocr accumulates word bboxes onto parents
    (reference HOCRDocPreprocessor), ParseConfig(visual='hocr') aligns them
    back onto sentence words — including a sentence-split token ('85.') and
    a multi-word ocrx_word ('Stable now')."""
    from fonduer_spark.lingual import SimpleParser
    from fonduer_spark.parse import ParseConfig, parse_document
    from fonduer_spark.sources import rewrite_hocr

    html = rewrite_hocr(HOCR_FIXTURE)
    assert 'class="ocrx_word"' not in html and 'class="ocr_line"' not in html
    cfg = ParseConfig(visual="hocr")
    rows = [r for r in parse_document("u", html, cfg, SimpleParser("."))
            if r["ctx_type"] == "sentence"]
    by_text = {r["text"]: r for r in rows}
    s1 = by_text["Part PN10A rated 85"]
    assert s1["page"] == [0, 0, 0, 0]
    assert s1["left"] == [10, 70, 10, 60]
    assert s1["top"] == [10, 10, 40, 40]
    assert s1["right"] == [60, 140, 50, 90]
    # multi-word ocrx_word: both tokens share the word's bbox
    s2 = by_text["Stable now"]
    assert s2["left"] == [100, 100] and s2["right"] == [190, 190]
    # second page
    s3 = by_text["Appendix"]
    assert s3["page"] == [1]
    # hOCR bookkeeping attrs are not structural signal
    assert not any(a.startswith(("tokens=", "left="))
                   for a in (s1["html_attrs"] or []))


def test_hocr_mention_bbox_and_visual_features(spark):
    """Mentions over hOCR sentences carry span bboxes; the visual feature
    library emits PAGE_/SAME_PAGE/alignment keys; the visual column
    predicates agree with the bbox math."""
    from fonduer_spark.candidates_op import extract_candidates
    from fonduer_spark.data_model_utils import is_horz_aligned, same_page
    from fonduer_spark.featurize import featurize
    from fonduer_spark.lingual import SimpleParser
    from fonduer_spark.matchers import RegexMatchSpan
    from fonduer_spark.mention_spaces import MentionNgrams
    from fonduer_spark.mentions_op import (
        MENTION_COLUMNS, MENTION_SCHEMA, MentionSpec, iter_sentence_mentions,
        _fast_unigram_regex)
    from fonduer_spark.parse import ParseConfig, parse_document
    from fonduer_spark.sources import rewrite_hocr

    html = rewrite_hocr(HOCR_FIXTURE)
    cfg = ParseConfig(visual="hocr")
    rows = [r for r in parse_document("u", html, cfg, SimpleParser("."))
            if r["ctx_type"] == "sentence"]
    specs = [
        MentionSpec("part", MentionNgrams(n_min=1, n_max=1),
                    RegexMatchSpan(rgx=r"PN\d+[A-C]", ignore_case=False)),
        MentionSpec("temp", MentionNgrams(n_min=1, n_max=1),
                    RegexMatchSpan(rgx=r"\d+", ignore_case=False)),
    ]
    fasts = [_fast_unigram_regex(s) for s in specs]
    ms = [m for r in rows for m in iter_sentence_mentions(r, specs, fasts)]
    by_type = {m["mention_type"]: m for m in ms}
    part, temp = by_type["part"], by_type["temp"]
    assert (part["page"], part["left"], part["right"]) == (0, 70, 140)
    assert (temp["page"], temp["left"], temp["right"]) == (0, 60, 90)

    mdf = spark.createDataFrame(
        [tuple(m[c] for c in MENTION_COLUMNS) for m in ms], MENTION_SCHEMA)
    cands = extract_candidates(mdf, "pt", "part", "temp")
    got = cands.select(
        same_page().alias("sp"), is_horz_aligned().alias("ha")).first()
    assert got.sp  # both on page 0
    assert not got.ha  # different lines -> not horizontally aligned
    keys = {k for r in featurize(
        cands, libs=("visual", "tabular", "structural")).collect()
        for k in r.keys}
    assert "e0_PAGE_[0]" in keys and "e1_PAGE_[0]" in keys
    assert "SAME_PAGE" in keys
    assert "HORZ_ALIGNED" not in keys
    assert "VERT_ALIGNED" in keys  # x-ranges overlap (70-140 vs 60-90)


def test_visual_ngram_helpers(spark):
    """with_horz_ngrams/with_vert_ngrams: bbox-aligned word vocabularies
    joined onto candidates (reference get_horz_ngrams/get_vert_ngrams)."""
    from fonduer_spark.candidates_op import extract_candidates
    from fonduer_spark.data_model_utils import with_horz_ngrams, with_vert_ngrams
    from fonduer_spark.lingual import SimpleParser
    from fonduer_spark.matchers import RegexMatchSpan
    from fonduer_spark.mention_spaces import MentionNgrams
    from fonduer_spark.mentions_op import (
        MENTION_COLUMNS, MENTION_SCHEMA, MentionSpec, iter_sentence_mentions,
        _fast_unigram_regex)
    from fonduer_spark.parse import (
        CONTEXT_COLUMNS, CONTEXT_SCHEMA, ParseConfig, parse_document)
    from fonduer_spark.sources import rewrite_hocr

    html = rewrite_hocr(HOCR_FIXTURE)
    cfg = ParseConfig(visual="hocr")
    rows = [r for r in parse_document("u", html, cfg, SimpleParser("."))
            if r["ctx_type"] == "sentence"]
    specs = [
        MentionSpec("part", MentionNgrams(n_min=1, n_max=1),
                    RegexMatchSpan(rgx=r"PN\d+[A-C]", ignore_case=False)),
        MentionSpec("temp", MentionNgrams(n_min=1, n_max=1),
                    RegexMatchSpan(rgx=r"\d+", ignore_case=False)),
    ]
    fasts = [_fast_unigram_regex(s) for s in specs]
    ms = [m for r in rows for m in iter_sentence_mentions(r, specs, fasts)]
    mdf = spark.createDataFrame(
        [tuple(m[c] for c in MENTION_COLUMNS) for m in ms], MENTION_SCHEMA)
    sdf = spark.createDataFrame(
        [tuple(r.get(c) for c in CONTEXT_COLUMNS) for r in rows],
        CONTEXT_SCHEMA)
    cands = extract_candidates(mdf, "pt", "part", "temp")
    # part (PN10A) is on line 1 (y 10..30): horz vocab = its line's words
    got = with_horz_ngrams(cands, sdf, slot="a_").select("a_horz_ngrams").first()
    assert set(got.a_horz_ngrams) == {"part", "pn10a"}
    # temp (85) is on line 2: horz vocab = line 2 words
    got = with_horz_ngrams(cands, sdf, slot="b_").select("b_horz_ngrams").first()
    assert set(got.b_horz_ngrams) == {"rated", "85", "stable", "now"}
    # vert: 85 at x 60..90 overlaps 'part' (10..60)? no (shrunk) — overlaps
    # the PN10A column? pn10a x 70..140 -> 60+1.5 <= 140-1.5 and
    # 70+1.5 <= 90-1.5 -> aligned; 'part' 10..60 vs 60..90: 60+1.5 > 60-1.5
    # -> not aligned
    got = with_vert_ngrams(cands, sdf, slot="b_").select("b_vert_ngrams").first()
    assert "pn10a" in got.b_vert_ngrams and "part" not in got.b_vert_ngrams
