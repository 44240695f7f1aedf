"""Serving lifecycle (one-document classify), textual window LF helpers,
bucketed co-located joins."""

import pytest
from pyspark.sql import functions as F

from fonduer_spark.corpus import (
    PRED,
    n_rows,
    n_tables,
    part_code,
    render_page,
    temp_max,
    url_of,
)
from fonduer_spark.serve import build_default_model


def test_serving_model_matches_gold_per_doc():
    m = build_default_model()
    for i in (3, 7, 50):  # incl. a hot doc
        got = [(s, p, o) for s, p, o, _ in
               m.classify(url_of(i), render_page(i, "alpha beta"))]
        want = sorted({(part_code(i, t, r), PRED, str(temp_max(i, t, r)))
                       for t in range(n_tables(i))
                       for r in range(n_rows(i, t))})
        assert got == want


def test_serving_model_probabilities():
    m = build_default_model()
    got = m.classify(url_of(1), render_page(1, "x y"))
    assert got and all(pr == 1.0 for _, _, _, pr in got)


def test_serving_model_empty_doc():
    m = build_default_model()
    assert m.classify("u", "<html><body><p>no entities here.</p></body></html>") == []


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-co-locates the join: the
    plan contains no Exchange between the scans and the SortMergeJoin —
    the cluster-scale strategy for repeated joins on url/doc key."""
    import re

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb "
              f"LOCATION '{tmp_path}/warehouse'")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (docs.write.mode("overwrite").format("parquet")
         .bucketBy(8, "doc_id").sortBy("doc_id")
         .saveAsTable("bktdb.docs_a"))
    (docs.select("doc_id", F.length("text").alias("n")).write
         .mode("overwrite").format("parquet")
         .bucketBy(8, "doc_id").sortBy("doc_id")
         .saveAsTable("bktdb.docs_b"))
    a = spark.table("bktdb.docs_a")
    b = spark.table("bktdb.docs_b")
    # disable broadcast so the sort-merge path shows the bucket benefit
    # (at scale neither side fits in a broadcast)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "doc_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted")
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree
        # no hash-repartition Exchange: the bucketed layout co-locates keys
        assert len(re.findall(r"Exchange", tree)) == 0, tree
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_model_save_load_roundtrip(tmp_path):
    """save_model/load_model (reference fonduer_model packaging): the
    reloaded model — closures, compiled regexes and all — classifies a
    fresh document identically to the original."""
    from fonduer_spark.corpus import render_page, url_of
    from fonduer_spark.serve import build_default_model, load_model, save_model

    m = build_default_model()
    save_model(m, str(tmp_path / "model"))
    m2 = load_model(str(tmp_path / "model"))
    html = render_page(7, "gamma delta epsilon")
    assert m2.classify(url_of(7), html) == m.classify(url_of(7), html)
    assert m2.pred == m.pred and m2.candidate_type == m.candidate_type
    import pytest

    with pytest.raises(ValueError):
        import json, os
        bad = tmp_path / "bad"
        os.makedirs(bad)
        json.dump({"engine": "other"}, open(bad / "meta.json", "w"))
        load_model(str(bad))


def test_lf_helper_rowcol_and_percentile_columns(spark):
    """get_{min,max}_{row,col}_num and get_page_{vert,horz}_percentile
    (reference tabular.py:103-168, visual.py:295-381) as column expressions
    over a synthetic slot frame: extrema read the denormalized cell
    coordinates (null for non-tabular slots), percentiles divide the bbox
    edge by the Letter-page defaults."""
    from fonduer_spark.data_model_utils import (
        get_max_col_num, get_max_row_num, get_min_col_num, get_min_row_num,
        get_page_horz_percentile, get_page_vert_percentile)

    df = spark.createDataFrame(
        [(2, 2, 0, 1, 198, 153), (None, None, None, None, None, None)],
        "a_row_start int, a_row_end int, a_col_start int, a_col_end int, "
        "a_top int, a_left int",
    )
    out = df.select(
        get_min_row_num("a_").alias("rmin"),
        get_max_row_num("a_").alias("rmax"),
        get_min_col_num("a_").alias("cmin"),
        get_max_col_num("a_").alias("cmax"),
        get_page_vert_percentile("a_").alias("vp"),
        get_page_horz_percentile("a_").alias("hp"),
    ).collect()
    r0 = out[0]
    assert (r0.rmin, r0.rmax, r0.cmin, r0.cmax) == (2, 2, 0, 1)
    assert r0.vp == 198 / 792.0 and r0.hp == 153 / 612.0  # 0.25
    r1 = out[1]
    assert all(v is None for v in r1)
    # custom page dims flow through
    a4 = df.select(get_page_vert_percentile(
        "a_", page_width=595, page_height=842).alias("vp")).first()
    assert a4.vp == 198 / 842.0


def test_lf_helper_spanning_cell_extrema(spark):
    """A colspan-resolved cell's mention reports col_end > col_start through
    get_max_col_num (reference tests/utils/data_model_utils/test_tabular.py:
    127-139: spanning cells yield distinct min/max)."""
    from fonduer_spark.corpus import load_docs
    from fonduer_spark.data_model_utils import get_max_col_num, get_min_col_num
    from fonduer_spark.matchers import DictionaryMatch
    from fonduer_spark.mention_spaces import MentionNgrams
    from fonduer_spark.mentions_op import MentionSpec, extract_mentions_fused

    html = (
        "<html><body><table>"
        "<tr><th>H0</th><th>H1</th><th>H2</th></tr>"
        '<tr><td colspan="2">nominal value</td><td>ok</td></tr>'
        "</table></body></html>"
    )
    docs = load_docs(spark, "/root/testdata/sf0.001", max_docs=1)
    specs = [MentionSpec("word", MentionNgrams(n_min=1, n_max=1),
                         DictionaryMatch(d=["nominal", "ok"]))]
    m = extract_mentions_fused(docs, specs, render=lambda i, text: html)
    rows = {r.span: (r.cmin, r.cmax) for r in m.select(
        F.col("span_text").alias("span"),
        get_min_col_num("").alias("cmin"),
        get_max_col_num("").alias("cmax"),
    ).collect()}
    assert rows["nominal"] == (0, 1)  # colspan=2 cell spans cols 0-1
    assert rows["ok"] == (2, 2)


def test_lf_helper_reference_parity_stubs():
    """The five visual helpers that are TODO stubs in the reference
    (visual.py:260-287) return None here too — importable, documented."""
    from fonduer_spark.data_model_utils import (
        get_vert_ngrams_center, get_vert_ngrams_left, get_vert_ngrams_right,
        get_visual_distance, get_visual_header_ngrams)

    assert get_vert_ngrams_left() is None
    assert get_vert_ngrams_right() is None
    assert get_vert_ngrams_center() is None
    assert get_visual_header_ngrams(axis="horz") is None
    assert get_visual_distance(axis="vert") is None


def test_min_range_diff_reference_vectors():
    """The reference's full test-vector table for _min_range_diff
    (tests/utils/test_utils_table.py:7-25) plus the min_row/col_diff
    wrappers."""
    from fonduer_spark.data_model_utils import (
        min_col_diff, min_range_diff, min_row_diff)

    assert min_range_diff((0, 5), (0, 5)) == 0
    assert min_range_diff((1, 5), (3, 6)) == 0
    assert min_range_diff((1, 2), (2, 3)) == 0
    assert min_range_diff((3, 6), (1, 4)) == 0
    assert min_range_diff((1, 2), (3, 4)) == 1
    assert min_range_diff((3, 4), (1, 2)) == 1
    assert min_range_diff((3, 4), (1, 2), absolute=False) == 1
    assert min_range_diff((1, 2), (3, 4), absolute=False) == -1
    assert min_range_diff((0, 5), (0, 5), (0, 5)) == 0
    assert min_range_diff((1, 5), (3, 6), (2, 4)) == 0
    assert min_range_diff((3, 4), (1, 2), (4, 5)) == 1
    assert min_range_diff((1, 2), (3, 4), (5, 6), absolute=False) == -1
    assert min_range_diff((1, 2), (3, 4), (4, 6), absolute=False) == 0
    assert min_range_diff((1, 2), (3, 4), (4, 6), (5, 8),
                          absolute=False) == 0
    assert min_row_diff([(1, 2), (3, 4)]) == 1
    assert min_col_diff([(0, 5), (2, 3)], absolute=False) == 0


def test_confusion_matrix_and_label_shift():
    """Reference learning/utils confusion_matrix (tests/learning/
    test_utils.py) and utils_udf shift/unshift roundtrip (tests/utils/
    test_utils_udf.py:9-26, scipy-free)."""
    import numpy as np

    from fonduer_spark.learning import (
        confusion_matrix, shift_label_matrix, unshift_label_matrix)

    pred, gold = {1, 2, 3}, {1, 2, 4}
    assert confusion_matrix(pred, gold) == ({1, 2}, {3}, {4})
    assert confusion_matrix([3, 2, 1], gold) == ({1, 2}, {3}, {4})
    assert confusion_matrix({"1", "2", "3"}, {"1", "2", "4"}) == (
        {"1", "2"}, {"3"}, {"4"})

    L = np.array([[-1, 0], [1, -1]])
    L_shifted = shift_label_matrix(L)
    assert np.array_equal(L, unshift_label_matrix(L_shifted))
    assert np.count_nonzero(L_shifted) == 2


def test_general_utils_surface(spark):
    """The reference's small public helper surface (utils/utils.py,
    utils_udf.get_docs_from_split): camel_to_under naming, root-major
    tokens_to_ngrams order, get_as_dict over Spark Rows, and the per-split
    doc semi-join."""
    from fonduer_spark.utils import (
        camel_to_under, get_as_dict, get_docs_from_split, tokens_to_ngrams)

    assert camel_to_under("PartTempVisual") == "part_temp_visual"
    assert camel_to_under("HTMLDocPreprocessor") == "html_doc_preprocessor"
    # root-major order: all lengths at root 0 before root 1
    assert list(tokens_to_ngrams(["a", "b", "c"], n_max=2)) == [
        "a", "a b", "b", "b c", "c"]
    assert list(tokens_to_ngrams(["A", "B"], lower=True, delim="_")) == [
        "a", "a_b", "b"]
    row = spark.createDataFrame([(1, "x")], "a int, b string").first()
    assert get_as_dict(row) == {"a": 1, "b": "x"}
    assert get_as_dict({"k": 1}) == {"k": 1}

    docs = spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u3", 30)], "url string, n int")
    cands = spark.createDataFrame(
        [("u1", 0), ("u1", 0), ("u3", 1)], "url string, split int")
    got = {r.url for r in get_docs_from_split(docs, cands, split=0).collect()}
    assert got == {"u1"}
    got1 = {r.url for r in get_docs_from_split(docs, cands, split=1).collect()}
    assert got1 == {"u3"}


def test_with_aligned_ngrams(spark):
    """get_aligned_ngrams as a vocabulary join (reference tabular.py:
    403-435): the slot's aligned vocabulary is the union of every cell in
    its row OR column; non-tabular slots stay null."""
    from fonduer_spark.candidates_op import extract_candidates, same_row
    from fonduer_spark.corpus import (
        load_docs, make_web_pages, n_rows, part_code, temp_max, temp_min,
        url_of)
    from fonduer_spark.data_model_utils import with_aligned_ngrams
    from fonduer_spark.mentions_op import extract_mentions_fused
    from fonduer_spark.parse import contexts_of, parse_webpages
    from fonduer_spark.pipeline import default_mention_specs

    sf = "/root/testdata/sf0.001"
    docs = load_docs(spark, sf, max_docs=2)
    mentions = extract_mentions_fused(docs, default_mention_specs())
    cands = extract_candidates(mentions, "part_temp", "part", "temp",
                               throttler=same_row, throttler_kind="column")
    sentences = contexts_of(
        parse_webpages(make_web_pages(spark, sf, max_docs=2)), "sentence")
    out = with_aligned_ngrams(cands, sentences, slot="b_")
    i, t, r = 1, 0, 0
    row = [x for x in out.collect()
           if x.url == url_of(i) and x.b_span_text == str(temp_max(i, t, r))
           and x.a_span_text == part_code(i, t, r)][0]
    vocab = set(row.b_aligned_ngrams)
    # row-aligned: the row's part and tmin; col-aligned: the column header
    # word 'max' and every row's tmax in table 0
    assert part_code(i, t, r).lower() in vocab
    assert str(temp_min(i, t, r)) in vocab
    assert "max" in vocab
    for rr in range(n_rows(i, t)):
        assert str(temp_max(i, t, rr)) in vocab
    # not in vocab: the OTHER column's header word from a different axis
    assert "part" not in vocab
