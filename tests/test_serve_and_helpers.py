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
