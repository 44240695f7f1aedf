"""One-pass column profiling census (fonduer_spark/functions/profiling.py)."""

import pytest
from pyspark.sql import functions as F

from fonduer_spark.functions.profiling import profile_columns


def frame(spark):
    rows = [
        (1, "alpha", None),
        (2, "beta", 10),
        (3, "alpha", 20),
        (4, None, 20),
        (5, "gamma", None),
    ]
    return spark.createDataFrame(rows, "id long, name string, score int")


def test_profile_census_exact(spark):
    out = {r.col_name: r for r in
           profile_columns(frame(spark), ["id", "name", "score"]).collect()}
    assert set(out) == {"id", "name", "score"}

    i = out["id"]
    assert (i.n_rows, i.n_null, i.n_distinct) == (5, 0, 5)
    assert i.sum_len == 5  # "1".."5"
    assert (i.lex_min, i.lex_max) == ("1", "5")

    n = out["name"]
    assert (n.n_rows, n.n_null, n.n_distinct) == (5, 1, 3)
    assert n.sum_len == len("alpha") * 2 + len("beta") + len("gamma")
    assert (n.lex_min, n.lex_max) == ("alpha", "gamma")

    s = out["score"]
    assert (s.n_rows, s.n_null, s.n_distinct) == (5, 2, 2)
    assert s.sum_len == 6  # "10" "20" "20"
    assert (s.lex_min, s.lex_max) == ("10", "20")


def test_profile_all_null_column_and_guards(spark):
    d = frame(spark).withColumn("empty", F.lit(None).cast("string"))
    e = {r.col_name: r for r in
         profile_columns(d, ["empty"]).collect()}["empty"]
    assert (e.n_rows, e.n_null, e.n_distinct, e.sum_len) == (5, 5, 0, 0)
    assert e.lex_min is None and e.lex_max is None
    with pytest.raises(ValueError, match="at least one"):
        profile_columns(d, [])
    with pytest.raises(ValueError, match="not in frame"):
        profile_columns(d, ["nope"])


def test_profile_plan_two_level_no_expand(spark):
    # the census must be the melt + two-level aggregation, not the
    # multi-countDistinct plan: no Catalyst Expand, no single-partition
    # exchange, and map-side partial aggregation present (two
    # HashAggregate levels around each shuffle)
    df = profile_columns(frame(spark), ["id", "name", "score"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "Exchange SinglePartition" not in plan
    # two aggregation levels, each with a map-side partial pass (the
    # final level plans as SortAggregate for the string min/max)
    assert plan.count("Aggregate(") >= 4
    assert "partial_count" in plan and "partial_sum" in plan
