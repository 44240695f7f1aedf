"""Label convention (0-shifted storage, ABSTAIN=-1), majority vote,
entity-level P/R/F1 (reference supervision/labeler.py:42-45,
utils_udf.py:196-203, tests/shared/hardware_utils.py:71-131)."""

import pandas as pd
from pyspark.sql import functions as F

from fonduer_spark.labeling import (
    apply_lfs,
    entity_level_prf1,
    label_keys,
    majority_vote_marginals,
    with_marginals,
)


def cands(spark):
    return spark.createDataFrame(
        [("c1", "t", "u1", 100), ("c2", "t", "u1", -40), ("c3", "t", "u2", 7)],
        "candidate_sid string, candidate_type string, url string, val int",
    )


def test_shift_convention_and_keys(spark):
    lfs = {
        "lf_pos": F.when(F.col("val") > 0, 1).otherwise(0),
        "lf_abstain": F.lit(-1),
    }
    labels = apply_lfs(cands(spark), lfs)
    rows = {r.candidate_sid: r for r in labels.collect()}
    assert rows["c1"].keys == ["lf_abstain", "lf_pos"]
    # stored = user + 1: ABSTAIN(-1) -> 0, FALSE(0) -> 1, TRUE(1) -> 2
    assert rows["c1"].values == [0, 2]
    assert rows["c2"].values == [0, 1]
    keys = {r.key: set(r.candidate_classes) for r in label_keys(labels).collect()}
    assert keys == {"lf_pos": {"t"}, "lf_abstain": {"t"}}


def test_majority_vote(spark):
    lfs = {
        "a": F.when(F.col("val") > 0, 1).otherwise(0),
        "b": F.when(F.col("val") > 50, 1).when(F.col("val") < 0, 0).otherwise(-1),
        "c": F.lit(1),
    }
    m = majority_vote_marginals(apply_lfs(cands(spark), lfs))
    probs = {r.candidate_sid: r.prob for r in m.collect()}
    assert probs["c1"] == 1.0            # votes (1,1,1)
    assert abs(probs["c2"] - 1 / 3) < 1e-9   # votes (0,0,1)
    assert probs["c3"] == 1.0            # votes (1,-,1) -> 2/2


def test_with_marginals_no_shuffle_columns(spark):
    lfs = {"a": F.when(F.col("val") > 0, 1).otherwise(0)}
    out = with_marginals(cands(spark), lfs)
    assert {"keys", "values", "prob"} <= set(out.columns)
    assert not [c for c in out.columns if c.startswith("_lf_")]


def test_pandas_lf(spark):
    lfs = {"plf": lambda pdf: pd.Series((pdf["val"] > 0).map({True: 1, False: 0}))}
    labels = apply_lfs(cands(spark), lfs)
    vals = {r.candidate_sid: r.values for r in labels.collect()}
    assert vals == {"c1": [2], "c2": [1], "c3": [2]}


def test_entity_level_prf1(spark):
    pred = spark.createDataFrame(
        [("x", "1"), ("y", "2"), ("z", "3")], "subj string, obj string")
    gold = spark.createDataFrame(
        [("x", "1"), ("y", "2"), ("w", "4")], "subj string, obj string")
    m = entity_level_prf1(pred, gold, ["subj", "obj"])
    assert m["tp"] == 2 and m["fp"] == 1 and m["fn"] == 1
    assert abs(m["precision"] - 2 / 3) < 1e-9
    assert abs(m["recall"] - 2 / 3) < 1e-9
