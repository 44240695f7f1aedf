"""Multi-valued candidate classes + k-ary labeling (reference
candidate_subclass values/cardinality, candidates/models/candidate.py:107-136,
and the labeler's value-space mapping, supervision/labeler.py:436-465)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fonduer_spark.api import CandidateSpec, LabelModel, candidate_subclass
from fonduer_spark.labeling import (
    apply_lfs,
    majority_vote_marginals_k,
    ovr_triplet_label_model,
    score_with_label_model_k,
)

VALUES = ("low", "mid", "high")


# ---------------------------------------------------------------- spec


def test_candidate_subclass_defaults_binary():
    spec = candidate_subclass("McDefault", ["a", "b"])
    assert spec.cardinality == 2
    assert spec.values == (True, False)
    assert spec.nullables == (False, False)
    assert spec.table_name == "mc_default"


def test_candidate_subclass_values_fix_cardinality():
    spec = candidate_subclass("McVals", ["a", "b"], values=list(VALUES))
    assert spec.cardinality == 3 and spec.values == VALUES


def test_candidate_subclass_validation_parity():
    # cardinality/values length mismatch (reference candidate.py:114-115)
    with pytest.raises(ValueError, match="match cardinality"):
        candidate_subclass("McBad1", ["a", "b"], cardinality=2,
                           values=["x", "y", "z"])
    # None is protected (ABSTAIN)
    with pytest.raises(ValueError, match="protected"):
        candidate_subclass("McBad2", ["a", "b"], values=["x", None])
    # raw ints rejected; bools allowed (bool is an int subclass)
    with pytest.raises(ValueError, match="consecutive integers"):
        candidate_subclass("McBad3", ["a", "b"], values=[1, 2, 3])
    # cardinality alone fills consecutive ints
    spec = candidate_subclass("McInts", ["a", "b"], cardinality=4)
    assert spec.values == (0, 1, 2, 3)
    # nullables arity must match args
    with pytest.raises(ValueError, match="nullables"):
        candidate_subclass("McBad4", ["a", "b"], nullables=[True])


def test_candidate_subclass_registry_conflict():
    first = candidate_subclass("McReg", ["a", "b"], values=list(VALUES))
    assert candidate_subclass("McReg", ["a", "b"],
                              values=list(VALUES)) is first
    with pytest.raises(ValueError, match="incompatible"):
        candidate_subclass("McReg", ["a", "b"], cardinality=2)


def test_candidate_extractor_accepts_spec(spark):
    from fonduer_spark.api import CandidateExtractor

    spec = candidate_subclass("McPair", ["part", "temp"],
                              nullables=[False, True])
    ce = CandidateExtractor(spark, [spec])
    assert ce.types == [("McPair", "part", "temp")]
    assert ce.nullables == [(False, True)]
    with pytest.raises(ValueError, match="binary"):
        CandidateExtractor(
            spark, [candidate_subclass("McTri", ["a", "b", "c"])])


# ---------------------------------------------------------------- mapping


def cands(spark, n=30):
    rows = [(f"c{i}", "t", f"u{i % 5}", i) for i in range(n)]
    return spark.createDataFrame(
        rows,
        "candidate_sid string, candidate_type string, url string, v int")


def band(v):
    return F.when(v < 10, "low").when(v < 20, "mid").otherwise("high")


def test_value_space_mapping(spark):
    v = F.col("v")
    lfs = {
        "lf_val": band(v),                              # value space
        "lf_abst": F.when(v < 0, "low"),                # always NULL
        "lf_int": F.when(v % 2 == 0, 2).otherwise(0),   # already-mapped int
    }
    labels = apply_lfs(cands(spark, 5), lfs, values=VALUES)
    rows = {r.candidate_sid: dict(zip(r.keys, r.values))
            for r in labels.collect()}
    # value -> 1-based index; NULL -> 0; int -> label + 1
    assert rows["c0"] == {"lf_val": 1, "lf_abst": 0, "lf_int": 3}
    assert rows["c1"] == {"lf_val": 1, "lf_abst": 0, "lf_int": 1}


def test_unknown_value_raises(spark):
    with pytest.raises(Exception, match="Can't parse label value"):
        apply_lfs(cands(spark, 3), {"bad": F.lit("nope")},
                  values=VALUES).collect()


def test_out_of_range_int_raises(spark):
    """An already-mapped int vote outside [-1, k-1] would silently leak
    probability mass (counted in n_votes, in no class) — both the column
    and the pandas branch fail fast instead."""
    with pytest.raises(Exception, match="outside"):
        apply_lfs(cands(spark, 3), {"bad": F.lit(7)},
                  values=VALUES).collect()
    with pytest.raises(Exception, match="outside"):
        apply_lfs(cands(spark, 3),
                  {"bad": lambda pdf: pdf["v"] * 0 + 7},
                  values=VALUES).collect()
    # boundary values still pass: -1 (abstain) and k-1
    ok = apply_lfs(cands(spark, 2),
                   {"hi": F.lit(2), "ab": F.lit(-1)}, values=VALUES)
    r = ok.collect()[0]
    assert dict(zip(r.keys, r.values)) == {"hi": 3, "ab": 0}


def test_registry_nullables_conflict():
    from fonduer_spark.api import candidate_subclass

    candidate_subclass("McNulReg", ["a", "b"], nullables=[False, True])
    with pytest.raises(ValueError, match="incompatible"):
        candidate_subclass("McNulReg", ["a", "b"])


def test_pandas_lf_value_space(spark):
    def plf(pdf):
        return pdf["v"].map(lambda x: None if x == 0 else
                            ("low" if x < 10 else "mid"))

    labels = apply_lfs(cands(spark, 12), {"plf": plf}, values=VALUES)
    rows = {r.candidate_sid: r.values[0] for r in labels.collect()}
    assert rows["c0"] == 0 and rows["c5"] == 1 and rows["c11"] == 2


def test_pandas_lf_unknown_value_raises(spark):
    def plf(pdf):
        return pdf["v"].map(lambda x: "bogus")

    with pytest.raises(Exception, match="Can't parse label value"):
        apply_lfs(cands(spark, 3), {"plf": plf}, values=VALUES).collect()


# ---------------------------------------------------------------- majority


def test_majority_vote_k(spark):
    v = F.col("v")
    lfs = {
        "a": band(v),
        "b": F.when(v < 15, "low").otherwise("high"),
        "c": F.when(v % 7 == 0, F.lit(None).cast("string")).otherwise(band(v)),
    }
    labels = apply_lfs(cands(spark, 30), lfs, values=VALUES)
    mv = majority_vote_marginals_k(labels, 3, values=VALUES)
    rows = {r.candidate_sid: r for r in mv.collect()}
    # v=0: votes (low, low, ABSTAIN) -> 2/2 low
    assert rows["c0"].pred_value == "low" and rows["c0"].n_votes == 2
    assert rows["c0"].probs == [1.0, 0.0, 0.0]
    # v=16: votes (mid, high, mid) -> mid 2/3
    assert rows["c16"].pred_value == "mid"
    assert abs(rows["c16"].probs[1] - 2 / 3) < 1e-12
    # v=12: votes (mid, low, mid) -> mid
    assert rows["c12"].pred_value == "mid"


def test_majority_vote_k_tiebreak_and_all_abstain(spark):
    labels = apply_lfs(
        cands(spark, 2),
        {"a": F.lit("low"), "b": F.lit("mid"),
         "c": F.lit(None).cast("string")},
        values=VALUES)
    mv = majority_vote_marginals_k(labels, 3, values=VALUES)
    r = mv.collect()[0]
    assert r.pred_idx == 0 and r.pred_value == "low"  # lowest-index tiebreak
    allab = apply_lfs(cands(spark, 2),
                      {"a": F.lit(None).cast("string")}, values=VALUES)
    r = majority_vote_marginals_k(allab, 3, values=VALUES).collect()[0]
    assert r.n_votes == 0 and r.probs == [1 / 3, 1 / 3, 1 / 3]


def test_majority_vote_k_cardinality_mismatch(spark):
    labels = apply_lfs(cands(spark, 2), {"a": F.lit("low")}, values=VALUES)
    with pytest.raises(ValueError, match="match cardinality"):
        majority_vote_marginals_k(labels, 2, values=VALUES)


# ---------------------------------------------------------------- OvR model


def _kary_fixture(spark, n=3000):
    """3-class fixture with conditionally-independent LF errors of KNOWN
    rates: gold = i % 3; each LF rotates the class when its own independent
    residue fires (p_err 1/13, 1/5, 1/3) — the CRT makes the error
    indicators pairwise independent and label-independent. lf2 and lf3
    rotate in OPPOSITE directions (+1 vs +2) so simultaneous errors
    disagree instead of ganging up on one wrong class."""
    rows = []
    for i in range(n):
        gold = i % 3
        def rot(g, fire, step=1):
            return (g + step) % 3 if fire else g
        rows.append((f"c{i}", "t", "u", gold,
                     rot(gold, i % 13 == 0),
                     rot(gold, i % 5 == 0),
                     rot(gold, (i // 3) % 3 == 0, step=2)))
    return spark.createDataFrame(
        rows, "candidate_sid string, candidate_type string, url string, "
              "gold int, l1 int, l2 int, l3 int")


def _kary_lfs():
    vals = F.array(*[F.lit(v) for v in VALUES])
    return {f"lf{j}": F.element_at(vals, F.col(f"l{j}") + 1)
            for j in (1, 2, 3)}


def test_ovr_triplet_recovers_accuracies(spark):
    df = _kary_fixture(spark)
    model = ovr_triplet_label_model(df, _kary_lfs(), 3, values=VALUES)
    assert sorted(model) == [0, 1, 2]
    for c in range(3):
        accs = {n: m["accuracy"] for n, m in model[c].items()}
        # true per-LF multiclass accuracies ~ (12/13, 4/5, 2/3); in the
        # OvR ±1 space accuracy = P(sign correct) which is >= those
        assert accs["lf1"] > accs["lf2"] > accs["lf3"], accs
        assert accs["lf1"] > 0.9 and accs["lf3"] < 0.9


def test_ovr_scoring_beats_individual_lfs(spark):
    df = _kary_fixture(spark)
    lfs = _kary_lfs()
    model = ovr_triplet_label_model(df, lfs, 3, values=VALUES)
    scored = score_with_label_model_k(df, lfs, model, values=VALUES)
    assert {"probs", "pred_idx", "pred_value", "keys", "values"} <= set(
        scored.columns)
    acc = scored.select(
        F.avg((F.col("pred_idx") == F.col("gold")).cast("int")).alias("a")
    ).collect()[0].a
    # lf3 alone is ~2/3 accurate; the weighted combination must beat the
    # best single LF's error floor substantially
    assert acc > 0.92, acc
    # probs normalized
    s = scored.select(F.aggregate("probs", F.lit(0.0),
                                  lambda a, x: a + x).alias("s")).collect()
    assert all(abs(r.s - 1.0) < 1e-9 for r in s)


def test_ovr_needs_three_lfs(spark):
    df = _kary_fixture(spark, 30)
    with pytest.raises(ValueError, match=">= 3"):
        ovr_triplet_label_model(df, {"a": F.lit("low"), "b": F.lit("mid")},
                                3, values=VALUES)


# ---------------------------------------------------------------- facade


def test_label_model_facade_k3(spark):
    df = _kary_fixture(spark, 600)
    lm = LabelModel(spark, cardinality=3, values=VALUES)
    lm.fit(df, _kary_lfs())
    w = lm.get_weights()
    assert sorted(w) == [0, 1, 2] and set(w[0]) == {"lf1", "lf2", "lf3"}
    out = lm.predict_proba(df)
    assert "pred_value" in out.columns
    assert set(r.pred_value for r in
               out.select("pred_value").distinct().collect()) <= set(VALUES)


def test_label_model_facade_from_spec(spark):
    spec = candidate_subclass("McFacade", ["a", "b"], values=list(VALUES))
    lm = LabelModel(spark, spec)
    assert lm.cardinality == 3 and lm.values == VALUES


def test_kary_majority_property_sweep(spark):
    """Property sweep (one Spark job over many hypothesis-style random
    vote tables, seeded): for arbitrary stored votes in {0..k}, the
    engine's per-class counts/probs/argmax equal a python model — counts
    from equality, probs = count/n_votes (uniform 1/k when all abstain),
    argmax lowest-index on ties."""
    import random

    rng = random.Random(7)
    k = 4
    cases = []
    for ci in range(300):
        n_lfs = rng.randint(1, 6)
        votes = [rng.randint(0, k) for _ in range(n_lfs)]
        cases.append((f"c{ci}", "t", "u", votes))
    labels = spark.createDataFrame(
        cases, "candidate_sid string, candidate_type string, url string, "
               "values array<int>")
    labels = labels.withColumn(
        "keys", F.transform(F.col("values"), lambda v: F.lit("lf")))
    got = {r.candidate_sid: r for r in
           majority_vote_marginals_k(labels, k).collect()}
    for cid, _, _, votes in cases:
        nv = sum(v != 0 for v in votes)
        counts = [sum(v == c + 1 for v in votes) for c in range(k)]
        probs = ([c / nv for c in counts] if nv else [1 / k] * k)
        pred = counts.index(max(counts))
        r = got[cid]
        assert r.n_votes == nv, cid
        assert r.pred_idx == pred, cid
        assert all(abs(a - b) < 1e-12 for a, b in zip(r.probs, probs)), cid


def test_label_model_binary_backcompat(spark):
    df = spark.createDataFrame(
        [(f"c{i}", "t", "u", i) for i in range(200)],
        "candidate_sid string, candidate_type string, url string, v int")
    v = F.col("v")
    lfs = {"a": F.when(v % 2 == 0, 1).otherwise(0),
           "b": F.when(v % 3 == 0, 0).otherwise(1),
           "c": F.when(v % 2 == 0, 1).otherwise(0)}
    lm = LabelModel(spark).fit(df, lfs)
    w = lm.get_weights()
    assert set(w) == {"a", "b", "c"}          # binary: {lf: acc}
    assert "prob" in lm.predict_proba(df).columns
    with pytest.raises(ValueError, match="cardinality"):
        LabelModel(spark, cardinality=1)
