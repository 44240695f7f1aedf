"""Unit tests for fonduer_spark.functions.analytics and
dedup.set_similarity_join: golden values on tiny synthetic frames, a
brute-force completeness check for the prefix-filtered set-similarity
join, and numpy parity for the deterministic Pearson kernel."""

import datetime as dt
import itertools

import numpy as np
import pytest

from pyspark.sql import functions as F

from fonduer_spark.functions import analytics as an
from fonduer_spark.functions import dedup as dd


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def events(spark):
    # u1 completes the full funnel in order; u2 purchases BEFORE clicking
    # (must not count at stage 2); u3 views only; u4 never views (must
    # not enter the funnel even though it clicks and purchases).
    rows = [
        (1, 10, _ts(1, 9), "view", 1.0),
        (2, 10, _ts(1, 10), "click", 2.0),
        (3, 10, _ts(1, 11), "purchase", 3.0),
        (4, 20, _ts(1, 9), "view", 1.0),
        (5, 20, _ts(1, 10), "purchase", 2.0),
        (6, 20, _ts(1, 11), "click", 3.0),
        (7, 30, _ts(8, 9), "view", 1.0),
        (8, 40, _ts(1, 9), "click", 1.0),
        (9, 40, _ts(1, 10), "purchase", 2.0),
        # u10: second-week activity for cohort retention
        (10, 10, _ts(8, 9), "view", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double")


def test_funnel_strict_order_and_entry(events):
    out = {r["step"]: (r["stage"], r["n_users"])
           for r in an.funnel(events, ["view", "click", "purchase"])
           .collect()}
    # u1,u2,u3,u10-as-u10? users who viewed: 10,20,30 -> 3
    assert out["view"] == (0, 3)
    # clicked strictly after first view: u10(u1's user 10? user 10 clicked
    # at day1 10:00 after 9:00 view) and u20 (click day1 11:00 after view)
    assert out["click"] == (1, 2)
    # purchase strictly after the qualifying click: only user 10
    assert out["purchase"] == (2, 1)


def test_funnel_requires_steps(events):
    with pytest.raises(ValueError):
        an.funnel(events, [])


def test_cohort_retention_cells(events):
    cells = {(r["cohort_week"], r["week_offset"]): r["n_users"]
             for r in an.cohort_retention(events).collect()}
    w1 = dt.datetime(2024, 1, 1)  # Monday
    w2 = dt.datetime(2024, 1, 8)
    # users 10,20,40 first-touch in week 1; user 30 in week 2
    assert cells[(w1, 0)] == 3
    assert cells[(w1, 1)] == 1  # user 10 active again in week 2
    assert cells[(w2, 0)] == 1  # user 30's own cohort
    assert set(cells) == {(w1, 0), (w1, 1), (w2, 0)}


def test_event_transitions_counts_and_probs(events):
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in an.event_transitions(events).collect()}
    # user 10: view->click->purchase->(week2)view; user 20:
    # view->purchase->click; user 40: click->purchase
    assert out[("view", "click")][0] == 1
    assert out[("view", "purchase")][0] == 1
    assert out[("click", "purchase")] == (2, 1.0)
    assert out[("purchase", "view")][0] == 1
    assert out[("purchase", "click")][0] == 1
    assert out[("view", "click")][1] == 0.5
    assert out[("purchase", "view")][1] == 0.5


def test_basket_pairs_support_confidence_and_cap(spark):
    rows = [(1, "a"), (1, "b"), (1, "a"),   # dup (1,a) must collapse
            (2, "a"), (2, "b"), (2, "c"),
            (3, "a"), (3, "b"),
            (4, "x"), (4, "y"), (4, "z"), (4, "w")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["item_a"], r["item_b"]): (r["n_pairs"], r["n_a"], r["conf"])
           for r in an.basket_pairs(df, "b", "i", min_support=2).collect()}
    assert out[("a", "b")] == (3, 3, 1.0)
    assert ("a", "c") not in out  # support 1 < 2
    # max_basket_items drops basket 4 (4 items) before the self-join
    capped = an.basket_pairs(df, "b", "i", min_support=1,
                             max_basket_items=3).collect()
    assert all(r["item_a"] in ("a", "b", "c") for r in capped)


def test_grouped_pearson_matches_numpy(spark):
    rng = [(g, float(i % 7 + g), float((i * 3) % 11) + 0.25 * (i % 4))
           for g in (1, 2) for i in range(40)]
    df = spark.createDataFrame(rng, "g int, x double, y double")
    out = {r["g"]: r["corr"]
           for r in an.grouped_pearson(
               df, "x", "y", ["g"], x_scale=100, y_scale=100).collect()}
    for g in (1, 2):
        xs = np.array([r[1] for r in rng if r[0] == g])
        ys = np.array([r[2] for r in rng if r[0] == g])
        # the kernel quantizes to 1/100ths, so compare on the quantized data
        ref = np.corrcoef(np.round(xs * 100), np.round(ys * 100))[0, 1]
        assert abs(out[g] - ref) < 1e-9


def test_grouped_pearson_perfect_correlation(spark):
    df = spark.createDataFrame(
        [(1, float(i), 2.0 * i + 3) for i in range(10)],
        "g int, x double, y double")
    [row] = an.grouped_pearson(df, "x", "y", ["g"]).collect()
    assert row["corr"] == 1.0 and row["n"] == 10


def _brute_force_pairs(sets, threshold):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(sa & sb)
        if inter and round(inter / (len(sa) + len(sb) - inter), 6) >= threshold:
            out.add((ia, ib))
    return out


def test_set_similarity_join_completeness_vs_brute_force(spark):
    # deterministic synthetic docs over a small vocabulary: plenty of
    # borderline pairs around the threshold, so a prefix-filter bug
    # (false negative) would be caught by the exact brute-force set
    vocab = [f"w{k}" for k in range(12)]
    docs = [(i, " ".join(vocab[j] for j in range(12) if (i >> (j % 6)) & 1
             or (i + j) % 5 == 0))
            for i in range(1, 41)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    thr = 0.5
    got = {(r["a"], r["b"]): r["inter"]
           for r in dd.set_similarity_join(
               df, threshold=thr, shingle_n=None).collect()}
    sets = {i: set(t.split()) for i, t in docs if t.strip()}
    expect = _brute_force_pairs(sets, thr)
    assert set(got) == expect
    for (a, b), inter in got.items():
        assert inter == len(sets[a] & sets[b])


def test_set_similarity_join_shingles_match_jaccard_kernel(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different words here entirely unrelated tokens"),
        (4, ""),  # empty doc must be dropped, not crash
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = dd.set_similarity_join(df, threshold=0.25, shingle_n=3).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, 2)]
    # 7 shingles each, 6 shared -> J = 6/8
    assert rows[0]["inter"] == 6 and rows[0]["jaccard"] == 0.75
