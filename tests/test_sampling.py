"""Deterministic sampling / mixing / sequence packing
(fonduer_spark/functions/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from fonduer_spark.functions.sampling import (
    deterministic_sample,
    pack_token_stream,
    stratified_sample,
    weighted_mix,
)


def docs(spark, n=400):
    rows = [(i, " ".join(f"w{j}" for j in range(i % 7)),
             ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _py_keep(i, salt, rate):
    h = int(hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8], 16)
    return h / 2**32 < rate


def test_sample_matches_reference_hash_and_is_stable(spark):
    d = docs(spark)
    got = {r.doc_id for r in
           deterministic_sample(d, 0.3, salt="s1").collect()}
    want = {i for i in range(400) if _py_keep(i, "s1", 0.3)}
    assert got == want
    # partitioning-independent: same kept set at any layout
    got2 = {r.doc_id for r in
            deterministic_sample(d.repartition(17), 0.3, salt="s1").collect()}
    assert got2 == got
    # different salt => different (but deterministic) set
    got3 = {r.doc_id for r in
            deterministic_sample(d, 0.3, salt="s2").collect()}
    assert got3 != got
    # roughly the requested rate
    assert 0.2 < len(got) / 400 < 0.4
    with pytest.raises(ValueError, match="rate"):
        deterministic_sample(d, 1.5)


def test_stratified_rates(spark):
    d = docs(spark)
    out = stratified_sample(d, "lang", {"en": 1.0, "de": 0.0},
                            salt="s", default_rate=0.5)
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by.get("en", ())) == len([i for i in range(400) if i % 3 == 0])
    assert "de" not in by                     # rate 0.0 drops the stratum
    fr = {i for i in range(400) if i % 3 == 2 and _py_keep(i, "s", 0.5)}
    assert by["fr"] == fr                     # default rate applies
    with pytest.raises(ValueError, match="stratum"):
        stratified_sample(d, "lang", {"en": 2.0})


def test_weighted_mix_tags_and_rates(spark):
    a = docs(spark, 100)
    b = docs(spark, 100)
    out = weighted_mix([(a, 1.0, "web"), (b, 0.2, "ref")], salt="m")
    rows = out.collect()
    tags = {r.mix_source for r in rows}
    assert tags == {"web", "ref"}
    n_web = sum(r.mix_source == "web" for r in rows)
    n_ref = sum(r.mix_source == "ref" for r in rows)
    assert n_web == 100
    assert n_ref == len(
        {i for i in range(100) if _py_keep(i, "m:ref", 0.2)})
    with pytest.raises(ValueError, match="source"):
        weighted_mix([])


def test_pack_matches_sequential_prefix(spark):
    """The distributed two-phase prefix sum equals the sequential python
    layout exactly, across a bucket_size that forces many buckets."""
    d = docs(spark)
    out = {r.doc_id: (r.n_tokens, r.start_offset, r.bin_id, r.bin_offset)
           for r in pack_token_stream(d, capacity=10,
                                      bucket_size=37).collect()}
    acc = 0
    for i in range(400):
        n = i % 7
        assert out[i] == (n, acc, acc // 10, acc % 10), i
        acc += n
    # partitioning-independent
    out2 = {r.doc_id: (r.n_tokens, r.start_offset, r.bin_id, r.bin_offset)
            for r in pack_token_stream(d.repartition(13), capacity=10,
                                       bucket_size=37).collect()}
    assert out2 == out
    with pytest.raises(ValueError, match="capacity"):
        pack_token_stream(d, capacity=0)


def test_pack_property_sweep(spark):
    """Property sweep: random token counts (incl. zeros and empty-text
    docs), random capacity/bucket_size — the distributed layout equals the
    sequential python prefix sum for every doc."""
    import random

    rng = random.Random(11)
    for trial in range(3):
        n = rng.randint(1, 150)
        cap = rng.randint(1, 50)
        bs = rng.choice([1, 3, 10, 1000])
        counts = [rng.randint(0, 20) for _ in range(n)]
        d = spark.createDataFrame(
            [(i, " ".join("w" for _ in range(c)))
             for i, c in enumerate(counts)],
            "doc_id long, text string")
        got = {r.doc_id: (r.n_tokens, r.start_offset, r.bin_id,
                          r.bin_offset)
               for r in pack_token_stream(d, capacity=cap,
                                          bucket_size=bs).collect()}
        acc = 0
        for i, c in enumerate(counts):
            assert got[i] == (c, acc, acc // cap, acc % cap), (trial, i)
            acc += c


def test_pack_plan_has_no_global_window(spark):
    """Scale assertion: the packing plan must not serialize the corpus
    through a single partition — no `Exchange SinglePartition` feeding the
    running-sum window (the two-phase prefix sum exists precisely to avoid
    the global ORDER BY window)."""
    d = docs(spark)
    df = pack_token_stream(d, capacity=10, bucket_size=37)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "SinglePartition" not in plan
    assert "Window" in plan  # the per-bucket window is still a window


def test_importance_ratio_separates_target_like_docs(spark):
    from fonduer_spark.functions.sampling import importance_ratio

    # target vocab {aaa bbb}, background vocab {xxx yyy}; doc 9 is empty
    rows = [(i, "aaa bbb aaa" if i % 2 == 0 else "xxx yyy xxx")
            for i in range(9)] + [(9, "   ")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in importance_ratio(
        d, d.where(F.col("doc_id") % 2 == 0), n_buckets=64,
        threshold=1.0).collect()}
    assert len(out) == 10
    # target-like docs score above 1, background below, empty exactly 0
    for i in range(9):
        if i % 2 == 0:
            assert out[i].score > 1.0 and out[i].kept == 1
        else:
            assert out[i].score < 1.0 and out[i].kept == 0
    assert out[9].score == 0.0 and out[9].kept == 0 and out[9].s_raw == 0

    # closed form for doc 0 (tokens aaa bbb aaa): md5 % 64 buckets of the
    # four vocab words are distinct, target counts aaa=10 bbb=5 (5 even
    # docs x "aaa bbb aaa"), raw adds xxx=10 yyy=5 from the odd docs
    import hashlib

    def b(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    assert len({b(t) for t in ("aaa", "bbb", "xxx", "yyy")}) == 4
    tgt = {b("aaa"): 10, b("bbb"): 5}
    raw = {b("aaa"): 10, b("bbb"): 5, b("xxx"): 10, b("yyy"): 5}
    s_t = (tgt[b("aaa")] + 1) * 2 + (tgt[b("bbb")] + 1)
    s_r = (raw[b("aaa")] + 1) * 2 + (raw[b("bbb")] + 1)
    # raw total = 9 docs x 3 tokens = 27; target total = 5 docs x 3 = 15
    want = round((s_t * (27 + 64)) / (s_r * (15 + 64)), 6)
    assert out[0].score == want
    assert out[0].s_target == s_t and out[0].s_raw == s_r


def test_importance_ratio_partitioning_independent(spark):
    from fonduer_spark.functions.sampling import importance_ratio

    rows = [(i, f"w{i % 11} w{(i * 3) % 11} common") for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = d.where(F.col("doc_id") % 5 == 0)
    a = sorted(map(tuple, importance_ratio(d, tgt).collect()))
    b = sorted(map(tuple, importance_ratio(
        d.repartition(13), tgt.repartition(3)).collect()))
    assert a == b


def test_priority_sample_basic_and_deterministic(spark):
    from fonduer_spark.functions.sampling import priority_sample

    df = spark.createDataFrame(
        [(i, 10 if i % 10 == 0 else 1) for i in range(200)],
        "doc_id long, w long")
    a = priority_sample(df, "w", k=40).collect()
    b = priority_sample(df.repartition(7), "w", k=40).collect()
    assert [(r.doc_id, r.weight, r.rank) for r in a] \
        == [(r.doc_id, r.weight, r.rank) for r in b]  # layout-independent
    assert len(a) == 40 and [r.rank for r in a] == list(range(1, 41))
    # weight-10 rows are 10% of the corpus but must be strongly
    # overrepresented in the kept set (each is ~10x likelier per slot)
    heavy = sum(1 for r in a if r.weight == 10)
    assert heavy >= 10, heavy


def test_priority_sample_strata_and_guards(spark):
    import pytest
    from fonduer_spark.functions.sampling import priority_sample

    df = spark.createDataFrame(
        [(i, 1 + i % 3, "en" if i % 2 == 0 else "de") for i in range(50)],
        "doc_id long, w long, lang string")
    out = priority_sample(df, "w", k=5, strata_col="lang").collect()
    per = {}
    for r in out:
        per.setdefault(r.lang, []).append(r.rank)
    assert set(per) == {"en", "de"}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values())
    with pytest.raises(ValueError, match="k must be"):
        priority_sample(df, "w", k=0)
    # zero/negative weights are unsampleable
    z = spark.createDataFrame([(1, 0), (2, -3), (3, 5)],
                              "doc_id long, w long")
    kept = priority_sample(z, "w", k=10).collect()
    assert [r.doc_id for r in kept] == [3]


def test_quota_sample_exact_k_per_stratum(spark):
    from fonduer_spark.functions.sampling import quota_sample

    d = docs(spark)  # 400 docs, langs en/de/fr round-robin (~133 each)
    out = quota_sample(d, "lang", k=10, salt="q1").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "de", "fr"}
    # exactly k per stratum, ranks 1..k, and the kept set is the python
    # ground truth: smallest md5(id || ':' || salt) per language
    for lang, rows in by_lang.items():
        assert sorted(r.quota_rank for r in rows) == list(range(1, 11))
        ids = [i for i in range(400) if ["en", "de", "fr"][i % 3] == lang]
        key = lambda i: (hashlib.md5(f"{i}:q1".encode()).hexdigest(), i)
        want = sorted(sorted(ids, key=key)[:10])
        assert sorted(r.doc_id for r in rows) == want
        # ranks follow the hash order exactly
        ranked = sorted(rows, key=lambda r: r.quota_rank)
        assert [r.doc_id for r in ranked] == sorted(ids, key=key)[:10]


def test_quota_sample_small_stratum_and_stability(spark):
    from fonduer_spark.functions.sampling import quota_sample

    d = docs(spark, n=30)  # 10 docs per lang
    out = quota_sample(d, "lang", k=25, salt="q2").collect()
    # k > |stratum| degenerates to keeping the whole stratum
    assert len(out) == 30
    assert {r.quota_rank for r in out if r.lang == "en"} == set(range(1, 11))
    # partitioning/bucketing-independent kept set and ranks
    big = docs(spark)
    a = sorted((r.lang, r.quota_rank, r.doc_id) for r in
               quota_sample(big, "lang", k=7, salt="q3").collect())
    b = sorted((r.lang, r.quota_rank, r.doc_id) for r in
               quota_sample(big.repartition(13), "lang", k=7, salt="q3",
                            n_buckets=3).collect())
    assert a == b
    with pytest.raises(ValueError, match="k must"):
        quota_sample(big, "lang", k=0)
    with pytest.raises(ValueError, match="n_buckets"):
        quota_sample(big, "lang", k=1, n_buckets=0)


def test_quota_sample_plan_has_no_global_window(spark):
    from fonduer_spark.functions.sampling import quota_sample

    plan = quota_sample(docs(spark), "lang", k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    # both rank phases partition by at least the stratum key — the
    # whole-corpus single-partition sort never appears
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# leakage-safe split (sampling.leakage_safe_split)
# ---------------------------------------------------------------------------
def test_leakage_safe_split_clusters_never_straddle(spark):
    from fonduer_spark.functions.sampling import leakage_safe_split

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    # 30 near-dup clusters of 3 (ids 3c, 3c+1, 3c+2 share a long text with
    # a tiny per-cluster tweak), plus 30 singletons with disjoint texts
    for c in range(30):
        for j in range(3):
            suffix = "" if j == 0 else f" v{j}"
            rows.append((3 * c + j, f"{base} cluster{c}{suffix}"))
    for s in range(30):
        rows.append((1000 + s, f"totally unrelated text number{s} "
                               f"alpha{s} beta{s} gamma{s} delta{s}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(docs, frac_train=0.5, salt="t").collect()
    assert len(out) == len(rows)  # every doc gets a split, singletons too
    by_id = {r.doc_id: r for r in out}
    for c in range(30):
        members = [by_id[3 * c + j] for j in range(3)]
        # one split key per cluster, every member on the same side
        assert len({m.split_key for m in members}) == 1
        assert len({m.split for m in members}) == 1
    # singletons key on themselves
    for s in range(30):
        assert by_id[1000 + s].split_key == 1000 + s
    # both sides populated at frac=0.5 over 60 keys
    sides = {r.split for r in out}
    assert sides == {"train", "holdout"}


def test_leakage_safe_split_deterministic_and_validated(spark):
    from fonduer_spark.functions.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc text {i} one two three") for i in range(20)],
        "doc_id long, text string")
    a = sorted(map(tuple, leakage_safe_split(docs, 0.8, "s").collect()))
    b = sorted(map(tuple, leakage_safe_split(
        docs.repartition(7), 0.8, "s").collect()))
    assert a == b  # partitioning-independent
    with pytest.raises(ValueError, match="frac_train"):
        leakage_safe_split(docs, frac_train=1.5)
