"""Structured Streaming incremental pipeline + the reference-compatible API
facade."""

import pytest
from pyspark.sql import functions as F

from fonduer_spark.api import (
    CandidateExtractor,
    Featurizer,
    Labeler,
    MentionExtractor,
    Parser,
)
from fonduer_spark.candidates_op import same_row
from fonduer_spark.corpus import make_web_pages
from fonduer_spark.matchers import RegexMatchSpan
from fonduer_spark.mention_spaces import MentionNgrams
from fonduer_spark.pipeline import PART_RGX, TEMP_RGX, default_mention_specs
from fonduer_spark.streaming import (
    run_stream_to_parquet,
    stream_mentions,
    stream_web_pages,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"
SF_EVENTS = SF


def test_streaming_incremental_mentions(spark, tmp_path):
    in_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "mentions")
    ck_dir = str(tmp_path / "ck")

    # drop batch 1
    make_web_pages(spark, SF, max_docs=10).write.mode("append").parquet(in_dir)
    stream = stream_web_pages(spark, in_dir)
    assert stream.isStreaming
    mentions = stream_mentions(stream, default_mention_specs())
    run_stream_to_parquet(mentions, out_dir, ck_dir)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # drop batch 2 (new docs) -> only the new files are processed
    make_web_pages(spark, SF, max_docs=20).where(
        F.col("url") >= "https://fixture.test/d000010"
    ).write.mode("append").parquet(in_dir)
    mentions2 = stream_mentions(stream_web_pages(spark, in_dir),
                                default_mention_specs())
    run_stream_to_parquet(mentions2, out_dir, ck_dir)
    out = spark.read.parquet(out_dir)
    n2 = out.count()
    assert n2 > n1
    # no duplicate mention stable ids across incremental batches
    assert out.select("stable_id", "mention_type").distinct().count() == n2


def test_windowed_event_counts_batch_parity(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    agg = windowed_event_counts(events, window="1 day", watermark="1 day")
    rows = agg.collect()
    assert rows
    total = sum(r.n_events for r in rows)
    assert total == events.count()


def test_api_facade_end_to_end(spark):
    pages = make_web_pages(spark, SF, max_docs=8)
    parser = Parser(spark, flatten=["span", "br"])
    parsed = parser.apply(pages).persist()
    assert Parser.get_documents(parsed).count() == 8

    me = MentionExtractor(
        spark, ["part", "temp"],
        [MentionNgrams(n_max=1), MentionNgrams(n_max=1)],
        [RegexMatchSpan(rgx=PART_RGX, ignore_case=False),
         RegexMatchSpan(rgx=TEMP_RGX, ignore_case=False)],
    )
    mentions = me.apply(Parser.get_sentences(parsed)).persist()
    assert MentionExtractor.get_mentions(mentions, "part").count() > 0

    ce = CandidateExtractor(spark, [("part_temp", "part", "temp")],
                            throttlers=[same_row])
    cands = ce.apply(mentions, split=0).persist()
    assert CandidateExtractor.get_candidates(cands, "part_temp").count() > 0
    assert cands.select("split").distinct().collect()[0].split == 0

    fz = Featurizer(spark)
    feats = fz.apply(cands, parsed, train=True)
    assert fz.get_keys().count() > 0

    lb = Labeler(spark)
    from fonduer_spark.pipeline import default_lfs
    labels = lb.apply(cands, default_lfs(), train=True)
    assert lb.get_keys().count() == 3
    marg = Labeler.marginals(labels)
    assert {r.prob for r in marg.collect()} <= {0.0, 1.0, 1 / 3, 0.5, 2 / 3}
    parsed.unpersist(); mentions.unpersist(); cands.unpersist()


def test_api_throttler_count_mismatch(spark):
    with pytest.raises(ValueError):
        CandidateExtractor(spark, [("a", "x", "y"), ("b", "x", "y")],
                           throttlers=[same_row])


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """State persists across micro-batches via the checkpoint: after a
    second file drop, totals are cumulative (not per-batch)."""
    import pyspark.sql.functions as SF
    from fonduer_spark.streaming import stateful_running_totals

    events = spark.read.parquet(f"{SF_EVENTS}/events.parquet")
    half1 = events.where(SF.col("event_id") % 2 == 0)
    half2 = events.where(SF.col("event_id") % 2 == 1)

    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    half1.write.mode("append").parquet(in_dir)

    def run_once():
        stream = (spark.readStream.schema(events.schema)
                  .parquet(in_dir))

        # update-mode stateful output -> file sink via foreachBatch
        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (stateful_running_totals(stream).writeStream
             .foreachBatch(sink)
             .option("checkpointLocation", ck)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()

    run_once()
    half2.write.mode("append").parquet(in_dir)
    run_once()

    out = spark.read.parquet(out_dir)
    # latest totals per event_type == full-batch ground truth
    latest = (out.groupBy("event_type")
              .agg(SF.max("total_events").alias("n")))
    truth = events.groupBy("event_type").count()
    got = {r.event_type: r.n for r in latest.collect()}
    want = {r.event_type: r["count"] for r in truth.collect()}
    assert got == want


def test_label_model_facade(spark):
    """api.LabelModel mirrors snorkel's fit/predict_proba/get_weights call
    shape (reference e2e drives snorkel.labeling.model.LabelModel after
    Labeler.apply) over the triplet estimator; fitting on one frame and
    scoring another reuses the broadcast weights."""
    import pytest
    from pyspark.sql import functions as F

    from fonduer_spark.api import LabelModel

    df = spark.createDataFrame(
        [("c%d" % i, "t", "u", i % 2) for i in range(40)],
        "candidate_sid string, candidate_type string, url string, y int")
    lfs = {
        "good": F.col("y"),
        "noisy": F.when(F.col("y") == 1, 1 - (F.col("candidate_sid") == "c1")
                        .cast("int")).otherwise(0),
        "flip5": F.when((F.col("y") == 1) != (F.pmod(
            F.length("candidate_sid"), 5) == 0), 1).otherwise(0),
    }
    m = LabelModel(spark).fit(df, lfs)
    w = m.get_weights()
    assert set(w) == {"good", "noisy", "flip5"}
    assert all(0.5 <= a <= 1.0 for a in w.values())
    probs = {r.candidate_sid: r.prob for r in m.predict_proba(df).collect()}
    truth = {r.candidate_sid: r.y for r in df.collect()}
    acc = sum((probs[s] > 0.5) == (truth[s] == 1) for s in truth) / len(truth)
    assert acc >= 0.9
    # cardinality=3 is now the OvR k-ary path (test_multiclass.py);
    # invalid cardinalities still raise
    with pytest.raises(ValueError, match="cardinality"):
        LabelModel(spark, cardinality=1)
    with pytest.raises(ValueError, match="fit"):
        LabelModel(spark).predict_proba(df)


def test_windowed_watermark_append_finality(spark, tmp_path):
    """Watermark semantics as this Spark actually implements them
    (empirically verified; the guarantee is one-directional — data later
    than the watermark may or may not be dropped): with a 2-day watermark
    and 1-day windows, after a day-10 batch advances the watermark to
    day 8, a late day-1 batch lands in a window that is ALREADY FINAL —
    append mode emits it immediately and exactly once, while the day-10
    window stays open (it may still receive data) and is withheld from the
    append sink. The contract query stream_events_window therefore uses a
    dataset-spanning watermark + update-mode final state, which equals the
    batch aggregate regardless of these finality rules."""
    import datetime as dt
    import time as _time

    from fonduer_spark.streaming import (
        run_stream_to_parquet, windowed_event_counts)

    in_dir = str(tmp_path / "in")
    ts10 = dt.datetime(2026, 1, 10, 12, 0, 0)
    ts01 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows10 = [(i, ts10, "a", 1.0) for i in range(3)]
    rows01 = [(100 + i, ts01, "a", 1.0) for i in range(2)]
    schema = "event_id long, ts timestamp, event_type string, value double"
    spark.createDataFrame(rows10, schema).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    _time.sleep(1.1)  # distinct mtimes => deterministic trigger order
    spark.createDataFrame(rows01, schema).coalesce(1) \
        .write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(in_dir)
    )
    agg = windowed_event_counts(stream, window="1 day", watermark="2 days")
    run_stream_to_parquet(
        agg, str(tmp_path / "out"), str(tmp_path / "cp"))
    out = spark.read.parquet(str(tmp_path / "out"))
    days = {r.window_start.day: r.n_events for r in out.collect()}
    # the already-final day-1 window emitted once; the open day-10 window
    # is withheld by append-mode finality
    assert days == {1: 2}


def test_meta_lifecycle(spark, tmp_path):
    """Meta.init(warehouse).Session() — the reference's bootstrap call
    shape (meta.py:60-160) over the Spark engine; pipeline() opens a
    checkpointed run against the warehouse; re-init elsewhere raises until
    reset."""
    import pytest
    from pyspark.sql import functions as F

    from fonduer_spark.meta import Meta

    Meta.reset()
    try:
        wh = str(tmp_path / "wh")
        assert Meta.init(wh).Session() is not None
        s = Meta.Session()
        assert s.range(3).count() == 3
        cp = Meta.pipeline("run-1")
        out = cp.stage("nums", lambda: s.range(5).select(
            F.col("id").cast("long").alias("id")))
        assert out.count() == 5
        # resume: same signature skips the recompute
        cp2 = Meta.pipeline("run-1")
        assert cp2.stage("nums", lambda: 1 / 0).count() == 5
        with pytest.raises(ValueError, match="already initialized"):
            Meta.init(str(tmp_path / "other"))
    finally:
        Meta.reset()


def test_feature_extractor_facade(spark):
    """api.FeatureExtractor (reference feature_extractors.py call shape):
    selects libraries, validates names, and threads custom feature
    functions into the same Arrow batch as the built-ins."""
    import pytest

    from fonduer_spark.api import FeatureExtractor, Featurizer

    with pytest.raises(ValueError, match="Unrecognized"):
        FeatureExtractor(features=["textual", "nope"])

    def my_feat(row):
        if row.get("a_span_text"):
            yield f"CUSTOM_LEN_{len(row['a_span_text'])}"

    pages = make_web_pages(spark, SF, max_docs=4)
    parsed = Parser(spark).apply(pages)
    me = MentionExtractor(
        spark, ["part", "temp"],
        [MentionNgrams(n_max=1), MentionNgrams(n_max=1)],
        [RegexMatchSpan(rgx=PART_RGX, ignore_case=False),
         RegexMatchSpan(rgx=TEMP_RGX, ignore_case=False)],
    )
    mentions = me.apply(Parser.get_sentences(parsed))
    cands = CandidateExtractor(
        spark, [("part_temp", "part", "temp")],
        throttlers=[same_row]).apply(mentions)
    fe = FeatureExtractor(features=["textual"],
                          customize_feature_funcs=my_feat)
    feats = Featurizer(spark, feature_extractor=fe).apply(cands)
    keys = {k for r in feats.select("keys").collect() for k in r.keys}
    assert any(k.startswith("CUSTOM_LEN_") for k in keys)
    assert any("CONTAINS" in k for k in keys)      # textual ran
    assert not any(k.startswith("e0_ROW_") for k in keys)  # tabular off


def test_merge_triple_partial_converges_to_batch(spark, tmp_path):
    """The foreachBatch combine rule (prob=max, n_provenance=sum,
    provenance capped union) converges to the batch aggregate under any
    slicing: two partials merged sequentially == one-shot aggregate."""
    from fonduer_spark.checkpoints import SnapshotTable
    from fonduer_spark.streaming import merge_triple_partial

    schema = ("subj string, pred string, obj string, prob double, "
              "n_provenance long, provenance array<string>")
    p1 = spark.createDataFrame(
        [("A", "p", "X", 1.0, 2, ["c1", "c2"]),
         ("B", "p", "Y", 0.5, 1, ["c3"])], schema)
    p2 = spark.createDataFrame(
        [("A", "p", "X", 0.5, 3, ["c4", "c5", "c6"]),   # matched key
         ("C", "p", "Z", 1.0, 1, ["c7"])], schema)      # new key
    t = SnapshotTable(str(tmp_path), "triples")
    merge_triple_partial(spark, t, p1)
    merge_triple_partial(spark, t, p2)
    rows = {(r.subj, r.pred, r.obj): r for r in t.read(spark).collect()}
    assert set(rows) == {("A", "p", "X"), ("B", "p", "Y"), ("C", "p", "Z")}
    a = rows[("A", "p", "X")]
    assert a.prob == 1.0 and a.n_provenance == 5
    assert sorted(a.provenance) == ["c1", "c2", "c4", "c5", "c6"]
    assert rows[("B", "p", "Y")].n_provenance == 1
    assert rows[("C", "p", "Z")].prob == 1.0


def test_sessionize_gap_semantics(spark):
    """session_window gap semantics: events within the gap chain one
    session (window end = last event + gap); a gap-sized pause starts a
    new one; values aggregate as exact cents."""
    from datetime import datetime

    from fonduer_spark.streaming import sessionize

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(minute):
        return datetime(2024, 1, 1, minute // 60, minute % 60, 0)

    ev = spark.createDataFrame(
        [(1, at(0), 1.25), (1, at(30), 2.50), (1, at(30 + 125), 0.25),
         (2, at(10), 9.99)],
        "user_id long, ts timestamp, value double")
    rows = sorted(sessionize(ev, gap="2 hours").collect(),
                  key=lambda r: (r.user_id, r.session_start))
    assert len(rows) == 3
    s1, s2, s3 = rows
    assert (s1.user_id, s1.n_events, s1.sum_cents) == (1, 2, 375)
    assert s1.session_start == t0 and s1.session_end == at(30 + 120)
    assert (s2.user_id, s2.n_events, s2.sum_cents) == (1, 1, 25)
    assert s2.session_start == at(155)
    assert (s3.user_id, s3.n_events, s3.sum_cents) == (2, 1, 999)
