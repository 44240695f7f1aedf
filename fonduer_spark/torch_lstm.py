"""Torch-backed LSTM discriminative head, env-gated (no torch here).

The reference's default discriminative model is a per-slot bidirectional
LSTM over the marked token sequences, concatenated with a linear head over
the sparse feature vector (learning/task.py:59-219: one RNN module per
arity slot, ``SparseLinear`` feature module, ``ConcatLinear`` pred head).
This module is the real implementation of that architecture behind an
import gate — ``torch`` is absent in this container, so every entry point
raises ``NotImplementedError`` here, and tests/test_torch_contract.py
(skip-if-absent) verifies the full train/score contract the day the
environment provides torch — exactly the pattern the lingual (spaCy) and
multimodal (Pillow) conformance contracts use.

Contract shared with the env-honest substitute (learning.train_sequence_model
/ score_sequences):
- fit collects a BOUNDED, deterministic sample (same max_fit_candidates /
  xxhash64 convention) and trains driver-side on soft labels;
- scoring is DISTRIBUTED: the trained weights broadcast to executors and
  run inside one mapInPandas pass, emitting (candidate_sid, model_prob);
- training is seeded and single-threaded => deterministic refits.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _require_torch():
    try:
        import torch  # type: ignore

        return torch
    except ImportError as e:  # pragma: no cover - exercised w/o torch only
        raise NotImplementedError(
            "torch is not available in this container; the LSTM head is "
            "env-gated — use learning.train_sequence_model (the mean-pooled "
            "substitute) or install torch"
        ) from e


def _build_model(torch, vocab_size: int, n_slots: int, emb_dim: int,
                 hidden_dim: int, n_features: int, seed: int):
    """The reference architecture (task.py:110-143): shared embedding, one
    BiLSTM per slot, a linear feature module, concat -> pred head."""
    nn = torch.nn
    g = torch.Generator().manual_seed(seed)
    torch.manual_seed(seed)

    class SlotLSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(vocab_size, emb_dim, padding_idx=0)
            self.lstms = nn.ModuleList([
                nn.LSTM(emb_dim, hidden_dim, batch_first=True,
                        bidirectional=True)
                for _ in range(n_slots)
            ])
            self.feat = nn.Linear(n_features, hidden_dim) \
                if n_features else None
            width = 2 * hidden_dim * n_slots + (hidden_dim if n_features
                                                else 0)
            self.head = nn.Linear(width, 1)

        def forward(self, slot_ids, slot_lens, feats=None):
            outs = []
            for i, lstm in enumerate(self.lstms):
                e = self.emb(slot_ids[i])
                h, _ = lstm(e)
                # mean over the true (unpadded) length per sequence —
                # the attention-free pooling variant
                mask = (slot_ids[i] != 0).unsqueeze(-1).float()
                pooled = (h * mask).sum(1) / mask.sum(1).clamp(min=1.0)
                outs.append(pooled)
            if self.feat is not None and feats is not None:
                outs.append(torch.relu(self.feat(feats)))
            return self.head(torch.cat(outs, dim=1)).squeeze(-1)

    model = SlotLSTM()
    return model, g


def _pad(torch, seqs: List[List[int]], max_len: int):
    out = torch.zeros(len(seqs), max_len, dtype=torch.long)
    for i, s in enumerate(seqs):
        s = s[:max_len]
        if s:
            out[i, : len(s)] = torch.tensor(s, dtype=torch.long)
    return out


def train_lstm_model(
    marked: DataFrame,
    marginals: DataFrame,
    word2id: Dict[str, int],
    emb_dim: int = 32,
    hidden_dim: int = 32,
    lr: float = 1e-2,
    epochs: int = 30,
    max_len: int = 128,
    max_fit_candidates: int = 200_000,
    seed: int = 42,
) -> Dict:
    """Fit the gated LSTM head on the MARKED per-slot token sequences
    (same input convention as learning.train_sequence_model; ``word2id``
    from learning.build_word2id, id 0 reserved for padding). Returns a
    plain state dict (python lists) that score_lstm broadcasts — no torch
    objects cross the driver/executor boundary uninstantiated."""
    torch = _require_torch()
    from .learning import bounded_fit_rows

    m_cols = sorted(c for c in marked.columns if c.endswith("_marked"))
    rows = bounded_fit_rows(marked, marginals, m_cols, max_fit_candidates)

    def encode(toks):
        # `toks` may be a list (collect) or numpy array (Arrow batch);
        # ndarray truthiness raises, so test None explicitly
        toks = [] if toks is None else list(toks)
        return [word2id.get(t, word2id.get("<unk>", 1)) for t in toks]

    slot_seqs = [[encode(r[c]) for r in rows] for c in m_cols]
    y = torch.tensor([
        float(r["_fit_prob"]) if r["_fit_prob"] is not None else 0.5
        for r in rows])
    vocab_size = max(word2id.values()) + 1
    model, _ = _build_model(torch, vocab_size, len(m_cols), emb_dim,
                            hidden_dim, 0, seed)
    torch.set_num_threads(1)  # deterministic single-threaded fit
    ids = [_pad(torch, s, max_len) for s in slot_seqs]
    lens = None
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    lossf = torch.nn.BCEWithLogitsLoss()
    model.train()
    for _ in range(epochs):
        opt.zero_grad()
        z = model(ids, lens)
        loss = lossf(z, y)
        loss.backward()
        opt.step()
    model.eval()
    return {
        "state": {k: v.tolist() for k, v in model.state_dict().items()},
        "m_cols": m_cols,
        "vocab_size": vocab_size,
        "emb_dim": emb_dim,
        "hidden_dim": hidden_dim,
        "max_len": max_len,
        "word2id": dict(word2id),
    }


def score_lstm(marked: DataFrame, model_dict: Dict) -> DataFrame:
    """Distributed scoring: rebuild the module from the broadcast state
    dict inside each Arrow batch worker, emit (candidate_sid, model_prob).
    Mirrors learning.score_sequences' output shape."""
    _require_torch()  # fail fast on the driver, not inside tasks
    m_cols = model_dict["m_cols"]
    schema = T.StructType([
        T.StructField("candidate_sid", T.StringType(), False),
        T.StructField("model_prob", T.DoubleType(), True),
    ])

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        import torch

        model, _ = _build_model(
            torch, model_dict["vocab_size"], len(m_cols),
            model_dict["emb_dim"], model_dict["hidden_dim"], 0, 0)
        model.load_state_dict({
            k: torch.tensor(v) for k, v in model_dict["state"].items()})
        model.eval()
        w2i = model_dict["word2id"]
        unk = w2i.get("<unk>", 1)

        def encode(toks):
            # Arrow batches deliver array columns as numpy arrays, whose
            # truthiness raises for >1 element — test None explicitly
            toks = [] if toks is None else list(toks)
            return [w2i.get(t, unk) for t in toks]

        for pdf in batches:
            ids = [
                _pad(torch,
                     [encode(t) for t in pdf[c]], model_dict["max_len"])
                for c in m_cols
            ]
            with torch.no_grad():
                p = torch.sigmoid(model(ids, None)).tolist()
            yield pd.DataFrame({
                "candidate_sid": pdf["candidate_sid"],
                "model_prob": p,
            })

    return marked.select("candidate_sid", *m_cols).mapInPandas(fn, schema)
