"""P6.5 — discriminative learning over sparse feature vectors (optional).

The reference trains Emmental models (sparse LogisticRegression / LSTM,
learning/task.py:59-219) on CSR matrices collected from the features table.
Torch/Emmental are absent here; this module provides the same lifecycle with
a driver-side numpy logistic regression:

- the feature matrix is collected ONLY at model-fit time and is
  O(#candidates x #keys) — small relative to the corpus, exactly the
  reference's collection point (featurizer.py:297-306, utils_udf.py:125-193);
- training labels come from label-model marginals (prob), mirroring the
  reference's noise-aware training objective on soft labels;
- inference distributes back out: the learned (key -> weight) map broadcasts
  and scoring is a column expression over the keys/values arrays — no Python
  in the scoring path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_csr(features: DataFrame, key_order: List[str] = None):
    """features(keys[], values[]) -> (csr-like numpy arrays, key_order).

    Returns (indptr, indices, data, candidate_sids, key_order) — the
    reference's get_feature_matrices shape (utils_udf.py:125-193) without
    the scipy dependency.
    """
    rows = features.select("candidate_sid", "keys", "values").collect()
    if key_order is None:
        key_order = sorted({k for r in rows for k in r.keys})
    key_idx = {k: i for i, k in enumerate(key_order)}
    indptr, indices, data, sids = [0], [], [], []
    for r in rows:
        for k, v in zip(r.keys, r.values):
            i = key_idx.get(k)
            if i is not None:
                indices.append(i)
                data.append(float(v))
        indptr.append(len(indices))
        sids.append(r.candidate_sid)
    return (np.array(indptr), np.array(indices), np.array(data),
            sids, key_order)


def train_logreg(
    features: DataFrame,
    marginals: DataFrame,
    l2: float = None,
    lr: float = None,
    epochs: int = None,
    seed: int = 42,
) -> Tuple[Dict[str, float], float]:
    """Fit logistic regression on (features, soft labels); returns
    (key -> weight, bias). Driver-side gradient descent on the collected
    matrix (small); deterministic given the seed.

    lr/l2/epochs default to the ``learning.logreg`` section of the engine
    config (.fonduer-spark.json, see config.get_config) — the reference
    applies its config to the same knobs (learning/task.py model params).
    The per-epoch forward/backward passes are fully vectorized (bincount
    scatter-adds over the CSR arrays — no per-row Python loop)."""
    from .config import get_config

    logreg_cfg = get_config()["learning"]["logreg"]
    l2 = logreg_cfg["l2"] if l2 is None else l2
    lr = logreg_cfg["lr"] if lr is None else lr
    epochs = logreg_cfg["epochs"] if epochs is None else epochs

    indptr, indices, data, sids, keys = collect_csr(features)
    probs = {r.candidate_sid: float(r.prob)
             for r in marginals.select("candidate_sid", "prob").collect()}
    y = np.array([probs.get(s, 0.5) for s in sids])
    n, d = len(sids), len(keys)
    w = np.zeros(d)
    b = 0.0
    # CSR entry -> row id (handles empty rows, unlike reduceat)
    row_ids = np.repeat(np.arange(n), np.diff(indptr))
    for _ in range(epochs):
        # forward: per-entry products scattered into row sums
        z = b + np.bincount(row_ids, weights=data * w[indices], minlength=n)
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y  # soft-label cross-entropy gradient
        gw = np.bincount(indices, weights=g[row_ids] * data, minlength=d)
        gw = gw / n + l2 * w
        w -= lr * gw
        b -= lr * float(g.mean())
    return dict(zip(keys, w)), float(b)


def score_with_model(
    features: DataFrame, weights: Dict[str, float], bias: float
) -> DataFrame:
    """Distributed inference: broadcast the weight map; score = sigmoid of
    the sparse dot product, computed with JVM array expressions."""
    spark = features.sparkSession
    wmap = F.lit(None)
    # map_from_arrays of two literal arrays (broadcast by the plan)
    keys_lit = F.array(*[F.lit(k) for k in weights])
    vals_lit = F.array(*[F.lit(float(v)) for v in weights.values()])
    wmap = F.map_from_arrays(keys_lit, vals_lit)
    dot = F.aggregate(
        F.zip_with(
            "keys", "values",
            lambda k, v: F.coalesce(F.element_at(wmap, k), F.lit(0.0)) * v,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    z = dot + F.lit(bias)
    return features.withColumn("model_prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
