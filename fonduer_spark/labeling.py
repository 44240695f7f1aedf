"""P6 — weak supervision: labeling functions, label matrix, label model.

Reference semantics (/root/reference/src/fonduer/supervision/labeler.py):
each LF maps a candidate to an int in {-1 (ABSTAIN), 0, 1, ...}; storage is
0-shifted (labeler.py:42-45, utils_udf.py:196-203): stored = user + 1, so
0 = ABSTAIN in storage. Labels persist as parallel ``keys``/``values`` arrays
per candidate — one row per candidate, exactly the reference's annotation
layout (utils/models/annotation.py:46-101).

Column-expression LFs are evaluated JVM-side (whole-stage codegen); opaque
Python LFs run in one Arrow-batched pass. The label model is a
majority-vote generative model implemented as a pure Spark aggregation
(the reference's external snorkel LabelModel is driver-side and optional;
majority vote is its documented fallback — SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Mapping, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ABSTAIN = -1

ColumnLF = Callable[[], Column]          # returns int column in {-1,0,1,...}
PandasLF = Callable[[pd.DataFrame], pd.Series]

LABEL_SCHEMA = T.StructType([
    T.StructField("candidate_sid", T.StringType(), False),
    T.StructField("candidate_type", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("keys", T.ArrayType(T.StringType()), True),
    T.StructField("values", T.ArrayType(T.IntegerType()), True),  # 0-shifted
])


def _eval_lfs(
    candidates: DataFrame,
    lfs: Mapping[str, Union[Column, PandasLF]],
) -> DataFrame:
    """Append one 0-shifted ``_lf_<name>`` int column per LF."""
    col_lfs: Dict[str, Column] = {}
    pd_lfs: Dict[str, PandasLF] = {}
    for name, lf in lfs.items():
        if isinstance(lf, Column):
            col_lfs[name] = lf
        else:
            pd_lfs[name] = lf

    df = candidates
    for name, expr in col_lfs.items():
        # coalesce: a column LF evaluating to NULL (e.g. F.when with no
        # .otherwise) stores ABSTAIN, keeping the 0-shifted int convention
        # consistent with the pandas-LF fillna branch below
        df = df.withColumn(
            f"_lf_{name}",
            F.coalesce(expr.cast("int"), F.lit(ABSTAIN)) + F.lit(1),
        )

    if pd_lfs:
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField(f"_lf_{n}", T.IntegerType(), True) for n in pd_lfs]
        )

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for n, lf in pd_lfs.items():
                    pdf[f"_lf_{n}"] = (
                        lf(pdf).fillna(ABSTAIN).astype("int32") + 1
                    )
                yield pdf

        df = df.mapInPandas(fn, schema)

    return df


def _label_arrays(lfs: Mapping[str, object]):
    names = sorted(lfs.keys())
    keys = F.array(*[F.lit(n) for n in names])
    values = F.array(*[F.col(f"_lf_{n}") for n in names])
    return keys, values


def apply_lfs(
    candidates: DataFrame,
    lfs: Mapping[str, Union[Column, PandasLF]],
) -> DataFrame:
    """candidates -> labels(candidate_sid, keys[], values[]) with the
    0-shifted storage convention. Column LFs stay JVM-side; any pandas LFs
    are fused into a single mapInPandas pass."""
    df = _eval_lfs(candidates, lfs)
    keys, values = _label_arrays(lfs)
    return df.select(
        "candidate_sid", "candidate_type", "url",
        keys.alias("keys"), values.alias("values"),
    )


def with_marginals(
    candidates: DataFrame,
    lfs: Mapping[str, Union[Column, PandasLF]],
) -> DataFrame:
    """Append keys/values label arrays AND the majority-vote ``prob`` column
    to the candidates frame itself — zero extra shuffle on the hot path
    (labels + marginals derive from the same projection)."""
    df = _eval_lfs(candidates, lfs)
    keys, values = _label_arrays(lfs)
    df = df.withColumn("keys", keys).withColumn("values", values)
    votes = F.filter("values", lambda v: v != 0)
    pos = F.size(F.filter("values", lambda v: v == 2))
    prob = F.when(F.size(votes) > 0, pos / F.size(votes)).otherwise(F.lit(0.5))
    df = df.withColumn("prob", prob)
    return df.select(*[c for c in df.columns if not c.startswith("_lf_")])


def label_keys(labels: DataFrame) -> DataFrame:
    """Global LabelKey table: key -> candidate_classes[] (reference
    labeler.py:362-375 rebuilds this on train)."""
    return (
        labels.select(F.explode("keys").alias("key"), "candidate_type")
        .groupBy("key")
        .agg(F.collect_set("candidate_type").alias("candidate_classes"))
    )


def majority_vote_marginals(labels: DataFrame) -> DataFrame:
    """Generative label model: per-candidate P(true) by majority vote over
    non-abstaining LFs (binary convention: user label 1 = TRUE, 0 = FALSE).

    Pure column arithmetic over the stored 0-shifted values array — a single
    narrow projection, no shuffle."""
    votes = F.filter("values", lambda v: v != 0)  # drop ABSTAIN (stored 0)
    n_votes = F.size(votes)
    # stored 2 = user 1 (TRUE); stored 1 = user 0 (FALSE)
    pos = F.size(F.filter("values", lambda v: v == 2))
    prob = F.when(n_votes > 0, pos / n_votes).otherwise(F.lit(0.5))
    return labels.select(
        "candidate_sid", "candidate_type", "url",
        prob.alias("prob"),
        n_votes.alias("n_votes"),
    )


def snorkel_label_model_marginals(labels: DataFrame) -> DataFrame:
    """Generative label model via snorkel's LabelModel when installed
    (the reference fits snorkel.labeling.model.LabelModel on the collected
    matrix, tests/e2e/test_e2e.py:317-320); falls back to majority vote
    otherwise. Collection is O(#candidates x #LFs) — the reference's own
    driver-side fit point."""
    try:
        import numpy as np
        from snorkel.labeling.model import LabelModel  # type: ignore
    except Exception:
        return majority_vote_marginals(labels)

    rows = labels.select("candidate_sid", "values").collect()
    # stored 0-shifted -> snorkel convention (-1 = ABSTAIN)
    L = np.array([[v - 1 for v in r.values] for r in rows])
    model = LabelModel(cardinality=2, verbose=False)
    model.fit(L_train=L, n_epochs=300, seed=42)
    probs = model.predict_proba(L)[:, 1]
    spark = labels.sparkSession
    pdf = [(r.candidate_sid, float(p)) for r, p in zip(rows, probs)]
    marg = spark.createDataFrame(pdf, "candidate_sid string, prob double")
    return labels.select("candidate_sid", "candidate_type", "url") \
        .join(marg, "candidate_sid")


def gold_labels(
    candidates: DataFrame, is_gold: Column, annotator: str = "gold"
) -> DataFrame:
    """Gold-label loading: same machinery with a single annotator-named LF
    (reference labeler.py:117-192, tests/shared/hardware_utils.py:59-68)."""
    return apply_lfs(candidates, {annotator: is_gold})


def entity_level_prf1(
    predicted: DataFrame, gold: DataFrame, keys: List[str]
) -> Dict[str, float]:
    """Entity-level P/R/F1 via set ops on the key tuple (the engine's port of
    reference tests/shared/hardware_utils.py:71-131: TP/FP/FN on distinct
    entity tuples)."""
    p = predicted.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    tp = p.intersect(g).count()
    fp = p.exceptAll(p.intersect(g)).count()
    fn = g.exceptAll(g.intersect(p)).count()
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1,
            "tp": float(tp), "fp": float(fp), "fn": float(fn)}
