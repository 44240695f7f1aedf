"""P5 — multimodal featurization: candidates -> sparse feature vectors.

Re-expresses the reference's feature libraries
(/root/reference/src/fonduer/features/feature_libs/: textual_features.py,
tabular_features.py, structural_features.py, visual_features.py) as one
Arrow-batched pandas stage over candidates joined with their sentences'
token arrays. Output uses the reference's annotation layout — one row per
candidate with parallel ``keys``/``values`` arrays
(utils/models/annotation.py:46-101), values all 1 (binary DEF_VALUE,
feature_libs/*: FEAT_PRE + name conventions kept close to the reference).

Scale design:
- the candidates->sentences join is an equi-join on sentence_sid (url-
  prefixed, uniform) — two narrow shuffles; candidates carry everything else
  denormalized;
- per-batch memo dicts replace the reference's process-global lru_caches
  (utils/data_model_utils/*.py) — cache locality per Arrow batch;
- aligned-cell ngrams (ROW_/COL_) are a groupBy aggregation over sentences
  per (table, row/col), broadcast-joined back — replacing the reference's
  per-candidate cell-walk (tabular.py:477-543) with one pass;
- the global FeatureKey table is explode+distinct, built only when train=True
  exactly like the reference (featurizer.py:285-295).

Visual features are gated off for the webtext payload (sentences carry no
visual arrays), matching the reference's ``is_visual()`` no-op
(visual_features.py:43,56).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("candidate_sid", T.StringType(), False),
    T.StructField("candidate_type", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("keys", T.ArrayType(T.StringType()), True),
    T.StructField("values", T.ArrayType(T.FloatType()), True),
])

WINDOW = 3          # lemma/word window (reference config featurization window)
NGRAM_MAX = 2       # contained/aligned ngram max n


def _ngrams(tokens: Sequence[str], n_max: int = NGRAM_MAX) -> Iterator[str]:
    L = len(tokens)
    for n in range(1, n_max + 1):
        for i in range(L - n + 1):
            yield " ".join(tokens[i:i + n])


def _num_norm(w: str) -> str:
    # reference textual_features.py "_NUMBER" normalization
    return "_NUMBER" if w and w.replace(".", "", 1).replace("-", "", 1).isdigit() \
        else w.lower()


def _span_word_range(row: dict, prefix: str) -> tuple:
    return row[f"{prefix}word_start"], row[f"{prefix}word_end"]


def _textual_unary(row: dict, prefix: str, words: List[str]) -> Iterator[str]:
    """Word-level textual features of one span (textual_features.py:241-283)."""
    ws, we = _span_word_range(row, prefix)
    span_words = words[ws:we + 1]
    for g in _ngrams([_num_norm(w) for w in span_words]):
        yield f"CONTAINS_[{g}]"
    left = [_num_norm(w) for w in words[max(0, ws - WINDOW):ws]]
    right = [_num_norm(w) for w in words[we + 1:we + 1 + WINDOW]]
    for g in _ngrams(left, 1):
        yield f"LEFT_[{g}]"
    for g in _ngrams(right, 1):
        yield f"RIGHT_[{g}]"
    text = row[f"{prefix}span_text"] or ""
    if text[:1].isupper():
        yield "STARTS_WITH_CAPITAL"
    yield f"LENGTH_{{{len(span_words)}}}"


def _lingual_unary(row: dict, prefix: str, lemmas, pos_tags,
                   dep_labels, dep_parents) -> Iterator[str]:
    """Dependency/lemma features, gated on lingual arrays being populated —
    under SimpleParser these are empty strings and the library no-ops,
    exactly like the reference without spaCy (textual_features.py:109-238:
    DDLIB/TreeDLib features require lemmas + dep parses).

    Implemented subset: LEMMA_SEQ / POS_SEQ of the span, DEP_LABEL of each
    span token, and the lemma of each span token's dependency head (the
    first-order TreeDLib parent feature)."""
    if lemmas is None:
        return
    lemmas = list(lemmas)  # Arrow hands numpy arrays to the UDF
    if not lemmas or not any(lemmas):
        return
    pos_tags = list(pos_tags) if pos_tags is not None else []
    dep_labels = list(dep_labels) if dep_labels is not None else []
    dep_parents = list(dep_parents) if dep_parents is not None else []
    ws, we = _span_word_range(row, prefix)
    span_lemmas = [l.lower() for l in lemmas[ws:we + 1] if l]
    if span_lemmas:
        yield f"LEMMA_SEQ_[{' '.join(span_lemmas)}]"
    span_pos = [p for p in pos_tags[ws:we + 1] if p]
    if span_pos:
        yield f"POS_SEQ_[{' '.join(span_pos)}]"
    for i in range(ws, we + 1):
        if dep_labels and i < len(dep_labels) and dep_labels[i]:
            yield f"DEP_LABEL_[{dep_labels[i]}]"
        if dep_parents and i < len(dep_parents):
            h = dep_parents[i]
            if 0 <= h < len(lemmas) and h != i and lemmas[h]:
                yield f"DEP_HEAD_LEMMA_[{lemmas[h].lower()}]"


def _visual_unary(row: dict, prefix: str) -> Iterator[str]:
    """Visual-layout features — the webtext payload carries no visual arrays
    (sentences have no page/bbox columns), so this is a structural no-op
    gate matching the reference's is_visual() check
    (visual_features.py:43,56). Kept as the extension point for PDF/hOCR
    payloads."""
    if row.get(f"{prefix}page") is None:
        return
    yield f"PAGE_[{row[f'{prefix}page']}]"  # pragma: no cover


def _tabular_unary(row: dict, prefix: str) -> Iterator[str]:
    """Unary tabular features (tabular_features.py:74-131)."""
    if row.get(f"{prefix}cell_sid") is None:
        return
    rs, re_ = row[f"{prefix}row_start"], row[f"{prefix}row_end"]
    cs, ce = row[f"{prefix}col_start"], row[f"{prefix}col_end"]
    yield f"ROW_NUM_[{rs}]"
    yield f"COL_NUM_[{cs}]"
    if re_ != rs:
        yield f"ROW_SPAN_[{re_ - rs + 1}]"
    if ce != cs:
        yield f"COL_SPAN_[{ce - cs + 1}]"


def _structural_unary(row: dict, prefix: str) -> Iterator[str]:
    """Structural/DOM features (structural_features.py:77-99)."""
    tag = row.get(f"{prefix}html_tag")
    xpath = row.get(f"{prefix}xpath") or ""
    if tag:
        yield f"TAG_[{tag}]"
    parts = [p for p in xpath.split("/") if p]
    if len(parts) >= 2:
        parent = parts[-2].split("[")[0]
        yield f"PARENT_TAG_[{parent}]"
    for p in parts[:-1]:
        yield f"ANCESTOR_TAG_[{p.split('[')[0]}]"
    attrs = row.get(f"{prefix}html_attrs") or []
    for a in attrs:
        yield f"HTML_ATTR_[{a.split('=')[0]}]"


def _binary_feats(row: dict) -> Iterator[str]:
    """Relation-level features (tabular_features.py:132-191,
    structural_features.py:100-117)."""
    if row.get("a_sentence_sid") == row.get("b_sentence_sid"):
        yield "SAME_SENTENCE"
    a_t, b_t = row.get("a_table_sid"), row.get("b_table_sid")
    if a_t is not None and b_t is not None:
        if a_t == b_t:
            yield "SAME_TABLE"
            rd = min(
                abs(row["a_row_start"] - row["b_row_end"]),
                abs(row["a_row_end"] - row["b_row_start"]),
                abs(row["a_row_start"] - row["b_row_start"]),
            )
            cd = min(
                abs(row["a_col_start"] - row["b_col_end"]),
                abs(row["a_col_end"] - row["b_col_start"]),
                abs(row["a_col_start"] - row["b_col_start"]),
            )
            yield f"SAME_TABLE_ROW_DIFF_[{rd}]"
            yield f"SAME_TABLE_COL_DIFF_[{cd}]"
            yield f"SAME_TABLE_MANHATTAN_DIST_[{rd + cd}]"
            if row.get("a_cell_sid") == row.get("b_cell_sid"):
                yield "SAME_CELL"
        else:
            yield "DIFF_TABLE"
    # common xpath-prefix ancestor (structural.py:172-221)
    xa = (row.get("a_xpath") or "").split("/")
    xb = (row.get("b_xpath") or "").split("/")
    common = 0
    for pa, pb in zip(xa, xb):
        if pa != pb:
            break
        common += 1
    if common > 1:
        yield f"COMMON_ANCESTOR_[{'/'.join(xa[:common])}]"
        yield f"LOWEST_ANCESTOR_DEPTH_[{min(len(xa), len(xb)) - common}]"


CustomFeatureFn = Callable[[dict], Iterator[str]]


def featurize(
    candidates: DataFrame,
    sentences: Optional[DataFrame] = None,
    libs: Sequence[str] = ("textual", "tabular", "structural"),
    custom: Sequence[CustomFeatureFn] = (),
) -> DataFrame:
    """candidates -> features(candidate_sid, keys[], values[]).

    ``sentences``: the parsed contexts frame (or a sentence slice); needed
    only for the textual library's token windows. When omitted, textual
    features fall back to span-text-only features.
    """
    df = candidates
    have_words = False
    want_lingual = "lingual" in libs or "textual" in libs
    if sentences is not None and ("textual" in libs or "lingual" in libs):
        sent = (
            sentences.where(F.col("ctx_type") == "sentence")
            if "ctx_type" in sentences.columns else sentences
        )
        for p in ("a_", "b_"):
            slim = sent.select(
                F.col("stable_id").alias(f"{p}sentence_sid"),
                F.col("words").alias(f"{p}sent_words"),
                F.col("lemmas").alias(f"{p}sent_lemmas"),
                F.col("pos_tags").alias(f"{p}sent_pos"),
                F.col("dep_labels").alias(f"{p}sent_dep_labels"),
                F.col("dep_parents").alias(f"{p}sent_dep_parents"),
            )
            df = df.join(slim, f"{p}sentence_sid", "left")
        have_words = True

    libset = set(libs)
    custom_fns = list(custom)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for row in pdf.to_dict("records"):
                keys: List[str] = []
                seen = set()

                def emit(prefix: str, name: str) -> None:
                    k = prefix + name
                    if k not in seen:
                        seen.add(k)
                        keys.append(k)

                for i, p in enumerate(("a_", "b_")):
                    pre = f"e{i}_"
                    if "textual" in libset:
                        words = (row.get(f"{p}sent_words")
                                 if have_words else None)
                        if words is None:
                            words = (row.get(f"{p}span_text") or "").split()
                            ws_we = (0, len(words) - 1)
                            srow = dict(row)
                            srow[f"{p}word_start"], srow[f"{p}word_end"] = ws_we
                            for name in _textual_unary(srow, p, list(words)):
                                emit(pre, name)
                        else:
                            for name in _textual_unary(row, p, list(words)):
                                emit(pre, name)
                            for name in _lingual_unary(
                                row, p,
                                row.get(f"{p}sent_lemmas"),
                                row.get(f"{p}sent_pos"),
                                row.get(f"{p}sent_dep_labels"),
                                row.get(f"{p}sent_dep_parents"),
                            ):
                                emit(pre, name)
                    if "visual" in libset:
                        for name in _visual_unary(row, p):
                            emit(pre, name)
                    if "tabular" in libset:
                        for name in _tabular_unary(row, p):
                            emit(pre, name)
                    if "structural" in libset:
                        for name in _structural_unary(row, p):
                            emit(pre, name)
                for name in _binary_feats(row):
                    emit("", name)
                for cfn in custom_fns:
                    for name in cfn(row):
                        emit("", name)
                out.append({
                    "candidate_sid": row["candidate_sid"],
                    "candidate_type": row.get("candidate_type"),
                    "url": row.get("url") or row.get("a_url"),
                    "keys": keys,
                    "values": [1.0] * len(keys),
                })
            yield pd.DataFrame(
                out, columns=["candidate_sid", "candidate_type", "url",
                              "keys", "values"])

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def feature_keys(features: DataFrame) -> DataFrame:
    """Global FeatureKey table (featurizer.py:285-295): name ->
    candidate_classes[]; built on the train split only, as the reference
    does — the explode+distinct is a wide shuffle at corpus scale."""
    return (
        features.select(F.explode("keys").alias("key"), "candidate_type")
        .groupBy("key")
        .agg(F.collect_set("candidate_type").alias("candidate_classes"))
    )


def aligned_ngram_features(
    mentions: DataFrame, axis: str = "row", n_max: int = 1
) -> DataFrame:
    """ROW_/COL_ aligned-cell ngram features as a relational aggregation.

    The reference walks aligned cells per candidate with an lru_cache
    (tabular_features.py:100-124, utils_table.py:59-146); here the per-
    (table, row|col) vocabularies are computed once by aggregation and can
    be joined back to mentions — one shuffle, reusable across candidates.
    Output: (url, table_sid, pos, ngrams[]).
    """
    pos_col = f"{axis}_start"
    toks = F.split(F.lower(F.col("span_text")), r"\s+")
    return (
        mentions.where(F.col("table_sid").isNotNull())
        .select("url", "table_sid", F.col(pos_col).alias("pos"),
                F.explode(toks).alias("tok"))
        .groupBy("url", "table_sid", "pos")
        .agg(F.collect_set("tok").alias("ngrams"))
    )
