"""LF helper library: the reference's data_model_utils re-expressed two ways.

The reference exposes per-candidate Python getters with lru_caches
(/root/reference/src/fonduer/utils/data_model_utils/{textual,tabular,
structural}.py). Here the same helpers exist as:

1. **Column expressions over the denormalized candidate frame** (same_table,
   same_row, ... — already in candidates_op) — the fast path for LFs;
2. **Neighborhood-vocabulary DataFrames** (row_ngrams / col_ngrams /
   sentence windows) built once by aggregation and joined onto candidates —
   replacing the reference's per-candidate cell walks
   (tabular.py:219-561) with one shuffle each;
3. **Row-level Python helpers** usable inside pandas LFs for exotic logic
   (overlap/is_superset, utils.py:40-84).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 2. neighborhood vocabularies (one aggregation each, joinable by key)
# ---------------------------------------------------------------------------
def row_ngrams(sentences: DataFrame, n_max: int = 1) -> DataFrame:
    """(url, table_sid, row) -> ngrams[]: every token appearing in the row
    (reference get_row_ngrams, tabular.py:219-280, relationally)."""
    return _axis_ngrams(sentences, "row_start", "row")


def col_ngrams(sentences: DataFrame, n_max: int = 1) -> DataFrame:
    """(url, table_sid, col) -> ngrams[] (reference get_col_ngrams)."""
    return _axis_ngrams(sentences, "col_start", "col")


def _axis_ngrams(sentences: DataFrame, pos_col: str, out_name: str) -> DataFrame:
    sent = (
        sentences.where(F.col("ctx_type") == "sentence")
        if "ctx_type" in sentences.columns else sentences
    )
    return (
        sent.where(F.col("table_sid").isNotNull())
        .select(
            "url", "table_sid", F.col(pos_col).alias(out_name),
            F.explode(F.transform(F.col("words"), lambda w: F.lower(w)))
            .alias("tok"),
        )
        .groupBy("url", "table_sid", out_name)
        .agg(F.array_distinct(F.collect_list("tok")).alias("ngrams"))
    )


def with_row_ngrams(candidates: DataFrame, sentences: DataFrame,
                    slot: str = "b_") -> DataFrame:
    """Join the row vocabulary of a slot's cell onto the candidates frame —
    LFs can then test membership with pure array ops
    (e.g. F.arrays_overlap(F.col('b_row_ngrams'), F.array(F.lit('storage'))))."""
    vocab = row_ngrams(sentences).withColumnsRenamed(
        {"ngrams": f"{slot}row_ngrams"})
    return candidates.join(
        vocab,
        (candidates[f"{slot}url"] == vocab.url)
        & (candidates[f"{slot}table_sid"] == vocab.table_sid)
        & (candidates[f"{slot}row_start"] == vocab.row),
        "left",
    ).drop(vocab.url).drop(vocab.table_sid).drop(vocab.row)


def neighbor_sentence_ngrams(sentences: DataFrame, d: int = 1) -> DataFrame:
    """(url, sentence stable_id) -> words of sentences within distance d by
    position (reference get_neighbor_sentence_ngrams, textual.py:167-197) —
    a window function, not a per-candidate walk."""
    sent = (
        sentences.where(F.col("ctx_type") == "sentence")
        if "ctx_type" in sentences.columns else sentences
    )
    w = Window.partitionBy("url").orderBy("position").rowsBetween(-d, d)
    return sent.select(
        "url",
        F.col("stable_id").alias("sentence_sid"),
        F.array_distinct(
            F.flatten(F.collect_list(F.col("words")).over(w))
        ).alias("neighborhood"),
    )


# ---------------------------------------------------------------------------
# 1. span-window column helpers over the candidate frame
# ---------------------------------------------------------------------------
def get_between_ngrams_col(sent_words: Column, a_we: Column, b_ws: Column) -> Column:
    """Tokens strictly between two same-sentence spans
    (reference get_between_ngrams, textual.py:11-48)."""
    return F.slice(sent_words, a_we + 2, F.greatest(F.lit(0), b_ws - a_we - 1))


def get_left_ngrams_col(sent_words: Column, word_start: Column,
                        window: int = 3) -> Column:
    """Up to ``window`` tokens left of a span (reference get_left_ngrams,
    textual.py:51-88) — pure array slicing over the denormalized columns."""
    start = F.greatest(F.lit(1), word_start - window + 1)
    return F.slice(sent_words, start,
                   F.greatest(F.lit(0), word_start + 1 - start))


def get_right_ngrams_col(sent_words: Column, word_end: Column,
                         window: int = 3) -> Column:
    """Up to ``window`` tokens right of a span (reference get_right_ngrams,
    textual.py:91-128)."""
    return F.slice(sent_words, word_end + 2, window)


def get_sentence_ngrams_col(sent_words: Column) -> Column:
    """All tokens of the span's sentence (reference get_sentence_ngrams,
    textual.py:131-147)."""
    return sent_words


# ---------------------------------------------------------------------------
# 3. row-level python helpers for pandas LFs (reference utils.py:40-84)
# ---------------------------------------------------------------------------
def overlap(a: Iterable, b: Iterable) -> bool:
    """True when the two collections share any element."""
    return not set(a).isdisjoint(b)


def is_superset(a: Iterable, b: Iterable) -> bool:
    """True when a contains every element of b."""
    return set(a) >= set(b)


def get_matches(pattern, words: Sequence[str]) -> List[str]:
    """Words matching a compiled regex (reference get_matches analogue)."""
    return [w for w in words if pattern.search(w)]
