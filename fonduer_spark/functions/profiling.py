"""One-pass column profiling census — the "profile before you train" step
a 100 TB ingest runs first: per column, row/null counts, EXACT distinct
cardinality, total canonical-string length, and lexicographic bounds.

Scale design (two-level census, no Expand, no per-column jobs):

- The naive ``df.agg(countDistinct(c1), countDistinct(c2), ...)`` plans a
  Catalyst ``Expand`` that replicates every input row once per distinct
  aggregate — n_cols x the scan volume through one shuffle. Per-column
  ``df.select(c).distinct().count()`` loops launch n_cols jobs and re-scan
  the table each time. Both are wrong at 100 TB.
- Instead: melt the projected columns with ``stack`` into (col_name, val)
  rows, then a TWO-LEVEL aggregation — ``groupBy(col_name, val).count()``
  first (map-side partial aggregation collapses each partition to its
  distinct (column, value) pairs BEFORE the shuffle, so low-cardinality
  columns ship a handful of rows no matter the input size), then
  ``groupBy(col_name)`` folds the level-1 census into one row per column.
  ONE scan, two shuffles whose volume is the distinct-pair count, not the
  row count.
- The melt does multiply rows n_cols x before the first partial agg; that
  cost stays inside the scan stage (no shuffle of melted raw rows). For
  free-text / near-unique columns whose distinct-pair census itself is
  huge, profile them with the KMV distinct sketch instead
  (functions/sketches.py — text_distinct_kmv) and keep this exact census
  for the dimensional columns.

Everything is integer arithmetic + lexicographic MIN/MAX on canonical
string form, so a SQL oracle replays every cell bit-identically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile ``cols`` of ``df`` in one pass; one output row per column.

    Each column is cast to its canonical STRING form first (callers
    pre-project types whose string form is engine-ambiguous — e.g. cast
    timestamps to DATE — so the census replays in any SQL engine).

    Output: col_name, n_rows, n_null, n_distinct (exact, non-null),
    sum_len (total string length over non-null cells), lex_min, lex_max
    (lexicographic bounds on the canonical string form; numeric bounds
    belong to a typed agg, not a mixed-type census).
    """
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    pairs = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    melted = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) AS (col_name, val)"))
    level1 = melted.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("cnt"))
    return level1.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("cnt"))),
            F.lit(0).cast("long")).alias("n_null"),
        F.count(F.when(F.col("val").isNotNull(), F.lit(1))).alias(
            "n_distinct"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNotNull(),
                         F.length("val").cast("long") * F.col("cnt"))),
            F.lit(0).cast("long")).alias("sum_len"),
        F.min("val").alias("lex_min"),
        F.max("val").alias("lex_max"),
    )
