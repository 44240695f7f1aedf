"""Deterministic cardinality sketches.

KMV (k-minimum-values) distinct-count estimation: hash every value with
md5, keep the k smallest 32-bit hash prefixes per group, and estimate

    n_distinct ~= (k-1) * 2**32 div h_k        (h_k = k-th smallest hash)

— the classic bottom-k estimator (Bar-Yossef et al.), chosen over
HyperLogLog here because it is EXACTLY reproducible: the same md5 prefixes
and the same floor division replay bit-for-bit in the DuckDB oracle,
whereas Spark's approx_count_distinct (HLL++) and DuckDB's HLL disagree by
construction. Groups with fewer than k distinct hashes return the exact
count (the sketch is lossless below its capacity).

Scale design: the only heavy step is deduplicating (group, hash) — a
map-side-combinable shuffle — followed by a per-group top-k window over
the already-distinct hashes. Accuracy is ~1/sqrt(k-2) relative error
(k=64 -> ~13%, k=256 -> ~6%); memory is O(k) per group after the window.
A 32-bit hash space is ample: the estimator needs granularity near the
k-th minimum (~k/n * 2**32), so collisions only matter once n_distinct
approaches 2**32 per group — raise to a wider prefix there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SPACE = 1 << 32


def _hash32(col: Column) -> Column:
    """First 8 md5 hex chars as a 32-bit integer (the package's standard
    engine-portable hash; oracles replay it nibble-by-nibble)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate: (group_col, n_distinct_est).

    Exact below k distinct hashes, (k-1) * 2**32 div h_k above. All
    arithmetic is integer, so the estimate is engine-reproducible.
    """
    dh = df.select(
        F.col(group_col), _hash32(F.col(col)).alias("_h")).distinct()
    w = Window.partitionBy(group_col).orderBy("_h")
    topk = (
        dh.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
    )
    return (
        topk.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_hk"))
        .select(
            group_col,
            F.when(F.col("_n") < k, F.col("_n"))
            .otherwise(F.expr(
                f"{int(k - 1)} * {_SPACE}L div greatest(_hk, 1L)"))
            .cast("long").alias("n_distinct_est"),
        )
    )
