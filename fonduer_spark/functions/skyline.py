"""Distributed skyline (Pareto frontier) — the classic preference query.

The reference has no preference-query operator (its query surface stops at
candidate retrieval; fonduer/candidates/candidates.py); this extends the
classic-DB checklist (SURVEY.md §2.10) with the standard two-phase
distributed skyline: a partition-local prune (safe: a locally-dominated
point is dominated, period — its dominator is global evidence) followed by
a global pass over the reduced candidate set. Same plan shape as the
MapReduce skyline literature (MR-BNL family); expressed entirely as
DataFrame window operations, no Python stages.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_min_max(
    df: DataFrame,
    minimize: str,
    maximize: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Exact 2-D skyline over DISTINCT points: rows (x, y) such that no
    other point has x' <= x AND y' >= y with at least one strict — i.e.
    minimize ``minimize``, maximize ``maximize``. (Flip a column's sign
    upstream for other orientations.) With ``by``, an independent
    skyline per group — the "best offers per category" form.

    Distinct-point semantics: exact duplicates collapse to one frontier
    row (duplicates never dominate each other — no strict part — so
    set-of-points is the well-defined output). NULL in either dim is
    dropped (incomparable under <=).

    Algorithm, the 2-D sort-scan skyline in window form: sort by
    (x asc, y desc); a point is on the frontier iff its y strictly
    exceeds the running max of y over all earlier points (an earlier
    point has x' <= x, so it dominates unless this y is strictly
    greater; y desc within equal x makes the equal-x group's max-y row
    the sole survivor). Applied twice:

      phase 1 — per PARTITION (Window.partitionBy(by + spark_partition_id)):
        removes every locally-dominated point. Safe prune, never drops a
        frontier point; for random partitioning the expected survivor
        count per partition is the partition's own frontier (O(log n)
        for independent dims).
      phase 2 — the same scan over the survivors, partitioned by ``by``
        only: exact.

    Scale: the distinct + phase 1 are ordinary shuffles. Grouped, phase 2
    is parallel per group — no single-partition exchange anywhere.
    Ungrouped, phase 2 is a single-partition sort of the REDUCED set —
    bounded by the sum of per-partition frontier sizes, not |input|.
    Disclosed boundary: anti-correlated data whose true frontier is
    itself huge makes any skyline output huge — the final sort is then
    the same class as any orderBy of the result. All comparisons, no
    arithmetic — no float determinism hazard cross-engine.
    """
    x, y = minimize, maximize
    g = list(by)
    pts = df.select(*g, x, y).where(
        F.col(x).isNotNull() & F.col(y).isNotNull()).distinct()

    def _scan(frame: DataFrame, part_cols: list) -> DataFrame:
        base = Window.partitionBy(*part_cols) if part_cols else Window
        w = (
            base.orderBy(F.col(x).asc(), F.col(y).desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            frame.withColumn("_rm", F.max(y).over(w))
            .where(F.col("_rm").isNull() | (F.col(y) > F.col("_rm")))
            .drop("_rm")
        )

    local = _scan(
        pts.withColumn("_pid", F.spark_partition_id()),
        g + ["_pid"]).drop("_pid")
    return _scan(local, g)
