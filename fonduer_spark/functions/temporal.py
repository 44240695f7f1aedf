"""Temporal joins: distributed as-of join and bucketed range join.

Operators a time-ordered web/event corpus needs that Spark has no native
form of (the reference has none either — these extend the classic-DB
surface the way a stream-table system would):

- ``asof_join``: for every left row, the single most recent right row with
  ``right.ts <= left.ts`` on the same key — the classic point-in-time
  lookup (latest crawl snapshot per url, last error before a click).
  Implemented as the union-and-running-max trick: tag both sides, sort by
  (ts, side) inside each key partition, and take a running ``max`` of the
  right side's (ts, id) packed into ONE fixed-width string — window
  ``max`` skips nulls, so left rows see exactly the latest preceding
  right row.  One shuffle by key, no per-row Python, no join explosion:
  cost is a single sort of |L|+|R| rows, which survives any scale the
  key partitioning survives (hot keys: the window is order-preserving,
  so AQE skew hints or key salting with per-salt merge apply as usual).
  Fixed-width decimal strings make lexicographic max == numeric max in
  Spark AND the DuckDB oracle with zero overflow risk (a bigint packing
  of epoch-micros + id would need >63 bits).

- ``range_join_agg``: aggregate, per left row, all right rows of the same
  key with ``ts`` in ``(left.ts, left.ts + window]`` — a forward interval
  join.  Implemented by time-bucketing: both sides get integer bucket
  ``epoch_us div window_us``; each left row probes buckets {b, b+1} (a
  2-way explode of the probe side only), then the exact range filter.
  Every candidate pair shares an equi-join key, so Catalyst plans a plain
  shuffled/broadcast hash join — never a cartesian — and the candidate
  blowup is bounded by 2x the true matches plus same-bucket near-misses.

Determinism: ties and aggregates are integer-exact.  The packed running
max orders by (ts_micros, id); value sums use integer cents — both
engines (Spark / DuckDB oracle) reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(ts: str) -> Column:
    """Epoch microseconds of a timestamp column; accepts TIMESTAMP_NTZ
    by casting (exact under the package's UTC session timezone, matching
    DuckDB's epoch_us on naive timestamps)."""
    return F.unix_micros(F.col(ts).cast("timestamp"))

# Fixed widths for the packed (ts, id) string: 20 digits hold any positive
# epoch-microsecond value (< 10^20), 12 digits any id < 10^12. Timestamps
# must be post-1970 (negative micros would break the zero-pad ordering).
_TS_W = 20
_ID_W = 12


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    right_id: str = "event_id",
) -> DataFrame:
    """Most recent right row at-or-before each left row's ``ts`` per key.

    Returns ``left.* + asof_<right_id> (nullable bigint)``.  Inclusive
    semantics (``right.ts == left.ts`` matches): right rows sort before
    left rows at equal ``ts``.  Ties among right rows at the same ``ts``
    resolve to the largest ``right_id`` (the packed max is total-ordered).
    ``right_id`` must be a non-negative integer < 10**12 and ``ts``
    post-1970 (fixed-width decimal packing).
    """
    lt = left.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("string").alias("_packed"),
        F.struct(*left.columns).alias("_row"),
    )
    rt = right.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(-1).alias("_side"),
        F.concat(
            F.lpad(_micros(ts).cast("string"), _TS_W, "0"),
            F.lpad(F.col(right_id).cast("string"), _ID_W, "0"),
        ).alias("_packed"),
        F.lit(None).cast(
            lt.schema["_row"].dataType.simpleString()).alias("_row"),
    )
    # _side -1 sorts right rows first at equal _ts => inclusive as-of;
    # running max skips the left rows' null _packed.
    w = (Window.partitionBy("_k")
         .orderBy("_ts", "_side", "_packed")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = lt.unionByName(rt).withColumn("_best", F.max("_packed").over(w))
    return (
        u.where(F.col("_side") == 0)
        .select(
            "_row.*",
            F.substring(F.col("_best"), _TS_W + 1, _ID_W)
            .cast("long").alias(f"asof_{right_id}"),
        )
    )


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    left_id: str = "event_id",
    window_us: int = 600_000_000,
    cents_col: str = "value",
) -> DataFrame:
    """Per left row: count + integer-cent sum of right rows with the same
    key and ``ts`` strictly inside ``(left.ts, left.ts + window]``.

    Bucketed so the planner sees an equi-join on (key, bucket): the left
    (probe) side explodes to buckets {b, b+1}; the build side keeps one
    row per event.  Candidate pairs are then exact-filtered on the range.
    Output: ``left_id, key, n_after (long), cents_after (long)`` — one
    row per left row (zero-match rows kept with 0s).
    """
    win = int(window_us)
    l2 = left.select(
        F.col(left_id).alias("_lid"), F.col(key).alias("_k"),
        _micros(ts).alias("_lus"),
    ).withColumn(
        "_b", F.explode(F.array(
            F.expr(f"_lus div {win}"),
            F.expr(f"_lus div {win} + 1"),
        ))
    )
    r2 = right.select(
        F.col(key).alias("_k"),
        _micros(ts).alias("_rus"),
        F.round(F.col(cents_col) * 100).cast("long").alias("_cents"),
    ).withColumn("_b", F.expr(f"_rus div {win}"))
    hits = (
        l2.join(r2, ["_k", "_b"])
        .where((F.col("_rus") > F.col("_lus"))
               & (F.col("_rus") <= F.col("_lus") + win))
        .groupBy("_lid")
        .agg(F.count(F.lit(1)).alias("n_after"),
             F.sum("_cents").alias("cents_after"))
    )
    base = left.select(F.col(left_id).alias("_lid"), F.col(key).alias(key))
    return (
        base.join(hits, "_lid", "left")
        .select(
            F.col("_lid").alias(left_id), key,
            F.coalesce(F.col("n_after"), F.lit(0)).cast("long")
            .alias("n_after"),
            F.coalesce(F.col("cents_after"), F.lit(0)).cast("long")
            .alias("cents_after"),
        )
    )


def time_rollup(
    df: DataFrame,
    ts: str = "ts",
    cents_col: str = "value",
) -> DataFrame:
    """Hypertable-style continuous aggregate: ONE pass producing BOTH the
    per-hour and per-day rollups of an event stream (the multi-resolution
    materialization a time-series store keeps incrementally).

    Uses Spark's native ROLLUP so the two granularities share a single
    shuffle with map-side partial aggregation — at 10^12 rows this is one
    scan + one exchange, not one per resolution. The grand-total grouping
    set is dropped; ``level`` = 0 for hour rows, 1 for day rows; ``hour``
    is -1 on day rows (encoded, not NULL, so arrow/pandas bridges keep
    the column integral). Values aggregate as exact integer cents.
    """
    base = df.select(
        F.date_trunc("day", F.col(ts)).alias("day"),
        F.hour(F.col(ts)).alias("hour"),
        F.round(F.col(cents_col) * 100).cast("long").alias("_cents"),
    )
    return (
        base.rollup("day", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("_cents").alias("sum_cents"),
             F.grouping_id().cast("long").alias("level"))
        .where(F.col("level") < 3)  # keep (day,hour) + (day); drop ()
        .select(
            "day",
            F.coalesce(F.col("hour"), F.lit(-1)).cast("long").alias("hour"),
            "level",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
        )
    )
