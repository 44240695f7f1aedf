"""Event/sequence analytics operators (funnel, cohort, transitions,
market basket, correlation).

These are the classic product-analytics queries a training-data /
telemetry pipeline runs next to curation (the reference has no analytics
layer; this extends SURVEY.md §2.10's relational checklist with the
sequence-aware family). All hot paths are JVM column expressions; every
numeric output is either an exact integer or ONE double division /
rounded expression over exact integer (or exact decimal) sums, so the
DuckDB oracle reproduces values bit-for-bit (see CLAUDE.md float rules).

Scale notes (100 TB grading):
- funnel: one shuffle per stage on the user key, each stage's frame
  shrinks monotonically (stage k+1 joins only stage-k survivors); the
  per-stage join is a hash join on the same key so AQE coalesces it.
- cohort: two aggregations (first-touch, then census), both keyed on
  user / (cohort, offset) — no window over the full event stream.
- transitions: one window (lag) partitioned by user — the partition is a
  single user's events, never the global stream.
- basket_pairs: the classic co-occurrence self-join; per-basket cost is
  O(k^2) so ``max_basket_items`` bounds the blowup the same way max_df
  bounds the Jaccard shingle join (dedup.py).
- grouped_pearson: a single groupBy producing the six raw moments as
  EXACT decimals (inputs quantized to integers first), then constant
  per-group float math.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-touch funnel: per stage, how many users completed steps
    0..k in strict timestamp order (stage k counts users whose earliest
    step-k event is strictly after their earliest qualifying step-(k-1)
    event). Returns (stage int, step string, n_users long), one row per
    stage, ordered by stage.

    Each stage is min-aggregated then joined to the survivors of the
    previous stage — the classic cascading semi-join shape; the frames
    shrink monotonically so stage joins get cheaper, not costlier, and
    every shuffle is on the same user key.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    stages = [cur]
    for step in steps[1:]:
        cur = (
            events.where(F.col(type_col) == step)
            .join(cur.select(user_col, "_t"), user_col)
            .where(F.col(ts_col) > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        stages.append(cur)
    out = None
    for i, (step, frame) in enumerate(zip(steps, stages)):
        one = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("int").alias("stage"),
            F.lit(step).alias("step"),
            F.col("n_users"),
        )
        out = one if out is None else out.unionAll(one)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of each
    user's first event; for every (cohort_week, week_offset) cell, the
    number of distinct cohort users active that week. All-integer cells
    (both engines truncate weeks to Monday, so the day diff is an exact
    multiple of 7). Returns (cohort_week, week_offset, n_users).
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    act = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("act_week")
    ).distinct()
    return (
        act.join(first, user_col)
        .select(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week"))
                / F.lit(7)
            ).cast("int").alias("week_offset"),
            user_col,
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition census over per-user event
    sequences: lag(type) over (user ORDER BY ts, id) — the id tiebreak
    makes the sequence total-ordered, hence deterministic across
    engines — then a (from,to) count and ONE division for the row
    probability. Returns (from_type, to_type, n, p).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / F.sum("n").over(tot)).alias("p"),
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: Optional[int] = None,
) -> DataFrame:
    """Frequent co-occurring item pairs with support and confidence
    (association-rule mining's candidate-2 pass, the distributed
    market-basket kernel): distinct (basket,item) -> within-basket pairs
    (a < b) via a self-equi-join on the basket key -> pair support ->
    confidence = support / baskets-containing-a as ONE division.
    ``max_basket_items`` drops oversized baskets BEFORE the self-join
    (per-basket pair cost is O(k^2) — the same bounded-blowup contract
    as max_df in dedup.ngram_jaccard_pairs). Returns
    (item_a, item_b, n_pairs, n_a, conf long/double).
    """
    items = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    if max_basket_items is not None:
        sizes = items.groupBy("_b").agg(F.count(F.lit(1)).alias("_k"))
        items = (
            items.join(sizes.where(F.col("_k") <= max_basket_items), "_b")
            .select("_b", "_i")
        )
    a = items.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = items.select(F.col("_b"), F.col("_i").alias("item_b"))
    pair_n = (
        a.join(b, "_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .where(F.col("n_pairs") >= min_support)
    )
    item_n = items.groupBy(F.col("_i").alias("item_a")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    return pair_n.join(item_n, "item_a").select(
        "item_a",
        "item_b",
        "n_pairs",
        "n_a",
        (F.col("n_pairs") / F.col("n_a")).alias("conf"),
    )


def grouped_pearson(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: List[str],
    x_scale: int = 1,
    y_scale: int = 100,
    digits: int = 9,
) -> DataFrame:
    """Per-group Pearson correlation with cross-engine-deterministic
    arithmetic: inputs are quantized to exact integers (x*x_scale,
    y*y_scale rounded — e.g. cents), the six raw moments are summed as
    exact DECIMAL(38,0) (order-independent, no float accumulation), and
    only the final constant-size expression
    (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))
    runs in IEEE doubles, rounded to ``digits``. Scaling cancels in the
    ratio up to the shared rounding, so corr is scale-free. One shuffle
    (the groupBy); moments are map-side combined.
    """
    xi = F.round(F.col(x_col) * x_scale).cast("decimal(19,0)")
    yi = F.round(F.col(y_col) * y_scale).cast("decimal(19,0)")
    m = df.groupBy(*by).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(xi).cast("double").alias("_sx"),
        F.sum(yi).cast("double").alias("_sy"),
        F.sum(xi * xi).cast("double").alias("_sxx"),
        F.sum(yi * yi).cast("double").alias("_syy"),
        F.sum(xi * yi).cast("double").alias("_sxy"),
    )
    num = m["_n"] * m["_sxy"] - m["_sx"] * m["_sy"]
    dx = F.sqrt(m["_n"] * m["_sxx"] - m["_sx"] * m["_sx"])
    dy = F.sqrt(m["_n"] * m["_syy"] - m["_sy"] * m["_sy"])
    return m.select(
        *by,
        m["_n"].cast("long").alias("n"),
        F.round(num / (dx * dy), digits).alias("corr"),
    )
