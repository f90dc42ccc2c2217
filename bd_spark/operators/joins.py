"""Temporal join operators Spark lacks natively: as-of join and
range join helpers.

The reference has no joins at all (SURVEY.md §2.6; closest relative is
Dict's per-document cartesian product, ops.rs:665-681). These are the
temporal joins a large-scale event/trade pipeline needs.

Scale design — the as-of join is the union-sort formulation:

    union(left+markers, right) → window(partition key, order time)
        → last(right cols, ignorenulls) → filter left rows

One shuffle on the key and one sort per partition — the same cost
envelope as a sort-merge join, with NO range-explosion (a naive
``left.join(right, lt >= rt).groupBy(max)`` materializes every
candidate pair: quadratic per key). Skewed keys can be pre-salted by
the caller; state per key is O(1) during the window scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_time <= left_time`` (direction='backward') or smallest
    ``right_time >= left_time`` ('forward') within the same key group.

    ``tolerance`` (an interval Column, e.g. ``F.expr("INTERVAL 7
    DAYS")``): matches farther than the tolerance are nulled out.
    Right-side timestamp is returned as ``_asof_time``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_time
    ]

    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_time],
        F.lit(None).cast(dict(right.dtypes)[right_time]).alias("_rt"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in keys and c != left_time
        ],
        F.col(right_time).alias("_rt"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = lhs.unionByName(rhs)

    if direction == "backward":
        # right rows sort before a left row at the same timestamp, so
        # an exactly-simultaneous right row IS an eligible match
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    matched = u.select(
        *u.columns,
        F.last("_rt", ignorenulls=True).over(w).alias("_m_t"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_cols
        ],
    ).where(F.col("_is_left") == 1)

    if tolerance is not None:
        if direction == "backward":
            in_tol = F.col("_m_t") >= F.col("_t") - tolerance
        else:
            in_tol = F.col("_m_t") <= F.col("_t") + tolerance
        matched = matched.select(
            *[c for c in matched.columns if not c.startswith("_m_")],
            F.when(in_tol, F.col("_m_t")).alias("_m_t"),
            *[
                F.when(in_tol, F.col(f"_m_{c}")).alias(f"_m_{c}")
                for c in right_cols
            ],
        )

    left_out = [c for c in left.columns if c not in keys and c != left_time]
    return matched.select(
        *keys,
        F.col("_t").alias(left_time),
        *left_out,
        F.col("_m_t").alias("_asof_time"),
        *[F.col(f"_m_{c}").alias(c) for c in right_cols],
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    range_pred: Column,
    aggs: list[Column],
    left_keep: list[str],
) -> DataFrame:
    """Equi-key + range-predicate join, aggregated per left row.

    The equality keys make this a sort-merge/shuffled-hash join with a
    residual range filter — NOT a cartesian range join; at 100 TB the
    shuffle is on the equality key only. ``aggs`` aggregate the
    matched right rows per left row (left rows with no match appear
    with empty-aggregate values via the left join).
    """
    cond = None
    for l, r in on:
        c = left[l] == right[r]
        cond = c if cond is None else cond & c
    j = left.join(right, cond & range_pred, "left")
    return j.groupBy(*[left[c] for c in left_keep]).agg(*aggs)
