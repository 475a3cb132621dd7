"""Temporal join operators Spark's API lacks natively: as-of join and
range (interval) join — built as *compositions of existing DataFrame ops*
(SURVEY's preferred path for missing operators), not UDFs.

As-of join — union + ordered window:
  tag both sides, union them, and per partition-key run a last-value
  window ordered by (time, side-marker); each left row picks up the most
  recent right row at-or-before it. One shuffle on the partition key —
  the same cost as a regular join, no per-row probing.

Range join — coarse-bucket equi-join + exact filter:
  a raw interval predicate forces nested-loop; bucketing time into
  range-sized cells and exploding each left row into the cells its window
  covers turns it into an equi-join on (key, cell) followed by an exact
  filter. Work scales with rows × cells-per-window, not |L|×|R|.
"""

from __future__ import annotations

import functools

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach ``value_cols`` (and the time) of the most
    recent right row with ``right.time <= left.time`` within the same
    ``by`` group (backward as-of; NULLs when no prior right row exists).

    Both inputs must share ``time_col`` and ``by`` names. Ties at equal
    time match (the right row sorts first via the side marker); if several
    RIGHT rows share one exact timestamp in a group, which one wins is
    unspecified — pre-aggregate the right side to one row per (key, time)
    when that can occur.
    """
    keys = list(by)
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    # equi-join ASOF semantics (DuckDB / SQL:2023): a NULL join key never
    # matches, and a right row with NULL time has no position on the
    # timeline — drop both from the MATCHING side (left rows keep flowing
    # through and surface NULL asof columns). Without this, NULLS-FIRST
    # ordering made a NULL-time right row the "earliest" match, and the
    # window's NULL partition matched NULL keys to each other.
    r = right.filter(
        F.col(time_col).isNotNull()
        & functools.reduce(
            lambda a, b: a & b, [F.col(k).isNotNull() for k in keys]
        )
    )
    r = r.select(
        *keys,
        F.col(time_col),
        *[F.col(c) for c in value_cols],
    ).withColumn("_side", F.lit(0))
    # align schemas: left gets null right-values, right gets null left-extras
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    # the right row travels as ONE struct (time + values): F.last with
    # ignorenulls over separate columns would skip a genuinely-NULL value
    # column independently and pair the latest right TIME with an older
    # right VALUE — the struct is non-null whenever a right row exists,
    # so the whole row wins or loses atomically
    r = r.withColumn(
        "_rrow",
        F.struct(
            F.col(time_col).alias("_rt"),
            *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        ),
    )
    l = l.withColumn("_rrow", F.lit(None).cast(r.schema["_rrow"].dataType))
    unioned = l.select(*lcols, "_side", "_rrow").unionByName(
        r.select(*lcols, "_side", "_rrow")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    null_key = functools.reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in keys]
    )
    filled = unioned.select(
        *lcols,
        "_side",
        # a NULL-key left row matches nothing (its window partition is
        # the NULL group, but equi-join semantics say no match)
        F.when(
            null_key, F.lit(None).cast(r.schema["_rrow"].dataType)
        ).otherwise(F.last("_rrow", ignorenulls=True).over(w)).alias("_asof_row"),
    )
    out = filled.filter(F.col("_side") == 1).select(
        *lcols,
        F.col("_asof_row._rt").alias(f"{time_col}{suffix}"),
        *[
            F.col(f"_asof_row._rv_{c}").alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_l: str,
    time_r: str,
    max_gap: int,
) -> DataFrame:
    """All (left, right) pairs with the same ``key`` and
    ``time_l < time_r <= time_l + max_gap`` (times are integers — epoch
    µs/ns — so bucket math is exact).

    Left rows explode into the two range-cells their window can touch;
    the equi-join on (key, cell) prunes everything else; the exact
    predicate finishes the job.

    Cells use INTEGER division (``div``), not float floor: epoch-ns
    values exceed 2^53, where ``floor(t / gap)`` in double assigns
    boundary-adjacent rows to the wrong cell and silently drops matching
    pairs from the equi-join.
    """
    cell_l = F.expr(f"{time_l} div {int(max_gap)}")
    l = left.withColumn("_cell", F.explode(F.array(cell_l, cell_l + 1)))
    r = right.withColumn("_cell", F.expr(f"{time_r} div {int(max_gap)}"))
    joined = l.join(r, on=[key, "_cell"])
    return (
        joined.filter(
            (F.col(time_r) > F.col(time_l))
            & (F.col(time_r) <= F.col(time_l) + max_gap)
        )
        .drop("_cell")
    )
