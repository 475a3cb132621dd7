"""Incremental view maintenance from the snapshot change feed: refresh a
materialized rollup by touching ONLY the keys the CDC says changed,
instead of recomputing the aggregate from the full table — the
"incrementally update the 100 TB dashboard mart after a 1 GB merge"
shape. Works for the self-maintainable aggregates (count / sum — and
avg as sum/count at read time): each changed key contributes its NEW row
with weight +1 and its OLD row with weight −1; grouping the weighted
union yields a per-group delta that composes with the stored mart by
simple addition, and groups whose count reaches zero drop out.

Scale shape: the change feed is one keyed diff (snapshots.py::
snapshot_changes); the changed rows come back via LEFT SEMI joins of the
version-pinned reads against the (small) change-key set — Spark plans a
broadcast semi-join when the feed is small, and the mart merge is a
full-outer join on the group key, O(|groups|), never O(|rows|).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_changed_rows(
    spark: SparkSession,
    table: str,
    key_cols: Sequence[str],
    v_from: int,
    v_to: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full payload rows behind the change feed, split by side:
    ``(old_rows, new_rows)`` — the v_from rows of removed/changed keys
    and the v_to rows of added/changed keys. An update therefore appears
    on both sides (its −1 and +1 contributions), an insert only on new,
    a delete only on old — exactly the weighting rollup_delta expects."""
    from bookstore_aws_lakehouse_spark.sources.snapshots import (
        list_versions,
        snapshot_changes,
        snapshot_read,
    )

    keys = list(key_cols)
    if v_to is None:
        # pin "latest" ONCE: a writer committing between the feed and the
        # payload reads would otherwise make new_rows disagree with the
        # change keys they were selected by
        v_to = list_versions(spark, table)[-1]
    changes = snapshot_changes(spark, table, keys, v_from, v_to)
    old_keys = changes.filter(F.col("status").isin("removed", "changed")).select(keys)
    new_keys = changes.filter(F.col("status").isin("added", "changed")).select(keys)
    old_rows = snapshot_read(spark, table, v_from).join(old_keys, keys, "left_semi")
    new_rows = snapshot_read(spark, table, v_to).join(new_keys, keys, "left_semi")
    return old_rows, new_rows


def rollup_delta(
    old_rows: DataFrame,
    new_rows: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Per-group aggregate delta from changed rows: new minus old.
    Emits (group_cols..., d_count, d_<sum_col>...). One bounded shuffle
    over the CHANGED rows only — map-side combinable."""
    groups = list(group_cols)
    w_old = old_rows.select(*groups, *sum_cols, F.lit(-1).alias("_w"))
    w_new = new_rows.select(*groups, *sum_cols, F.lit(1).alias("_w"))
    aggs = [F.sum("_w").cast("bigint").alias("d_count")] + [
        F.sum(F.col(c) * F.col("_w")).alias(f"d_{c}") for c in sum_cols
    ]
    return w_old.unionByName(w_new).groupBy(groups).agg(*aggs)


def apply_rollup_delta(
    mart: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    count_col: str,
    sum_col_map: dict[str, str],
) -> DataFrame:
    """Merge a rollup delta into the stored mart: full-outer join on the
    group key, add counts and sums (absent side = 0), drop groups whose
    refreshed count reaches zero (fully-deleted groups must disappear,
    and brand-new groups must appear — both fall out of the outer join).
    ``sum_col_map`` maps the mart's sum column → the delta's source
    column (d_<source>)."""
    groups = list(group_cols)
    joined = mart.join(delta, groups, "full_outer")
    n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("d_count"), F.lit(0)
    )
    out_cols = [F.col(g) for g in groups] + [n.alias(count_col)]
    for mart_col, src in sum_col_map.items():
        out_cols.append(
            (
                F.coalesce(F.col(mart_col), F.lit(0))
                + F.coalesce(F.col(f"d_{src}"), F.lit(0))
            ).alias(mart_col)
        )
    return joined.select(*out_cols).filter(F.col(count_col) > 0)
