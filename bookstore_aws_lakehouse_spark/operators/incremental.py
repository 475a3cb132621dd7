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

import functools
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _null_safe_cond(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> Column:
    """Conjunction of per-key ``<=>`` comparisons: SQL ``=`` never matches
    NULL with NULL, so an ordinary key join silently drops NULL-keyed
    groups — `eqNullSafe` keeps them (a NULL group key is one group, same
    as GROUP BY treats it)."""
    return functools.reduce(
        lambda a, b: a & b, [left[k].eqNullSafe(right[k]) for k in keys]
    )


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
    # null-safe semi-joins: a NULL key value must still select its rows
    old_base = snapshot_read(spark, table, v_from)
    new_base = snapshot_read(spark, table, v_to)
    old_rows = old_base.join(
        old_keys, _null_safe_cond(old_base, old_keys, keys), "left_semi"
    )
    new_rows = new_base.join(
        new_keys, _null_safe_cond(new_base, new_keys, keys), "left_semi"
    )
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
    ] + [
        # non-NULL-value count delta per sum column: the one extra bigint
        # that lets the merge distinguish "sum became 0" from "sum became
        # NULL" (SUM over zero non-NULL inputs is NULL; mart+delta
        # addition alone cannot see that when cancellation lands on 0)
        F.sum(F.when(F.col(c).isNotNull(), F.col("_w")).otherwise(0))
        .cast("bigint")
        .alias(f"d_nn_{c}")
        for c in sum_cols
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
    column (d_<source>).

    NULL-sum semantics: when the mart carries ``nn_<source>`` (the
    non-NULL-value count, as :func:`materialized_rollup_build` stores
    it) and the delta carries ``d_nn_<source>`` (rollup_delta always
    does), the merged sum is EXACT SQL: NULL iff the refreshed non-NULL
    count is zero. Without the nn column the merge falls back to
    addition-with-NULL-guards, which is rebuild-exact except for one
    unreachable-without-nn case: a group whose last non-NULL value is
    removed while NULL-value rows remain reads 0 instead of NULL
    (cancellation to 0 and collapse to all-NULL are indistinguishable
    from sums alone)."""
    groups = list(group_cols)
    # null-safe outer join: a NULL-valued group key is a single group (as
    # GROUP BY produced it) — plain equality would keep the stale mart row
    # AND the delta row as two separate NULL-key rows
    joined = mart.join(delta, _null_safe_cond(mart, delta, groups), "full_outer")
    n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("d_count"), F.lit(0)
    )
    out_cols = [
        F.coalesce(mart[g], delta[g]).alias(g) for g in groups
    ] + [n.alias(count_col)]
    delta_present = F.col("d_count").isNotNull()
    for mart_col, src in sum_col_map.items():
        nn, d_nn = f"nn_{src}", f"d_nn_{src}"
        if nn in mart.columns and d_nn in delta.columns:
            # exact mode: NULL iff zero non-NULL values remain — one
            # formula covers touched, untouched, new, and collapsed
            # groups (an untouched group's stored sum is NULL exactly
            # when its nn is 0, so coalesce(mart,0) is safe)
            new_nn = F.coalesce(mart[nn], F.lit(0)) + F.coalesce(
                F.col(d_nn), F.lit(0)
            )
            out_cols.append(
                F.when(new_nn == 0, F.lit(None))
                .otherwise(
                    F.coalesce(F.col(mart_col), F.lit(0))
                    + F.coalesce(F.col(f"d_{src}"), F.lit(0))
                )
                .alias(mart_col)
            )
            out_cols.append(new_nn.cast("bigint").alias(nn))
            continue
        out_cols.append(
            # a group the delta never touched keeps its stored sum
            # VERBATIM — including SQL's SUM-of-all-NULLs = NULL; blanket
            # coalescing to 0 made an incremental refresh diverge from a
            # from-scratch rebuild on exactly those groups
            # delta-touched groups where BOTH sides are NULL stay NULL:
            # a brand-new group whose source values are all NULL must
            # read NULL (SUM-of-all-NULLs), not 0 — same rebuild-parity
            # class as the untouched-group rule above
            F.when(
                delta_present
                & F.col(mart_col).isNull()
                & F.col(f"d_{src}").isNull(),
                F.lit(None),
            )
            .when(
                delta_present,
                F.coalesce(F.col(mart_col), F.lit(0))
                + F.coalesce(F.col(f"d_{src}"), F.lit(0)),
            )
            .otherwise(F.col(mart_col))
            .alias(mart_col)
        )
    return joined.select(*out_cols).filter(F.col(count_col) > 0)


# ---- materialized rollup: CREATE/REFRESH MATERIALIZED VIEW ----------------
#
# The productized IVM loop: the mart is ITSELF a snapshot table (atomic
# commits, readers keep a consistent version mid-refresh, the mart is
# time-travelable), and the mart's own committed manifest records which
# source version it reflects (``app.mv_state`` — the Delta txn-version
# pattern) — so mart content and watermark advance ATOMICALLY: no crash
# window can publish a refreshed mart with a stale as_of (which would
# re-apply the same CDC window and double-count), and REFRESH applies
# exactly [as_of, tip], a no-change refresh being a true no-op.


def _read_mv_state(spark: SparkSession, mart_table: str) -> tuple[dict, int]:
    from bookstore_aws_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        list_versions,
    )

    versions = list_versions(spark, mart_table)
    state = (
        (_read_manifest(spark, mart_table, versions[-1]).get("app") or {}).get(
            "mv_state"
        )
        if versions
        else None
    )
    if state is None:
        raise FileNotFoundError(
            f"{mart_table} carries no materialized-view state in its tip "
            f"manifest — run materialized_rollup_build first"
        )
    return state, versions[-1]


def materialized_rollup_build(
    spark: SparkSession,
    source_table: str,
    mart_table: str,
    key_cols: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> int:
    """CREATE MATERIALIZED VIEW: full count/sum aggregate of the source
    snapshot's tip, committed to the mart snapshot table, with the
    reflected source version durably recorded. Returns that version."""
    from bookstore_aws_lakehouse_spark.sources.snapshots import (
        list_versions,
        snapshot_overwrite,
        snapshot_read,
    )

    versions = list_versions(spark, source_table)
    if not versions:
        raise FileNotFoundError(f"no snapshot manifests under {source_table}")
    as_of = versions[-1]
    aggs = (
        [F.count(F.lit(1)).cast("bigint").alias(count_col)]
        + [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
        + [
            # per-sum-column non-NULL count: lets REFRESH keep exact SQL
            # NULL-sum semantics (see apply_rollup_delta) — without it, a
            # group collapsing to all-NULL values would read 0, not NULL
            F.count(c).cast("bigint").alias(f"nn_{c}")
            for c in sum_cols
        ]
    )
    mart = snapshot_read(spark, source_table, as_of).groupBy(
        list(group_cols)
    ).agg(*aggs)
    state = {
        "as_of_version": as_of,
        "key_cols": list(key_cols),
        "group_cols": list(group_cols),
        "sum_cols": list(sum_cols),
        "count_col": count_col,
    }
    snapshot_overwrite(mart, mart_table, app={"mv_state": state})
    return as_of


def materialized_rollup_refresh(
    spark: SparkSession, source_table: str, mart_table: str
) -> int:
    """REFRESH MATERIALIZED VIEW, incrementally: apply exactly the CDC
    window (recorded as_of → source tip) to the stored mart via
    rollup_delta/apply_rollup_delta, commit the refreshed mart as a new
    snapshot version, advance the state. Returns the number of source
    versions applied (0 = already fresh, nothing recomputed, nothing
    committed). The aggregate definition travels in the state file, so
    the caller needs only the two table paths — the REFRESH shape a
    scheduler invokes."""
    from bookstore_aws_lakehouse_spark.sources.snapshots import (
        list_versions,
        snapshot_overwrite,
        snapshot_read,
    )

    st, mart_v = _read_mv_state(spark, mart_table)
    v_from = st["as_of_version"]
    tip = list_versions(spark, source_table)[-1]
    if tip == v_from:
        return 0
    old_rows, new_rows = snapshot_changed_rows(
        spark, source_table, st["key_cols"], v_from, tip
    )
    delta = rollup_delta(old_rows, new_rows, st["group_cols"], st["sum_cols"])
    # pin the mart to the VERSION the state was read from: a concurrent
    # refresh committing in between must not have its content re-used as
    # the base for the same CDC window (that would apply the window
    # twice). Pinned, racing refreshes converge to identical content.
    mart = snapshot_read(spark, mart_table, mart_v)
    refreshed = apply_rollup_delta(
        mart,
        delta,
        st["group_cols"],
        st["count_col"],
        {f"sum_{c}": c for c in st["sum_cols"]},
    )
    # pin before committing: the new version's write must not re-read the
    # mart table it is about to supersede mid-plan. The advanced watermark
    # rides the SAME commit (app.mv_state) — content and state are atomic.
    snapshot_overwrite(
        refreshed.localCheckpoint(eager=True),
        mart_table,
        app={"mv_state": {**st, "as_of_version": tip}},
    )
    return tip - v_from
