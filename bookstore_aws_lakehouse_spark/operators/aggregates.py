"""Aggregation operators (SURVEY §2.4: A1-A7, plus rollup/cube/pivot).

All compile to HashAggregate(partial) → Exchange → HashAggregate(final):
map-side combine means the shuffle carries one row per (partition, group),
not per input row — the property that makes these scale to 100 TB.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """A1 — hash group-by with named aggregates.

    Reference flagship: ``.groupby("ISBN","Book-Title").agg(F.avg(...),
    F.count(...))`` (`workflow/Transformer.py:99-100`). ``aggs`` maps output
    name → aggregate Column; every output is aliased so downstream consumers
    (and the DuckDB oracle) see stable names.
    """
    return df.groupBy(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])


def distinct_rows(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """A7 — dedup-as-aggregation (reference `workflow/Transformer.py:52,67`:
    ``.select(schema).distinct()`` builds the dimension tables).

    With ``columns``, projects first (so the Aggregate keys are only those
    columns — narrower shuffle) then distincts.
    """
    return (df.select(*columns) if columns else df).distinct()


def count_star_by(df: DataFrame, keys: Sequence[str], name: str = "cnt") -> DataFrame:
    """A4/A5/A6 — ``count(*)`` per group (reference
    `external-table-queries.sql:22-34`: customers per country / per state)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(name))


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: Mapping[str, Column]
) -> DataFrame:
    """Hierarchical subtotals — generalizes the reference's *manual* roll-up
    (two separate queries at country and country+state granularity,
    `external-table-queries.sql:21-34`) into one pass; Spark expands grouping
    sets in a single Aggregate, so the input is scanned once, not once per
    level."""
    return df.rollup(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Mapping[str, Column]) -> DataFrame:
    """All grouping-set combinations (beyond-reference, free from Spark)."""
    return df.cube(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Pivot with explicit value list (beyond-reference).

    Passing ``pivot_values`` explicitly avoids the extra distinct-values job
    Spark otherwise runs — at 100 TB that pre-pass is a full scan you don't
    want; the SQL-oracle twin is a FILTER'd conditional aggregate.
    """
    return df.groupBy(*keys).pivot(pivot_col, list(pivot_values)).agg(agg)
