"""Filter operators (SURVEY §2.2: P5, P6).

Thin by design: a filter is one Catalyst node. The value of keeping them as
named library functions is the registry/pipeline surface (plans/pipeline.py)
and a single place to document pushdown expectations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_equals(df: DataFrame, column: str, value) -> DataFrame:
    """P5 — equality predicate (reference `external-table-queries.sql:31`,
    ``WHERE country = 'usa'``). Pushed into the parquet scan by Catalyst
    (check ``PushedFilters`` in ``.explain("formatted")``)."""
    return df.filter(F.col(column) == F.lit(value))


def filter_expr(df: DataFrame, predicate: Column | str) -> DataFrame:
    """General predicate filter; accepts a Column or a SQL string.

    Also serves P6 (HAVING): applied *after* ``group_agg`` the Filter sits
    above the Aggregate, exactly like SQL HAVING
    (reference `workflow/Transformer.py:101`, `external-table-queries.sql:17`).
    """
    return df.filter(predicate)
