"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``bookstore_aws_lakehouse_spark/``; this module is
the thin registry façade. See ``bookstore_aws_lakehouse_spark/golden.py``
for the relational/golden set and the extension modules for dedup /
similarity / text / streaming queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bookstore_aws_lakehouse_spark.registry import load_all

GOLDEN, ORACLE = load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference Top-100-Books pattern) on sf0.001."""
    return GOLDEN["topk_books"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(GOLDEN)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return dict(ORACLE)
