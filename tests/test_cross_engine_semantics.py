"""Executable portability contract: the cross-engine semantic rules this
engine's determinism policy is built on, pinned as tests against BOTH
engines so a version bump that changes any of them fails loudly."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def spark_scalar(spark, expr: str):
    return spark.range(1).selectExpr(f"{expr} AS v").collect()[0]["v"]


def duck_scalar(duck, expr: str):
    return duck.execute(f"SELECT {expr}").fetchone()[0]


@pytest.mark.parametrize(
    "expr",
    [
        "round(CAST(2.345 AS DOUBLE), 2)",
        "round(CAST(-2.345 AS DOUBLE), 2)",
        "round(CAST(0.125 AS DOUBLE), 2)",   # binary-representation edge
        "round(CAST(2.5 AS DOUBLE), 0)",
        "round(CAST(-2.5 AS DOUBLE), 0)",
    ],
)
def test_round_agrees(spark, duck, expr):
    assert spark_scalar(spark, expr) == duck_scalar(duck, expr), expr


@pytest.mark.parametrize(
    "spark_expr,duck_expr",
    [
        # floor() is the portable double→int path (bare casts diverge:
        # Spark truncates, DuckDB rounds)
        ("CAST(floor(-994.28) AS INT)", "CAST(floor(-994.28) AS INT)"),
        ("CAST(floor(100.5) AS INT)", "CAST(floor(100.5) AS INT)"),
        # exact integer division
        ("1704067798778549829 div 1000", "1704067798778549829 // 1000"),
        # modulo sign follows the dividend on both engines
        ("CAST(-7 % 3 AS INT)", "CAST(-7 % 3 AS INT)"),
        # md5 is the portable hash
        ("md5('abc')", "md5('abc')"),
        # int→string never surprises
        ("CAST(12345 AS STRING)", "CAST(12345 AS STRING)"),
        # 2-dp double → string (shortest round-trip on both)
        ("CAST(CAST(123.45 AS DOUBLE) AS STRING)", "CAST(CAST(123.45 AS DOUBLE) AS STRING)"),
    ],
)
def test_portable_expressions_agree(spark, duck, spark_expr, duck_expr):
    assert str(spark_scalar(spark, spark_expr)) == str(duck_scalar(duck, duck_expr))


def test_known_divergence_double_to_int_cast(spark, duck):
    """The divergence the floor() policy exists for: bare double→int."""
    s = spark_scalar(spark, "CAST(CAST(100.7 AS DOUBLE) AS INT)")
    d = duck_scalar(duck, "CAST(CAST(100.7 AS DOUBLE) AS INT)")
    assert s == 100 and d == 101  # truncate vs round — never rely on this


def test_decimal_sum_is_order_independent(spark):
    """The exact_sum foundation: decimal aggregation gives one answer at
    any partitioning, where double summation varies in the last ulps."""
    import random

    vals = [(round(random.Random(7).uniform(0, 1000), 2),) for _ in range(5000)]
    df = spark.createDataFrame(vals, ["v"])
    results = set()
    for parts in (1, 7, 32):
        r = (
            df.repartition(parts)
            .agg(F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"))
            .collect()[0]["s"]
        )
        results.add(r)
    assert len(results) == 1


@pytest.mark.parametrize(
    "u,w",
    [
        # the A-Res race key pow(u, 1/w) across the weight extremes the
        # weighted-sample operators document: tiny weights (exponent >> 1
        # drives keys toward 0), huge weights (exponent ~0 drives keys
        # toward 1, the rounding-sensitive regime), w=1 (key == u), and
        # representative fixture-scale token counts
        (0.000001, 1), (0.999999, 1),
        (0.5, 10), (0.5, 99), (0.123456, 37),
        (0.25, 1000000000),          # 1/w ~ 1e-9: keys collapse near 1
        (0.75, 1000000000),
        (0.9, 0.001),                # sub-unit weight: exponent 1000
        (0.314159, 2), (0.271828, 3),
    ],
)
def test_ares_race_key_agrees(spark, duck, u, w):
    """pow + round(…, 9) — the only float ops in weighted_sample_topk /
    weighted_sample_per_group — must produce the identical 9-dp key on
    both engines across the documented weight range, including the
    near-1 collapse regime where huge weights compress all keys into
    one rounding grain (membership then falls to the id tiebreak, which
    is exact)."""
    expr = f"round(pow(CAST({u} AS DOUBLE), 1.0 / CAST({w} AS DOUBLE)), 9)"
    assert spark_scalar(spark, expr) == duck_scalar(duck, expr), expr
