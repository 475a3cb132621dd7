"""Local mirror of the driver's DuckDB-differential check.

Runs a Spark query and its oracle SQL on the same parquet fixtures and
compares row count, column names, and order-insensitive values — the same
contract as CORRECTNESS_r{N}.json, so parity failures surface in-repo
before the driver ever runs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from bookstore_aws_lakehouse_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = [c.lower() for c in out.columns]
    out = out[sorted(out.columns)]

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            # Full 17-significant-digit rendering (round-trip exact for
            # float64): the engine's determinism policy makes every value
            # either bit-exact or explicitly rounded, so ANY sub-ulp drift
            # is a real bug this check must catch — the earlier %.9g
            # masked exactly the avg(DECIMAL) divergence the driver would
            # have failed. Never collapse int-valued floats into ints
            # either: the driver hashes 1085.0 and 1085 differently.
            s = f"{v:.17g}"
            return s if ("." in s or "e" in s or "inf" in s) else s + ".0"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(str(norm_cell(x)) for x in v) + "]"
        return str(v)

    for c in out.columns:
        out[c] = out[c].map(norm_cell)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    """Assert Spark result == DuckDB result (order-insensitive)."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} duckdb={len(want)}"
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        sample = pd.concat(
            {"spark": got[diff_mask].head(5), "duckdb": want[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{name}: value mismatch; first diffs:\n{sample}")
