"""Readers (SURVEY §2.1: S1 parquet scan, S2 CSV scan, S5 bulk CSV load).

Reference: `workflow/Extractor.py:3-9` — a parquet reader and a
header+inferSchema CSV reader. We add the option that matters at scale:
an explicit schema. ``inferSchema=True`` on CSV is a *full extra pass over
the data* before the real read — at 100 TB that doubles the scan, so prefer
``schema=`` (one pass, stable types) and keep inference for exploration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1 — columnar scan; schema from footers, vectorized, pushdown-ready.

    (The reference sets ``.option('header','true')`` on its parquet read —
    a no-op it inherited from the CSV path; dropped here.)
    """
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = False,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """S2/S5 — headered CSV scan.

    ``schema`` (StructType or DDL string) is the production path; it also
    covers S5 (Redshift ``COPY ... IGNOREHEADER 1``: header skip + typed
    load in one read). ``mode`` controls dirty-row policy: PERMISSIVE
    (null-fill, the default), DROPMALFORMED, or FAILFAST — at 100 TB you
    choose explicitly whether one corrupt row kills the load.
    """
    reader = (
        spark.read.option("header", str(header).lower()).option("delimiter", delimiter)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.option("mode", mode).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """JSON lines scan (beyond-reference; same explicit-schema discipline)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
