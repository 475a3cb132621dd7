"""Drop-in compatibility layer: the reference's exact public API
(`workflow/Extractor.py`, `workflow/Transformer.py:105-123`,
`workflow/Loader.py`, `spark-main.py` flow), backed by this engine's
operator library.

A user of the reference switches by changing one import — class names,
registry keys (``ExpandData``, ``CleanData``, ``BooksDimensionTable``,
``CustomersDimensionTable``, ``RatingsFactTable``, ``Top100Books``),
method signatures, default schemas and column names are identical.

Fidelity policy: this layer reproduces the reference's *behavior
bit-for-bit*, including its quirks — split tokens keep their leading
spaces, only ``" "`` counts as missing, Top-100 has no deterministic
tiebreak — because a drop-in must not silently change results. The
engine-canonical pipeline (plans/etl.py) is the one with the documented
fixes (SURVEY §7.1). Tested against reference-shaped literal rows in
tests/test_compat.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.operators.projection import (
    drop_null_keys,
    expand_delimited,
    null_normalize,
)
from bookstore_aws_lakehouse_spark.sources.readers import read_csv, read_parquet
from bookstore_aws_lakehouse_spark.sources.writers import write_csv


class Extractor:
    """Reference `workflow/Extractor.py` surface."""

    def extract_parquet(self, spark: SparkSession, path: str) -> DataFrame:
        # (the reference also sets a header option — a no-op on parquet)
        return read_parquet(spark, path)

    def extract_csv(self, spark: SparkSession, path: str) -> DataFrame:
        return read_csv(spark, path, header=True, infer_schema=True)


class ExpandDataTransformer:
    """`Location` → City/State/Country. Reference-faithful: tokens are NOT
    trimmed (`'tyler, texas, usa'` → `' texas'`)."""

    @staticmethod
    def transform(dataframe: DataFrame) -> DataFrame:
        return expand_delimited(
            dataframe, "Location", ["City", "State", "Country"], delimiter=",", trim=False
        )


class CleanDataTransformer:
    """`" "` → NULL over every column, then drop rows with NULL keys.
    Reference-faithful: only the single-space sentinel is caught."""

    @staticmethod
    def transform(
        dataframe: DataFrame,
        columns: list[str] | None = None,
    ) -> DataFrame:
        # None-sentinel, not a mutable list default: a shared default list
        # mutated by any caller would corrupt every later call of this
        # public drop-in API
        if columns is None:
            columns = ["Customer-ID", "ISBN", "Book-Rating", "Country", "State", "City"]
        return drop_null_keys(null_normalize(dataframe, null_tokens=(" ",)), columns)


class CustomersDimensionTableTransformer:
    @staticmethod
    def transform(
        dataframe: DataFrame,
        schema: list[str] | None = None,
    ) -> DataFrame:
        if schema is None:
            schema = ["Customer-ID", "Age", "City", "State", "Country"]
        return dataframe.select(schema).distinct()


class BooksDimensionTableTransformer:
    @staticmethod
    def transform(
        dataframe: DataFrame,
        schema: list[str] | None = None,
    ) -> DataFrame:
        if schema is None:
            schema = ["ISBN", "Book-Title", "Book-Author", "Year-Of-Publication", "Publisher"]
        return dataframe.select(schema).distinct()


class RatingsFactTableTransformer:
    @staticmethod
    def transform(
        dataframe: DataFrame,
        schema: list[str] | None = None,
    ) -> DataFrame:
        if schema is None:
            schema = ["ISBN", "Customer-ID", "Book-Rating"]
        return dataframe.select(schema)


class Top100BooksTransformer:
    """Group by (ISBN, title), avg rating (Spark's implicit string→double
    coercion), count(title), HAVING >= 100, top 100 by average."""

    @staticmethod
    def transform(
        dataframe: DataFrame,
        columns: list[str] | None = None,
    ) -> DataFrame:
        if columns is None:
            columns = ["ISBN", "Book-Title", "Book-Rating"]
        from bookstore_aws_lakehouse_spark.operators.aggregates import group_agg
        from bookstore_aws_lakehouse_spark.operators.filters import filter_expr

        agged = group_agg(
            dataframe.select(columns),
            ["ISBN", "Book-Title"],
            {
                "Average-Rating": F.avg("Book-Rating"),
                "Total-Ratings": F.count("Book-Title"),
            },
        )
        kept = filter_expr(agged, F.col("Total-Ratings") >= 100)
        # reference fidelity: no tiebreak — ties at the boundary resolve
        # arbitrarily, exactly as in the original
        return kept.orderBy(F.col("Average-Rating").desc()).limit(100)


class Transformer:
    """Registry + string dispatch, reference keys preserved."""

    def __init__(self) -> None:
        self.transformers = {
            "ExpandData": ExpandDataTransformer,
            "CleanData": CleanDataTransformer,
            "BooksDimensionTable": BooksDimensionTableTransformer,
            "CustomersDimensionTable": CustomersDimensionTableTransformer,
            "RatingsFactTable": RatingsFactTableTransformer,
            "Top100Books": Top100BooksTransformer,
        }

    def transform(self, dataframe: DataFrame, type: str, **kwargs) -> DataFrame:
        if type not in self.transformers:
            raise Exception(f"unknown transformer type: {type!r}")
        return self.transformers[type].transform(dataframe, **kwargs)


class Loader:
    """Reference `workflow/Loader.py` surface: headered CSV folder per
    table under ``path``."""

    def load(self, data: DataFrame, mode: str, path: str, table_name: str) -> None:
        write_csv(data, f"{path}/{table_name}", mode=mode, header=True)
