"""bookstore_aws_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference lakehouse (``yousefhosny1/bookstore-aws-lakehouse``):
star-schema ETL (extract → expand → clean → dims/fact/reporting → load),
the SQL analytics layer (join / group / having / top-k), and the extensions a
large-scale training-data pipeline needs (dedup, similarity search, text
analysis, multimodal plumbing, streaming).

Design: declarative DataFrame/SQL plans so Catalyst handles pushdown, pruning,
join strategy and AQE; Pandas UDFs only where built-ins cannot express the
semantics. See SURVEY.md for the reference-capability inventory.
"""

__version__ = "0.1.0"

from bookstore_aws_lakehouse_spark.session import get_spark  # noqa: F401
from bookstore_aws_lakehouse_spark.catalog import (  # noqa: F401
    TABLES,
    load_events,
    load_table,
    load_tables,
    register_views,
)
from bookstore_aws_lakehouse_spark.engine import Engine  # noqa: F401
