"""Reference-vs-engine ETL comparison on identical data.

Builds the reference-shaped raw ratings table once (parquet, reference
column names), then times:

  A) the REFERENCE pipeline, executed faithfully through compat.py —
     extract parquet → ExpandData → CleanData → 4 transforms → 4 CSV
     sinks, with the reference's structure: no caching (the shared
     clean prefix re-executes per sink) and CSV outputs
     (`spark-main.py:12-27`, `workflow/Loader.py:3`);

  B) this engine's canonical pipeline (plans/etl.py::run_etl): cached
     clean prefix, idempotent partitioned parquet sinks.

Prints one JSON line with both wall times at $SPARK_GRAFT_SF_DIR
(default sf0.1 — the same order of magnitude as the reference's 1.15 M
ratings on its 1-worker EMR cluster, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import shutil
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from bookstore_aws_lakehouse_spark.compat import Extractor, Loader, Transformer
    from bookstore_aws_lakehouse_spark.plans.etl import build_raw_ratings, run_etl
    from bookstore_aws_lakehouse_spark.session import get_spark

    spark = get_spark(
        app_name="reference-comparison",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )

    # stage the reference-shaped raw table (reference column names);
    # removed on exit — repeated benchmark runs would otherwise fill /tmp
    # with a full raw table + two marts per invocation
    staging = tempfile.mkdtemp(prefix="blhs_cmp_")
    raw_path = f"{staging}/book-ratings.parquet"
    renames = {
        "customer_id": "Customer-ID",
        "isbn": "ISBN",
        "book_rating": "Book-Rating",
        "location": "Location",
        "age": "Age",
        "book_title": "Book-Title",
        "book_author": "Book-Author",
        "year_of_publication": "Year-Of-Publication",
        "publisher": "Publisher",
    }
    raw = build_raw_ratings(spark, sf_dir)
    raw.select([F.col(a).alias(b) for a, b in renames.items()]).write.mode(
        "overwrite"
    ).parquet(raw_path)
    n_rows = spark.read.parquet(raw_path).count()  # warm footers/JVM

    # A) reference pipeline through the drop-in compat layer
    t0 = time.monotonic()
    E, T, L = Extractor(), Transformer(), Loader()
    raw_df = E.extract_parquet(spark, raw_path)
    expanded = T.transform(raw_df, "ExpandData")
    clean = T.transform(expanded, "CleanData")
    books = T.transform(clean, "BooksDimensionTable")
    customers = T.transform(clean, "CustomersDimensionTable")
    ratings = T.transform(clean, "RatingsFactTable")
    top100 = T.transform(clean, "Top100Books")
    mart_a = f"{staging}/mart_reference"
    L.load(books, "overwrite", mart_a, "Books")
    L.load(customers, "overwrite", mart_a, "Customers")
    L.load(ratings, "overwrite", mart_a, "Ratings")
    L.load(top100, "overwrite", mart_a, "Top100books")
    t_reference = time.monotonic() - t0

    # B) the engine's canonical pipeline FROM THE SAME staged raw parquet
    # (cached clean prefix, partitioned parquet sinks) — isolates the
    # pipeline-structure improvements from the raw-synthesis cost
    from bookstore_aws_lakehouse_spark.plans.etl import (
        CLEAN_PREFIX,
        books_dimension,
        customers_dimension,
        ratings_fact,
        top100_books,
    )
    from bookstore_aws_lakehouse_spark.plans.pipeline import fan_out

    t0 = time.monotonic()
    back = {b: a for a, b in renames.items()}
    raw_engine = spark.read.parquet(raw_path).select(
        [F.col(b).alias(a) for a, b in renames.items()]
    )
    clean_e = CLEAN_PREFIX.run(raw_engine)
    branches = fan_out(
        clean_e,
        {
            "dim_customers": customers_dimension,
            "dim_books": books_dimension,
            "fact_ratings": ratings_fact,
            "top100_books": lambda df: top100_books(df, 25),
        },
        cache=True,
    )
    mart_b = f"{staging}/mart_engine"
    for name, df in branches.items():
        df.write.mode("overwrite").parquet(f"{mart_b}/{name}")
    t_engine = time.monotonic() - t0

    print(
        json.dumps(
            {
                "metric": "etl_wall_clock",
                "unit": "sec",
                "sf_dir": sf_dir,
                "raw_rows": n_rows,
                "reference_pipeline_sec": round(t_reference, 3),
                "engine_pipeline_sec": round(t_engine, 3),
                "speedup": round(t_reference / t_engine, 2) if t_engine else None,
            }
        )
    )
    spark.stop()
    shutil.rmtree(staging, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
