"""Engine facade smoke."""

from __future__ import annotations

import pytest

from bookstore_aws_lakehouse_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_smoke):
    return Engine(spark=spark, sf_dir=sf_smoke)


def test_table_and_sql(eng):
    assert eng.table("nation").count() == 25
    assert eng.sql("SELECT count(*) AS n FROM nation").collect()[0]["n"] == 25


def test_run_registered_query(eng):
    df = eng.run("topk_books")
    assert df.columns == ["p_partkey", "p_name", "avg_rating", "total_ratings"]
    assert 0 < df.count() <= 100
    assert "HAVING" in (eng.oracle("topk_books") or "")


def test_unknown_query_raises(eng):
    with pytest.raises(ValueError, match="unknown query"):
        eng.run("nope")


def test_query_names_nonempty(eng):
    names = eng.query_names()
    assert "topk_books" in names and len(names) >= 80


def test_dashboard_views(spark, sf_smoke):
    """BI facade (SURVEY §3.3): ALL FOUR dashboard views must resolve and
    execute through the session catalog via spark.sql — the surface a BI
    client (Thrift Server in production) would attach to."""
    from bookstore_aws_lakehouse_spark.catalog import register_dashboard_views

    names = register_dashboard_views(spark, sf_smoke)
    assert len(names) == 4
    for name in names:
        df = spark.sql(f"SELECT * FROM {name}")
        assert df.columns, name
        assert df.count() > 0, name
    assert spark.table("dash_top10_countries").count() == 10
    # re-registration is idempotent (CREATE OR REPLACE)
    assert register_dashboard_views(spark, sf_smoke) == names


def test_ctas_via_sql(spark, sf_smoke):
    """CREATE TABLE AS SELECT through the session catalog (the SQL-first
    way to publish a mart table)."""
    from bookstore_aws_lakehouse_spark.catalog import register_views

    register_views(spark, sf_smoke)
    spark.sql("DROP TABLE IF EXISTS mart_nation_counts")
    spark.sql(
        """
        CREATE TABLE mart_nation_counts USING parquet AS
        SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey
        """
    )
    assert spark.table("mart_nation_counts").count() == 5
    spark.sql("DROP TABLE mart_nation_counts")
