"""Compat layer driven by the reference's own sample dataset (read-only;
skipped when the reference checkout is absent). This is the strongest
drop-in proof available: the real raw CSV through the real flow."""

from __future__ import annotations

import os

import pytest

from bookstore_aws_lakehouse_spark.compat import Extractor, Transformer

SAMPLE = "/root/reference/data/sample-data.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SAMPLE), reason="reference sample data not present"
)


def test_reference_sample_through_compat_flow(spark):
    raw = Extractor().extract_csv(spark, SAMPLE)
    assert raw.count() == 100
    assert "Location" in raw.columns and "Book-Rating" in raw.columns

    t = Transformer()
    expanded = t.transform(raw, "ExpandData")
    assert {"City", "State", "Country"} <= set(expanded.columns)

    clean = t.transform(expanded, "CleanData")
    n_clean = clean.count()
    assert 0 < n_clean <= 100  # dirty rows (e.g. 'san jose, ,') dropped

    books = t.transform(clean, "BooksDimensionTable")
    customers = t.transform(clean, "CustomersDimensionTable")
    facts = t.transform(clean, "RatingsFactTable")
    # dims deduplicate; fact keeps one row per clean rating
    assert books.count() <= n_clean
    assert customers.count() <= n_clean
    assert facts.count() == n_clean

    # the reference pipeline's untrimmed-token quirk is visible in real data
    states = {r["State"] for r in clean.select("State").distinct().collect()}
    assert any(s.startswith(" ") for s in states if s)
