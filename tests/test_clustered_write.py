"""write_parquet_clustered: range-partitioned + sorted layout must yield
pairwise-disjoint per-file key ranges (the property all min/max data
skipping relies on), verified from parquet footers."""

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq

from bookstore_aws_lakehouse_spark.catalog import load_table
from bookstore_aws_lakehouse_spark.sources.writers import write_parquet_clustered


def _file_ranges(path: str, column: str) -> list[tuple]:
    out = []
    for f in sorted(pathlib.Path(path).glob("*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        lo = hi = None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx[column]).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def test_clustered_files_have_disjoint_ranges(spark, sf_smoke, tmp_path):
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = str(tmp_path / "clustered")
    write_parquet_clustered(li, p, ["l_partkey"], num_files=8)
    ranges = sorted(_file_ranges(p, "l_partkey"))
    assert len(ranges) > 1
    for (la, ha), (lb, _hb) in zip(ranges, ranges[1:]):
        # range partition boundaries may share the boundary value itself;
        # anything more overlapped defeats skipping
        assert ha <= lb, f"overlapping file ranges ({la},{ha}) vs ({lb},..)"
    # values survive the clustered rewrite bit-exactly
    back = spark.read.parquet(p)
    assert back.count() == li.count()
    a = li.groupBy().sum("l_quantity").collect()[0][0]
    b = back.groupBy().sum("l_quantity").collect()[0][0]
    assert a == b


def test_unclustered_baseline_overlaps(spark, sf_smoke, tmp_path):
    """Sanity: the same data written WITHOUT clustering produces
    overlapping per-file ranges — the contrast that makes the disjointness
    assertion above meaningful rather than vacuous."""
    li = load_table(spark, sf_smoke, "lineitem").select("l_partkey", "l_quantity")
    p = str(tmp_path / "scattered")
    li.repartition(8).write.parquet(p)
    ranges = sorted(_file_ranges(p, "l_partkey"))
    if len(ranges) <= 1:  # degenerate tiny fixture: nothing to contrast
        return
    overlaps = sum(
        1 for (la, ha), (lb, _hb) in zip(ranges, ranges[1:]) if ha > lb
    )
    assert overlaps > 0
