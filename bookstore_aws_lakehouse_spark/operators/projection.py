"""Projection-family operators (SURVEY §2.2: P1-P4, §2.7: F1-F5).

All pure column expressions — they stay inside whole-stage codegen and let
Catalyst collapse adjacent Projects and push the column needs into the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: string values conventionally meaning "missing" in dirty CSV data.
#: The reference only handles ``" "`` (`workflow/Transformer.py:36`); we
#: generalize per SURVEY §7.1.5 (catches ``""`` too).
DEFAULT_NULL_TOKENS: tuple[str, ...] = ("", " ", "NULL", "null", "N/A")


def select_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P1 — named-column projection (reference `workflow/Transformer.py:52`).

    Catalyst's ColumnPruning pushes this into the parquet scan (ReadSchema),
    so unused columns are never decoded.
    """
    return df.select(*columns)


def null_normalize(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    null_tokens: Sequence[str] = DEFAULT_NULL_TOKENS,
) -> DataFrame:
    """P2/F3 — rewrite sentinel strings to SQL NULL, preserving names.

    Reference: ``F.when(F.col(c) == " ", None).otherwise(F.col(c))`` over all
    columns (`workflow/Transformer.py:35-36`). Generalized to a configurable
    token set; non-string columns pass through untouched (the reference would
    silently cast them — a bug class we avoid).
    """
    if columns is not None:
        missing = [c for c in columns if c not in df.columns]
        if missing:
            # a typo'd column in a CLEANING step must fail loudly — a
            # silent no-op lets sentinel rows flow into results unfiltered
            raise ValueError(f"null_normalize: columns not in DataFrame: {missing}")
    columns = list(columns) if columns is not None else df.columns
    string_cols = {f.name for f in df.schema.fields if f.dataType.simpleString() == "string"}
    from bookstore_aws_lakehouse_spark.functions.scalar import null_if_in

    exprs = []
    for c in df.columns:
        if c in columns and c in string_cols:
            exprs.append(null_if_in(F.col(c), tuple(null_tokens)).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


def expand_delimited(
    df: DataFrame,
    source: str,
    names: Sequence[str],
    delimiter: str = ",",
    trim: bool = True,
    drop_source: bool = False,
) -> DataFrame:
    """P3/F1/F2 — derive columns by splitting a delimited string.

    Reference: the ``Location -> City/State/Country`` expansion
    (`workflow/Transformer.py:15-18`). The reference leaves leading spaces on
    split tokens (latent bug, SURVEY §7.1.4); ``trim=True`` is our documented
    deviation. A single ``withColumns`` keeps it one Project node.

    ``delimiter`` is a LITERAL string: Spark's split takes a Java regex,
    so metachars are escaped here — an unescaped '|' would match the
    empty string and shred every value into single characters.
    """
    import re

    parts = F.split(F.col(source), re.escape(delimiter))
    new_cols = {}
    for i, name in enumerate(names):
        item = parts.getItem(i)
        new_cols[name] = F.trim(item) if trim else item
    out = df.withColumns(new_cols)
    return out.drop(source) if drop_source else out


def drop_null_keys(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P4 — drop rows with NULL in any key column.

    Reference: ``.na.drop(subset=columns)`` (`workflow/Transformer.py:23,37`).
    Compiles to a single Filter (AtLeastNNonNulls) directly above the scan —
    pushdown-eligible for IS NOT NULL on parquet.
    """
    return df.na.drop(subset=list(columns))
