"""Vector math over ``array<float>`` columns — all JVM-side higher-order
functions (no Python UDF): ``zip_with`` + ``aggregate`` stay inside codegen,
so cosine similarity over 100 TB of embeddings never crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_vec(vals) -> Column:
    """A constant vector as ONE array literal. ``F.array(*[F.lit(v) ...])``
    costs one py4j round-trip per element (a 64-dim component embedded
    this way is ~300 gateway calls of pure driver time per build);
    ``F.lit(list)`` ships the whole array in a single call. ConstantFolding
    collapses the old CreateArray-of-literals to the identical array
    literal, so plans and values are unchanged. Falls back to the
    per-element form when any element is not a plain float (e.g. a NULL
    mean off an empty corpus), where list-literal type inference differs."""
    vals = list(vals)
    if all(isinstance(v, float) for v in vals):
        return F.lit(vals)
    return F.array(*[F.lit(v) for v in vals])


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (accumulates in double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL if either norm is zero."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def make_cosine_similarity_pandas():
    """Arrow-vectorized pandas_udf alternative to ``cosine_similarity`` —
    the pattern to reach for when vector math outgrows higher-order
    functions (e.g. matrix ops needing BLAS). Batches arrive as pandas
    Series of numpy arrays; numpy does the arithmetic per batch.

    The JVM path above is preferred for plain dot products (no Python
    round-trip); tests/test_vector.py proves both produce equal results.
    Returned from a factory so importing this module never requires Arrow.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: hints written as real objects, not strings — this module has
    # `from __future__ import annotations`, which would stringify inline
    # hints and break pandas_udf's signature inference
    def cosine_pandas(a, b):
        # NULL-vector rows and empty batches must mirror the JVM path:
        # np.stack would crash on a None element or a zero-length batch,
        # and a NaN result would flip IS NULL semantics vs the `when`
        # with no `otherwise` (NULL on zero norms)
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        mask = np.array(
            [x is not None for x in a.to_numpy()]
        ) & np.array([x is not None for x in b.to_numpy()])
        out = np.full(len(a), np.nan)
        if mask.any():
            va = np.stack(a.to_numpy()[mask]).astype("float64")
            vb = np.stack(b.to_numpy()[mask]).astype("float64")
            dots = (va * vb).sum(axis=1)
            norms = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                out[mask] = np.where(norms > 0, dots / norms, np.nan)
        # NaN -> None so Spark surfaces NULL, matching cosine_similarity
        return pd.Series(out).where(lambda v: v == v, None)

    cosine_pandas.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(cosine_pandas, "double")


def make_cosine_similarity_exact_pandas():
    """Arrow-vectorized cosine that is BIT-IDENTICAL to the JVM
    ``cosine_similarity`` (and to the DuckDB ``list_dot_product`` oracle):
    all three accumulators fold left-to-right over dims — an explicit
    per-dim loop of vectorized ops, the same trick as
    ``operators/similarity.py::lsh_bucket_tables`` — so hash-level parity
    survives while the per-row expression-tree cost (3 aggregates × dims
    lambda steps per pair) collapses into ~dims numpy passes per batch.
    Use for scoring large candidate-pair sets; inputs must be non-null
    (candidate generation already drops null vectors). Zero-norm rows
    yield NULL, exactly like the JVM ``when`` with no ``otherwise``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def cosine_exact(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="Float64")
        va = np.stack(a.to_numpy()).astype("float64")
        vb = np.stack(b.to_numpy()).astype("float64")
        ab = np.zeros(len(a), dtype="float64")
        aa = np.zeros(len(a), dtype="float64")
        bb = np.zeros(len(a), dtype="float64")
        for i in range(va.shape[1]):  # left-to-right: exact fold order
            ab += va[:, i] * vb[:, i]
            aa += va[:, i] * va[:, i]
            bb += vb[:, i] * vb[:, i]
        na, nb = np.sqrt(aa), np.sqrt(bb)
        ok = (na > 0) & (nb > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = ab / (na * nb)
        out = pd.array(vals, dtype="Float64")
        out[~ok] = pd.NA
        return pd.Series(out, dtype="Float64")

    cosine_exact.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(cosine_exact, "double")
