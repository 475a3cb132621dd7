"""Data-quality operators: profiling, key checks, referential integrity,
snapshot diffing — the validation stage every production lakehouse load
runs before publishing a mart.

All checks are single-pass aggregates or key-joins: at 100 TB a profile is
one scan with partial aggregation; the FK-orphan check is a broadcast or
shuffle join on the key only (payload columns pruned away).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """One-row profile: row count, per-key-column null counts, distinct
    key combinations (uniqueness check: distinct == rows ⇒ key is unique
    AND null-free — count_distinct skips rows with a NULL in any key
    column, so null-keyed rows show up in the nulls_* columns, not in
    n_distinct_keys; the DuckDB oracle mirrors this with an explicit
    not-null filter because its tuple-count would otherwise include
    them). Single scan, one partial+final aggregate."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(*[F.col(c) for c in key_cols]).alias("n_distinct_keys"),
    ]
    for c in key_cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}"))
    return df.agg(*aggs)


def fk_orphans(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Referential integrity: fact rows whose key has no dimension match
    (anti-join on the key alone — dimension payload never moves)."""
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return fact.join(keys, on=fact_key, how="left_anti")


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """CDC-style diff of two snapshots keyed by ``key_cols``: one row per
    changed key with status 'added' / 'removed' / 'changed'. Row content
    is compared by a portable md5 over all non-key columns (sorted by
    name) — the engines never compare full payloads, just 32-byte hashes.
    Unchanged keys are dropped.

    Two hardenings: every field is LENGTH-PREFIXED before hashing
    (`len:value`), so a delimiter character inside a value can never make
    two different rows hash alike (plain concat_ws is ambiguous); and the
    key join is NULL-SAFE, so a NULL-keyed row present unchanged in both
    snapshots is correctly reported as unchanged instead of a phantom
    removed+added pair."""
    import functools

    keys = list(key_cols)

    def field(c: str) -> F.Column:
        cs = F.col(c).cast("string")
        return F.coalesce(
            F.concat(F.length(cs).cast("string"), F.lit(":"), cs), F.lit("N")
        )

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        value_cols = sorted(c for c in df.columns if c not in keys)
        h = F.md5(F.concat_ws("\x1f", *[field(c) for c in value_cols]))
        return df.select(*keys, h.alias(f"hash_{tag}"))

    o = hashed(old, "old")
    n = hashed(new, "new").select(
        *[F.col(k).alias(f"_n_{k}") for k in keys], "hash_new"
    )
    cond = functools.reduce(
        lambda a, b: a & b, [o[k].eqNullSafe(n[f"_n_{k}"]) for k in keys]
    )
    joined = o.join(n, on=cond, how="full_outer")
    status = (
        F.when(F.col("hash_old").isNull(), F.lit("added"))
        .when(F.col("hash_new").isNull(), F.lit("removed"))
        .when(F.col("hash_old") != F.col("hash_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *[F.coalesce(o[k], n[f"_n_{k}"]).alias(k) for k in keys], "status"
        )
    )


def split_by_expectations(
    df: DataFrame, rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Row-level data-quality EXPECTATIONS (the DLT ``@expect`` family's
    quarantine policy) — the complement of the snapshot table's CHECK
    constraints, which reject whole commits: here bad ROWS are routed to
    a side output tagged with every rule they failed, and the clean rows
    flow on. A rule fails only when its expression is FALSE (NULL passes,
    matching CHECK semantics — express non-null-ness explicitly).

    Returns ``(clean, quarantine)``; ``quarantine`` carries an extra
    ``failed_rules`` array<string> (rule names in dict order). One
    map-side Project evaluates every rule once — no shuffle, no second
    scan; at 100 TB the split costs what the scan costs. Rule names must
    not collide with ``df``'s columns."""
    if "failed_rules" in df.columns:
        raise ValueError("df already has a 'failed_rules' column")
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(F.expr(expr), F.lit(True)), F.lit(name))
                for name, expr in rules.items()
            ]
        )
    )
    tagged = df.withColumn("failed_rules", failed)
    clean = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    quarantine = tagged.filter(F.size("failed_rules") > 0)
    return clean, quarantine


def distribution_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_width: int = 100,
    max_bucket: int = 20,
    pin: bool = True,
) -> DataFrame:
    """Per-group distribution drift of a bucketed numeric column against
    the whole corpus — the mixture-monitoring check a curation pipeline
    runs per source/shard/ingestion batch: a source whose length (or
    score) histogram diverges from the corpus is mis-parsed, truncated,
    or off-distribution. One corpus scan; everything after the
    (group, bucket) count is constant-sized (≤ |groups|·(max_bucket+1)
    rows), so the report costs the same at any corpus size.

    Output per group: ``n_docs``, ``n_buckets`` (occupied), ``tvd``
    (total-variation distance vs the corpus histogram) and
    ``max_abs_dev`` (worst single-bucket share deviation).

    ``pin=True`` (default) localCheckpoints the (group, bucket) count
    frame EAGERLY — it feeds four consumers (group totals, bucket
    totals, the corpus total, and the grid's left join), which would
    otherwise re-scan the corpus once each (the label-drift lesson,
    NOTES_r17 §14: plan audit found FOUR FileScans); with the pin the
    final plan has exactly one corpus scan and zero FileScans
    downstream of it. ``pin=False`` keeps the plan fully lazy for
    plan-shape tests.

    Determinism contract: TVD's numerator Σ_b |c_gb·N − c_b·n_g| is an
    EXACT integer sum (DECIMAL(38,0) products — bigint·bigint overflows
    at ~10¹² docs), so the float appears only in one final division of
    identical values — no order-dependent float accumulation anywhere
    (a Σ(p−q)²/q chi-square would drift across engines; TVD + max are
    reduction-order-free). Rows with a NULL value OR a NULL group are
    excluded up front — a NULL group would otherwise fall through the
    null-unsafe grid join with every bucket count zeroed and report a
    fake tvd of 0.5 (review finding); callers wanting an 'unknown'
    group should coalesce the label before calling."""
    dec = "decimal(38,0)"
    d = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        # clamp to [0, max_bucket]: negative values land in bucket 0 on
        # BOTH engines (Spark floor(-x/w) = -1 but DuckDB's // truncates
        # toward zero — the clamp removes the divergence)
        F.greatest(
            F.least(
                F.floor(F.col(value_col) / bucket_width), F.lit(max_bucket)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("b"),
    )
    sb = d.groupBy("g", "b").agg(F.count(F.lit(1)).alias("c_gb"))
    if pin:
        # ≤ |groups|·(max_bucket+1) rows — KBs at any corpus size
        sb = sb.localCheckpoint(eager=True)
    s = sb.groupBy("g").agg(F.sum("c_gb").alias("n_g"))
    bb = sb.groupBy("b").agg(F.sum("c_gb").alias("c_b"))
    tot = bb.agg(F.sum("c_b").alias("n_tot"))
    grid = s.crossJoin(F.broadcast(bb)).crossJoin(F.broadcast(tot))
    j = grid.join(sb, ["g", "b"], "left").withColumn(
        "c_gb", F.coalesce(F.col("c_gb"), F.lit(0))
    )
    num = F.abs(
        F.col("c_gb").cast(dec) * F.col("n_tot").cast(dec)
        - F.col("c_b").cast(dec) * F.col("n_g").cast(dec)
    )
    dev = F.abs(
        F.col("c_gb") / F.col("n_g") - F.col("c_b") / F.col("n_tot")
    )
    return j.groupBy("g").agg(
        F.max("n_g").alias("n_docs"),
        F.count_if(F.col("c_gb") > 0).alias("n_buckets"),
        (
            F.sum(num).cast("double")
            / (
                F.lit(2.0)
                * F.max("n_g").cast("double")
                * F.max("n_tot").cast("double")
            )
        ).alias("tvd"),
        F.max(dev).alias("max_abs_dev"),
    ).withColumnRenamed("g", group_col)
