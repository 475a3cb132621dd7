"""Join operators (SURVEY §2.3: J1 + standard variants).

The reference's only join is the SQL-layer inner equi-join of the books
dimension to the ratings fact (`external-table-queries.sql:14-15,37-38`).
Star-schema joins are the scale-critical path: the dimension side is orders
of magnitude smaller than the fact, so we broadcast it — the fact table is
never shuffled. At 100 TB of fact data that is the difference between a
map-side join and a cluster-wide sort-merge exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_dim_fact(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1 — fact ⋈ dimension equi-join.

    ``broadcast_dim=True`` hints Catalyst to replicate the dim to every
    executor (map-side hash join, zero shuffle of the fact). If the dim turns
    out large, AQE still falls back safely; without the hint Catalyst decides
    from stats. Join keys dedup via USING-style ``on`` so the output carries
    one copy of the key column.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on=on, how=how)


def detect_hot_keys(
    df: DataFrame,
    on: str | Sequence[str],
    threshold_frac: float = 0.01,
    max_keys: int = 64,
) -> list:
    """Keys holding more than ``threshold_frac`` of the rows — the
    candidates worth salting. One map-side-combinable count job whose
    result is at most ``max_keys`` driver-side values (bounded collect:
    this is planning metadata, not data). At 100 TB run it on a sample
    (``df.sample(0.001)``) — hot keys are by definition dense enough to
    survive sampling."""
    keys = [on] if isinstance(on, str) else list(on)
    # ONE raw scan: the grouped counts are cached so the total (their
    # sum) and the hot-key filter both read the aggregated result
    # instead of re-scanning the input (the probe used to pay two full
    # passes — count() then groupBy — on exactly the 100 TB inputs it
    # exists to plan for)
    grouped = df.groupBy(keys).count().cache()
    try:
        total = grouped.agg(F.sum("count")).first()[0] or 0
        if total == 0:
            return []
        rows = (
            grouped.filter(F.col("count") > total * threshold_frac)
            .orderBy(F.col("count").desc())
            .limit(max_keys)
            .collect()
        )
    finally:
        grouped.unpersist()
    if len(keys) == 1:
        return [r[keys[0]] for r in rows]
    return [tuple(r[k] for k in keys) for r in rows]


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: the skewed side gets a deterministic salt
    in [0, num_salts) (hash of the whole row — spreads a hot key's rows
    across tasks), the other side is replicated once per salt value, and
    the join key becomes (key, salt). A hot key that would pin one task now
    fans out over ``num_salts`` tasks at the cost of replicating the small
    side ``num_salts``×.

    AQE's skew-join splitting (on in session.py) handles most cases
    automatically; salting is for the residual ones — a single pathological
    key inside one shuffle block, or non-AQE engines.

    Only inner/left-flavored joins are allowed: the replicated side
    appears ``num_salts`` times, so right/full-outer would emit every
    unmatched replicated row once PER SALT (verified: num_salts copies).
    The salt is a HASHED per-partition counter, not a row hash — exact
    duplicate rows of the hot key must land on DIFFERENT salts or the hot
    key still pins one task (row hash can't do that), and the raw counter
    mod num_salts can't either: strided inputs (every 2nd row hot — e.g.
    sorted or interleaved data) would cycle through only a coset of the
    salts; murmur-hashing the counter first breaks any stride. Salt
    values never affect join RESULTS (only distribution), so the
    counter's run-to-run instability is harmless.

    ``hot_keys`` (the production form — pair with :func:`detect_hot_keys`):
    salt ONLY those key values. The replicated side then grows by
    ``num_salts × |hot rows|`` instead of ``num_salts ×`` its entire row
    count — at a 100 TB fact ⋈ 10 GB dim with three pathological keys,
    blanket replication ships 10 GB × num_salts through the shuffle while
    hot-key salting ships kilobytes. Cold keys keep salt 0 on both sides,
    so results are identical. Single-key joins only (the common skew
    case); multi-key hot sets need composite encoding by the caller.
    """
    if num_salts < 1:
        raise ValueError(
            f"num_salts must be >= 1 (got {num_salts}); pmod(hash, 0) "
            f"would yield NULL salts and an silently EMPTY join"
        )
    normalized = how.lower().replace("_", "")
    if normalized not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: the "
            "salt-replicated side would duplicate unmatched rows per salt"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if hot_keys is not None:
        if len(keys) != 1:
            raise ValueError(
                "hot_keys targeting supports single-key joins; encode a "
                "composite key into one column first"
            )
        hot = list(hot_keys)
        if not hot:  # nothing skewed: plain join, no replication at all
            return skewed.join(other, on=keys, how=how)
        k = keys[0]

        def is_hot(c):
            # null-safe membership: NULL is a legitimate hot key (the
            # textbook 40%-NULL-keys skew) — isin() would yield NULL and
            # silently skip the mitigation for exactly those rows
            import functools as _ft

            return _ft.reduce(
                lambda a, b: a | b, [c.eqNullSafe(F.lit(h)) for h in hot]
            )
        row_salt = F.pmod(
            F.hash(F.monotonically_increasing_id()), F.lit(num_salts)
        ).cast("int")
        salted_l = skewed.withColumn(
            "_salt", F.when(is_hot(F.col(k)), row_salt).otherwise(F.lit(0))
        )
        salted_r = other.withColumn(
            "_salt",
            F.explode(
                F.when(
                    is_hot(F.col(k)),
                    F.sequence(F.lit(0), F.lit(num_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        return salted_l.join(salted_r, on=keys + ["_salt"], how=how).drop("_salt")
    salted_l = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts)).cast("int")
    )
    salted_r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_l.join(salted_r, on=keys + ["_salt"], how=how).drop("_salt")


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of ``left`` with a match in ``right``; right columns never
    materialize, so the shuffle carries only the join key."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of ``left`` without a match in ``right``."""
    return left.join(right, on=on, how="left_anti")
