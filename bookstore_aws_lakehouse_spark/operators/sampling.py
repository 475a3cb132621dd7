"""Dataset splitting / mixing / sampling for training pipelines.

Reproducibility rule: splits are **hash-based, not RNG-based**. A hash of
the stable record id decides membership, so the split is identical across
engines, runs, partitionings, and cluster sizes — and adding new records
never reshuffles old ones between splits (RNG-with-seed can't promise any
of that). ``F.sample`` stays available for quick approximate sampling, but
anything that feeds training uses these.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.operators.dedup import md5_hash64


def split_bucket(id_col: Column | str, salt: str = "split", modulus: int = 1000) -> Column:
    """Stable bucket in [0, modulus) from the record id (md5-portable).
    A NULL id yields a NULL bucket — matching SQL's ``salt || id``
    (NULL-propagating), so every ``bucket < cut`` gate is simply FALSE
    for NULL ids on both engines. Without this, concat_ws SKIPPED the
    NULL and hashed the salt alone, collapsing every NULL-id row into
    one arbitrary bucket that diverged from the SQL twins."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.when(
        c.isNull(), F.lit(None).cast("bigint")
    ).otherwise(
        F.pmod(
            md5_hash64(F.concat_ws(":", F.lit(salt), c.cast("string"))),
            F.lit(modulus),
        )
    )


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.2, salt: str = "split"
) -> DataFrame:
    """Tag every row 'train' / 'test' by hash bucket. Deterministic,
    engine-portable, stable under data growth."""
    cut = int(round(test_fraction * 1000))
    return df.withColumn(
        "split",
        F.when(split_bucket(id_col, salt) < cut, F.lit("test")).otherwise(F.lit("train")),
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    test_fraction: float = 0.2,
    salt: str = "gsplit",
) -> DataFrame:
    """Split by duplicate GROUP, not by row: the bucket hashes the
    normalized text fingerprint, so every exact/near-exact copy of a
    document lands on the same side. A per-id split silently leaks —
    copy A trains while copy B evaluates; hashing the content
    fingerprint makes that structurally impossible. Still map-side only
    (an expression per row — no join, no shuffle, no dedup pass), and
    stable under data growth like the id split.

    NULL text has no fingerprint to group by: such rows go to 'train'
    explicitly. (Without the guard, concat_ws inside the bucket hash
    silently SKIPS the NULL and hashes the salt alone — every NULL-text
    row would land in one arbitrary bucket, diverging from SQL twins
    where ``||`` propagates NULL.)"""
    from bookstore_aws_lakehouse_spark.operators.text import normalized_fingerprint

    cut = int(round(test_fraction * 1000))
    fp = normalized_fingerprint(text_col)
    return df.withColumn(
        "split",
        F.when(fp.isNull(), F.lit("train"))
        .when(split_bucket(fp, salt) < cut, F.lit("test"))
        .otherwise(F.lit("train")),
    )


SAMPLE_PPM = 1_000_000


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    target_per_stratum: int,
    salt: str = "strat",
) -> DataFrame:
    """Equalize class sizes: sample each stratum down to ~target rows.
    Per-stratum keep-rate = target/size in PARTS-PER-MILLION, applied as
    a deterministic id-hash gate — one tiny count aggregate broadcast
    back, then a map-side filter; the corpus itself never shuffles.
    ``floor`` before the int cast (Spark truncates double→int, DuckDB
    rounds).

    Two guarded edges: the rate clamps to ≥1 ppm so a stratum more than
    10⁶× the target still yields ~n/10⁶ rows instead of silently
    vanishing (the largest classes are the whole point of downsampling);
    and the counts join is NULL-SAFE so a NULL stratum (e.g. undetected
    language) samples like any other class instead of being dropped."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    counts = counts.select(F.col(stratum_col).alias("_stratum"), "_n")
    rate = F.greatest(
        F.lit(1),
        F.least(
            F.lit(SAMPLE_PPM),
            F.floor(target_per_stratum * float(SAMPLE_PPM) / F.col("_n")).cast("bigint"),
        ),
    )
    return (
        df.join(F.broadcast(counts), df[stratum_col].eqNullSafe(counts["_stratum"]))
        .filter(split_bucket(id_col, salt, modulus=SAMPLE_PPM) < rate)
        .drop("_n", "_stratum")
    )


def weighted_source_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: Mapping[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Down-sample each source to its weight (keep-fraction in [0,1]) —
    the corpus-mixing step of a training-data pipeline. Hash-gated per
    row: deterministic, no shuffle, no RNG drift between runs. Sources
    not in ``weights`` are dropped (weight 0)."""
    expr = None
    for src, w in weights.items():
        cond = F.col(source_col) == src
        cut = int(round(w * 1000))
        expr = F.when(cond, cut) if expr is None else expr.when(cond, cut)
    keep_cut = expr.otherwise(0) if expr is not None else F.lit(0)
    return df.filter(split_bucket(id_col, salt) < keep_cut)


def temperature_cuts(
    df: DataFrame, source_col: str, alpha: float = 0.7
) -> DataFrame:
    """Per-source temperature-sampling cuts: ``(source_col, n_src, cut)``
    with cut = round(1000·(n_min/n)^(1−α)) — keep rates ∝ n^(α−1)
    normalized so the smallest source keeps everything. One aggregate
    scan; the result is |sources| rows. Callers that both GATE and
    REPORT should compute this once (and pin it with localCheckpoint if
    reused) so the corpus is scanned once for counts and once for the
    gate — the two-scan minimum for data-derived weights."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_src"))
    n_min = counts.agg(F.min("n_src").alias("_n_min"))
    return counts.crossJoin(F.broadcast(n_min)).select(
        source_col,
        "n_src",
        F.round(
            F.lit(1000.0)
            * F.pow(F.col("_n_min") / F.col("n_src"), F.lit(1.0 - alpha))
        )
        .cast("int")
        .alias("cut"),
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int,
    salt: str = "wsamp",
    key_decimals: int = 9,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    every row draws a deterministic uniform u ∈ (0, 1] from its id hash
    and computes the race key u^(1/w); the k LARGEST keys are the sample.
    Inclusion probability is proportional to weight, no row can repeat,
    and — because u comes from the id hash, not an RNG — the same rows
    win on every engine, run, partitioning, and cluster size. New rows
    entering the corpus only ever displace losers near the boundary; the
    established winners' keys never change (an RNG reshuffles everything).

    Scale shape: the key is one map-side expression; ``ORDER BY key LIMIT
    k`` compiles to TakeOrderedAndProject — each partition keeps its local
    top-k heap and only k rows per partition reach the driver-side merge,
    so there is NO global sort and NO full shuffle at any corpus size.
    That makes this the 100 TB way to draw a token-budget-weighted subset
    (weight = token count ⇒ long documents sampled proportionally more,
    the standard budgeted-subcorpus draw).

    Cross-engine contract: u = (ppm_bucket + 1)/10⁶ is integer-exact;
    ``pow(u, 1/w)`` is the one float op, and the key is ROUNDED to
    ``key_decimals`` before ordering with the id as tiebreaker — engines
    can only disagree if pow lands within an ulp of a half-grain
    boundary, the same documented risk class as ``temperature_cuts``.
    Rows with NULL id (no bucket), NULL weight, or weight ≤ 0 are
    excluded (a non-positive weight has zero inclusion mass).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        split_bucket(id_col, salt, modulus=SAMPLE_PPM) + F.lit(1)
    ) / F.lit(float(SAMPLE_PPM))
    key = F.round(F.pow(u, F.lit(1.0) / w.cast("double")), key_decimals)
    return (
        df.filter(w.isNotNull() & (w > 0) & F.col(id_col).isNotNull())
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    group_col: str,
    k: int,
    salt: str = "wsampg",
    key_decimals: int = 9,
) -> DataFrame:
    """Per-group weighted sampling without replacement: the A-Res race of
    :func:`weighted_sample_topk`, run independently inside every group —
    draw k documents per language/source with inclusion ∝ weight. The
    standard per-stratum token-budget draw (`stratified_sample` equalizes
    COUNTS uniformly; this draws a fixed-size weighted subset per class).

    Shape: one map-side key expression + ``row_number() ≤ k`` over
    (group, key DESC, id). Spark rewrites that filter into
    WindowGroupLimit (plan-pinned in tests): each task keeps only its
    local top-k PER GROUP before the exchange, so the shuffle moves at
    most k·partitions rows per group instead of the whole group — the
    reason this survives a skewed 100 TB language distribution where a
    naive window sort would funnel the dominant language through one
    task. NULL groups form their own stratum (both engines partition
    NULLs together); NULL/non-positive weights and NULL ids are excluded
    as in the global draw."""
    from pyspark.sql import Window

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        split_bucket(id_col, salt, modulus=SAMPLE_PPM) + F.lit(1)
    ) / F.lit(float(SAMPLE_PPM))
    key = F.round(F.pow(u, F.lit(1.0) / w.cast("double")), key_decimals)
    win = Window.partitionBy(group_col).orderBy(
        F.col("sample_key").desc(), F.col(id_col)
    )
    return (
        df.filter(w.isNotNull() & (w > 0) & F.col(id_col).isNotNull())
        .withColumn("sample_key", key)
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= k)
    )


def shard_assignment(
    id_col: Column | str, n_shards: int, salt: str = "shard"
) -> Column:
    """Deterministic training-export shard for a record: a stable id-hash
    bucket in [0, n_shards). The content-addressed analogue of
    ``pmod(hash, n)`` file routing: re-running the export reproduces the
    exact same shard membership, so downstream dataloader order, resume
    points, and per-shard caches all survive a rebuild. NULL ids get a
    NULL shard (callers decide the policy; a silent bucket-0 default
    would hide id corruption)."""
    return split_bucket(id_col, salt, modulus=n_shards)


def shard_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Per-shard balance report for a sharded training export: row count,
    total whitespace tokens, total UTF-8 bytes, and the id range. One
    aggregation over the corpus (map-side combine into ≤ n_shards groups —
    the shuffle moves n_shards·partitions tiny rows, nothing else), which
    is exactly the audit a 100 TB export runs before publishing: a shard
    whose byte count is 2× its siblings means a skewed hash or corrupt
    ids, caught here instead of in dataloader throughput."""
    toks = F.size(F.split(F.col(text_col), " "))
    return (
        df.filter(F.col(id_col).isNotNull())
        .groupBy(shard_assignment(id_col, n_shards, salt).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).cast("bigint").alias("n_tokens"),
            F.sum(F.octet_length(F.col(text_col))).cast("bigint").alias("n_bytes"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def training_order(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    epoch: int = 0,
    salt: str = "shard",
) -> DataFrame:
    """Reproducible per-epoch training order: every record gets its shard
    (:func:`shard_assignment`) and a position within that shard, ordered
    by an EPOCH-SEEDED id hash — a different but fully deterministic
    permutation per epoch, with no RNG anywhere. This is the dataloader
    contract a 100 TB run needs: any worker can recompute "epoch 3,
    shard 17, positions 40960-49151" bit-identically after a preemption,
    and two training runs on the same corpus see the same example order
    without shipping a shuffled copy of the data.

    Shape: two map-side hash expressions + one ``row_number`` window per
    shard. The window shuffles by shard — n_shards is the parallelism
    dial, and because the shard hash is uniform there is no skewed
    partition for the sort to funnel through (unlike ordering by a data
    key). Ties cannot happen: the order key is (hash, id) and ids are
    unique."""
    from pyspark.sql import Window

    order_key = split_bucket(id_col, f"epoch{epoch}", modulus=SAMPLE_PPM)
    win = Window.partitionBy("shard").orderBy(
        F.col("_order_key"), F.col(id_col)
    )
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("shard", shard_assignment(id_col, n_shards, salt))
        .withColumn("_order_key", order_key)
        .withColumn("position", F.row_number().over(win) - F.lit(1))
        .drop("_order_key")
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
    fmt: str = "parquet",
) -> None:
    """Materialize a deterministic sharded export: tag each row with its
    ``shard_assignment`` and write ``shard=<i>/`` partition directories,
    repartitioned BY the shard column first so each shard is exactly one
    task's output (one file per shard instead of tasks×shards fragments).
    At 100 TB the per-shard file count is then controlled with
    ``spark.sql.files.maxRecordsPerFile`` rather than more shards — the
    shard is the dataloader addressing unit, the file is the IO unit, and
    conflating them forces a re-export every time IO sizing changes."""
    (
        df.withColumn("shard", shard_assignment(id_col, n_shards, salt))
        .repartition(n_shards, F.col("shard"))
        .write.partitionBy("shard")
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )


def temperature_source_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    alpha: float = 0.7,
    salt: str = "tmix",
    cuts: DataFrame | None = None,
) -> DataFrame:
    """Temperature-based corpus mixing (the mT5/multilingual-sampling
    scheme): per-source keep rates ∝ n_i^(α−1), normalized so the
    SMALLEST source keeps everything — α<1 flattens the source
    distribution (big web crawls down-sampled, small curated sources
    kept), α=1 keeps all rows. Unlike `weighted_source_mix` the weights
    come from the DATA (one per-source count aggregate, broadcast back),
    so the mix adapts as the corpus grows. Per-row membership is
    hash-gated (md5 bucket < round(1000·(n_min/n_i)^(1−α))) —
    deterministic, engine-portable, stable under growth; the cut is
    rounded to integer per-mille BEFORE gating so the only cross-engine
    float op (pow) cannot flip a row unless it lands within an ulp of a
    .5 per-mille boundary. Pass a precomputed/pinned ``cuts``
    (:func:`temperature_cuts`) to avoid re-deriving the counts when the
    caller also reports them."""
    if cuts is None:
        cuts = temperature_cuts(df, source_col, alpha)
    # null-safe source join: a NULL source is a stratum like any other
    # (same policy as stratified_sample) — a plain equi-join would
    # silently DROP every NULL-source row, contradicting "alpha=1 keeps
    # all rows"
    c = F.broadcast(
        cuts.select(F.col(source_col).alias("__mix_src"), "cut")
    )
    return (
        df.join(c, F.col(source_col).eqNullSafe(F.col("__mix_src")))
        .filter(split_bucket(id_col, salt) < F.col("cut"))
        .drop("cut", "__mix_src")
    )
