"""Catalog layer: expose the lake's tables to DataFrame code and SQL.

Reference analog: the Glue Data Catalog + Redshift Spectrum external schema
(`external-table-queries.sql:4-8`, `README.md:44` in the reference) — tables
queryable in place without loading. Spark-native equivalent: the session
catalog; temp views over parquet locations (tests/driver) or
``CREATE TABLE ... USING parquet LOCATION`` for a persistent metastore.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

#: every driver-generated fixture table (TESTDATA.md)
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: per-session DataFrame cache: a read DataFrame is an immutable logical
#: plan, so reusing it is safe — and skips the footer/schema-inference
#: I/O that every one of the ~150 registry builders would otherwise
#: re-pay per call (the driver builds all of them per round). The cache
#: dict lives ON the session object itself: a cached DataFrame strongly
#: references its session, so a module-global weak-keyed map could never
#: actually evict (value → key path keeps the key alive) — storing the
#: dict as a session attribute makes session+cache one reference CYCLE
#: that the gc collects wholesale once the session is otherwise
#: unreachable, so a stopped session's plans don't pin its JVM state.
#: Each entry carries the file's (mtime, size) fingerprint, so a fixture
#: regenerated mid-session gets a FRESH read instead of a stale
#: plan/schema — the round-4 regeneration failure mode, closed at the
#: cache itself. Keyed by (sf_dir, name) with the fingerprint stored in
#: the VALUE, so a regeneration REPLACES the stale entry instead of
#: stranding it — bounded by the number of distinct tables.
_TABLE_CACHE_ATTR = "_blhs_table_cache"


def _cached_read(spark: SparkSession, sf_dir: str, name: str, path: str, build):
    """Fingerprint-validated memo lookup: returns the cached plan when the
    file fingerprint still matches, else rebuilds via ``build()`` and
    replaces the entry in place."""
    cache = getattr(spark, _TABLE_CACHE_ATTR, None)
    if cache is None:
        cache = {}
        try:
            setattr(spark, _TABLE_CACHE_ATTR, cache)
        except Exception:
            pass  # exotic session proxy refusing attributes: cache per call
    fp = _file_fingerprint(path)
    key = (sf_dir, name)
    hit = cache.get(key)
    if hit is not None and hit[0] == fp:
        return hit[1]
    df = build()
    cache[key] = (fp, df)
    return df


def _file_fingerprint(path: str) -> tuple:
    """(mtime_ns, size) of a local parquet file/dir — the cache-busting
    component of a table-cache key. Directories fingerprint their direct
    entries (a rewritten parquet dir changes part files). Non-stat-able
    paths (remote URIs) return a constant: those cache without
    invalidation, as before."""
    import os

    try:
        st = os.stat(path)
        if os.path.isdir(path):
            parts = tuple(
                sorted(
                    (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                    for e in os.scandir(path)
                )
            )
            return (st.st_mtime_ns, parts)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return ("nostat",)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table (reference S1: `workflow/Extractor.py:3-5`).

    Plain ``spark.read.parquet`` — schema from the footer, vectorized reader,
    predicate pushdown and column pruning all come from Catalyst for free.
    Memoized per (session, sf_dir, table, file-fingerprint): the returned
    plan is immutable and a regenerated file misses the cache.
    """
    path = f"{sf_dir}/{name}.parquet"
    return _cached_read(spark, sf_dir, name, path, lambda: spark.read.parquet(path))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the ``events`` table and deliver ``ts`` as **bigint
    epoch-nanoseconds** regardless of how the file stores it.

    The fixture generator has shipped ``ts`` both as parquet
    TIMESTAMP(NANOS) (rounds 1-3) and as ``timestamp[us]`` (round 4+), so
    this loader is schema-adaptive rather than assuming one precision:

    - TIMESTAMP(NANOS) file: Spark's vectorized reader rejects nanos by
      default; the ``nanosAsLong`` opt-in surfaces it as bigint epoch-ns
      directly.
    - µs-precision file (TIMESTAMP / TIMESTAMP_NTZ): project
      ``unix_micros(ts) * 1000``. The session zone is pinned to UTC first
      so a TIMESTAMP_NTZ → TIMESTAMP cast is an exact micros passthrough,
      matching DuckDB's naive-as-UTC ``epoch_ns(ts)`` oracle semantics.

    Downstream code sees one contract — integer nanos: exact,
    timezone-free, and identical on every engine.
    NOTE: this read sets two SESSION-GLOBAL confs and leaves them set
    (``spark.sql.legacy.parquet.nanosAsLong``, UTC session timezone) —
    required for correct ns-timestamp handling of the fixture, and
    restoring them mid-session would change the semantics of the lazy
    plans built here. A caller embedding this library in a session with
    a different timezone policy should use a dedicated session.
    """
    path = f"{sf_dir}/events.parquet"

    def build() -> DataFrame:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if not isinstance(ts_type, LongType):
            # timestamp-typed file: convert to the epoch-ns bigint contract
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn(
                "ts",
                (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast(
                    "bigint"
                ),
            )
        return df

    # distinct from the raw 'events' entry; fingerprint-validated the same way
    return _cached_read(spark, sf_dir, "events@ns", path, build)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {
        name: load_events(spark, sf_dir)
        if name == "events"  # ts normalized to epoch-ns bigint (any precision)
        else load_table(spark, sf_dir, name)
        for name in names
    }


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` resolves it.

    Reference S4 (external catalog table): Catalyst resolves view names
    against the session catalog exactly like Spectrum resolves the external
    schema against Glue.
    """
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


#: the reference's four dashboard queries (`external-table-queries.sql:13-42`,
#: re-issued live by its Tableau workbook) transplanted onto the fixtures —
#: registered as named views so any SQL client sees the BI layer's surface
DASHBOARD_VIEWS: dict[str, str] = {
    "dash_top100_books": """
        SELECT p_partkey, p_name, avg(l_quantity) AS avg_rating,
               count(*) AS total_ratings
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_partkey, p_name HAVING count(*) >= 25
        ORDER BY avg_rating DESC, p_partkey LIMIT 100
    """,
    "dash_top10_countries": """
        SELECT n_name, count(*) AS customer_count
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY customer_count DESC, n_name LIMIT 10
    """,
    "dash_top10_states": """
        SELECT r_name, n_name, count(*) AS customer_count
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY r_name, n_name ORDER BY customer_count DESC, n_name LIMIT 10
    """,
    "dash_top10_authors": """
        SELECT p_brand, avg(l_quantity) AS avg_rating, count(*) AS total_ratings
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand HAVING count(*) >= 25
        ORDER BY avg_rating DESC, p_brand LIMIT 10
    """,
}


def register_dashboard_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """BI layer (reference §3.3): expose the four dashboard queries as
    catalog views over the base views — a SQL client (or Thrift Server in
    production) sees the same surface Tableau queried live."""
    register_views(spark, sf_dir)
    for name, sql in DASHBOARD_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {sql}")
    return list(DASHBOARD_VIEWS)
