"""Fixture-table loading.

The driver's synthetic parquet lives at ``/root/testdata/sf*/``:
``region nation customer supplier part orders lineitem events documents
embeddings``.  ``embeddings`` is the reference's base-vector table
(``<ds>_base.fvecs``, ``src/test_search.cpp:35``) with schema
``(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)``.

The reference holds out a random slice of the base file as the query set
(``python/download_dataset.py:17-22``).  We mirror that deterministically:
``vec_id < NQ`` rows are the queries, the rest are the base — both engines
(Spark and the DuckDB oracle) apply the same split predicate so results
are comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
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
]

# Deterministic held-out query count (≡ NQ=1000 of download_dataset.py:17-22,
# scaled to the fixture).
NQ = 10


def spread_small_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin a NARROW scan across the cluster's cores when the
    source yields fewer partitions than ``defaultParallelism``.

    Why: the local fixture tables are single parquet files with one row
    group, so every CPU-heavy map stage downstream (shingling, regex
    tokenization, hashing) runs on ONE core — the r6 bench's 13s
    ``hll_distinct_shingles`` was ~5× pure partition starvation, not
    hash cost (r7 profile: shingle explode 12.2s on 1 partition, 2.4s
    on 8).  At 100 TB the scan already has thousands of splits and this
    is a NO-OP — the condition makes the repartition (a full shuffle of
    the raw rows — never acceptable at scale) strictly a small-input
    rescue.  Results are unaffected: callers are order-insensitive
    aggregates over hash/shingle streams (partitioning invariance is
    pinned per-operator in tests)."""
    cached = getattr(df, "_spread_small_scan", None)
    if cached is not None:
        return cached
    target = spark.sparkContext.defaultParallelism
    out = df.repartition(target) if df.rdd.getNumPartitions() < target else df
    # Per-object memo: ``read_parquet`` returns the SAME DataFrame object
    # per (session, path), so repeated query constructions (bench warm
    # reps, the driver's correctness loop) skip the ``df.rdd`` partition
    # probe — a full analysis + RDD-conversion py4j round-trip measured
    # at ~0.1s per build.  Plain (non-memoized) inputs just recompute.
    df._spread_small_scan = out
    return out


# Session-scoped memo of LAZY parquet-scan DataFrames.  This caches the
# plan handle (schema inference + file listing RPCs, ~0.1s per
# spark.read.parquet call — measured as the top build cost of repeated
# query construction), NEVER data: every action still scans the parquet
# inputs.  Keyed weakly by SparkSession so a restarted session gets
# fresh handles.
import weakref

_SESSION_TABLES: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Memoized ``spark.read.parquet(path)`` (lazy plan reuse only).

    STATIC-INPUT ASSUMPTION (ADVICE r10): the parquet file listing is
    captured at first read, so a caller that rewrites or appends files
    under ``path`` within one session would silently keep reading the
    first snapshot.  The driver fixtures are immutable per run, and every
    in-repo writer targets fresh paths; a caller that mutates an input
    mid-session must drop the memo first (``invalidate_table_cache``)."""
    try:
        cache = _SESSION_TABLES.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable: fall through
        return spark.read.parquet(path)
    df = cache.get(path)
    if df is None:
        df = spark.read.parquet(path)
        cache[path] = df
    return df


def invalidate_table_cache(spark: SparkSession) -> None:
    """Drop this session's memoized plan handles (read_parquet/
    load_events/embedding_dim) — for callers that rewrite an input path
    mid-session.  Cheap: only lazy handles are discarded, no data."""
    try:
        _SESSION_TABLES.pop(spark, None)
    except TypeError:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events fixture reader, robust to the fixture's timestamp encoding.

    **Session mutation (contract):** this function pins
    ``spark.sql.session.timeZone=UTC`` on the caller's session, and the
    setting MUST stay UTC for as long as any DataFrame returned here is
    alive: the NTZ→TIMESTAMP cast below evaluates lazily at *action*
    time under the then-current session tz, so a save/restore scope
    would silently corrupt the timestamps it was meant to protect.  A
    warning is emitted if a different tz was in effect.  All repo entry
    points (session.get_spark, the driver contract, bench) already run
    UTC sessions, so in practice this is a no-op belt-and-braces pin.

    Older driver testdata wrote parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]) — for that
    encoding read nanos as int64 and floor-convert to microseconds
    (integer ``div``, not float division: at ~1.7e18 ns the 52-bit
    mantissa loses 1 µs on ~24% of rows).  Current testdata writes
    TIMESTAMP(MICROS), which both Spark and DuckDB read natively —
    pass it through unchanged so oracle timestamps match bitwise."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The MICROS path casts TIMESTAMP_NTZ -> TIMESTAMP, which interprets
    # wall-clock in the SESSION timezone: pin it here (not only in
    # session.get_spark) so the cast is the identity under any caller's
    # SparkSession — e.g. the round driver's own — not just ours.
    try:
        # no-default get returns the EFFECTIVE value (falls back to the
        # JVM default tz), so an inherited non-UTC host zone warns too
        prior_tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        prior_tz = None
    if prior_tz not in (None, "UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        import warnings

        warnings.warn(
            f"load_events: overriding session timeZone {prior_tz!r} -> 'UTC' "
            "for bitwise event-timestamp parity; see docstring contract",
            stacklevel=2,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # memoized normalized handle (the tz pin above still runs per call —
    # it is the load_events contract, and a conf.set is one cheap RPC)
    try:
        cache = _SESSION_TABLES.setdefault(spark, {})
    except TypeError:
        cache = {}
    key = f"__events_norm__::{sf_dir}"
    hit = cache.get(key)
    if hit is not None:
        return hit
    df = read_parquet(spark, f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        # TIMESTAMP(MICROS) parquet reads as TIMESTAMP_NTZ; normalize to
        # TIMESTAMP so downstream ops (unix_micros, windows) see the same
        # type the nanos path produced.  Session tz is pinned to UTC in
        # session.get_spark, so the cast is the identity on the micros.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    cache[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def embedding_dim(spark: SparkSession, sf_dir: str) -> int:
    """Vector width of the embeddings table — a schema-level property
    probed from ONE row and memoized per (session, sf_dir).  Feeds the
    unrolled codegen distance kernels (functions.vector); the probe is
    a single tiny job per session, amortized over every query build.

    UNIFORM-WIDTH ASSUMPTION (ADVICE r10): the embeddings fixture is
    fixed-width by contract (the reference's fvecs layout), so one
    sampled row speaks for the table.  A dim=0 or NULL first row would
    silently mis-specialize every unrolled kernel to a constant — raise
    loudly instead of returning a poison value."""
    from pyspark.sql import functions as F

    try:
        cache = _SESSION_TABLES.setdefault(spark, {})
    except TypeError:
        cache = {}
    key = f"__emb_dim__::{sf_dir}"
    hit = cache.get(key)
    if hit is None:
        row = (
            read_parquet(spark, f"{sf_dir}/embeddings.parquet")
            .select(F.size("embedding").alias("d"))
            .first()
        )
        if row is None or row["d"] is None or int(row["d"]) <= 0:
            raise ValueError(
                f"embedding_dim({sf_dir}): embeddings table is empty or its "
                f"first row has a NULL/empty vector (probed size={None if row is None else row['d']}); "
                "the unrolled distance kernels need a positive uniform width"
            )
        hit = int(row["d"])
        cache[key] = hit
    return hit


def base_vectors(spark: SparkSession, sf_dir: str, nq: int = NQ) -> DataFrame:
    """Base side of the query/base split (reference base fvecs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(emb.vec_id >= nq)


def query_vectors(spark: SparkSession, sf_dir: str, nq: int = NQ) -> DataFrame:
    """Held-out query side (reference query fvecs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(emb.vec_id < nq)
