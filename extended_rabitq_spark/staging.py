"""Scale-safe staging of reused subplans (VERDICT r10 item 7).

Round 10 made non-replicated ``localCheckpoint`` the load-bearing
staging primitive: a projection/aggregation that feeds several plan
branches is materialized once instead of recomputed per branch.  On
``local[*]`` that is exactly right — blocks live in the one process that
computes and consumes them.  On a real cluster with executor loss or
preemption, however, localCheckpoint blocks are UNRECOVERABLE (the
lineage is truncated, so a lost block kills the job — guide §5).

This module routes every staging point through one helper whose mode is
a session config, so cluster deployments pick a fault-tolerant route
without touching operator code:

- ``local`` (default): ``localCheckpoint(eager=...)`` — the measured
  fastest on local[*]; blocks die with executors.
- ``reliable``: ``Dataset.checkpoint(eager=...)`` — blocks written to
  ``spark.sparkContext.setCheckpointDir`` storage (HDFS/object store),
  recoverable across executor loss.  Requires a checkpoint dir: either
  pre-set on the context, or supplied via
  ``spark.exrabitq.staging.dir`` / ``$SPARK_GRAFT_STAGING_DIR``.
- ``persist``: ``persist(StorageLevel.DISK_ONLY_2)`` — 2×-replicated
  disk blocks, lineage KEPT (a lost block recomputes instead of
  failing), no checkpoint dir needed.  Eager staging points trigger a
  ``count()`` to materialize up front.

Mode resolution: ``spark.exrabitq.staging.mode`` session conf, then
``$SPARK_GRAFT_STAGING``, then ``local``.  The bench/driver environment
sets neither, so every committed measurement uses the identical
localCheckpoint behavior shipped in round 10.

Usage keeps the call-chain postfix shape (``DataFrame.transform``)::

    staged = heavy_projection.transform(stage_lazy)   # was .localCheckpoint(eager=False)
    staged = heavy_projection.transform(stage_eager)  # was .localCheckpoint(eager=True)

Results are mode-invariant: all three routes materialize the same rows
of the same subplan; only the storage/fault-tolerance contract differs
(pinned by tests/test_staging.py, which also asserts the staged plans
still share one source scan in every mode).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_MODE_CONF = "spark.exrabitq.staging.mode"
_MODE_ENV = "SPARK_GRAFT_STAGING"
_DIR_CONF = "spark.exrabitq.staging.dir"
_DIR_ENV = "SPARK_GRAFT_STAGING_DIR"
_MODES = ("local", "reliable", "persist")


def staging_mode(spark) -> str:
    """Resolve the staging mode: session conf > env > 'local'."""
    mode = None
    try:
        mode = spark.conf.get(_MODE_CONF, None)
    except Exception:
        mode = None
    if not mode:
        mode = os.environ.get(_MODE_ENV) or "local"
    mode = mode.strip().lower()
    if mode not in _MODES:
        raise ValueError(
            f"{_MODE_CONF}={mode!r}: expected one of {_MODES}"
        )
    return mode


def _ensure_checkpoint_dir(spark) -> None:
    sc = spark.sparkContext
    try:
        has_dir = sc._jsc.sc().getCheckpointDir().isDefined()
    except Exception:
        has_dir = False
    if has_dir:
        return
    ckdir = None
    try:
        ckdir = spark.conf.get(_DIR_CONF, None)
    except Exception:
        ckdir = None
    ckdir = ckdir or os.environ.get(_DIR_ENV)
    if not ckdir:
        raise ValueError(
            "staging mode 'reliable' needs a checkpoint dir: call "
            f"sparkContext.setCheckpointDir, or set {_DIR_CONF} / "
            f"${_DIR_ENV}"
        )
    sc.setCheckpointDir(ckdir)


def stage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a reused subplan once, per the session staging mode."""
    mode = staging_mode(df.sparkSession)
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        _ensure_checkpoint_dir(df.sparkSession)
        return df.checkpoint(eager=eager)
    # persist: replicated disk blocks, lineage kept (lost blocks recompute)
    from pyspark import StorageLevel

    out = df.persist(StorageLevel.DISK_ONLY_2)
    if eager:
        out.count()
    return out


def stage_eager(df: DataFrame) -> DataFrame:
    """``df.transform(stage_eager)`` ≡ the r10 ``localCheckpoint(eager=True)``."""
    return stage(df, eager=True)


def stage_lazy(df: DataFrame) -> DataFrame:
    """``df.transform(stage_lazy)`` ≡ the r10 ``localCheckpoint(eager=False)``."""
    return stage(df, eager=False)
