"""Cluster-safe materialization points (VERDICT r6 item 3).

Two distinct needs, two helpers:

``materialize(df)`` — a multi-consumer reuse point: a stream that feeds
several downstream joins/aggregates would otherwise be recomputed per
consumer (executed-plan audits measured 12 corpus scans in the Jaccard
path before these points existed).  Default mechanism is
``persist(StorageLevel.MEMORY_AND_DISK)``: lazy, spills instead of
OOMing, and — critically for the 100 TB posture — KEEPS LINEAGE, so on
a real cluster the loss of an executor (preemption, spot reclaim)
triggers recompute of the lost blocks instead of failing the job.  The
prior mechanism, ``localCheckpoint()``, stores blocks non-replicated on
executor-local storage with lineage truncated — unrecoverable at scale.
Measured at sf0.1 on local[32] (2026-08-14): WARM the two mechanisms
are a wash (20.7 s persist vs 20.4 s localCheckpoint over the five hot
dedup queries — Spark's CacheManager matches the re-built plan and
serves the first run's cache).  COLD (fresh cache, interleaved A/B on
minhash_lsh_pairs) persist initially cost ~1.2-1.6x — the one action
computed consumers against a not-yet-materialized InMemoryRelation
(estimate-based plans, columnar-batch scans) where eager
localCheckpoint hands downstream planning a materialized RDD of known
size.  Letting AQE re-plan through cached subtrees
(``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true``,
now in session.RUNTIME_CONFS) closes that gap: min-of-3 interleaved
cold runs 3.79 s persist vs 4.06 s localCheckpoint.  The local fast
path remains an explicit opt-in:
``SPARK_GRAFT_MATERIALIZE=local_checkpoint``.

``cut_lineage(df)`` — an iterative-loop truncation point: the graph
algorithms (connected components, PageRank, k-core) rebuild their edge
frame each round, and without truncation the plan grows linearly with
rounds (analysis cost, eventually stack depth).  Persisting is NOT
sufficient here — the lineage must actually be cut.  Uses RELIABLE
``checkpoint()`` (replicated to the configured checkpoint dir, job
survives executor loss) whenever ``sparkContext.getCheckpointDir()``
is configured — which a cluster deployment must do — and falls back to
``localCheckpoint(eager=True)`` otherwise, which is the right local-mode
trade and the only option without a checkpoint dir.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: "persist" (default, cluster-safe) | "local_checkpoint" (local-mode
#: fast path: eager, lineage-truncating, non-replicated).
_MODE_ENV = "SPARK_GRAFT_MATERIALIZE"


def _mode() -> str:
    return os.environ.get(_MODE_ENV, "persist")


def materialize(df: DataFrame) -> DataFrame:
    """Mark ``df`` as a multi-consumer reuse point (compute-once)."""
    if _mode() == "local_checkpoint":
        return df.localCheckpoint()
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` eagerly AND truncate its lineage (loop body).

    Reliable ``checkpoint()`` when a checkpoint dir is configured (the
    cluster deployment path); ``localCheckpoint`` otherwise.

    The fallback is NOT executor-loss-safe — localCheckpoint stores
    its blocks non-replicated on the computing executor with lineage
    already truncated, so losing that executor kills the job.  Proven
    by fault injection (tools/chaos_executor_loss.py, round 9):
    SIGKILLing an executor mid-loop under local-cluster[2,4,4096]
    fails the no-dir run and completes the
    ``SPARK_GRAFT_CHECKPOINT_DIR`` run with an identical result hash.
    On any real cluster, configure the dir.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
