"""Distributed graph primitives for the dedup/curation family.

``connected_components_star`` implements the alternating large-star /
small-star rounds of Kiveris et al., "Connected Components in MapReduce
and Beyond" (SOCC'14) — the scale-out replacement for per-hop min-label
propagation.  Propagation needs diameter(component) rounds (a length-L
chain costs L shuffles and silently truncates at max_iters); the
star alternation contracts path lengths geometrically, converging in
O(log L) rounds on the same join/groupBy primitives, so adversarial
chains cost tens, not thousands, of shuffles at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from etl_data_pipeline_spark.materialize import cut_lineage


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def connected_components_star(
    edges: DataFrame, max_iters: int = 50
) -> tuple[DataFrame, int]:
    """Connected components over an undirected edge list.

    ``edges``: (u, v) pairs in any orientation (self-loops ignored).
    Returns ``(assignments, rounds)`` where ``assignments`` has one row
    (u, component) for every NON-minimum node of each component, with
    ``component`` = the component's minimum node id (component minima
    and isolated nodes simply don't appear — callers coalesce them to
    themselves).

    Per round: large-star connects every strictly-larger neighbor of u
    to min(N(u) ∪ {u}); small-star (on edges oriented u > v) re-points
    u and all its smaller neighbors at their minimum.  Both are one
    groupBy(min) + one equi-join on u — partitioned by node id, no
    driver-side data.  Convergence is detected by a (count, xxhash64
    XOR) signature of the edge set — two scalars to the driver per
    round, same discipline as the kmeans loop; each round is
    lineage-cut (reliable checkpoint when a dir is set) so lineage stays flat.

    One materialization pass per round (r15 optimization round, guide
    §2.4/§1.4): the signature rides the checkpoint action as an
    ``Observation`` (CollectMetrics fills during both localCheckpoint
    and reliable checkpoint — probed on Spark 4.1), replacing a second
    full scan of the edge set; and because ``star`` is strictly
    oriented (every row is (x, m) with m < x) AND already distinct,
    re-symmetrizing it needs NO distinct and NO checkpoint of its own —
    a narrow, lazy union over the just-checkpointed blocks (lineage
    depth stays 1 over the checkpoint).  The former loop paid three
    edge-set passes per round (checkpoint star, signature scan,
    checkpoint of a symmetrize-distinct shuffle); interleaved A/B at
    sf0.1 through neardup_clusters (.scratch/r15b_cc_ab.py): Spark jobs
    86 -> 68, wall 5.36 -> 4.76 s (min-of-4), outputs identical in all
    12 runs.  The XOR signature is order-independent, so the dropped
    distinct cannot change it (the union has no duplicates to drop).
    """
    e = edges.select("u", "v").filter(F.col("u") != F.col("v"))
    e = cut_lineage(_symmetrize(e))
    prev_sig: tuple[int, int] | None = None
    rounds = 0
    star = e
    for _ in range(max_iters):
        rounds += 1
        # large-star: m = min(N(u) ∪ {u}); emit (v, m) for v > u
        mins = e.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("u", "mv").alias("m"))
        ls = (
            e.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # ls is oriented u > v (m <= old u < v). small-star: m = min(N(u));
        # emit (u, m) and (v, m) for the other smaller neighbors v != m
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        rest = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # (count, XOR of per-edge hashes): order-independent, no overflow
        # under ANSI mode (a SUM of hashes would overflow long); computed
        # DURING the checkpoint action via Observation — no extra scan
        obs = Observation()
        star = (
            mins2.select("u", F.col("m").alias("v"))
            .unionByName(rest)
            .distinct()
            .observe(
                obs,
                F.count(F.lit(1)).alias("c"),
                F.coalesce(
                    F.bit_xor(F.xxhash64("u", "v")), F.lit(0)
                ).alias("h"),
            )
            .transform(cut_lineage)
        )
        metrics = obs.get  # filled by the eager checkpoint's execution
        sig = (int(metrics["c"]), int(metrics["h"]))
        if sig == prev_sig:
            break
        prev_sig = sig
        # star is strictly oriented (m < x) and distinct: union with its
        # reversal is duplicate-free by construction — plain narrow union
        # over the checkpointed blocks, no shuffle, no second checkpoint
        e = star.unionByName(
            star.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    # at the fixed point the edge set is a star forest: every non-min
    # node has exactly one out-edge to its component min
    assignments = star.groupBy("u").agg(F.min("v").alias("component"))
    return assignments, rounds
