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

from pyspark.sql import DataFrame
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
        star = (
            mins2.select("u", F.col("m").alias("v"))
            .unionByName(rest)
            .distinct()
            .transform(cut_lineage)
        )
        # (count, XOR of per-edge hashes): order-independent, no overflow
        # under ANSI mode (a SUM of hashes would overflow long)
        sig_row = star.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (int(sig_row["c"]), int(sig_row["h"]))
        if sig == prev_sig:
            break
        prev_sig = sig
        e = cut_lineage(_symmetrize(star))
    # at the fixed point the edge set is a star forest: every non-min
    # node has exactly one out-edge to its component min
    assignments = star.groupBy("u").agg(F.min("v").alias("component"))
    return assignments, rounds
