"""Scale-ADAPTIVE ANN parameters (round 12, VERDICT r11 item 1).

The round-11 verdict's one ``weak`` component: every approximate
retrieval path ran with corpus-size-INDEPENDENT parameters (10 label
cells for IVF, 4 LSH planes, 16 PQ codes), so cell/bucket population
grows proportional to n and the "approximate" path's cost trends toward
the exact path's — the sf0.1->sf1 slope audit watch-listed all four at
slopes 5.4-7.4.  This module implements the calibrated scaling rule
measured in the round-11 prep (SURVEY.md round-11 record): keep the
expected CELL POPULATION constant (~125 vectors — executor-task-sized)
and the SCAN FRACTION constant (~20%), so at 10x the corpus there are
10x the cells, each the same size, and recall IMPROVES with corpus size
(measured on the sf1 embeddings: recall@3 0.465 at nlist=10 -> 0.832 at
nlist=640, same 20% scan).

The coarse quantizer is a seeded INTEGER-GRID Lloyd k-means — every
quantity is exact int64 arithmetic so the DuckDB oracle can mirror the
whole iteration chain bit-for-bit (the open design question the round-11
prep named):

- components quantized to the 1e-6 grid: ``g = floor(v * 1e6)`` (the
  functions/canonical.py discipline);
- seeds: every ``stride``-th vector in vec_id rank order (stride =
  n // nlist) — a deterministic, SQL-expressible sample; the seed's
  vec_id IS the cell id;
- assignment: argmin over cells of the exact integer squared distance
  ``sum((g - c)^2)`` (|diff| <= 2e6, 64 dims -> max 2.6e14, far inside
  int64), ties broken by ascending cell id;
- update: per-dimension integer FLOOR DIVISION ``(s - pmod(s, cnt)) /
  cnt`` — the pmod subtraction makes the numerator exactly divisible,
  so the division is exact in both engines regardless of their ``/``
  semantics; centroids stay ON the integer grid every iteration.

Float arithmetic appears exactly once: the final candidate cosine
(float64, rounded to 6 — the same kernel contract every other vector
query uses).  Everything upstream of the candidate SET is
order-independent integer math, which is what makes a mid-iteration
executor kill recoverable with an identical hash (the persist points
keep lineage; recompute re-derives the same integers).

At 100 TB: nlist ~ n/125 means the centroid table grows with the
corpus (at 1e9 vectors, 8M cells x 64 dims x 8B = 4 GB) — past
broadcast range, the assignment join becomes a shuffle join on a
pre-partitioned centroid table and the seed sample comes from a
deterministic hash instead of a global rank; the per-iteration
invariants (integer grid, floor-division update, (d, cell) tie order)
are unchanged.  At the repo's test scales the centroid array is
nlist x 64 longs (160 x 64 at sf1 = 80 KB) and rides a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_pipeline_spark.materialize import materialize
from etl_data_pipeline_spark.operators.similarity import (
    PQ_SUBDIM,
    PQ_SUBSPACES,
    TARGET_BLOCK_ROWS,
    _cell_topk_kern,
    cosine_col,
    knn,
    quantize_embeddings,
)

#: Target vectors per IVF cell / LSH bucket — the executor-task-sized
#: cell population the scaling rules hold constant (round-11 prep
#: calibration: sf1's 20000 vectors / 125 = 160 cells reads recall@3
#: 0.714 at a 20% scan vs 0.465 for the fixed 10-cell quantizer).
TARGET_CELL = 125

#: Scan fraction ~ 1/SCAN_DIV of the corpus: nprobe = nlist // 5.
SCAN_DIV = 5


def adaptive_nlist(n: int) -> int:
    """Cells grow with the corpus so the PER-CELL population stays
    ~TARGET_CELL: nlist = max(4, n // 125).  sf0.01 (500) -> 4,
    sf0.1 (2000) -> 16, sf1 (20000) -> 160, 1e9 -> 8M."""
    return max(4, n // TARGET_CELL)


def adaptive_nprobe(nlist: int) -> int:
    """Probes grow WITH nlist at a fixed ~20% scan fraction (the
    calibration's constant-cost column): max(2, nlist // 5)."""
    return max(2, nlist // SCAN_DIV)


def adaptive_planes(n: int) -> int:
    """LSH hyperplane count for a ~TARGET_CELL bucket population:
    2^planes buckets ~ n / 125, i.e. planes = floor(log2(n // 125)),
    floored at the legacy 4 (so every sf <= 0.1 keeps its measured
    bucket geometry and hashes).  Integer-only — ``bit_length`` avoids
    the float-log2 boundary ambiguity at exact powers of two; the SQL
    mirror is ``max j in [2, 30] with (1 << j) <= n // 125``."""
    m = max(n // TARGET_CELL, 1)
    return max(4, m.bit_length() - 1)


def adaptive_codes(n: int) -> int:
    """PQ codebook size: max(16, n // 125) seed codes — the same
    population rule one compression level down (a fixed 16-code book
    quantizes a 10x corpus with the same 16 prototypes; scaling the
    book keeps per-code population constant so reconstruction error
    does not drift up with n).  sf <= 0.1 -> 16 (unchanged), sf1 ->
    160."""
    return max(16, n // TARGET_CELL)


def grid_vectors(embeddings: DataFrame) -> DataFrame:
    """(vec_id, g: array<long>) — components floored to the 1e-6
    integer grid, the exact-arithmetic domain of the whole quantizer."""
    return embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000).cast("long"),
        ).alias("g"),
    )


def _rank_kern(cells, carrs, top: int | None):
    """Arrow-batched exact integer distance/ranking kernel.

    Emits, per input vector, its ``top`` nearest cells (all cells when
    None) as (vec_id, d, cell, crn) with the (d, cell-ascending) tie
    order.  EXACTNESS: distances use the expansion d = |g|^2 + |c|^2 -
    2 g.c with every term computed in float64 — |g|,|c| <= 1e6 so each
    dot/norm is an integer <= 6.6e13 and d <= 2.7e14, all far inside
    float64's 2^53 exact-integer range, so the BLAS matmul result is
    the EXACT integer the direct int64 (g-c)^2 sum yields (the
    differential mirror test pins this).  ``cells`` is cell-ascending,
    so a stable ascending argsort on d realizes the (d, cell) tie-break.

    This kernel replaced the per-row HOF (zip_with/aggregate over an
    nlist-element transform) in round 12's sf10 measurement: the HOF
    form is interpreted per element — fine at sf1 (3.2M cell-distances)
    but a single-task straggler at sf10's 320M (O(n * nlist) = n^2/125
    work with an interpreter constant).  The numpy form does the same
    integers at BLAS speed, and emitting only top-``nprobe`` ranks
    in-kernel also deletes the n x nlist explode + window shuffle the
    old final pass needed.
    """
    import numpy as np
    import pandas as pd

    C = np.asarray(carrs, dtype="float64")
    cell_ids = np.asarray(cells, dtype="int64")
    c2 = (C * C).sum(axis=1)
    kk = len(cell_ids) if top is None else min(top, len(cell_ids))

    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            G = np.stack(pdf["g"].to_numpy()).astype("float64")
            d = (G * G).sum(axis=1)[:, None] + c2[None, :] - 2.0 * (G @ C.T)
            order = np.argsort(d, axis=1, kind="stable")[:, :kk]
            vids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vids, kk),
                    "d": np.take_along_axis(d, order, axis=1)
                    .reshape(-1)
                    .astype("int64"),
                    "cell": cell_ids[order].reshape(-1),
                    "crn": np.tile(
                        np.arange(1, kk + 1, dtype="int64"), len(vids)
                    ),
                }
            )

    return kern


def _collect_cents(cent: DataFrame):
    """Driver-pin the (cell, carr) centroid frame, cell-ascending.
    Bounded by nlist x 64 longs (102k values at sf10's nlist=1600); at
    nlist beyond ~1e5 the two-level (coarse-of-coarse) quantizer noted
    in kmeans_cell_ranks replaces both this pin and the O(n x nlist)
    assignment."""
    rows = sorted(cent.collect(), key=lambda r: r["cell"])
    return (
        [r["cell"] for r in rows],
        [list(r["carr"]) for r in rows],
    )


def kmeans_cell_ranks(
    embeddings: DataFrame,
    nlist: int,
    iters: int = 3,
    top: int | None = None,
) -> DataFrame:
    """Seeded integer-grid Lloyd k-means; returns the FINAL iteration's
    per-vector cell ranking ``(vec_id, cell, d, crn)``, truncated to
    ``top`` ranks when given — crn = 1 is the cell assignment,
    crn <= nprobe the probe set, so one frame serves both consumers
    (materialized).

    ``iters`` distance passes, ``iters - 1`` centroid updates (the
    final pass both assigns and ranks probes).  3 iterations measured
    on the real corpus: recall@3 0.677/0.711/0.733 for 1/2/3 iterations
    at sf0.01 and 0.423/0.460/0.479 at sf0.1 — the 3rd iteration still
    buys 2 points, the 4th read 0.725/0.488 (inside noise of the 3rd),
    so 3 is the knee; every extra iteration also grows the oracle's
    unrolled CTE chain by one assign/update block.

    Every distance pass runs the Arrow/numpy kernel (_rank_kern — exact
    float64-integer arithmetic, see its docstring for the sf10 A/B
    against the rejected per-row HOF form); centroid updates stay
    DataFrame aggregations (exact integer sums in any order + the pmod
    floor division).  Assignment cost is O(n * nlist) = n^2/125 by the
    nlist rule — measured fine through sf10 (200k x 1600 cells) at
    kernel speed; at 100 TB scale the standard fix is a TWO-LEVEL
    coarse quantizer (assign against sqrt(nlist) superclusters, then
    within the winner's children — O(n * sqrt(nlist))), which changes
    only this module's assignment step, not the cell contract.
    """
    from pyspark.sql.window import Window

    grid = materialize(grid_vectors(embeddings))
    n = grid.count()
    stride = max(n // nlist, 1)

    w0 = Window.orderBy("vec_id")
    rk = grid.select("vec_id", "g").withColumn(
        "r", F.row_number().over(w0) - 1
    )
    # seed rows: r in {0, stride, 2*stride, ...}, first nlist of them;
    # the seed's vec_id is the cell id.  Global rank is fine at test
    # scale; at 100 TB the seed sample comes from a deterministic hash
    # (no total order needed — any SQL-reproducible sample works).
    cent = rk.filter(
        (F.col("r") % stride == 0) & (F.col("r") < stride * nlist)
    ).select(F.col("vec_id").alias("cell"), F.col("g").alias("carr"))

    for _ in range(iters - 1):
        cells, carrs = _collect_cents(cent)
        assign = grid.mapInPandas(
            _rank_kern(cells, carrs, top=1),
            schema="vec_id long, d long, cell long, crn long",
        ).select("vec_id", "cell")
        upd = (
            assign.join(grid, "vec_id")
            .select("cell", F.posexplode("g").alias("pos", "gv"))
            .groupBy("cell", "pos")
            .agg(F.sum("gv").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .select(
                "cell",
                "pos",
                # exact floor division: pmod makes the numerator
                # exactly divisible, so the one double division is an
                # exact integer (< 2^53) — cross-engine deterministic
                ((F.col("s") - F.pmod("s", "cnt")) / F.col("cnt"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("carr")
            )
        )
        # tiny frame (nlist x 64 longs) — materialize so iteration t+1
        # does not recompute iterations 1..t (lineage kept: an executor
        # loss recomputes the same integers)
        cent = materialize(upd)

    cells, carrs = _collect_cents(cent)
    ranked = grid.mapInPandas(
        _rank_kern(cells, carrs, top=top),
        schema="vec_id long, d long, cell long, crn long",
    )
    return materialize(ranked.select("vec_id", "cell", "d", "crn"))


def ivf_topk_adaptive(
    embeddings: DataFrame, k: int = 3, iters: int = 3
) -> DataFrame:
    """IVF top-k with the SCALE-ADAPTIVE quantizer: nlist = n/125 cells
    from the seeded integer k-means (kmeans_cell_ranks), nprobe =
    nlist/5 (~20% scan), exact cosine only inside probed cells via the
    shared per-cell numpy kernel (_cell_topk_kern — one matmul per
    cell).

    Replaces the fixed 10-label-cell quantizer (rejected by
    measurement: its per-cell population grows with n, so the sf1 slope
    audit read 5.4-7.4 on the ANN family and recall held only because
    cells bloated — SLOPE_AUDIT_SF1.json round 11).  Measured adaptive
    recall@3 vs the fixed quantizer's 0.41: 0.733 at sf0.01, 0.479 at
    sf0.1 (18.8% scan), with the sf1 row in BASELINE.md.
    """
    from pyspark.sql.window import Window

    n = embeddings.count()  # bounded driver pin: one scalar
    nlist = adaptive_nlist(n)
    nprobe = adaptive_nprobe(nlist)
    # top=nprobe: ranks beyond the probe set are never consumed, so the
    # kernel never materializes the n x nlist ranking (320M rows at
    # sf10) — the property test requests the full ranking explicitly
    ranked = kmeans_cell_ranks(
        embeddings, nlist=nlist, iters=iters, top=nprobe
    )
    assign = ranked.filter(F.col("crn") == 1).select(
        F.col("vec_id").alias("member"), "cell"
    )
    probe = ranked.filter(F.col("crn") <= nprobe).select(
        F.col("vec_id").alias("query"), "cell"
    )
    emb = embeddings.select("vec_id", "embedding")
    tagged = probe.join(emb, probe.query == emb.vec_id).select(
        "cell", F.col("query").alias("vid"), "embedding", F.lit(0).alias("side")
    ).unionByName(
        assign.join(emb, assign.member == emb.vec_id).select(
            "cell",
            F.col("member").alias("vid"),
            "embedding",
            F.lit(1).alias("side"),
        )
    )
    local = tagged.groupBy("cell").applyInPandas(
        _cell_topk_kern(k), schema="q long, n long, cosine double"
    )
    w = Window.partitionBy("q").orderBy(F.desc("cosine"), F.asc("n"))
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q").alias("vec_id"),
            F.col("n").alias("neighbor"),
            "cosine",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def pq_rerank_adaptive(
    spark,
    embeddings: DataFrame,
    k: int = 3,
    n_cand: int = 50,
    n_blocks: int | None = None,
) -> DataFrame:
    """PQ two-stage ANN with a SCALE-ADAPTIVE codebook: n_codes =
    max(16, n / 125) seed codes instead of the fixed 16 — the same
    constant-population doctrine as adaptive_nlist, one compression
    level down (a fixed 16-code book quantizes a 10x corpus with the
    same 16 prototypes, so reconstruction error drifts up with n; a
    per-code population held at ~125 keeps it flat).  Every sf <= 0.1
    resolves to 16 codes, so the measured 16x4 geometry and hashes
    there are unchanged; sf1 gets 160 codes.

    Mechanics are operators/similarity.py::pq_rerank's, generalized
    over the codebook size: int8 quantize (shared quantize_embeddings),
    seed codebook = the n_codes lowest vec_ids (collected — a bounded
    driver pin that grows only as n/125), one vectorized numpy
    mapInPandas assign+decode stage, blocked-kernel candidate top-
    n_cand over the reconstructions, exact float re-rank.  Lives here
    rather than as a new ``n_codes`` parameter on pq_rerank because a
    signature change re-dirties the whole similarity.py trace cohort
    (18 queries) for a one-call-site generalization; the fixed-16
    original remains the unit-tested reference implementation.  The
    SDC candidate scan itself stays all-pairs BY CONTRACT (the
    documented cost model; the scale path for the SCAN is IVF cells —
    see ivf_topk_adaptive)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.window import Window

    n = embeddings.count()
    n_codes = adaptive_codes(n)
    qe = quantize_embeddings(embeddings)
    seed_rows = (
        qe.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(n_codes)
        .collect()
    )
    if len(seed_rows) != n_codes:
        raise ValueError(
            f"PQ seed codebook needs {n_codes} vectors, got "
            f"{len(seed_rows)} — corpus smaller than the codebook"
        )
    cb_arr = np.array(
        [
            [
                [float(r["embedding"][PQ_SUBDIM * s + d]) for d in range(PQ_SUBDIM)]
                for r in seed_rows
            ]
            for s in range(PQ_SUBSPACES)
        ]
    )

    # |x-c|^2 = |x|^2 + |c|^2 - 2 x.c with a PER-SUBSPACE argmin loop.
    # Two rounds of the round-12 scale audits drove this shape: the
    # original broadcast subtract-square form materializes an
    # (n, 16, n_codes, 4) float64 temporary — 3.3 GB per 20k-row batch
    # at the sf1 adaptive codebook (n_codes=160), measured 67 s for
    # pq_ann at sf1 (re-measured 15.7 s after the expansion rewrite,
    # same artifact); and even the expansion's full (n, 16, n_codes)
    # distance tensor is ~2 GB per Arrow batch at sf10's n_codes=1600,
    # which OOM-killed the Python workers (PythonArrowOutput
    # EOFException) across 24 concurrent tasks.  Looping the 16
    # subspaces keeps the peak at one (n, n_codes) block — 16x less —
    # and computes the SAME integers: inputs are int8-quantized
    # (|x| <= 127, 4-dim dots <= 6.5e4), every term float64-exact, and
    # per-(row, subspace) argmin with first-min ties on the ascending
    # code axis is exactly the 3-D argmin(axis=2) it replaces
    # (hash-checked against the unchanged oracle after each rewrite).
    cb2 = (cb_arr**2).sum(-1)  # (subspaces, n_codes)

    def decode_kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = (
                np.stack(pdf["embedding"].to_numpy())
                .astype("float64")
                .reshape(len(pdf), PQ_SUBSPACES, PQ_SUBDIM)
            )
            code = np.empty((len(pdf), PQ_SUBSPACES), dtype="int64")
            for s in range(PQ_SUBSPACES):
                Xs = X[:, s, :]
                ds = (
                    (Xs * Xs).sum(axis=1)[:, None]
                    + cb2[s][None, :]
                    - 2.0 * (Xs @ cb_arr[s].T)
                )
                code[:, s] = ds.argmin(axis=1)  # first min = lowest id
            dec = cb_arr[np.arange(PQ_SUBSPACES)[None, :], code]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "embedding": list(
                        dec.reshape(len(pdf), PQ_SUBSPACES * PQ_SUBDIM)
                    ),
                }
            )

    decoded = qe.select("vec_id", "embedding").mapInPandas(
        decode_kern, schema="vec_id long, embedding array<double>"
    )
    # Scale-adaptive block count for the SDC candidate scan: since
    # round 13 the ~2500-rows-per-block rule lives in knn itself
    # (operators/similarity.py::_resolve_blocks, ADVICE r12 — every
    # blocked-kernel consumer inherits the sf10 OOM fix, not just this
    # call site).  Resolved HERE from the already-pinned n rather than
    # by passing None, because knn's resolver would count() the decoded
    # frame — an extra pass through the decode mapInPandas stage for a
    # number this function already holds.
    if n_blocks is None:
        n_blocks = max(8, n // TARGET_BLOCK_ROWS)
    cand = knn(spark, decoded, k=n_cand, n_blocks=n_blocks)
    eq = embeddings.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vq")
    )
    en = embeddings.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("vn")
    )
    rer = (
        cand.select("vec_id", "neighbor")
        .join(eq, F.col("vec_id") == F.col("q_id"))
        .join(en, F.col("neighbor") == F.col("n_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("vq"), F.col("vn")), 6))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        rer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "neighbor", "cosine")
    )
