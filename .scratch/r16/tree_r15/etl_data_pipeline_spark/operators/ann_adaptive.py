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
- seeds (round 13, VERDICT r12 item 1): the ``nlist`` vectors with the
  smallest ``(h, vec_id)`` where ``h`` is the exact-integer Knuth
  multiplicative hash (see ``seed_hash_col``) — restricted FIRST to the
  candidate set ``h < seed_threshold(n, nlist)`` (expected 2*nlist + 64
  candidates), so selecting them ranks O(nlist) skinny rows instead of
  the previous global ``Window.orderBy(vec_id)``'s one-task sort of
  the whole corpus.  The seed's vec_id IS the cell id (unchanged);
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

At 100 TB (round 13 — the previously documented escape hatch now
EXISTS): nlist ~ n/125 means the centroid table grows with the corpus
(at 1e9 vectors, 8M cells x 64 dims x 8B = 4 GB).  Above
``PIN_MAX_CELLS`` (1e5) the build switches to CHUNKED-BROADCAST
assignment (``chunked_cell_ranks``): the centroid table stays a
DataFrame, each ~65536-cell chunk is pulled and torrent-broadcast one
at a time (33 MB bounded driver/executor increments, never the 4 GB
closure pin), every chunk ranks all vectors with the same exact-integer
kernel, and a partitioned window merges per-chunk candidates under the
global (d, cell) order — bit-identical to the pinned path at any chunk
size (asserted by tests), one extra shuffle per pass as the price.
The REJECTED alternative was a replicate-shuffle-join (explode each
vector once per chunk and equi-join on chunk id): exact too, but it
shuffles n * nchunks full vector rows — at 1e9 vectors x 122 chunks
x 512 B that is ~62 TB of shuffle vs the chunked broadcast's zero.
The per-iteration invariants (integer grid, floor-division update,
(d, cell) tie order) are identical in both modes; ``assign_mode``
selects pin/chunked explicitly for A/B and tests, "auto" by nlist.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_pipeline_spark.materialize import materialize
from etl_data_pipeline_spark.operators.similarity import (
    PQ_SUBDIM,
    PQ_SUBSPACES,
    TARGET_BLOCK_ROWS,
    _cell_topk_kern,
    exact_cosine_rerank_topk,
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

#: Above this many cells the centroid table is no longer collected into
#: one kernel closure; assignment runs chunk-by-chunk (the >1e5-nlist
#: escape hatch the round-12 docstrings promised — VERDICT r12 item 1).
PIN_MAX_CELLS = 100_000

#: Ceiling for auto-mode PIPELINED assignment (round 14): every worker
#: process eventually caches all chunk broadcasts, ~nlist x 64 float64
#: = ~135 MB per worker at this bound — comfortable on any executor
#: profile; above it the chunked-union path keeps per-task memory at
#: one ~32 MB chunk.
PIPE_MAX_CELLS = 262_144

#: Cells per chunk in chunked mode: 65536 x 64 longs = 32 MB per
#: broadcast — executor-comfortable, and at 1e9 vectors (nlist = 8M)
#: only ~122 chunks / union branches.
CENT_CHUNK = 65536

#: Knuth multiplicative seed hash: round(2^31 * (phi - 1)) =
#: 1327217885 (odd; the floor, 1327217884, is even — ADVICE r13).
#: Chosen < 2^31 so (vec_id % 2^32) * KNUTH32 < 2^63 stays EXACT int64
#: in both engines at any BIGINT vec_id (the 32-bit golden constant
#: 2654435761 overflows int64 past vec_id % 2^32 ~ 3.5e9 — rejected).
KNUTH32 = 1327217885

_M32 = 4294967296  # 2^32 — the hash modulus


def seed_hash_col():
    """h(vec_id) = ((vec_id % 2^32) * KNUTH32) % 2^32 as a Column —
    exact integer arithmetic, identical in Spark and DuckDB.  Reducing
    mod 2^32 BEFORE the multiply changes nothing for ids < 2^32
    ((q*2^32 + r) * K == r * K (mod 2^32)) and keeps the product inside
    int64 beyond.  ``F.pmod`` is non-negative while DuckDB's ``%``
    keeps the dividend's sign, so the SQL mirror spells the inner
    reduction ``((vec_id % m + m) % m)`` — identical for ids >= 0 and
    pmod-equal for negative BIGINT ids (ADVICE r13; negative-id case in
    tests/test_ann_hier.py::test_hash_seed_sql_parity)."""
    return F.pmod(
        F.pmod(F.col("vec_id"), F.lit(_M32)) * F.lit(KNUTH32), F.lit(_M32)
    )


def seed_threshold(n: int, nlist: int) -> int:
    """Candidate-set hash bound: expected 2*nlist + 64 candidates.
    The margin makes a sub-nlist candidate count astronomically
    unlikely at any n (and for dense vec_ids the multiplicative hash is
    a low-discrepancy sequence, so the realized count is tighter than
    binomial); if the data ever did fall short, BOTH engines select the
    same smaller seed set — consistent, just fewer cells.  SQL mirror:
    CAST(LEAST(4294967296, (CAST(4294967296 AS HUGEINT) * (2*nlist +
    64)) // n + 1) AS BIGINT)."""
    return min(_M32, (_M32 * (2 * nlist + 64)) // max(n, 1) + 1)


def hash_seeds(grid: DataFrame, n: int, nlist: int) -> DataFrame:
    """(cell, carr): the nlist grid vectors with smallest (h, vec_id),
    h restricted to the seed_threshold candidate set first.  No global
    window: the filter keeps ~2*nlist + 64 rows and the orderBy+limit
    plans as TakeOrderedAndProject (per-partition top-nlist, one
    bounded merge of nlist skinny rows) — an n/nlist ~ 125x reduction
    of the old global-rank seed window's single-task sort, and the
    ranked rows carry only (h, vec_id, g), never the whole corpus
    (plan-asserted by tests/test_plans.py::
    test_kmeans_build_plan_has_no_global_sort)."""
    t = seed_threshold(n, nlist)
    cand = grid.select("vec_id", "g", seed_hash_col().alias("h")).filter(
        F.col("h") < t
    )
    return cand.orderBy("h", "vec_id").limit(nlist).select(
        F.col("vec_id").alias("cell"), F.col("g").alias("carr")
    )


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

    C = np.asarray(carrs, dtype="float64")
    cell_ids = np.asarray(cells, dtype="int64")
    c2 = (C * C).sum(axis=1)
    kk = len(cell_ids) if top is None else min(top, len(cell_ids))

    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield _rank_batch(pdf, C, c2, cell_ids, kk)

    return kern


#: Cells per in-kernel distance block: the kernel's transient distance
#: matrix is batch x _CELL_BLOCK doubles (~160 MB at Arrow's default
#: 10k-row batch), HOWEVER many cells the task ranks against.  Before
#: round 14 the matrix was batch x n_cells in one allocation — ~8 GB
#: per task at the PIN_MAX_CELLS boundary, a latent single-task OOM the
#: pipelined-mode work surfaced.  Blocking changes no result: blocks
#: are ascending slices of the cell-ascending table, so a stable
#: argsort over the block-ordered candidate concat realizes the exact
#: (d, cell) total order (same argument as the chunked-mode merge).
_CELL_BLOCK = 2048


def _topk_cells(G, g2, C, c2, cell_ids, kk):
    """Running top-``kk`` (d, cell)-ascending cells per row of ``G``,
    computed one _CELL_BLOCK-wide distance block at a time.  ``C`` must
    be cell-ascending (both callers collect it that way).  Returns
    (D, CE): row-aligned matrices of the kk smallest distances and
    their cell ids in exact (d, cell) order."""
    import numpy as np

    parts_d, parts_c = [], []
    for s in range(0, len(cell_ids), _CELL_BLOCK):
        Cb, c2b, ib = C[s : s + _CELL_BLOCK], c2[s : s + _CELL_BLOCK], cell_ids[s : s + _CELL_BLOCK]
        # in-place accumulation onto the matmul output — one transient
        # instead of three (measured 1.9x on the 10k x 2048 block).
        # Bit-identical to g2 + c2 - 2*gc in ANY association order:
        # every intermediate is an exactly-representable integer
        # (|gc| <= 3.2e13, final d <= 1.28e14, all < 2^53), so float64
        # addition is exact at each step.
        d = G @ Cb.T
        d *= -2.0
        d += g2
        d += c2b[None, :]
        kb = min(kk, d.shape[1])
        if kb == 1:
            # assignment fast path: argmin's first-occurrence-of-min on
            # the cell-ascending block IS the (d, cell) rule, at O(n)
            # instead of the argsort's O(n log n)
            j = np.argmin(d, axis=1)
            rows = np.arange(d.shape[0])
            parts_d.append(d[rows, j][:, None])
            parts_c.append(ib[j][:, None])
            continue
        # stable argsort on d: ib is ascending, so ties resolve
        # cell-ascending WITHIN the block
        order = np.argsort(d, axis=1, kind="stable")[:, :kb]
        parts_d.append(np.take_along_axis(d, order, axis=1))
        parts_c.append(ib[order])
    if len(parts_d) == 1:
        return parts_d[0], parts_c[0]
    # blocks are ascending cell RANGES, so block-ordered concat + one
    # stable argsort on d is again the exact (d, cell) order; the
    # candidate set is only nblocks x kk wide
    D = np.concatenate(parts_d, axis=1)
    CE = np.concatenate(parts_c, axis=1)
    order = np.argsort(D, axis=1, kind="stable")[:, :kk]
    return np.take_along_axis(D, order, axis=1), np.take_along_axis(CE, order, axis=1)


def _rank_batch(pdf, C, c2, cell_ids, kk):
    """One Arrow batch of _rank_kern's exact integer ranking (shared by
    the closure-pinned, broadcast-chunked and pipelined kernels so the
    modes cannot drift): top-kk (d, cell)-ascending cells per vector."""
    import numpy as np
    import pandas as pd

    G = np.stack(pdf["g"].to_numpy()).astype("float64")
    g2 = (G * G).sum(axis=1)[:, None]
    D, CE = _topk_cells(G, g2, C, c2, cell_ids, kk)
    kk = D.shape[1]
    vids = pdf["vec_id"].to_numpy()
    return pd.DataFrame(
        {
            "vec_id": np.repeat(vids, kk),
            "d": D.reshape(-1).astype("int64"),
            "cell": CE.reshape(-1),
            "crn": np.tile(np.arange(1, kk + 1, dtype="int64"), len(vids)),
        }
    )


def _rank_kern_bc(bc, top: int | None):
    """_rank_kern over a TorrentBroadcast chunk instead of a closure
    pin: ``bc.value`` resolves (cells, carrs) lazily on the executor
    (cached per worker process, shipped once per executor per chunk —
    never serialized into every task binary), so the driver's plan
    holds only a broadcast handle however large the chunk."""
    import numpy as np

    def kern(batches):
        cells_l, carrs_l = bc.value
        C = np.asarray(carrs_l, dtype="float64")
        cell_ids = np.asarray(cells_l, dtype="int64")
        c2 = (C * C).sum(axis=1)
        kk = len(cell_ids) if top is None else min(top, len(cell_ids))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield _rank_batch(pdf, C, c2, cell_ids, kk)

    return kern


_RANK_SCHEMA = "vec_id long, d long, cell long, crn long"


def _rank_kern_multi(bcs, top: int | None):
    """Pipelined-mode kernel: rank against EVERY chunk broadcast in one
    pass over the corpus, merging per-chunk top-kk candidates in-task.

    Per chunk: the shared cell-blocked _topk_cells selection (chunks are
    cell-ascending, so per-chunk order is exact).  Across chunks: the
    cross-chunk merge lexsorts the narrow candidate concat by (d, cell)
    — at most nchunks x kk wide — realizing the same global total order
    the chunked mode's merge window/groupBy-min produces, whatever the
    chunk partition (since round 15 chunks are ascending cell RANGES,
    so block-ordered concat would suffice, but the lexsort's cost on
    the kk-wide candidate set is negligible and it stays correct for
    ANY partition of the cells).  Memory: each Broadcast caches its
    deserialized value in the worker process, so a long-lived worker
    converges to FULL centroid residency (~nlist x 64 doubles) — the
    documented trade vs chunked mode's nchunks corpus passes + merge
    shuffle; auto mode therefore caps this path at PIPE_MAX_CELLS.

    ADVICE r14 (hoisting): the Python-list broadcast payloads are
    converted to (C, c2, cell_ids) numpy arrays ONCE PER TASK, on the
    first non-empty Arrow batch — not per batch per chunk, which was
    an O(nlist x 64) list walk re-run every ~10k rows.  Lazy (not at
    closure build) so empty partitions never deserialize a broadcast."""
    import numpy as np
    import pandas as pd

    def kern(batches):
        conv = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if conv is None:
                conv = []
                for bc in bcs:
                    cells_l, carrs_l = bc.value
                    C = np.asarray(carrs_l, dtype="float64")
                    cell_ids = np.asarray(cells_l, dtype="int64")
                    conv.append((C, (C * C).sum(axis=1), cell_ids))
            G = np.stack(pdf["g"].to_numpy()).astype("float64")
            g2 = (G * G).sum(axis=1)[:, None]
            parts_d, parts_c = [], []
            for C, c2, cell_ids in conv:
                kk_c = len(cell_ids) if top is None else min(top, len(cell_ids))
                D, CE = _topk_cells(G, g2, C, c2, cell_ids, kk_c)
                parts_d.append(D)
                parts_c.append(CE)
            D = np.concatenate(parts_d, axis=1)
            CE = np.concatenate(parts_c, axis=1)
            kk = D.shape[1] if top is None else min(top, D.shape[1])
            # lexsort: primary d, ties by cell ascending (exact global order)
            order = np.lexsort((CE, D), axis=1)[:, :kk]
            Dk = np.take_along_axis(D, order, axis=1)
            CEk = np.take_along_axis(CE, order, axis=1)
            vids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vids, kk),
                    "d": Dk.reshape(-1).astype("int64"),
                    "cell": CEk.reshape(-1),
                    "crn": np.tile(np.arange(1, kk + 1, dtype="int64"), len(vids)),
                }
            )

    return kern


def _cell_range_chunks(cent: DataFrame, chunk_cells: int):
    """Yield (cells, carrs) centroid chunks as ASCENDING CELL RANGES of
    EXACTLY ``chunk_cells`` cells each (the last possibly smaller).

    ADVICE r14: the former pmod(cell, nchunks) partition balanced the
    chunks only in expectation — cell ids are hash-selected vec_ids, so
    a skewed residue class could push one chunk past the ~32 MB
    driver-pin/broadcast bound the callers promise.  Range chunking
    over the SORTED id list makes the bound hold by construction: one
    skinny collect of the cell-id column (8 bytes/cell — ~2 MB at
    PIPE_MAX_CELLS, ~64 MB even at an nlist of 8M, vs the 520-byte
    full rows), then per-chunk BETWEEN filters keep each full-row pin
    at <= chunk_cells rows.  Cell ids are unique by construction (they
    are seed vec_ids), so the ranges partition the table exactly.

    Raises on an empty centroid table (both callers' former behavior)."""
    ids = sorted(r["cell"] for r in cent.select("cell").collect())
    if not ids:
        raise ValueError("cell ranking: empty centroid table")
    for s in range(0, len(ids), chunk_cells):
        sub = cent.filter(
            F.col("cell").between(ids[s], ids[min(s + chunk_cells, len(ids)) - 1])
        )
        yield _collect_cents(sub)


def pipelined_cell_ranks(
    grid: DataFrame,
    cent: DataFrame,
    top: int | None,
    chunk_cells: int = CENT_CHUNK,
) -> DataFrame:
    """Cell ranking against an unpinned centroid table, PIPELINED
    (round 14, VERDICT r13 item 4): all chunks are collected and
    torrent-broadcast up front (the same bounded ~32 MB driver pins as
    chunked mode, just not interleaved with compute), then ONE
    mapInPandas pass ranks every vector against every chunk and merges
    in-task.  vs chunked mode this deletes (a) the nchunks scans of the
    (cached) corpus — the union plan runs one mapInPandas branch per
    chunk — and (b) the merge shuffle entirely (no groupBy-min, no
    per-vec_id window: the kernel emits final global ranks).  The cost
    is executor-side residency: every worker process eventually caches
    all chunk values (~nlist x 64 doubles total), so auto mode uses
    this path only up to PIPE_MAX_CELLS and falls back to chunked-union
    above it.  Bit-identical to pinned/chunked by the same argument as
    the chunked merge (asserted by the mode-equivalence tests).
    Chunks are balanced ascending cell ranges — exactly chunk_cells
    cells each by construction (_cell_range_chunks, ADVICE r14), so
    every driver pin and broadcast honors the ~32 MB bound, not just
    in expectation."""
    spark = grid.sparkSession
    bcs = [
        spark.sparkContext.broadcast(chunk)
        for chunk in _cell_range_chunks(cent, chunk_cells)
    ]
    return grid.mapInPandas(_rank_kern_multi(bcs, top), schema=_RANK_SCHEMA)


def chunked_cell_ranks(
    grid: DataFrame,
    cent: DataFrame,
    top: int | None,
    chunk_cells: int = CENT_CHUNK,
) -> DataFrame:
    """Cell ranking against an UNPINNED centroid DataFrame — the
    >1e5-nlist build path (VERDICT r12 item 1).

    Chunks are balanced ascending cell ranges of exactly chunk_cells
    cells (_cell_range_chunks — ADVICE r14 replaced the former
    expectation-balanced pmod partition); each chunk is
    collected (bounded: chunk_cells x 64 longs, ~32 MB), torrent-
    broadcast, and ranked by the shared exact-integer kernel; a window
    PARTITIONED BY vec_id merges per-chunk top-kk candidates under the
    global (d, cell) order.  Bit-identical to the pinned path: each
    chunk's stable (d, cell-ascending) top-kk is exactly the global
    rule restricted to the chunk, so the union contains the global
    top-kk and the final window realizes the same total order.  Cost
    vs pinned, measured and modeled: the two ASSIGNMENT iterations
    (top=1) merge by partial-aggregated groupBy-min — no candidate
    volume at all; the final RANKING pass emits nchunks * min(top,
    chunk_cells) candidate rows per vector through one shuffle vs the
    pinned kernel's in-task top — a factor of nchunks when top >=
    chunk_cells (measured the hard way: a 7-chunk sf10 run with
    top=nprobe=320 > chunk=256 pushed n * nlist = 320M rows into the
    merge window and exhausted the 8g rig's execution memory).  Auto
    mode keeps that factor small where it engages: at the PIN_MAX
    boundary (nlist ~1.3e5) nchunks = 2; deep in the chunked regime
    the FLAT path is the documented non-scale path anyway — ivf2
    (plans/ann_hier.py) is the production build there, and its
    chunked pieces partition by supercluster with no merge window.

    Broadcast lifetime (ADVICE r13): the per-chunk broadcasts feed a
    LAZY plan — no action runs inside this function or the build loop
    (materialize/persist is itself lazy), and lineage-kept recompute
    after executor loss may re-read any chunk — so there is no safe
    point here to ``unpersist()`` them.  Reclamation is deliberately
    left to Spark's ContextCleaner: once the returned plan is
    unreferenced, the Python Broadcast handles (held only by the
    kernel closures) are GC'd and the executor copies are dropped.
    Peak accumulation is bounded: nchunks x ~32 MB per pass (~4 GB at
    nlist = 8M) on executors that in the same regime hold the corpus
    itself."""
    from pyspark.sql.window import Window

    spark = grid.sparkSession
    parts = []
    for chunk in _cell_range_chunks(cent, chunk_cells):
        bc = spark.sparkContext.broadcast(chunk)
        parts.append(
            grid.mapInPandas(_rank_kern_bc(bc, top), schema=_RANK_SCHEMA)
            .select("vec_id", "d", "cell")
        )
    un = parts[0]
    for nxt in parts[1:]:
        un = un.unionByName(nxt)
    if top == 1:
        # Argmin merge via PARTIAL AGGREGATION instead of a window:
        # min(struct(d, cell)) is the lexicographic (d, cell) rule
        # verbatim, combines map-side, and shuffles n pre-aggregated
        # rows instead of n * nchunks candidates — this is the merge
        # the two assignment iterations take, so the iteration loop
        # adds no candidate-volume term at all.
        return (
            un.groupBy("vec_id")
            .agg(F.min(F.struct("d", "cell")).alias("m"))
            .select(
                "vec_id",
                F.col("m.d").alias("d"),
                F.col("m.cell").alias("cell"),
                F.lit(1).cast("long").alias("crn"),
            )
        )
    w = Window.partitionBy("vec_id").orderBy("d", "cell")
    ranked = un.withColumn("crn", F.row_number().over(w).cast("long"))
    if top is not None:
        ranked = ranked.filter(F.col("crn") <= top)
    return ranked.select("vec_id", "d", "cell", "crn")


def _collect_cents(cent: DataFrame):
    """Driver-pin a (cell, carr) centroid frame, cell-ascending.
    Bounded by the caller's contract: full nlist x 64 longs in pinned
    mode (nlist <= PIN_MAX_CELLS by _resolve_assign_mode), one
    CENT_CHUNK slice at a time in chunked mode — so the driver never
    holds more than ~32 MB of centroids however large nlist grows."""
    rows = sorted(cent.collect(), key=lambda r: r["cell"])
    return (
        [r["cell"] for r in rows],
        [list(r["carr"]) for r in rows],
    )


def _resolve_assign_mode(assign_mode: str, nlist: int) -> str:
    """Returns "pin" | "pipelined" | "chunked".  "auto" pins below
    PIN_MAX_CELLS (today's test scales: zero behavior change), runs
    PIPELINED between PIN_MAX_CELLS and PIPE_MAX_CELLS (one corpus
    pass, no merge shuffle, full-centroid worker residency — round 14),
    and falls back to chunked-union above (bounded per-task memory);
    explicit modes force a path for A/B and the mode-equivalence tests.

    ``SPARK_GRAFT_ASSIGN_MODE`` / ``SPARK_GRAFT_CHUNK_CELLS`` (round
    14, VERDICT r13 item 6) are process-level forcing hooks for
    harnesses that can only address a REGISTERED query by name — the
    executor-loss chaos battery runs ``ivf2_ann`` in a subprocess and
    needs the chunked broadcast path engaged at sf0.1's tiny nlist.
    Results are mode-invariant (the equivalence tests' contract), so
    the override can never change a hash, only the physical plan.
    ADVICE r14: the env hook applies ONLY when the caller asked for
    "auto" — an explicit pin/chunked/pipelined argument is an A/B or
    equivalence-test contract that a leaked env var must not silently
    collapse into a same-mode comparison (registered queries all go
    through auto, so the chaos battery's forcing still engages)."""
    env = os.environ.get("SPARK_GRAFT_ASSIGN_MODE")
    if env and assign_mode == "auto":
        assign_mode = env
    if assign_mode in ("pin", "chunked", "pipelined"):
        return assign_mode
    if assign_mode != "auto":
        raise ValueError(
            "assign_mode must be auto|pin|pipelined|chunked, "
            f"got {assign_mode!r}"
        )
    if nlist <= PIN_MAX_CELLS:
        return "pin"
    if nlist <= PIPE_MAX_CELLS:
        return "pipelined"
    return "chunked"


def resolve_chunk_cells(requested: int) -> int:
    """Chunk-size forcing twin of the assign-mode env hook: a tiny
    ``SPARK_GRAFT_CHUNK_CELLS`` makes even sf0.1's nlist split into
    multiple broadcast chunks, which is what the chaos gate needs to
    kill an executor DURING a multi-chunk pass."""
    env = os.environ.get("SPARK_GRAFT_CHUNK_CELLS")
    return int(env) if env else requested


def kmeans_cell_ranks(
    embeddings: DataFrame,
    nlist: int,
    iters: int = 3,
    top: int | None = None,
    assign_mode: str = "auto",
    chunk_cells: int = CENT_CHUNK,
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
    kernel speed; the TWO-LEVEL quantizer (plans/ann_hier.py) is the
    registered O(n * sqrt(nlist)) scale path for the work term, and
    chunked mode (assign_mode, round 13) removes the memory term — the
    centroid closure pin — above PIN_MAX_CELLS.  Seeds come from the
    deterministic Knuth-hash sample (hash_seeds), so no global-rank
    window ever sorts the corpus in one task.
    """
    grid = materialize(grid_vectors(embeddings))
    n = grid.count()
    mode = _resolve_assign_mode(assign_mode, nlist)
    chunk_cells = resolve_chunk_cells(chunk_cells)
    rank = {
        "pin": lambda c, top: grid.mapInPandas(
            _rank_kern(*_collect_cents(c), top=top), schema=_RANK_SCHEMA
        ),
        "pipelined": lambda c, top: pipelined_cell_ranks(
            grid, c, top=top, chunk_cells=chunk_cells
        ),
        "chunked": lambda c, top: chunked_cell_ranks(
            grid, c, top=top, chunk_cells=chunk_cells
        ),
    }[mode]
    cent = materialize(hash_seeds(grid, n, nlist))

    for _ in range(iters - 1):
        assign = rank(cent, 1).select("vec_id", "cell")
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

    ranked = rank(cent, top)
    return materialize(ranked.select("vec_id", "cell", "d", "crn"))


def ivf_topk_adaptive(
    embeddings: DataFrame,
    k: int = 3,
    iters: int = 3,
    assign_mode: str = "auto",
    chunk_cells: int = CENT_CHUNK,
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
        embeddings,
        nlist=nlist,
        iters=iters,
        top=nprobe,
        assign_mode=assign_mode,
        chunk_cells=chunk_cells,
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
    # shared stage-2: exact-cosine top-k with per-vector norm hoisting
    # (operators/similarity.py::exact_cosine_rerank_topk, r15)
    return exact_cosine_rerank_topk(cand, embeddings, k)
