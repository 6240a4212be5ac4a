"""Distributed frequency/membership sketches (SURVEY.md §2 appendix,
round-5 additions): Misra-Gries heavy hitters and a pure-DataFrame Bloom
membership filter.

These complete the sketch family next to d4 (HLL distinct) and d8b (KLL
percentiles).  Both follow the ``ann_recall`` evidence discipline: the
query emits *partition-independent*, integer-valued guarantee flags that
the DuckDB oracle can predict exactly, so "the sketch honours its error
bound" is a driver-hashed fact rather than an assertion.

Scale notes (100 TB):

* Misra-Gries is the canonical bounded-memory heavy-hitter summary: each
  task keeps at most ``K`` counters regardless of input size, partial
  summaries merge by counter addition (associative), and the classic
  bound — undercount <= N/(K+1), never overcount — survives arbitrary
  partitioning and batch order (Agarwal et al., "Mergeable Summaries",
  PODS'12; public result).  The per-partition fold is vectorized
  (value_counts per Arrow batch + an O(K log K) prune), not per-row
  Python.
* The Bloom filter is bit-twiddled entirely in DataFrame expressions:
  j=4 probe positions derived from md5 hex slices (the repo's standard
  cross-engine hash), build = one shuffle over <= 66 bitmap words with
  ``bit_or`` (associative, map-side combinable), probe = a broadcast
  join against the tiny bitmap.  63 usable bits per 64-bit word keeps
  ``1 << bit`` off the sign bit, which DuckDB rejects as overflow.
  Production sizing is m ~= 1.44 * log2(1/fpr) bits per key; the fixed
  m=4096 here is sized for the oracle corpus and documented as such.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.plans.registry import query

#: Misra-Gries counter-budget FLOOR. The effective K is scale-aware —
#: clamp(ceil(0.8 * distinct_items), MG_K, MG_K_CAP) — so the N/(K+1)
#: recall threshold tracks the frequency distribution instead of going
#: above the max frequency as the corpus grows (VERDICT r5 item 8: the
#: fixed K=120 geometry returned 0 rows at sf0.1 — correct but
#: demonstrating nothing).  At sf0.01 (150 distinct users) the clamp
#: lands exactly on 120, keeping the original oracle rows unchanged.
MG_K = 120

#: Upper bound on counters per task: the whole point of MG is bounded
#: memory, so K must not track distinct-item cardinality unbounded (a
#: 100 TB event log has ~1e9 users).  Past the cap, the sketch answers
#: "items above N/(K_CAP+1)" — the production framing, where K is set
#: by the frequency threshold of interest, not by d.
MG_K_CAP = 100_000

#: Number of partitions the sketch fans out over (fixed so the sketch
#: exercises the distributed merge path even on a single input file).
MG_PARTITIONS = 8

#: Bloom geometry: 4096 positions packed 63 bits per word (66 words).
BLOOM_BITS = 4096
BLOOM_PROBES = 4
_WORD_BITS = 63


def misra_gries_partial(batches: Iterator[pd.DataFrame], k: int = MG_K):
    """Per-partition Misra-Gries fold over an Arrow batch iterator.

    Vectorized: each batch collapses to value_counts first; the prune
    step subtracts the (k+1)-th largest counter from every counter and
    drops the non-positive ones (the mergeable-summaries prune), which
    removes >= (k+1)*d mass per subtraction — hence total decrement
    <= n_partition/(k+1).  Estimates never exceed true counts.
    """
    counters: dict[int, int] = {}
    for pdf in batches:
        for item, c in pdf["item"].value_counts().items():
            counters[item] = counters.get(item, 0) + int(c)
        if len(counters) > k:
            d = sorted(counters.values(), reverse=True)[k]
            counters = {u: c - d for u, c in counters.items() if c > d}
    yield pd.DataFrame(
        {
            "item": pd.Series(list(counters.keys()), dtype="int64"),
            "est": pd.Series(list(counters.values()), dtype="int64"),
        }
    )


@query(
    "heavy_hitters_mg",
    oracle=f"""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY user_id
    ), t AS (
      SELECT COUNT(*) AS n,
             LEAST(GREATEST(CAST((4 * COUNT(DISTINCT user_id) + 4) // 5
                                 AS BIGINT),
                            {MG_K}), {MG_K_CAP}) + 1 AS kp1
      FROM events
    )
    SELECT c.user_id, c.exact_n,
           CAST(1 AS BIGINT) AS found,
           CAST(1 AS BIGINT) AS within_bound
    FROM c CROSS JOIN t
    WHERE c.exact_n * t.kp1 > t.n
    """,
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over ``events.user_id`` via distributed Misra-Gries.

    Pipeline: size K from the distinct-item count (K =
    clamp(ceil(0.8*d), MG_K, MG_K_CAP) — ceil(0.8*d) as exact
    integer arithmetic (4*d+4)//5, mirrored verbatim in the oracle, so
    the N/(K+1) threshold sits in the tail of the actual frequency
    distribution at every scale), fan the event stream over 8
    partitions, fold a K-counter MG summary per partition (mapInPandas,
    bounded memory), merge partials by summing counters (one tiny
    shuffle over <= 8*K rows).  The guarantee — every item with true
    frequency > N/(K+1) survives the sketch, with estimate in
    [true - N/(K+1), true] — holds for ANY partitioning, so the emitted
    flags are deterministic even though the raw estimates are not; the
    oracle predicts flags==1 for exactly the above-threshold items.

    The distinct count is ONE scalar pin-collect to size the sketch
    (the kmeans-seed precedent); the exact counts ride along (one
    groupBy — same one any validation harness needs); the sketch path
    never touches the driver.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("item")
    )
    d = ev.agg(F.count_distinct("item").alias("d")).collect()[0]["d"]
    k = min(max((4 * d + 4) // 5, MG_K), MG_K_CAP)
    partials = ev.repartition(MG_PARTITIONS).mapInPandas(
        lambda batches: misra_gries_partial(batches, k),
        schema="item long, est long",
    )
    est = partials.groupBy("item").agg(F.sum("est").alias("est"))
    exact = ev.groupBy("item").agg(F.count(F.lit(1)).alias("exact_n"))
    total = ev.agg(F.count(F.lit(1)).alias("n"))
    kp1 = F.lit(k + 1).cast("long")
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("exact_n") * kp1 > F.col("n"))
        .join(est, "item", "left")
        .select(
            F.col("item").alias("user_id"),
            F.col("exact_n"),
            F.col("est").isNotNull().cast("long").alias("found"),
            (
                F.col("est").isNotNull()
                & (F.col("est") <= F.col("exact_n"))
                & ((F.col("exact_n") - F.col("est")) * kp1 <= F.col("n"))
            )
            .cast("long")
            .alias("within_bound"),
        )
    )


def _bloom_positions(hex_col):
    """The 4 probe positions of an md5-hex column: 3-hex-char slices ->
    ints in [0, 4096) (identical in DuckDB, see oracle)."""
    return F.array(
        *[
            F.conv(F.substring(hex_col, 1 + 3 * i, 3), 16, 10).cast("long")
            for i in range(BLOOM_PROBES)
        ]
    )


_BLOOM_ORACLE = f"""
    WITH ref AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE lang = 'en'
    ), refpos AS (
      SELECT DISTINCT
             ('0x' || SUBSTR(h, 1 + 3 * s.i, 3))::BIGINT // {_WORD_BITS} AS word,
             ('0x' || SUBSTR(h, 1 + 3 * s.i, 3))::BIGINT % {_WORD_BITS} AS bit
      FROM ref CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) s
    ), bloom AS (
      SELECT word, bit_or(1::BIGINT << CAST(bit AS INT)) AS wbits
      FROM refpos GROUP BY word
    ), probe AS (
      SELECT d.doc_id,
             CASE WHEN md5(d.text) IN (SELECT h FROM ref)
                  THEN 1 ELSE 0 END AS is_member,
             ('0x' || SUBSTR(md5(d.text), 1 + 3 * s.i, 3))::BIGINT AS pos
      FROM documents d CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) s
    ), hits AS (
      SELECT p.doc_id, p.is_member,
             CASE WHEN b.wbits IS NOT NULL
                       AND (b.wbits & (1::BIGINT << CAST(p.pos % {_WORD_BITS} AS INT))) != 0
                  THEN 1 ELSE 0 END AS hit
      FROM probe p LEFT JOIN bloom b ON b.word = p.pos // {_WORD_BITS}
    )
    SELECT doc_id,
           CAST(MIN(is_member) AS BIGINT) AS is_member,
           CAST(MIN(hit) AS BIGINT) AS bloom_hit,
           CAST(MIN(hit) * (1 - MIN(is_member)) AS BIGINT) AS false_pos
    FROM hits
    GROUP BY doc_id
"""


@query("bloom_membership", oracle=_BLOOM_ORACLE)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate membership: build a Bloom filter over the reference
    corpus (lang='en' document hashes), probe every document through it.

    This is the incremental-ingest dedup prefilter shape: "is this batch
    document already in the corpus?" answered with a fixed-size bitmap
    instead of an anti-join, at the price of a known false-positive rate
    (no false negatives ever).  Unlike `incremental_dedup`'s exact
    anti-join, the bitmap is shippable: m=4096 bits regardless of corpus
    size (production sizes m per key count; same plan shape).

    Everything is deterministic DataFrame bit math — probe positions are
    md5-hex slices, the bitmap is 66 ``bit_or``-aggregated 63-bit words
    — so Spark and DuckDB build BIT-IDENTICAL filters and the per-doc
    hit/false-positive flags hash-match exactly.  Scale: build is one
    shuffle over 66 rows (map-side combined); probe is a broadcast join
    against the 66-row bitmap; no driver collect.
    """
    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("lang") == "en").select(
        F.md5("text").alias("h")
    ).distinct()
    refpos = (
        ref.select(F.explode(_bloom_positions(F.col("h"))).alias("pos"))
        .select(
            F.expr(f"pos div {_WORD_BITS}").alias("word"),
            (F.col("pos") % _WORD_BITS).cast("int").alias("bit"),
        )
        .distinct()
    )
    bloom = refpos.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("wbits")
    )
    member = d.join(
        ref.withColumnRenamed("h", "mh"),
        F.md5(F.col("text")) == F.col("mh"),
        "left_semi",
    ).select("doc_id", F.lit(1).alias("m"))
    probe = d.select(
        "doc_id", F.explode(_bloom_positions(F.md5("text"))).alias("pos")
    ).select(
        "doc_id",
        F.expr(f"pos div {_WORD_BITS}").alias("word"),
        (F.col("pos") % _WORD_BITS).cast("int").alias("bit"),
    )
    hits = probe.join(F.broadcast(bloom), "word", "left").select(
        "doc_id",
        F.when(
            F.col("wbits").isNotNull()
            & (
                F.col("wbits").bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
                )
                != 0
            ),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    agg = hits.groupBy("doc_id").agg(F.min("hit").alias("bloom_hit"))
    return (
        agg.join(member, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("is_member"),
            F.col("bloom_hit").cast("long").alias("bloom_hit"),
            (
                F.col("bloom_hit") * (1 - F.coalesce(F.col("m"), F.lit(0)))
            )
            .cast("long")
            .alias("false_pos"),
        )
    )
