"""Incremental near-dup detection against a persisted LSH index
(round 15, VERDICT r14 item 5 — the operation a daily 100 TB ingest
actually runs).

``incremental_dedup`` (plans/curation.py) handles EXACT content hashes
for batch ingest; this module adds the missing MinHash leg: probe a NEW
batch of documents against the standing corpus's persisted signature
index WITHOUT recomputing any corpus signatures.  Composition of the
existing audited pieces (operators/text.py):

  1. ``build_neardup_index``  — the corpus's (doc_id, band, band_key)
     LSH band table, computed ONCE and persisted (parquet in
     production; ``materialize`` here).  This is ``minhash_bands``
     output verbatim, so the index a full-corpus run builds and the
     index this module stores are the same rows.
  2. ``probe_neardup_index`` — band the new batch only (row-local
     minhash, no corpus scan), union with the index, apply the
     full-corpus bucket cap, band-join restricted to pairs with a
     new-batch member, exact-Jaccard-verify the survivors.

EQUIVALENCE CONTRACT (what the oracle pins): the probe's output is
bit-identical to running the FULL-corpus ``minhash_lsh_pairs`` and
keeping only pairs touching the new batch.  The pieces:
  - minhash/banding are row-local per doc (array_distinct before
    explode, round 14), so banding old and new separately yields the
    same rows as banding the union;
  - the bucket cap is computed over the UNIONED band table, i.e. the
    same (band, band_key) populations the full run sees — a cap
    computed over the index alone would diverge the moment a new doc
    tips a bucket over LSH_MAX_BUCKET_SIZE;
  - the candidate join keeps (new x old) and (new x new) pairs,
    normalized to a < b — exactly the full candidate set intersected
    with "touches the new batch";
  - exact verify runs on documents SEMI-JOINED to candidate members,
    which cannot change any per-doc token set, so the Jaccard values
    match the full run's.

SCALE (the point of the operator): per daily batch of size b against a
corpus of size n, the probe reads b documents + the skinny index
(3 longs-ish per (doc, band) row — no text), shuffles O(b) band rows
into the index's band-key partitioning, and exact-verifies only
candidate members — total work O(b + candidates), independent of n
except for the index scan, vs the full run's O(n) re-signature +
re-join.  At 100 TB the index is a bucketed parquet table partitioned
by band so the band-join is shuffle-free on the index side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.materialize import materialize
from etl_data_pipeline_spark.operators.text import (
    LSH_MAX_BUCKET_SIZE,
    exact_jaccard_on_pairs,
    minhash_bands,
)
from etl_data_pipeline_spark.plans.registry import query
from etl_data_pipeline_spark.plans.text import MINHASH_LSH_BODY


def build_neardup_index(
    docs: DataFrame, num_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """The persisted LSH signature index for a standing corpus:
    ``(doc_id, band, band_key)`` — ``minhash_bands`` verbatim, named
    separately because its LIFECYCLE differs: built once per corpus,
    persisted (parquet, bucketed by (band, band_key) at scale), and
    only APPENDED to as batches are accepted — never recomputed.
    tests/test_incremental.py pins the parquet write→read roundtrip
    probing path against the in-memory one."""
    return minhash_bands(docs, num_hashes=num_hashes, band_size=band_size)


def probe_neardup_index(
    index: DataFrame,
    new_docs: DataFrame,
    all_docs: DataFrame,
    threshold: float,
    num_hashes: int = 16,
    band_size: int = 4,
    max_bucket_size: int | None = LSH_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Near-dup pairs ``(a, b, jaccard)`` touching ``new_docs``,
    verified exactly — WITHOUT recomputing any signature in ``index``.

    ``all_docs`` supplies the text of candidate MEMBERS for the exact
    verify (semi-joined down to candidates first, so verify cost is
    O(candidate docs), not O(corpus)); at production scale this is the
    same parquet table both batches came from, read with doc_id
    pushdown.  The bucket cap is applied over index ∪ new bands — see
    the module docstring's equivalence contract."""
    nb = minhash_bands(new_docs, num_hashes=num_hashes, band_size=band_size)
    allb = materialize(
        index.withColumn("is_new", F.lit(False)).unionByName(
            nb.withColumn("is_new", F.lit(True))
        )
    )
    if max_bucket_size is not None:
        # Same key as the join below, so the count pass rides the same
        # hash partitioning (the minhash_lsh_pairs cap, verbatim).
        wb = Window.partitionBy("band", "band_key")
        allb = (
            allb.withColumn("bucket_n", F.count(F.lit(1)).over(wb))
            .filter(F.col("bucket_n") <= max_bucket_size)
            .drop("bucket_n")
        )
    left = allb.filter(F.col("is_new")).select(
        F.col("band").alias("band_l"),
        F.col("band_key").alias("key_l"),
        F.col("doc_id").alias("a"),
    )
    right = allb.select(
        F.col("band").alias("band_r"),
        F.col("band_key").alias("key_r"),
        F.col("doc_id").alias("b"),
    )
    # The candidate pair set is a MULTI-CONSUMER reuse point (guide §5 /
    # r15 optimization round): it feeds the touched-doc semi-join (via
    # both union legs), the inverted-index inter join, and the final
    # left join — four consumers, each of which would otherwise re-run
    # the band self-join + distinct (a shuffle) per consumer.  Measured
    # at sf0.1 (interleaved, .scratch/r15_incneardup_profile.py):
    # 4.1-4.9 s -> 3.4-3.7 s warm, identical 11,409 rows.  ``touched``
    # is materialized for the same reason: it is the semi-join build
    # side behind all three token-stream recomputes inside
    # exact_jaccard_on_pairs.
    cand = materialize(
        left.join(
            right,
            (left.band_l == right.band_r)
            & (left.key_l == right.key_r)
            & (left.a != right.b),
        )
        # normalize so (new, old) and (old, new) collapse; new x new
        # pairs appear from both sides and collapse the same way
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    touched = materialize(
        cand.select(F.col("a").alias("doc_id"))
        .unionByName(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    docs_t = all_docs.join(touched, "doc_id", "left_semi")
    jac = exact_jaccard_on_pairs(docs_t, cand)
    return jac.filter(F.col("jaccard") >= threshold).select(
        "a", "b", "jaccard"
    )


@query(
    "incremental_neardup",
    oracle="WITH "
    + MINHASH_LSH_BODY
    + """
    SELECT a, b, jaccard FROM lsh_pairs
    WHERE a % 10 = 0 OR b % 10 = 0
    """,
)
def incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest near-dup: docs with ``doc_id % 10 = 0`` are the
    incoming batch (10%), the rest are the standing corpus whose LSH
    index is built once and probed — no corpus re-signature.  The
    oracle is the FULL-corpus LSH pair set (MINHASH_LSH_BODY, the
    i4b_minhash_lsh oracle verbatim) restricted to pairs touching the
    batch, which is exactly the module's equivalence contract."""
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    idx = build_neardup_index(corpus)
    return probe_neardup_index(idx, new, d, threshold=0.5)
