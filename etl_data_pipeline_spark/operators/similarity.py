"""Vector similarity operators (SURVEY.md §2 I6-I8 + ANN scale paths).

Two implementations of the cosine kernel:

- ``cosine_pairs_hof``: pure higher-order-function DataFrame expression
  (zip_with + aggregate). Stays 100% JVM-side but evaluates per pair —
  measured ~30s for 2M pairs at sf0.1 (BASELINE.md) — kept as the
  cross-check / no-Python fallback.
- ``cosine_topk_pairs`` / ``knn``: Arrow-batched ``mapInPandas`` with a
  blocked numpy float64 matmul against a broadcast index matrix — the
  fast path (vectorized, ~100x the HOF form).

Scale posture (100 TB): the broadcast index caps at executor memory —
beyond that, partition the index by LSH bucket (``lsh_buckets``) or a
coarse quantizer (centroid assignment, ``label_centroids``) and run the
same kernel per bucket; that is exactly what ann_lsh_topk does.

Cosine formula pinned for oracle parity: dot / sqrt(na2 * nb2) with
float32 inputs widened to float64 BEFORE any arithmetic (matches
``list_inner_product(CAST(x AS DOUBLE[]), ...)`` in DuckDB).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.operators.text import md5_hash32


def cosine_col(a: Column, b: Column) -> Column:
    """JVM-side cosine of two float arrays via higher-order functions."""

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def cosine_pairs_hof(embeddings: DataFrame, min_cos: float) -> DataFrame:
    """All-pairs cosine >= min_cos via HOF expressions (exact, slow path)."""
    a = embeddings.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("va")
    )
    b = embeddings.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, F.col("a") < F.col("b"))
    return (
        pairs.withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= min_cos)
        .select("a", "b", "cosine")
    )


def _broadcast_index(
    spark: SparkSession, embeddings: DataFrame
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collect (ids, matrix, squared-norms) for the broadcast side.

    At test scale the whole table broadcasts (2000 x 64 f64 = 1 MB); at
    100 TB the caller must pre-partition (LSH/IVF) so each broadcast
    index is one bucket.
    """
    pdf = embeddings.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy().astype("int64")
    mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    norms2 = (mat * mat).sum(axis=1)
    return ids, mat, norms2


def _topk_kernel(
    embeddings: DataFrame,
    index: tuple[np.ndarray, np.ndarray, np.ndarray],
    k: int,
    pairs_only: bool,
) -> DataFrame:
    """mapInPandas blocked matmul: per input row, top-k neighbors from the
    broadcast index ordered by (-round(cos,6), neighbor id)."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(index)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_norms2 = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf["vec_id"].to_numpy().astype("int64")
            A = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            na2 = (A * A).sum(axis=1)
            S = A @ b_mat.T
            C = S / np.sqrt(na2[:, None] * b_norms2[None, :])
            Cr = np.round(C, 6)
            out_a, out_b, out_c = [], [], []
            for i in range(len(a_ids)):
                mask = b_ids > a_ids[i] if pairs_only else b_ids != a_ids[i]
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                # total order (-rounded cosine, neighbor id): mirrors the
                # oracle's ORDER BY so per-row top-k is a superset of any
                # global top-k under the same order
                order = np.lexsort((b_ids[cand_idx], -Cr[i, cand_idx]))
                take = cand_idx[order[:k]]
                out_a.extend([a_ids[i]] * len(take))
                out_b.extend(b_ids[take].tolist())
                out_c.extend(Cr[i, take].tolist())
            yield pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_c})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        gen, schema="a long, b long, cosine double"
    )


def cosine_topk_pairs(
    spark: SparkSession, embeddings: DataFrame, k: int
) -> DataFrame:
    """I6: global top-k most-similar pairs (a < b), numpy fast path."""
    index = _broadcast_index(spark, embeddings)
    per_row = _topk_kernel(embeddings, index, k, pairs_only=True)
    return per_row.orderBy(F.desc("cosine"), F.asc("a"), F.asc("b")).limit(k)


def knn(spark: SparkSession, embeddings: DataFrame, k: int) -> DataFrame:
    """I7: k nearest neighbors per vector (neighbor != self)."""
    index = _broadcast_index(spark, embeddings)
    return _topk_kernel(embeddings, index, k, pairs_only=False).select(
        F.col("a").alias("vec_id"), F.col("b").alias("neighbor"), "cosine"
    )


def embedding_neardup(
    spark: SparkSession, embeddings: DataFrame, min_cos: float
) -> DataFrame:
    """Dedup family: embedding-cosine near-duplicate pairs (>= min_cos).

    Same kernel, thresholded instead of top-k (k bounded by index size).
    """
    index = _broadcast_index(spark, embeddings)
    n = int(embeddings.count())
    per_row = _topk_kernel(embeddings, index, n, pairs_only=True)
    return per_row.filter(F.col("cosine") >= min_cos)


def explode_dims(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, pos, v): positional explode with float64 widening."""
    return embeddings.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "v_raw"),
    ).select("vec_id", "label", "pos", F.col("v_raw").cast("double").alias("v"))


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """I8: per-label centroid, one row per (label, pos) — pure groupBy."""
    return (
        explode_dims(embeddings)
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("c"))
    )


def centroid_classify(embeddings: DataFrame) -> DataFrame:
    """I8: nearest-centroid classification by cosine, ties -> smaller label.

    Join-on-pos + re-aggregate keeps everything JVM-side; the centroid
    side is tiny (labels x dims) and broadcasts.
    """
    dims = explode_dims(embeddings)
    cent = label_centroids(embeddings).select(
        F.col("label").alias("cand_label"), "pos", "c"
    )
    cnorm = cent.groupBy("cand_label").agg(F.sum(F.col("c") * F.col("c")).alias("nc2"))
    vnorm = dims.groupBy("vec_id").agg(F.sum(F.col("v") * F.col("v")).alias("nv2"))
    dots = (
        dims.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "cand_label")
        .agg(F.sum(F.col("v") * F.col("c")).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(cnorm), "cand_label")
        .join(vnorm, "vec_id")
        .withColumn("cos", F.col("dot") / F.sqrt(F.col("nv2") * F.col("nc2")))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cand_label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            F.col("cand_label").alias("pred_label"),
            F.round("cos", 6).alias("score"),
        )
    )


def lsh_buckets(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """ANN scale path: random-hyperplane LSH bucket per vector.

    Hyperplane weights come from the cross-engine md5 hash (deterministic
    and SQL-reproducible): w(j,pos) = (md5_32(j||'_'||pos) % 2001 - 1000)/1000.
    Returns (vec_id, bucket).
    """
    dims = explode_dims(embeddings)
    spark = embeddings.sparkSession
    planes = (
        spark.range(n_planes)
        .select(F.col("id").cast("int").alias("j"))
        .crossJoin(spark.range(64).select(F.col("id").cast("int").alias("pos")))
        .select(
            "j",
            "pos",
            (
                (
                    md5_hash32(
                        F.concat_ws("_", F.col("j").cast("string"), F.col("pos").cast("string"))
                    )
                    % 2001
                    - 1000
                )
                / 1000.0
            ).alias("w"),
        )
    )
    bits = (
        dims.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("v") * F.col("w")).alias("proj"))
        .select(
            "vec_id",
            F.when(
                F.col("proj") > 0,
                F.pow(F.lit(2.0), F.col("j")).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("bitval"),
        )
    )
    return bits.groupBy("vec_id").agg(F.sum("bitval").alias("bucket"))


def ann_lsh_topk(embeddings: DataFrame, k: int, n_planes: int = 8) -> DataFrame:
    """ANN: top-k per query within its LSH bucket (equi-join on bucket —
    never all-pairs; the join key is what shards the problem at scale)."""
    from pyspark.sql.window import Window

    b = lsh_buckets(embeddings, n_planes)
    e = embeddings.join(b, "vec_id")
    left = e.select(
        F.col("bucket"),
        F.col("vec_id").alias("q"),
        F.col("embedding").alias("vq"),
    )
    right = e.select(
        F.col("bucket").alias("bucket_r"),
        F.col("vec_id").alias("n"),
        F.col("embedding").alias("vn"),
    )
    pairs = left.join(
        right, (F.col("bucket") == F.col("bucket_r")) & (F.col("q") != F.col("n"))
    ).withColumn("cosine", F.round(cosine_col(F.col("vq"), F.col("vn")), 6))
    w = Window.partitionBy("q").orderBy(F.desc("cosine"), F.asc("n"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("q").alias("vec_id"), F.col("n").alias("neighbor"), "cosine", F.col("rn").cast("long").alias("rn"))
    )


def centroid_scores(embeddings: DataFrame) -> DataFrame:
    """Cosine of every vector against every label centroid:
    (vec_id, cand_label, cos). The shared kernel behind nearest-centroid
    classification (i8) and the IVF coarse quantizer (ivf_ann)."""
    dims = explode_dims(embeddings)
    cent = label_centroids(embeddings).select(
        F.col("label").alias("cand_label"), "pos", "c"
    )
    cnorm = cent.groupBy("cand_label").agg(F.sum(F.col("c") * F.col("c")).alias("nc2"))
    vnorm = dims.groupBy("vec_id").agg(F.sum(F.col("v") * F.col("v")).alias("nv2"))
    dots = (
        dims.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cand_label")
        .agg(F.sum(F.col("v") * F.col("c")).alias("dot"))
    )
    return (
        dots.join(F.broadcast(cnorm), "cand_label")
        .join(vnorm, "vec_id")
        .select(
            "vec_id",
            "cand_label",
            (F.col("dot") / F.sqrt(F.col("nv2") * F.col("nc2"))).alias("cos"),
        )
    )


def ivf_topk(embeddings: DataFrame, k: int = 3, nprobe: int = 2) -> DataFrame:
    """IVF-style ANN: label centroids are the coarse quantizer (cells);
    each vector is ASSIGNED to its nearest cell, each query PROBES its
    ``nprobe`` nearest cells, and exact cosine runs only inside probed
    cells.

    Scale: the cell equi-join shards all similarity work by cell — the
    candidate set per query is |cell| * nprobe, never n. On a real corpus
    the quantizer would be k-means; label centroids keep it deterministic
    and oracle-reproducible here (the plumbing is identical).
    """
    from pyspark.sql.window import Window

    scores = centroid_scores(embeddings)
    wv = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cand_label"))
    ranked = scores.withColumn("crn", F.row_number().over(wv))
    assign = ranked.filter(F.col("crn") == 1).select(
        F.col("vec_id").alias("n"), F.col("cand_label").alias("cell")
    )
    probe = ranked.filter(F.col("crn") <= nprobe).select(
        F.col("vec_id").alias("q"), F.col("cand_label").alias("cell")
    )
    eq = embeddings.select(F.col("vec_id").alias("q"), F.col("embedding").alias("vq"))
    en = embeddings.select(F.col("vec_id").alias("n"), F.col("embedding").alias("vn"))
    cand = probe.join(assign, "cell").filter(F.col("q") != F.col("n"))
    pairs = (
        cand.join(eq, "q")
        .join(en, "n")
        .withColumn("cosine", F.round(cosine_col(F.col("vq"), F.col("vn")), 6))
    )
    w = Window.partitionBy("q").orderBy(F.desc("cosine"), F.asc("n"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q").alias("vec_id"),
            F.col("n").alias("neighbor"),
            "cosine",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def kmeans_iterations(embeddings: DataFrame, k: int = 8, iters: int = 3) -> DataFrame:
    """Iterative k-means (Lloyd) as a driver-side loop over DataFrame ops
    — the pattern for iterative algorithms on Spark: per-iteration state
    (centroids) is a small DataFrame, the big table is touched once per
    iteration, and intermediate assignments are cached to truncate
    lineage. Deterministic init: the k lowest vec_ids seed the centroids.

    Returns one row per iteration: (iteration, inertia, n_nonempty).
    At 100 TB: same loop, with centroids broadcast (they stay k x dims)
    and dims cached in memory/disk; convergence adds a driver-side delta
    check on the tiny centroid frame.
    """
    from pyspark.sql.window import Window

    dims = explode_dims(embeddings).select("vec_id", "pos", "v").cache()
    seeds = (
        embeddings.select("vec_id").orderBy("vec_id").limit(k).collect()
    )
    seed_ids = [r["vec_id"] for r in seeds]
    cent = (
        dims.filter(F.col("vec_id").isin(seed_ids))
        .select(F.col("vec_id").alias("cid"), "pos", F.col("v").alias("c"))
    )
    results = []
    for it in range(1, iters + 1):
        d2 = (
            dims.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("v") - F.col("c")) ** 2).alias("dist2"))
        )
        w = Window.partitionBy("vec_id").orderBy("dist2", "cid")
        assign = (
            d2.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid", "dist2")
            .cache()
        )
        stats = assign.agg(
            F.round(F.sum("dist2"), 6).alias("inertia"),
            F.count_distinct("cid").alias("n_nonempty"),
        ).collect()[0]
        results.append((it, float(stats["inertia"]), int(stats["n_nonempty"])))
        cent = (
            dims.join(assign.select("vec_id", "cid"), "vec_id")
            .groupBy("cid", "pos")
            .agg(F.avg("v").alias("c"))
        )
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        results, "iteration long, inertia double, n_nonempty long"
    )
