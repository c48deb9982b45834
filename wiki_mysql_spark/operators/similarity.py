"""Similarity search over embedding columns (north-star extension; no
counterpart in the reference — closest hook is the articles join surface,
``/root/reference/README.md:49-54``).

Two tiers:
  * brute-force cosine top-k — exact baseline; a broadcast of the (small)
    query set against a full scan of the corpus, one shuffle for the
    per-query top-k window. Correct at any corpus size as long as the QUERY
    side is small.
  * random-hyperplane LSH — the 100 TB path: each vector gets an n-bit
    signature (sign of dot with fixed hyperplanes); only same-bucket vectors
    meet in the join. Recall < 1 by construction; the brute-force operator
    doubles as its verifier.

Hyperplanes are deterministic (seeded, frozen at plan time) so results are
reproducible run-to-run and testable.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wiki_mysql_spark.functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank) — rank by raw (unrounded)
    similarity with neighbor-id tiebreak, so the k-set is deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("raw_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            (F.round("raw_sim", 6) + 0.0).alias("cos_sim"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: assign every vector to its nearest
    coarse centroid (the inverted file), then search only the query's
    ``n_probe`` closest cells.

    Centroids here are the first ``n_centroids`` corpus vectors — a
    deterministic stand-in for a trained k-means codebook (swap in
    pyspark.ml KMeans centers in production; the plan shape is identical).
    At 100 TB the corpus is written partitioned by ``cell`` so a query
    touches n_probe partitions instead of the full scan.
    """
    cent = F.broadcast(
        corpus.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("centv")
        )
    )

    def assign(df: DataFrame, idc: str, vc: str, keep_n: int) -> DataFrame:
        scored = df.crossJoin(cent).select(
            F.col(idc),
            F.col(vc),
            "cent_id",
            cosine(F.col(vc), F.col("centv")).alias("c_sim"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("c_sim").desc(), F.col("cent_id"))
        return scored.select(
            idc, vc, "cent_id", F.row_number().over(w).alias("crank")
        ).where(F.col("crank") <= keep_n)

    cells = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id",
        "cv",
        1,
    ).select("neighbor_id", "cv", F.col("cent_id").alias("cell"))
    probes = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
        n_probe,
    ).select("query_id", "qv", F.col("cent_id").alias("cell"))

    scored = (
        F.broadcast(probes)
        .join(cells, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("raw_sim")
        )
        .dropDuplicates(["query_id", "neighbor_id"])  # neighbor via 2 probed cells
    )
    w = Window.partitionBy("query_id").orderBy(F.col("raw_sim").desc(), F.col("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            (F.round("raw_sim", 6) + 0.0).alias("cos_sim"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """n-bit random-hyperplane signature as a long (bit i = sign of dot with
    plane i), computed with zip_with/aggregate — no UDF."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec.cast("array<double>"), p, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine + window rank inside the bucket. At scale the corpus is
    written bucket-partitioned, so a query touches one partition."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("raw_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            (F.round("raw_sim", 6) + 0.0).alias("cos_sim"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )
