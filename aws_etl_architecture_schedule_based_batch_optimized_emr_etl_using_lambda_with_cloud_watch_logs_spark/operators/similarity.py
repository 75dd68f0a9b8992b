"""Similarity search over embedding columns (SURVEY §2.M3).

``embeddings.embedding`` is ``array<float>``; all math uses
higher-order functions (``zip_with`` + ``aggregate``) — JVM-side,
no UDFs. Brute-force top-k is the correctness oracle; the LSH path
is the 100 TB strategy (bucket then re-rank, touching only a
fraction of the corpus per query).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return (dot_col(a, b) / (norm_col(a) * norm_col(b))).cast("double")


def _as_double(col: Column) -> Column:
    # Compute in float64: DuckDB's list functions promote to double,
    # and float32 accumulation order would perturb low bits.
    return F.transform(col, lambda v: v.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for the given query ids.

    Plan: broadcast the (tiny) query set against the corpus — a
    shuffle-free nested-loop over one corpus scan; per-query ranking
    via window. At 1000 executors this is the classic "scan once,
    score everything" exact kNN: cost O(|corpus|·|queries|·dim),
    embarrassingly parallel, no skew.
    """
    corpus = embeddings.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine_col(F.col("q_vec"), F.col("n_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (sign) LSH bucket id: bit i = sign(v·p_i)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot_col(vec, F.array(*[F.lit(w) for w in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0)
        )
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket
    (plus all 1-bit-flip neighbor buckets — multi-probe), exact
    cosine re-rank within candidates.

    Scale path: corpus is bucketed once (a narrow projection,
    writable as a bucketed table); each query touches ~(1+planes)/2^planes
    of the corpus instead of all of it. Recall is tunable via
    ``n_planes`` and the probe set; the brute-force operator is the
    recall oracle.
    """
    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = first["d"]
    planes = _hyperplanes(dim, n_planes, seed)

    corpus = embeddings.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("bucket", lsh_bucket_col(F.col("n_vec"), planes))

    probes = F.array(
        F.col("q_bucket"),
        *[F.col("q_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    queries = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec"))
        .withColumn("q_bucket", lsh_bucket_col(F.col("q_vec"), planes))
        .withColumn("bucket", F.explode(probes))
    )

    scored = (
        F.broadcast(queries)
        .join(corpus, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id", cosine_col(F.col("q_vec"), F.col("n_vec")).alias("cosine")
        )
        .dropDuplicates(["q_id", "n_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def embedding_stats(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label corpus statistics (norms, dims) — sanity/monitoring
    aggregates over the vector column."""
    return (
        embeddings.select(
            "label",
            F.size(vec_col).alias("dim"),
            norm_col(_as_double(F.col(vec_col))).alias("norm"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
        )
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    exact: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (M2 family).

    ``exact=True``: all-pairs (oracle, O(n²)). Default: LSH-blocked —
    pairs must share a bucket or a 1-bit-flip probe bucket; exact
    cosine filter after. High-cosine pairs collide with high
    probability; misses are quantified against the exact oracle."""
    vecs = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )
    if exact:
        a, b = vecs.alias("a"), vecs.alias("b")
        pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    else:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        planes = _hyperplanes(first["d"], n_planes, seed)
        banded = vecs.withColumn("b0", lsh_bucket_col(F.col("vec"), planes))
        banded = banded.withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.col("b0"),
                    *[F.col("b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
                )
            ),
        ).drop("b0")
        a, b = banded.alias("a"), banded.alias("b")
        pairs = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_col(F.col("a.vec"), F.col("b.vec")).alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cosine") >= threshold)
    )
