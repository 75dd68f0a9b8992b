"""Similarity search over embedding columns (SURVEY §2.M3).

``embeddings.embedding`` is ``array<float>``. Scoring math runs in
Arrow-batched numpy (``mapInPandas`` / pandas UDFs): a per-batch
matrix multiply scores thousands of vectors per Python call, where
the higher-order-function form (``aggregate(zip_with(...))``) is
interpreted per *element* — measured 30-100× slower. The HOF column
helpers are kept for small metadata-scale uses.

Scale design: brute-force top-k broadcasts the (small) query matrix
and makes ONE corpus scan with per-batch top-k, so the shuffle is
``partitions × queries × k`` rows, not the corpus. The LSH path
buckets the corpus once and probes only matching buckets.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# ---------------------------------------------------- HOF column forms
# (JVM-side but interpreted per element — fine for few/small arrays,
# not the hot path.)


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    # try_divide: a zero vector has no direction, so its cosine is
    # NULL (and under ANSI mode a plain / is a runtime
    # DIVIDE_BY_ZERO crash, found by the degenerate-corpus probe).
    # Bit-identical to / whenever both norms are positive; NULL
    # scores sort last under desc() so zero vectors rank behind
    # every real match instead of killing the job.
    return F.try_divide(
        dot_col(a, b), norm_col(a) * norm_col(b)
    ).cast("double")


# ------------------------------------------------- Arrow/numpy kernels


def _stack(series: pd.Series) -> np.ndarray:
    """Series of array<float> → (n, d) float64 matrix."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def non_null_vecs(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exclude NULL embeddings before any vector kernel: a missing
    vector has no geometry — it cannot be a query, neighbor, centroid
    member, or near-dup — and a None row kills ``np.stack`` executor-
    side with an opaque shape error (degenerate-corpus probe). The
    IsNotNull predicate pushes down to the parquet scan, so at 100 TB
    the null rows are skipped at read time, not shipped to Python."""
    return df.filter(F.col(vec_col).isNotNull())


def inferred_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector width from the first non-NULL embedding, or ``None``
    when the corpus has no non-NULL vectors at all — the fully
    degenerate shape the alternating-NULL probe variant never
    produces (it always leaves survivors), so ``.first()`` here can
    return no row. Callers translate ``None`` into their empty
    result frame (degrade-never-crash) or a named error where no
    sensible empty result exists."""
    row = non_null_vecs(df, vec_col).select(F.size(vec_col).alias("d")).first()
    return None if row is None else row["d"]


def _pairwise_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized row-wise cosine; assumes uniform dims per batch
    (falls back to a per-row loop on ragged input)."""
    try:
        A, B = _stack(a), _stack(b)
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt(np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B))
        # zero-norm guard (r12 review find): an all-zero embedding
        # (failed upstream embedding job) made den 0 and the cosine
        # NaN — which Spark RANKS ABOVE every real double and passes
        # >= threshold filters, so the zero vector became everyone's
        # rank-1 neighbor and a false near-dup edge. Similarity to a
        # zero vector is 0, the same convention _unit_rows pins.
        return pd.Series(np.where(den > 0.0, num / np.where(den > 0.0, den, 1.0), 0.0))
    except ValueError:  # ragged dims
        return pd.Series(
            [
                (
                    0.0
                    if (nx := float(np.dot(x, x))) == 0.0
                    or (ny := float(np.dot(y, y))) == 0.0
                    else float(np.dot(x, y) / (np.sqrt(nx) * np.sqrt(ny)))
                )
                for x, y in (
                    (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
                    for x, y in zip(a, b)
                )
            ]
        )


cosine_pudf = F.pandas_udf(_pairwise_cosine, DoubleType())


@F.pandas_udf(DoubleType())
def norm_pudf(a: pd.Series) -> pd.Series:
    try:
        A = _stack(a)
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", A, A)))
    except ValueError:
        return pd.Series([float(np.linalg.norm(np.asarray(v, dtype=np.float64))) for v in a])


_SCORED_SCHEMA = StructType(
    [
        StructField("q_id", LongType(), False),
        StructField("n_id", LongType(), False),
        StructField("cosine", DoubleType(), True),
    ]
)


def _unit_rows(mat):
    """Row-normalize with a zero-norm guard: an all-zero embedding
    (a failed upstream embedding job's artifact) divides to NaN, and
    Spark's ordering ranks NaN ABOVE every real cosine — the zero
    vector would become everyone's top neighbor. Guarded rows come
    out all-zero instead (cosine 0: similar to nothing)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = np.inf
    return mat / norms


def local_topk_scored(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = None,
    same_label: bool = False,
) -> DataFrame:
    """Shared Arrow scan-and-reduce kernel behind every exact scoring
    stage (brute force, the rp/sq shortlists, hard-negative and
    triplet mining).

    Collect the (tiny) query vectors, broadcast them, and make ONE
    ``mapInPandas`` pass over the corpus — each Arrow batch is scored
    with a single ``(batch × dim) @ (dim × queries)`` matrix multiply
    and reduced to its local top-k per query (``argpartition``), so
    everything downstream sees only ``partitions × queries × k`` rows
    instead of the N·Q scored frame. At 1000 executors this is the
    classic "scan once, score everything" pattern: O(N·Q·d) flops,
    embarrassingly parallel, no skew, near-zero shuffle — the
    scale-correct replacement for a ``Window.partitionBy(q_id)`` over
    the full scored frame, which funnels every corpus row into |Q|
    tasks (per-task O(N), the round-5 verdict's #1 plan defect).

    ``label_col``: when given, neighbors sharing the query's label
    are masked out batch-side (hard-negative semantics);
    ``same_label=True`` inverts the mask to keep ONLY same-label
    neighbors (positive mining).

    Returns the REDUCED scored frame (q_id, n_id, cosine); callers
    apply their own bounded global rank over it.
    """
    embeddings = non_null_vecs(embeddings, vec_col)
    qcols = [id_col, vec_col] + ([label_col] if label_col else [])
    q_rows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(*qcols)
        .collect()
    )
    if not q_rows:
        raise ValueError("no query vectors found for the given ids")
    q_ids = np.array([row[0] for row in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(row[1], dtype=np.float64) for row in q_rows])
    q_unit = _unit_rows(q_mat)
    q_labels = [row[2] for row in q_rows] if label_col else None
    bc = embeddings.sparkSession.sparkContext.broadcast(
        (q_ids, q_unit, q_labels)
    )

    def score(batches):
        bq_ids, bq_unit, bq_labels = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _stack(pdf[vec_col])
            labels = pdf[label_col].to_numpy() if bq_labels else None
            unit = _unit_rows(mat)
            scores = unit @ bq_unit.T  # (batch, queries)
            for j, qid in enumerate(bq_ids):
                col = scores[:, j]
                keep = ids != qid
                if labels is not None:
                    if same_label:
                        keep &= labels == bq_labels[j]
                    else:
                        # a NULL-labeled row is an UNKNOWN class, not
                        # a confirmed impostor: elementwise != would
                        # count it as a different-label negative while
                        # the same_label branch excludes it (r12
                        # review find — asymmetric NULL handling)
                        keep &= (labels != bq_labels[j]) & (
                            ~pd.isna(labels)
                        )
                idx = np.nonzero(keep)[0]
                if idx.size == 0:
                    continue
                kk = min(k, idx.size)
                top = idx[np.argpartition(-col[idx], kk - 1)[:kk]]
                yield pd.DataFrame(
                    {"q_id": qid, "n_id": ids[top], "cosine": col[top]}
                )

    # No _parallelize_narrow here: the matrix multiply is so cheap
    # per batch that the repartition + extra python workers cost more
    # than single-partition scoring at small inputs (measured 0.38s
    # vs 0.54s at sf0.1); at real scale the scan arrives with many
    # partitions and parallelizes naturally.
    return embeddings.select(*qcols).mapInPandas(score, _SCORED_SCHEMA)


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for the given query ids — the
    :func:`local_topk_scored` Arrow kernel plus a global rank over
    the already-reduced ``partitions × queries × k`` frame."""
    scored = local_topk_scored(embeddings, query_ids, k, id_col, vec_col)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def bucket_pudf(planes: list[list[float]]):
    """Random-hyperplane (sign) LSH bucket id as an Arrow-batched UDF:
    bit i of the bucket = sign(v·p_i), computed for a whole batch with
    one ``(batch × dim) @ (dim × planes)`` multiply."""
    plane_mat = np.asarray(planes, dtype=np.float64).T  # (dim, planes)
    weights = (1 << np.arange(plane_mat.shape[1], dtype=np.int64))

    @F.pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        mat = _stack(vecs)
        signs = (mat @ plane_mat) > 0
        return pd.Series(signs @ weights)

    return _bucket


def multitable_bucket_pudf(tables: list[list[list[float]]]):
    """Bucket ids for L independent hash tables in one Arrow pass:
    returns ``array<long>`` of length L per vector (one einsum for
    all tables)."""
    mats = np.asarray(tables, dtype=np.float64)  # (L, planes, dim)
    weights = (1 << np.arange(mats.shape[1], dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = _stack(vecs)  # (n, dim)
        signs = np.einsum("nd,lpd->nlp", mat, mats) > 0  # (n, L, planes)
        buckets = signs @ weights  # (n, L)
        return pd.Series(list(buckets))

    return _buckets


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """HOF form of the bucket id (kept for plan-only contexts)."""
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
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in ANY
    of ``n_tables`` independent hash tables (plus all 1-bit-flip
    neighbor buckets per table — multi-probe); exact cosine re-rank
    over the candidate union.

    Multiple tables are the standard recall lever when per-bucket
    collision probability is low (e.g. near-orthogonal corpora where
    top neighbors sit at cosine ≈ 0.35: one 8-plane table with 1-bit
    probes recalls ~0.12; eight tables lift that to ~0.6 while still
    touching ~28% of the corpus per query — and far less on real
    clustered embeddings, where per-table collision is high).

    Scale path: the corpus is bucketed once for all tables (one
    einsum in one Arrow pass, writable as a bucketed table keyed on
    (table, bucket)); per-query work is proportional to candidates,
    not corpus. The brute-force operator is the recall oracle.
    """
    if dim is None:
        # dim from a NON-NULL vector (a null first row reads size NULL)
        dim = inferred_dim(embeddings, vec_col)
        if dim is None:
            # zero non-NULL vectors: no queries, no neighbors
            return embeddings.select(
                F.col(id_col).alias("q_id"),
                F.col(id_col).alias("n_id"),
                F.lit(1).cast("int").alias("rank"),
            ).limit(0)
    tables = _lsh_tables(dim, n_planes, n_tables, seed)
    corpus = _lsh_bucketed_corpus(embeddings, tables, id_col, vec_col)
    return _lsh_probe_rank(
        corpus, embeddings, query_ids, tables, n_planes, k, id_col, vec_col
    )


def _lsh_tables(
    dim: int, n_planes: int, n_tables: int, seed: int
) -> list[list[list[float]]]:
    """The L independent hyperplane tables — derived purely from
    (dim, n_planes, n_tables, seed), so an index written with one
    call is probe-compatible with any later call."""
    return [
        _hyperplanes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)
    ]


def _lsh_bucketed_corpus(
    embeddings: DataFrame, tables, id_col: str, vec_col: str
) -> DataFrame:
    """(n_id, n_vec, table, bucket) rows: every corpus vector in each
    of its L buckets — one einsum Arrow pass."""
    buckets = multitable_bucket_pudf(tables)
    embeddings = non_null_vecs(embeddings, vec_col)
    return (
        embeddings.select(
            F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
        )
        .withColumn("buckets", buckets(F.col("n_vec")))
        .select(
            "n_id", "n_vec", F.posexplode("buckets").alias("table", "bucket")
        )
    )


def _lsh_probe_rank(
    corpus: DataFrame,
    embeddings: DataFrame,
    query_ids: list[int],
    tables,
    n_planes: int,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Multi-probe the bucketed corpus with the query vectors and
    exact-rank the candidate union (shared by the in-memory and
    persisted-index paths)."""
    buckets = multitable_bucket_pudf(tables)
    probes = F.array(
        F.col("q_bucket"),
        *[F.col("q_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    queries = (
        non_null_vecs(embeddings, vec_col)
        .filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("buckets", buckets(F.col("q_vec")))
        .select(
            "q_id", "q_vec", F.posexplode("buckets").alias("table", "q_bucket")
        )
        .withColumn("bucket", F.explode(probes))
        .drop("q_bucket")
    )

    scored = (
        F.broadcast(queries)
        .join(corpus, ["table", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine_pudf(F.col("q_vec"), F.col("n_vec")).alias("cosine"),
        )
        .dropDuplicates(["q_id", "n_id"])
    )
    # Shuffle bound: this window sees only the CANDIDATE frame —
    # per query ≤ (n_planes+1 probes × tables × bucket occupancy),
    # and the adaptive plane count keeps occupancy ~corpus/2^planes
    # constant — NOT the full corpus (cf. local_topk_scored). If the
    # probe fan-out is ever raised to near-exhaustive, swap this
    # stage for the Arrow local-top-k kernel unchanged.
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def lsh_index_write(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> int:
    """Materialize the bucketed LSH corpus as a parquet index
    partitioned by ``table`` — the build-once/query-many path: the
    corpus einsum pass runs once at build, and every later query
    probes the stored buckets instead of re-hashing 100 TB of
    vectors. The full hash-parameter set (dim, n_planes, n_tables,
    seed) is written as a one-row Spark JSON dataset under
    ``<path>/_lsh_meta`` so query time derives probe-compatible
    hyperplanes from the INDEX, not from caller-supplied defaults — a
    parameter mismatch would silently return low-recall garbage
    otherwise. The meta goes through Spark's filesystem layer (not
    local ``open()``), so the index works on HDFS/S3/any supported
    scheme; the leading underscore keeps it out of the parquet
    reader's file discovery. Returns the dimension."""
    if dim is None:
        dim = inferred_dim(embeddings, vec_col)
        if dim is None:
            # an index needs a dim; with zero non-NULL vectors there
            # is nothing to derive it from and nothing to store
            raise ValueError(
                "lsh_index_write: corpus has no non-NULL embeddings to "
                "infer the vector dim from; pass dim= explicitly"
            )
    tables = _lsh_tables(dim, n_planes, n_tables, seed)
    corpus = _lsh_bucketed_corpus(embeddings, tables, id_col, vec_col)
    corpus.write.mode("overwrite").partitionBy("table").parquet(path)
    spark = embeddings.sparkSession
    meta_df = spark.createDataFrame(
        [(int(dim), int(n_planes), int(n_tables), int(seed))],
        "dim int, n_planes int, n_tables int, seed int",
    )
    meta_df.coalesce(1).write.mode("overwrite").json(f"{path}/_lsh_meta")
    return dim


def lsh_topk_from_index(
    spark,
    index_path: str,
    embeddings: DataFrame,
    query_ids: list[int],
    dim: int | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a persisted index written by
    :func:`lsh_index_write`. The hash parameters (dim, n_planes,
    n_tables, seed) are read from the index's ``_lsh_meta`` dataset
    via Spark's filesystem layer (any scheme Spark supports) — the
    stored bucketing and the derived probe hyperplanes cannot drift
    apart. Results are identical to the in-memory path (test-pinned);
    only the probed (table, bucket) partitions of the index are
    touched."""
    meta = (
        spark.read.schema("dim int, n_planes int, n_tables int, seed int")
        .json(f"{index_path}/_lsh_meta")
        .first()
    )
    if meta is None or meta["dim"] is None:
        raise ValueError(
            f"no readable _lsh_meta dataset under {index_path!r} — not "
            f"an lsh_index_write index (or a half-written one); "
            f"rebuild the index"
        )
    if dim is not None and dim != meta["dim"]:
        raise ValueError(
            f"index at {index_path} was built for dim={meta['dim']}, "
            f"caller passed dim={dim}"
        )
    tables = _lsh_tables(
        meta["dim"], meta["n_planes"], meta["n_tables"], meta["seed"]
    )
    corpus = spark.read.parquet(index_path)
    return _lsh_probe_rank(
        corpus, embeddings, query_ids, tables, meta["n_planes"], k,
        id_col, vec_col,
    )


def _spherical_kmeans(
    sample: np.ndarray, n_centroids: int, n_iter: int = 10, seed: int = 42
) -> np.ndarray:
    """Tiny spherical k-means on a driver-side sample (centroids are
    metadata-scale: n_centroids × dim floats)."""
    rng = np.random.RandomState(seed)
    unit = _unit_rows(sample)
    centroids = unit[rng.choice(len(unit), size=n_centroids, replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(unit @ centroids.T, axis=1)
        for c in range(n_centroids):
            members = unit[assign == c]
            if len(members):
                mean = members.mean(axis=0)
                centroids[c] = mean / (np.linalg.norm(mean) or 1.0)
    return centroids


def cell_pudf(centroids: np.ndarray):
    """Nearest-centroid cell id per vector, one matrix multiply per
    Arrow batch."""

    @F.pandas_udf(LongType())
    def _cell(vecs: pd.Series) -> pd.Series:
        mat = _stack(vecs)
        unit = _unit_rows(mat)
        return pd.Series(np.argmax(unit @ centroids.T, axis=1).astype(np.int64))

    return _cell




def _kmeans_sample(embeddings, vec_col: str, id_col: str, sample_size: int, op: str):
    """Bounded driver-side k-means training sample, shared by
    :func:`ivf_topk` and :func:`semantic_dedup`. Deterministic but
    DECORRELATED order (xxhash64 of the id, id tiebreak): a plain
    ``orderBy(id)`` sample is the first ``sample_size`` ids, which in
    shard-ordered ingestion all come from one source — centroids
    then cover one region and the other cells collapse (r12 review
    find). A zero-row corpus raises a named error instead of
    np.stack's opaque ValueError."""
    sample_rows = (
        embeddings.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    if not sample_rows:
        raise ValueError(
            f"{op}: no non-null vectors to train on — the corpus is "
            f"empty after NULL filtering"
        )
    return np.stack([np.asarray(r[0], dtype=np.float64) for r in sample_rows])


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 6,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer
    scale path alongside :func:`lsh_topk`.

    Train: spherical k-means on a bounded driver-side sample (the
    only data that ever leaves executors, ``sample_size`` rows).
    Index: assign every corpus vector to its nearest centroid cell in
    one Arrow pass — at scale this is a one-off narrow projection,
    persisted as a cell-partitioned table. Search: each query probes
    its ``n_probe`` nearest cells with exact cosine re-rank, touching
    ~n_probe/n_centroids of the corpus. Brute force is the recall
    oracle.
    """
    embeddings = non_null_vecs(embeddings, vec_col)
    sample = _kmeans_sample(embeddings, vec_col, id_col, sample_size, "ivf_topk")
    centroids = _spherical_kmeans(sample, min(n_centroids, len(sample)), seed=seed)
    cell = cell_pudf(centroids)

    corpus = embeddings.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("cell", cell(F.col("n_vec")))

    # Per-query probe list: n_probe nearest centroids, computed on
    # the (tiny) collected query set.
    q_rows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    if not q_rows:
        raise ValueError("no query vectors found for the given ids")
    spark = embeddings.sparkSession
    probe_rows = []
    for row in q_rows:
        q_vec = np.asarray(row[1], dtype=np.float64)
        q_unit = q_vec / (np.linalg.norm(q_vec) or 1.0)
        order = np.argsort(-(centroids @ q_unit))[: min(n_probe, len(centroids))]
        for c in order:
            probe_rows.append((int(row[0]), list(map(float, row[1])), int(c)))
    # pandas → Arrow conversion stays JVM-side; a plain python list
    # would take the pickle-RDD path with defaultParallelism slices,
    # spawning a python worker per slice for 60 rows.
    queries = spark.createDataFrame(
        pd.DataFrame(probe_rows, columns=["q_id", "q_vec", "cell"]),
        "q_id long, q_vec array<double>, cell long",
    )

    scored = (
        F.broadcast(queries)
        .join(corpus, "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine_pudf(F.col("q_vec"), F.col("n_vec")).alias("cosine"),
        )
        .dropDuplicates(["q_id", "n_id"])
    )
    # Shuffle bound: the window input is the probed-cell candidate
    # frame — per query ~ n_probe/n_centroids of the corpus (6/16 at
    # the defaults, and n_centroids grows with corpus size at scale
    # so cells stay bounded) — NOT the full corpus. For
    # near-exhaustive probing swap this stage for the Arrow
    # local-top-k kernel unchanged.
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def embedding_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label corpus statistics (norms, dims) — sanity/monitoring
    aggregates over the vector column. (The old dead ``id_col``
    parameter is gone; the grouping column is parameterized like the
    file's other label-aware operators.)"""
    # NULL embeddings excluded (r12 review find): one NULL row made
    # avg_norm NaN for its whole label while n_vectors counted it but
    # min/max_dim skipped it — mutually inconsistent stats on exactly
    # the partially-failed corpora this monitor exists for. n_vectors
    # therefore counts NON-NULL vectors.
    return (
        non_null_vecs(embeddings, vec_col)
        .select(
            label_col,
            F.size(vec_col).alias("dim"),
            norm_pudf(F.col(vec_col)).alias("norm"),
        )
        .groupBy(label_col)
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
    n_planes: int | None = None,
    n_tables: int = 4,
    exact: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (M2 family).

    ``exact=True``: all-pairs (oracle, O(n²)). Default: multi-table
    LSH blocking (OR-construction) — a pair is a candidate if it
    shares a bucket in ANY of ``n_tables`` independent sign-hash
    tables; exact cosine filter after. ``n_planes=None`` scales the
    bucket count with the corpus — ceil(log2(n/32)) clamped to
    [6, 16] — keeping expected bucket occupancy (and therefore the
    per-bucket candidate join) roughly CONSTANT as the corpus grows;
    a fixed plane count would make candidates grow as n²/2^planes
    (the 5× scale probe showed exactly that super-linear blow-up
    before this adapted). Recall for cosine ≥ t is
    1−(1−q^p)^T with q = 1−acos(t)/π — more tables buy recall back
    when p grows; misses are quantified against the exact oracle in
    the recall test."""
    vecs = non_null_vecs(embeddings, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    if exact:
        a, b = vecs.alias("a"), vecs.alias("b")
        pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    else:
        import math

        if n_planes is None:
            n_corpus = vecs.count()
            n_planes = min(
                16, max(6, math.ceil(math.log2(max(2.0, n_corpus / 32))))
            )
        d = inferred_dim(vecs, "vec")
        if d is None:
            # zero non-NULL vectors: no candidate pairs exist
            return vecs.select(
                F.col("id").alias("id_a"),
                F.col("id").alias("id_b"),
                F.lit(0.0).alias("cosine"),
            ).limit(0)
        tables = _lsh_tables(d, n_planes, n_tables, seed)
        buckets = multitable_bucket_pudf(tables)
        banded = (
            vecs.withColumn("bks", buckets(F.col("vec")))
            .select(
                "id", "vec", F.posexplode("bks").alias("tbl", "bucket")
            )
        )
        a, b = banded.alias("a"), banded.alias("b")
        pairs = a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_pudf(F.col("a.vec"), F.col("b.vec")).alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cosine") >= threshold)
    )

def label_spectrum(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    top_k: int = 3,
) -> DataFrame:
    """Per-label covariance spectrum, two-phase so NO label ever
    materializes its member vectors in one worker (the bounded-group
    constraint the one-phase grouped-applyInPandas form carried):

    - Phase 1 (``mapInPandas``, no shuffle): every Arrow batch emits
      one partial-moment row per label it contains — (count, sum
      vector, sum outer-product) — dim + dim² doubles, independent of
      member count. Moments are associative, so any batch/partition
      assignment merges to the same covariance.
    - Phase 2 (grouped ``applyInPandas`` over the PARTIALS): per
      label, merge ≤ one tiny row per upstream batch, form
      ``cov = (M − s·sᵀ/n) / (n−1)`` (ddof=1, matching np.cov), and
      eigen-decompose the single dim×dim matrix. This is the
      legitimate applyInPandas case — eigen has no expression form —
      and its group size is O(partitions), not O(members), so a
      100 TB label with billions of members costs the same shuffle
      bytes as a 10-row one.
    """
    import numpy as np
    import pandas as pd

    # NULL embeddings excluded like every other vector kernel (r12
    # review find: an unguarded np.stack over a batch mixing NULL and
    # real vectors raised ValueError executor-side)
    embeddings = non_null_vecs(embeddings, vec_col)

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"label": [], "n": [], "s": [], "m": []}
            for label, grp in pdf.groupby(label_col, sort=False):
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in grp[vec_col]]
                )
                out["label"].append(label)
                out["n"].append(len(mat))
                out["s"].append(mat.sum(axis=0))
                out["m"].append((mat.T @ mat).ravel())
            yield pd.DataFrame(out)

    # the label field mirrors the CALLER's column type — hardcoding
    # int crashed the Arrow conversion for any non-int label column
    _ltype = embeddings.schema[label_col].dataType.simpleString()
    moment_rows = embeddings.select(label_col, vec_col).mapInPandas(
        partials,
        schema=f"label {_ltype}, n long, s array<double>, m array<double>",
    )

    def merge_spectrum(pdf: pd.DataFrame) -> pd.DataFrame:
        label = pdf["label"].iloc[0]
        n = int(pdf["n"].sum())
        if n < 2:
            return pd.DataFrame(
                {"label": [label], "n_vectors": [n],
                 "cov_trace": [0.0], "top_eigs": [[0.0] * top_k]}
            )
        s = np.sum(np.stack([np.asarray(v) for v in pdf["s"]]), axis=0)
        m = np.sum(np.stack([np.asarray(v) for v in pdf["m"]]), axis=0)
        dim = s.shape[0]
        cov = (m.reshape(dim, dim) - np.outer(s, s) / n) / (n - 1)
        eigs = np.sort(np.linalg.eigvalsh(cov))[::-1][:top_k]
        return pd.DataFrame(
            {
                "label": [label],
                "n_vectors": [n],
                "cov_trace": [round(float(np.trace(cov)), 6)],
                "top_eigs": [[round(float(e), 6) for e in eigs]],
            }
        )

    return moment_rows.groupBy("label").applyInPandas(
        merge_spectrum,
        schema=f"label {_ltype}, n_vectors long, cov_trace double, "
        "top_eigs array<double>",
    )


def label_silhouette(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-coherence audit: simplified silhouette of each vector
    against the per-label centroids (cosine distance), aggregated per
    label — the cluster-quality check run before trusting labels as
    training targets or SemDeDup cells.

    Per vector: ``a`` = cosine distance to its OWN label centroid,
    ``b`` = min distance to any OTHER label centroid, silhouette =
    ``(b - a) / max(a, b)`` (0 when both are 0). ``n_misassigned``
    counts vectors whose nearest centroid is a different label.

    Scale shape: the centroid pass is the posexplode → (label, dim)
    hash aggregate (k·dim result rows, map-side combined), folded
    into ONE broadcast row holding all k centroids; the score pass is
    then a per-row fold over that array — no shuffle of the vectors,
    no n×k intermediate, no pairwise blowup. All expression-level
    (zip_with/aggregate/array HOFs), no Python workers."""
    # unlabeled or vector-less rows can be neither cluster members
    # nor scored points — exclude before the centroid pass (a NULL
    # label would otherwise mint its own phantom cluster)
    embeddings = non_null_vecs(embeddings, vec_col).filter(
        F.col(label_col).isNotNull()
    )
    cents = (
        embeddings.select(
            label_col,
            F.posexplode(
                F.expr(f"transform({vec_col}, x -> cast(x AS double))")
            ).alias("dim", "v"),
        )
        .groupBy(label_col, "dim")
        .agg(F.avg("v").alias("cv"))
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
        .agg(
            F.collect_list(
                F.struct(F.col(label_col).alias("c_label"), "cvec")
            ).alias("cents")
        )
    )
    dvec = F.expr(f"transform({vec_col}, x -> cast(x AS double))")
    scored = embeddings.select(
        id_col, label_col, dvec.alias("dv")
    ).crossJoin(F.broadcast(cents))
    dists = F.transform(
        "cents",
        lambda c: F.struct(
            c["c_label"].alias("c_label"),
            (F.lit(1.0) - cosine_col(F.col("dv"), c["cvec"])).alias("d"),
        ),
    )
    own = F.col(label_col)
    per_vec = scored.select(
        id_col,
        label_col,
        F.array_min(
            F.transform(
                F.filter(dists, lambda c: c["c_label"] == own),
                lambda c: c["d"],
            )
        ).alias("a"),
        F.array_min(
            F.transform(
                F.filter(dists, lambda c: c["c_label"] != own),
                lambda c: c["d"],
            )
        ).alias("b"),
    )
    # single-label degenerate case: no other-label centroid exists,
    # array_min over the empty set is null — convention is
    # silhouette 0 for k=1 (and trivially 0 misassignments), which
    # b := a yields through the shared formula instead of nulling
    # every output column
    per_vec = per_vec.withColumn("b", F.coalesce("b", "a"))
    sil = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(0.0)
    return per_vec.groupBy(label_col).agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg(sil), 6).alias("mean_silhouette"),
        F.sum((F.col("b") < F.col("a")).cast("long")).alias("n_misassigned"),
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.6,
    n_centroids: int = 16,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    coarse clustering + within-cluster cosine pruning. Exact global
    near-dup clustering (:func:`cosine_near_dup_pairs` +
    connected components) compares every colliding pair; SemDeDup
    instead k-means-partitions the space and only compares WITHIN a
    cell — the candidate join becomes block-diagonal, cost
    sum(|cell|²) instead of n², and each cell's pair set is an
    independent task. The price is recall at cell borders (a pair
    split across cells is never compared) — acceptable for training-
    data curation where near-dups are dense and any one removal
    candidate having SOME detected partner is what matters.

    Train/assign shapes are shared with :func:`ivf_topk`: bounded
    driver-side k-means sample, one Arrow pass for cell assignment.
    At 100 TB the within-cell self-join keys on (cell), so each
    cell's work lands on one shuffle partition; n_centroids scales
    with corpus (cells of ~10-100k vectors keep the per-cell join
    quadratic-but-tiny).

    Returns every input row as (id, cell, cluster_id, keep): keep is
    False for docs pruned as semantic duplicates (deterministic
    min-id representative per within-cell component, via the same
    connected-components operator the text path uses).
    """
    from .dedup import connected_components

    embeddings = non_null_vecs(embeddings, vec_col)
    sample = _kmeans_sample(
        embeddings, vec_col, id_col, sample_size, "semantic_dedup"
    )
    centroids = _spherical_kmeans(
        sample, min(n_centroids, len(sample)), seed=seed
    )
    cell = cell_pudf(centroids)
    cells = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("cell", cell(F.col("vec")))

    a, b = cells.alias("a"), cells.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_pudf(F.col("a.vec"), F.col("b.vec")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(edges)
    return (
        cells.select("id", "cell")
        .join(comp.withColumnRenamed("doc_id", "id"), "id", "left")
        .select(
            "id",
            "cell",
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
            (
                F.coalesce("cluster_id", F.col("id")) == F.col("id")
            ).alias("keep"),
        )
    )


def labeled_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    same_label: bool,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-constrained exact top-k — the shared two-stage shape
    behind hard-negative mining (``same_label=False``: closest
    impostors) and positive mining (``same_label=True``: closest
    same-class neighbors).

    Two-stage plan (r06, replacing the broadcast cross join + window
    over the N·Q scored frame — the same scale defect as the old
    rp/sq shortlists): stage 1 is the :func:`local_topk_scored`
    Arrow kernel with label masking, which reduces the corpus to
    ``partitions × queries × k'`` candidates in one scan; stage 2
    re-scores ONLY those candidates with the JVM
    ``zip_with``/``aggregate`` cosine rounded to 6 decimals
    (bit-matching the SQL oracle's DOUBLE[] math) and takes the
    global top-k with one window over the already-tiny frame. The
    local margin ``k' = max(k, 10)`` absorbs candidates whose
    unrounded numpy score and rounded JVM score would rank either
    side of the cut."""
    local_k = max(k, 10)
    candidates = local_topk_scored(
        embeddings, query_ids, local_k, id_col, vec_col,
        label_col=label_col, same_label=same_label,
    ).select("q_id", "n_id")
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = embeddings.select(F.col(id_col).alias("n_id"), dvec.alias("n_vec"))
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), dvec.alias("q_vec")
    )
    scored = (
        # candidate frame is O(partitions·|Q|·k') — broadcast it into
        # the second (narrow) corpus scan rather than shuffling the
        # corpus by n_id.
        base.join(F.broadcast(candidates), ["n_id"])
        .join(F.broadcast(q), ["q_id"])
        .select(
            "q_id",
            "n_id",
            F.round(cosine_col(F.col("q_vec"), F.col("n_vec")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def hard_negative_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the
    top-k most cosine-similar corpus vectors with a DIFFERENT label
    — the "closest impostors" used to build contrastive/triplet
    training pairs and to audit label quality (a too-similar
    cross-label neighbor is often a mislabel). See
    :func:`labeled_topk` for the two-stage scale plan."""
    return labeled_topk(
        embeddings, query_ids, k, same_label=False,
        id_col=id_col, vec_col=vec_col, label_col=label_col,
    )


def triplet_mining(
    embeddings: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Triplet export for contrastive training: per anchor, its
    hardest POSITIVE (nearest same-label neighbor) and hardest
    NEGATIVE (nearest different-label neighbor) plus the margin
    ``cos(anchor, pos) − cos(anchor, neg)`` — the rows a triplet-
    loss trainer consumes directly, and a label-quality audit (a
    negative margin means an impostor sits closer than any
    same-class neighbor). An anchor that is its label's ONLY member
    has no positive and is dropped by the inner join — a triplet
    without a positive is untrainable, so absence IS the contract
    (pytest-pinned). Two :func:`labeled_topk` passes (each one
    Arrow corpus scan reduced to |Q| rows) joined on the anchor;
    both cosines carry the 6-decimal JVM rounding, so the margin is
    a difference of engine-identical doubles."""
    pos = labeled_topk(
        embeddings, query_ids, k=1, same_label=True,
        id_col=id_col, vec_col=vec_col, label_col=label_col,
    ).select(
        "q_id",
        F.col("n_id").alias("pos_id"),
        F.col("cosine").alias("pos_cosine"),
    )
    neg = labeled_topk(
        embeddings, query_ids, k=1, same_label=False,
        id_col=id_col, vec_col=vec_col, label_col=label_col,
    ).select(
        "q_id",
        F.col("n_id").alias("neg_id"),
        F.col("cosine").alias("neg_cosine"),
    )
    return pos.join(neg, "q_id").select(
        F.col("q_id").alias("anchor_id"),
        "pos_id",
        "neg_id",
        "pos_cosine",
        "neg_cosine",
        F.round(F.col("pos_cosine") - F.col("neg_cosine"), 6).alias(
            "margin"
        ),
    )


_SCORED_INT_SCHEMA = StructType(
    [
        StructField("q_id", LongType(), False),
        StructField("n_id", LongType(), False),
        StructField("dot", LongType(), True),
        StructField("na", LongType(), True),
        StructField("nb", LongType(), True),
    ]
)


def local_topk_exact_int(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-integer sibling of :func:`local_topk_scored` for INTEGER
    count vectors (hashed bag-of-words): the scan-and-reduce shape is
    identical — broadcast queries, one mapInPandas matmul pass,
    partition-local top-k — but the score and its total order are
    bit-reproducible across engines: dot products and squared norms
    of int64 counts are exact in float64 (values < 2^53), the ranking
    key dot²/(na·nb) is one correctly-rounded double division, and
    ties break on n_id INSIDE the kernel (lexsort), so the
    partition-local top-k under this total order composes into the
    same global top-k any reference engine computes — ties included —
    because selection under a total order distributes over
    partitions. (The float kernel can't promise that: per-component
    normalization noise makes boundary ties engine-specific.)

    Returns the reduced (q_id, n_id, dot, na, nb) frame —
    partitions × queries × k rows; callers apply the bounded global
    rank with the SAME (dot²/(na·nb) DESC, n_id) order."""
    embeddings = non_null_vecs(embeddings, vec_col)
    q_rows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    if not q_rows:
        raise ValueError("no query vectors found for the given ids")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r[1], dtype=np.int64) for r in q_rows])
    return local_topk_exact_int_mat(
        embeddings, q_ids, q_mat, k, id_col=id_col, vec_col=vec_col
    )


def local_topk_exact_int_mat(
    embeddings: DataFrame,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`local_topk_exact_int` with the query matrix supplied
    directly (int64 ids + int64 vectors) instead of looked up by id —
    the entry point for EXTERNAL queries (e.g. hash-embedded query
    strings, operators/search.py) that are not corpus rows. Callers
    whose queries are not corpus members should pass ids disjoint
    from the corpus id space (negative ids work) so the kernel's
    self-match exclusion (``ids != qid``) never drops a real
    neighbor. Same determinism contract as the by-id wrapper."""
    q_ids = np.asarray(q_ids, dtype=np.int64)
    q_mat = np.asarray(q_mat, dtype=np.int64)
    q_norms = (q_mat * q_mat).sum(axis=1)
    bc = embeddings.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, q_norms)
    )

    def score(batches):
        bq_ids, bq_mat, bq_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(
                [np.asarray(v, dtype=np.int64) for v in pdf[vec_col]]
            )
            na = (mat * mat).sum(axis=1)
            dots = mat @ bq_mat.T  # (batch, queries), exact int64
            for j, qid in enumerate(bq_ids):
                d = dots[:, j].astype(np.float64)
                skey = (d * d) / (
                    na.astype(np.float64) * float(bq_norms[j])
                )
                keep = np.nonzero(ids != qid)[0]
                if keep.size == 0:
                    continue
                # total order: skey DESC, n_id ASC (lexsort is stable,
                # last key is primary)
                order = keep[np.lexsort((ids[keep], -skey[keep]))]
                top = order[: min(k, order.size)]
                yield pd.DataFrame(
                    {
                        "q_id": qid,
                        "n_id": ids[top],
                        "dot": dots[top, j],
                        "na": na[top],
                        "nb": bq_norms[j],
                    }
                )

    return embeddings.select(id_col, vec_col).mapInPandas(
        score, _SCORED_INT_SCHEMA
    )


def label_centroid_eval(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid classifier evaluation — the eval harness for
    an embedding column: per-label centroids (one grouped mean),
    every vector scored against every centroid (|labels| is a
    handful — the cross join broadcasts k rows), prediction = argmax
    of the ROUNDED cosine (6 dp, ties on the label id — rounding
    before ranking is what makes the prediction, and therefore the
    whole confusion matrix, engine-reproducible; the raw means differ
    across engines by float sum order), then per-label
    precision/recall/F1 from the confusion counts (exact integer
    ratios, rounded for display).

    Plan: one grouped aggregate over the corpus (centroids), one
    broadcast cross join + expression cosine + per-vector rank, two
    shrinking confusion aggregates. Linear, expression-only."""
    # unlabeled or vector-less rows can be neither trained on (the
    # centroid means) nor evaluated (no prediction) — exclude first
    embeddings = non_null_vecs(embeddings, vec_col).filter(
        F.col(label_col).isNotNull()
    )
    dim = inferred_dim(embeddings, vec_col)
    if dim is None:
        # no labeled non-NULL vectors: an empty confusion matrix
        return embeddings.select(
            F.col(label_col).alias("label"),
            F.lit(0).cast("bigint").alias("n_true"),
            F.lit(0).cast("bigint").alias("n_pred"),
            F.lit(0).cast("bigint").alias("tp"),
            F.lit(0.0).alias("precision"),
            F.lit(0.0).alias("recall"),
            F.lit(0.0).alias("f1"),
        ).limit(0)
    cents = embeddings.groupBy(F.col(label_col).alias("_cl")).agg(
        F.array(
            *[F.avg(F.col(vec_col)[i].cast("double")) for i in range(dim)]
        ).alias("_cvec")
    )
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(F.col("_dv"), F.col("_cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(c, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        embeddings.select(
            id_col, F.col(label_col).alias("_true"), dvec.alias("_dv")
        )
        .crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "_true",
            "_cl",
            # try_divide: an all-zero vector or an all-zero centroid
            # (empty-text corpus) has no direction — NULL score, not
            # an ANSI DIVIDE_BY_ZERO crash; NULL sorts last under
            # the desc() rank so the _cl tie-break still yields one
            # deterministic prediction per vector
            F.round(
                F.try_divide(
                    dot, nrm(F.col("_dv")) * nrm(F.col("_cvec"))
                ),
                6,
            ).alias("_s"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_s").desc(), F.col("_cl").asc()
    )
    pred = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(id_col, "_true", F.col("_cl").alias("_pred"))
    )
    # Collapse the prediction stream ONCE into the |labels|²-bounded
    # confusion matrix and derive both marginals from it (r14
    # optimization round, guide §2.4): by_true and by_pred each
    # referenced ``pred``, so the scoring cross join + per-vector
    # window ran TWICE per evaluation. The checkpoint pins k² rows
    # of exact integer counts — metadata-scale at any corpus size —
    # and the marginals are plain integer sums over it, so every
    # downstream count is bit-identical. LAZY: a single unchained
    # checkpoint materializing inside the caller's own action is the
    # pattern the driver verified neutral-or-better (mmr/prf/bloom);
    # eager was measured to re-pay the scoring job per bench pass.
    confusion = (
        pred.groupBy("_true", "_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
        .localCheckpoint(eager=False)
    )
    by_true = confusion.groupBy(F.col("_true").alias("label")).agg(
        F.sum("_n").cast("bigint").alias("n_true"),
        F.sum(
            F.when(F.col("_pred") == F.col("_true"), F.col("_n")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("tp"),
    )
    by_pred = confusion.groupBy(F.col("_pred").alias("label")).agg(
        F.sum("_n").cast("bigint").alias("n_pred")
    )
    # guarded ratios: an unpredicted (or absent) label must yield 0,
    # not a 0/0 — and the guards keep the plan ANSI-safe
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_true") > 0, F.col("tp") / F.col("n_true")
    ).otherwise(F.lit(0.0))
    return (
        by_true.join(by_pred, "label", "full_outer")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0).cast("bigint")).alias("n_true"),
            F.coalesce("n_pred", F.lit(0).cast("bigint")).alias("n_pred"),
            F.coalesce("tp", F.lit(0).cast("bigint")).alias("tp"),
        )
        .select(
            "label",
            "n_true",
            "n_pred",
            "tp",
            F.round(prec, 4).alias("precision"),
            F.round(rec, 4).alias("recall"),
            F.round(
                F.when(
                    (prec + rec) > 0,
                    F.lit(2.0) * prec * rec / (prec + rec),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("f1"),
        )
    )
