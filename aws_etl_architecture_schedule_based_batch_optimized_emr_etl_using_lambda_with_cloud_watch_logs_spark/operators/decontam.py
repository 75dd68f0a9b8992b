"""Benchmark decontamination (LLM-data-pipeline extension, charter
§training-data ops; no counterpart in the reference).

Training corpora must not contain evaluation data: the standard
check flags any corpus document sharing at least ``min_overlap``
word n-grams with a benchmark/eval set (GPT-3 used 13-gram overlap;
the n is a parameter because short-document corpora need smaller n).

Shape: explode both sides into distinct n-gram shingles, equi-join
on the shingle, count distinct hits per corpus document — linear
scan + one hash join keyed on shingles. No O(corpus × benchmark)
pair blowup: the join output is bounded by true overlap. At 100 TB,
``hashed=True`` joins on ``xxhash64(shingle)`` instead of the
shingle string, shrinking shuffle rows to 8-byte keys (collision
odds ~n²/2⁶⁴ — negligible; the exact-string mode exists for oracle
parity and forensics). The benchmark side is usually small enough to
broadcast, which Catalyst/AQE does automatically under the
threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col, tokens_col


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Per corpus document: the number of distinct word n-grams it
    shares with the benchmark set, and a ``contaminated`` flag at
    ``min_overlap``. Every corpus row is returned (zero-overlap docs
    included) so the output can drive a filter or a report."""
    def shingle_rows(df: DataFrame, *extra: str) -> DataFrame:
        # explode must be a top-level generator; hash in a second
        # projection (Catalyst collapses both into one stage).
        out = df.select(
            *extra,
            F.explode(shingles_col(tokens_col(text_col), n)).alias("shingle"),
        )
        if hashed:
            out = out.select(*extra, F.xxhash64("shingle").alias("shingle"))
        return out

    c_sh = shingle_rows(corpus, id_col)
    b_sh = shingle_rows(benchmark).distinct()
    hits = (
        c_sh.join(b_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_overlap"))
    )
    n_over = F.coalesce("n_overlap", F.lit(0))
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            n_over.cast("bigint").alias("n_overlap"),
            (n_over >= min_overlap).alias("contaminated"),
        )
    )


def fuzzy_decontam(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    max_bucket_members: int | None = 1024,
) -> DataFrame:
    """FUZZY benchmark decontamination: corpus documents that are
    NEAR-duplicates of an eval document (MinHash/LSH + exact Jaccard
    verify), catching the paraphrased/reformatted leaks the exact
    n-gram overlap pass (:func:`ngram_overlap`) misses — the
    two-stage policy FineWeb/Dolma-style pipelines run.

    Implementation is pure reuse: union the two sides, run the
    standard banded near-dup pipeline (one Arrow signature pass,
    uniform-key bucket join, verify only candidates, giant-bucket
    guard intact), then keep cross-side pairs oriented as
    ``(doc_id, bench_id, jaccard)``. Ids must be distinct across the
    two frames (remap one side if not — same contract as the union).
    At 100 TB the benchmark side is tiny; its signatures could also
    be persisted once and probed per batch via the incremental band
    store, unchanged."""
    from .dedup import minhash_lsh_dedup

    tagged = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).unionByName(
        benchmark.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    )
    pairs = minhash_lsh_dedup(
        tagged,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_bucket_members=max_bucket_members,
    )
    bench_ids = benchmark.select(F.col(id_col).alias("_bid"))
    # classify sides; keep exactly-one-side-benchmark pairs, oriented
    a_is_b = pairs.join(
        F.broadcast(bench_ids), pairs.id_a == F.col("_bid"), "left"
    ).select(
        "id_a", "id_b", "jaccard", F.col("_bid").isNotNull().alias("_a_b")
    )
    both = a_is_b.join(
        F.broadcast(bench_ids), a_is_b.id_b == F.col("_bid"), "left"
    ).select(
        "id_a", "id_b", "jaccard", "_a_b", F.col("_bid").isNotNull().alias("_b_b")
    )
    return (
        both.filter(F.col("_a_b") != F.col("_b_b"))
        .select(
            F.when(F.col("_a_b"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("doc_id"),
            F.when(F.col("_a_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("bench_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
