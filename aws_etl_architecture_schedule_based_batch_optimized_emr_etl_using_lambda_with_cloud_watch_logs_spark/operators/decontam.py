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
        # The '' shingle (empty doc → [''] tokens → whole-text
        # fallback gram) is excluded: one blank row in the eval set
        # would otherwise flag every blank corpus doc contaminated —
        # a match on literally nothing.
        out = df.select(
            *extra,
            F.explode(shingles_col(tokens_col(text_col), n)).alias("shingle"),
        ).filter(F.col("shingle") != "")
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

    Implementation reuses the banded near-dup pieces (one Arrow
    signature pass, uniform-key bucket join, giant-bucket guard
    intact) but classifies candidate pairs by side BEFORE the exact
    Jaccard verify: within-corpus near-duplicates vastly outnumber
    corpus↔benchmark pairs on a real web corpus (that is why dedup
    exists), and each one would otherwise pay the Arrow verify and
    the text join-back shuffle only to be discarded by the
    cross-side filter. Only cross-side candidates reach the verify —
    same results, verify volume bounded by the benchmark's LSH
    neighborhood. Ids must be distinct across the two frames (remap
    one side if not — same contract as the union). At 100 TB the
    benchmark side is tiny; its signatures could also be persisted
    once and probed per batch via the incremental band store,
    unchanged."""
    from .dedup import (
        bucket_pairs,
        jaccard_texts_pudf,
        minhash_bands,
    )

    tagged = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).unionByName(
        benchmark.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    )
    banded = minhash_bands(
        tagged, id_col="doc_id", text_col="text", n=n,
        num_hashes=num_hashes, bands=bands,
    )
    candidates = bucket_pairs(
        banded, ["band", "band_hash"], "doc_id",
        max_bucket_members=max_bucket_members,
    )
    bench_ids = benchmark.select(F.col(id_col).alias("_bid"))
    # classify sides; keep exactly-one-side-benchmark pairs, oriented
    a_is_b = candidates.join(
        F.broadcast(bench_ids), candidates.id_a == F.col("_bid"), "left"
    ).select("id_a", "id_b", F.col("_bid").isNotNull().alias("_a_b"))
    both = a_is_b.join(
        F.broadcast(bench_ids), a_is_b.id_b == F.col("_bid"), "left"
    ).select(
        "id_a", "id_b", "_a_b", F.col("_bid").isNotNull().alias("_b_b")
    )
    cross = both.filter(F.col("_a_b") != F.col("_b_b")).select(
        F.when(F.col("_a_b"), F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("doc_id"),
        F.when(F.col("_a_b"), F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("bench_id"),
    )
    # exact verify ONLY on the oriented cross-side candidates
    t_c = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_tc")
    )
    t_b = benchmark.select(
        F.col(id_col).alias("bench_id"), F.col(text_col).alias("_tb")
    )
    jacc = jaccard_texts_pudf(n)
    return (
        cross.join(t_c, "doc_id")
        .join(F.broadcast(t_b), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            jacc(F.col("_tc"), F.col("_tb")).alias("_j"),
        )
        # threshold on the UNROUNDED value (matching the previous
        # minhash_lsh_dedup-internal filter), round only for output
        .filter(F.col("_j") >= threshold)
        .select(
            "doc_id", "bench_id", F.round("_j", 6).alias("jaccard")
        )
    )
