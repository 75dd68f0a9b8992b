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
