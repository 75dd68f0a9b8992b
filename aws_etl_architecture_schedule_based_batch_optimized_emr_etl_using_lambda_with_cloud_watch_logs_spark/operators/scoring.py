"""Model-based quality scoring (fasttext-style linear classifier
over hashed bag-of-words features) — LLM-data-pipeline extension.
The heuristic features in operators/text.py rank documents by
surface statistics; production curation pipelines (CCNet, FineWeb-
Edu) instead score every document with a trained linear classifier.
This operator is that scoring pass, Spark-native:

    score(doc) = sigmoid( bias + mean_t weight[h(token_t) mod D] )

* The model is DATA, not code: a ``(bucket, weight)`` DataFrame —
  a few MB for D ~ 1-4M buckets — broadcast to every executor.
  Swapping in a real trained model is a parquet read.
* Feature hashing is ``md5``-based (first 8 hex chars → bigint):
  deterministic, engine-portable (any SQL engine reproduces the
  bucketing bit-for-bit — unlike xxhash64, which only Spark has),
  and JVM-evaluated here: the entire scoring plan is one explode +
  one broadcast join + one map-side-combined aggregate. No Python
  in the hot path.
* The per-doc mean is computed as exact-integer SUM/COUNT where the
  weights are integer-quantized (the gate's synthetic model), so
  the score is bit-reproducible regardless of row order or
  partitioning — floats only enter at the final division.

At 100 TB: scoring is embarrassingly parallel (no shuffle until the
per-doc aggregate, which is keyed on the same doc id the corpus is
usually already partitioned by), and the downstream ``keep`` filter
composes with the mixing/dedup passes in the same Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col
from .mixing import hash32_expr

_MOD = 2**32


def feature_bucket(token: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: first 32 bits of md5(token),
    folded to [0, n_buckets)."""
    return F.pmod(
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def synthetic_weights(
    spark, n_buckets: int = 4096
) -> DataFrame:
    """A deterministic stand-in model: weight_q[b] = hash32(b), an
    integer in [0, 2^32) interpreted as (weight_q/2^32 - 0.5) ∈
    [-0.5, 0.5). Same shape and join contract as a real exported
    model; any engine can rebuild it from a range scan."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        hash32_expr(F.col("id")).alias("weight_q"),
    )


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 4096,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document classifier score + keep flag. ``weights`` must
    have (bucket, weight_q) with integer-quantized weights; the doc
    score is sigmoid(sum(weight_q)/(n·2^32) - 0.5) — the mean of the
    dequantized weights, computed with an exact integer numerator.

    Sparse-model safe: real fasttext/linear exports store only
    NONZERO buckets, so the weight join is a LEFT join (a missing
    bucket contributes weight 0 but still counts in the mean's
    denominator) and every input doc gets an output row — a doc with
    no tokens at all (NULL text) scores NULL with keep=false rather
    than silently bypassing the quality gate."""
    toks = docs.select(
        id_col, F.explode(tokens_col(text_col)).alias("term")
    ).select(
        id_col, feature_bucket(F.col("term"), n_buckets).alias("bucket")
    )
    raw = (
        toks.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight_q"), F.lit(0))).alias("_s"),
            F.count("*").alias("_n"),
        )
        .select(
            id_col,
            (
                F.col("_s") / (F.col("_n") * F.lit(float(_MOD)))
                - F.lit(0.5)
            ).alias("_raw"),
        )
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_raw")))
    return (
        docs.select(id_col)
        .join(
            raw.select(
                id_col,
                F.round(score, 6).alias("score"),
                (score >= threshold).alias("keep"),
            ),
            [id_col],
            "left",
        )
        .select(
            id_col,
            "score",
            F.coalesce(F.col("keep"), F.lit(False)).alias("keep"),
        )
    )


def percentile_filter_by_group(
    scored: DataFrame,
    group_col: str = "source",
    score_col: str = "score",
    keep_frac: float = 0.25,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group percentile curation: keep the top ``keep_frac`` of
    documents WITHIN each group (source/domain/language), ties at
    the cutoff included — the normalization CCNet applies per
    language and FineWeb-style pipelines apply per dump, so one
    well-behaved source cannot crowd out the rest of the mix under
    a single global threshold.

    Scale plan (no per-doc window): a naive
    ``percent_rank() OVER (PARTITION BY group)`` sorts every
    document of a group in one task — per-task O(n_group) at 100 TB
    for the big sources. Instead the score is integer-quantized
    (scores are produced 6-decimal-rounded, so ×1e6 is exact) and
    the cutoff comes from the per-(group, qscore) HISTOGRAM: the
    running-count window touches one row per DISTINCT quantized
    score per group (≤1e6-ish, independent of corpus size), the
    O(groups) cutoff frame broadcasts back, and the keep flag is a
    map-side comparison. Same order-statistic-on-quantized-integers
    method as lm.perplexity_buckets — exact, engine-identical.

    Cutoff definition: the highest qscore at which the descending
    cumulative count first reaches ceil(keep_frac · n_group); kept =
    qscore ≥ cutoff (so ties at the boundary all survive —
    deterministic regardless of partitioning).
    """
    from pyspark.sql import Window

    if not 0.0 < keep_frac <= 1.0:
        # 0 would keep the top tie-group of every group (ceil(0)=0
        # passes every cumulative row, cutoff = max qscore) and
        # >1 makes the cutoff filter unsatisfiable, silently
        # dropping whole groups from the output — fail fast
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")

    qs = F.round(F.col(score_col) * 1e6).cast("bigint")
    with_q = scored.select(
        id_col, group_col, score_col, qs.alias("_qs")
    )
    hist = with_q.groupBy(group_col, "_qs").agg(
        F.count(F.lit(1)).alias("_c")
    )
    # one row per distinct quantized score per group — bounded
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("_qs"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    totals = hist.groupBy(group_col).agg(F.sum("_c").alias("_n"))
    cutoffs = (
        cum.join(totals, group_col)
        .filter(F.col("_cum") >= F.ceil(F.lit(keep_frac) * F.col("_n")))
        .groupBy(group_col)
        .agg(F.max("_qs").alias("_cutoff"))
    )
    return (
        with_q.join(F.broadcast(cutoffs), group_col)
        .select(
            id_col,
            group_col,
            score_col,
            (F.col("_qs") >= F.col("_cutoff")).alias("keep"),
        )
    )
