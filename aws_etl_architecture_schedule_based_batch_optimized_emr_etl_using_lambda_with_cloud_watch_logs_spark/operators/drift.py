"""Corpus drift monitoring — LLM-data-pipeline extension. A
pipeline that ingests batches continuously needs to know when the
incoming text distribution shifts (new domain mix, scraper
breakage, spam flood) BEFORE the batch is folded into training
data. The standard cheap detector is a divergence between token
distributions of a reference slice and the new slice, with the
top-contributing tokens as the human-readable diagnosis.

Per token t with add-1-smoothed unigram probabilities
p(t) (reference) and q(t) (incoming) over the union vocabulary:

    contrib(t) = (p(t) − q(t)) · ln(p(t)/q(t))      (≥ 0 always)
    J(p, q)    = Σ_t contrib(t)    (Jeffreys divergence,
                                    symmetrized KL)

Every input to a contribution is an exact integer (two counts, two
totals, vocabulary size), so both engines compute identical doubles;
contributions are quantized to 1e-12 integers, making ranking and
sums bit-reproducible. Everything is two map-side-combined token
counts (reference-side count frames can be persisted and reused
across batches — they merge by addition) plus one vocabulary-sized
outer join: at 100 TB the join is vocab-sized (≪ corpus), and the
corpus is scanned once per slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

_QC = 1_000_000_000_000.0  # contribution quantum (1e-12)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n) unigram counts — one explode + hash aggregate.
    Persist the reference side once; later batches only count
    themselves (counts merge by addition)."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def token_divergence(
    ref: DataFrame,
    new: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k drift-driving tokens between two corpus slices:
    ``(token, n_ref, n_new, contrib)`` ordered by contribution
    (quantized Jeffreys terms — nonnegative, exact cross-engine),
    tie-broken by token. Σ contrib over the FULL vocabulary is the
    Jeffreys divergence; the top-k rows are the diagnosis."""
    a = token_counts(ref, text_col).withColumnRenamed("n", "n_ref")
    b = token_counts(new, text_col).withColumnRenamed("n", "n_new")
    # Persisted: the joined count frame is vocabulary-sized and has
    # two consumers (the totals aggregate and the contribution
    # select) — without it each consumer replays both corpus scans.
    # Lifecycle is caller-owned (consumed lazily through the
    # returned plan): vocabulary-bounded, LRU-evictable blocks;
    # clearCache() between jobs reclaims them in long sessions.
    j = (
        a.join(b, ["token"], "outer")
        .select(
            "token",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .persist()
    )
    totals = j.agg(
        F.sum("n_ref").alias("tot_ref"),
        F.sum("n_new").alias("tot_new"),
        F.count(F.lit(1)).alias("vocab"),
    )
    p = (F.col("n_ref") + F.lit(1.0)) / (F.col("tot_ref") + F.col("vocab"))
    q = (F.col("n_new") + F.lit(1.0)) / (F.col("tot_new") + F.col("vocab"))
    contrib = F.round((p - q) * F.log(p / q) * F.lit(_QC)).cast("bigint")
    return (
        j.crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_new").cast("bigint").alias("n_new"),
            contrib.alias("contrib"),
        )
        .orderBy(F.desc("contrib"), "token")
        .limit(top_k)
    )
