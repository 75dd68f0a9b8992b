"""Substring-level (span) deduplication signals (LLM-data-pipeline
extension, charter §training-data ops; no counterpart in the
reference — the reference's dedup surface is row-level
``dropDuplicates``, SURVEY §2.D).

Row-level dedup misses the dominant duplication mode in web corpora:
long token runs (boilerplate, licenses, quoted replies) repeated
inside otherwise-distinct documents. The standard remedy (Lee et
al. 2022, "Deduplicating Training Data Makes Language Models
Better") removes every substring of >= W tokens that occurs more
than once in the corpus. Their implementation is a single-node
suffix array; that shape does not distribute. The Spark-native
equivalent below finds the same spans with linear scans:

1. every W-token window of every doc becomes a (gram, doc, pos)
   site — one ``posexplode``, |sites| = total corpus tokens;
2. a gram is *duplicated* when it occurs at >= ``min_sites`` sites
   corpus-wide (same doc or not — a doc repeating its own phrase
   counts, exactly as a suffix array would see it): one map-side-
   combined hash aggregate keyed on the gram, then an equi-join
   back to sites (same key, so AQE reuses the exchange);
3. per doc, duplicated window positions merge into maximal spans
   wherever consecutive positions gap by <= W (overlapping or
   back-to-back windows -> one span): one per-doc window function.

Any duplicated run of >= W tokens has every one of its W-windows
duplicated, so the merged spans cover every duplicated run of
>= W tokens end-to-end (each merged span is a contiguous union of
duplicated windows — every token in it sits inside at least one
duplicated window, so removing spans never removes a token a
suffix array would keep at the same W). Three linear shuffles
total: gram-agg, join-back, per-doc window.
At 100 TB pass ``hashed=True``: sites shuffle 8-byte xxhash64 keys
instead of W-word strings (collision odds ~sites²/2⁶⁴ only ever
merge two spans, never drop one — conservative in the direction
dedup wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ngrams_col, tokens_col


def window_sites(
    df: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Every W-token window of every document as one
    ``(id_col, pos, gram)`` row (pos is the 0-based token offset of
    the window start). Docs shorter than W tokens contribute no
    sites — a span of >= W tokens cannot fit in them."""
    toks = tokens_col(text_col)
    grams = F.when(
        F.size(toks) >= w, ngrams_col(toks, w)
    ).otherwise(F.array().cast("array<string>"))
    out = df.select(
        F.col(id_col),
        F.posexplode(grams).alias("pos", "gram"),
    )
    if hashed:
        out = out.select(id_col, "pos", F.xxhash64("gram").alias("gram"))
    return out


def duplicate_spans(
    df: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sites: int = 2,
    hashed: bool = False,
) -> DataFrame:
    """Per document: the maximal duplicated spans of >= ``w`` tokens
    (each row one span, with token offsets), for surgical span
    removal. ``start``/``end_`` are 0-based token offsets of the
    first/last window; the span covers ``end_ - start + w`` tokens."""
    sites = window_sites(df, w, id_col, text_col, hashed)
    dup_grams = (
        sites.groupBy("gram")
        .agg(F.count("*").alias("n_sites"))
        .filter(F.col("n_sites") >= min_sites)
        .select("gram")
    )
    dup_sites = sites.join(dup_grams, "gram").select(id_col, "pos")
    order = Window.partitionBy(id_col).orderBy("pos")
    brk = (
        (F.col("pos") - F.lag("pos").over(order) > w).cast("int")
    )
    return (
        dup_sites.withColumn("_brk", F.coalesce(brk, F.lit(0)))
        .withColumn("island", F.sum("_brk").over(order))
        .groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("start"),
            F.max("pos").alias("end_"),
        )
        .select(
            id_col,
            "start",
            "end_",
            (F.col("end_") - F.col("start") + w).alias("span_tokens"),
        )
    )


def span_dedup_stats(
    df: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sites: int = 2,
    hashed: bool = False,
) -> DataFrame:
    """Per document (every doc, zero-dup docs included): number of
    maximal duplicated spans, tokens they cover, and the duplicated
    fraction — the corpus-health report that decides whether span
    removal is worth a rewrite pass."""
    spans = duplicate_spans(df, w, id_col, text_col, min_sites, hashed)
    agg = spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    return (
        df.select(
            id_col, F.size(tokens_col(text_col)).alias("n_tokens")
        )
        .join(agg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sites: int = 2,
    hashed: bool = False,
) -> DataFrame:
    """The REWRITE pass :func:`span_dedup_stats` decides on: emit
    each document with its duplicated spans surgically removed
    (every occurrence — the aggressive form; Lee et al.'s
    keep-one-copy variant needs a global canonical-site election,
    a deliberate non-goal here since boilerplate/license runs are
    noise in every copy).

    Plan: the span frame (per-doc, token offsets) aggregates to one
    array per doc — bounded by spans-per-doc, not tokens — and a
    single JVM ``filter(transform(tokens, index))`` drops covered
    positions; no extra shuffle beyond duplicate_spans' three. The
    coverage test is O(tokens × spans-per-doc) per doc,
    whole-stage-codegen'd."""
    spans = (
        duplicate_spans(df, w, id_col, text_col, min_sites, hashed)
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("start", "end_")).alias("_spans"))
    )
    # Reconstruction tokens keep the ORIGINAL case: tokens_col
    # lowercases (correct for the span-match keys inside
    # duplicate_spans), but rebuilding cleaned_text from lowered
    # tokens would case-fold every rewritten document corpus-wide.
    # A case-preserving split on the same \\s+ separators yields
    # identical token positions, so the span offsets line up.
    # (Inter-token whitespace is still normalized to single spaces —
    # inherent to token-level surgery and documented here.)
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    ).join(spans, id_col, "left")
    sp = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<start:long,end_:long>>"),
    )
    indexed = F.expr("transform(_t, (t, i) -> struct(t AS t, i AS i))")
    kept = F.filter(
        indexed,
        lambda x: ~F.exists(
            sp,
            lambda s: (x["i"] >= s["start"])
            & (x["i"] <= s["end_"] + F.lit(w - 1)),
        ),
    )
    return toks.select(
        id_col,
        F.size("_t").cast("bigint").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.array_join(
            F.transform(kept, lambda x: x["t"]), " "
        ).alias("cleaned_text"),
    )
