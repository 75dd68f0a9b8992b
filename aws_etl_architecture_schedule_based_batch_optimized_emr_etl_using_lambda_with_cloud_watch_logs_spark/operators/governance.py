"""Data-governance removals (right-to-be-forgotten / opt-out) —
LLM-data-pipeline extension. A takedown request names document ids,
but the obligation attaches to the CONTENT: every copy of the text
(exact dups, re-crawls under new ids, copies in other sources) must
leave the corpus, and the pipeline must be able to prove it did —
and keep honoring the request when the next crawl re-ingests the
same text.

Three pieces:

* :func:`content_fingerprint` — the normalized-content key
  (md5 of lower(trim(text)): engine-portable, matches the exact-
  dedup normalization so "copy" means the same thing in both
  passes).
* :func:`purge_by_ids` — expand the id list to content
  fingerprints, then one broadcast anti-join drops every copy.
* :func:`tombstone_ledger` — the durable (fingerprint, copies
  removed) record: written next to the sink, unioned into the seed
  side of future purges (the same merge-by-addition contract the
  incremental dedup band store uses), and the audit artifact a
  compliance review reads.

At 100 TB: the seed/ledger side is requests-sized (thousands of
rows vs billions of docs) — always broadcast; the corpus side is
one linear scan with a map-side fingerprint, no shuffle. The purge
composes into the same Catalyst plan as the rest of the curation
chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_fingerprint(text_col: str = "text") -> Column:
    """Normalized content key: md5 over lower(trim(text)). NULL text
    fingerprints as the empty string: md5(NULL) is NULL, and NULL
    keys never match a Spark equi-join — an explicitly named NULL-text
    doc would otherwise survive its own takedown (no seed match, no
    anti-join match, no tombstone, and the audit would count it as
    cleanly kept)."""
    return F.md5(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    )


def _seed_fingerprints(
    docs: DataFrame, removal_ids: list[int], id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(corpus-with-_fp, distinct seed fingerprints) — the one seed
    expansion all three governance passes share, so purge, ledger,
    and audit can never disagree on what 'the named content' means."""
    with_fp = docs.withColumn("_fp", content_fingerprint(text_col))
    seeds = (
        with_fp.filter(F.col(id_col).isin(removal_ids))
        .select("_fp")
        .distinct()
    )
    return with_fp, seeds


def purge_by_ids(
    docs: DataFrame,
    removal_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop EVERY copy of the content named by ``removal_ids`` (not
    just the listed rows): ids → distinct content fingerprints →
    broadcast anti-join. Returns the surviving corpus with its
    original columns."""
    with_fp, seeds = _seed_fingerprints(docs, removal_ids, id_col, text_col)
    return with_fp.join(F.broadcast(seeds), "_fp", "left_anti").drop("_fp")


def tombstone_ledger(
    docs: DataFrame,
    removal_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-fingerprint removal record: (fingerprint, n_copies
    removed, min/max removed id). Union-able across purge batches
    (counts add, ids min/max-merge); re-applying the ledger to a
    future batch is ``anti-join on fingerprint`` — recurring
    re-crawls of purged content never re-enter."""
    with_fp, seeds = _seed_fingerprints(docs, removal_ids, id_col, text_col)
    return (
        with_fp.join(F.broadcast(seeds), "_fp")
        .groupBy(F.col("_fp").alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
    )


def purge_audit(
    docs: DataFrame,
    removal_ids: list[int],
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group compliance summary of a purge: docs before, copies
    removed (by content, so it can exceed the request count), docs
    after. One scan + the broadcast seed join."""
    with_fp, seeds = _seed_fingerprints(docs, removal_ids, id_col, text_col)
    flagged = with_fp.join(
        F.broadcast(seeds.withColumn("_purge", F.lit(True))),
        "_fp",
        "left",
    )
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("_purge"), 1).otherwise(0)
            ).cast("bigint").alias("n_purged"),
            F.sum(
                F.when(F.col("_purge").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_kept"),
        )
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """K-anonymity audit over a set of quasi-identifier columns: a
    dataset is k-anonymous when every equivalence class (distinct
    quasi-identifier combination) contains ≥ k rows — smaller classes
    re-identify individuals by linkage. Returns ONE row per class
    SIZE (class_size, n_classes, n_rows, violates) — the class-size
    histogram, never the classes themselves (publishing the violating
    quasi-identifier values would itself leak; the histogram is safe
    to export). Two shrinking hash aggregates: rows → classes →
    sizes; linear, map-side combined, no skew (class count bounds the
    second stage)."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes"))
            .cast("bigint")
            .alias("n_rows"),
            (F.col("class_size") < k).alias("violates"),
        )
    )
