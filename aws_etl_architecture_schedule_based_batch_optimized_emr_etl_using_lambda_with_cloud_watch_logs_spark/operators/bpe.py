"""BPE vocabulary training (Sennrich et al. 2016) —
LLM-data-pipeline extension. `text.py`'s bpe_token_stats APPLIES a
given merge list; this module LEARNS the merges from the corpus —
the tokenizer-training step of a data pipeline.

Scale shape (the part that matters at 100 TB): classic BPE training
iterates over WORD TYPES, not the corpus. One corpus pass builds the
(word, count) type frame — vocabulary-bounded, orders of magnitude
smaller than the corpus — and every one of the k merge iterations
runs on that model-sized frame: an explode of adjacent symbol pairs,
a weighted count, a 1-row argmax to the driver (bounded metadata,
the same class as a convergence scalar), and a JVM fold that applies
the merge inside each word's symbol array. The corpus is never
rescanned after the first aggregate.

Determinism: the winning pair is (max weighted count, then
lexicographic (left, right)) — partitioning-invariant because the
count is an exact integer aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col


def _pairs_expr():
    """symbols array → array of adjacent (l, r) structs."""
    return F.expr(
        """
        CASE WHEN size(syms) >= 2 THEN
          zip_with(slice(syms, 1, size(syms) - 1),
                   slice(syms, 2, size(syms) - 1),
                   (l, r) -> struct(l AS l, r AS r))
        ELSE CAST(array() AS ARRAY<STRUCT<l: STRING, r: STRING>>) END
        """
    )


def _merge_expr(left: str, right: str):
    """One left-to-right merge pass of (left, right) → left||right
    inside the symbol array: a single fold with one-symbol lookahead
    state (pending), O(symbols) per word."""
    l = left.replace("'", "\\'")
    r = right.replace("'", "\\'")
    return F.expr(
        f"""
        CASE WHEN size(syms) = 0 THEN syms ELSE
          aggregate(
            slice(syms, 2, size(syms) - 1),
            struct(CAST(array() AS ARRAY<STRING>) AS out,
                   syms[0] AS pending),
            (acc, x) -> CASE
              WHEN acc.pending = '{l}' AND x = '{r}'
                THEN struct(array_append(acc.out, '{l}{r}') AS out,
                            CAST(NULL AS STRING) AS pending)
              WHEN acc.pending IS NULL
                THEN struct(acc.out AS out, x AS pending)
              ELSE struct(array_append(acc.out, acc.pending) AS out,
                          x AS pending) END,
            acc -> CASE WHEN acc.pending IS NULL THEN acc.out
                        ELSE array_append(acc.out, acc.pending) END)
        END
        """
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    end_of_word: str = "</w>",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge table ``[(step, left, right, weighted_count)]`` —
    the artifact a tokenizer ships. The word-type frame carries an
    ``end_of_word`` sentinel symbol (standard: prevents merges
    across word boundaries from absorbing prefixes of other words).

    Driver work per iteration: ONE collected row (the argmax pair).
    Executor work per iteration: pair explode + hash aggregate + the
    merge fold, all on the vocabulary-bounded type frame."""
    types = (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.split(F.col("w"), ""),
                F.array(F.lit(end_of_word)),
            ).alias("syms"),
            "cnt",
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    current = types.localCheckpoint()
    for step in range(1, n_merges + 1):
        top = (
            current.select(F.explode(_pairs_expr()).alias("p"), "cnt")
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break  # nothing left worth merging
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((step, l, r, n))
        # localCheckpoint: truncate the lineage each step so the plan
        # doesn't grow k folds deep (same pattern as connected
        # components' iteration)
        current = current.select(
            _merge_expr(l, r).alias("syms"), "cnt"
        ).localCheckpoint()
    return merges


def bpe_merge_table(
    df: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """The merge list as a DataFrame (step, left, right, n) — the
    shippable artifact, joinable/writable like any other model
    frame."""
    spark = df.sparkSession
    rows = bpe_train(df, n_merges, text_col)
    return spark.createDataFrame(
        rows, "step int, left string, right string, n bigint"
    )
