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
    state (pending), O(symbols) per word.

    The learned symbols are bound as ``F.lit`` columns — never
    interpolated into a SQL string — so corpus tokens containing
    quotes, backslashes, or any other metacharacter (common in
    web/code text) can't break or corrupt the expression (ADVICE r06
    low finding)."""
    l, r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    syms = F.col("syms")
    tail = F.slice(syms, 2, F.size(syms) - 1)
    init = F.struct(
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("out"),
        syms[0].alias("pending"),
    )

    def step(acc, x):
        return (
            F.when(
                (acc["pending"] == l) & (x == r),
                F.struct(
                    F.array_append(acc["out"], merged).alias("out"),
                    F.lit(None).cast("string").alias("pending"),
                ),
            )
            .when(
                acc["pending"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("pending")),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["out"], acc["pending"]).alias("out"),
                    x.alias("pending"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pending"].isNull(), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["pending"])
        )

    return F.when(F.size(syms) == 0, syms).otherwise(
        F.aggregate(tail, init, step, finish)
    )


def _train(
    df: DataFrame,
    n_merges: int,
    text_col: str,
    end_of_word: str,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared training loop: returns (merge table, the final
    segmented word-type frame) — bpe_train ships the former,
    bpe_symbol_stats aggregates the latter. The word-type frame carries an
    ``end_of_word`` sentinel symbol (standard: prevents merges
    across word boundaries from absorbing prefixes of other words).

    Driver work per iteration: ONE collected row (the argmax pair).
    Executor work per iteration: pair explode + hash aggregate + the
    merge fold, all on the vocabulary-bounded type frame."""
    types = (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        # empty/whitespace-only documents tokenize to [''] — drop the
        # empty word type: a merge has no meaning there, and Spark's
        # split('', '') -> [''] vs an oracle's char-extract -> []
        # would otherwise let it learn a bogus ('', '</w>') merge
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.split(F.col("w"), ""),
                F.array(F.lit(end_of_word)),
            ).alias("syms"),
            "cnt",
        )
        # the type frame is vocabulary-bounded (~1e5 rows even at
        # web scale) — 32+ post-shuffle partitions are pure per-task
        # overhead across the k iteration jobs; narrow without a
        # shuffle
        .coalesce(8)
    )
    merges: list[tuple[int, str, str, int]] = []
    # localCheckpoint: truncate the lineage each step so the plan
    # doesn't grow k folds deep (same pattern as connected
    # components' iteration). eager=False — the checkpoint
    # materializes inside the next step's argmax job instead of
    # scheduling a second job per iteration (halves job count; wall
    # time is compile-dominated at toy SF, so the win shows at real
    # vocabulary sizes, not the 31-type test corpus)
    current = types.localCheckpoint(eager=False)
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
        current = current.select(
            _merge_expr(l, r).alias("syms"), "cnt"
        ).localCheckpoint(eager=False)
    return merges, current


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    end_of_word: str = "</w>",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge table ``[(step, left, right, weighted_count)]``."""
    return _train(df, n_merges, text_col, end_of_word)[0]


def bpe_symbol_stats(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    top_k: int = 20,
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenizer vocabulary COVERAGE after training: segment the
    corpus word types with the k learned merges and count how many
    corpus tokens each vocabulary symbol absorbs — the coverage
    report shipped next to the merge table (it is how you pick k and
    spot wasted vocab slots). Top-``top_k`` symbols by weighted
    count, count-desc then symbol. Same scale shape as training:
    every aggregate after the first corpus pass runs on the
    vocabulary-bounded type frame. ``end_of_word`` threads through
    like the sibling entry points so the audited vocabulary is the
    SAME one a custom-sentinel training run produced."""
    _merges, final = _train(df, n_merges, text_col, end_of_word)
    return (
        final.select(F.explode("syms").alias("symbol"), "cnt")
        .groupBy("symbol")
        .agg(F.sum("cnt").alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), "symbol")
        .limit(top_k)
    )


def bpe_document_tokens(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Corpus tokenization under the learned vocabulary: per-document
    word and BPE-token counts after segmenting with the k learned
    merges — the sequence-length profile a packing/curriculum stage
    consumes, computed under the REAL tokenizer rather than a
    whitespace proxy. Token counts include the end-of-word sentinel
    when it survives unmerged (documented convention, identical on
    both engines).

    Scale shape: segmentation happens once on the word-TYPE frame;
    the original word is recovered as concat(syms) minus the
    sentinel (merges only concatenate adjacent symbols, so the
    concatenation is invariant), giving a model-sized word ->
    n_symbols map. The corpus pass is then ONE broadcast hash join
    from the exploded words to that map — no per-document fold, no
    shuffle of the corpus."""
    _merges, final = _train(df, n_merges, text_col, end_of_word)
    seg = final.select(
        F.expr(
            f"substring(concat_ws('', syms), 1,"
            f" length(concat_ws('', syms)) - {len(end_of_word)})"
        ).alias("w"),
        F.size("syms").alias("n_syms"),
    )
    words = df.select(
        doc_id_col, F.explode(tokens_col(text_col)).alias("w")
    ).filter(F.col("w") != "")
    counted = (
        words.join(F.broadcast(seg), "w")
        .groupBy(doc_id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )
    # every input doc gets a row: a NULL/empty-text doc has no words
    # (explode of NULL yields nothing; '' is filtered) and would
    # otherwise vanish from the length profile — a packing/curriculum
    # consumer inner-joining on this frame would silently lose it
    # instead of seeing zeros
    return (
        df.select(doc_id_col)
        .join(counted, [doc_id_col], "left")
        .select(
            doc_id_col,
            F.coalesce("n_words", F.lit(0))
            .cast("bigint")
            .alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0))
            .cast("bigint")
            .alias("n_bpe_tokens"),
        )
    )


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
