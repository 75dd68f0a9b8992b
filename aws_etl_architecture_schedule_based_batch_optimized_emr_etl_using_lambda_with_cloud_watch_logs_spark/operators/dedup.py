"""Deduplication operators (SURVEY §2.M1/M2 — LLM-data-pipeline
extensions; no counterpart in the reference, which only has metadata
``distinct()`` at ``emr_json_parquet_schema_drift_etl.py:41,187``).

All hot-path math is built-in higher-order functions (``transform``,
``filter``, ``aggregate``, ``xxhash64``) — JVM-side, codegen'd, no
Python UDFs. Scale design notes per operator below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup keeping the lowest id per key group.

    One hash aggregate (map-side combined) — the canonical 100 TB
    dedup: shuffle is on the dedup key, partial aggregation halves
    the shuffle volume, AQE coalesces the result.
    """
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies")
    )


def exact_dedup_rows(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Full-row variant: keep the first row per key (deterministic by
    ``order_col``) — window row_number, single shuffle on the key."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------- shingling


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization of a text column (lowercased)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(col)), r"\s+")


def shingles_col(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array — pure
    higher-order functions: ``transform(sequence(...), i ->
    concat_ws(' ', slice(tokens, i, n)))``."""
    return F.array_distinct(
        F.when(F.size(tokens) >= n,
               F.transform(
                   F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
                   lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
               ))
        .otherwise(F.array(F.concat_ws(" ", tokens)))
    )


def jaccard_col(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return (inter / union).cast("double")


# ------------------------------------------------- exact n-gram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard ≥ threshold. O(n²) — this is the
    *correctness oracle* for the LSH path, usable at small scale only.
    At 100 TB use :func:`minhash_lsh_dedup` (candidates via banding,
    exact verify only on candidates)."""
    sh = df.select(
        F.col(id_col), shingles_col(tokens_col(text_col), n).alias("shingles")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jaccard_col(F.col("a.shingles"), F.col("b.shingles")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------- minhash LSH


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for seed s, min over shingles of
    ``xxhash64(shingle, s)``. Array of ``num_hashes`` longs, all
    JVM-side."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda sh: F.xxhash64(sh, F.lit(s))))
            for s in range(num_hashes)
        ]
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs via MinHash + LSH banding, exact-verified.

    Pipeline (all DataFrame ops, two shuffles total):
      1. shingle + signature per doc (narrow, codegen'd),
      2. explode into ``bands`` band-hashes; self-join on
         (band, band_hash) → candidate pairs (shuffle 1, hash join),
      3. distinct candidates (shuffle 2) + exact Jaccard verify on
         the shingle sets — only candidates pay the verify cost.

    With b=16, r=4: P(candidate) = 1-(1-j^4)^16 → ≈99.98% recall at
    j=0.8. At 100 TB: band join keys are uniformly-distributed hashes
    (no skew), signatures are 64×8 bytes/doc, and the O(n²) blowup is
    confined to near-identical buckets (salt or cap giant buckets if
    a pathological corpus demands it).
    """
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col),
        shingles_col(tokens_col(text_col), n).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))

    banded = sigs.select(
        id_col,
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )

    a, b_ = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    return candidates.select(
        "id_a",
        "id_b",
        jaccard_col(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------- simhash


def simhash_col(tokens: Column, bits: int = 64) -> Column:
    """64-bit SimHash of a token array, expression-only.

    Per bit i: sum over tokens of ±1 by whether bit i of
    ``xxhash64(token)`` is set; bit set in the output if the sum > 0.
    Builds 64 aggregate expressions at plan time — wide but flat
    (single project, no shuffle, no UDF).
    """
    def signed_bit(i: int) -> int:
        # two's-complement value of bit i in a 64-bit long (bit 63 is
        # the sign bit — 1 << 63 overflows a JVM long otherwise)
        return (1 << i) - (1 << 64) if i == 63 else (1 << i)

    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(signed_bit(i))) != 0, 1).otherwise(-1),
        )
        for i in range(bits)
    ]
    out = F.lit(0).cast("long")
    for i, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(signed_bit(i)).cast("long")).otherwise(
            F.lit(0)
        )
    return out


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ ``max_hamming``.

    Pigeonhole blocking: split 64 bits into ``max_hamming+1`` chunks —
    any pair within the radius agrees on ≥1 chunk, so the self-join
    runs per-chunk on chunk equality (uniform hash keys, no skew),
    then exact Hamming (bit_count of xor) filters."""
    chunks = max_hamming + 1
    chunk_bits = 64 // chunks
    sh = df.select(
        F.col(id_col), simhash_col(tokens_col(text_col)).alias("simhash")
    )
    banded = sh.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
                    .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                    for i in range(chunks)
                ]
            )
        ).alias("chunk", "chunk_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
