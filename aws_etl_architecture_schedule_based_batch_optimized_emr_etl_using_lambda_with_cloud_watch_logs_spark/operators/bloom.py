"""Distributed Bloom-filter semi-join pre-filter (LLM-data-pipeline
extension; no counterpart in the reference — its diff protocol is an
exact anti-join, SURVEY §2.E).

The 100 TB problem: semi-joining a huge fact stream (corpus
shingles, event keys) against a modest key set (benchmark shingles,
an allow/deny list) shuffles the entire big side on the join key.
A Bloom filter of the small side turns that into a scan-local
filter: probe rows that cannot match are dropped before any
exchange, and only the ~FP-rate survivors reach the exact join that
removes false positives. Spark's runtime bloom-join injection does
this opportunistically; this operator is the explicit, tunable
form with the filter itself a first-class DataFrame.

Representation: the filter is a tiny DataFrame of ``(word, bits)``
rows — ``m_bits/64`` longs — built with one hash aggregate
(``bit_or`` of ``shiftleft(1, bit)``), so construction is fully
JVM-side and map-combined. Probing is ``k`` broadcast hash joins
(one per hash function) followed by a bitmask test — zero shuffle
of the probe side, the plan stays one streaming stage. Hashes are
double-hashing over ``xxhash64(key, seed)``: h_i = h1 + i*h2 mod m.

Sizing: m_bits ~ 10 bits/key gives ~1% FP at k=5 (optimal
k = m/n * ln2 ~ 7; 5 keeps the join count low for a negligible FP
delta). The FP rate only costs extra rows into the exact verify
join — correctness never depends on it (no false negatives, by
construction: every build key sets all k of its bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k double-hashed bit positions in [0, m_bits). Both hashes are
    folded to [0, m) BEFORE the affine combine so every intermediate
    stays < (k+1)·m — no 64-bit overflow under ANSI mode for any
    m_bits up to ~2^59 (raw xxhash64 · i would overflow)."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(-1)), F.lit(m_bits)).bitwiseOR(
        F.lit(1)
    )
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """Build a Bloom filter of ``df[key_col]`` as an ``(word, bits)``
    DataFrame with ``<= m_bits/64`` rows (absent words are all-zero).
    One explode (k rows/key) + one map-combined bit_or aggregate."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k)))
    return (
        df.select(pos.alias("p"))
        .select(
            F.shiftright("p", 6).alias("word"),
            F.col("p").bitwiseAND(F.lit(63)).alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(F.expr("shiftleft(1L, cast(bit as int))")).alias(
                "bits"
            )
        )
    )


def bloom_contains(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 5,
    flag_col: str = "_bloom_hit",
) -> DataFrame:
    """``df`` with a boolean ``flag_col``: true iff ``key_col``
    MIGHT be in the filter (all k probed bits set).

    Probe shape (r14 optimization round, guide §2.4/§3): the sparse
    ``(word, bits)`` filter is densified into ONE row holding the
    full ``m_bits/64``-long word array (map_from_entries +
    zero-filled transform — the hashed-embeddings idiom), broadcast
    once, and every probe becomes a pure ``element_at`` + bitmask
    expression. The pre-r14 form ran k SEPARATE broadcast hash
    joins whose per-probe alias renames defeated exchange reuse, so
    the filter-build aggregate executed k times and the probe stage
    carried k join operators; now the build runs once and the probe
    side stays one expression-only streaming stage with zero joins.
    Bit positions and words are unchanged, so the flag is
    bit-identical. Bound: the dense array lives in a single row —
    fine up to array-cell limits (~2^37 filter bits); beyond that,
    shard the filter. ``bloom`` must be unique per ``word``
    (``bloom_build`` output is, by its groupBy)."""
    # 'non-destructive' must include the caller's own columns:
    # withColumn would silently overwrite (and the cleanup drop
    # remove) any pre-existing column named like the internals
    clash = {
        c
        for c in ["_bloom_words"] + [f"_p{i}" for i in range(k)]
        if c in df.columns
    } | ({flag_col} if flag_col in df.columns else set())
    if clash:
        raise ValueError(
            f"bloom_contains internal column name(s) {sorted(clash)} "
            f"already exist on the input — rename them or pass a "
            f"different flag_col"
        )
    n_words = (m_bits + 63) >> 6
    dense = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("_m")
    ).select(
        F.transform(
            F.sequence(
                F.lit(0).cast("bigint"), F.lit(n_words - 1).cast("bigint")
            ),
            lambda w: F.coalesce(
                F.element_at("_m", w), F.lit(0).cast("bigint")
            ),
        ).alias("_bloom_words")
    )
    out = df.crossJoin(F.broadcast(dense))
    hit = F.lit(True)
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        out = out.withColumn(f"_p{i}", p)
        word = F.element_at(
            "_bloom_words",
            (F.shiftright(f"_p{i}", 6) + F.lit(1)).cast("int"),
        )
        hit = hit & (
            word.bitwiseAND(
                F.expr(f"shiftleft(1L, cast(_p{i} & 63 as int))")
            )
            != 0
        )
    out = out.withColumn(flag_col, hit).drop("_bloom_words")
    for i in range(k):
        out = out.drop(f"_p{i}")
    return out


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Rows of ``df`` whose ``key_col`` MIGHT be in the filter (all
    true members survive; ~FP-rate of non-members leak through and
    must be removed by a downstream exact join). k broadcast joins,
    no shuffle of ``df``."""
    return (
        bloom_contains(df, bloom, key_col, m_bits, k)
        .filter(F.col("_bloom_hit"))
        .drop("_bloom_hit")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Exact semi-join of ``big`` against ``small`` on ``key_col``,
    Bloom-accelerated: probe-filter first (scan-local, no shuffle),
    exact ``leftsemi`` on the survivors (removes false positives).
    Result is row-identical to ``big.join(small, key, "leftsemi")``;
    the bloom pass only shrinks what reaches the exchange."""
    bloom = bloom_build(small, key_col, m_bits, k)
    candidates = bloom_probe(big, bloom, key_col, m_bits, k)
    return candidates.join(
        small.select(key_col).distinct(), key_col, "leftsemi"
    )
