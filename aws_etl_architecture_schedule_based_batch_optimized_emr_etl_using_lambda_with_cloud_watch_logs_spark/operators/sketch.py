"""Count-min sketch heavy hitters — the streaming/mergeable
frequency sketch (Cormode & Muthukrishnan 2005) as plain DataFrame
aggregates. Complements the built-in sketches already gated
(HLL++ distinct counts, GK quantiles) with the one Spark lacks:
bounded-memory approximate frequencies with a one-sided error
guarantee (estimate ≥ true count, always; overestimate ≤ εN with
probability 1-δ for width e/ε, depth ln(1/δ)).

Spark-native formulation — the sketch IS a DataFrame:

    cells(j, cell, n):  d×w rows,  n = count of tokens hashing to
                        (row j, column cell)

* Build is one explode → map-side-combined hash aggregate producing
  at most d·w rows regardless of corpus size — the canonical
  100 TB shape (the reduction happens in the combiners; the shuffle
  moves ≤ d·w·partitions rows).
* Merge across shards/batches = union + re-aggregate (counts add) —
  the mergeability that makes CMS the standard distributed counter.
* Probe = d-row broadcast join + min() — the sketch frame is a few
  KB, always broadcast-able.
* Hashing is ``md5``-based (row-salted, first 8 hex chars →
  bigint mod width): deterministic and engine-portable, so any SQL
  engine rebuilds the byte-identical sketch — estimates themselves
  are oracle-checkable, not just their error flags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import tokens_col


def cms_cell(token: Column, row: Column | int, width: int) -> Column:
    """Engine-portable CMS column index: first 32 bits of
    md5(row || ':' || token), folded to [0, width)."""
    row_c = F.lit(row) if isinstance(row, int) else row
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(row_c.cast("string"), F.lit(":"), token)),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )


def cms_build(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build the sketch from a one-column token stream: returns the
    ``(j, cell, n)`` cell-count frame (≤ depth·width rows). Each
    input row fans out to ``depth`` (j, cell) keys via posexplode of
    the per-row cell array — one pass, one aggregate."""
    cells = F.array(
        *[cms_cell(F.col(token_col), j, width) for j in range(depth)]
    )
    return (
        tokens.select(F.posexplode(cells).alias("j", "cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, hash):
    counts add cell-wise. This is how per-shard/per-day sketches
    combine into a corpus sketch without touching raw data again."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "cell").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 512,
    check_depth: bool = True,
) -> DataFrame:
    """Point-query the sketch for each probe token: min over the
    depth rows of the matching cell counts (missing cell → 0).
    The sketch side is broadcast (≤ depth·width rows).

    Fail-closed depth guard (``check_depth``, default on): probing
    with a LARGER depth than the sketch was built with would join
    nonexistent j rows, coalesce them to 0, and silently break the
    never-underestimate guarantee — so the plan carries a one-row
    broadcast of the sketch's ``max(j)`` and ``assert_true``s that
    every probe row's j is covered (runtime error instead of a
    wrong 0). Probing with a SMALLER depth stays legal: min over a
    subset of rows can only be ≥ the full min, preserving one-sided
    error. Callers that pass the SAME depth variable to build and
    probe (mismatch impossible by construction, e.g. heavy_hitters)
    may disable the guard to skip its extra aggregate over the
    sketch subplan. Cost note: the guard aggregates the SKETCH
    FRAME, so if the sketch is unpersisted lineage its corpus
    explode re-runs for the one-row max(j) — a real pipeline builds
    a sketch once and persists/writes it (the intended lifecycle,
    same as the band stores), at which point the guard reads ≤
    depth·width cached rows. The (j, cell, n) schema is the public
    mergeable contract, so depth is not smuggled into the frame."""
    cells = F.array(
        *[cms_cell(F.col(token_col), j, width) for j in range(depth)]
    )
    fan = probes.select(token_col, F.posexplode(cells).alias("j", "cell"))
    if check_depth:
        guard = F.broadcast(sketch.agg(F.max("j").alias("_maxj")))
        fan = (
            fan.join(guard)
            .withColumn(
                "_depth_ok",
                F.assert_true(
                    # empty sketch ⇒ nothing inserted ⇒ all-zero
                    # estimates are exact, so absent max(j) passes
                    F.col("j")
                    <= F.coalesce(F.col("_maxj"), F.lit(depth - 1)),
                    F.lit("cms_estimate: probe depth exceeds sketch depth"),
                ),
            )
            .filter(F.col("_depth_ok").isNull())  # keeps the assert live
            .drop("_maxj", "_depth_ok")
        )
    return (
        fan.join(F.broadcast(sketch), ["j", "cell"], "left")
        .groupBy(token_col)
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """End-to-end gate composition: sketch the corpus token stream,
    then report the exact top-k tokens with their CMS estimates and
    the one-sided-error check (``cms_est ≥ exact`` always holds by
    construction — any collision only adds). At scale the exact
    top-k side would itself come from the sketch + a candidate
    heap; here it doubles as the in-plan verification."""
    toks = df.select(F.explode(tokens_col(text_col)).alias("token"))
    sketch = cms_build(toks, "token", depth, width)
    # exact's lineage is a full-corpus aggregate + global top-k, and
    # TWO consumers reference it (the probe side of cms_estimate and
    # the final join) — the lazy localCheckpoint materializes the
    # ≤top_k rows once instead of replaying the exact ranking (and
    # its corpus scan) per consumer
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "token")
        .limit(top_k)
        .localCheckpoint(eager=False)
    )
    # same depth variable builds and probes → mismatch impossible;
    # skip the guard's extra aggregate over the sketch subplan
    est = cms_estimate(
        sketch, exact.select("token"), "token", depth, width,
        check_depth=False,
    )
    return (
        exact.join(est, ["token"])
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_n")).alias("never_underest"),
        )
        .orderBy(F.desc("exact_n"), "token")
    )


def hll_incremental_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    batch_col: Column,
) -> DataFrame:
    """Mergeable distinct-count lifecycle (DataSketches HLL, the
    JVM built-in): per-batch sketches union into the corpus sketch
    without revisiting raw data — the incremental form of
    ``approx_count_distinct`` a pipeline persists per day/shard and
    folds forever. Sketch binaries are DataFrame values, so the
    per-batch frames can be written to parquet like the dedup band
    store and LM model.

    Output per group: the exact distinct count (oracle-checkable)
    plus two in-plan invariants — the union-of-batch-sketches
    estimate agrees with the one-shot estimate to 2% (DataSketches
    unions retarget the register format, so agreement is tight but
    not bit-exact), and the one-shot estimate lands within 5% of
    exact (HLL's error at default lgK=12 is ~1.6%; 5% is a
    deterministic-safe bound at fixture scale)."""
    batched = df.withColumn("_b", batch_col)
    per_batch = batched.groupBy(group_col, "_b").agg(
        F.hll_sketch_agg(key_col).alias("sk")
    )
    unioned = per_batch.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union")
    )
    oneshot = df.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(key_col)).alias("est_one"),
        F.countDistinct(key_col).alias("exact_distinct"),
    )
    return (
        oneshot.join(unioned, [group_col])
        .select(
            group_col,
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            (
                F.abs(F.col("est_union") - F.col("est_one"))
                <= 0.02 * F.col("est_one")
            ).alias("union_within_2pct"),
            (
                F.abs(F.col("est_one") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("within_5pct"),
        )
    )
