"""n-gram LM self-perplexity (CCNet-style quality signal) —
LLM-data-pipeline extension. CCNet ranks web documents by the
perplexity of a small Kneser-Ney LM trained on a trusted corpus;
the cheap Spark-native analogue here is an add-1 **bigram** model
trained on the corpus itself, then used to score every document —
the "how surprising is this text under the corpus's own word
statistics" signal used for quality bucketing.

The model is two mergeable count frames, not a fitted artifact:

    c2(w1, w2) = corpus count of the bigram
    c1(w1)     = corpus count of bigrams starting with w1
    V          = corpus vocabulary size (scalar)

    logp(w2 | w1) = ln( (c2 + 1) / (c1 + V) )        (add-1)
    doc score     = mean over the doc's bigrams of logp
    perplexity    = exp(-score)

Engine-reproducibility: per-bigram log-probs are quantized to exact
1e-6 integers (``CAST(ROUND(ln(p) * 1e6) AS BIGINT)``) before the
per-doc SUM, so the numerator is integer-exact and the per-doc mean
is bit-stable under any repartitioning — and byte-identical to the
DuckDB oracle, which rebuilds the same model in SQL. Floats only
enter at the final division/exp.

Everything is JVM built-ins (``zip_with`` bigram construction, two
hash aggregates, hash joins): no Python in the plan. At 100 TB the
two count frames are vocabulary-sized — orders of magnitude smaller
than the corpus (web-scale vocab ~1e8 rows ≪ 1e11 docs) — so the
scoring join is a model-sized shuffle join keyed on words, while
the corpus-side bigram stream aggregates map-side before the final
doc_id-keyed combine. The model frames are plain DataFrames: they
can be persisted to parquet and reused to score later batches
without retraining (the two counts and V merge by addition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import tokens_col

_Q = 1_000_000.0


def _lm_tokens(text_col: str) -> Column:
    """tokens_col minus the phantom '' token that split() emits for
    empty/whitespace-only documents — otherwise '' enters the
    vocabulary (inflating the add-1 denominator V) and the stored
    unigram counts. Same artifact convention as drift/bpe/dsir;
    interior tokens are never '' (split on \\s+), so this only
    affects empty docs."""
    return F.array_remove(tokens_col(text_col), "")


def bigrams_col(tokens: Column) -> Column:
    """``array<struct<w1,w2>>`` of consecutive token pairs — one
    ``zip_with`` of the array against its shift, O(tokens) per row.
    Empty for docs with fewer than two tokens."""
    size = F.size(tokens)
    return F.zip_with(
        F.slice(tokens, 1, F.greatest(size - 1, F.lit(0))),
        F.slice(tokens, 2, F.greatest(size - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def perplexity_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score every document by self-perplexity under the corpus's
    own add-1 bigram model (trained and applied in one Catalyst
    plan). Output: ``(doc_id, n_bigrams, avg_logp, perplexity)``;
    docs with < 2 tokens get ``n_bigrams = 0`` and NULL scores.

    Plan shape: the doc-side bigram stream joins the two model
    frames on word keys (model ≪ corpus: broadcast-able for
    bounded vocabularies, shuffle join otherwise), the scalar vocab
    frame is a one-row broadcast cross join, and the quantized
    log-probs sum in a map-side-combined doc_id aggregate."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), _lm_tokens(text_col).alias("t")
    )
    bi = toks.filter(F.size("t") >= 2).select(
        "doc_id", F.explode(bigrams_col(F.col("t"))).alias("b")
    ).select("doc_id", "b.w1", "b.w2")
    # The bigram-count model frame is persisted: it is bounded by
    # the bigram vocabulary (≪ corpus) and has two consumers — the
    # score join and the c1 re-aggregation below — which would each
    # replay the corpus explode without it. Cache lifecycle is
    # caller-owned (the frame is consumed lazily through the
    # returned plan, so the operator cannot unpersist it): in a
    # long-running session, `spark.catalog.clearCache()` between
    # jobs reclaims it; until then the blocks are vocabulary-
    # bounded and evictable (default MEMORY_AND_DISK is LRU), so
    # they degrade to recompute, never to OOM.
    c2 = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .persist()
    )
    # c1(w1) = Σ_w2 c2(w1, w2): re-aggregate the MODEL frame, not
    # the corpus — a grouped aggregate over c2 is vocabulary-sized,
    # where a second bigram explode would be another corpus scan.
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("vocab")
    )
    return _score_bigrams(toks, bi, c2, c1, vocab)


def _score_bigrams(toks, bi, c2, c1, vocab) -> DataFrame:
    """Shared scoring tail: join the doc-side bigram stream against
    the model frames and reduce to per-doc means. LEFT joins with
    zero-count fallbacks make it OOV-safe — a bigram (or prefix
    word) the model never saw scores at the add-1 floor
    ln(1/(c1+V)) instead of being dropped, which is what scoring a
    NEW batch under a stored model requires; for self-scoring every
    bigram is present and the fallbacks never fire."""
    # Quantized per-bigram log-prob: integer-exact numerator so the
    # per-doc mean is partitioning-invariant and oracle-identical.
    qlp = F.round(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(1.0) * F.col("vocab"))
        )
        * F.lit(_Q)
    ).cast("bigint")
    sc = (
        bi.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(qlp).alias("sq"),
        )
    )
    avg = F.col("sq") / (F.col("n_bigrams") * F.lit(_Q))
    return (
        toks.select("doc_id")
        .join(sc, ["doc_id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            F.round(avg, 6).alias("avg_logp"),
            F.round(F.exp(-avg), 6).alias("perplexity"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's final step: split the corpus into perplexity buckets
    (head = most fluent under the LM, …, tail) and report per-bucket
    accounting — the frame used to choose which slices to keep or
    re-weight for training.

    Thresholds are DISCRETE order statistics over the 1e-6-quantized
    perplexity (bucket b's cutoff = smallest value whose cumulative
    count ≥ ceil(b·n/k)): pure integer comparisons, so bucketing is
    exact and identical on every engine — no float-interpolated
    percentile boundaries to disagree about. Ties share a bucket.

    Everything after the scoring pass runs on the DISTINCT-value
    histogram (value, count): cumulative walk, cutoffs, AND the
    per-bucket stats (n_docs = Σ count, mean = Σ value·count / Σ
    count, min/max from values) — so the corpus is scanned once for
    scores and never revisited; re-deriving the assignment from the
    doc-level frame would replay the whole scoring plan per
    consumer (plan-verified: 15 scans → 4). Docs with no bigrams
    are excluded (their perplexity is undefined)."""
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    s = perplexity_scores(df, text_col, id_col).filter(
        F.col("n_bigrams") > 0
    )
    # The histogram is tiny (≤ distinct quantized values) and has
    # two consumers (threshold agg + bucket assignment); persist it
    # so the scoring plan above runs exactly once. Lifecycle is
    # caller-owned (see perplexity_scores) — histogram-sized blocks,
    # LRU-evictable, reclaimed by clearCache() between jobs.
    hist = (
        s.groupBy(
            F.round(F.col("perplexity") * F.lit(_Q))
            .cast("bigint")
            .alias("_qp")
        )
        .agg(F.count(F.lit(1)).alias("_c"))
        .persist()
    )
    w = Window.orderBy("_qp").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(wall)
    )
    # Cutoff for bucket b = smallest value whose cumulative count
    # reaches ceil(b·n/k); a value's bucket is then the first b
    # whose cutoff is ≥ it. The window walk and the bucket agg all
    # stay on the histogram frame — no second corpus pass.
    thresholds = [
        F.min(
            F.when(
                F.col("_cum")
                >= F.ceil(F.lit(b) * F.col("_n") / F.lit(n_buckets)),
                F.col("_qp"),
            )
        ).alias(f"_t{b}")
        for b in range(1, n_buckets)
    ]
    bucket = F.lit(n_buckets)
    for b in range(n_buckets - 1, 0, -1):
        bucket = F.when(F.col("_qp") <= F.col(f"_t{b}"), F.lit(b)).otherwise(
            bucket
        )
    # n_buckets == 1 needs no thresholds (cum.agg() with zero
    # expressions is invalid): everything is bucket 1
    staged = (
        cum.crossJoin(F.broadcast(cum.agg(*thresholds)))
        if thresholds
        else cum
    )
    return (
        staged.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.sum("_c").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("_qp") * F.col("_c"))
                / (F.sum("_c") * F.lit(_Q)),
                6,
            ).alias("avg_perplexity"),
            F.round(F.min("_qp") / F.lit(_Q), 6).alias("min_perplexity"),
            F.round(F.max("_qp") / F.lit(_Q), 6).alias("max_perplexity"),
        )
    )


# ------------------------------------------------------ model store


def save_bigram_model(
    df: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Persist the LM as two count datasets — ``<path>/c2`` (bigram
    counts) and ``<path>/uni`` (unigram counts, whose row count is
    the vocabulary) — via Spark's filesystem layer, so the store
    works on HDFS/S3 like the LSH index. Both frames merge by
    addition: see :func:`update_bigram_model`."""
    toks = df.select(_lm_tokens(text_col).alias("t"))
    bi = toks.filter(F.size("t") >= 2).select(
        F.explode(bigrams_col(F.col("t"))).alias("b")
    ).select("b.w1", "b.w2")
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c2.write.mode("overwrite").parquet(f"{path}/c2")
    uni.write.mode("overwrite").parquet(f"{path}/uni")


def update_bigram_model(
    df: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Fold a NEW batch into a stored model: counts add, vocabulary
    unions — training never replays old batches (same incremental
    contract as the dedup band store).

    Crash-safety: both merged frames are fully written to staging
    dirs FIRST (the stored model is never an input to files being
    overwritten, so no lineage-break checkpoint is needed and the
    old generation stays intact through the whole data write), then
    swapped into place with filesystem renames. A failure during
    the writes leaves the old model untouched; the residual
    inconsistency window is the two metadata renames, not the two
    data writes."""
    spark = df.sparkSession
    old_c2 = spark.read.parquet(f"{path}/c2")
    old_uni = spark.read.parquet(f"{path}/uni")
    toks = df.select(_lm_tokens(text_col).alias("t"))
    bi = toks.filter(F.size("t") >= 2).select(
        F.explode(bigrams_col(F.col("t"))).alias("b")
    ).select("b.w1", "b.w2")
    new_c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    new_uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged_c2 = (
        old_c2.unionByName(new_c2)
        .groupBy("w1", "w2")
        .agg(F.sum("c2").alias("c2"))
    )
    merged_uni = (
        old_uni.unionByName(new_uni)
        .groupBy("w")
        .agg(F.sum("c").alias("c"))
    )
    merged_c2.write.mode("overwrite").parquet(f"{path}/c2_staging")
    merged_uni.write.mode("overwrite").parquet(f"{path}/uni_staging")

    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    fs = hadoop_path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    for name in ("c2", "uni"):
        fs.delete(hadoop_path(f"{path}/{name}"), True)
        fs.rename(
            hadoop_path(f"{path}/{name}_staging"),
            hadoop_path(f"{path}/{name}"),
        )


def perplexity_with_model(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a batch under a STORED model — no training pass over
    anything but the batch itself. OOV bigrams score at the add-1
    floor (left-join fallbacks in the shared scoring tail). Scoring
    the training corpus under its own stored model reproduces
    :func:`perplexity_scores` bit-for-bit (test-pinned)."""
    spark = df.sparkSession
    c2 = spark.read.parquet(f"{path}/c2")
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = spark.read.parquet(f"{path}/uni").agg(
        F.count(F.lit(1)).alias("vocab")
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"), _lm_tokens(text_col).alias("t")
    )
    bi = toks.filter(F.size("t") >= 2).select(
        "doc_id", F.explode(bigrams_col(F.col("t"))).alias("b")
    ).select("doc_id", "b.w1", "b.w2")
    return _score_bigrams(toks, bi, c2, c1, vocab)


def kneser_ney_bigrams(
    df: DataFrame,
    discount: float = 0.75,
    top_k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram model export — the smoothing
    CCNet's actual filter LM uses (vs the add-1 stand-in above):

        P_KN(w2|w1) = max(c2 − D, 0)/c1
                      + (D/c1) · N1+(w1,•) · N1+(•,w2)/N1+(•,•)

    with fixed discount D, where N1+(w1,•) is the distinct-follower
    count, N1+(•,w2) the continuation (distinct-predecessor) count,
    and N1+(•,•) the total bigram-type count. Emits the ``top_k``
    bigrams by raw count (count-desc, then words — deterministic
    without float ordering) with the smoothed probability and its
    components; the full model is the same frame without the limit.

    Scale plan: ONE corpus explode builds the (w1, w2) count frame;
    every other aggregate (c1, follower, continuation, type totals)
    re-derives from that vocabulary-bounded MODEL frame, never from
    the corpus — identical posture to perplexity_scores. The two
    word-keyed joins are model-sized; the scalar type count is a
    one-row broadcast. P_KN is a ratio of exact integer counts
    (D = 3/4 is dyadic), so the IEEE division + 6-decimal round is
    engine-identical."""
    toks = df.select(_lm_tokens(text_col).alias("t"))
    bi = toks.filter(F.size("t") >= 2).select(
        F.explode(bigrams_col(F.col("t"))).alias("b")
    ).select("b.w1", "b.w2")
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")).persist()
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    n_follow = c2.groupBy("w1").agg(
        F.count(F.lit(1)).alias("n_followers")
    )
    n_cont = c2.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n_continuations")
    )
    n_types = c2.agg(F.count(F.lit(1)).alias("n_types"))
    d = F.lit(discount)
    p_kn = (
        F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("c1")
        + (d / F.col("c1"))
        * F.col("n_followers")
        * (F.col("n_continuations") / F.col("n_types"))
    )
    return (
        c2.join(c1, "w1")
        .join(n_follow, "w1")
        .join(n_cont, "w2")
        .crossJoin(F.broadcast(n_types))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("bigint").alias("c2"),
            F.col("n_followers").cast("bigint").alias("n_followers"),
            F.col("n_continuations").cast("bigint").alias(
                "n_continuations"
            ),
            F.round(p_kn, 6).alias("p_kn"),
        )
        .orderBy(F.desc("c2"), "w1", "w2")
        .limit(top_k)
    )


def doremi_domain_weights(
    df: DataFrame,
    temperature: float = 1.0,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """DoReMi-style domain reweighting (one exponentiated-gradient
    step of Xie et al.'s Group DRO objective, with the corpus's own
    bigram NLL standing in for the proxy-model excess loss): domains
    whose text is more surprising than the corpus average get
    up-weighted relative to their token share —

        w(d) ∝ share(d) · exp( (nll(d) − nll(corpus)) / T )

    normalized over domains. Emits one row per domain with the
    component statistics, so the output is both the sampling-weight
    vector for the mixing pass (token_budget_sample /
    temperature_fractions take it as input) and the audit trail.

    Scale plan: the add-1 bigram model trains exactly as
    perplexity_scores (one corpus explode, vocabulary-bounded model
    frames); the NLL aggregate is keyed by DOMAIN, not doc — a
    handful of groups — and every division/exp happens on
    O(domains) rows from integer-exact numerators (the quantized
    log-prob sums), so results are partitioning-invariant and
    engine-identical."""
    toks = df.select(
        F.col(domain_col).alias("domain"), _lm_tokens(text_col).alias("t")
    )
    bi = toks.filter(F.size("t") >= 2).select(
        "domain", F.explode(bigrams_col(F.col("t"))).alias("b")
    ).select("domain", "b.w1", "b.w2")
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")).persist()
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("vocab")
    )
    qlp = F.round(
        F.log(
            (F.col("c2") + F.lit(1.0))
            / (F.col("c1") + F.lit(1.0) * F.col("vocab"))
        )
        * F.lit(_Q)
    ).cast("bigint")
    # dom is O(domains) rows but its lineage is the full corpus
    # explode, and THREE consumers reference it (tot, scored, z) —
    # the lazy localCheckpoint materializes the aggregate once at
    # first use instead of replaying the training scan per consumer.
    # (Under ANSI mode the bigint _sq sum fails loudly on overflow;
    # headroom is ~9.2e18 / 2e7-per-bigram ≈ 4.6e11 bigrams per
    # domain before the quantum must be lowered.)
    dom = (
        bi.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(qlp).alias("_sq"),
        )
        .localCheckpoint(eager=False)
    )
    tot = dom.agg(
        F.sum("n_bigrams").alias("_nt"), F.sum("_sq").alias("_sqt")
    )
    nll_d = -F.col("_sq") / (F.col("n_bigrams") * F.lit(_Q))
    nll_c = -F.col("_sqt") / (F.col("_nt") * F.lit(_Q))
    raw = (F.col("n_bigrams") / F.col("_nt")) * F.exp(
        (nll_d - nll_c) / F.lit(temperature)
    )
    # Quantize the un-normalized weight to a 1e12 integer BEFORE the
    # normalizing sum: an integer Σ is order/partitioning-invariant
    # where a double Σ of exp() terms is not — same discipline as
    # the quantized log-prob numerators above. Guarded: beyond
    # raw ≈ 9.2e6 (tiny temperature × large excess NLL) the 1e12
    # quantization exceeds bigint and the non-ANSI double→bigint
    # cast would saturate SILENTLY, corrupting the normalization —
    # raise instead (DuckDB's strict CAST already throws there, so
    # the engines agree on failing loudly).
    qraw = (
        F.when(raw < F.lit(9.2e6), F.round(raw * F.lit(1e12)))
        .otherwise(
            F.raise_error(
                F.lit(
                    "doremi weight exceeds the 1e12-quantized bigint "
                    "range - raise temperature or lower the quantum"
                )
            )
        )
        .cast("bigint")
    )
    scored = dom.crossJoin(F.broadcast(tot)).withColumn("_qraw", qraw)
    z = scored.agg(F.sum("_qraw").alias("_z"))
    return (
        scored.crossJoin(F.broadcast(z))
        .select(
            "domain",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.round(nll_d, 6).alias("domain_nll"),
            F.round(nll_d - nll_c, 6).alias("excess_nll"),
            F.round(F.col("n_bigrams") / F.col("_nt"), 6).alias(
                "token_share"
            ),
            F.round(F.col("_qraw") / F.col("_z"), 6).alias("weight"),
        )
    )
