"""Corpus mixing / domain-weighted sampling (LLM-data-pipeline
extension): build a training mix by sampling each domain (language,
source, quality bucket …) at its own rate — the head domain is
downsampled, the tail upweighted (relatively) — with temperature
re-weighting to interpolate between proportional (T=1) and uniform
(T→0) mixes.

Sampling is a DETERMINISTIC per-row multiplicative-hash Bernoulli on
the document key (same idiom as the engine's hash sampler): a pure
filter expression, pushed into the scan, no shuffle, reproducible
across engines/runs/partitionings — rerunning a 100 TB mix job
yields byte-identical corpora, and an independent SQL engine can
audit the mix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MULT = 2654435761  # Knuth multiplicative hash constant
_MOD = 2**32


def hash32_expr(key_col: str | Column) -> Column:
    """(key mod 2³²) · K mod 2³² computed entirely within 63-bit
    intermediates, so it is exact for ANY bigint key under Spark's
    ANSI mode (a naive ``key * K`` overflows for keys ≥ ~2³²·⁷ —
    runtime error under ANSI, silent negative wrap without).

    Two-limb schoolbook multiply: fold the key to 32 bits, split into
    16-bit limbs hi:lo, then
    ``k32·K mod 2³² = ((hi·K mod 2¹⁶)·2¹⁶ + lo·K) mod 2³²``.
    Largest intermediate is lo·K < 2⁴⁸ — comfortably in bigint.
    Identical bits to the single-multiply form wherever that form is
    exact, so existing samples are unchanged."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    k32 = F.pmod(key, F.lit(_MOD))
    hi = F.shiftright(k32, 16)
    lo = k32.bitwiseAND(F.lit(0xFFFF))
    return F.pmod(
        F.pmod(hi * F.lit(_MULT), F.lit(1 << 16)) * F.lit(1 << 16)
        + lo * F.lit(_MULT),
        F.lit(_MOD),
    )


def keep_fraction_expr(key_col: str | Column, fraction: float) -> Column:
    """Deterministic Bernoulli(fraction) on an integer key: keep rows
    with hash32(key) below fraction·2³². The threshold is an exact
    integer so any engine reproduces the same sample."""
    threshold = int(fraction * _MOD)
    return hash32_expr(key_col) < F.lit(threshold)


def temperature_fractions(
    counts: dict[str, int], temperature: float, target_total: int
) -> dict[str, float]:
    """Per-domain sampling fractions for a temperature-reweighted mix
    of ``target_total`` documents: p_d ∝ count_d^T (T=1 proportional,
    T→0 uniform), fraction_d = min(1, target_total·p_d / count_d).
    Pure driver-side arithmetic over |domains| numbers."""
    if not counts:
        return {}
    weights = {d: c**temperature for d, c in counts.items() if c > 0}
    total_w = sum(weights.values())
    return {
        d: min(1.0, target_total * (w / total_w) / counts[d])
        for d, w in weights.items()
    }


def _keeps_expr(
    fractions: dict[str, float], label_col: str, key_col: str
) -> Column:
    """hash32(key) < threshold[label] via ONE literal-map lookup —
    the single definition both the filter and the audit report use,
    so they can never disagree on sampling semantics.

    The map form is O(1) per row; the previous OR-over-domains chain
    re-evaluated the two-limb hash once per domain (a 150-language
    mix paid up to 150 hash evaluations per scanned row — HOF/OR
    chains block subexpression elimination). Semantics are
    identical: a label absent from ``fractions`` (or NULL) looks up
    NULL, the comparison is NULL, and filter/when treat it as
    not-kept, exactly like the old no-branch-matched FALSE."""
    if not fractions:
        return F.lit(False)
    entries: list[Column] = []
    for label, frac in fractions.items():
        entries.append(F.lit(label))
        entries.append(F.lit(int(frac * _MOD)))
    thresholds = F.create_map(*entries)
    return hash32_expr(key_col) < thresholds[F.col(label_col)]


def weighted_sample(
    df: DataFrame,
    fractions: dict[str, float],
    label_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Filter to the mixed corpus: each row kept iff its domain's
    deterministic Bernoulli accepts its key. Domains absent from
    ``fractions`` are dropped (explicit mixes only)."""
    return df.filter(_keeps_expr(fractions, label_col, key_col))


def mix_report(
    df: DataFrame,
    fractions: dict[str, float],
    label_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-domain mix accounting in ONE scan: total docs, sampled
    docs, and the realized rate — the audit table a mix job publishes
    next to its output."""
    keeps = _keeps_expr(fractions, label_col, key_col)
    return (
        df.groupBy(label_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(keeps, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        )
        .withColumn(
            "realized_rate",
            F.round(F.col("n_sampled") / F.col("n_docs"), 6),
        )
    )


def sample_exact_k(
    df: DataFrame, k: int, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic EXACT-k uniform sample: the k rows whose
    ``hash32(key)`` ranks lowest (key itself breaks hash ties).
    The fraction sampler above cannot promise an exact count; this
    is the distributed replacement for reservoir sampling when the
    count is the contract (eval subsets, human-review batches).

    Plan shape: orderBy+limit compiles to TakeOrderedAndProject —
    each partition keeps its local top-k (a k-row heap, one scan,
    no spill), and only num_partitions·k rows ever move. No full
    sort, no full shuffle, at any corpus size. Same determinism
    story as the Bernoulli sampler: any engine that can evaluate
    the 32-bit hash reproduces the identical sample."""
    key = F.col(key_col)
    return df.orderBy(hash32_expr(key), key).limit(k)


def stratified_exact_k(
    df: DataFrame,
    k: int,
    label_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic exact-k-PER-GROUP sample (quota sampling): for
    each domain, the k rows whose hash ranks lowest — "50 docs per
    language for the eval set" as one operator. Groups smaller than
    k keep everything.

    One shuffle keyed on the label; within each group the window
    scan is O(group) with a bounded rank cutoff. Skewed domains cost
    what they cost the corpus (the whole group shuffles to rank it)
    — for a head-heavy corpus, pre-filter the giant domains with
    ``keep_fraction_expr`` at ~10k/|domain| to cap the shuffle at
    ~10k rows per domain before exact ranking; the hash ordering
    makes the two-stage result identical to the one-stage one
    whenever the pre-filter keeps >= k rows."""
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.partitionBy(label_col).orderBy(
            hash32_expr(F.col(key_col)), F.col(key_col)
        )
    )
    return (
        df.withColumn("_rk", rank)
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_exact_k(
    df: DataFrame,
    k: int,
    weight_col: str | Column,
    key_col: str = "doc_id",
    quant: float = 1e6,
) -> DataFrame:
    """Deterministic weighted exact-k sample WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row draws u ∈ (0,1] from the
    hash of its key and ranks by u^(1/w) — equivalently ln(u)/w,
    larger is better — so a row's inclusion probability scales with
    its weight (quality score, token count, boost factor). The
    standard way to bias a training mix toward high-quality docs
    while keeping an exact count.

    The rank key is quantized (``floor(ln(u)/w · quant)``) before
    ordering so an independent engine reproduces the identical
    sample despite last-ULP libm differences; ties break on the key
    column. Plan shape: orderBy+limit = TakeOrderedAndProject — a
    k-row heap per partition, no full sort, no full shuffle.
    Rows with weight ≤ 0 or NULL are excluded (undefined draw)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (hash32_expr(key_col) + F.lit(1)) / F.lit(float(_MOD))
    qkey = F.floor(F.log(u) / w * F.lit(quant)).cast("bigint")
    return (
        df.filter(w > 0)
        .withColumn("_wk", qkey)
        .orderBy(F.desc("_wk"), F.col(key_col))
        .limit(k)
        .drop("_wk")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bucket_bits: int = 8,
) -> DataFrame:
    """Select documents per domain until a TOKEN budget is filled —
    training mixes are specified in tokens, not documents, so the
    doc-count samplers (``weighted_sample``/``stratified_exact_k``)
    don't compose a "30B code + 20B web" recipe; this does.

    Deterministic greedy: within each budgeted domain, docs are
    ordered by (hash32(id), id) — the same engine-reproducible rank
    the quota sampler uses — and taken while the RUNNING token total
    before the doc is under budget, so the selection overshoots by
    at most one document (the unbiased-prefix convention; trim or
    keep per trainer policy).

    Scale shape (two-phase, exact). A naive single window keyed on
    the domain serializes EACH domain's whole corpus through one
    task — parallelism = n_domains, the skewed-window scale-killer.
    Instead:

    1. One map-side-combined aggregation computes token sums per
       (domain, bucket) where bucket = the top ``n_bucket_bits`` of
       the doc hash — an n_domains·2^bits-row frame.
    2. A window over THAT frame (per-domain, ≤ 2^bits rows — bounded
       metadata scale, not corpus scale) derives each bucket's
       running token offset; buckets whose offset already reaches
       the budget are dropped, which is exactly the smallest
       covering prefix because the bucket is a hash PREFIX —
       ordering by (bucket, hash, id) IS ordering by (hash, id), so
       any doc the greedy selects lives in a kept bucket.
    3. The kept (domain, bucket, offset) frame broadcast-joins the
       corpus (pruning the dropped buckets in the same join), and a
       window partitioned by (domain, bucket) adds the in-bucket
       running total.

    Parallelism is therefore n_domains·2^bits and per-task work is
    O(budget / 2^bits) tokens regardless of domain skew; the result
    is bit-identical to the one-stage window (pytest pins the
    equivalence). Fully lazy — constructing the plan runs no jobs —
    at the cost of one extra linear scan when executed. Domains not
    in ``budgets`` are dropped."""
    from pyspark.sql import Window

    from .dedup import tokens_col

    doms = list(budgets)
    toks = F.size(tokens_col(text_col)).cast("bigint")
    h = hash32_expr(id_col)
    bucket = F.shiftright(h, 32 - n_bucket_bits).cast("int")
    budget_map = F.create_map(
        *[x for d in doms for x in (F.lit(d), F.lit(int(budgets[d])))]
    )

    base = (
        df.filter(F.col(domain_col).isin(doms))
        .withColumn("_nt", toks)
        .withColumn("_bk", bucket)
    )

    # Phases 1+2, in-plan: bucket token sums → per-domain running
    # offsets over the TINY aggregate frame → covering-prefix filter
    # (offset < budget ⟺ bucket ≤ the smallest covering cutoff).
    woff = (
        Window.partitionBy(domain_col)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy(domain_col, "_bk")
        .agg(F.sum("_nt").alias("_bt"))
        .withColumn(
            "_off", F.coalesce(F.sum("_bt").over(woff), F.lit(0))
        )
        .filter(F.col("_off") < budget_map[F.col(domain_col)])
        .select(domain_col, "_bk", "_off")
    )

    # Phase 3: broadcast-join the kept buckets (prunes the rest) and
    # add the in-bucket running total.
    w = (
        Window.partitionBy(domain_col, "_bk")
        .orderBy(h, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offsets), on=[domain_col, "_bk"], how="inner")
        .withColumn(
            "_before",
            F.col("_off") + F.coalesce(F.sum("_nt").over(w), F.lit(0)),
        )
        .filter(F.col("_before") < budget_map[F.col(domain_col)])
        .select(
            id_col,
            domain_col,
            F.col("_nt").alias("n_tokens"),
            F.col("_before").alias("tokens_before"),
        )
    )


def curriculum_stages(
    df: DataFrame,
    value_col: str,
    n_stages: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Length/difficulty curriculum staging: assign every row to one
    of ``n_stages`` quantile stages of the INTEGER ``value_col``
    (e.g. BPE sequence length), with all ties — rows sharing a value
    — landing in the same stage, so the assignment is deterministic
    regardless of partitioning and identical across engines (unlike
    NTILE, which splits ties by physical row order).

    stage(v) = (cum(v)·k − 1) div n, where cum(v) counts rows with
    value ≤ v — pure integer arithmetic, no float boundaries.

    Scale plan (no per-row window): the cumulative count runs over
    the per-DISTINCT-VALUE histogram, one row per distinct integer
    value — bounded by the value range, independent of corpus size
    (same order-statistic-on-integers method as
    scoring.percentile_filter_by_group and lm.perplexity_buckets).
    The value → stage map broadcasts back; assignment is a map-side
    broadcast join."""
    from pyspark.sql import Window

    # NULL values are excluded up front: they would otherwise count
    # into the cumulative histogram (NULLs sort first ascending),
    # skewing every real value's stage boundary, and then silently
    # vanish from the output via the equi-join anyway. Excluding
    # them makes the drop explicit AND keeps the boundaries correct.
    df = df.filter(F.col(value_col).isNotNull())
    hist = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    total = hist.agg(F.sum("_c").alias("_n"))
    staged = cum.crossJoin(F.broadcast(total)).select(
        value_col,
        F.expr(f"CAST((_cum * {int(n_stages)} - 1) DIV _n AS INT)").alias(
            "stage"
        ),
    )
    return df.join(F.broadcast(staged), value_col).select(
        id_col, value_col, "stage"
    )
