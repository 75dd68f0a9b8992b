"""DSIR — Data Selection via Importance Resampling (Xie et al.
2023, arXiv:2302.03169) — LLM-data-pipeline extension. Where
``operators/scoring.py`` ranks documents with a trained classifier
and ``operators/mixing.py`` reweights whole domains, DSIR selects
raw documents whose *hashed n-gram distribution* looks like a
trusted target corpus: the published recipe behind
"select web pages that look like Wikipedia/books".

Pipeline (all JVM built-ins, three linear aggregates + one join):

1. Features: unigrams + bigrams, hashed into D buckets (md5 —
   engine-portable, same idiom as ``scoring.feature_bucket``).
2. Two bag-of-words models: bucket counts over the TARGET docs and
   over the RAW corpus, add-1 smoothed:
       p(b) = (c_t(b)+1) / (N_t+D),   q(b) = (c_r(b)+1) / (N_r+D)
3. Per-doc log importance weight  log w = Σ_features log p(b)/q(b),
   with each per-bucket log-ratio quantized to an exact 1e-6
   integer so the doc sum is partitioning-invariant and
   engine-reproducible.
4. Gumbel top-k resampling — sampling k docs WITHOUT replacement
   with probability ∝ w is exactly "top-k by log w + Gumbel noise";
   the noise is derandomized from the doc key
   (u = (hash32(doc_id)+0.5)/2³², g = −ln(−ln u)) so the selected
   set is identical on every engine and every run.

At 100 TB: the two models are D-bucket frames (D ~ 1-4M — a few
MB, broadcast), the feature stream aggregates map-side, and the
final selection is one TakeOrderedAndProject — no shuffle of the
corpus beyond the per-doc weight aggregate, which is keyed on the
doc id the corpus is already partitioned by. Reference behavior
(quality scoring stage) per SURVEY.md §2 M4; no counterpart in the
reference repo — charter extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import tokens_col
from .mixing import hash32_expr
from .scoring import feature_bucket

_Q = 1_000_000.0
_MOD = 2**32


def _features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, bucketable feature string, *extra) stream: unigrams
    plus space-joined bigrams, built as ONE concatenated array and
    ONE explode — a union of two explode branches would scan the
    corpus twice (each branch is its own FileScan; plan-verified).
    ``extra`` columns of ``df`` are carried through — the zero-join
    way to keep per-doc flags attached to the feature rows."""
    toks = tokens_col(text_col)
    size = F.size(toks)
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(size - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(size - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(toks, bi)).alias("f"),
        *extra,
    ).filter(F.col("f") != "")


def bucket_counts(
    df: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed bag-of-ngrams model: (bucket, c) counts over the given
    docs — one map-side-combined aggregate, ≤ n_buckets rows out."""
    return (
        _features(df, text_col, id_col)
        .select(feature_bucket(F.col("f"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def importance_weights(
    df: DataFrame,
    target: DataFrame | Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc quantized log importance weight under target/raw
    hashed-ngram models. Returns (doc_id, n_feats, logw) where
    ``logw`` is the exact-integer Σ round(ln(p/q)·1e6) — divide by
    1e6 for nats. Docs with no features get logw = 0.

    ``target`` is either a separate DataFrame (external trusted
    corpus — two model-building scans) or a boolean Column over
    ``df`` (target ⊆ corpus, the common "docs that look like X"
    case — both models then build in ONE corpus scan via a
    conditional count, saving a full feature pass)."""
    qlr_expr = F.round(
        (
            F.log(
                (F.col("ct") + F.lit(1.0))
                / (F.col("nt") + F.lit(float(n_buckets)))
            )
            - F.log(
                (F.col("cr") + F.lit(1.0))
                / (F.col("nr") + F.lit(float(n_buckets)))
            )
        )
        * F.lit(_Q)
    ).cast("bigint")
    if isinstance(target, Column):
        from pyspark.sql import Window

        # ONE corpus feature pass for model AND weights (r14
        # optimization round, guide §1.2/§2.3): the Column-target
        # path used to tokenize + md5-bucket the corpus TWICE — once
        # for the bucket models, once for the per-doc weight stream.
        # Both consumers only need the (doc, bucket) multiplicity,
        # so aggregate the feature stream to per-(doc, bucket)
        # counts ONCE, checkpoint that frame (eager — the r14
        # chained-lazy lesson), and derive the model (Σ over docs)
        # and the weights (Σ c·qlr over buckets) from it. Exact
        # integer counts, so every downstream value is bit-identical:
        # cr = Σ_c, ct = Σ_c over target docs, n_feats = Σ_c,
        # logw = Σ c·qlr ≡ Σ_features qlr. At 100 TB the pinned
        # frame is the hashed doc-term matrix (≤ min(n_feats, D)
        # rows per doc — the representation a DSIR deployment
        # persists as its reusable artifact); recomputing it instead
        # costs a full second tokenize + md5 pass over the corpus.
        db = (
            _features(
                df.withColumn("_tgt", target), text_col, id_col,
                extra=("_tgt",),
            )
            .select(
                "doc_id",
                feature_bucket(F.col("f"), n_buckets).alias("bucket"),
                "_tgt",
            )
            .groupBy("doc_id", "bucket", "_tgt")
            .agg(F.count(F.lit(1)).alias("_c"))
            .localCheckpoint()
        )
        counts = db.groupBy("bucket").agg(
            F.sum("_c").alias("cr"),
            F.sum(
                F.when(F.col("_tgt"), F.col("_c")).otherwise(F.lit(0))
            ).alias("ct"),
        )
        # Totals via an unpartitioned window over the bucket frame
        # (≤ n_buckets rows — the single-partition window is bounded
        # by D, not the corpus) so the model builds in ONE corpus
        # scan: no self-join, no re-aggregated second scan.
        wall = Window.partitionBy()
        ratio = (
            counts.withColumn("nr", F.sum("cr").over(wall))
            .withColumn("nt", F.sum("ct").over(wall))
            .select("bucket", qlr_expr.alias("qlr"))
        )
        per_doc = (
            db.join(F.broadcast(ratio), ["bucket"])
            .groupBy("doc_id")
            .agg(
                F.sum("_c").alias("n_feats"),
                F.sum(F.col("_c") * F.col("qlr")).alias("logw"),
            )
        )
        return (
            df.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, ["doc_id"], "left")
            .select(
                "doc_id",
                F.coalesce(F.col("n_feats"), F.lit(0))
                .cast("bigint")
                .alias("n_feats"),
                F.coalesce(F.col("logw"), F.lit(0))
                .cast("bigint")
                .alias("logw"),
            )
        )
    else:
        tc = bucket_counts(target, n_buckets, text_col, id_col).withColumnRenamed(
            "c", "ct"
        )
        rc = bucket_counts(df, n_buckets, text_col, id_col).withColumnRenamed(
            "c", "cr"
        )
        nt = tc.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
        nr = rc.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"))
        # Per-bucket quantized log-ratio table: ≤ n_buckets rows,
        # built once, broadcast to the feature stream.
        ratio = (
            rc.join(tc, ["bucket"], "outer")
            .crossJoin(F.broadcast(nt))
            .crossJoin(F.broadcast(nr))
            .select(
                "bucket",
                F.coalesce("cr", F.lit(0)).alias("cr"),
                F.coalesce("ct", F.lit(0)).alias("ct"),
                "nt",
                "nr",
            )
            .select("bucket", qlr_expr.alias("qlr"))
        )
    feats = _features(df, text_col, id_col).select(
        "doc_id", feature_bucket(F.col("f"), n_buckets).alias("bucket")
    )
    per_doc = (
        feats.join(F.broadcast(ratio), ["bucket"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("qlr").alias("logw"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, ["doc_id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0))
            .cast("bigint")
            .alias("n_feats"),
            F.coalesce(F.col("logw"), F.lit(0))
            .cast("bigint")
            .alias("logw"),
        )
    )


def gumbel_key(id_col: str | Column, logw_q: Column) -> Column:
    """Deterministic Gumbel-max key: logw + g(doc_id), rounded to
    1e-6 so cross-engine ordering has no float-tie ambiguity. u is
    strictly inside (0,1) by the +0.5 offset, so both logs are
    finite."""
    u = (hash32_expr(id_col) + F.lit(0.5)) / F.lit(float(_MOD))
    g = -F.log(-F.log(u))
    return F.round(logw_q / F.lit(_Q) + g, 6)


def dsir_sample(
    df: DataFrame,
    target: DataFrame | Column,
    k: int,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select k docs without replacement with probability ∝ their
    importance weight (Gumbel top-k). Output (doc_id, n_feats,
    logw, key) ordered by (key desc, doc_id) — fully deterministic:
    rerunning, repartitioning, or rebuilding on another engine
    yields the same k documents in the same order."""
    w = importance_weights(df, target, n_buckets, text_col, id_col)
    return (
        w.withColumn("key", gumbel_key("doc_id", F.col("logw")))
        .orderBy(F.desc("key"), "doc_id")
        .limit(k)
    )
