"""Scale probe: time representative heavy operators at 1× and N× the
sf0.1 fixtures (N-way union with remapped keys) on the same session,
and report the wall-clock growth ratio. Sub-linear-to-linear ratios
(≤ N) are the evidence that no operator hides super-linear work —
the local stand-in for the 100 TB scale-up question.

Key remapping keeps join/dedup semantics honest: ids stay unique
across copies, so dedup finds the cross-copy duplicate groups
(every doc gains N-1 identical siblings — which also exercises the
giant-bucket guard) and kNN sees a genuinely larger corpus.

Usage: python tools/scale_probe.py [sf_dir] [N] [case,case,...]
The optional third argument restricts the run to named cases — used
for the deep-scale (25×) datapoints on the bounded-pair-growth
operators, where running the whole suite would be wall-clock-bound.
Prints one JSON line: {"sf_dir": ..., "scale": N,
"ops": {op: {"t1": s, "tN": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    decontam as DC,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    dedup as D,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    packing as PK,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    governance as GV,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    bpe as BP,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    similarity as S,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    text as X,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    bloom as BL,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    temporal as TP,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    lm as LM,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    scoring as SC,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    search as SR,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    spans as SP,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    dsir as DS,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    sketch as SK,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    drift as DR,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    decontam as DC2,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    projection as PJ,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    mixing as MX,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    lm as LM2,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    similarity as S2,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    graph as GPH,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    scd as SCD,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)


def scaled(
    df,
    n: int,
    id_cols: list[str],
    salt_text_col: str | None = None,
    strides: dict[str, int] | None = None,
):
    """N-way union with ids offset per copy (keys stay unique).

    ``salt_text_col``: also suffix every token of that column with
    the replica index, so copies are NOT content-clones. The default
    all-clones remap is the adversarial corpus for dedup/LSH (every
    doc gains n-1 identical siblings — the giant-bucket worst case,
    kept as the stress probe); the salted remap is the REALISTIC
    100× corpus for bucket-entropy-sensitive operators (r10 verdict
    task #4): each replica carries its own vocabulary, so hashed-BoW
    vectors differ across copies and buckets fill at natural
    occupancy instead of concentrating clone armies.

    ``strides``: explicit per-column replica offsets. Needed when
    TWO frames joined on a foreign key are scaled together — both
    sides must shift by the SAME stride or the key stops resolving
    across replicas; the default per-frame max+1 derivation cannot
    guarantee that."""
    if n == 1:
        return df
    if strides is None:
        offset = df.agg(*[F.max(c) for c in id_cols]).collect()[0]
        strides = {
            c: (offset[j] or 0) + 1 for j, c in enumerate(id_cols)
        }
    parts = []
    for i in range(n):
        part = df
        for c in id_cols:
            part = part.withColumn(c, F.col(c) + F.lit(i * strides[c]))
        if salt_text_col is not None and i:
            part = part.withColumn(
                salt_text_col,
                F.regexp_replace(F.col(salt_text_col), r"(\w+)", f"$1{i}"),
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def _mmr_case(d):
    """The gate's MMR shape: BM25 candidate pool (the one linear
    corpus pass), all-pairs hashed-BoW cosine WITHIN the |Q|·topk
    pool, then 5 greedy rounds on checkpointed candidate frames."""
    queries = [("q1", "hash join"), ("q2", "slow scan filter")]
    cand = SR.bm25_topk(d, queries, topk=10).select(
        "query_id", "doc_id", F.col("score").alias("rel")
    )
    emb_d = SR.hashed_embeddings(d, dim=32)
    a = cand.select("query_id", F.col("doc_id").alias("id_a")).join(
        emb_d.select(
            F.col("doc_id").alias("id_a"), F.col("embedding").alias("_ea")
        ),
        "id_a",
    )
    b = cand.select("query_id", F.col("doc_id").alias("id_b")).join(
        emb_d.select(
            F.col("doc_id").alias("id_b"), F.col("embedding").alias("_eb")
        ),
        "id_b",
    )
    dot = GPH.int_dot(F.col("_ea"), F.col("_eb")).cast("double")
    na = GPH.int_dot(F.col("_ea"), F.col("_ea")).cast("double")
    nb = GPH.int_dot(F.col("_eb"), F.col("_eb")).cast("double")
    sims = (
        a.join(b, "query_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "query_id",
            "id_a",
            "id_b",
            (dot / F.sqrt(na.cast("double") * nb.cast("double"))).alias("sim"),
        )
    )
    return SR.mmr_rerank(cand, sims, k=5).count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="scale_probe")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")

    cases = {
        "q1_shape_agg": lambda d: d.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
        .collect(),
        "minhash_lsh_pairs": lambda d: D.minhash_lsh_dedup(
            d, bands=32, threshold=0.5
        ).count(),
        "dedup_clusters": lambda d: D.connected_components(
            D.minhash_lsh_dedup(d, bands=32, threshold=0.5)
        ).count(),
        "winnow_fingerprints": lambda d: X.winnow_fingerprints(d).count(),
        "brute_force_knn": lambda d: S.brute_force_topk(
            d, query_ids=list(range(10)), k=5
        ).count(),
        "decontam_overlap": lambda d: DC.ngram_overlap(
            d.filter(F.col("doc_id") % 10 != 0),
            d.filter(F.col("doc_id") % 10 == 0),
            n=8,
            hashed=True,
        ).count(),
        "seq_packing": lambda d: PK.pack_sequences(d, max_tokens=256).count(),
        "span_dedup": lambda d: SP.span_dedup_stats(
            d, w=8, hashed=True
        ).count(),
        "bloom_semi_join": lambda d: BL.bloom_semi_join(
            d.filter(F.col("doc_id") % 10 != 0).select(
                "doc_id",
                F.explode(
                    D.shingles_col(D.tokens_col("text"), 8)
                ).alias("shingle"),
            ),
            d.filter(F.col("doc_id") % 10 == 0).select(
                F.explode(
                    D.shingles_col(D.tokens_col("text"), 8)
                ).alias("shingle")
            ),
            "shingle",
            1 << 18,
        ).count(),
        "bm25_topk": lambda d: SR.bm25_topk(
            d, [("q1", "hash join"), ("q2", "slow scan filter")], topk=5
        ).count(),
        "classifier_score": lambda d: SC.score_documents(
            d, SC.synthetic_weights(d.sparkSession, 4096), 4096
        ).count(),
        "lm_perplexity": lambda d: LM.perplexity_scores(d).count(),
        "text_entropy": lambda d: X.entropy_scores(d).count(),
        "countmin_hh": lambda d: SK.heavy_hitters(d, top_k=20).count(),
        "dsir_sample": lambda d: DS.dsir_sample(
            d, F.col("lang") == "en", k=50
        ).count(),
        "shard_manifest": lambda d: PK.shard_manifest(d, 16).count(),
        "gopher_filter": lambda d: X.gopher_filter(d).count(),
        "ccnet_buckets": lambda d: LM2.perplexity_buckets(d, 3).count(),
        "drift_tokens": lambda d: DR.token_divergence(
            d.filter(F.col("lang") == "en"),
            d.filter(F.col("lang") != "en"),
        ).count(),
        "hard_negatives": lambda e: S2.hard_negative_topk(
            e, query_ids=list(range(10)), k=3
        ).count(),
        "text_novelty": lambda d: X.novelty_scores(d).count(),
        "dataset_card": lambda d: X.dataset_card(d).count(),
        "tfidf_keywords": lambda d: SR.tfidf_keywords(d, topk=5).count(),
        "fuzzy_decontam": lambda d: DC2.fuzzy_decontam(
            d.filter(F.col("doc_id") % 10 != 0),
            d.filter(F.col("doc_id") % 10 == 0),
            threshold=0.5,
        ).count(),
        "rp_project": lambda e: PJ.rp_project(e, 64, 16).count(),
        "hll_incremental": lambda d: SK.hll_incremental_distinct(
            d, "lang", "source", F.col("doc_id") % 4
        ).count(),
        "token_budget_mix": lambda d: MX.token_budget_sample(
            d, {"en": 5000, "fr": 2000, "zh": 1500}
        ).count(),
        "paragraph_dedup": lambda d: D.paragraph_dedup(
            d, chunk_tokens=16
        ).count(),
        "weighted_sample": lambda d: MX.weighted_exact_k(
            d, 50, F.length("text")
        ).count(),
        "leakage_split": lambda d: D.leakage_safe_split(
            d,
            D.minhash_lsh_dedup(d, bands=32, threshold=0.5),
        ).count(),
        "diversity_report": lambda d: X.diversity_report(d).count(),
        "zipf_slope": lambda d: X.zipf_slope(d).count(),
        "chunk_rag": lambda d: PK.chunk_documents(
            d, chunk_size=64, stride=48
        ).count(),
        "quality_percentile": lambda d: SC.percentile_filter_by_group(
            SC.score_documents(d, SC.synthetic_weights(d.sparkSession, 4096), 4096)
            .join(d.select("doc_id", "source"), "doc_id"),
        ).count(),
        "kn_bigrams": lambda d: LM.kneser_ney_bigrams(d).count(),
        "doremi_weights": lambda d: LM.doremi_domain_weights(d).count(),
        "length_packing": lambda d: PK.length_packing_report(d).count(),
        "triplet_mining": lambda e: S2.triplet_mining(
            e, query_ids=list(range(10))
        ).count(),
        "cdc_chunks": lambda d: PK.cdc_chunk_stats(d).count(),
        "gear_cdc": lambda d: PK.gear_cdc_chunk_stats(d).count(),
        "span_clean": lambda d: SP.remove_duplicate_spans(d).count(),
        # tokenizer training: data-dependent merge iterations on the
        # word-TYPE frame — growth tracks vocabulary, not corpus
        # (BASELINE.md records this k=5 case; a duplicate n_merges=8
        # literal used to shadow-define this key and never ran)
        "bpe_train": lambda d: len(BP.bpe_train(d, n_merges=5)),
        "purge_audit": lambda d: GV.purge_audit(
            d, list(range(0, 10000, 97))
        ).count(),
        "label_silhouette": lambda e: S.label_silhouette(e).count(),
        "funnel_3step": lambda e: TP.funnel(
            e, ["view", "click", "purchase"], max_gap_s=86_400
        ).count(),
        "cohort_retention": lambda e: TP.cohort_retention(
            e, granularity="day"
        ).count(),
        # full-corpus approximate kNN graph: hashed-BoW embed +
        # multi-table LSH blocking + bucket-local exact rerank —
        # adaptive plane count keeps bucket occupancy constant
        "knn_graph_lsh": lambda d: GPH.knn_edges_lsh(
            SR.hashed_embeddings(d, dim=32),
            k=5,
            id_col="doc_id",
            vec_col="embedding",
        ).count(),
        # same operator on the SALTED remap (replica-suffixed tokens
        # → no cross-copy clones): separates multi-probe cost on a
        # realistic-entropy corpus from the all-clones pathology the
        # unsalted case deliberately keeps
        "knn_graph_lsh_salted": lambda d: GPH.knn_edges_lsh(
            SR.hashed_embeddings(d, dim=32),
            k=5,
            id_col="doc_id",
            vec_col="embedding",
        ).count(),
        # PageRank over the symmetrized near-duplicate pair graph
        # (the curation signal); growth = pair growth (bounded by the
        # banded LSH) + linear join/agg per iteration
        "pagerank_neardup": lambda d: GPH.pagerank(
            (lambda p: p.union(p.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst"))))(
                D.minhash_lsh_dedup(d, bands=32, threshold=0.5).select(
                    F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                )
            ),
            n_iter=4,
        ).count(),
        # PQ/ADC ANN: encode pass + m-lookup scoring scan, both linear
        "sim_pq": lambda e: PJ.pq_topk(
            e, query_ids=list(range(10)), k=5
        ).count(),
        # hybrid RRF retrieval: BM25 arm + hashed-vector Arrow arm,
        # broadcast-sized fusion join
        "rrf_fusion": lambda d: SR.hybrid_rrf_topk(
            d, [("q1", "hash join"), ("q2", "slow scan filter")], topk=5
        ).count(),
        # pseudo-relevance feedback: two BM25 rounds over ONE shared
        # tf/df index; the feedback frame entering round two is
        # |Q|·fb_terms broadcast-sized, so growth should track the
        # single linear index pass
        "prf_expand": lambda d: SR.prf_expand_topk(
            d,
            [("q1", "hash join"), ("q2", "slow scan filter")],
            topk=5,
            fb_docs=3,
            fb_terms=4,
        ).count(),
        # MMR diversified rerank: one linear BM25 pass to the
        # candidate pool, then k greedy rounds over checkpointed
        # |Q|·topk frames — candidate-bounded after the pool build
        "mmr_rerank": lambda d: _mmr_case(d),
        # backward as-of join: union + one windowed last-ignorenulls,
        # a single shuffle on (user) — textbook linear
        "asof_join": lambda e: TP.asof_join(
            e.filter(F.col("event_type") == "click").select(
                "event_id", "user_id", "ts"
            ),
            e.filter(F.col("event_type") == "view").select(
                "user_id",
                "ts",
                F.col("event_id").alias("view_id"),
                "value",
            ),
            on=["user_id"],
            right_payload=["view_id", "value"],
        ).count(),
        # SCD2 merge: joins only the current slice against the
        # update batch (three semi/anti joins + unions), linear in
        # dimension + batch
        "scd2_merge": lambda c: SCD.scd2_merge(
            SCD.scd2_init(
                c.select(
                    F.col("c_custkey").alias("key"),
                    F.col("c_mktsegment").alias("segment"),
                    F.col("c_acctbal").alias("acctbal"),
                ),
                "key",
                ["segment", "acctbal"],
                "2024-01-01",
            ),
            c.filter(F.col("c_custkey") % 10 == 0).select(
                F.col("c_custkey").alias("key"),
                F.col("c_mktsegment").alias("segment"),
                (F.col("c_acctbal") + F.lit(100.0)).alias("acctbal"),
            ),
            "key",
            ["segment", "acctbal"],
            "2024-02-01",
        ).count(),
    }
    inputs = {
        "lm_perplexity": (docs, ["doc_id"]),
        "text_entropy": (docs, ["doc_id"]),
        "countmin_hh": (docs, ["doc_id"]),
        "dsir_sample": (docs, ["doc_id"]),
        "shard_manifest": (docs, ["doc_id"]),
        "gopher_filter": (docs, ["doc_id"]),
        "ccnet_buckets": (docs, ["doc_id"]),
        "drift_tokens": (docs, ["doc_id"]),
        "hard_negatives": (emb, ["vec_id"]),
        "text_novelty": (docs, ["doc_id"]),
        "dataset_card": (docs, ["doc_id"]),
        "tfidf_keywords": (docs, ["doc_id"]),
        "fuzzy_decontam": (docs, ["doc_id"]),
        "rp_project": (emb, ["vec_id"]),
        "hll_incremental": (docs, ["doc_id"]),
        "token_budget_mix": (docs, ["doc_id"]),
        "span_dedup": (docs, ["doc_id"]),
        "bloom_semi_join": (docs, ["doc_id"]),
        "bm25_topk": (docs, ["doc_id"]),
        "classifier_score": (docs, ["doc_id"]),
        "q1_shape_agg": (li, ["l_orderkey"]),
        "minhash_lsh_pairs": (docs, ["doc_id"]),
        "dedup_clusters": (docs, ["doc_id"]),
        "winnow_fingerprints": (docs, ["doc_id"]),
        "bpe_train": (docs, ["doc_id"]),
        "brute_force_knn": (emb, ["vec_id"]),
        "decontam_overlap": (docs, ["doc_id"]),
        "seq_packing": (docs, ["doc_id"]),
        "paragraph_dedup": (docs, ["doc_id"]),
        "weighted_sample": (docs, ["doc_id"]),
        "leakage_split": (docs, ["doc_id"]),
        "diversity_report": (docs, ["doc_id"]),
        "zipf_slope": (docs, ["doc_id"]),
        "chunk_rag": (docs, ["doc_id"]),
        "quality_percentile": (docs, ["doc_id"]),
        "kn_bigrams": (docs, ["doc_id"]),
        "doremi_weights": (docs, ["doc_id"]),
        "length_packing": (docs, ["doc_id"]),
        "triplet_mining": (emb, ["vec_id"]),
        "cdc_chunks": (docs, ["doc_id"]),
        "gear_cdc": (docs, ["doc_id"]),
        "span_clean": (docs, ["doc_id"]),
        "purge_audit": (docs, ["doc_id"]),
        "label_silhouette": (emb, ["vec_id"]),
        "funnel_3step": (ev, ["user_id", "event_id"]),
        "cohort_retention": (ev, ["user_id", "event_id"]),
        "knn_graph_lsh": (docs, ["doc_id"]),
        "knn_graph_lsh_salted": (docs, ["doc_id"]),
        "sim_pq": (emb, ["vec_id"]),
        "pagerank_neardup": (docs, ["doc_id"]),
        "rrf_fusion": (docs, ["doc_id"]),
        "prf_expand": (docs, ["doc_id"]),
        "mmr_rerank": (docs, ["doc_id"]),
        "asof_join": (ev, ["user_id", "event_id"]),
        "scd2_merge": (cu, ["c_custkey"]),
    }

    # Round-3 operators with lifecycle state (a band store / a
    # persisted index) get bespoke harnesses: the timed portion is
    # the steady-state per-batch / per-probe path — the thing that
    # repeats at 100 TB — with the build done once outside the timer.
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="scale_probe_")

    def incremental_batch(d, tag: str):
        """Arrow pass over ONLY the 10% new batch; store access is a
        bucket semi-join. Ratio tracks batch+matching-bucket size.
        ``old_docs`` is REQUIRED against a populated store (the
        operator now raises otherwise) — and without it this probe
        was silently timing the batch-only fallback, never touching
        the store it claimed to measure."""
        store = f"{work}/bands_{tag}"
        old = d.filter(F.col("doc_id") % 10 != 0).localCheckpoint(
            eager=True
        )
        new = d.filter(F.col("doc_id") % 10 == 0)
        D.incremental_minhash_dedup(
            old, store, old_docs=None, update_store=True
        ).count()  # seed the store (untimed by caller's warm call)
        return lambda: D.incremental_minhash_dedup(
            new, store, old_docs=old, update_store=False
        ).count()

    def index_probe(e, tag: str):
        """Probe the persisted LSH index; the einsum build pass is
        paid once at build, probes touch matching buckets only."""
        path = f"{work}/lsh_{tag}"
        S.lsh_index_write(e, path)
        return lambda: S.lsh_topk_from_index(
            e.sparkSession, path, e, query_ids=list(range(10)), k=5
        ).count()

    def lm_model_probe(d, tag: str):
        """Score a 10% batch under a STORED model; training paid
        once at save. Ratio tracks the batch-side scan only."""
        path = f"{work}/lm_{tag}"
        LM.save_bigram_model(d.filter(F.col("doc_id") % 10 != 0), path)
        batch = d.filter(F.col("doc_id") % 10 == 0).localCheckpoint()
        return lambda: LM.perplexity_with_model(batch, path).count()

    def embed_cluster(e):
        return D.connected_components(
            S.cosine_near_dup_pairs(e, threshold=0.9)
        ).count()

    cases["embed_cluster"] = embed_cluster
    inputs["embed_cluster"] = (emb, ["vec_id"])

    _stateful_names = {
        "incremental_dedup_batch",
        "lsh_index_probe",
        "lm_stored_model_score",
        "exists_window",
        "merge_upsert",
    }
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if only:
        unknown = only - set(cases) - _stateful_names
        if unknown:
            raise SystemExit(f"unknown cases: {sorted(unknown)}")
        cases = {k: v for k, v in cases.items() if k in only}

    _salt_text = {"knn_graph_lsh_salted"}
    ops = {}
    for name, fn in cases.items():
        base, id_cols = inputs[name]
        salt = "text" if name in _salt_text else None
        big = scaled(base, n, id_cols, salt_text_col=salt).localCheckpoint(
            eager=True
        )
        one = scaled(base, 1, id_cols).localCheckpoint(eager=True)
        # Warm the case once (python-worker startup, codegen) so the
        # timed ratio compares operator cost, not cold-start — a cold
        # first call can be 5-40x its steady state and flips the
        # ratio meaningless.
        fn(one)
        t1 = timed(lambda: fn(one))
        tn = timed(lambda: fn(big))
        ops[name] = {"t1": t1, "tN": tn, "ratio": round(tn / t1, 2) if t1 else None}
        print(f"{name:22} 1x={t1:7.2f}s {n}x={tn:7.2f}s ratio={ops[name]['ratio']}",
              file=sys.stderr)

    # stateful cases: build (store/index) once per size outside the
    # timer; time only the repeating per-batch / per-probe path
    stateful = {
        "incremental_dedup_batch": (docs, ["doc_id"], incremental_batch),
        "lsh_index_probe": (emb, ["vec_id"], index_probe),
        "lm_stored_model_score": (docs, ["doc_id"], lm_model_probe),
    }
    if only:
        stateful = {k: v for k, v in stateful.items() if k in only}
    for name, (base, id_cols, build) in stateful.items():
        one = scaled(base, 1, id_cols).localCheckpoint(eager=True)
        big = scaled(base, n, id_cols).localCheckpoint(eager=True)
        f1 = build(one, f"{name}_1")
        fn_big = build(big, f"{name}_N")
        f1()
        fn_big()
        t1 = timed(f1)
        tn = timed(fn_big)
        ops[name] = {"t1": t1, "tN": tn, "ratio": round(tn / t1, 2) if t1 else None}
        print(f"{name:22} 1x={t1:7.2f}s {n}x={tn:7.2f}s ratio={ops[name]['ratio']}",
              file=sys.stderr)

    # Joint-input cases (round-10 gates): the foreign key must stay
    # coherent across replicas, so BOTH tables are offset-scaled with
    # a SHARED per-key stride (scaled()'s explicit ``strides``).
    # Customers are remapped too: growth models MORE customers at
    # constant per-customer order density — the realistic 100 TB
    # shape — so window partitions stay constant-sized and the
    # expected growth is the linear shuffle, not a per-partition
    # sort. All setup (orders read, stride jobs) is skipped when the
    # case filter excludes both joint cases.
    joint_names = ["exists_window", "merge_upsert"]
    run_joint = [nm for nm in joint_names if only is None or nm in only]
    if run_joint:
        from pyspark.sql import Window

        from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.sources import (
            writers as W,
        )

        od = spark.read.parquet(f"{sf_dir}/orders.parquet")
        mx = od.agg(F.max("o_orderkey"), F.max("o_custkey")).collect()[0]
        ok_stride, ck_stride = (mx[0] or 0) + 1, (mx[1] or 0) + 1

    def exists_window_build(m: int):
        """The r10 `exists_window_orders` gate shape: conditioned
        left-semi (orders with a >60-day-late line) + per-customer
        ROW_NUMBER top-3. Both stages shuffle on a key (orderkey,
        then custkey) — textbook linear. Both sizes eagerly
        checkpointed so 1× and N× time the same storage path."""
        o_s = scaled(
            od.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
            ),
            m,
            ["o_orderkey", "o_custkey"],
            strides={"o_orderkey": ok_stride, "o_custkey": ck_stride},
        ).localCheckpoint(eager=True)
        l_s = scaled(
            li.select("l_orderkey", "l_shipdate"),
            m,
            ["l_orderkey"],
            strides={"l_orderkey": ok_stride},
        ).localCheckpoint(eager=True)

        def run():
            late = o_s.join(
                l_s,
                (o_s.o_orderkey == l_s.l_orderkey)
                & (
                    l_s.l_shipdate
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                ),
                "left_semi",
            )
            w = Window.partitionBy("o_custkey").orderBy(
                F.col("o_totalprice").desc(), F.col("o_orderkey")
            )
            return (
                late.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= 3)
                .count()
            )

        return run

    def merge_upsert_build(m: int):
        """The r10 `merge_upsert_orders` gate shape: bootstrap a
        priority-partitioned sink once per size (untimed), then time
        the MERGE path — anti-join of the 2 touched partitions
        against the batch keys + dynamic partition overwrite. Growth
        tracks the touched-partition rewrite, linear in rows."""
        proj = od.select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
        o_s = scaled(
            proj,
            m,
            ["o_orderkey"],
            strides={"o_orderkey": ok_stride},
        ).localCheckpoint(eager=True)
        sink = f"{work}/merge_{m}/sink"
        o_s.write.partitionBy("o_orderpriority").parquet(sink)
        hot = F.col("o_orderpriority").isin("1-URGENT", "3-MEDIUM")
        batch = o_s.filter((F.col("o_orderkey") % 97 == 0) & hot)
        updates = batch.withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
        ).unionByName(
            batch.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000_000)
            )
        ).localCheckpoint(eager=True)

        deletes = o_s.filter(
            (F.col("o_orderkey") % 89 == 0) & hot
        ).select("o_orderkey", "o_orderpriority").localCheckpoint(eager=True)

        def run():
            # all three MERGE arms, the r11 gate shape: update %97,
            # insert shifted copy, delete %89 (delete-wins overlap)
            W.merge_upsert(
                spark,
                sink,
                updates,
                key_cols=["o_orderkey"],
                partition_cols=["o_orderpriority"],
                deletes=deletes,
            )
            return spark.read.parquet(sink).count()

        return run

    joint = {
        "exists_window": exists_window_build,
        "merge_upsert": merge_upsert_build,
    }
    joint = {k: v for k, v in joint.items() if k in run_joint}
    for name, build in joint.items():
        f1 = build(1)
        fn_big = build(n)
        f1()  # warm both sizes (codegen, partition discovery)
        fn_big()
        t1 = timed(f1)
        tn = timed(fn_big)
        ops[name] = {"t1": t1, "tN": tn, "ratio": round(tn / t1, 2) if t1 else None}
        print(f"{name:22} 1x={t1:7.2f}s {n}x={tn:7.2f}s ratio={ops[name]['ratio']}",
              file=sys.stderr)

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "scale": n, "ops": ops}))


if __name__ == "__main__":
    main()
