"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Per-query timing excludes session startup; each query is forced with
a count action so the full plan executes. O(n²) oracle-path queries
(all-pairs ngram/cosine) are excluded — their scalable LSH
counterparts are benched instead — as is the incremental-dedup
invariant gate (it re-signatures the corpus into a fresh temp band
store per call by design; the per-batch path it exercises is benched
via the shared-signature gates).

Each query is timed in TWO interleaved passes and the minimum is
reported: other JVMs share this box intermittently (driver probes),
and a contention window then inflates at most one pass of a query.

``SPARK_GRAFT_BENCH_MODE=exec`` switches to engine-only timing: the
logical plan is constructed OUTSIDE the timer and only the action
(count) is timed, isolating execution from driver-side plan
construction / analysis latency. Caveat: iterative operators
(connected components, PageRank, BPE training) legitimately run
Spark jobs eagerly while the plan is being built — in exec mode that
work escapes the timer, so their numbers are floor estimates and the
default ``wall`` mode remains the honest headline. The detail
artifact records per-query plan-construction seconds in both modes
(``plan_s``), so the split is visible without rerunning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q4_late_orders",
    # round-10: correlated EXISTS + per-customer window top-3 (linear)
    "exists_window_orders",
    "q10_returned_revenue",
    "q14_promo_share",
    "q18_large_orders",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_ship_delay",
    "q13_order_distribution",
    "q17_small_quantity",
    "q19_disjunctive",
    "q21_waiting_suppliers",
    "q22_global_sales",
    "window_lag_lead",
    "pivot_status_by_priority",
    "hof_array_embeddings",
    "q2_min_unit_price",
    "q11_important_values",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q20_chained_semi",
    "sample_hash_orders",
    "stratified_sample_orders",
    "histogram_totalprice",
    "string_agg_regions",
    "regexp_funcs_parts",
    "window_ntile_stats",
    "window_range_frame",
    "posexplode_part_words",
    "map_pivot_priorities",
    "weekly_gapfill_orders",
    "try_cast_events",
    "union_by_name_customers",
    "hof_exists_forall_docs",
    "fuzzy_levenshtein_parts",
    "paged_orders",
    "keyset_paged_orders",
    "agg_mode_bits",
    "join_outer_order_counts",
    "agg_distinct_per_flag",
    "rollup_orders",
    "window_rank_customers",
    "window_running_spend",
    "topk_orders",
    "json_extract_events",
    "events_tumbling_window",
    "events_hopping_window",
    "stream_windowed_counts",
    "stream_dedup_counts",
    "token_budget_mix_docs",
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "flatten_restructure",
    "math_funcs_lineitem",
    "percentile_orders",
    "stats_agg_lineitem",
    "scalar_subquery_small_orders",
    "sql_grouping_sets",
    "multimodal_features_docs",
    "dedup_exact_docs",
    "dedup_cluster_docs",
    "curation_pipeline_docs",
    "skew_salted_token_counts",
    "approx_quantile_orders",
    "snapshot_diff_orders",
    "dq_checks_orders",
    "dedup_simhash_pairs",
    "dedup_winnow_pairs",
    "decontam_docs",
    "text_pii_redact",
    "seq_packing_docs",
    "mix_sample_docs",
    "boilerplate_ngrams_docs",
    "events_session_window",
    "text_repetition_docs",
    "text_quality_docs",
    "text_langid_docs",
    "text_fingerprint_docs",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "embed_label_stats",
    "embed_centroids",
    "embed_label_spectrum",
    "agg_approx_distinct",
    "agg_minby_maxby",
    "array_agg_nations",
    "cond_exprs_customers",
    "conditional_agg_priorities",
    "cube_lineitem",
    "date_funcs_orders",
    "dedup_keep_first_docs",
    "events_rollup_day",
    "join_anti_customers",
    "join_null_safe_segments",
    "join_semi_suppliers",
    "partition_specs_orders",
    "setops_customers",
    "setops_intersect_except",
    "string_funcs_parts",
    "text_bpe_token_stats",
    "text_token_freq",
    "unpivot_lineitem_measures",
    # round-4 additions (all linear-scale paths; the span/bloom/bm25
    # gates run their full verification plans, not just the operator)
    "span_dedup_docs",
    "bloom_decontam_docs",
    "bm25_search_docs",
    "reservoir_sample_docs",
    "classifier_score_docs",
    "stratified_exact_docs",
    "lm_perplexity_docs",
    "text_entropy_docs",
    "agg_countmin_tokens",
    "dsir_resample_docs",
    "shard_manifest_docs",
    "gopher_filter_docs",
    "hard_negatives_vecs",
    "ccnet_buckets_docs",
    "drift_tokens_docs",
    "text_novelty_docs",
    "decontam_fuzzy_docs",
    "dataset_card_docs",
    "dedup_best_quality_docs",
    "hll_incremental_orders",
    "rp_project_vecs",
    "tfidf_keywords_docs",
    "sim_topk_rp",
    # round-5 additions
    "multimodal_decode_real",
    "dedup_paragraph_docs",
    "weighted_sample_docs",
    "leakage_split_docs",
    "text_diversity_docs",
    "text_zipf_docs",
    "chunk_docs_rag",
    "sim_topk_sq",
    "stream_sessionize_counts",
    "stream_interval_join_counts",
    "stream_enrich_counts",
    "pack_boundaries_docs",
    "text_pmi_docs",
    "source_overlap_docs",
    # round-6 additions (ccnet_buckets_docs_sf01 is excluded: it IS
    # ccnet_buckets_docs pinned to sf0.1 — the same plan this bench
    # already times at the bench SF)
    "quality_percentile_docs",
    "kn_bigram_model_docs",
    "doremi_weights_docs",
    "length_packing_docs",
    "triplet_mining_vecs",
    "cdc_chunks_docs",
    "purge_audit_docs",
    "span_clean_docs",
    # round-8 additions (the three *_sf01 twins are excluded like
    # ccnet_buckets_docs_sf01, and round 9's four sampled dedup twins
    # (minhash/cluster/simhash/winnow _sf01) likewise: each IS an
    # already-benched plan pinned to sf0.1; bpe_symbols_docs, bpe_doc_tokens_docs and
    # curriculum_stages_docs are excluded because each re-runs the
    # same training loop bpe_vocab_docs already times, plus one
    # vocab-bounded aggregate / broadcast
    # join). bpe_vocab_docs is the 8-iteration
    # tokenizer training loop — k+1 sequential jobs by design (each
    # merge is data-dependent), so its wall time is iteration fixed
    # cost at toy SF, not data volume.
    "bpe_vocab_docs",
    # linear centroid fold + per-row array fold: a real headline query
    "embed_silhouette_vecs",
    # chained user-keyed aggregates over shrinking survivor frames
    "events_funnel_users",
    # co-partitioned user-keyed aggregates + matrix-sized window
    "events_cohort_retention",
    # hash-embed + exact-integer Arrow local-top-k retrieval
    "rag_hash_retrieval_docs",
    # similarity-graph analytics: the exact kNN gate is O(n²) BY
    # CONTRACT over the bounded doc_id%5 sample (1M pairs at sf0.1,
    # expression-only) — the full-corpus path is the probed
    # knn_edges_lsh; PageRank/components iterate over the same cached
    # edge frame
    "knn_graph_docs",
    "pagerank_docs",
    "knn_components_docs",
    # two-arm hybrid retrieval + broadcast-sized RRF fusion
    "rrf_fusion_docs",
    # window-over-aggregate anomaly scoring + its streaming twin
    "events_anomaly_daily",
    "stream_anomaly_counts",
    # hash-driven node2vec-style walks: 3 chained joins on the kNN index
    "graph_walks_docs",
    # oriented wedge-close triangle counts, degree-bounded fan-out
    "knn_triangles_docs",
    # dbt-style expectation report: one pruned aggregate per check
    "data_quality_audit",
    # SCD2 dimension merge: current-slice join + semi/anti probes
    "scd2_customers",
    # k-anonymity class-size histogram: two shrinking aggregates
    "k_anonymity_customers",
    # materialized-view refresh: 3 batch states merged, fact never rescanned
    "incremental_agg_orders",
    # PQ/ADC ANN: encode + table-lookup shortlist + exact rerank
    "sim_topk_pq",
    # MRL prefix-truncation recall audit: 3 kernel passes + joins
    "matryoshka_recall_vecs",
    # RM3 pseudo-relevance feedback: two BM25 rounds on one index build
    "prf_expand_docs",
    # MMR diversified rerank: unrolled greedy over checkpointed frames
    "mmr_rerank_docs",
    # LSH-blocked kNN recall gate (the graph family's 100 TB path)
    "knn_graph_lsh_docs",
    # nearest-centroid classifier eval: grouped mean + broadcast score
    "embed_centroid_eval",
    # semantic_dedup_vecs is excluded: its gate verifies against the
    # exact all-pairs cosine oracle in-plan (O(n²) verification path)
    # stream_incremental_dedup_docs is excluded for the same reason
    # as dedup_incremental_docs: the gate re-plays the corpus into a
    # fresh band store + corpus sink per call by design; the
    # steady-state per-batch path it exercises is benched via the
    # shared-signature gates. Their round-10 *_sf01 sampled twins are
    # excluded for both reasons at once (pinned to sf0.1, fresh band
    # store per call). merge_upsert_orders and
    # drift_multibatch_pipeline are excluded for the same replay
    # reason: each bootstraps a fresh sink (and the drift gate a
    # fresh catalog db) per call by design — the steady-state write
    # path they exercise is the partitioned writer the layout tests
    # pin.
]


def main() -> None:
    # The driver parses stdout as JSON; round 1 recorded parsed=null
    # because JVM/py4j writes interleaved with the result line. Redirect
    # fd 1 to stderr for the whole run and keep a private dup of the
    # real stdout that ONLY the final JSON line is written to.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="bench")

    queries = entry.queries()

    # Warm the session once (codegen caches, file index, Python
    # workers) so per-query numbers reflect steady state, not
    # first-query JVM warmup.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    queries["q1_pricing_summary"](spark, sf_dir).count()

    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "wall")
    timings: dict[str, float] = {}
    plan_s: dict[str, float] = {}
    errors: dict[str, str] = {}
    for pass_no in range(2):
        for name in HEADLINE:
            if name in errors:
                continue  # failed on pass 0; don't re-raise on pass 1
            fn = queries[name]
            # wall mode: plan construction inside the timer — for most
            # queries it is driver-only and ~free, but iterative
            # operators (connected components) legitimately do work
            # eagerly, and that work is part of the honest cost.
            # exec mode: construction outside the timer (module
            # docstring caveats apply).
            try:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                n = df.count()
                t2 = time.perf_counter()
            except Exception as exc:  # noqa: BLE001 — per-query fault
                # isolation: one broken query must degrade the
                # artifact, not destroy it (round-2 lesson).
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                timings.pop(name, None)
                # drop any pass-0 plan time too: an errored query must
                # not appear in plan_s while absent from queries
                plan_s.pop(name, None)
                print(f"# pass{pass_no} {name}: ERROR {exc}", file=sys.stderr)
                continue
            elapsed = round((t2 - t1) if mode == "exec" else (t2 - t0), 4)
            build = round(t1 - t0, 4)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            plan_s[name] = min(plan_s.get(name, build), build)
            print(
                f"# pass{pass_no} {name}: {elapsed:.3f}s "
                f"(plan {build:.3f}s) rows={n}",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 4)
    spark.stop()  # before emitting JSON so no shutdown log can follow it

    # The driver captures only the LAST 2000 chars of stdout and
    # json-parses that tail: a full ~104-entry per-query dict is
    # ~3.5 KB, so rounds 1-3 all recorded parsed=null (the headline
    # total sat in the truncated-away prefix). Contract now: stdout
    # gets a compact summary (10 slowest queries only — bounded well
    # under 2000 chars); the FULL per-query map goes to
    # BENCH_DETAIL.json next to this script and to stderr.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    metric = (
        "headline_queries_total_exec"
        if mode == "exec"
        else "headline_queries_total_wall"
    )
    payload = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "n_errors": len(errors),
        "sf": sf,
        "queries": slowest,
    }
    detail = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": timings,
        "plan_s": plan_s,
        "errors": errors,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)

    line = json.dumps(payload)
    assert len(line) < 1900, f"stdout summary too long ({len(line)} chars)"
    os.write(real_stdout, (line + "\n").encode())
    os.close(real_stdout)


if __name__ == "__main__":
    main()
