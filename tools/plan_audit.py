"""Physical-plan audit over the whole queries() inventory.

For each query, capture ``explain(mode="formatted")`` and grade the
plan against the 100 TB posture rules:

* no ``CartesianProduct`` (an intentional 1-row cross join compiles
  to BroadcastNestedLoopJoin with a single-row side — allowed);
* no ``BatchEvalPython`` (row-at-a-time Python UDF) anywhere — Python
  stages must be Arrow-vectorized (``MapInPandas`` / ``ArrowEval`` /
  ``FlatMapGroupsInPandas``);
* parquet scans should carry ``PushedFilters`` whenever the query
  filters on a base column (reported, since some filters — e.g. on
  derived values — legitimately cannot push);
* report WholeStageCodegen span count and scan column width
  (ReadSchema) so projection pruning regressions are visible.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Prints one human line per query + a JSON summary tail; exit 1 on any
hard-rule violation.
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)

# Queries whose plans legitimately contain a Python (Arrow) stage.
ARROW_STAGE_OK = {
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_winnow_pairs",
    "dedup_ngram_pairs",
    "text_bpe_token_stats",
    "multimodal_features_docs",
    # real-codec fixture gate: same mapInPandas extract stage as
    # multimodal_features_docs, decode_stub="auto"
    "multimodal_decode_real",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_bruteforce",
    # project-shortlist-rerank: the stage-1 shortlist runs the Arrow
    # local-top-k kernel (r06 de-shuffle — no conditioned NLJ, no
    # q_id window over the N·Q frame; pinned by
    # tests/test_plans.py::test_ann_shortlists_have_no_nlj); the
    # other Arrow stage is the recall gate's exact truth side
    "sim_topk_rp",
    # SQ8 shortlist+rerank: same Arrow shortlist kernel over the
    # JVM-dequantized vectors + the recall-gate truth side
    "sim_topk_sq",
    # hard-negative mining: stage-1 label-masked Arrow local-top-k
    # candidates, JVM rounded-cosine rerank (r06 — replaced the
    # broadcast cross join + window over the N·Q scored frame)
    "hard_negatives_vecs",
    # triplet export: two labeled_topk passes (same reviewed Arrow
    # kernel + JVM rerank as hard_negatives_vecs)
    "triplet_mining_vecs",
    # JL projection: r06 Arrow int64-matmul kernel (exact-integer,
    # byte-identical to the old posexplode/pivot form; reviewed)
    "rp_project_vecs",
    "sim_neardup_exact",
    "embed_label_stats",
    "embed_label_spectrum",
    "events_sessionize",
    "seq_packing_docs",
    # same mapInPandas greedy-packing stage as seq_packing_docs,
    # consumed by the boundary-manifest aggregate
    "pack_boundaries_docs",
    # incremental band store: per-batch minhash signature Arrow pass
    # + pudf exact verify (reviewed — same stages as dedup_minhash)
    "dedup_incremental_docs",
    # streaming twin of the band-store dedup: the returned compare
    # plan embeds the one-shot minhash truth side (same reviewed
    # Arrow signature pass); the stream itself ran in foreachBatch
    "stream_incremental_dedup_docs",
    # exact cosine pair source (oracle path) feeding CC clustering
    "embed_cluster_vecs",
    # SemDeDup: cell-assignment pandas_udf + cosine pudf (within-cell
    # edges) + exact-pair verification, all Arrow-vectorized
    "semantic_dedup_vecs",
    # fuzzy decontamination: the banded minhash pipeline on the
    # corpus∪benchmark union (same Arrow signature pass + pudf
    # verify as dedup_minhash_pairs, reviewed)
    "decontam_fuzzy_docs",
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def audit_one(name: str, df) -> dict:
    plan = formatted_plan(df)
    # formatted mode shows each node in the tree AND a numbered
    # details section; count only the numbered detail entries.
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<(.*?)>", plan)
    return {
        "query": name,
        "cartesian": "CartesianProduct" in plan,
        "row_python": "BatchEvalPython" in plan,
        "arrow_python": bool(
            re.search(r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas", plan)
        ),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "n_scans": len(scans),
        "n_pushed": sum(1 for p in pushed if p.strip()),
        "scan_widths": [len(s.split(",")) if s else 0 for s in read_schemas],
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="plan_audit")
    results, violations = [], []
    for name, fn in sorted(entry.queries().items()):
        if only and name not in only:
            continue
        try:
            row = audit_one(name, fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - audit robustness
            print(f"{name:32s} PLAN-ERROR {exc}")
            violations.append(name)
            continue
        results.append(row)
        flags = []
        if row["cartesian"]:
            flags.append("CARTESIAN")
            violations.append(name)
        if row["row_python"]:
            flags.append("ROW-PYTHON")
            violations.append(name)
        if row["arrow_python"] and name not in ARROW_STAGE_OK:
            flags.append("UNEXPECTED-ARROW-STAGE")
            violations.append(name)
        width = max(row["scan_widths"], default=0)
        print(
            f"{name:32s} scans={row['n_scans']} pushed={row['n_pushed']} "
            f"codegen={row['codegen_spans']} max_scan_cols={width} "
            f"{' '.join(flags) or 'ok'}"
        )
    print(
        json.dumps(
            {
                "n_queries": len(results),
                "violations": sorted(set(violations)),
                "total_codegen_spans": sum(r["codegen_spans"] for r in results),
            }
        )
    )
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
