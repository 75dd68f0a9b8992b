"""Round-4 operators: span dedup, bloom semi-join, BM25, exact-k
sample — unit semantics the sf-oracle gates don't pin."""

import math

import pytest
from pyspark.sql import functions as F

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    bloom as BL,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    mixing as MX,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    search as SR,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    spans as SP,
)


# ------------------------------------------------------------- spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicate_spans_finds_shared_run(spark):
    # docs 1 and 2 share an 10-token run; w=4 windows inside it are
    # duplicated; each doc gets ONE maximal span covering the run.
    shared = "a b c d e f g h i j"
    d = _docs(
        spark,
        [
            (1, f"x1 y1 {shared} z1"),
            (2, f"{shared} q1 r1 s1"),
            (3, "totally different words here only once seen"),
        ],
    )
    spans = SP.duplicate_spans(d, w=4).collect()
    by_doc = {r.doc_id: r for r in spans}
    assert set(by_doc) == {1, 2}
    # doc 1: run starts at token 2, 7 windows (pos 2..8), span = 10
    assert by_doc[1].start == 2 and by_doc[1].span_tokens == 10
    # doc 2: run starts at 0
    assert by_doc[2].start == 0 and by_doc[2].span_tokens == 10
    stats = SP.span_dedup_stats(d, w=4)
    got = {r.doc_id: r for r in stats.collect()}
    assert got[3].n_spans == 0 and got[3].dup_tokens == 0
    assert got[1].dup_tokens == 10
    assert got[1].dup_frac == pytest.approx(10 / 13, abs=1e-6)


def test_duplicate_spans_within_single_doc(spark):
    # A doc repeating its own phrase is duplication too (suffix-array
    # semantics): both occurrences become spans.
    d = _docs(
        spark,
        [(1, "p q r s t u0 u1 u2 u3 u4 u5 p q r s t")],
    )
    spans = SP.duplicate_spans(d, w=5).collect()
    assert len(spans) == 2
    starts = sorted(r.start for r in spans)
    assert starts == [0, 11]
    assert all(r.span_tokens == 5 for r in spans)


def test_duplicate_spans_merges_overlapping_windows(spark):
    # 6-token duplicated run at w=4 -> 3 overlapping windows merge
    # into one span of 6, not three spans.
    run = "m n o p q r"
    d = _docs(spark, [(1, f"{run} tail1"), (2, f"head2 {run}")])
    spans = SP.duplicate_spans(d, w=4).collect()
    assert {(r.doc_id, r.span_tokens) for r in spans} == {
        (1, 6),
        (2, 6),
    }


def test_duplicate_spans_hashed_same_result(spark):
    d = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "c d e f g h x y"),
            (3, "no overlap at all in this document text"),
        ],
    )
    exact = sorted(map(tuple, SP.duplicate_spans(d, w=4).collect()))
    hashed = sorted(
        map(tuple, SP.duplicate_spans(d, w=4, hashed=True).collect())
    )
    assert exact == hashed


def test_short_docs_contribute_no_sites(spark):
    d = _docs(spark, [(1, "a b c"), (2, "a b c")])
    # identical docs, but shorter than w=4: no windows, no spans.
    assert SP.duplicate_spans(d, w=4).count() == 0
    stats = SP.span_dedup_stats(d, w=4).collect()
    assert all(r.n_spans == 0 for r in stats)


# ------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    keys = spark.range(0, 500).select(
        F.concat(F.lit("k"), "id").alias("key")
    )
    probe = spark.range(0, 5000).select(
        F.concat(F.lit("k"), "id").alias("key")
    )
    m, k = 1 << 14, 5  # ~32 bits/key -> FP well under 1%
    bloom = BL.bloom_build(keys, "key", m, k)
    cand = BL.bloom_probe(probe, bloom, "key", m, k)
    got = {r.key for r in cand.collect()}
    members = {f"k{i}" for i in range(500)}
    assert members <= got, "bloom dropped a true member"
    fp = len(got - members)
    assert fp < 0.05 * 4500, f"FP rate too high: {fp}/4500"


def test_bloom_semi_join_identical_to_exact(spark):
    big = spark.range(0, 2000).select(
        F.concat(F.lit("v"), (F.col("id") % 700)).alias("key"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.concat(F.lit("v"), (F.col("id") * 3)).alias("key")
    )
    via = BL.bloom_semi_join(big, small, "key", 1 << 12, 5)
    exact = big.join(small.distinct(), "key", "leftsemi")
    assert sorted(map(tuple, via.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_bloom_probe_plan_has_no_shuffle_of_probe_side(spark):
    probe = spark.range(0, 100).select(
        F.concat(F.lit("p"), "id").alias("key")
    )
    keys = spark.range(0, 10).select(
        F.concat(F.lit("p"), "id").alias("key")
    )
    bloom = BL.bloom_build(keys, "key", 1 << 10, 3)
    plan = (
        BL.bloom_probe(probe, bloom, "key", 1 << 10, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the probe side must never be shuffled: no sort-merge join.
    # Since r14 the probe is a single broadcast of the densified
    # one-row filter (a nested-loop cross join by necessity — one
    # row, no key) + element_at expressions; the only exchanges are
    # that broadcast and the filter BUILD's own ≤ m/64-row word
    # aggregate on the build side.
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# -------------------------------------------------------------- bm25


def test_bm25_ranks_exact_phrase_doc_first(spark):
    d = _docs(
        spark,
        [
            (1, "hash join hash join hash join"),
            (2, "hash table scan"),
            (3, "sort merge join strategy"),
            (4, "unrelated words entirely different content"),
        ],
    )
    out = SR.bm25_topk(d, [("q", "hash join")], topk=3).collect()
    assert out[0].doc_id == 1 and out[0].rank == 1
    ids = {r.doc_id for r in out}
    assert 4 not in ids  # no query term -> never scored


def test_bm25_matches_reference_formula(spark):
    # one-term query against a 3-doc corpus: compute the expected
    # score by hand with the same k1/b.
    d = _docs(
        spark,
        [(1, "x x y"), (2, "x z z"), (3, "w w w")],
    )
    out = {
        r.doc_id: r.score
        for r in SR.bm25_topk(d, [("q", "x")], topk=3).collect()
    }
    n_docs, df = 3, 2
    avgdl = 3.0
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    for doc_id, tf in ((1, 2), (2, 1)):
        expected = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * 3 / avgdl))
        assert out[doc_id] == pytest.approx(expected, abs=1e-6)
    assert 3 not in out


def test_bm25_ties_break_on_doc_id(spark):
    d = _docs(spark, [(7, "t u"), (3, "t u"), (5, "t u")])
    out = SR.bm25_topk(d, [("q", "t")], topk=3).collect()
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [
        3,
        5,
        7,
    ]


# ----------------------------------------------------- exact-k sample


def test_sample_exact_k_deterministic_and_exact(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = MX.sample_exact_k(df, 37).collect()
    b = MX.sample_exact_k(df, 37).collect()
    assert len(a) == 37
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_sample_exact_k_plan_is_take_ordered(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    plan = (
        MX.sample_exact_k(df, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_sample_exact_k_huge_keys_ansi_safe(spark):
    # keys near 2^62: the two-limb hash must not overflow under ANSI.
    base = 1 << 62
    df = spark.range(0, 100).select(
        (F.col("id") + F.lit(base)).alias("doc_id")
    )
    out = MX.sample_exact_k(df, 5).collect()
    assert len(out) == 5


# --------------------------------------------------------- classifier


def test_classifier_score_partitioning_invariant(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        scoring as SC,
    )

    d = _docs(
        spark,
        [(i, f"tok{i % 7} tok{i % 3} shared words here") for i in range(40)],
    )
    w = SC.synthetic_weights(spark, 256)
    one = {
        r.doc_id: r.score
        for r in SC.score_documents(d.coalesce(1), w, 256).collect()
    }
    many = {
        r.doc_id: r.score
        for r in SC.score_documents(d.repartition(8), w, 256).collect()
    }
    assert one == many  # exact-integer numerator -> bit-stable


def test_classifier_separates_known_weights(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        scoring as SC,
    )
    import math

    # hand-built model: bucket of "good" high, bucket of "bad" low.
    d = _docs(spark, [(1, "good good good"), (2, "bad bad bad")])
    gb = SC.feature_bucket(F.lit("good"), 64)
    bb = SC.feature_bucket(F.lit("bad"), 64)
    buckets = spark.range(1).select(gb.alias("g"), bb.alias("b")).first()
    w = spark.createDataFrame(
        [(buckets.g, int(0.9 * 2**32)), (buckets.b, int(0.1 * 2**32))]
        + [
            (b, 1 << 31)
            for b in range(64)
            if b not in (buckets.g, buckets.b)
        ],
        ["bucket", "weight_q"],
    )
    out = {r.doc_id: r for r in SC.score_documents(d, w, 64).collect()}
    assert out[1].keep and not out[2].keep
    assert out[1].score == pytest.approx(
        1 / (1 + math.exp(-0.4)), abs=1e-6
    )
    assert out[2].score == pytest.approx(
        1 / (1 + math.exp(0.4)), abs=1e-6
    )


# ---------------------------------------------- stratified / semdedup


def test_stratified_exact_k_per_group(spark):
    rows = [(i, "en" if i % 3 else "fr") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = MX.stratified_exact_k(df, 10, "lang").collect()
    from collections import Counter

    c = Counter(r.lang for r in out)
    assert c == {"en": 10, "fr": 10}
    # deterministic across partitionings
    out2 = MX.stratified_exact_k(df.repartition(7), 10, "lang").collect()
    assert sorted(r.doc_id for r in out) == sorted(
        r.doc_id for r in out2
    )


def test_stratified_exact_k_small_group_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "zh")], ["doc_id", "lang"]
    )
    out = MX.stratified_exact_k(df, 10, "lang").collect()
    assert len(out) == 3


def test_semantic_dedup_prunes_within_cell_duplicates(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        similarity as S,
    )

    # two tight groups of near-identical vectors + one isolated.
    rows = []
    for i in range(5):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
    for i in range(5, 10):
        rows.append((i, [0.0, 0.0, 1.0, 0.01 * i]))
    rows.append((99, [0.5, -0.5, 0.5, -0.5]))
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r.id: r
        for r in S.semantic_dedup(
            e, threshold=0.95, n_centroids=2, sample_size=11
        ).collect()
    }
    assert len(out) == 11
    # min id of each tight group is the representative; rest pruned
    assert out[0].keep and not any(out[i].keep for i in (1, 2, 3, 4))
    assert out[5].keep and not any(out[i].keep for i in (6, 7, 8, 9))
    assert out[99].keep  # isolated vector survives
    assert all(out[i].cluster_id == 0 for i in range(5))
    assert all(out[i].cluster_id == 5 for i in range(5, 10))


# ----------------------------------------------- bench stdout contract


def test_bench_stdout_payload_fits_driver_capture():
    """The driver json-parses only the LAST 2000 chars of bench
    stdout. Pin the payload shape: worst-case key lengths + 10
    slowest entries must stay comfortably under the capture."""
    import json as _json

    import __spark_entry__ as entry

    longest = sorted(entry.queries(), key=len, reverse=True)[:10]
    payload = {
        "metric": "headline_queries_total_wall",
        "value": 12345.6789,
        "unit": "sec",
        "n_queries": 999,
        "n_errors": 999,
        "sf": 0.01,
        "queries": {k: 12345.6789 for k in longest},
    }
    assert len(_json.dumps(payload)) < 1500


# ------------------------------------------------------ lm perplexity


def test_lm_perplexity_hand_computed(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    # corpus: "a b a b" and "a b" -> bigrams: (a,b)x3, (b,a)x1
    # c1: a=3, b=1; vocab = 2; add-1:
    #   p(b|a) = (3+1)/(3+2) = 0.8 ; p(a|b) = (1+1)/(1+2) = 2/3
    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in LM.perplexity_scores(d).collect()}
    lp_ab = math.log(0.8)
    lp_ba = math.log(2 / 3)
    q = lambda x: round(x * 1e6) / 1e6
    exp1 = (q(lp_ab) * 2 + q(lp_ba)) / 3
    assert out[1].n_bigrams == 3
    assert out[1].avg_logp == pytest.approx(exp1, abs=2e-6)
    assert out[1].perplexity == pytest.approx(
        math.exp(-exp1), abs=1e-4
    )
    assert out[2].n_bigrams == 1
    assert out[2].avg_logp == pytest.approx(q(lp_ab), abs=2e-6)


def test_lm_perplexity_partitioning_invariant(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    rows = [
        (i, " ".join(f"w{(i * j) % 11}" for j in range(40)))
        for i in range(30)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    one = {
        r.doc_id: (r.avg_logp, r.perplexity)
        for r in LM.perplexity_scores(d.coalesce(1)).collect()
    }
    many = {
        r.doc_id: (r.avg_logp, r.perplexity)
        for r in LM.perplexity_scores(d.repartition(8)).collect()
    }
    assert one == many  # quantized-integer numerator -> bit-stable


def test_lm_perplexity_short_docs_null(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    d = spark.createDataFrame(
        [(1, "only"), (2, "two words"), (3, "two words")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in LM.perplexity_scores(d).collect()}
    assert out[1].n_bigrams == 0 and out[1].avg_logp is None
    assert out[2].n_bigrams == 1


# ------------------------------------------ perplexity buckets


def test_perplexity_buckets_exact_tertiles(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    # 9 docs with 9 distinct repetition profiles -> 3 per bucket;
    # bucket stats must partition the corpus and order by fluency.
    rows = [
        (i, " ".join(f"w{j % (i + 2)}" for j in range(24))) for i in range(9)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = LM.perplexity_buckets(d, n_buckets=3).orderBy("bucket").collect()
    assert [r.bucket for r in out] == [1, 2, 3]
    assert sum(r.n_docs for r in out) == 9
    assert out[0].max_perplexity <= out[1].min_perplexity
    assert out[1].max_perplexity <= out[2].min_perplexity
    assert all(r.min_perplexity <= r.avg_perplexity <= r.max_perplexity for r in out)


def test_perplexity_buckets_ties_share_bucket(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    # 6 identical docs + 3 distinct ones: the 6 share one quantized
    # perplexity, so they must land in ONE bucket (never split), and
    # repartitioning must not change the assignment.
    rows = [(i, "a b a b a b") for i in range(6)] + [
        (6, "c d e f g h"),
        (7, "a a a a a a"),
        (8, "x y x z x y"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    one = sorted(map(tuple, LM.perplexity_buckets(d.coalesce(1), 3).collect()))
    many = sorted(map(tuple, LM.perplexity_buckets(d.repartition(5), 3).collect()))
    assert one == many
    sizes = {r[0]: r[1] for r in one}
    assert 6 in sizes.values()  # the tie block stayed together


# ------------------------------------------ hard negatives


def test_hard_negative_topk_excludes_same_label(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        similarity as S,
    )

    # vec 0's nearest neighbor (vec 1) shares its label -> must be
    # skipped; the top hard negative is the closest OTHER-label vec.
    rows = [
        (0, [1.0, 0.0, 0.0], 7),
        (1, [0.99, 0.14, 0.0], 7),   # same label, most similar
        (2, [0.9, 0.43, 0.0], 8),    # closest impostor
        (3, [0.0, 1.0, 0.0], 8),
        (4, [0.0, 0.0, 1.0], 9),
    ]
    d = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = S.hard_negative_topk(d, query_ids=[0], k=2).collect()
    assert [r.n_id for r in out] == [2, 3]
    assert all(r.q_id == 0 for r in out)
    assert out[0].cosine > out[1].cosine


# ------------------------------------------ drift monitor


def test_token_divergence_flags_the_shifted_token(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        drift as DR,
    )

    ref = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(i, "alpha beta gamma spam") for i in range(10)],
        ["doc_id", "text"],
    )
    out = DR.token_divergence(ref, new, top_k=10).collect()
    # the swapped pair dominates; shared tokens contribute ~0
    assert {out[0].token, out[1].token} == {"delta", "spam"}
    assert all(r.contrib >= 0 for r in out)  # Jeffreys terms nonneg
    shared = {r.token: r.contrib for r in out if r.token in ("alpha", "beta")}
    assert all(c < out[0].contrib // 100 for c in shared.values())


def test_token_divergence_identical_slices_near_zero(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        drift as DR,
    )

    d = spark.createDataFrame(
        [(i, "one two three four five") for i in range(8)],
        ["doc_id", "text"],
    )
    out = DR.token_divergence(d, d, top_k=5).collect()
    assert all(r.contrib == 0 for r in out)  # p == q exactly


# ------------------------------------------ lm model store


def test_lm_stored_model_reproduces_self_scores(spark, tmp_path):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    rows = [
        (i, " ".join(f"w{(i + j) % 7}" for j in range(20))) for i in range(15)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "lm_model")
    LM.save_bigram_model(d, path)
    stored = sorted(map(tuple, LM.perplexity_with_model(d, path).collect()))
    live = sorted(map(tuple, LM.perplexity_scores(d).collect()))
    assert stored == live  # stored-model scoring == in-plan training


def test_lm_model_oov_scores_at_floor(spark, tmp_path):
    import math

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    train = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    path = str(tmp_path / "lm_oov")
    LM.save_bigram_model(train, path)
    # 'z q' was never seen: both bigram and prefix unseen -> add-1
    # floor ln(1/(0 + V)) with V=2
    new = spark.createDataFrame([(9, "z q")], ["doc_id", "text"])
    out = LM.perplexity_with_model(new, path).collect()[0]
    q = round(math.log(1.0 / 2.0) * 1e6) / 1e6
    assert out.n_bigrams == 1
    assert out.avg_logp == pytest.approx(q, abs=2e-6)


def test_lm_update_model_equals_full_retrain(spark, tmp_path):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    rows = [
        (i, " ".join(f"w{(i * 2 + j) % 9}" for j in range(15)))
        for i in range(20)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    b1, b2 = d.filter("doc_id < 10"), d.filter("doc_id >= 10")
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    LM.save_bigram_model(b1, inc)
    LM.update_bigram_model(b2, inc)
    LM.save_bigram_model(d, full)
    probe = spark.createDataFrame(
        [(99, "w0 w1 w2 w3 zz w5")], ["doc_id", "text"]
    )
    a = sorted(map(tuple, LM.perplexity_with_model(probe, inc).collect()))
    b = sorted(map(tuple, LM.perplexity_with_model(probe, full).collect()))
    assert a == b  # incremental fold-in == one-shot training


# ------------------------------------------ random projection


def test_rp_project_preserves_relative_distances(spark):
    import numpy as np

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        projection as PJ,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(64)
    rows = [
        (0, base.tolist()),
        (1, (base + 0.01 * rng.randn(64)).tolist()),   # near doc 0
        (2, rng.randn(64).tolist()),                   # far from doc 0
    ]
    d = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: np.array(r[1:]) for r in PJ.rp_project(d, 64, 16).collect()}
    near = np.linalg.norm(out[0] - out[1])
    far = np.linalg.norm(out[0] - out[2])
    assert near < far / 3  # JL keeps the near pair near


def test_rp_project_deterministic_and_partition_invariant(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        projection as PJ,
    )

    rows = [(i, [float((i * 7 + j) % 13) / 13 for j in range(64)]) for i in range(20)]
    d = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = sorted(map(tuple, PJ.rp_project(d.coalesce(1), 64, 8).collect()))
    b = sorted(map(tuple, PJ.rp_project(d.repartition(6), 64, 8).collect()))
    assert a == b  # integer sums: exact under any partitioning
    # matrix regenerates identically from (j, k) alone
    assert PJ.sign_matrix(64, 8) == PJ.sign_matrix(64, 8)
    assert all(s in (-1, 1) for row in PJ.sign_matrix(8, 4) for s in row)


def test_tfidf_keywords_rare_term_wins(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        search as SR,
    )

    # 'zebra' appears only in doc 0; common glue appears everywhere.
    docs = [(0, "zebra zebra the and of")] + [
        (i, "the and of in is") for i in range(1, 6)
    ]
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    out = [r for r in SR.tfidf_keywords(d, topk=2).collect() if r.doc_id == 0]
    assert out[0].rank == 1 and out[0].term == "zebra"
    assert out[0].score > out[1].score


def test_remove_duplicate_spans_surgical(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        spans as SP,
    )

    boiler = (
        "this license text is repeated boilerplate everywhere in the corpus"
    )
    d = spark.createDataFrame(
        [
            (1, "unique intro words here " + boiler + " and a unique tail"),
            (2, "different document start " + boiler + " closing words"),
            (3, "totally original content with no duplication whatsoever"),
            (4, boiler),  # fully duplicated → empty rewrite
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in SP.remove_duplicate_spans(d).collect()}
    assert out[1]["cleaned_text"] == "unique intro words here and a unique tail"
    assert out[2]["cleaned_text"] == "different document start closing words"
    assert out[3]["n_removed"] == 0
    assert out[4]["cleaned_text"] == "" and out[4]["n_removed"] == 10
    # conservation: removed + kept == total
    for r in out.values():
        kept = len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        assert kept + r["n_removed"] == r["n_tokens"]


def test_rrf_fusion_combines_arm_ranks_exactly(spark):
    """Fusion cross-check: run the two arms independently via their
    own operators, recompute Σ 1/(60+rank) in Python, and require
    the fused gate to reproduce score, membership, and order."""
    docs = [
        (1, "hash join hash join"),
        (2, "hash table scan"),
        (3, "sort merge join"),
        (4, "scan filter pushdown"),
        (5, "join order optimizer"),
        (6, "entirely unrelated prose"),
    ]
    d = _docs(spark, docs)
    queries = [("qa", "hash join"), ("qb", "scan filter")]
    fused = {
        (r.query_id, r.doc_id): (r.rank, r.rrf)
        for r in SR.hybrid_rrf_topk(d, queries, topk=4, k_arm=3).collect()
    }

    lex = {
        (r.query_id, r.doc_id): r.rank
        for r in SR.bm25_topk(d, queries, topk=3).collect()
    }
    emb = SR.hashed_embeddings(d, dim=32)
    import numpy as np
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.similarity import (
        local_topk_exact_int_mat,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scored = local_topk_exact_int_mat(
        emb,
        np.array([-1, -2], dtype=np.int64),
        SR.hash_query_matrix(queries, 32),
        3,
        id_col="doc_id",
        vec_col="embedding",
    )
    skey = (F.col("dot") * F.col("dot")) / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("q_id").orderBy(skey.desc(), F.col("n_id"))
    vec = {
        ({-1: "qa", -2: "qb"}[r.q_id], r.n_id): r.rank
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }

    expect = {}
    for key in set(lex) | set(vec):
        s = 0.0
        if key in lex:
            s += 1.0 / (60 + lex[key])
        if key in vec:
            s += 1.0 / (60 + vec[key])
        expect[key] = s
    for q in ("qa", "qb"):
        order = sorted(
            [k for k in expect if k[0] == q],
            key=lambda k: (-expect[k], k[1]),
        )[:4]
        for i, key in enumerate(order, start=1):
            assert key in fused, key
            rank, rrf = fused[key]
            assert rank == i
            assert rrf == round(expect[key], 6)


def test_rrf_vector_arm_never_drops_negative_query_collision(spark):
    """Query ids are negative so the kernel's self-match exclusion
    can never fire against a real document — every corpus doc is a
    legal candidate in the vector arm."""
    d = _docs(spark, [(0, "alpha beta"), (1, "alpha beta"), (2, "gamma")])
    out = SR.hybrid_rrf_topk(
        d, [("q", "alpha beta")], topk=3, k_arm=3
    ).collect()
    ids = {r.doc_id for r in out}
    assert {0, 1} <= ids


def test_prf_expansion_pulls_in_cooccurring_doc(spark):
    """A doc sharing NO original query term but dominated by the
    feedback vocabulary must enter the result only via expansion."""
    d = _docs(
        spark,
        [
            (1, "hash join probe build probe build"),
            (2, "hash join probe"),
            (3, "probe build probe build probe build"),  # no query term
            (4, "entirely different words"),
        ],
    )
    base = {
        r.doc_id
        for r in SR.bm25_topk(d, [("q", "hash join")], topk=4).collect()
    }
    expanded = {
        r.doc_id
        for r in SR.prf_expand_topk(
            d, [("q", "hash join")], topk=4, fb_docs=2, fb_terms=3
        ).collect()
    }
    assert 3 not in base
    assert 3 in expanded
    assert 4 not in expanded


def test_mmr_demotes_near_duplicate_of_top_pick(spark):
    """Docs 1 and 2 are near-identical and both highly relevant; a
    plain BM25 ranking puts them 1-2, MMR (diversity-leaning λ=0.2 —
    BM25 scores are unnormalized, so a small λ rebalances the two
    terms) must pull the distinct doc 3 ahead of the duplicate."""
    from pyspark.sql import functions as F
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        graph as GG,
    )

    d = _docs(
        spark,
        [
            (1, "hash join hash join hash join probe"),
            (2, "hash join hash join hash join build"),
            (3, "hash partition shuffle exchange"),
            (4, "unrelated filler text"),
        ],
    )
    queries = [("q", "hash join")]
    cand = SR.bm25_topk(d, queries, topk=4).select(
        "query_id", "doc_id", F.col("score").alias("rel")
    )
    emb = SR.hashed_embeddings(d, dim=32)
    a = cand.select("query_id", F.col("doc_id").alias("id_a")).join(
        emb.select(F.col("doc_id").alias("id_a"), F.col("embedding").alias("_ea")),
        "id_a",
    )
    b = cand.select("query_id", F.col("doc_id").alias("id_b")).join(
        emb.select(F.col("doc_id").alias("id_b"), F.col("embedding").alias("_eb")),
        "id_b",
    )
    dot = GG.int_dot(F.col("_ea"), F.col("_eb")).cast("double")
    na = GG.int_dot(F.col("_ea"), F.col("_ea")).cast("double")
    nb = GG.int_dot(F.col("_eb"), F.col("_eb")).cast("double")
    sims = (
        a.join(b, "query_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("query_id", "id_a", "id_b", (dot / F.sqrt(na * nb)).alias("sim"))
    )
    bm_order = [
        r.doc_id
        for r in sorted(
            SR.bm25_topk(d, queries, topk=3).collect(), key=lambda r: r.rank
        )
    ]
    mmr_order = [
        r.doc_id
        for r in sorted(
            SR.mmr_rerank(cand, sims, k=3, lam=0.2).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert set(bm_order[:2]) == {1, 2}
    assert mmr_order[0] in {1, 2}
    assert mmr_order[1] == 3  # diversity kicks the duplicate down


def test_mmr_sparse_sims_treats_missing_pairs_as_zero(spark):
    """A candidate with NO sims row against any selected doc scores
    max_sim = 0 per the MMR definition — it must stay pickable. The
    pre-round-9 inner join silently dropped such candidates, so a
    sparse/thresholded sims input lost picks without error: here doc
    3 (no sims rows at all) would have vanished and rank 3 would
    never be emitted."""
    cand = spark.createDataFrame(
        [("q", 1, 10.0), ("q", 2, 9.0), ("q", 3, 1.0)],
        "query_id string, doc_id bigint, rel double",
    )
    sims = spark.createDataFrame(
        [("q", 1, 2, 0.95), ("q", 2, 1, 0.95)],
        "query_id string, id_a bigint, id_b bigint, sim double",
    )
    rows = sorted(
        SR.mmr_rerank(cand, sims, k=3, lam=0.5).collect(),
        key=lambda r: r.rank,
    )
    assert [r.doc_id for r in rows] == [1, 2, 3]
    assert rows[2].mmr == 0.5  # 0.5*rel - 0.5*max_sim(=0)


def test_mmr_ties_break_on_ascending_doc_id(spark):
    """r13 optimization round: the greedy selection moved from the
    unrolled window form (row_number over mmr DESC, doc_id ASC) into
    the cogrouped numpy kernel — pin the tie contract the window
    provided. Round 1: docs 5 and 2 tie on rel -> 2 wins. Round 2:
    the survivors tie again on identical mmr (same rel, same sim to
    the pick) -> 5 wins over 9. A negative PRESENT sim must also beat
    the missing-pair zero (max over present rows, not clamped)."""
    cand = spark.createDataFrame(
        [("q", 5, 10.0), ("q", 2, 10.0), ("q", 9, 10.0), ("q", 7, 1.0)],
        "query_id string, doc_id bigint, rel double",
    )
    sims = spark.createDataFrame(
        [
            ("q", 5, 2, 0.5), ("q", 2, 5, 0.5),
            ("q", 9, 2, 0.5), ("q", 2, 9, 0.5),
            ("q", 5, 9, 0.5), ("q", 9, 5, 0.5),
            # doc 7 has ONE present pair, negative: max over present
            # rows = -0.2 (NOT clamped to the missing-pair 0.0)
            ("q", 7, 2, -0.2),
        ],
        "query_id string, id_a bigint, id_b bigint, sim double",
    )
    rows = sorted(
        SR.mmr_rerank(cand, sims, k=4, lam=0.5).collect(),
        key=lambda r: r.rank,
    )
    assert [r.doc_id for r in rows][:3] == [2, 5, 9]
    # doc 7 at rank 4: mmr = 0.5*1.0 - 0.5*(-0.2) = 0.6
    assert rows[3].doc_id == 7
    assert rows[3].mmr == 0.6


def test_mmr_null_sim_rows_are_ignored_like_sql_max(spark):
    """r14 advisor find: a NULL sim becomes NaN in the kernel's
    numpy view and np.maximum.at would propagate it into the running
    max — the poisoned candidate's NaN mmr then WINS argmax (numpy
    returns the first NaN) where the old join form's max() simply
    ignored NULLs. The kernel now filters null sims first: doc 2's
    NULL pair against the top pick must act like a missing pair
    (max_sim 0), not a poison pill."""
    cand = spark.createDataFrame(
        [("q", 1, 10.0), ("q", 2, 5.0), ("q", 3, 4.0)],
        "query_id string, doc_id bigint, rel double",
    )
    sims = spark.createDataFrame(
        [("q", 2, 1, None), ("q", 3, 1, 0.9)],
        "query_id string, id_a bigint, id_b bigint, sim double",
    )
    rows = sorted(
        SR.mmr_rerank(cand, sims, k=3, lam=0.5).collect(),
        key=lambda r: r.rank,
    )
    # round 2: doc2 mmr = 0.5*5 - 0.5*0 = 2.5 (NULL ignored);
    # doc3 mmr = 0.5*4 - 0.5*0.9 = 1.55 -> doc2 wins rank 2
    assert [r.doc_id for r in rows] == [1, 2, 3]
    assert rows[1].mmr == 2.5


def test_mmr_duplicate_candidate_rows_selected_once(spark):
    """r14 advisor find: the old anti-join removed EVERY copy of a
    picked id, but the kernel's positional alive-mask would let a
    duplicated (query, id) candidate row be selected twice. The
    kernel now enforces the distinct-candidate contract: each id
    appears at most once in the output."""
    cand = spark.createDataFrame(
        [("q", 1, 10.0), ("q", 1, 10.0), ("q", 2, 3.0)],
        "query_id string, doc_id bigint, rel double",
    )
    sims = spark.createDataFrame(
        [],
        "query_id string, id_a bigint, id_b bigint, sim double",
    )
    rows = sorted(
        SR.mmr_rerank(cand, sims, k=3, lam=0.5).collect(),
        key=lambda r: r.rank,
    )
    assert [r.doc_id for r in rows] == [1, 2]


# ------------------------------------------- shared term_index triple


def test_prebuilt_index_bit_identical_across_retrieval_family(spark):
    """The ``index=`` reuse path (r10 verdict task #5 — the shared
    per-session tf/df frame) must be BIT-identical to the inline
    build for every consumer: same kernels, same rounding, same
    ties. Pins bm25 / PRF / RRF / tfidf with and without the
    prebuilt triple."""
    d = _docs(
        spark,
        [
            (1, "hash join hash join probe build"),
            (2, "hash table scan cost model"),
            (3, "sort merge join strategy shuffle"),
            (4, "broadcast join small dimension table"),
            (5, "window rank partition order"),
        ],
    )
    idx = SR.term_index(d)
    qs = [("q1", "hash join"), ("q2", "shuffle partition")]

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(SR.bm25_topk(d, qs, topk=3)) == rows(
        SR.bm25_topk(d, qs, topk=3, index=idx)
    )
    assert rows(SR.prf_expand_topk(d, qs, topk=3)) == rows(
        SR.prf_expand_topk(d, qs, topk=3, index=idx)
    )
    assert rows(SR.hybrid_rrf_topk(d, qs, topk=3, k_arm=3)) == rows(
        SR.hybrid_rrf_topk(d, qs, topk=3, k_arm=3, index=idx)
    )
    assert rows(SR.tfidf_keywords(d, topk=2)) == rows(
        SR.tfidf_keywords(d, topk=2, index=idx)
    )
