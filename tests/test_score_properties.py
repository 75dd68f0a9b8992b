"""Property-based invariants for the quantized-score operators
(entropy, LM perplexity, novelty, count-min): bounds that must hold
for ANY corpus, checked over hypothesis-generated documents. The
example-based tests pin exact values; these pin the algebra."""

import math

from hypothesis import example, given, settings, strategies as st


def _spark():
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )


_word = st.text(alphabet="abcdef", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=1, max_size=25).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


@settings(max_examples=10, deadline=None)
@given(texts=_corpus)
def test_entropy_bounds(texts):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        text as X,
    )

    spark = _spark()
    d = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for r in X.entropy_scores(d).collect():
        # 0 ≤ H ≤ ln(n_tokens) for token entropy (quantization slack)
        assert r.token_entropy is not None
        assert r.token_entropy >= -1e-6
        assert r.token_entropy <= math.log(max(r.n_tokens, 1)) + 1e-6


@settings(max_examples=10, deadline=None)
@given(texts=_corpus)
def test_lm_perplexity_bounds(texts):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    spark = _spark()
    d = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = LM.perplexity_scores(d).collect()
    n_multi = sum(1 for t in texts if len(t.split()) >= 2)
    assert sum(1 for r in rows if r.n_bigrams > 0) == n_multi
    for r in rows:
        if r.n_bigrams == 0:
            assert r.avg_logp is None and r.perplexity is None
        else:
            assert r.avg_logp <= 1e-6  # log-probs are ≤ 0
            assert r.perplexity >= 1.0 - 1e-6  # exp(-avg) ≥ 1


@settings(max_examples=10, deadline=None)
@given(texts=_corpus)
def test_novelty_fraction_bounds_and_duplicate_zero(texts):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        text as X,
    )

    spark = _spark()
    # append an exact duplicate of doc 0: both copies must be 0-novel
    docs = list(enumerate(texts)) + [(len(texts), texts[0])]
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in X.novelty_scores(d, n=3).collect()}
    for r in out.values():
        assert 0.0 <= r.novel_frac <= 1.0
        assert 0 <= r.n_novel <= r.n_shingles
    assert out[0].novel_frac == 0.0
    assert out[len(texts)].novel_frac == 0.0


@settings(max_examples=8, deadline=None)
@given(texts=_corpus)
def test_cms_never_underestimates_any_corpus(texts):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        sketch as SK,
    )

    spark = _spark()
    d = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    # narrow width to force collisions: the one-sided bound must hold
    out = SK.heavy_hitters(d, top_k=10, depth=2, width=8).collect()
    assert out  # at least one token exists
    for r in out:
        assert r.cms_est >= r.exact_n
        assert r.never_underest


@settings(max_examples=8, deadline=None)
@given(texts=_corpus, k=st.sampled_from([2, 4]))
def test_paragraph_dedup_matches_python_reference(texts, k):
    """paragraph_dedup (chunk mode) must equal a brute-force Python
    reference for ANY corpus: global first occurrence kept, cleaned
    text reassembled in chunk order."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        dedup as D,
    )

    # reference
    chunks = []
    for doc_id, text in enumerate(texts):
        toks = text.strip().split()
        n = max(1, -(-len(toks) // k))
        for i in range(n):
            chunks.append((doc_id, i, " ".join(toks[i * k : (i + 1) * k])))
    first = {}
    for doc_id, i, p in sorted(chunks):
        first.setdefault(p, (doc_id, i))
    expect = {}
    for doc_id, text in enumerate(texts):
        mine = [(i, p) for d_, i, p in chunks if d_ == doc_id]
        kept = [(i, p) for i, p in mine if first[p] == (doc_id, i)]
        expect[doc_id] = (
            len(mine),
            len(kept),
            " ".join(p for _, p in sorted(kept)),
        )

    spark = _spark()
    d = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_paragraphs, r.n_kept, r.cleaned_text)
        for r in D.paragraph_dedup(d, chunk_tokens=k).collect()
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    texts=_corpus,
    size=st.sampled_from([3, 5, 8]),
    stride=st.sampled_from([1, 2, 3]),
)
def test_chunk_documents_covers_every_token(texts, size, stride):
    """For ANY corpus and any 0 < stride <= size: chunk offsets are
    i·stride, every token position is covered, consecutive chunks
    overlap by exactly size − stride (except the final partial), and
    concatenating stride-aligned prefixes reconstructs the doc."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        packing as PK,
    )

    if stride > size:
        return
    spark = _spark()
    d = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = PK.chunk_documents(
        d, chunk_size=size, stride=stride
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(texts):
        toks = text.strip().split()
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        assert chunks[0].start_token == 0
        covered = set()
        for i, c in enumerate(chunks):
            assert c.start_token == i * stride
            assert c.n_tokens == min(size, len(toks) - i * stride)
            assert c.chunk_text == " ".join(
                toks[c.start_token : c.start_token + c.n_tokens]
            )
            covered |= set(range(c.start_token, c.start_token + c.n_tokens))
        assert covered == set(range(len(toks)))
        # reconstruction from stride-aligned prefixes
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.chunk_text.split()[:stride])
        rebuilt.extend(chunks[-1].chunk_text.split())
        assert rebuilt == toks


@settings(max_examples=10, deadline=None)
@given(
    scores=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=40,
    ),
    keep_frac=st.sampled_from([0.1, 0.25, 0.5, 0.9]),
)
def test_percentile_filter_matches_naive_reference(scores, keep_frac):
    """percentile_filter_by_group's histogram-cutoff plan must agree
    with the obvious per-group sort reference (keep top
    ceil(frac·n) by score, ties at the cutoff included) for ANY
    score distribution — including heavy ties and single-doc
    groups."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        scoring as SC,
    )

    spark = _spark()
    rows = [
        (i, g, q / 20.0) for i, (g, q) in enumerate(scores)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, score double"
    )
    out = {
        r["doc_id"]: r["keep"]
        for r in SC.percentile_filter_by_group(
            df, keep_frac=keep_frac
        ).collect()
    }
    # naive reference on the driver
    import math as _math
    from collections import defaultdict

    by_group = defaultdict(list)
    for i, (g, q) in enumerate(scores):
        by_group[g].append((q / 20.0, i))
    expect = {}
    for g, items in by_group.items():
        items.sort(key=lambda t: -t[0])
        k = _math.ceil(keep_frac * len(items))
        cutoff = items[k - 1][0]
        for s, i in items:
            expect[i] = s >= cutoff
    assert out == expect


@settings(max_examples=10, deadline=None)
@given(texts=_corpus)
def test_kneser_ney_contexts_subnormalized(texts):
    """For every context w1, the summed KN probability over the
    OBSERVED continuations must stay within (0, 1]: the discount
    reserves mass for unseen continuations, so the observed sum is
    strictly positive and never exceeds one."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        lm as LM,
    )

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = LM.kneser_ney_bigrams(df, top_k=100000).collect()
    if not rows:  # no bigrams in the generated corpus
        return
    from collections import defaultdict

    per_ctx = defaultdict(float)
    for r in rows:
        assert r["p_kn"] > 0
        per_ctx[r["w1"]] += r["p_kn"]
    for w1, total in per_ctx.items():
        assert total <= 1.0 + 1e-4, (w1, total)


@settings(max_examples=8, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-3, max_value=3), min_size=4, max_size=4
        ).filter(lambda v: any(v)),
        min_size=3,
        max_size=24,
    ),
    k=st.sampled_from([1, 3]),
)
def test_brute_force_topk_matches_naive(vecs, k):
    """The Arrow local-top-k kernel must agree with a driver-side
    exact ranking (cosine desc, n_id asc) for ANY vector set —
    including ties from repeated/parallel vectors, which stress the
    per-batch argpartition + global-window composition."""
    import numpy as np

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        similarity as S,
    )

    spark = _spark()
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).repartition(3)  # force multi-partition local top-k
    q_ids = [0, min(1, len(vecs) - 1)]
    got = {
        (r["q_id"], r["rank"]): r["n_id"]
        for r in S.brute_force_topk(emb, q_ids, k=k).collect()
    }
    mat = np.array(vecs, dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in set(q_ids):
        scores = unit @ unit[q]
        order = sorted(
            (i for i in range(len(vecs)) if i != q),
            key=lambda i: (-round(scores[i], 12), i),
        )
        for rank, nid in enumerate(order[:k], start=1):
            # ties at equal cosine may legitimately differ in float
            # last-ulp between numpy batch matmul and the reference;
            # accept either id when the scores match to 1e-9
            if got[(q, rank)] != nid:
                assert abs(scores[got[(q, rank)]] - scores[nid]) < 1e-9


_bpe_doc = st.one_of(
    _doc,
    st.sampled_from(["", "   ", " \t\n "]),  # empty/ws-only docs:
    # Spark split('', '') -> [''] vs regexp char-extract -> [] is the
    # divergence the empty-word-type filter exists for
)
_bpe_corpus = st.lists(_bpe_doc, min_size=1, max_size=8)


@settings(max_examples=8, deadline=None)
@given(texts=_bpe_corpus)
@example(texts=["", "", "", "a b", "a b"])  # the reproduced pre-fix
# divergence: Spark learned (1, '', '</w>', 3) from the empty types
def test_bpe_train_matches_duckdb_oracle(texts):
    """Cross-engine property: operators/bpe.bpe_train and the
    generated DuckDB oracle (entry _bpe_vocab_sql — the unrolled
    MATERIALIZED-CTE twin the driver gate runs) must agree on ANY
    corpus, not just the fixture tables: same merges, same order,
    same weighted counts, including count-tie lexicographic breaks,
    the n>=2 early stop, and empty/whitespace-only documents
    (hypothesis corpora are small enough to hit all three
    constantly)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        bpe as B,
    )

    spark = _spark()
    d = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = B.bpe_train(d, n_merges=3)

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    oracle = [
        (int(s), l, r, int(n))
        for s, l, r, n in con.sql(entry._bpe_vocab_sql(3)).fetchall()
    ]
    assert got == oracle
