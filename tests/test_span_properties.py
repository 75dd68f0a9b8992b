"""Property test: duplicate_spans vs a brute-force single-process
reference (the same semantics a suffix-array implementation would
produce for W-window coverage). Random small corpora over a tiny
vocabulary force frequent window collisions — within docs, across
docs, at boundaries."""

from collections import defaultdict

from hypothesis import given, settings, strategies as st

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    spans as SP,
)


def _spark():
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )


def _brute_spans(docs: dict[int, list[str]], w: int):
    """Reference: every w-window site, sites per gram, duplicated
    positions merged into maximal islands with gap <= w."""
    sites = defaultdict(list)  # gram -> [(doc, pos)]
    for doc_id, toks in docs.items():
        for p in range(len(toks) - w + 1):
            sites[" ".join(toks[p : p + w])].append((doc_id, p))
    dup_pos = defaultdict(list)  # doc -> [pos...]
    for gram, locs in sites.items():
        if len(locs) >= 2:
            for doc_id, p in locs:
                dup_pos[doc_id].append(p)
    out = set()
    for doc_id, ps in dup_pos.items():
        ps = sorted(set(ps))
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > w:
                out.add((doc_id, start, prev, prev - start + w))
                start = p
            prev = p
        out.add((doc_id, start, prev, prev - start + w))
    return out


_word = st.sampled_from(["aa", "bb", "cc"])
_doc = st.lists(_word, min_size=0, max_size=14)


@settings(max_examples=15, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=5), st.integers(2, 4))
def test_duplicate_spans_matches_bruteforce(texts, w):
    docs = {i: toks for i, toks in enumerate(texts)}
    spark = _spark()
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_id, r.start, r.end_, r.span_tokens)
        for r in SP.duplicate_spans(df, w=w).collect()
    }
    # tokens_col splits "" into [''] (one empty token); the brute
    # reference uses the raw token lists, so mirror that quirk.
    ref_docs = {i: (t if t else [""]) for i, t in docs.items()}
    assert got == _brute_spans(ref_docs, w)
