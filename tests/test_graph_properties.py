"""Property suites for operators/graph.py: exact kNN vs a NumPy
reference on arbitrary integer corpora, PageRank mass conservation on
arbitrary digraphs, and walk determinism."""

import numpy as np
from hypothesis import given, settings, strategies as st

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    graph as G,
)


def _spark():
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )


_mats = st.integers(min_value=2, max_value=12).flatmap(
    lambda n: st.integers(min_value=2, max_value=6).flatmap(
        lambda d: st.lists(
            st.lists(
                st.integers(min_value=0, max_value=9),
                min_size=d,
                max_size=d,
            ).filter(lambda row: any(row)),  # zero vector -> 0/0 key
            min_size=n,
            max_size=n,
        )
    )
)


@settings(max_examples=12, deadline=None)
@given(mat=_mats)
def test_knn_edges_match_numpy_reference(mat):
    spark = _spark()
    df = spark.createDataFrame(
        [(i, row) for i, row in enumerate(mat)],
        "id bigint, embedding array<bigint>",
    )
    k = 3
    got = {
        (r.src, r.dst, r.rank)
        for r in G.knn_edges_exact_int(df, k=k).collect()
    }
    m = np.asarray(mat, dtype=np.int64)
    n2 = (m * m).sum(axis=1)
    want = set()
    for i in range(len(m)):
        keys = sorted(
            (-(int(m[i] @ m[j]) ** 2) / (n2[i] * n2[j]), j)
            for j in range(len(m))
            if j != i
        )
        for r, (_, j) in enumerate(keys[:k], start=1):
            want.add((i, j, r))
    assert got == want


_edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
    unique=True,
)


@settings(max_examples=12, deadline=None)
@given(edges=_edge_lists)
def test_pagerank_mass_conserved_on_any_digraph(edges):
    spark = _spark()
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    pr = {
        r.id: r.pr
        for r in G.pagerank(e, n_iter=4, dangling=True).collect()
    }
    nodes = {v for p in edges for v in p}
    assert set(pr) == nodes
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert all(v > 0 for v in pr.values())


@settings(max_examples=8, deadline=None)
@given(edges=_edge_lists)
def test_random_walks_deterministic_and_closed(edges):
    """Walks are a pure function of the edge list (two runs agree),
    every step lands on a real out-neighbor of the previous node,
    and walks from nodes with out-edges never terminate early when
    the graph is out-closed (every dst also a src) — here we only
    assert per-step adjacency and rerun-determinism."""
    spark = _spark()
    ranked = {}
    for s, d in sorted(edges):
        ranked.setdefault(s, []).append(d)
    rows = [
        (s, d, r)
        for s, ds in ranked.items()
        for r, d in enumerate(ds, start=1)
    ]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, rank int")
    out1 = sorted(
        (r.start, r.step, r.node)
        for r in G.random_walks(e, walk_len=2).collect()
    )
    out2 = sorted(
        (r.start, r.step, r.node)
        for r in G.random_walks(e, walk_len=2).collect()
    )
    assert out1 == out2
    adj = {s: set(ds) for s, ds in ranked.items()}
    pos = {(s, 0): s for s in ranked}
    by_start_step = {(s, i): n for s, i, n in out1}
    for (s, i), n in by_start_step.items():
        prev = by_start_step.get((s, i - 1), s if i == 1 else None)
        assert prev is not None
        assert n in adj[prev]
