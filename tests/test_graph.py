"""Similarity-graph analytics (operators/graph.py): exact-integer
kNN edges and fixed-iteration PageRank, cross-checked against
NetworkX-free NumPy reference implementations."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    graph as G,
)


def _vec_df(spark, mat):
    return spark.createDataFrame(
        [(i, [int(x) for x in row]) for i, row in enumerate(mat)],
        "id bigint, embedding array<bigint>",
    )


def _np_knn(mat, k):
    """(src, dst, rank) under dot²/(na·nb) DESC, dst ASC — the same
    total order the operator promises."""
    mat = np.asarray(mat, dtype=np.int64)
    n2 = (mat * mat).sum(axis=1)
    out = set()
    for i in range(len(mat)):
        keys = []
        for j in range(len(mat)):
            if j == i:
                continue
            dot = int(mat[i] @ mat[j])
            keys.append((-(dot * dot) / (n2[i] * n2[j]), j))
        keys.sort()
        for r, (_, j) in enumerate(keys[:k], start=1):
            out.add((i, j, r))
    return out


def test_knn_edges_match_numpy(spark):
    rng = np.random.RandomState(7)
    mat = rng.randint(0, 5, size=(12, 6))
    got = {
        (r.src, r.dst, r.rank)
        for r in G.knn_edges_exact_int(_vec_df(spark, mat), k=3).collect()
    }
    assert got == _np_knn(mat, 3)


def test_knn_edges_out_degree_exact_k(spark):
    rng = np.random.RandomState(3)
    mat = rng.randint(0, 4, size=(9, 5))
    deg = (
        G.knn_edges_exact_int(_vec_df(spark, mat), k=4)
        .groupBy("src")
        .count()
        .collect()
    )
    assert len(deg) == 9 and all(r["count"] == 4 for r in deg)


def _np_pagerank(edges, n, n_iter, d=0.85, dangling=False):
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {i: 1.0 / n for i in range(n)}
    for _ in range(n_iter):
        dangle = (
            sum(pr[i] for i in range(n) if i not in outdeg)
            if dangling
            else 0.0
        )
        contrib = {i: 0.0 for i in range(n)}
        for s, t in edges:
            contrib[t] += pr[s] / outdeg[s]
        pr = {
            i: (1 - d) / n + d * (contrib[i] + dangle / n)
            for i in range(n)
        }
    return pr


@pytest.mark.parametrize("dangling", [False, True])
def test_pagerank_matches_numpy(spark, dangling):
    # node 4 is dangling (appears only as dst) when dangling=True
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4)]
    if not dangling:
        edges.append((4, 0))
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.id: r.pr
        for r in G.pagerank(e, n_iter=6, dangling=dangling).collect()
    }
    want = _np_pagerank(edges, 5, 6, dangling=dangling)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_mass_conserved_no_dangling(spark):
    e = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)],
        "src bigint, dst bigint",
    )
    total = (
        G.pagerank(e, n_iter=8).agg(F.sum("pr").alias("s")).first()["s"]
    )
    assert total == pytest.approx(1.0, abs=1e-9)


def test_knn_edges_lsh_recall_vs_exact(spark):
    """LSH-blocked kNN edges: measure recall of top-k(=2) edge sets
    against the exact graph on a clustered corpus (3 tight clusters
    of integer count vectors — within-cluster cosines ≈ 1, across
    ≈ orthogonal). OR-construction over 8 tables keeps recall high;
    the operator contract is quantified, not exact."""
    rng = np.random.RandomState(11)
    base = [
        [8, 0, 0, 0, 1, 0],
        [0, 8, 0, 1, 0, 0],
        [0, 0, 8, 0, 0, 1],
    ]
    mat = np.stack(
        [
            np.maximum(
                0, np.array(base[i % 3]) + rng.randint(0, 2, size=6)
            )
            for i in range(15)
        ]
    )
    df = _vec_df(spark, mat)
    exact = {
        (r.src, r.dst)
        for r in G.knn_edges_exact_int(df, k=2).collect()
    }
    approx = {
        (r.src, r.dst)
        for r in G.knn_edges_lsh(
            df, k=2, n_planes=4, n_tables=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, recall
    # approximate out-degree never exceeds k
    from collections import Counter

    deg = Counter(s for s, _ in approx)
    assert max(deg.values()) <= 2


def test_knn_edges_lsh_ranks_are_contiguous(spark):
    rng = np.random.RandomState(5)
    mat = rng.randint(0, 6, size=(10, 4))
    rows = G.knn_edges_lsh(_vec_df(spark, mat), k=3, n_planes=3).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r.rank)
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_knn_edges_lsh_high_dim_mean_single_expression(spark):
    """The corpus-mean centering must not fan out into one avg()
    aggregate per dimension (r08 verdict hygiene item #3): at real
    embedding dims (1-4k) that is thousands of expressions in a
    single plan. Pin the posexplode formulation structurally
    (source-level) and functionally — a dim-512 two-cluster corpus
    still recalls overwhelmingly within-cluster neighbors."""
    import inspect

    src = inspect.getsource(G.knn_edges_lsh)
    assert "posexplode" in src
    assert 'f"m{i}"' not in src
    rng = np.random.RandomState(17)
    dim = 512
    centers = rng.randint(0, 3, size=(2, dim)) * 4
    mat = np.stack(
        [
            np.maximum(0, centers[i % 2] + rng.randint(0, 2, size=dim))
            for i in range(12)
        ]
    )
    edges = G.knn_edges_lsh(
        _vec_df(spark, mat), k=3, n_planes=3, n_tables=4
    ).collect()
    assert edges, "no edges returned"
    same = sum(1 for r in edges if r.src % 2 == r.dst % 2)
    assert same / len(edges) >= 0.9, (same, len(edges))


def test_random_walks_follow_hash_picks(spark):
    """Hand-recompute the hash-driven edge choice for every step on a
    small ranked edge list (ring + chords) and require the walk frame
    to match exactly."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.mixing import (
        hash32_expr,  # noqa: F401 - parity is via the python twin below
    )

    def h32(key):
        k32 = key % (1 << 32)
        hi, lo = k32 >> 16, k32 & 0xFFFF
        return ((hi * 2654435761) % (1 << 16) * (1 << 16)
                + lo * 2654435761) % (1 << 32)

    edges = []
    for v in range(6):
        nbrs = [(v + 1) % 6, (v + 2) % 6, (v + 4) % 6]
        for r, d in enumerate(nbrs, start=1):
            edges.append((v, d, r))
    e = spark.createDataFrame(edges, "src bigint, dst bigint, rank int")
    got = {
        (r.start, r.step, r.node)
        for r in G.random_walks(e, walk_len=3).collect()
    }
    adj = {}
    for s, d, r in edges:
        adj.setdefault(s, {})[r] = d
    want = set()
    for start in range(6):
        cur = start
        for i in range(1, 4):
            pick = 1 + h32(cur * 1000003 + i) % len(adj[cur])
            cur = adj[cur][pick]
            want.add((start, i, cur))
    assert got == want


def test_random_walks_one_row_per_start_per_step(spark):
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1), (1, 2, 2), (2, 1, 1)],
        "src bigint, dst bigint, rank int",
    )
    rows = G.random_walks(e, walk_len=4).collect()
    from collections import Counter

    c = Counter((r.start, r.step) for r in rows)
    assert all(v == 1 for v in c.values())
    assert len({r.start for r in rows}) == 3 and len(rows) == 12


def test_triangle_counts_known_graph(spark):
    """K4 on {0,1,2,3} (every node in 3 triangles) plus a pendant
    node 4 (zero triangles) and an isolated edge 5-6."""
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (3, 4), (5, 6),
    ]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.id: r.n_triangles for r in G.triangle_counts(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 5: 0, 6: 0}


def test_triangle_counts_direction_and_dup_insensitive(spark):
    """Reversed / duplicated directed edges must not change counts
    (undirected closure dedups)."""
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (0, 1)],
        "src bigint, dst bigint",
    )
    got = {r.id: r.n_triangles for r in G.triangle_counts(e).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_knn_lsh_probe_dial_recall_sf01(spark):
    """The knn_graph_lsh_docs 0.9 contract with the probe dial made
    visible (r10 verdict task #8): tie-aware recall at sf0.1
    (doc_id%5 sample, the gate's exact corpus) measured at BOTH
    probes=1 and the shipped probes=2. r09 baseline readings: 0.894
    at probes=1 (just UNDER the contract) and 0.944 at probes=2 — so
    a fixture or operator change that nudges either number flips the
    driver gate; this assertion prints the pair so that failure is
    self-diagnosing instead of a bare recall_ok=false."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        search as SR,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    ).filter(F.col("doc_id") % 5 == 0)
    emb = SR.hashed_embeddings(docs, dim=32).localCheckpoint()
    base = emb.select(
        "doc_id",
        "embedding",
        G.int_dot(F.col("embedding"), F.col("embedding")).alias("_n2"),
    )
    a = base.select(
        F.col("doc_id").alias("src"),
        F.col("embedding").alias("_va"),
        F.col("_n2").alias("_na"),
    )
    b = base.select(
        F.col("doc_id").alias("dst"),
        F.col("embedding").alias("_vb"),
        F.col("_n2").alias("_nb"),
    )

    def skey(edges):
        dot = G.int_dot(F.col("_va"), F.col("_vb"))
        return (
            edges.join(a, "src")
            .join(b, "dst")
            .select(
                "src",
                "dst",
                (
                    (dot * dot).cast("double")
                    / (F.col("_na") * F.col("_nb")).cast("double")
                ).alias("_skey"),
            )
        )

    exact = G.knn_edges_exact_int(
        emb, k=5, id_col="doc_id", vec_col="embedding"
    ).select("src", "dst").localCheckpoint()
    n_exact = exact.count()
    kth = skey(exact).groupBy("src").agg(F.min("_skey").alias("_kth"))

    def tie_recall(n_probes: int) -> float:
        approx = G.knn_edges_lsh(
            emb, k=5, id_col="doc_id", vec_col="embedding",
            n_tables=8, n_probes=n_probes,
        ).select("src", "dst")
        hits = (
            skey(approx)
            .join(kth, "src")
            .filter(F.col("_skey") >= F.col("_kth"))
            .count()
        )
        return hits / n_exact

    r1, r2 = tie_recall(1), tie_recall(2)
    assert r2 >= 0.9, (
        f"shipped probes=2 tie-aware recall {r2:.3f} < 0.9 contract "
        f"(dial: probes=1 reads {r1:.3f}; r09 baselines were "
        f"probes=1 0.894 / probes=2 0.944 — if both dropped, suspect "
        f"the fixture or the banding kernel; if only probes=2, "
        f"suspect the multi-probe flip path)"
    )
    # probes=1 sits just under the contract BY MEASUREMENT — if it
    # ever reads >= 0.9 the shipped probes=2 default is paying double
    # candidate volume for recall the corpus no longer needs; if it
    # collapses far below its 0.894 baseline the operator regressed
    # even though probes=2 may still clear the gate.
    assert 0.75 <= r1 < r2 + 1e-9, (
        f"probes=1 recall {r1:.3f} left its expected band "
        f"[0.75, probes=2={r2:.3f}] — re-measure the dial and re-pin "
        f"(r09 baseline 0.894)"
    )
