"""Random-projection dimensionality reduction (Achlioptas-style
sign JL) — LLM-data-pipeline extension. High-dimensional embedding
columns are expensive to shuffle, index, and brute-force; the
standard pre-step for ANN/clustering at scale is projecting to a
few dozen dimensions with a random ±1 matrix, which preserves
pairwise distances to (1±ε) w.h.p. (Johnson-Lindenstrauss).

Spark-native formulation with NO stored matrix: entry (j, k) of the
projection is ``sign(md5(k:j))`` — derived from the engine-portable
hash, so every executor (and every engine) regenerates the same
matrix from the two dimensions alone; nothing is broadcast or
persisted, and the projection of a row is reproducible forever.

    proj_k(v) = Σ_j q(v_j) · s(j,k)     s ∈ {−1, +1}

with ``q`` the 1e-6 integer quantization of the component — the
per-term products are exact integers, so each output component is
an exact integer sum: partitioning-invariant and byte-identical to
the SQL oracle (float folds would depend on summation order).
Everything is ``zip_with``/``aggregate`` higher-order expressions —
JVM codegen, no Python, one scan, zero shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F


def _sign(j: int, k: int) -> int:
    """±1 from the first byte of md5("k:j") — tiny host-side helper
    used to BUILD the literal sign vectors; the hash is the same
    engine-portable md5 the SQL twin evaluates, precomputed here
    because the matrix is (d_in × d_out) small and constant."""
    h = hashlib.md5(f"{k}:{j}".encode()).hexdigest()
    return 1 if int(h[:2], 16) % 2 == 0 else -1


def sign_matrix(d_in: int, d_out: int) -> list[list[int]]:
    """The full ±1 matrix as plain literals: column k is
    ``[_sign(j, k) for j in range(d_in)]``."""
    return [[_sign(j, k) for j in range(d_in)] for k in range(d_out)]


def rp_project(
    df: DataFrame,
    d_in: int,
    d_out: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project ``vec_col`` (length ``d_in``) to ``d_out`` quantized
    components ``p0..p{d_out-1}`` (exact integer sums of
    ±quantized-component terms; divide by 1e6·√d_out for the
    JL-scaled float form). One narrow select — the projected frame
    is what downstream LSH/k-means/brute-force consume."""
    vec = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(1_000_000.0)).cast(
            "bigint"
        ),
    )
    cols = []
    for k, signs in enumerate(sign_matrix(d_in, d_out)):
        s_arr = F.array(*[F.lit(s) for s in signs])
        cols.append(
            F.aggregate(
                F.zip_with(vec, s_arr, lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias(f"p{k}")
        )
    return df.select(F.col(id_col), *cols)
