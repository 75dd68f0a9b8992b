"""Combined sketch-signature pass: minhash bands + simhash + winnow
fingerprints for every document in ONE Arrow (``mapInPandas``) scan.

Each sketch family alone costs one corpus scan + one Python-worker
round-trip; a dedup job that wants all three (LSH candidates, simhash
radius check, winnow overlap) would pay that three times. The per-doc
math is identical — tokenize/shingle then a numpy kernel — so this
pass calls the SAME kernels (:func:`dedup._minhash_fold_doc`,
:func:`dedup._simhash_doc`, :func:`text._winnow_doc`; bit-equality
with the single-sketch operators is test-pinned) and emits one long-
format frame:

    doc_id  | kind | idx  | value                | n
    --------|------|------|----------------------|---------------
    bigint  | 0    | band | band_hash            | 0
    bigint  | 1    | 0    | simhash              | 0
    bigint  | 2    | 0    | winnow fingerprint   | doc's n_fp

Consumers filter on ``kind`` (views below). At 100 TB the frame is
O(docs × (bands + 1 + fps/doc)) longs — orders of magnitude smaller
than the corpus — and persisting it turns three corpus scans into
one; the filter on ``kind`` prunes at the cached-partition level.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from .dedup import (
    _minhash_fold_doc,
    _mix_constants,
    _parallelize_narrow,
    _simhash_doc,
)
from .text import _winnow_doc, _winnow_powers

KIND_BAND = 0
KIND_SIMHASH = 1
KIND_WINNOW = 2

_SCHEMA_TAIL = [
    StructField("kind", IntegerType(), False),
    StructField("idx", IntegerType(), False),
    StructField("value", LongType(), False),
    StructField("n", LongType(), False),
]


def combined_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    k: int = 16,
    window: int = 8,
) -> DataFrame:
    """One Arrow pass over ``df`` emitting every sketch signature in
    long format (see module docstring). Deterministic: same kernels,
    constants, and normalization as the single-sketch operators."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide evenly into num_hashes ({num_hashes})"
        )
    # same plan-time fail-fast as winnow_fingerprints: the kernel
    # packs ids with np.full(dtype=int64) and the schema is LongType,
    # so a non-integral id would die executor-side mid-job with an
    # opaque numpy ValueError
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise TypeError(
            f"combined_signatures requires an integral {id_col!r} "
            f"(got {id_type}); hash or dense-rank string ids first"
        )
    rows_per_band = num_hashes // bands
    a_const, b_const = _mix_constants(num_hashes)
    fold_mult = np.uint64(0x9E3779B97F4A7C15)
    powers = _winnow_powers(k)
    schema = StructType(
        [StructField(id_col, LongType(), False), *_SCHEMA_TAIL]
    )

    def gen(batches):
        band_idx = np.arange(bands, dtype=np.int32)
        band_kind = np.full(bands, KIND_BAND, dtype=np.int32)
        zeros_band = np.zeros(bands, dtype=np.int64)
        for pdf in batches:
            ids, kinds, idxs, values, ns = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                folded = _minhash_fold_doc(
                    text, n, a_const, b_const, bands, rows_per_band, fold_mult
                )
                ids.append(np.full(bands, doc_id, dtype=np.int64))
                kinds.append(band_kind)
                idxs.append(band_idx)
                values.append(folded)
                ns.append(zeros_band)

                ids.append(np.array([doc_id], dtype=np.int64))
                kinds.append(np.array([KIND_SIMHASH], dtype=np.int32))
                idxs.append(np.zeros(1, dtype=np.int32))
                values.append(np.array([_simhash_doc(text)], dtype=np.int64))
                ns.append(np.zeros(1, dtype=np.int64))

                fps = _winnow_doc(text, k, window, powers)
                ids.append(np.full(len(fps), doc_id, dtype=np.int64))
                kinds.append(np.full(len(fps), KIND_WINNOW, dtype=np.int32))
                idxs.append(np.zeros(len(fps), dtype=np.int32))
                values.append(fps)
                ns.append(np.full(len(fps), len(fps), dtype=np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "kind": np.concatenate(kinds),
                        "idx": np.concatenate(idxs),
                        "value": np.concatenate(values),
                        "n": np.concatenate(ns),
                    }
                )

    return _parallelize_narrow(df.select(id_col, text_col)).mapInPandas(
        gen, schema
    )


def bands_view(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_hash) — drop-in for :func:`dedup.minhash_bands`."""
    return sig.filter(F.col("kind") == KIND_BAND).select(
        id_col, F.col("idx").alias("band"), F.col("value").alias("band_hash")
    )


def simhash_view(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — drop-in for :func:`dedup.simhash_df`."""
    return sig.filter(F.col("kind") == KIND_SIMHASH).select(
        id_col, F.col("value").alias("simhash")
    )


def winnow_view(
    sig: DataFrame, id_col: str = "doc_id", with_counts: bool = True
) -> DataFrame:
    """(id, fingerprint[, n_fp]) — drop-in for
    :func:`text.winnow_fingerprints`."""
    cols = [id_col, F.col("value").alias("fingerprint")]
    if with_counts:
        cols.append(F.col("n").alias("n_fp"))
    return sig.filter(F.col("kind") == KIND_WINNOW).select(*cols)
