"""Regression tests from the round-12 self-review batches (dedup +
similarity modules)."""

from pyspark.sql import functions as F



def test_paragraph_dedup_delimiter_containing_backslash_E(spark):
    """A delimiter containing the literal two-char sequence \\E used
    to terminate the \\Q..\\E quote early and leak the remainder as
    live regex (r12 review find) — the Pattern.quote re-open rule
    keeps it literal."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.dedup import (
        paragraph_dedup,
    )

    delim = "\\E|"
    df = spark.createDataFrame(
        [(1, f"alpha{delim}beta{delim}gamma"), (2, f"beta{delim}delta")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_paragraphs"], r["n_kept"], r["cleaned_text"])
        for r in paragraph_dedup(df, delimiter=delim).collect()
    }
    assert out[1] == (3, 3, f"alpha{delim}beta{delim}gamma")
    # doc 2's 'beta' is a corpus-wide repeat of doc 1's
    assert out[2] == (2, 1, "delta")


def test_minhash_bands_rejects_non_integral_id(spark):
    import pytest

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.dedup import (
        minhash_bands,
        simhash_df,
    )

    df = spark.createDataFrame([("a", "some text")], ["doc_id", "text"])
    with pytest.raises(TypeError, match="integral"):
        minhash_bands(df)
    with pytest.raises(TypeError, match="integral"):
        simhash_df(df)


def test_zero_vector_cosine_is_zero_not_nan(spark):
    """An all-zero embedding made cosine NaN — which Spark ranks
    ABOVE every real double and which passes >= threshold filters, so
    the zero vector became everyone's rank-1 neighbor and a false
    near-dup edge (r12 review find)."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_pudf,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0]),   # failed-embedding artifact
            (3, [1.0, 0.0, 0.001]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    a = df.selectExpr("vec_id AS id_a", "embedding AS va")
    b = df.selectExpr("vec_id AS id_b", "embedding AS vb")
    crossed = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", cosine_pudf(F.col("va"), F.col("vb")).alias("cos")
    )
    vals = {(r["id_a"], r["id_b"]): r["cos"] for r in crossed.collect()}
    import math

    assert vals[(1, 2)] == 0.0 and not math.isnan(vals[(1, 2)])
    assert vals[(2, 3)] == 0.0
    assert vals[(1, 3)] > 0.99
    # and the near-dup pair operator must NOT emit zero-vector edges
    pairs = cosine_near_dup_pairs(df, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 3)}


def test_label_spectrum_tolerates_null_embeddings(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.similarity import (
        label_spectrum,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.9, 0.1], "a"),
            (3, [0.8, 0.2], "a"),
            (4, None, "a"),  # crashed np.stack pre-fix
        ],
        "vec_id bigint, embedding array<double>, label string",
    )
    out = label_spectrum(df).collect()
    assert len(out) == 1 and out[0]["label"] == "a"


def test_embedding_stats_null_rows_excluded(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.similarity import (
        embedding_stats,
    )
    import math

    df = spark.createDataFrame(
        [(1, [3.0, 4.0], "a"), (2, None, "a")],
        "vec_id bigint, embedding array<double>, label string",
    )
    row = embedding_stats(df).collect()[0]
    assert row["n_vectors"] == 1
    assert row["avg_norm"] == 5.0 and not math.isnan(row["avg_norm"])
