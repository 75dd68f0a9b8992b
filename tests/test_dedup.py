

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
