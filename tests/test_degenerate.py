"""Regression pins for the degenerate-corpus probe findings
(tools/degen_probe.py): zero-norm vectors, zero-quantity lines,
zero-row source batches, and ≤1-document replay corpora must degrade
gracefully (NULL / no-op / empty result), never crash. Each test here
reproduces one crash the probe found on round-10 HEAD."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


@pytest.fixture(scope="module")
def spark():
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )


def test_cosine_col_zero_vector_is_null_not_crash(spark):
    """cosine with a zero-norm operand is NULL (undefined direction),
    not an ANSI DIVIDE_BY_ZERO — and unchanged where norms are
    positive."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        similarity as S,
    )

    d = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [1.0, 0.0])],
        "id bigint, a array<double>, b array<double>",
    )
    rows = {
        r.id: r.c
        for r in d.select(
            "id", S.cosine_col(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    assert rows[1] is None
    assert rows[2] == pytest.approx(1.0)


def test_label_centroid_eval_all_zero_vectors(spark):
    """All-zero embeddings make every centroid zero too: scores are
    NULL, predictions fall back to the deterministic label
    tie-break, and the eval completes instead of crashing."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        similarity as S,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), False),
            StructField("label", IntegerType(), False),
        ]
    )
    emb = spark.createDataFrame(
        [(i, [0.0, 0.0, 0.0], i % 2) for i in range(6)], schema
    )
    out = S.label_centroid_eval(emb).collect()
    assert len(out) == 2  # one row per label, no exception


def test_run_batch_zero_row_source_files_noop(spark, tmp_path):
    """A source dir whose JSON files contain zero rows (a writer
    emitted an empty batch) is a routine no-op tick — inference
    yields no data columns and the derive stage must not be
    reached."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.config import (
        EtlConfig,
    )
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.plans.pipeline import (
        run_batch,
    )

    src = str(tmp_path / "source")
    spark.createDataFrame(
        [], "customerid string, vehicle string, category string, tts bigint"
    ).coalesce(1).write.json(src)
    cfg = EtlConfig(
        source_path=src,
        sink_path=str(tmp_path / "sink"),
        catalog_db_name="degen_noop_db",
        catalog_table_prefix="dg",
    )
    r = run_batch(spark, cfg)
    assert r.catalog_action == "no-op" and r.rows_written == 0


def test_q2_gate_zero_quantity_line(spark, tmp_path):
    """A zero-quantity line yields a NULL unit price (try_divide /
    NULLIF on both engines) and drops at the min comparison; other
    lines rank normally."""
    import __spark_entry__ as entry

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "widget", 15), (2, "gadget", 15)],
        "p_partkey bigint, p_name string, p_size int",
    ).write.parquet(f"{sf}/part.parquet")
    spark.createDataFrame(
        [(10, "supp-a")], "s_suppkey bigint, s_name string"
    ).write.parquet(f"{sf}/supplier.parquet")
    spark.createDataFrame(
        [(100, 1, 10, 0.0, 50.0), (101, 1, 10, 2.0, 30.0),
         (102, 2, 10, 0.0, 10.0)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_quantity double, l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    rows = entry.queries()["q2_min_unit_price"](spark, sf).collect()
    # part 1: only the qty-2 line has a defined unit price (15.0);
    # part 2: its only line is zero-quantity -> NULL -> no row at all
    assert len(rows) == 1
    assert rows[0].p_partkey == 1
    assert rows[0].unit_price == pytest.approx(15.0)


def test_vector_kernels_skip_null_embeddings(spark):
    """NULL embeddings are excluded before every Arrow vector kernel
    (np.stack dies on a None row): the null row is neither a
    neighbor nor a query, and results over the non-null subset are
    unchanged."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        similarity as S,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
            StructField("label", IntegerType(), True),
        ]
    )
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, None, None),  # null vector AND null label
        (3, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(rows, schema)
    bf = S.brute_force_topk(emb, query_ids=[0], k=3).collect()
    assert {r.n_id for r in bf} == {1, 3}  # null row absent
    lsh = S.lsh_topk(emb, query_ids=[0], k=3, n_planes=2, n_tables=2)
    assert 2 not in {r.n_id for r in lsh.collect()}
    pairs = S.cosine_near_dup_pairs(emb, threshold=0.5, exact=True).collect()
    assert all(2 not in (r.id_a, r.id_b) for r in pairs)
    # label evals drop the unlabeled/vector-less row instead of
    # minting a phantom NULL-label class
    ev = S.label_centroid_eval(emb).collect()
    assert {r.label for r in ev} == {0, 1}
    sil = S.label_silhouette(emb).collect()
    assert sum(r.n_vectors for r in sil) == 3


def test_run_batch_all_null_tts_batch(spark, tmp_path):
    """A batch whose tts is NULL on every row is written by the JSON
    writer with the field omitted — on disk identical to a dropped
    column. The pipeline processes it (NULL-derived partition
    columns -> hive default-partition dirs) instead of failing to
    resolve tts."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.config import (
        EtlConfig,
    )
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.plans.pipeline import (
        run_batch,
    )

    src = str(tmp_path / "source")
    spark.createDataFrame(
        [("c1", "suv", "a", None)],
        "customerid string, vehicle string, category string, tts bigint",
    ).coalesce(1).write.json(src)
    cfg = EtlConfig(
        source_path=src,
        sink_path=str(tmp_path / "sink"),
        catalog_db_name="degen_nulltts_db",
        catalog_table_prefix="dg",
    )
    r = run_batch(spark, cfg)
    assert r.rows_written == 1 and r.catalog_action == "created"
    sunk = spark.read.parquet(str(tmp_path / "sink")).collect()
    assert len(sunk) == 1 and sunk[0].year is None


def test_spine_inflation_guards_fire(spark, tmp_path):
    """Calendar-densification fail-fast: a single corrupt far-future
    timestamp would silently mint millions of spine rows (sequence
    from min to max) — the guards raise with the offending span
    instead, and stay silent on healthy spans."""
    import __spark_entry__ as entry
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        temporal as TP,
    )

    daily = spark.createDataFrame(
        [(1, "2024-01-01", 5), (1, "9999-01-01", 1)],
        "key int, day string, cnt long",
    ).withColumn("day", F.col("day").cast("date"))
    with pytest.raises(Exception, match="spans more than 36524 days"):
        TP.zscore_daily_counts(daily).count()
    # healthy span: unchanged (fill + window score)
    ok = spark.createDataFrame(
        [(1, "2024-01-01", 5), (1, "2024-01-20", 9)],
        "key int, day string, cnt long",
    ).withColumn("day", F.col("day").cast("date"))
    assert TP.zscore_daily_counts(ok).count() >= 0

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "1994-01-03", 10.0), (2, "9999-12-31", 20.0)],
        "o_orderkey bigint, o_orderdate string, o_totalprice double",
    ).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    ).write.parquet(f"{sf}/orders.parquet")
    with pytest.raises(Exception, match="span > 100 years"):
        entry.queries()["weekly_gapfill_orders"](spark, sf).count()


def test_stream_incremental_gate_single_doc(spark, tmp_path):
    """A ≤1-document corpus produces a pairs sink with no parquet
    footers; the gate's explicit-schema read returns the correct
    empty pair set (and the one-shot comparison agrees)."""
    import __spark_entry__ as entry

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "only document in the corpus", "en", "web", 27)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = entry.queries()["stream_incremental_dedup_docs"](
        spark, sf
    ).collect()
    assert len(rows) == 1
    assert rows[0].n_pairs == 0
    assert bool(rows[0].incremental_matches_oneshot) is True


def test_all_null_embedding_corpus_degrades_not_crashes(spark, tmp_path):
    """A corpus whose EVERY embedding is NULL (or that is simply
    empty) leaves dim inference with no row at all — ``first()``
    returns None, and round-10 HEAD raised TypeError at the
    ``.first()["d"]`` sites (lsh_topk, lsh_index_write,
    cosine_near_dup_pairs, label_centroid_eval). The guard contract:
    query-shaped ops return their EMPTY result frame with the normal
    schema; the index writer (which cannot build anything without a
    dim) raises a named, actionable ValueError."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        similarity as S,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
            StructField("label", IntegerType(), True),
        ]
    )
    emb = spark.createDataFrame([(0, None, None), (1, None, 0)], schema)

    lsh = S.lsh_topk(emb, query_ids=[0], k=3)
    assert lsh.columns == ["q_id", "n_id", "rank"]
    assert lsh.count() == 0

    pairs = S.cosine_near_dup_pairs(emb, threshold=0.5, exact=False)
    assert pairs.columns == ["id_a", "id_b", "cosine"]
    assert pairs.count() == 0

    ev = S.label_centroid_eval(emb)
    assert ev.columns == [
        "label",
        "n_true",
        "n_pred",
        "tp",
        "precision",
        "recall",
        "f1",
    ]
    assert ev.count() == 0

    with pytest.raises(ValueError, match="no non-NULL embeddings"):
        S.lsh_index_write(emb, str(tmp_path / "idx"))
    # an explicit dim bypasses inference and still writes the meta
    assert S.lsh_index_write(emb, str(tmp_path / "idx2"), dim=4) == 4


def test_minhash_pair_list_single_row_per_pair_under_verbatim_dupes(
    spark, tmp_path
):
    """Verbatim-duplicated document rows (the at-least-once
    ingestion-retry shape, streaming-poison probe r11): the candidate
    set was always distinct, but the exact-verify join fanned out on
    the duplicated (id, text) rows — the pair LIST contract is one
    row per (id_a, id_b), in both the one-shot and the band-store
    incremental paths."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_dedup,
    )

    text = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [(1, text), (9, text), (9, text)], "doc_id long, text string"
    )
    kwargs = dict(n=3, num_hashes=64, bands=32, threshold=0.5)
    out = minhash_lsh_dedup(docs, **kwargs).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 9)]

    store = str(tmp_path / "bands")
    first = spark.createDataFrame([(1, text)], "doc_id long, text string")
    incremental_minhash_dedup(first, store, **kwargs)
    batch = spark.createDataFrame(
        [(9, text), (9, text)], "doc_id long, text string"
    )
    pairs = incremental_minhash_dedup(
        batch, store, old_docs=first, **kwargs
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 9)]


def test_minby_maxby_deterministic_under_ties(spark):
    """The 10× union-scale parity sweep (r11) manufactured exact
    extremal-price ties and Spark/DuckDB picked different argmax
    rows — a bare max_by is an ARBITRARY choice under ties. The gate
    now orders by a (price, key) struct: ties resolve to the
    smallest key on both engines, at any scale."""
    import __spark_entry__ as entry

    d = spark.createDataFrame(
        [(10, "O", 5.0), (2, "O", 5.0), (7, "O", 1.0), (3, "O", 1.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    import tempfile, shutil, os
    tmp = tempfile.mkdtemp(prefix="minby_")
    try:
        for t in ("orders",):
            d.write.parquet(f"{tmp}/{t}.parquet")
        row = entry.queries()["agg_minby_maxby"](spark, tmp).collect()[0]
        assert row.priciest_order == 2   # smallest key among the 5.0 tie
        assert row.cheapest_order == 3   # smallest key among the 1.0 tie
        assert row.max_price == 5.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_minby_maxby_ignores_null_prices(spark):
    """The struct ordering key must not resurrect NULL-price rows: a
    bare min_by skips NULL ordinals, but struct(p, k) is non-NULL as
    a whole and its NULL field sorts FIRST ascending — pre-fix, a
    NULL-price row won cheapest_order while the DuckDB oracle
    (NULLS LAST) picked the real minimum (r11 review finding; the
    degen nulls variant produces exactly this shape). The leading
    null-flag field restores ignores-NULL argmax on both engines;
    an ALL-NULL group degrades to the smallest key on both."""
    import __spark_entry__ as entry
    import duckdb
    import shutil
    import tempfile

    d = spark.createDataFrame(
        [(1, "O", None), (2, "O", 7.0), (3, "O", 9.0),
         (4, "F", None), (5, "F", None)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    tmp = tempfile.mkdtemp(prefix="minby_null_")
    try:
        d.write.parquet(f"{tmp}/orders.parquet")
        rows = {
            r.o_orderstatus: r
            for r in entry.queries()["agg_minby_maxby"](spark, tmp).collect()
        }
        assert rows["O"].priciest_order == 3
        assert rows["O"].cheapest_order == 2  # NOT the NULL-price row 1
        assert rows["F"].priciest_order == 4  # all-NULL: smallest key
        assert rows["F"].cheapest_order == 4
        assert rows["F"].max_price is None
        # both engines agree on the same bytes
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW orders AS SELECT * FROM '{tmp}/orders.parquet/*.parquet'"
        )
        duck = {
            r[0]: r
            for r in con.sql(entry.oracle_sql()["agg_minby_maxby"]).fetchall()
        }
        for k in ("O", "F"):
            assert duck[k][1] == rows[k].priciest_order
            assert duck[k][2] == rows[k].cheapest_order
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
