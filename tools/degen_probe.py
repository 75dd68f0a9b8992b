"""Degenerate-corpus robustness probe: rewrite sf0.001 into four
adversarial variants (all-degenerate values; single-row tables;
alternating-NULL payload columns; verbatim-duplicated rows) and run every queries() entry
against each, reporting exceptions. Round-10 findings (all fixed,
pinned in tests/test_degenerate.py): zero-norm cosine DIVIDE_BY_ZERO
in five vector gates, zero-quantity DIVIDE_BY_ZERO in q2, zero-row
source batches crashing run_batch, and schema inference failing on a
footerless pairs sink.

Usage: python tools/degen_probe.py [src_sf_dir]"""
import os
import sys
import traceback

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__ as entry
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

spark = get_spark(app_name="degen_probe")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def build(variant: str, out: str):
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if variant == "single":
            df = df.limit(1)
        elif variant == "degen":
            if t == "documents":
                df = df.select(
                    "doc_id",
                    F.lit("").alias("text"),
                    F.lit("en").alias("lang"),
                    F.lit("web").alias("source"),
                    F.lit(0).cast("bigint").alias("n_chars"),
                )
            elif t == "embeddings":
                df = df.select(
                    "vec_id",
                    F.transform("embedding", lambda x: F.lit(0.0).cast("float")).alias("embedding"),
                    F.lit(0).cast("int").alias("label"),
                )
            elif t == "events":
                df = df.select(
                    "event_id",
                    F.lit(1700000000000000).cast("bigint").alias("ts"),
                    F.lit(1).cast("bigint").alias("user_id"),
                    F.lit("view").alias("event_type"),
                    F.lit(0.0).alias("value"),
                    F.lit("{}").alias("props"),
                )
            elif t == "lineitem":
                df = (df.withColumn("l_quantity", F.lit(0.0))
                        .withColumn("l_extendedprice", F.lit(0.0))
                        .withColumn("l_discount", F.lit(0.0))
                        .withColumn("l_tax", F.lit(0.0))
                        .withColumn("l_returnflag", F.lit("N"))
                        .withColumn("l_linestatus", F.lit("O")))
            elif t == "orders":
                df = (df.withColumn("o_totalprice", F.lit(0.0))
                        .withColumn("o_orderstatus", F.lit("O"))
                        .withColumn("o_orderpriority", F.lit("1-URGENT")))
        elif variant == "dupes":
            # duplicate every 10th row VERBATIM (same id, same
            # payload) — the at-least-once ingestion-retry shape;
            # joins fan out, maps must aggregate before building,
            # dedup sees genuine duplicates
            key = {"documents": "doc_id", "embeddings": "vec_id",
                   "events": "event_id", "orders": "o_orderkey",
                   "lineitem": "l_orderkey"}.get(t)
            if key is not None:
                df = df.union(df.filter(F.col(key) % 10 == 0))
        elif variant == "nulls":
            # NULL every nullable payload column on alternating rows
            # (ids and join keys stay non-null): the realistic shape
            # of a 100 TB corpus with missing text / embeddings /
            # attributes, and the input most likely to crash Arrow
            # kernels that np.stack arrays.
            key = {"documents": "doc_id", "embeddings": "vec_id",
                   "events": "event_id", "lineitem": "l_orderkey",
                   "orders": "o_orderkey"}.get(t)
            if key is not None:
                keep_keys = {key, "l_partkey", "l_suppkey", "o_custkey",
                             "user_id"}
                odd = F.col(key) % 2 == 1
                for c, dt in df.dtypes:
                    if c not in keep_keys:
                        df = df.withColumn(
                            c,
                            F.when(odd, F.lit(None).cast(dt)).otherwise(
                                F.col(c)
                            ),
                        )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


qs = entry.queries()
fails = {}
# DEGEN_SKIP_BATCH=1 runs only the streaming-poison section below
# (the batch matrix is ~199 queries x 4 variants, ~40 min)
_variants = () if os.environ.get("DEGEN_SKIP_BATCH") else (
    "degen", "single", "nulls", "dupes")
for variant in _variants:
    out = f"/tmp/degen_sf/{variant}"
    build(variant, out)
    # events ts written as bigint micros in degen variant; entry._events
    # handles bigint. In "single" the original ns-long column is copied
    # through (read with nanosAsLong => bigint) — also handled.
    for name, fn in sorted(qs.items()):
        try:
            fn(spark, out).count()
        except Exception as exc:
            key = f"{variant}:{name}"
            fails[key] = f"{type(exc).__name__}: {str(exc)[:300]}"
            print(f"FAIL {key}: {fails[key]}", flush=True)
    print(f"== variant {variant} done, fails so far: {len(fails)}", flush=True)

print("TOTAL FAILS", len(fails))
for k, v in fails.items():
    print(k, "=>", v.replace("\n", " ")[:200])


# ----------------------------------------------------- streaming poison
# r10 verdict task #6: the batch matrix above already drives the 7
# memory-sink streaming GATES (they are queries() entries), but the
# checkpoint-restart ingest surfaces (stream_ingest_with_catalog /
# stream_incremental_dedup) are pytest-only. Replay the same poison
# shapes — empty batch, all-NULL payloads, corrupt JSON lines,
# verbatim-duplicated rows — through a crash-and-restart cycle and
# assert exactly-once holds: committed batches never reprocess, the
# killed batch replays, re-draining with no new input changes nothing.

import json as _json
import shutil
import tempfile

import pyspark.errors

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    dedup as dedup_mod,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.sources import (
    writers as writers_mod,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.streaming.ingest import (
    run_available_now,
    stream_ingest_with_catalog,
    stream_incremental_dedup,
)

_BASE_REC = {
    "customerid": "c1", "vehicle": "v1", "category": "cat1",
    "tts": 1704103200, "location": {"lat": 1.0, "lon": 2.0},
    "tags": ["a"],
}

# (variant, list of micro-batch file payloads as RAW LINES)
_POISON_BATCHES = {
    "empty": [
        [_json.dumps(_BASE_REC)],
        [],                                      # zero-record file
        [_json.dumps(dict(_BASE_REC, customerid="c2"))],
    ],
    "nulls": [
        [_json.dumps(_BASE_REC)],
        [_json.dumps({"customerid": "c9", "vehicle": None,
                      "category": None, "tts": None,
                      "location": None, "tags": None})],
        [_json.dumps(dict(_BASE_REC, customerid="c2"))],
    ],
    "corrupt": [
        [_json.dumps(_BASE_REC)],
        ['{"customerid": "c9", "vehicle": TRUNCATED GARBAGE',
         _json.dumps(dict(_BASE_REC, customerid="c8"))],
        [_json.dumps(dict(_BASE_REC, customerid="c2"))],
    ],
    "dupes": [
        [_json.dumps(_BASE_REC)],
        [_json.dumps(dict(_BASE_REC, customerid="c9"))] * 3,  # retry shape
        [_json.dumps(dict(_BASE_REC, customerid="c2"))],
    ],
}


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for ln in lines:
            fh.write(ln + "\n")


def stream_poison_ingest(variant: str, batches) -> None:
    """Crash-restart cycle for the catalog-synced ingest under one
    poison variant. Batch file b2 carries the poison; the crash is
    injected on the SECOND write of the resumed drain so the ledger
    has a committed prefix, exactly like the pytest pin."""
    tmp = tempfile.mkdtemp(prefix=f"poison_{variant}_")
    src, sink, chk = f"{tmp}/src", f"{tmp}/sink", f"{tmp}/chk"
    db = f"poison_{variant}_db"
    try:
        _write_lines(f"{src}/b1.json", batches[0])
        schema = spark.read.json(src).schema

        def run(**kw):
            q = stream_ingest_with_catalog(
                spark, source_path=src, sink_path=sink,
                checkpoint_path=chk, schema=schema,
                catalog_db=db, table_prefix="p", **kw,
            )
            run_available_now(q)

        run()
        base_n = spark.read.parquet(sink).count()

        _write_lines(f"{src}/b2.json", batches[1])
        _write_lines(f"{src}/b3.json", batches[2])

        real_write = writers_mod.write_partitioned
        calls = {"n": 0}

        def dying_write(df, path, partition_cols, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("poison-probe injected crash")
            return real_write(df, path, partition_cols, **kw)

        writers_mod.write_partitioned = dying_write
        try:
            try:
                run(reader_options={"maxFilesPerTrigger": "1"})
            except pyspark.errors.exceptions.captured.StreamingQueryException:
                pass
            else:
                # an all-empty poison batch may legally produce only
                # one write (the empty batch short-circuits) — then
                # the crash never fires and that is fine
                pass
        finally:
            writers_mod.write_partitioned = real_write

        run()  # resume: only the dead batch replays
        once = spark.read.parquet(sink)
        n_once = once.count()
        run()  # idempotence: a drained source must change nothing
        assert spark.read.parquet(sink).count() == n_once, (
            f"{variant}: re-drain changed the sink"
        )
        # exactly-once at the row level: every (customerid, file
        # multiplicity) appears exactly as many times as its source
        # lines × explode shape — with single-tag records that is
        # source-line multiplicity, so compare against the lines.
        import collections
        want = collections.Counter()
        for lines in batches:
            for ln in lines:
                try:
                    rec = _json.loads(ln)
                except ValueError:
                    rec = {"customerid": None}  # corrupt → null row
                want[rec.get("customerid")] += 1
        got = collections.Counter(
            {r["customerid"]: r["n"] for r in once.groupBy("customerid")
             .agg(F.count("*").alias("n")).collect()}
        )
        assert got == want, f"{variant}: got={dict(got)} want={dict(want)}"
        assert n_once >= base_n
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(tmp, ignore_errors=True)


def stream_poison_dedup(variant: str) -> None:
    """Crash-restart cycle for the band-store dedup stream under
    poison documents (empty text, NULL text, duplicated rows,
    whitespace-only). The crash fires after the band-store commit of
    the second batch — the widest at-least-once window — and the
    invariants are: pairs/corpus sinks hold no duplicate rows, and
    the cumulative pair set equals the one-shot batch computation
    over the same corpus (order-independence under replay)."""
    docs_b1 = [(1, "the quick brown fox jumps over the lazy dog again")]
    poison = {
        "empty": [(9, "")],
        "nulls": [(9, None)],
        "corrupt": [(9, " \t\n ")],  # whitespace-only survives JSON
        "dupes": [(9, "the quick brown fox jumps over the lazy dog again")] * 2,
    }[variant]
    docs_b3 = [(2, "the quick brown fox jumps over the lazy dog again")]
    tmp = tempfile.mkdtemp(prefix=f"poison_dd_{variant}_")
    src = f"{tmp}/src"
    try:
        for i, batch in enumerate([docs_b1, poison, docs_b3], 1):
            _write_lines(
                f"{src}/b{i}.json",
                [_json.dumps({"doc_id": d, "text": t}) for d, t in batch],
            )
        schema = spark.read.json(src).schema
        kwargs = dict(n=3, num_hashes=64, bands=32, threshold=0.5)

        def run():
            q = stream_incremental_dedup(
                spark, source_path=src,
                store_path=f"{tmp}/bands", corpus_sink=f"{tmp}/corpus",
                pairs_sink=f"{tmp}/pairs",
                checkpoint_path=f"{tmp}/chk", schema=schema,
                reader_options={"maxFilesPerTrigger": "1"},
                **kwargs,
            )
            run_available_now(q)

        real = dedup_mod.incremental_minhash_dedup
        calls = {"n": 0}

        def crash_after_store(*a, **kw):
            pairs = real(*a, **kw)
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("poison-probe crash after store commit")
            return pairs

        dedup_mod.incremental_minhash_dedup = crash_after_store
        try:
            try:
                run()
            except pyspark.errors.exceptions.captured.StreamingQueryException:
                pass
        finally:
            dedup_mod.incremental_minhash_dedup = real

        run()  # restart from the ledger
        corpus = spark.read.parquet(f"{tmp}/corpus")
        n_rows = corpus.count()
        n_docs = corpus.select("doc_id", "text").distinct().count()
        n_src = len(docs_b1) + len(poison) + len(docs_b3)
        assert n_rows == n_src, f"{variant}: corpus {n_rows} != {n_src}"
        pairs = spark.read.parquet(f"{tmp}/pairs").select("id_a", "id_b")
        assert pairs.count() == pairs.distinct().count(), (
            f"{variant}: duplicate pairs after replay"
        )
        # cumulative set == one-shot batch over the identical corpus
        from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.dedup import (
            minhash_lsh_dedup,
        )
        all_docs = spark.createDataFrame(
            docs_b1 + poison + docs_b3, "doc_id long, text string"
        )
        want = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_dedup(all_docs, **kwargs)
            .select("id_a", "id_b").collect()
        }
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == want, f"{variant}: pairs {got} != one-shot {want}"
        _ = n_docs  # dupes variant: distinct < rows is EXPECTED (verbatim rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


print("== streaming poison probe ==", flush=True)
stream_fails = {}
for variant, batches in _POISON_BATCHES.items():
    for fn, label in ((stream_poison_ingest, "ingest"),
                      (stream_poison_dedup, "dedup")):
        try:
            if label == "ingest":
                fn(variant, batches)
            else:
                fn(variant)
            print(f"OK   stream:{label}:{variant}", flush=True)
        except Exception as exc:
            stream_fails[f"stream:{label}:{variant}"] = (
                f"{type(exc).__name__}: {str(exc)[:300]}"
            )
            print(f"FAIL stream:{label}:{variant}: {traceback.format_exc()[-500:]}",
                  flush=True)

print("STREAM POISON FAILS", len(stream_fails))
for k, v in stream_fails.items():
    print(k, "=>", v.replace("\n", " ")[:200])
