"""Incremental-ingest archival (reference J1,
``emr_json_parquet_schema_drift_etl.py:24-51``).

Contract: after a batch is processed, move its source files to an
archive location so the next scheduled run sees only new files;
``rehydrate=True`` reverses direction (archive → rehydration
location) to replay history (:32-33, reference §3.3). In the
reference both are key prefixes *outside* the source prefix
(``s3://bucket/<archive_folder>/<file>``); here they are explicit
directories.

Deviations from the reference, on purpose:

* The reference ignores the DataFrame it's given and re-reads the
  path with full JSON schema inference just to list files (:36-39) —
  an extra data scan. We enumerate files with a text-format read (no
  parsing) or accept a pre-computed list from the batch's
  ``input_file`` column.
* The reference moves objects in a serial driver loop (:47-51) —
  O(files) sequential API calls. We use a thread pool.

At true scale the idiomatic Spark form is a Structured Streaming file
source with ``cleanSource=archive`` + checkpointing (see
``streaming/ingest.py``); this batch implementation preserves the
reference's observable file-move contract on posix paths.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from urllib.parse import urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _to_local(path: str) -> str:
    parsed = urlparse(path)
    return parsed.path if parsed.scheme in ("file", "") else path


def list_source_files(spark: SparkSession, path: str) -> list[str]:
    """Distinct files under ``path`` (A4+D1). Text-format read — no
    JSON parsing or inference paid just to enumerate files."""
    rows = (
        spark.read.format("text")
        .load(path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    return [row["f"] for row in rows]


def archive_files(
    spark: SparkSession,
    src_path: str,
    archive_path: str,
    rehydration_path: str | None = None,
    rehydrate: bool = False,
    files: list[str] | None = None,
    max_workers: int = 16,
) -> list[str]:
    """Move processed files ``src → archive``; with ``rehydrate=True``
    move ``archive → rehydration`` for reprocessing. Returns the new
    paths of the moved files."""
    if rehydrate:
        scan_dir = _to_local(archive_path)
        dest_dir = _to_local(rehydration_path or src_path)
    else:
        scan_dir = _to_local(src_path)
        dest_dir = _to_local(archive_path)

    if files is None:
        files = list_source_files(spark, scan_dir)
    os.makedirs(dest_dir, exist_ok=True)

    def _move(f: str) -> str:
        local = _to_local(f)
        target = os.path.join(dest_dir, os.path.basename(local))
        shutil.move(local, target)
        return target

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(_move, files))
