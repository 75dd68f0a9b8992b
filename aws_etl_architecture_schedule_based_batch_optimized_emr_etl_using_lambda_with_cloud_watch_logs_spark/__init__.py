"""PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference ETL architecture
(``anhassan/AWS-ETL-Architecture-Schedule-Based-Batch-Optimized-EMR-ETL-Using-Lambda-With-Cloud-Watch-Logs``):
nested-JSON flattening, partitioned parquet sinks, schema-drift
detection, catalog/partition registration, and incremental
archive/rehydrate ingest — extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection and AQE; Python only runs at plan-construction
time (schema walks, name mangling), never per-row on the hot path.
"""

from . import catalog, config, session  # noqa: F401
from .operators import derive, flatten  # noqa: F401

__version__ = "0.1.0"
