"""end_to_end_aws_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine covering (and extending) the data
processing surface of the reference incremental CSV → MySQL ETL pipeline
(`/root/reference/`, surveyed in SURVEY.md):

- relational query core: scans, filters, joins (incl. range / as-of),
  aggregations (hash / distinct / rollup / cube / approx), window
  functions, sorts/limits, set ops, scalar function suites
  (`operators/`)
- ETL parity with the reference semantics: first-row schema inference,
  null audit, clean (dropna + dedup), keyed upsert (merge), incremental
  watermark gate, backfill (`ingest/`)
- LLM-data-pipeline operators: exact / MinHash-LSH / SimHash /
  n-gram-Jaccard / embedding-cosine dedup, vector similarity search,
  text analysis, multimodal binary columns (`operators/` + `functions/`)
- Structured Streaming: file-source ingest, windowed aggregations,
  watermark late-data handling, stateful sessionization (`streaming/`)

Everything is declarative DataFrame/SQL first so Catalyst + AQE pick the
physical strategy; Pandas UDFs only where built-ins cannot express the
semantics. Designed for a multi-executor cluster at large scale
(partition-aware joins, broadcast dims, salting helpers) while testable
on ``local[*]``.
"""

__version__ = "0.1.0"

from end_to_end_aws_data_pipeline_spark.session import get_spark  # noqa: F401
from end_to_end_aws_data_pipeline_spark.catalog import load_tables, table  # noqa: F401
