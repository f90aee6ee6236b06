"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL pipeline (dipmndl/tf-prisma-api-data-ingestion),
re-expressed Spark-first, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session     - tuned SparkSession factory (local test / cluster posture)
    tables      - test-table loaders for the driver-provided parquet data
    operators/  - composable DataFrame -> DataFrame operators (SURVEY.md §2 IDs)
    sources/    - REST connector (paginated, executor-side), JSON fixtures
    functions/  - scalar/column helpers (timestamps, url-encode, text)
    plans/      - end-to-end report pipelines (EP1/EP3 shapes)
    sinks/      - partitioned writers + staged-commit run transaction
    streaming/  - Structured Streaming ingestion & windowed aggregation
"""

__version__ = "0.1.0"
