"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference AWS Kinesis -> S3 -> Snowflake pipeline
(kxvinnguyen/aws-snowflake-kinesis-airflow-pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing but with
                   cluster-scale defaults (AQE, shuffle sizing, Arrow).
- ``catalog``    : loader for the driver fixture tables (parquet per table).
- ``functions``  : scalar/column helpers (VARIANT-JSON, text analysis, vectors).
- ``operators``  : composite DataFrame operators (dedup family, similarity
                   search, reference relational ops, multimodal plumbing).
- ``plans``      : the query registry — every SURVEY.md §2 inventory entry as a
                   named (spark, sf_dir) -> DataFrame callable plus DuckDB
                   oracle SQL where SQL-expressible.
- ``sources``    : batch/streaming readers and writers for the landing-zone
                   gzip-JSON format and the synthetic event generator.
- ``streaming``  : Structured Streaming re-expression of the reference's
                   Airflow DAGs (ingest/transform/DQ-gate/summary refresh).
"""

__version__ = "0.1.0"
