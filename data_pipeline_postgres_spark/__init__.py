"""data_pipeline_postgres_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``marlovobook/data-pipeline-postgres``
(an Airflow + Postgres + pandas batch ETL pipeline), extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory with scale-aware defaults (AQE, UTC).
- ``catalog``    Test-data table registry / loaders (parquet lake).
- ``schemas``    Explicit StructTypes (reference stores numbers as VARCHAR;
                 we fix that deliberately — SURVEY.md §1.3).
- ``sources``    I/O edges: CSV/parquet lake, JDBC source/sink wrappers,
                 date-partitioned lake layout (SURVEY.md §2.1).
- ``operators``  Relational operators: transforms, aggregation, reshape,
                 window, join-based CDC merge (SURVEY.md §2.2-2.7).
- ``plans``      End-to-end pipelines (flagship material-demand query)
                 and the full driver-facing query/oracle registry.
- ``streaming``  Structured Streaming analogs of the reference's
                 orchestration-level incremental semantics (SURVEY.md §2.9).
- ``functions``  Column-expression helpers (text n-grams/hashing, vector
                 math) shared by the LLM-data-pipeline operators: dedup
                 (exact/MinHash/SimHash/n-gram/embedding), similarity
                 search, text analysis, multimodal binary-column plumbing
                 (SURVEY.md §2.11) — all under ``operators``.
"""

__version__ = "0.1.0"
