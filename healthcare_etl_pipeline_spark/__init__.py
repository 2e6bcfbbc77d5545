"""healthcare_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference repo
``brentmartinmiller/healthcare-etl-pipeline`` (a FastAPI + PostgreSQL batch ETL
service) on top of Apache Spark: DataFrame/SQL-first, Catalyst-optimized,
columnar, designed for 100 TB scale while testable on ``local[*]``.

Layout:
    session     SparkSession builder (UTC, AQE, Arrow).
    catalog     Testdata + warehouse table schemas and loaders.
    operators/  Pure DataFrame -> DataFrame operators (validation split,
                consent gate, encryption transform, ingest sinks, reads,
                dedup, similarity search, text analysis, multimodal).
    functions/  Column-level functions and Pandas UDFs (Fernet encryption,
                JSON-schema validation).
    plans/      Driver-side stage runner reproducing the reference DAG
                engine's observable contract (status/duration/skip/snapshot).
    sources/    Warehouse table definitions and read/write helpers.
    streaming/  Structured Streaming operators (windows, watermark dedup).
    queries/    The registered query library backing ``__spark_entry__``.
"""

__version__ = "0.1.0"
