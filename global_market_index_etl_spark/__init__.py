"""gmie-spark — a PySpark-native analytics engine with the query and
data-processing capabilities of 0x22B9/Global-Market-Index-ETL.

The reference (read-only at /root/reference/) is a single-process pandas ETL
that ingests OHLCV market bars, standardizes them, converts prices to USD and
upserts into PostgreSQL, with an ad-hoc SQL query surface delegated to the
DBMS (reference README.md:316-357). This package re-expresses every operator
of that surface — plus the large-scale training-data operators a 100 TB
pipeline needs (dedup, similarity search, text analysis, multimodal plumbing)
— as idiomatic Spark DataFrame/SQL plans optimized by Catalyst.

Layout:
    session.py    SparkSession factory (UTC session tz, AQE, sane shuffle)
    schemas.py    declared StructTypes + the 10-row indices seed dimension
    sources/      parquet table loaders, fixture generators, FX-rate sources
    operators/    standardize, fx, upsert, dedup, similarity, text, quality
    functions/    reusable column expressions (shared Spark-side helpers)
    plans/        named query definitions + DuckDB oracle SQL (driver contract)
    streaming/    Trigger.AvailableNow incremental ingest (foreachBatch upsert)
"""

__version__ = "0.1.0"
