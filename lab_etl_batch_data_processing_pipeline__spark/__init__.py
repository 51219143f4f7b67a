"""PySpark-native batch analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference batch ETL pipeline (rental-marketplace
Medallion pipeline: Bronze/raw -> Silver/curated -> Gold/presentation,
see SURVEY.md). Everything is expressed declaratively on the DataFrame /
Spark SQL API so Catalyst + AQE pick the physical strategy; nothing here
hand-schedules execution.

Layout
------
- ``session``     SparkSession factory (AQE, shuffle conf, UTC, ANSI policy)
- ``schemas``     StructType registry for the reference tables + testdata
- ``sources``     schema-enforced readers (parquet/csv/jdbc/memory)
- ``operators``   cleaning / enrichment / joins / metrics / text / dedup /
                  similarity operators, each a pure DataFrame -> DataFrame fn
- ``functions``   reusable Column-expression builders (dates, vectors, json)
- ``plans``       pipeline compositions (raw -> curated -> presentation)
- ``streaming``   Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
