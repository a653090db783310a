"""stellarsql_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities
of the reference ``stellarsql/StellarSQL`` (a minimal single-node Rust
SQL DBMS: DDL, INSERT, filtered scans over typed tables), re-expressed
idiomatically on Spark SQL / DataFrame / Catalyst / Structured
Streaming, and extended with the full OLAP + LLM-data-pipeline surface
declared in SURVEY.md §2.

Layout:
    session.py    SparkSession factory tuned for local[N] testing
    catalog.py    parquet table loading + temp-view registration
    registry.py   query registry binding Spark builders to DuckDB oracles
    operators/    relational operators (scan/filter/join/agg/window/...)
    sources/      read/write connectors (parquet/csv/json, partitioned)
    functions/    scalar function families + UDF/UDAF/UDTF surface
    plans/        plan introspection / explain helpers
    streaming/    Structured Streaming operators (windows, stateful)
    pipeline/     LLM-data-pipeline ops (dedup, similarity, text, multimodal)
"""

from stellarsql_spark.registry import all_specs, get_spec  # noqa: F401

__version__ = "0.1.0"
