"""PySpark-native analytics/ETL engine with the capabilities of
gurvir-dhillon1/PLC-Data-ETL-Pipeline, rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is a Kafka->Avro->Postgres
streaming ETL pipeline; this package re-expresses its dataflow operators as
Structured Streaming / DataFrame primitives and adds the full relational
operator surface plus LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns), designed for 100 TB scale.

Layout:
  session.py   - SparkSession factory with scale-oriented defaults
  catalog.py   - test-table loader (parquet star schema, FIXTURES.md)
  registry.py  - query registry powering __spark_entry__.py
  queries/     - oracle-checked query definitions (SURVEY.md section 2.2)
  operators/   - reusable operator implementations (dedup, similarity, text)
  pipeline/    - reference-parity ETL pipeline (generator, avro, sinks)
  streaming/   - structured-streaming windows / watermark operators
"""

__version__ = "0.1.0"
