"""crypto_etl_airflow_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline ``vinisouzza/crypto-etl-airflow``
(see /root/reference), built Spark-first:

- the logical plan is declared with the DataFrame/SQL API and Catalyst
  picks the physical strategy (predicate pushdown, column pruning,
  broadcast-vs-SMJ join selection, AQE re-planning);
- Python touches rows only through Arrow-batched Pandas UDFs, and only
  where built-in operators genuinely cannot express the semantics;
- every ingestion write goes through an idempotent insert-if-absent
  writer matching the reference's ``ON CONFLICT DO NOTHING`` contract
  (reference dags/crypto-etl-pipeline-psql.py:85-89);
- data quality is a declarative check set compiled to one aggregation
  job (reference include/soda/checks.yml:1-9).

Package layout::

    session      SparkSession factory (AQE on, UTC, tuned shuffle)
    sources/     parquet star-schema loader, HTTP/JSON ingest adapters
    operators/   upsert, as-of join, dedup, similarity, text, multimodal
    functions/   scalar helper expressions (pure Column -> Column)
    plans/       the declared query surface (name -> builder + oracle SQL)
    quality/     declarative data-quality checks -> one agg job -> gate
    streaming/   Structured Streaming ingest + windowed analytics
"""

__version__ = "0.1.0"
