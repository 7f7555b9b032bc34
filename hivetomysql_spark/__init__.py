"""hivetomysql_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL tool
``lizhihao132/hiveToMysql`` (a single-file Java Hive→MySQL exporter,
see /root/reference/HiveToMysql.java) as an idiomatic Spark engine:

* **Reference-parity tier** — config-driven source→mapping→sink
  pipeline with the reference's field-mapping, ``$var``/``#literal``
  constants, NULL rule, validation error codes, and
  delete-before-insert idempotent JDBC load
  (:mod:`hivetomysql_spark.pipeline`,
  :mod:`hivetomysql_spark.sinks.jdbc`).
* **Extension tier** — full relational analytics (joins, aggregations,
  windows, set ops, scalar functions), LLM-data-pipeline operators
  (dedup, similarity search, multimodal columns, text analysis), and
  Structured Streaming, all designed for 100 TB scale
  (:mod:`hivetomysql_spark.operators`,
  :mod:`hivetomysql_spark.streaming`).

Everything here is plain DataFrame API / Spark SQL: the logical plan
is declared, Catalyst + AQE pick the physical strategy.
"""

__version__ = "0.1.0"
