"""full_stack_big_data_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``JohnReedLOL/full-stack-big-data`` (a Kafka + Storm + Spark
Streaming lambda-architecture word-count stack), re-expressed Spark-first:

- the data model is the DataFrame (batch) / unbounded DataFrame (streaming),
  replacing the reference's Avro-POJO-over-Kafka record model
  (reference: ``src/main/avro/twitter.avsc:1-19``);
- operators are declarative DataFrame/SQL programs optimized by Catalyst,
  replacing hand-wired Storm topologies and DStream lineage
  (reference: ``storm/topologies/KafkaStormDemo.scala:30-68``);
- streaming is Structured Streaming with checkpointed exactly-once state,
  replacing ZK-offset spouts and at-most-once bolts
  (reference: ``integration/KafkaStormSpec.scala:139-158``).

Beyond reference parity, the engine ships the LLM-data-pipeline operator
set (dedup, similarity search, multimodal columns, text analysis) designed
for 100 TB scale: no driver-side collects, broadcast-bounded joins,
shuffle-minimal plans.

Package layout:

- ``engine``     — SparkSession factory, table catalog over testdata.
- ``functions``  — shared column-expression builders (tokenization,
                   portable hashing, vector math). Each helper has an
                   exactly-equivalent ANSI-SQL form used by the DuckDB
                   differential oracle.
- ``operators``  — the query library (relational corpus, word count,
                   dedup, similarity, text analysis, multimodal).
- ``sources``    — serde + connector builders (Avro/JSON wire formats,
                   Kafka config builders).
- ``streaming``  — Structured Streaming programs (identity pipe, streaming
                   word count, windows, lambda diff, metrics).
- ``plans``      — physical-plan assertions (broadcast, pushdown) used by
                   tests to pin the plans we want at scale.
"""

__version__ = "0.1.0"
