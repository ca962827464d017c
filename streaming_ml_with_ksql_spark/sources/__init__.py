"""Connector-facing source adapters (SURVEY.md §2.1 S1-S7).

The reference's ingestion edge is Kafka: Avro-encoded topics registered in
a schema registry (reference: README.md:27,39), a Debezium MySQL CDC
source feeding the ``users`` topic (reference: infra/connect/
mysql-source.json), and a MongoDB sink (infra/connect/mongo-sink.json).
This package re-expresses those integration points Spark-first:

- ``cdc``: Debezium envelope unwrap + snapshot materialization — the
  engine-side semantics of the ExtractNewRecordState SMT;
- ``avro``: from_avro/to_avro seam, capability-gated (the spark-avro
  module may not be on the classpath in every deployment).

File/parquet loading lives in ``io`` (batch) and ``streaming.source``
(file streams); Kafka stream/sink seams live in ``streaming``.
"""

from . import avro, cdc

__all__ = ["avro", "cdc"]
