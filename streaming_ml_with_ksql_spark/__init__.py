"""A PySpark-native analytics engine with the query & data-processing
capabilities of the reference MLOps pipeline (getindata/streaming-ml-with-ksql).

The reference declares its workload as KSQL continuous queries over Kafka
topics (stream/table duality, hopping-window aggregation, stream-table joins,
an ML-scoring UDF) plus a Spark MLlib training job. This package re-expresses
that capability surface — and extends it with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns) — as idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for the streaming path, Pandas UDFs only where built-ins
genuinely cannot express the semantics.

Layout:
    session     SparkSession factory (UTC, AQE, Arrow)
    io          parquet loaders for the driver testdata tables
    operators/  windowed aggregation, joins, dedup, rolling features,
                similarity search, text analysis, multimodal plumbing
    functions/  scalar function parity (TIMESTAMPTOSTRING, as_array, ...)
    ml/         training pipeline + registry-style scoring operator
    plans/      multi-table relational plans (TPC-H-style sanity queries)
    streaming/  Structured Streaming twins of the batch operators
"""

__version__ = "0.1.0"
