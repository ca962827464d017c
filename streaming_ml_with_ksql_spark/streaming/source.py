"""Streaming sources.

The reference consumes Kafka topics with Avro values (reference:
README.md:27,39 — ``VALUE_FORMAT='AVRO'``; docker-compose.yaml:29-37 for
the schema registry). The driver environment has no Kafka broker, so the
first-class source here is the **file stream** over parquet — semantically
the same unbounded append-only stream, and the standard way to replay a
recorded topic. The Kafka/Avro path is a thin seam (`kafka_stream`) kept
behind a capability check so the same queries run unchanged against a real
broker.

Scale notes:
- File-stream listing cost is O(files) per trigger; at 100 TB use
  `maxFilesPerTrigger` for admission control and compact small files
  upstream. State (seen-files log) lives in the checkpoint.
- `shard_table_to_dir` re-shards by *time range* so replay preserves rough
  arrival order — watermark semantics then match a live topic (no
  artificial late data from file ordering).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["shard_table_to_dir", "stream_parquet_dir", "kafka_stream", "kafka_available"]


def shard_table_to_dir(
    df: DataFrame,
    path: str,
    *,
    num_shards: int = 4,
    order_col: str = "ts",
) -> str:
    """Materialize a batch table as `num_shards` time-range parquet shards
    whose file mtimes ascend with the time range — a deterministic replay
    of the stream's arrival order (shard k+1 holds strictly later events
    than shard k, so a maxFilesPerTrigger=1 file stream sees in-order
    batches, like a topic with bounded disorder)."""
    df.repartitionByRange(num_shards, F.col(order_col)).sortWithinPartitions(
        order_col
    ).write.mode("overwrite").parquet(path)
    # FileStreamSource admits files oldest-mtime-first; parquet part files
    # are named in range order (part-00000 is the earliest range), so stamp
    # ascending mtimes to pin replay order.
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = time.time() - len(parts)
    for i, fname in enumerate(parts):
        os.utime(os.path.join(path, fname), (base + i, base + i))
    return path


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Unbounded stream over a directory of parquet files (schema pinned
    from the existing files, as file streams require a static schema)."""
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def kafka_available(spark: SparkSession) -> bool:
    """True iff the spark-sql-kafka connector is on the classpath."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "none:9092"
        ).option("subscribe", "probe").load()
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source seam (reference: README.md:27,39 declares streams over
    topics with `earliest` reset, docker-compose.yaml:87). Value decoding
    (`from_avro` with a registry-fetched schema) is the caller's step —
    this returns the raw key/value/timestamp frame.

    Untestable in this environment (no broker, no kafka connector jar);
    the file-stream path above exercises the identical downstream logic.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
