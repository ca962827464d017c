"""Text-format source/sink breadth: JSONL and CSV round-trips.

The reference ingests Avro-on-Kafka (SURVEY.md §2.1 S1; the Avro seam
lives in sources/avro.py) — but a corpus pipeline at 100 TB meets raw
text formats constantly (web dumps arrive as JSONL, tabular exports as
CSV). These helpers materialize a table through the format's writer and
read it back with an EXPLICIT schema, which is the part that matters:

- JSONL: unicode escapes round-trip exactly; schema is passed, never
  inferred (inference is a full extra scan at scale and non-deterministic
  under sampling).
- CSV: ``quoteAll`` + doubled-quote escaping on write, ``multiLine`` on
  read — embedded newlines and quotes in document text survive. FAILFAST
  mode: a malformed row is an error, not a silently-nulled record.

Scale notes: both writers shard by the frame's partitioning (no global
coordination); readers split JSONL by line and CSV by record with
multiLine handling per file. Parquet remains the engine's native format —
these exist for interchange parity, and the oracle (the parquet table
itself) proves the round-trip is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import io as io_mod

__all__ = ["documents_via_jsonl", "documents_via_csv", "documents_via_orc"]


def _roundtrip(df: DataFrame, path: str, fmt: str) -> DataFrame:
    spark = df.sparkSession
    if fmt == "json":
        df.write.mode("overwrite").json(path)
        return spark.read.schema(df.schema).option("mode", "FAILFAST").json(path)
    if fmt == "csv":
        # Without an explicit null sentinel, Spark's CSV reader collapses
        # quoted-empty fields to NULL — an empty string would not survive
        # the round-trip (verified live). Writing NULL as a sentinel and
        # reading with nullValue=sentinel + emptyValue="" keeps '' and
        # NULL distinct. The sentinel must be a token that cannot occur in
        # data: univocity applies nullValue AFTER unquoting, so a genuine
        # field value equal to the sentinel would silently read back as
        # NULL (the classic \N collision). A long tagged random token
        # makes that collision practically impossible.
        sentinel = "\\N{9f1c2d7e4b5a6980}"
        (
            df.write.mode("overwrite")
            .options(header=True, quoteAll=True, escape='"', nullValue=sentinel)
            .csv(path)
        )
        return (
            spark.read.schema(df.schema)
            .options(
                header=True,
                multiLine=True,
                quote='"',
                escape='"',
                nullValue=sentinel,
                emptyValue="",
            )
            .option("mode", "FAILFAST")
            .csv(path)
        )
    raise ValueError(fmt)


def documents_via_jsonl(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """documents → JSONL on disk → read back with explicit schema."""
    return _roundtrip(io_mod.load_table(spark, sf_dir, "documents"), path, "json")


def documents_via_csv(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """documents → quoted CSV on disk → multiLine read with explicit schema."""
    return _roundtrip(io_mod.load_table(spark, sf_dir, "documents"), path, "csv")


def documents_via_orc(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """documents → ORC on disk → read back with explicit schema. The
    columnar-interchange sibling of the text formats: ORC is the other
    splittable columnar container a lake migration meets (Hive-era
    tables); types round-trip natively, so this needs no sentinel
    machinery — the oracle (the parquet table) proves losslessness."""
    df = io_mod.load_table(spark, sf_dir, "documents")
    df.write.mode("overwrite").orc(path)
    return spark.read.schema(df.schema).orc(path)
