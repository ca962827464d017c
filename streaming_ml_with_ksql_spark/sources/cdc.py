"""Debezium CDC envelope handling.

The reference tails the MySQL binlog with Debezium and flattens the
change envelope with the ``ExtractNewRecordState`` SMT before KSQL sees it
(reference: infra/connect/mysql-source.json:17-19 — ``transforms:
unwrap``, ``delete.handling.mode: drop`` defaults; binlog config
infra/mysql/mysql.cnf:8-11; ``snapshot.mode=when_needed`` gives an
initial full snapshot, mysql-source.json:16). The KSQL side then rekeys
the flattened stream and materializes a latest-per-key TABLE
(reference: README.md:27-29).

Here the SMT becomes a DataFrame transformation (works identically on
batch and streaming frames):

    raw envelope {before, after, op, ts_ms}  →  unwrap_debezium  →
    flat change rows  →  cdc_snapshot (latest-per-key)  →  current table

Scale notes: unwrap is a narrow projection (no shuffle); the snapshot is
one max_by shuffle on the key — the same bounded-state shape as
operators.dedup.latest_per_key, which is what a 100 TB changelog compacts
to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import latest_per_key

__all__ = ["unwrap_debezium", "cdc_snapshot", "scd2_history", "debezium_json_wire", "parse_debezium_json"]

# Debezium op codes: c=create, u=update, r=snapshot read, d=delete.
_UPSERT_OPS = ("c", "u", "r")


def unwrap_debezium(
    envelope: DataFrame,
    *,
    keep_deletes: bool = False,
    ts_col: str = "__ts_ms",
    op_col: str = "__op",
) -> DataFrame:
    """Flatten a Debezium change envelope to row-level changes — the
    engine-side ``ExtractNewRecordState`` SMT (reference:
    infra/connect/mysql-source.json:17-19).

    Expects columns ``before`` (struct|null), ``after`` (struct|null),
    ``op`` (string), ``ts_ms`` (long). Upserts surface ``after.*``;
    deletes (dropped by default, like the reference's SMT configuration)
    surface ``before.*`` with ``__op = 'd'`` when ``keep_deletes`` so a
    downstream MERGE can act on them. Change metadata is kept in
    ``__op`` / ``__ts_ms`` for ordering.
    """
    upserts = envelope.filter(F.col("op").isin(*_UPSERT_OPS)).select(
        F.col("after.*"),
        F.col("op").alias(op_col),
        F.col("ts_ms").alias(ts_col),
    )
    if not keep_deletes:
        return upserts
    deletes = envelope.filter(F.col("op") == "d").select(
        F.col("before.*"),
        F.col("op").alias(op_col),
        F.col("ts_ms").alias(ts_col),
    )
    return upserts.unionByName(deletes)


def cdc_snapshot(
    envelope: DataFrame,
    key: str | list[str],
    *,
    ts_col: str = "__ts_ms",
    drop_meta: bool = True,
) -> DataFrame:
    """Materialize the current table from a changelog — unwrap, apply the
    newest change per key, and remove keys whose newest change is a delete
    (KSQL TABLE upsert semantics over the CDC topic, reference:
    README.md:29 + mysql-source.json).
    """
    changes = unwrap_debezium(envelope, keep_deletes=True)
    latest = latest_per_key(changes, key, ts_col)
    live = latest.filter(F.col("__op") != "d")
    return live.drop("__op", ts_col) if drop_meta else live


def scd2_history(
    envelope: DataFrame,
    key: str | list[str],
    *,
    ts_col: str = "__ts_ms",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a CDC changelog:
    every upsert becomes a versioned row with ``valid_from`` /
    ``valid_to`` (the next change's timestamp — including a delete, which
    closes the version without opening one) and ``is_current``.

    One shuffle on the key + an ordered lead() pass — the warehouse-side
    complement of cdc_snapshot (which keeps only the newest version).
    ``valid_to`` is DOUBLE (it is NULL for current rows, and nullable
    integers degrade across the oracle's pandas bridge).
    """
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)
    changes = unwrap_debezium(envelope, keep_deletes=True)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    versioned = (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w).cast("double"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    payload = [c for c in changes.columns if c not in ("__op", ts_col)]
    return versioned.filter(F.col("__op") != "d").select(
        *payload, "valid_from", "valid_to", "is_current"
    )


def debezium_json_wire(envelope: DataFrame) -> DataFrame:
    """Serialize an envelope frame to the JSON bytes a Debezium topic
    actually carries (producer side of the wire; used by the round-trip
    checks — a real deployment's bytes come off Kafka)."""
    return envelope.select(
        F.to_json(F.struct("before", "after", "op", "ts_ms")).alias("value")
    )


def parse_debezium_json(wire: DataFrame, row_type: str) -> DataFrame:
    """Parse Debezium JSON topic values back into the typed envelope —
    the consumer edge a real deployment points at the connector's topic.
    Explicit schema (no inference scan), FAILFAST (a malformed change
    record is an error, never a silently-null envelope). JVM from_json —
    no Python in the path; works identically on batch and streaming
    frames."""
    env_schema = (
        f"struct<before:{row_type},after:{row_type},"
        "op:string,ts_ms:bigint>"
    )
    return wire.select(
        F.from_json("value", env_schema, {"mode": "FAILFAST"}).alias("e")
    ).select("e.*")
