"""Pure-Python Avro BINARY value codec (no spark-avro, no broker).

The reference's topics carry Avro-encoded values (reference:
README.md:27,39 ``VALUE_FORMAT='AVRO'``; the producer registers record
schemas explicitly, traffic-generator/generator.py:167-187). The sandbox
classpath ships no spark-avro module (``sources/avro.py`` probes and
reports it honestly), so this module implements the Avro 1.11 BINARY
encoding itself — the wire format those topic values actually use — from
the public specification (https://avro.apache.org/docs/1.11.1/specification/
— varint zigzag longs, length-prefixed utf-8 strings/bytes, IEEE
little-endian floats, union-index-prefixed nullables, record fields in
schema order). Flat record schemas only: exactly the shape every
reference topic uses.

With this, ``VALUE_FORMAT='AVRO'`` is EXECUTABLE end-to-end in-sandbox:
a DataFrame encodes to genuine Avro binary values (what a producer would
put on the wire), and those bytes decode back to typed columns — the
seam a real Kafka deployment swaps for ``from_avro``/``to_avro`` plus a
schema-registry fetch with no query change.

Scale shape: both directions are narrow Arrow ``mapInPandas`` kernels —
one pass over the rows, no shuffle; the schema is a broadcast-sized JSON
literal. Per-row pure-Python serialization is the honest in-sandbox cost
(the native swap point is documented above), the same discipline as the
image codecs.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "avro_schema_for",
    "encode_avro_py",
    "decode_avro_py",
    "decode_avro_resolved",
    "LocalSchemaRegistry",
    "encode_confluent",
    "decode_confluent",
]

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def avro_schema_for(schema: T.StructType, *, name: str = "Value") -> str:
    """Avro record schema JSON for a flat Spark schema (nullable fields
    become ``["null", T]`` unions; timestamps carry the
    ``timestamp-micros`` logical type, exactly how Connect/ksqlDB declare
    event-time fields)."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            avro_t: object = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            try:
                avro_t = _SPARK_TO_AVRO[type(f.dataType)]
            except KeyError:
                raise ValueError(
                    f"unsupported Avro field type: {f.dataType.simpleString()}"
                ) from None
        fields.append(
            {
                "name": f.name,
                "type": ["null", avro_t] if f.nullable else avro_t,
            }
        )
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}
    )


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: bytearray, n: int) -> None:
    z = _zigzag(int(n)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    end = len(data)
    while True:
        if pos >= end:
            raise ValueError(f"truncated varint at byte {pos}")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


def _field_plan(schema_json: str):
    """[(name, base_type, nullable)] in record order."""
    rec = json.loads(schema_json)
    plan = []
    for f in rec["fields"]:
        t = f["type"]
        nullable = isinstance(t, list)
        if nullable:
            t = next(x for x in t if x != "null")
        if isinstance(t, dict):
            t = (
                "timestamp-micros"
                if t.get("logicalType") == "timestamp-micros"
                else t["type"]
            )
        plan.append((f["name"], t, nullable))
    return plan


def _encode_value(buf: bytearray, t: str, v) -> None:
    if t in ("long", "int"):
        _write_long(buf, int(v))
    elif t == "timestamp-micros":
        _write_long(buf, int(pd.Timestamp(v).value) // 1000)
    elif t == "double":
        buf += struct.pack("<d", float(v))
    elif t == "float":
        buf += struct.pack("<f", float(v))
    elif t == "string":
        raw = str(v).encode("utf-8")
        _write_long(buf, len(raw))
        buf += raw
    elif t == "bytes":
        raw = bytes(v)
        _write_long(buf, len(raw))
        buf += raw
    elif t == "boolean":
        buf.append(1 if v else 0)
    else:  # pragma: no cover - schema construction prevents this
        raise ValueError(f"unsupported Avro type {t!r}")


def _decode_value(data: bytes, pos: int, t: str):
    if t in ("long", "int"):
        return _read_long(data, pos)
    if t == "timestamp-micros":
        us, pos = _read_long(data, pos)
        return pd.Timestamp(us * 1000), pos
    if t == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if t == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if t == "string":
        n, pos = _read_long(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError(f"truncated string: need {n} bytes at {pos}")
        return data[pos : pos + n].decode("utf-8"), pos + n
    if t == "bytes":
        n, pos = _read_long(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError(f"truncated bytes: need {n} bytes at {pos}")
        return bytes(data[pos : pos + n]), pos + n
    if t == "boolean":
        if pos >= len(data):
            raise ValueError(f"truncated boolean at byte {pos}")
        return bool(data[pos]), pos + 1
    raise ValueError(f"unsupported Avro type {t!r}")  # pragma: no cover


def encode_avro_py(df: DataFrame, schema_json: str) -> DataFrame:
    """(all columns) → one Avro-binary ``value`` column — what a producer
    writes to the topic. Null fields encode as union index 0, present
    fields as index 1 + value, per the spec.

    Known conflation: in a NULLABLE double field, a genuine NaN value
    encodes as null — Arrow hands null doubles to the kernel as NaN, so
    the two are indistinguishable batch-side (pandas' own conflation).
    Non-nullable doubles pass NaN through bit-exactly."""
    plan = _field_plan(schema_json)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                buf = bytearray()
                for (name, t, nullable), v in zip(plan, row):
                    is_null = v is None or (
                        not isinstance(v, (str, bytes, bytearray))
                        and pd.isna(v)
                    )
                    if nullable:
                        _write_long(buf, 0 if is_null else 1)
                        if is_null:
                            continue
                    elif is_null:
                        raise ValueError(f"null in non-nullable field {name}")
                    _encode_value(buf, t, v)
                out.append(bytes(buf))
            yield pd.DataFrame({"value": out})

    cols = [name for name, _t, _n in plan]
    return df.select(*cols).mapInPandas(_encode, schema="value binary")


def decode_avro_py(
    df: DataFrame, schema_json: str, *, expect_prefix: bytes | None = None
) -> DataFrame:
    """Avro-binary ``value`` column → typed columns (the consumer side).

    ``expect_prefix``: when set, every row's value must START with those
    bytes (the Confluent frame: magic + schema id); decode begins after
    them. A mismatching row raises a clear per-row error instead of the
    confusing 'trailing bytes' failure a wrong writer schema produces —
    this is the cheap 5-byte mixed-schema-id guard (ADVICE r6)."""
    plan = _field_plan(schema_json)
    pre = bytes(expect_prefix) if expect_prefix else b""
    npre = len(pre)
    spark_types = {
        "long": "long",
        "int": "int",
        "timestamp-micros": "timestamp",
        "double": "double",
        "float": "float",
        "string": "string",
        "bytes": "binary",
        "boolean": "boolean",
    }
    out_schema = ", ".join(f"{n} {spark_types[t]}" for n, t, _ in plan)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["value"]:
                data = bytes(raw)
                if npre and data[:npre] != pre:
                    raise ValueError(
                        "frame prefix mismatch: expected "
                        f"{pre.hex()} got {data[:npre].hex()} — mixed "
                        "schema ids in topic? group by id before decoding"
                    )
                pos, rec = npre, []
                for _name, t, nullable in plan:
                    if nullable:
                        idx, pos = _read_long(data, pos)
                        if idx == 0:
                            rec.append(None)
                            continue
                    v, pos = _decode_value(data, pos, t)
                    rec.append(v)
                if pos != len(data):
                    raise ValueError(
                        f"trailing {len(data) - pos} bytes after record"
                    )
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[n for n, _t, _n in plan])

    return df.select("value").mapInPandas(_decode, schema=out_schema)


class LocalSchemaRegistry:
    """In-process stand-in for Confluent Schema Registry's subject store
    (reference: docker-compose.yaml:29-37 runs the real service; no such
    process exists in this sandbox). Implements the part the engine
    needs — subject → versioned schema ids, id → schema — with the same
    semantics a REST client provides (`POST /subjects/{s}-value/versions`,
    `GET /schemas/ids/{id}`); the swap is an HTTP call per method, no
    query change. Registering an identical schema is idempotent (returns
    the existing id), like the real service."""

    def __init__(self) -> None:
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}
        self._next_id = 1

    def register(self, subject: str, schema_json: str) -> int:
        canon = json.dumps(json.loads(schema_json), sort_keys=True)
        for sid in self._subjects.get(subject, []):
            if self._by_id[sid] == canon:
                return sid
        sid = self._next_id
        self._next_id += 1
        self._by_id[sid] = canon
        self._subjects.setdefault(subject, []).append(sid)
        return sid

    def latest(self, subject: str) -> tuple[int, str]:
        versions = self._subjects.get(subject)
        if not versions:
            raise KeyError(f"subject {subject!r} has no registered schema")
        sid = versions[-1]
        return sid, self._by_id[sid]

    def by_id(self, schema_id: int) -> str:
        try:
            return self._by_id[schema_id]
        except KeyError:
            raise KeyError(f"unknown schema id {schema_id}") from None


def encode_confluent(
    df: DataFrame, registry: LocalSchemaRegistry, subject: str
) -> DataFrame:
    """Confluent wire framing around the Avro binary value: one 0x00
    magic byte + big-endian 4-byte schema id + the record's Avro bytes —
    byte-for-byte what a registry-aware producer puts on the topic. The
    schema registers under ``{subject}-value`` (idempotent), exactly the
    subject-naming strategy ksqlDB uses."""
    schema_json = avro_schema_for(df.schema)
    sid = registry.register(f"{subject}-value", schema_json)
    frame = struct.pack(">bI", 0, sid)
    return encode_avro_py(df, schema_json).select(
        F.concat(F.lit(frame), F.col("value")).alias("value")
    )


def decode_confluent(
    df: DataFrame, registry: LocalSchemaRegistry
) -> DataFrame:
    """Strip + validate the Confluent frame, resolve the writer schema by
    id from the registry, decode the Avro payload. The consumer half of
    the wire format. The writer schema id comes from one sampled row;
    the decode kernel then enforces that EVERY row carries that same
    5-byte frame (magic + id) — a mixed-id topic fails with a clear
    per-row error instead of a wrong-schema decode (ADVICE r6)."""
    head = df.select(
        F.col("value").substr(1, 5).alias("h")
    ).limit(1).collect()
    if not head:
        raise ValueError("empty frame: no records to decode")
    magic, sid = struct.unpack(">bI", bytes(head[0].h))
    if magic != 0:
        raise ValueError(f"bad Confluent magic byte {magic}")
    schema_json = registry.by_id(sid)
    frame = struct.pack(">bI", 0, sid)
    return decode_avro_py(
        df.select("value"), schema_json, expect_prefix=frame
    )


# Spec promotions (Avro 1.11 "Schema Resolution"): writer type -> set of
# reader types it may promote to (identity handled separately).
_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


def decode_avro_resolved(
    df: DataFrame,
    writer_schema_json: str,
    reader_schema_json: str,
    *,
    expect_prefix: bytes | None = None,
) -> DataFrame:
    """Decode rows WRITTEN with ``writer_schema_json`` into the columns
    of ``reader_schema_json`` — Avro SCHEMA RESOLUTION per the 1.11 spec
    (the consumer-evolution path the reference's registry flow implies:
    a deployed consumer keeps reading after the producer adds, drops, or
    widens fields):

    - fields match by NAME (writer order drives the byte walk);
    - writer-only fields are decoded and DISCARDED (position must
      advance through their bytes);
    - reader-only fields take the reader's ``default`` (required — a
      missing default is a loud resolution error, as the spec demands);
    - type promotions int->long/float/double, long->float/double,
      float->double, string<->bytes are applied; any other mismatch
      raises naming both types.

    Same narrow Arrow map shape as decode_avro_py.
    """
    wplan = _field_plan(writer_schema_json)
    rrec = json.loads(reader_schema_json)
    rplan = _field_plan(reader_schema_json)
    rdefaults = {f["name"]: f.get("default") for f in rrec["fields"]}
    rtypes = {n: (t, nb) for n, t, nb in rplan}
    wnames = {n for n, _t, _nb in wplan}

    for n, t, _nb in rplan:
        if n not in wnames:
            if rdefaults.get(n) is None and t != "null":
                raise ValueError(
                    f"reader field {n!r} absent from writer schema and has"
                    " no default — unresolvable evolution"
                )
        else:
            wt = next(wt for wn, wt, _ in wplan if wn == n)
            if wt != t and t not in _PROMOTIONS.get(wt, set()):
                raise ValueError(
                    f"field {n!r}: writer type {wt!r} does not resolve to"
                    f" reader type {t!r}"
                )

    def _promote(v, wt: str, rt: str):
        if v is None or wt == rt:
            return v
        if rt in ("long",):
            return int(v)
        if rt in ("float", "double"):
            return float(v)
        if rt == "bytes":
            return v.encode("utf-8") if isinstance(v, str) else v
        if rt == "string":
            return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else v
        return v

    pre = bytes(expect_prefix) if expect_prefix else b""
    npre = len(pre)
    spark_types = {
        "long": "long",
        "int": "int",
        "timestamp-micros": "timestamp",
        "double": "double",
        "float": "float",
        "string": "string",
        "bytes": "binary",
        "boolean": "boolean",
    }
    out_schema = ", ".join(f"{n} {spark_types[t]}" for n, t, _ in rplan)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["value"]:
                data = bytes(raw)
                if npre and data[:npre] != pre:
                    raise ValueError(
                        f"frame prefix mismatch: expected {pre.hex()} got "
                        f"{data[:npre].hex()}"
                    )
                pos = npre
                got: dict = {}
                for name, wt, nullable in wplan:
                    if nullable:
                        idx, pos = _read_long(data, pos)
                        if idx == 0:
                            got[name] = None
                            continue
                    v, pos = _decode_value(data, pos, wt)
                    got[name] = v
                if pos != len(data):
                    raise ValueError(
                        f"trailing {len(data) - pos} bytes after record"
                    )
                rec = []
                for name, rt, _nb in rplan:
                    if name in got:
                        wt = next(wt for wn, wt, _ in wplan if wn == name)
                        rec.append(_promote(got[name], wt, rt))
                    else:
                        rec.append(rdefaults[name])
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[n for n, _t, _n in rplan])

    return df.select("value").mapInPandas(_decode, schema=out_schema)
