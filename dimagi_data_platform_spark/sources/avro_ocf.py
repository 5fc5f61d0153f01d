"""Minimal Avro Object-Container-File codec + a distributed Spark
fallback reader — byte-level evidence for the P10b Avro surface
(VERDICT r12 item 6, the fake_kafka discipline: when the external
connector is absent in a container, hand-assemble the real WIRE FORMAT
and prove the plumbing against it).

Implements the Avro 1.x OCF spec subset needed for typed event
records, from the public specification (magic ``Obj\\x01``; file
metadata as an Avro map<string,bytes> carrying ``avro.schema`` +
``avro.codec``; 16-byte sync marker; data blocks framed as
zigzag-varint record count + byte size + payload + sync echo) with the
standard binary encoders: zigzag varint longs/ints, little-endian IEEE
doubles, length-prefixed UTF-8 strings/bytes, 1-byte booleans, and
``[null, X]`` unions as a branch index + value.

Three layers of evidence:
  1. ``write_ocf``/``read_ocf`` — pure-Python encoder and decoder
     (independent code paths) round-trip record-for-record, and the
     emitted bytes are asserted structurally in tests (magic, metadata
     keys, codec, sync framing).
  2. ``read_avro_fallback`` — a REAL distributed Spark read of OCF
     files without the connector: ``binaryFile`` source → one
     ``mapInPandas`` decode per file → typed rows under the schema
     derived from the embedded writer schema. Per-FILE task
     granularity (the honest fallback posture — the connector splits
     at block boundaries; this path doesn't, so it's for modest files
     or many-file directories, which is exactly the Kafka-archive
     layout it targets).
  3. ``read_avro_any`` — resolver: the external spark-avro DataSource
     when present (sources/files.py gate), this fallback otherwise.

Supported schema subset: records of ``long``/``int``/``double``/
``boolean``/``string``/``bytes`` and ``["null", X]`` unions thereof.
Anything else raises with the field name — loud, never silently
miscoded.
"""

from __future__ import annotations

import io
import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"
#: fixed sync marker for deterministic fixtures (the spec only needs
#: 16 bytes unique per file; callers may override per write)
DEFAULT_SYNC = bytes(range(16))

_SIMPLE = {"long", "int", "double", "boolean", "string", "bytes"}


# --------------------------------------------------------------------------
# binary primitives (Avro spec encodings)
# --------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_exact(buf, n: int, what: str = "value") -> bytes:
    """Checked read: short reads raise instead of silently decoding a
    truncated file as False/empty (the varint path already raises; this
    gives fixed-width and length-prefixed reads the same contract)."""
    raw = buf.read(n)
    if len(raw) != n:
        raise EOFError(
            f"truncated {what}: wanted {n} bytes, got {len(raw)}"
        )
    return raw


def _zigzag_decode(buf: io.BytesIO) -> int:
    u, shift = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        u |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _enc_value(typ, v, field: str) -> bytes:
    if isinstance(typ, list):  # union
        if typ[0] != "null" or len(typ) != 2:
            raise ValueError(f"field {field!r}: only [null, X] unions supported")
        if v is None:
            return _zigzag_encode(0)
        return _zigzag_encode(1) + _enc_value(typ[1], v, field)
    if typ in ("long", "int"):
        return _zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"field {field!r}: unsupported Avro type {typ!r}")


def _dec_value(typ, buf: io.BytesIO, field: str):
    if isinstance(typ, list):
        if typ[0] != "null" or len(typ) != 2:
            raise ValueError(f"field {field!r}: only [null, X] unions supported")
        idx = _zigzag_decode(buf)
        if idx == 0:
            return None
        return _dec_value(typ[1], buf, field)
    if typ in ("long", "int"):
        return _zigzag_decode(buf)
    if typ == "double":
        return struct.unpack("<d", _read_exact(buf, 8, f"double {field!r}"))[0]
    if typ == "boolean":
        return _read_exact(buf, 1, f"boolean {field!r}") == b"\x01"
    if typ == "string":
        n = _zigzag_decode(buf)
        return _read_exact(buf, n, f"string {field!r}").decode("utf-8")
    if typ == "bytes":
        n = _zigzag_decode(buf)
        return _read_exact(buf, n, f"bytes {field!r}")
    raise ValueError(f"field {field!r}: unsupported Avro type {typ!r}")


def _fields(schema: dict) -> list[tuple[str, object]]:
    if schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    return [(f["name"], f["type"]) for f in schema["fields"]]


# --------------------------------------------------------------------------
# object container file
# --------------------------------------------------------------------------


def write_ocf(
    path: str,
    schema_json: str,
    records: list[dict],
    sync: bytes = DEFAULT_SYNC,
    records_per_block: int = 1000,
) -> None:
    """Assemble a spec-compliant OCF file (null codec)."""
    schema = json.loads(schema_json)
    flds = _fields(schema)
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": b"null",
    }
    out = bytearray(MAGIC)
    # file metadata: one map block with N entries, then the 0 terminator
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kraw = k.encode("utf-8")
        out += _zigzag_encode(len(kraw)) + kraw
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += sync
    for i in range(0, len(records), records_per_block):
        chunk = records[i : i + records_per_block]
        payload = bytearray()
        for rec in chunk:
            for name, typ in flds:
                payload += _enc_value(typ, rec.get(name), name)
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(payload))
        out += payload
        out += sync
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(out))


def _parse_header(buf: io.BytesIO) -> tuple[str, list, bytes]:
    """Parse an OCF header from the current position → (writer schema
    JSON, field list, 16-byte sync marker); leaves ``buf`` positioned
    at the first data block."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n = -n
            _zigzag_decode(buf)
        for _ in range(n):
            klen = _zigzag_decode(buf)
            k = _read_exact(buf, klen, "metadata key").decode("utf-8")
            vlen = _zigzag_decode(buf)
            meta[k] = _read_exact(buf, vlen, "metadata value")
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported Avro codec {codec!r} (null only)")
    schema_json = meta["avro.schema"].decode("utf-8")
    flds = _fields(json.loads(schema_json))
    sync = _read_exact(buf, 16, "header sync marker")
    return schema_json, flds, sync


def decode_ocf_bytes(raw: bytes) -> tuple[str, list[dict]]:
    """Decode an OCF byte string → (writer schema JSON, records)."""
    buf = io.BytesIO(raw)
    schema_json, flds, sync = _parse_header(buf)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _zigzag_decode(buf)
        _size = _zigzag_decode(buf)
        for _ in range(count):
            records.append(
                {name: _dec_value(typ, buf, name) for name, typ in flds}
            )
        block_sync = _read_exact(buf, 16, "block sync marker")
        if block_sync != sync:
            raise ValueError("sync marker mismatch — corrupt block framing")
    return schema_json, records


def read_ocf(path: str) -> tuple[str, list[dict]]:
    with open(path, "rb") as f:
        return decode_ocf_bytes(f.read())


# --------------------------------------------------------------------------
# Spark integration
# --------------------------------------------------------------------------


def spark_schema_for(schema_json: str) -> str:
    """DDL schema string for the supported Avro subset (unions nullable;
    Spark columns are nullable either way — the NON-null contract is
    the decoder's to enforce, not the schema's)."""
    m = {
        "long": "bigint",
        "int": "int",
        "double": "double",
        "boolean": "boolean",
        "string": "string",
        "bytes": "binary",
    }
    parts = []
    for name, typ in _fields(json.loads(schema_json)):
        t = typ[1] if isinstance(typ, list) else typ
        if not isinstance(t, str) or t not in m:
            raise ValueError(f"field {name!r}: unsupported Avro type {t!r}")
        parts.append(f"`{name}` {m[t]}")
    return ", ".join(parts)


def _list_ocf_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_")) and not f.endswith(".crc")
        )
    return [path]


def plan_ocf_splits(
    path: str, schema_json: str, split_size: int
) -> list[tuple[str, int, int, str]]:
    """Split plan for a no-connector parallel OCF read (VERDICT r13
    item 3): per file, parse ONLY the header (buffered small read — the
    same metadata-scale I/O a real InputFormat's planner does) to learn
    the per-file sync marker + data start, validate the writer schema
    against the declared reader schema, and cut the remaining byte
    range into ``split_size`` spans → (path, start, end, sync_hex)
    rows. Block ownership is the Hadoop sync-scan contract: a split
    owns every block whose first byte lies in [start, end), located by
    scanning for the sync marker from start-16 (so a block beginning
    exactly at ``start`` — its preceding sync ends there — is owned)."""
    expect_fields = json.loads(schema_json)["fields"]
    splits: list[tuple[str, int, int, str]] = []
    for fp in _list_ocf_files(path):
        size = os.path.getsize(fp)
        with open(fp, "rb") as f:
            head = io.BytesIO(f.read(min(size, 1 << 20)))
        got_schema, _flds, sync = _parse_header(head)
        if json.loads(got_schema)["fields"] != expect_fields:
            raise ValueError(
                f"{fp}: writer schema differs from the declared "
                "reader schema"
            )
        data_start = head.tell()
        start = data_start
        while start < size:
            end = min(start + split_size, size)
            splits.append((fp, start, end, sync.hex()))
            start = end
    return splits


def _decode_split(
    fp: str, start: int, end: int, sync: bytes, flds: list
) -> list[dict]:
    """Decode the blocks a split owns: scan for ``sync`` from
    start-16, then decode [count][size][payload][sync] frames while the
    block begins before ``end`` (payloads may run past ``end`` — the
    last owned block is read to completion, exactly once, because the
    next split's scan lands on a LATER sync). A 16-byte marker
    colliding with payload bytes is the spec's own 2^-128 residual
    risk; the connector carries it identically."""
    records: list[dict] = []
    with open(fp, "rb") as f:  # BufferedReader: logical tell()/peek()
        base = max(0, start - 16)
        f.seek(base)
        window = b""
        pos = -1
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break  # no sync at/after start: nothing owned
            window += chunk
            hit = window.find(sync)
            if hit >= 0:
                pos = base + hit + 16
                break
            base += len(window) - 15
            window = window[-15:]
        if pos < 0 or pos >= end:
            return records
        f.seek(pos)
        while f.tell() < end:
            if not f.peek(1):
                break
            count = _zigzag_decode(f)
            size = _zigzag_decode(f)
            payload = io.BytesIO(_read_exact(f, size, "block payload"))
            for _ in range(count):
                records.append(
                    {n: _dec_value(t, payload, n) for n, t in flds}
                )
            if _read_exact(f, 16, "block sync marker") != sync:
                raise ValueError(
                    f"{fp}: sync marker mismatch — corrupt block framing"
                )
    return records


def read_avro_fallback(
    spark: SparkSession,
    path: str,
    schema_json: str,
    split_size: int | None = None,
) -> DataFrame:
    """Distributed OCF read WITHOUT the spark-avro connector.

    Default (``split_size=None``): the ``binaryFile`` source lists and
    ships whole files to executors (one task per file) and an
    Arrow-batched ``mapInPandas`` decodes each with
    :func:`decode_ocf_bytes` — works on any filesystem Spark can read,
    but one 10 GB file is one task.

    With ``split_size`` set, files are cut at sync-marker boundaries
    into byte-range splits (:func:`plan_ocf_splits`) so ONE large file
    parallelizes across tasks — the same contract the connector's
    InputFormat honors. Each task opens the file directly, so this
    path requires executor-visible paths (local mode, NFS, or a fuse
    mount); the default path has no such requirement.

    The embedded writer schema of every file must match
    ``schema_json`` field-for-field — schema drift raises with the
    file path rather than silently resolving."""
    import pandas as pd

    ddl = spark_schema_for(schema_json)
    want = [f["name"] for f in json.loads(schema_json)["fields"]]
    expect_fields = json.loads(schema_json)["fields"]
    flds = _fields(json.loads(schema_json))

    if split_size is not None:
        splits = plan_ocf_splits(path, schema_json, split_size)

        def decode_splits(batches):
            for pdf in batches:
                for fp, s, e, sync_hex in zip(
                    pdf["path"], pdf["start"], pdf["end"], pdf["sync"]
                ):
                    recs = _decode_split(
                        fp, int(s), int(e), bytes.fromhex(sync_hex), flds
                    )
                    yield pd.DataFrame(
                        {n: [r[n] for r in recs] for n in want}
                        if recs
                        else {n: [] for n in want}
                    )

        plan_df = spark.createDataFrame(
            splits, "path string, start bigint, end bigint, sync string"
        ).repartition(max(1, min(len(splits), 64)))
        return plan_df.mapInPandas(decode_splits, schema=ddl)

    def decode(batches):
        for pdf in batches:
            for raw, fpath in zip(pdf["content"], pdf["path"]):
                got_schema, recs = decode_ocf_bytes(bytes(raw))
                if json.loads(got_schema)["fields"] != expect_fields:
                    raise ValueError(
                        f"{fpath}: writer schema differs from the "
                        "declared reader schema"
                    )
                yield pd.DataFrame(
                    {n: [r[n] for r in recs] for n in want}
                    if recs
                    else {n: [] for n in want}
                )

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(decode, schema=ddl)


def read_avro_any(
    spark: SparkSession, path: str, schema_json: str
) -> DataFrame:
    """The connector's DataSource when registered, else the pure-Python
    distributed fallback — one call site for both deployments."""
    from dimagi_data_platform_spark.sources.files import (
        _avro_available,
        read_avro,
    )

    if _avro_available(spark):
        return read_avro(spark, path, schema_json)
    return read_avro_fallback(spark, path, schema_json)
