"""Avro Object Container File codec (subset), pure stdlib — a real
data-lake interchange format for the sources surface, from the public
Avro 1.11 spec (no reference file:line possible: /root/reference is
empty, SURVEY.md §0; no avro wheel in this sandbox).

Subset: flat record schemas with long / double / string / boolean /
bytes fields; codecs "null" and "deflate" (raw DEFLATE, per spec).
That covers the flat-table shape a corpus pipeline exchanges; nested
unions/arrays are out of scope and the reader raises on them.

Writer/reader are deliberately block-structured exactly like the spec
(count + size + payload + 16-byte sync marker per block) so a block is
independently decodable — the property that makes Avro splittable at
100 TB. Per-record varint coding is inherently byte-serial (same
position as JPEG/FLAC entropy coding); parallelism comes from
file/block granularity in the Ray stage, not SIMD."""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"
_SUPPORTED = {"long", "double", "string", "boolean", "bytes"}


def _zz_encode(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_decode(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("avro: truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("avro: varint too long")
    return (u >> 1) ^ -(u & 1), pos


def _encode_value(typ: str, v, out: bytearray) -> None:
    if typ == "long":
        out += _zz_encode(int(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        b = str(v).encode("utf-8")
        out += _zz_encode(len(b)) + b
    elif typ == "bytes":
        out += _zz_encode(len(v)) + bytes(v)
    elif typ == "boolean":
        out.append(1 if v else 0)
    else:
        raise ValueError(f"avro: unsupported type {typ}")


def _decode_value(typ: str, buf: bytes, pos: int):
    if typ == "long":
        return _zz_decode(buf, pos)
    if typ == "double":
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = _zz_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("avro: bad length")
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"avro: unsupported type {typ}")


def write_avro(
    columns: dict[str, list],
    types: dict[str, str],
    codec: str = "deflate",
    block_rows: int = 4096,
    name: str = "row",
) -> bytes:
    """Column dict -> Avro OCF bytes. Field order = dict order."""
    fields = list(columns)
    for f in fields:
        if types[f] not in _SUPPORTED:
            raise ValueError(f"avro: unsupported type {types[f]}")
    if codec not in ("null", "deflate"):
        raise ValueError("avro: codec must be null|deflate")
    schema = {
        "type": "record",
        "name": name,
        "fields": [{"name": f, "type": types[f]} for f in fields],
    }
    sjson = json.dumps(schema).encode()
    # deterministic sync marker (content-derived; spec only requires
    # the same 16 bytes on every block of one file)
    sync = hashlib.md5(sjson + str(len(next(iter(columns.values()), []))).encode()).digest()
    out = bytearray(MAGIC)
    out += _zz_encode(2)  # metadata map: 2 entries
    for k, v in (("avro.schema", sjson), ("avro.codec", codec.encode())):
        kb = k.encode()
        out += _zz_encode(len(kb)) + kb + _zz_encode(len(v)) + v
    out += _zz_encode(0)  # end of map
    out += sync

    n = len(next(iter(columns.values()), []))
    cols = [columns[f] for f in fields]
    typs = [types[f] for f in fields]
    for start in range(0, n, block_rows):
        stop = min(start + block_rows, n)
        body = bytearray()
        for i in range(start, stop):
            for c, tp in zip(cols, typs):
                _encode_value(tp, c[i], body)
        payload = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw DEFLATE per spec
            payload = co.compress(payload) + co.flush()
        out += _zz_encode(stop - start) + _zz_encode(len(payload)) + payload + sync
    return bytes(out)


def read_avro(data: bytes) -> tuple[dict[str, list], dict[str, str]]:
    """Avro OCF bytes -> (column dict, type dict). Verifies magic,
    per-block sync markers, and exact record counts."""
    if data[:4] != MAGIC:
        raise ValueError("avro: bad magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = _zz_decode(data, pos)
        if cnt == 0:
            break
        if cnt < 0:  # negative count: long block size follows (spec)
            cnt = -cnt
            _, pos = _zz_decode(data, pos)
        for _ in range(cnt):
            kl, pos = _zz_decode(data, pos)
            k = data[pos : pos + kl].decode()
            pos += kl
            vl, pos = _zz_decode(data, pos)
            meta[k] = data[pos : pos + vl]
            pos += vl
    sync = data[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise ValueError("avro: only record schemas supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for _, tp in fields:
        if not isinstance(tp, str) or tp not in _SUPPORTED:
            raise ValueError(f"avro: unsupported field type {tp}")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec}")

    columns: dict[str, list] = {f: [] for f, _ in fields}
    while pos < len(data):
        cnt, pos = _zz_decode(data, pos)
        size, pos = _zz_decode(data, pos)
        payload = data[pos : pos + size]
        if len(payload) != size:
            raise ValueError("avro: truncated block")
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        p = 0
        for _ in range(cnt):
            for f, tp in fields:
                v, p = _decode_value(tp, payload, p)
                columns[f].append(v)
        if p != len(payload):
            raise ValueError("avro: trailing bytes in block")
    return columns, {f: tp for f, tp in fields}
