"""Avro OCF codec (functions/avro.py): roundtrips over all five
supported types, both codecs, multi-block files, integrity checks."""

import numpy as np
import pytest

from lulu_crawler_ray.functions.avro import MAGIC, read_avro, write_avro


def _cols(n=1000):
    return (
        {
            "id": list(range(n)),
            "txt": [f"doc {i} éè —" for i in range(n)],
            "score": [i * 0.5 - 17.25 for i in range(n)],
            "ok": [i % 3 == 0 for i in range(n)],
            "blob": [bytes([i % 256, 255 - i % 256]) for i in range(n)],
        },
        {"id": "long", "txt": "string", "score": "double", "ok": "boolean", "blob": "bytes"},
    )


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(codec):
    cols, types = _cols()
    b = write_avro(cols, types, codec=codec, block_rows=300)  # 4 blocks
    back, tp = read_avro(b)
    assert back == cols and tp == types
    assert b[:4] == MAGIC


def test_deflate_compresses():
    cols, types = _cols()
    assert len(write_avro(cols, types, codec="deflate")) < len(
        write_avro(cols, types, codec="null")
    )


def test_long_extremes_and_empty():
    cols = {"v": [-(2**62), -1, 0, 1, 2**62]}
    assert read_avro(write_avro(cols, {"v": "long"}))[0] == cols
    empty = write_avro({"v": []}, {"v": "long"})
    back, tp = read_avro(empty)
    assert back == {"v": []} and tp == {"v": "long"}


def test_integrity_raises():
    cols, types = _cols(50)
    b = bytearray(write_avro(cols, types, codec="deflate"))
    with pytest.raises(ValueError):
        read_avro(b"Obk\x01" + bytes(b[4:]))  # magic
    # flip a byte inside the LAST sync marker
    bad = bytearray(b)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError):
        read_avro(bytes(bad))
    with pytest.raises(Exception):  # deflate payload corruption -> zlib/ValueError
        mid = len(b) // 2
        bad = bytearray(b)
        bad[mid] ^= 0xFF
        read_avro(bytes(bad))


def test_unsupported_schema_rejected():
    with pytest.raises(ValueError):
        write_avro({"v": [1]}, {"v": "int"})  # only long in the subset
