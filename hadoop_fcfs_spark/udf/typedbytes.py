"""Hadoop Streaming `typedbytes` wire codec (the `-io typedbytes`
binary mode).

Parity target: reference
``tools/hadoop-streaming/src/main/java/org/apache/hadoop/typedbytes/``
(``Type.java`` code table, ``TypedBytesInput.java`` /
``TypedBytesOutput.java`` read/write loops). Every value is one
unsigned type-code byte followed by a big-endian payload:

    0 BYTES   int32 length + raw bytes
    1 BYTE    int8
    2 BOOL    1 byte (0/1)
    3 INT     int32
    4 LONG    int64
    5 FLOAT   float32
    6 DOUBLE  float64
    7 STRING  int32 length + UTF-8 bytes
    8 VECTOR  int32 count + that many values
    9 LIST    values until a MARKER byte
    10 MAP    int32 count + that many key/value pairs
    255 MARKER (list terminator)

Implemented from the published format description above — no reference
code is copied. Python ints outside int32 range are written as LONG,
inside as INT; floats as DOUBLE (the reference apps do the same on the
write side)."""

from __future__ import annotations

import struct
from typing import Any, BinaryIO, Iterator

BYTES, BYTE, BOOL, INT, LONG, FLOAT, DOUBLE, STRING, VECTOR, LIST, MAP = range(11)
MARKER = 255


def encode(obj: Any) -> bytes:
    """Serialize one value to its typedbytes frame."""
    if isinstance(obj, bool):  # before int: bool is an int subclass
        return struct.pack(">BB", BOOL, int(obj))
    if isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        return struct.pack(">Bi", BYTES, len(b)) + b
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        return struct.pack(">Bi", STRING, len(b)) + b
    if isinstance(obj, int):
        if -(2**31) <= obj < 2**31:
            return struct.pack(">Bi", INT, obj)
        return struct.pack(">Bq", LONG, obj)
    if isinstance(obj, float):
        return struct.pack(">Bd", DOUBLE, obj)
    if isinstance(obj, (list, tuple)):
        return struct.pack(">Bi", VECTOR, len(obj)) + b"".join(encode(x) for x in obj)
    if isinstance(obj, dict):
        return struct.pack(">Bi", MAP, len(obj)) + b"".join(
            encode(k) + encode(v) for k, v in obj.items()
        )
    raise TypeError(f"no typedbytes encoding for {type(obj).__name__}")


def _exact(stream: BinaryIO, n: int) -> bytes:
    if n < 0:  # a corrupt length prefix must not silently read nothing
        raise ValueError(f"corrupt typedbytes length prefix {n}")
    buf = b""
    while len(buf) < n:
        chunk = stream.read(n - len(buf))
        if not chunk:
            raise EOFError(f"typedbytes stream truncated: wanted {n} bytes, got {len(buf)}")
        buf += chunk
    return buf


def _read_value(stream: BinaryIO, code: int) -> Any:
    if code == BYTES:
        return _exact(stream, struct.unpack(">i", _exact(stream, 4))[0])
    if code == BYTE:
        return struct.unpack(">b", _exact(stream, 1))[0]
    if code == BOOL:
        return bool(_exact(stream, 1)[0])
    if code == INT:
        return struct.unpack(">i", _exact(stream, 4))[0]
    if code == LONG:
        return struct.unpack(">q", _exact(stream, 8))[0]
    if code == FLOAT:
        return struct.unpack(">f", _exact(stream, 4))[0]
    if code == DOUBLE:
        return struct.unpack(">d", _exact(stream, 8))[0]
    if code == STRING:
        return _exact(stream, struct.unpack(">i", _exact(stream, 4))[0]).decode("utf-8")
    if code == VECTOR:
        n = struct.unpack(">i", _exact(stream, 4))[0]
        if n < 0:
            raise ValueError(f"corrupt typedbytes vector count {n}")
        return [_read_value(stream, _exact(stream, 1)[0]) for _ in range(n)]
    if code == LIST:
        out = []
        while True:
            c = _exact(stream, 1)[0]
            if c == MARKER:
                return out
            out.append(_read_value(stream, c))
    if code == MAP:
        n = struct.unpack(">i", _exact(stream, 4))[0]
        if n < 0:
            raise ValueError(f"corrupt typedbytes map count {n}")
        try:
            return {
                _read_value(stream, _exact(stream, 1)[0]): _read_value(
                    stream, _exact(stream, 1)[0]
                )
                for _ in range(n)
            }
        except TypeError as exc:  # unhashable key from a corrupt stream
            raise ValueError(f"corrupt typedbytes map key: {exc}") from exc
    raise ValueError(f"unknown typedbytes type code {code}")


def decode_stream(stream: BinaryIO) -> Iterator[Any]:
    """Yield decoded values until EOF (EOF between frames is clean end;
    EOF inside a frame raises — matching TypedBytesInput.read())."""
    while True:
        code_b = stream.read(1)
        if not code_b:
            return
        yield _read_value(stream, code_b[0])
