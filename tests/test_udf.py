

def test_typedbytes_corrupt_stream_contract():
    """Corrupt typedbytes streams fail tellably: mutations/truncations
    raise ValueError (incl. UnicodeDecodeError) or EOFError ONLY —
    never TypeError (unhashable map key, pre-fix) — and negative
    length/count prefixes raise instead of silently reading nothing
    (range(-n) is empty, so a corrupt count used to yield [] as if the
    frame were valid)."""
    import io

    import numpy as np
    import pytest as _pytest

    from hadoop_fcfs_spark.udf import typedbytes as tb

    vals = [b"xy", 3, 2**40, 1.5, "hello", [1, "a"], {"k": 1}, True]
    blob = b"".join(tb.encode(v) for v in vals)
    assert list(tb.decode_stream(io.BytesIO(blob))) == vals

    rng = np.random.default_rng(9)
    for _ in range(800):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        if rng.random() < 0.3:
            b = bytes(b[: int(rng.integers(1, len(b)))])
        try:
            list(tb.decode_stream(io.BytesIO(bytes(b))))
        except (ValueError, EOFError):
            pass  # the only acceptable failure types

    import struct

    neg_bytes = struct.pack(">Bi", tb.BYTES, -5)
    with _pytest.raises(ValueError, match="length prefix"):
        list(tb.decode_stream(io.BytesIO(neg_bytes)))
    neg_vec = struct.pack(">Bi", tb.VECTOR, -3)
    with _pytest.raises(ValueError, match="vector count"):
        list(tb.decode_stream(io.BytesIO(neg_vec)))
