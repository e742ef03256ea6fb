

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


def test_map_records_skipping_quarantines_and_budgets(spark):
    """SkipBadRecords parity (`map_records_skipping`): records whose fn
    raises become quarantine rows (NULL outputs + 'ExcType: msg |
    record=...' audit trail) instead of task deaths; the skipped-record
    counter is a plain filter+count; and a finite max_skip_records
    budget fails the task once exceeded, like
    mapreduce.map.skip.maxrecords."""
    import pytest as _pytest

    from hadoop_fcfs_spark.udf.pandas_ops import map_records_skipping

    df = spark.range(20).toDF("v")

    def explode_unless_multiple_of_7(rec):
        if rec["v"] % 7 == 0:
            raise RuntimeError(f"bad record {rec['v']}")
        yield {"v": rec["v"], "doubled": rec["v"] * 2}

    out = map_records_skipping(
        df, explode_unless_multiple_of_7, "v long, doubled long"
    )
    rows = out.collect()
    good = [r for r in rows if r["__skip_error"] is None]
    skipped = [r for r in rows if r["__skip_error"] is not None]
    assert len(good) == 17 and len(skipped) == 3  # 0, 7, 14
    assert all(r["doubled"] == r["v"] * 2 for r in good)
    assert all(r["v"] is None and r["doubled"] is None for r in skipped)
    assert all("bad record" in r["__skip_error"] for r in skipped)
    assert all("record={" in r["__skip_error"] for r in skipped)
    # counters are derivable aggregations, not side channels
    assert out.filter("__skip_error is not null").count() == 3

    # budget: 3 bad records in ONE task with max 1 -> the task fails
    with _pytest.raises(Exception, match="bad record"):
        map_records_skipping(
            df.repartition(1), explode_unless_multiple_of_7,
            "v long, doubled long", max_skip_records=1,
        ).collect()


def test_map_records_skipping_comma_bearing_types(spark):
    """Output schemas whose TYPES contain commas — decimal(10,2),
    map<string,int> — must still derive the right column names for the
    quarantine NULL rows (a naive split(',') yields bogus names and the
    yielded frames mismatch the declared schema even with zero bad
    records)."""
    from decimal import Decimal

    from hadoop_fcfs_spark.udf.pandas_ops import map_records_skipping

    df = spark.range(6).toDF("v")

    def emit(rec):
        if rec["v"] == 3:
            raise ValueError("boom")
        yield {
            "v": rec["v"],
            "price": Decimal(rec["v"]) / 4,
            "tags": {"n": rec["v"]},
        }

    out = map_records_skipping(
        df, emit, "v long, price decimal(10,2), tags map<string,int>"
    )
    assert [f.name for f in out.schema.fields] == [
        "v", "price", "tags", "__skip_error",
    ]
    rows = out.collect()
    good = {r["v"]: r for r in rows if r["__skip_error"] is None}
    bad = [r for r in rows if r["__skip_error"] is not None]
    assert sorted(good) == [0, 1, 2, 4, 5] and len(bad) == 1
    assert good[2]["price"] == Decimal("0.50") and good[2]["tags"] == {"n": 2}
    assert bad[0]["v"] is None and bad[0]["price"] is None and bad[0]["tags"] is None
