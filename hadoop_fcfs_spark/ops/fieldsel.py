"""Field-selection operator — `cut(1)`-style projection over separator-
split text fields.

Parity target: ``FieldSelectionMapper``/``FieldSelectionHelper``
(reference ``mr-core/mapreduce/lib/fieldsel/FieldSelectionMapper.java:61``,
``FieldSelectionHelper.java:60``). Spec grammar (0-based field ids):

    spec      := key_part [":" value_part]
    part      := item ("," item)*
    item      := N | N "-" M | N "-"        # N-M inclusive; N- = N..end

e.g. ``"6,5,1-3:0-"`` → key = fields 6,5,1,2,3; value = all fields.
Selected fields are re-joined with the separator, exactly like the
reference helper emits Text keys/values.

Implementation is pure Column expressions (``split``/``slice``/
``array_join``) — stays inside whole-stage codegen, no Python in the
hot path, works unchanged at any scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_END = 1 << 30


def _parse_part(part: str) -> list[tuple[int, int]]:
    """Parse one side of the spec into (start, stop) 0-based inclusive
    ranges; stop == _END means 'to end of record'."""
    ranges: list[tuple[int, int]] = []
    if not part:
        return ranges
    for item in part.split(","):
        item = item.strip()
        if not item:
            continue
        if "-" in item:
            lo_s, hi_s = item.split("-", 1)
            lo = int(lo_s)
            hi = int(hi_s) if hi_s else _END
        else:
            lo = hi = int(item)
        if hi < lo:
            continue  # inverted range selects nothing
        ranges.append((lo, hi))
    return ranges


def parse_spec(spec: str) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    key_part, _, value_part = spec.partition(":")
    return _parse_part(key_part), _parse_part(value_part)


def _select_fields(arr: Column, ranges: list[tuple[int, int]], sep: str) -> Column:
    """Concatenate the selected field ranges of a split array, joined by
    `sep`. slice() is 1-based; ranges are 0-based inclusive."""
    pieces = []
    for lo, hi in ranges:
        if hi >= _END:
            pieces.append(F.slice(arr, lo + 1, F.greatest(F.size(arr) - lo, F.lit(0))))
        else:
            pieces.append(F.slice(arr, lo + 1, hi - lo + 1))
    combined = pieces[0] if len(pieces) == 1 else F.concat(*pieces)
    return F.array_join(combined, sep)


def field_selection(
    df: DataFrame,
    input_col: str,
    spec: str,
    separator: str = "\t",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Apply a FieldSelection spec to a text column → (key, value) columns."""
    key_ranges, value_ranges = parse_spec(spec)
    # split() takes a regex — escape the literal separator.
    arr = F.split(F.col(input_col), re.escape(separator), -1)
    cols = []
    if key_ranges:
        cols.append(_select_fields(arr, key_ranges, separator).alias(key_col))
    if value_ranges:
        cols.append(_select_fields(arr, value_ranges, separator).alias(value_col))
    return df.select(*cols)
