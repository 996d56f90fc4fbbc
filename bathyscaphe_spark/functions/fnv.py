"""FNV-1/64 hashing, bit-exact with Go's ``hash/fnv`` ``New64()``.

The reference stores URL-seen entries keyed by the FNV-1/64 hash of the
normalized URL rendered as a decimal string (reference:
internal/scheduler/scheduler.go:106-116, internal/indexer/index/local.go:104-109).
Golden values: scheduler_test.go:158 and :223, local_test.go:29,34.

FNV-1 (not FNV-1a): ``h = (h * prime) XOR byte`` starting from the 64-bit
offset basis.  Spark's builtin ``xxhash64`` is *not* a substitute because
seen-set parity with the reference requires this exact hash.

Implementation notes (scale): the batch kernel is vectorized with numpy
across the rows of each Arrow batch — a python loop runs only over byte
*positions* (bounded by the longest URL in the batch, typically < 200),
while every iteration processes the whole batch SIMD-style in uint64 with
natural wrap-around.  Exposed to Spark as a pandas UDF, so the hot path is
Arrow-batched, never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

FNV1_64_OFFSET = np.uint64(14695981039346656037)
FNV1_64_PRIME = np.uint64(1099511628211)
_U64_MOD = 1 << 64


def fnv1_64_py(data: bytes | str) -> int:
    """Scalar FNV-1/64 (unsigned), reference implementation for tests."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = 14695981039346656037
    for b in data:
        h = ((h * 1099511628211) % _U64_MOD) ^ b
    return h


def fnv1_64_np(values: pd.Series) -> np.ndarray:
    """Vectorized FNV-1/64 over a Series of strings → uint64 ndarray.

    Rows are packed into a padded uint8 matrix; the loop runs over byte
    positions only (vectorized across rows per iteration).
    """
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    encoded = [
        (v.encode("utf-8") if isinstance(v, str) else (v if v is not None else b""))
        for v in values
    ]
    # Group rows by byte length: each group packs contiguously (one join
    # + one reshape, no padded matrix, no large index arrays — this VM
    # class is memory-allocation-bound, so the kernel avoids big
    # temporaries entirely) and runs the horner loop in place.
    groups: dict[int, list[int]] = {}
    for i, b in enumerate(encoded):
        groups.setdefault(len(b), []).append(i)
    out = np.empty(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for length, idxs in groups.items():
            if length == 0:
                out[idxs] = FNV1_64_OFFSET
                continue
            blob = b"".join(encoded[i] for i in idxs)
            m = np.frombuffer(blob, dtype=np.uint8).reshape(len(idxs), length)
            h = np.full(len(idxs), FNV1_64_OFFSET, dtype=np.uint64)
            for j in range(length):
                h *= FNV1_64_PRIME
                h ^= m[:, j].astype(np.uint64)
            out[idxs] = h
    return out


@pandas_udf(LongType())
def fnv1_64(s: pd.Series) -> pd.Series:
    """FNV-1/64 of a string column as a signed 64-bit long (bit-identical
    to the unsigned Go value; reinterpreted, not truncated)."""
    return pd.Series(fnv1_64_np(s).view(np.int64))


@pandas_udf(StringType())
def fnv1_64_str(s: pd.Series) -> pd.Series:
    """FNV-1/64 rendered as the reference's decimal (unsigned) string,
    matching Go's ``strconv.FormatUint(c.Sum64(), 10)``."""
    return pd.Series([str(int(x)) for x in fnv1_64_np(s)])


def unsigned_to_signed(h: int) -> int:
    """Decimal-unsigned golden value → the signed long Spark stores."""
    return h - _U64_MOD if h >= (1 << 63) else h


# DuckDB oracle fragment computing the same hash in pure SQL (ASCII input
# only — codepoint == byte).  ``{col}`` is interpolated by the caller.
DUCKDB_FNV1_64_SQL = (
    "list_reduce(list_prepend(14695981039346656037::HUGEINT, "
    "list_transform(string_split_regex({col}, ''), c -> ord(c)::HUGEINT)), "
    "(h, b) -> xor((h * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT, b))"
)


def duckdb_fnv_signed_sql(col: str) -> str:
    """DuckDB SQL: FNV-1/64 of ``col`` as signed BIGINT (matches fnv1_64)."""
    h = DUCKDB_FNV1_64_SQL.format(col=col)
    return (
        f"(CASE WHEN {h} >= 9223372036854775808::HUGEINT "
        f"THEN {h} - 18446744073709551616::HUGEINT ELSE {h} END)::BIGINT"
    )


def duckdb_fnv_str_sql(col: str) -> str:
    """DuckDB SQL: FNV-1/64 of ``col`` as the decimal unsigned string."""
    return f"({DUCKDB_FNV1_64_SQL.format(col=col)})::VARCHAR"
