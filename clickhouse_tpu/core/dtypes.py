"""Data types for the TPU-native query engine.

Role model: the reference's ``IDataType`` hierarchy (src/DataTypes/IDataType.h:29)
with the crucial TPU-first difference that *all* device-resident data is
fixed-width.  Variable-width strings are dictionary-encoded at the storage
boundary (the reference's LowCardinality concept, src/Columns/ColumnLowCardinality.h,
promoted to the default string strategy per SURVEY.md §7 "Hard parts").

A DType describes the logical type; the physical device representation is
always a JAX array of ``storage_dtype`` plus, for Nullable, a separate uint8
validity mask (reference: ColumnNullable = value column + null mask,
src/Columns/ColumnNullable.h).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

__all__ = [
    "DType",
    "Int8", "Int16", "Int32", "Int64",
    "UInt8", "UInt16", "UInt32", "UInt64",
    "Float32", "Float64",
    "Boolean", "String", "Date", "DateTime", "Nothing",
    "Nullable", "make_nullable", "remove_nullable",
    "parse_type_name", "common_supertype", "is_numeric", "is_integer",
    "is_float", "is_string", "NUMERIC_ORDER",
]


@dataclasses.dataclass(frozen=True)
class DType:
    """Logical data type.

    name            -- SQL-visible name (ClickHouse-compatible spelling)
    storage_dtype   -- numpy dtype string of the device representation
    nullable        -- whether a validity mask accompanies the values
    is_dictionary   -- True for String: device holds int32 codes into a
                       host-side dictionary of unique byte strings
    is_array        -- True for Array(T): device holds a (rows, max_len)
                       padded matrix + per-row lengths (the reference's
                       size0 + data substream layout, statically shaped)
    """

    name: str
    storage_dtype: str
    nullable: bool = False
    is_dictionary: bool = False
    is_array: bool = False

    # -- helpers -------------------------------------------------------------
    @property
    def np_dtype(self) -> np.dtype:
        return np.dtype(self.storage_dtype)

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.storage_dtype)

    @property
    def itemsize(self) -> int:
        return self.np_dtype.itemsize

    def __str__(self) -> str:  # ClickHouse-style rendering
        return f"Nullable({self.name})" if self.nullable else self.name

    def with_nullable(self, nullable: bool = True) -> "DType":
        return dataclasses.replace(self, nullable=nullable)


# -- concrete types ----------------------------------------------------------
Int8 = DType("Int8", "int8")
Int16 = DType("Int16", "int16")
Int32 = DType("Int32", "int32")
Int64 = DType("Int64", "int64")
UInt8 = DType("UInt8", "uint8")
UInt16 = DType("UInt16", "uint16")
UInt32 = DType("UInt32", "uint32")
UInt64 = DType("UInt64", "uint64")
Float32 = DType("Float32", "float32")
Float64 = DType("Float64", "float64")
Boolean = DType("Bool", "uint8")
# Strings: dictionary codes on device (int32), dictionary on host.
String = DType("String", "int32", is_dictionary=True)
# Days since epoch / seconds since epoch, like the reference's Date/DateTime.
Date = DType("Date", "int32")
DateTime = DType("DateTime", "int64")
Nothing = DType("Nothing", "int8")

# Interval types (reference: DataTypeInterval) — int64 counts of their unit.
INTERVAL_UNITS = ["Second", "Minute", "Hour", "Day", "Week", "Month",
                  "Quarter", "Year"]
INTERVALS = {u: DType(f"Interval{u}", "int64") for u in INTERVAL_UNITS}

_BY_NAME = {
    t.name: t
    for t in [
        Int8, Int16, Int32, Int64, UInt8, UInt16, UInt32, UInt64,
        Float32, Float64, Boolean, String, Date, DateTime, Nothing,
        *INTERVALS.values(),
    ]
}


def is_interval(t: DType) -> bool:
    return t.name.startswith("Interval")


def is_datetime_like(t: DType) -> bool:
    return t.name in ("Date", "DateTime")
_BY_NAME["Float"] = Float64
_BY_NAME["Int"] = Int64
_BY_NAME["Boolean"] = Boolean


def Nullable(inner: DType) -> DType:
    return inner.with_nullable(True)


def make_nullable(t: DType) -> DType:
    return t.with_nullable(True)


def remove_nullable(t: DType) -> DType:
    return t.with_nullable(False)


def Array(inner: DType) -> DType:
    if inner.is_array:
        raise ValueError("Nested arrays are not supported yet")
    return DType(f"Array({inner})", inner.storage_dtype,
                 is_dictionary=inner.is_dictionary, is_array=True)


def array_inner(t: DType) -> DType:
    assert t.is_array
    return parse_type_name(t.name[len("Array("):-1])


def parse_type_name(name: str) -> DType:
    """Parse ``Int64``, ``Nullable(Float64)``, ``LowCardinality(String)``."""
    name = name.strip()
    if name.startswith("Nullable(") and name.endswith(")"):
        return make_nullable(parse_type_name(name[len("Nullable("):-1]))
    if name.startswith("LowCardinality(") and name.endswith(")"):
        # Dictionary encoding is our default physical layout already.
        return parse_type_name(name[len("LowCardinality("):-1])
    if name.startswith("Array(") and name.endswith(")"):
        return Array(parse_type_name(name[len("Array("):-1]))
    if name in _BY_NAME:
        return _BY_NAME[name]
    raise ValueError(f"Unknown data type: {name!r}")


def is_numeric(t: DType) -> bool:
    return not t.is_dictionary and not t.is_array \
        and t.name not in ("Nothing",)


def is_integer(t: DType) -> bool:
    return t.np_dtype.kind in ("i", "u") and not t.is_dictionary


def is_float(t: DType) -> bool:
    return t.np_dtype.kind == "f"


def is_string(t: DType) -> bool:
    return t.is_dictionary


# Numeric promotion lattice (reference: src/DataTypes/getLeastSupertype.cpp,
# simplified to the width/sign rules that matter for arithmetic).
NUMERIC_ORDER = [
    UInt8, Int8, UInt16, Int16, UInt32, Int32, UInt64, Int64, Float32, Float64,
]


def common_supertype(a: DType, b: DType) -> DType:
    """Least common supertype for binary operations.

    Mirrors getLeastSupertype's behaviour for the numeric lattice; strings
    only unify with strings.
    """
    nullable = a.nullable or b.nullable
    a0, b0 = remove_nullable(a), remove_nullable(b)
    if a0 == b0:
        out = a0
    elif is_string(a0) or is_string(b0):
        if is_string(a0) and is_string(b0):
            out = String
        else:
            raise TypeError(f"No common supertype of {a0} and {b0}")
    elif is_float(a0) or is_float(b0):
        out = Float64 if Float64 in (a0, b0) else Float32
        if (is_integer(a0) and a0.itemsize >= 4) or (is_integer(b0) and b0.itemsize >= 4):
            out = Float64
    else:
        # integer/integer: numpy's promote, mapped back to our registry
        np_out = np.promote_types(a0.np_dtype, b0.np_dtype)
        out = from_numpy_dtype(np_out)
    return make_nullable(out) if nullable else out


def from_numpy_dtype(dt: Any) -> DType:
    dt = np.dtype(dt)
    for t in NUMERIC_ORDER:
        if t.np_dtype == dt:
            return t
    if dt.kind == "b":
        return Boolean
    if dt.kind in ("U", "S", "O"):
        return String
    if dt == np.dtype("float64"):
        return Float64
    raise TypeError(f"No engine dtype for numpy dtype {dt}")
