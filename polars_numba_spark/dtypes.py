"""Dtype mapping between Spark SQL types and the NumPy kernel layer.

Parity notes (reference ``/root/reference/src/polars_numba/__init__.py``):

- the reference supports exactly the dtypes in its ``_POLARS_DTYPE_TO_NUMPY``
  table (`__init__.py:408-424`); strings/lists/maps/decimals are rejected with
  a KeyError — we raise a ``TypeError`` with a clear message instead.
- dtype *instances and classes* are both accepted (`__init__.py:427-434`,
  tested `tests/test_collect_scan.py:178-187`); we accept Spark ``DataType``
  instances, ``DataType`` subclasses, and Spark's simple-string names.
- the declared ``return_dtype`` may differ from the accumulator dtype; the
  result is **cast** (float accumulator → IntegerType truncates,
  `tests/test_collect_scan.py:75-92`). We reproduce this by allocating the
  result buffer in the target NumPy dtype so the cast happens on assignment,
  exactly like the reference's ``np.empty(..., dtype=np_dtype)``
  (`__init__.py:717`).
- Polars ``pl.Array(inner, size)`` (fixed width, used for multi-output
  accumulators, `__init__.py:673-679`) has no Spark equivalent —
  :class:`SizedArray` carries the size in our API and maps to
  ``ArrayType(inner)`` on the Spark side.
- unsigned ints / Float16 do not exist in Spark; callers use the signed /
  wider Spark type (documented semantic widening, SURVEY.md §1.2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Union

import numpy as np
from pyspark.sql import types as T


@dataclasses.dataclass(frozen=True)
class SizedArray:
    """Fixed-width array result type for multi-output accumulators.

    Mirrors Polars ``pl.Array(inner, size)`` (ref `__init__.py:673-679`):
    a tuple accumulator of length ``size`` becomes one ``size``-vector per
    row. On the Spark side this is an ``ArrayType(element_type)``; the fixed
    width is enforced by our kernel layer (Spark arrays are variable-length).
    """

    element_type: Union[T.DataType, type]
    size: int

    def spark_type(self) -> T.ArrayType:
        return T.ArrayType(normalize_spark_type(self.element_type), True)


# Kernel-supported Spark types → NumPy dtypes (mirror of the reference's
# _POLARS_DTYPE_TO_NUMPY, `__init__.py:408-424`, minus unsigned/Float16 which
# Spark lacks).
_SPARK_TO_NUMPY: dict[type, np.dtype] = {
    T.BooleanType: np.dtype(np.bool_),
    T.ByteType: np.dtype(np.int8),
    T.ShortType: np.dtype(np.int16),
    T.IntegerType: np.dtype(np.int32),
    T.LongType: np.dtype(np.int64),
    T.FloatType: np.dtype(np.float32),
    T.DoubleType: np.dtype(np.float64),
    T.TimestampType: np.dtype("datetime64[us]"),
    T.TimestampNTZType: np.dtype("datetime64[us]"),
    T.DateType: np.dtype("datetime64[D]"),
    T.DayTimeIntervalType: np.dtype("timedelta64[us]"),
}

_SIMPLE_NAMES = {
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}


def normalize_spark_type(dtype: Any) -> T.DataType:
    """Accept a DataType instance, a DataType subclass, or a simple-string
    name, and return a DataType instance.

    Parity: the reference normalizes dtype classes to instances at
    `__init__.py:427-434` (tested `tests/test_collect_scan.py:178-187`).
    """
    if isinstance(dtype, SizedArray):
        return dtype.spark_type()
    if isinstance(dtype, T.DataType):
        return dtype
    if isinstance(dtype, type) and issubclass(dtype, T.DataType):
        return dtype()
    if isinstance(dtype, str):
        name = dtype.strip().lower()
        if name in _SIMPLE_NAMES:
            return _SIMPLE_NAMES[name]
        return T._parse_datatype_string(dtype)
    raise TypeError(f"Cannot interpret {dtype!r} as a Spark data type")


def spark_type_to_numpy(dtype: Any) -> np.dtype:
    """NumPy dtype for a kernel-supported Spark type.

    Raises TypeError for types the kernels don't support (strings, nested
    lists, maps, decimals) — same restriction as the reference's
    ``_polars_dtype_to_numpy`` KeyError (`__init__.py:427-434`).
    """
    norm = normalize_spark_type(dtype)
    np_dtype = _SPARK_TO_NUMPY.get(type(norm))
    if np_dtype is None:
        raise TypeError(
            f"Column type {norm.simpleString()} is not supported by "
            "fold/scan kernels (supported: boolean, integral, floating, "
            "timestamp, date, daytime-interval)"
        )
    return np_dtype


def result_dtype_and_shape(return_dtype: Any) -> tuple[np.dtype, tuple[int, ...]]:
    """(numpy dtype, extra result-row shape) for a declared return dtype.

    Mirrors ``_numpy_dtype_and_columns`` (`__init__.py:673-679`): a
    :class:`SizedArray` return type means each row of the result is an
    ``(size,)`` vector written from a tuple accumulator.
    """
    if isinstance(return_dtype, SizedArray):
        return spark_type_to_numpy(return_dtype.element_type), (return_dtype.size,)
    return spark_type_to_numpy(return_dtype), ()
