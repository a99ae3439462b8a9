"""Small Arrow → numpy helpers shared by the rule kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def np_bool(arr: pa.Array | pa.ChunkedArray, null_value: bool = False) -> np.ndarray:
    """Arrow boolean array → numpy bool, nulls mapped to ``null_value``."""
    filled = pc.fill_null(arr, null_value)
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    return filled.to_numpy(zero_copy_only=False).astype(bool, copy=False)


def np_null(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Null mask as numpy bool."""
    return np_bool(pc.is_null(arr))


def col(table: pa.Table, name: str) -> pa.ChunkedArray:
    return table.column(name)
