"""Deterministic vectorized hashing helpers.

Every shuffle key, sketch input and salt in the engine goes through these so
results are reproducible across processes and machines (required for
checkpoint/resume and for retry-idempotence — SURVEY.md §4.2, §7 "Determinism").

``pandas.util.hash_array`` uses SipHash with a fixed default key, so it is
deterministic across processes; splitmix64 is the standard integer finalizer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def hash_column(arr: "pa.Array | pa.ChunkedArray | np.ndarray | list") -> np.ndarray:
    """Hash an Arrow / numpy column to uint64, deterministic across processes.

    Nulls hash to 0. Strings go through pandas' fixed-key SipHash; integers
    through splitmix64; floats are hashed via their bit pattern.
    """
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        null_mask = np.asarray(pa.compute.is_null(arr))
        typ = arr.type
        if pa.types.is_integer(typ):
            np_arr = np.asarray(arr.cast(pa.int64()).fill_null(0)).astype(np.int64)
            out = splitmix64(np_arr.view(_U64))
        elif pa.types.is_floating(typ):
            np_arr = np.asarray(arr.cast(pa.float64()).fill_null(0.0))
            out = splitmix64(np_arr.view(_U64))
        else:
            # strings / binary: object path via pandas SipHash (fixed key)
            obj = arr.to_pandas().to_numpy(dtype=object)
            obj[pd.isna(obj)] = ""
            out = pd.util.hash_array(obj).astype(_U64)
        out = out.copy()
        out[null_mask] = _U64(0)
        return out
    np_arr = np.asarray(arr)
    if np_arr.dtype.kind in "iu":
        return splitmix64(np_arr.astype(np.int64).view(_U64))
    if np_arr.dtype.kind == "f":
        return splitmix64(np_arr.astype(np.float64).view(_U64))
    obj = np_arr.astype(object)
    obj[pd.isna(obj)] = ""
    return pd.util.hash_array(obj).astype(_U64)


try:
    from pandas._libs.hashing import hash_object_array as _hash_object_array
except ImportError:  # pragma: no cover — private API moved; use slow path
    _hash_object_array = None


def _fast_path_matches(s: str = "fpv-selfcheck-é") -> bool:
    """One-time import-side check that the cython fast path (private pandas
    API + hard-coded default key + re-implemented finalizer) still agrees
    bit-for-bit with the public ``pd.util.hash_array``. An ImportError only
    catches *relocation* of the private API; a semantic change in pandas'
    key or finalizer would silently change every per-image RNG seed — this
    catches that and falls back to the (slow but public) path."""
    arr = np.array([s], dtype=object)
    v = _U64(_hash_object_array(arr, "0123456789123456")[0])
    with np.errstate(over="ignore"):
        v ^= v >> _U64(30)
        v *= _U64(0xBF58476D1CE4E5B9)
        v ^= v >> _U64(27)
        v *= _U64(0x94D049BB133111EB)
        v ^= v >> _U64(31)
    return int(v) == int(pd.util.hash_array(arr)[0])


if _hash_object_array is not None and not _fast_path_matches():
    _hash_object_array = None  # pragma: no cover — finalizer drifted


def stable_str_hash(s: str) -> int:
    """Deterministic single-string → uint64 (for seeding per-image RNGs).

    Bit-for-bit identical to ``pd.util.hash_array(np.array([s], object))[0]``
    (fixed-key SipHash + the splitmix-style finalizer pandas applies), but
    via the low-level cython call: ``pd.util.hash_array`` spends ~300 µs per
    call on Index/dtype ceremony, which dominated gen_pixels — this is the
    per-image reference-pixel seed, called once per lossy image in the
    decode stage."""
    if _hash_object_array is None:
        return int(pd.util.hash_array(np.array([s], dtype=object))[0])
    v = _hash_object_array(np.array([s], dtype=object),
                           "0123456789123456")[0]
    v = _U64(v)
    with np.errstate(over="ignore"):
        v ^= v >> _U64(30)
        v *= _U64(0xBF58476D1CE4E5B9)
        v ^= v >> _U64(27)
        v *= _U64(0x94D049BB133111EB)
        v ^= v >> _U64(31)
    return int(v)
