"""Reference-profile construction: per-column mergeable sketches over a clean
dataset, stored as parquet, used by the drift rules (SURVEY.md A6).

Partials are computed per batch inside ``map_batches`` (one tiny row per
(batch, column)) and merged on the driver — the merge tree is exact because
the sketches are mergeable, so block boundaries don't matter.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.sketches import ColumnProfile

PROFILE_COLS = ("w", "h", "byte_size", "phash")
DRIFT_COLS = ("w", "h", "byte_size")


def _with_byte_size(t: pa.Table) -> pa.Table:
    if "byte_size" not in t.column_names and "bytes" in t.column_names:
        t = t.append_column("byte_size",
                            pc.cast(pc.binary_length(t.column("bytes")), pa.int64()))
    return t


def _sketch_batch(t: pa.Table, cols=PROFILE_COLS) -> pa.Table:
    t = _with_byte_size(t)
    names, blobs = [], []
    for c in cols:
        if c in t.column_names:
            names.append(c)
            blobs.append(ColumnProfile().add_arrow(t.column(c)).to_bytes())
    return pa.table({"col": pa.array(names, type=pa.string()),
                     "sketch": pa.array(blobs, type=pa.binary())})


def build_reference_profile(ds, cols=PROFILE_COLS) -> dict[str, ColumnProfile]:
    """Stream a Dataset once; return merged per-column profiles."""
    from ..runtime import ensure_shipped
    ensure_shipped()  # workers need no repo on sys.path (cluster / any cwd)
    partials = ds.map_batches(lambda t: _sketch_batch(t, cols), batch_format="pyarrow")
    merged: dict[str, ColumnProfile] = {}
    for batch in partials.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for c, blob in zip(batch.column("col").to_pylist(),
                           batch.column("sketch").to_pylist()):
            p = ColumnProfile.from_bytes(blob)
            merged[c] = merged[c].merge(p) if c in merged else p
    return merged


def save_profile(profile: dict[str, ColumnProfile], path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(pa.table({
        "col": list(profile.keys()),
        "sketch": pa.array([p.to_bytes() for p in profile.values()], type=pa.binary()),
    }), path)
    return path


def load_profile(path: str) -> dict[str, ColumnProfile]:
    t = pq.read_table(path)
    return {c: ColumnProfile.from_bytes(b)
            for c, b in zip(t.column("col").to_pylist(), t.column("sketch").to_pylist())}
