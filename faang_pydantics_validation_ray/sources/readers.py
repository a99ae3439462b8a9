"""Readers with closed-schema enforcement (SURVEY.md S1 + P12).

The reference makes unknown columns hard errors via Pydantic
``extra="forbid"`` (/root/reference/organism_ruleset.py:281); here the
equivalent is a dataset-level schema check at the READ — one violation per
unexpected/missing column, not a per-row cost.

``read_image_table`` prefers Lance when a ``.lance`` dataset is present (the
north_star input format) and falls back to parquet; both stream block-per-
fragment/file. Column pruning is pushed into the read (``columns=[...]``).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from ..imagetable.datagen import IMAGE_SCHEMA

EXPECTED_COLUMNS = [n for n in IMAGE_SCHEMA.names]


def schema_violations(path: str, expected: list[str] = EXPECTED_COLUMNS,
                      optional: tuple[str, ...] = ("partition_id",)) -> list[dict]:
    """P12: compare the file-level Arrow schema to the closed expected schema.
    Returns dataset-level violation dicts (empty = clean)."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
        if os.path.isdir(path) else [path]
    out = []
    if not files:
        return [{"rule_id": "schema.unreadable", "severity": "error",
                 "field": path, "message": "no parquet files found"}]
    names = set(pq.read_schema(files[0]).names)
    for extra in sorted(names - set(expected)):
        out.append({"rule_id": "schema.unknown_column", "severity": "error",
                    "field": extra,
                    "message": f"unknown column '{extra}' (closed schema)"})
    for missing in [c for c in expected if c not in names and c not in optional]:
        out.append({"rule_id": "schema.missing_column", "severity": "error",
                    "field": missing,
                    "message": f"required column '{missing}' absent"})
    return out


def read_image_table(path: str, columns: list[str] | None = None,
                     strict: bool = True, **read_kwargs):
    """Read the image table as a Ray Dataset (Lance if present, else parquet).

    ``strict=True`` raises on schema violations; ``strict=False`` returns
    ``(dataset, violations)`` so callers can record them as violation rows.
    """
    import ray.data as rd

    lance_dirs = glob.glob(os.path.join(path, "*.lance"))
    if lance_dirs and hasattr(rd, "read_lance"):
        ds = rd.read_lance(lance_dirs[0], columns=columns, **read_kwargs)
        return (ds, []) if not strict else ds

    viol = schema_violations(path)
    if strict:
        if viol:
            raise ValueError(f"schema violations for {path}: {viol}")
        return rd.read_parquet(path, columns=columns, **read_kwargs)
    ds = rd.read_parquet(path, columns=columns, **read_kwargs)
    return ds, viol
