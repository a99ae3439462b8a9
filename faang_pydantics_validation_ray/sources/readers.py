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


def read_submission_json(path: str) -> dict[str, "object"]:
    """S2/S3 graft — the reference's submission intake: ONE JSON document
    whose top-level keys are record types mapping to lists of record dicts
    (/root/reference/main.py:7 + unified_validator.py:27-76 iterate exactly
    this shape). Returns ``{record_type: ray.data.Dataset}`` ready for
    ``pipelines.unified.validate_many``.

    The submission document is control-plane-sized (the reference's golden
    file holds 10 records), so parsing it on the driver is correct; bulk
    data at 100 TB arrives as parquet/Lance tables (``read_image_table``)
    or line-delimited JSON (``read_records_jsonl``, distributed)."""
    import json

    with open(path) as fh:
        doc = json.load(fh)
    return submission_datasets(doc)


def submission_datasets(doc) -> dict[str, "object"]:
    """Parsed submission object → ``{record_type: Dataset}`` (shared by the
    file intake above and the ``cli.py serve`` POST-body intake, mirroring
    reference app.py:19-22's request-body source)."""
    import pyarrow as pa
    import ray.data as rd

    if not isinstance(doc, dict):
        raise ValueError(f"submission must be a JSON object, got {type(doc)}")
    out = {}
    for rtype, records in doc.items():
        if not isinstance(records, list):
            raise ValueError(f"record type '{rtype}' must map to a list")
        out[rtype] = rd.from_arrow(pa.Table.from_pylist(records))
    return out


def read_records_jsonl(path: str, expected: list[str] | None = None,
                       strict: bool = True, **read_kwargs):
    """Distributed line-delimited-JSON records reader (the scale path for
    JSON intake): ``ray.data.read_json`` streams blocks per file. With
    ``expected``, enforces the closed schema (P12) from the first block's
    columns; ``strict=False`` returns ``(dataset, violations)``."""
    import ray.data as rd

    ds = rd.read_json(path, **read_kwargs)
    if expected is None:
        return ds if strict else (ds, [])
    names = set(ds.schema().names)
    viol = []
    for extra in sorted(names - set(expected)):
        viol.append({"rule_id": "schema.unknown_column", "severity": "error",
                     "field": extra,
                     "message": f"unknown column '{extra}' (closed schema)"})
    for missing in [c for c in expected if c not in names]:
        viol.append({"rule_id": "schema.missing_column", "severity": "error",
                     "field": missing,
                     "message": f"required column '{missing}' absent"})
    if strict:
        if viol:
            raise ValueError(f"schema violations for {path}: {viol}")
        return ds
    return ds, viol


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
