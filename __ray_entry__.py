"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship image-table validation pipeline at sf0.001
scale; ``queries()``/``oracle_sql()`` expose every operator family from
SURVEY.md §2 over the sf_dir parquet tables, with DuckDB oracles for the
SQL-expressible ones (see faang_pydantics_validation_ray/pipelines/queries.py).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship_package_by_value() -> None:
    """Make the library importable inside Ray workers regardless of the
    driver's cwd/PYTHONPATH (the library entry points also call this lazily
    via runtime.ensure_shipped)."""
    try:
        from faang_pydantics_validation_ray.runtime import ensure_shipped
        ensure_shipped()
    except Exception:
        pass  # best effort — normal import path still works from the repo cwd


_ship_package_by_value()


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: validate a seeded synthetic
    image+caption table (BASELINE.json input_hint schema) end-to-end and
    return the violations table (stable schema, deterministic rows)."""
    from faang_pydantics_validation_ray.pipelines.queries import _run_flagship
    res = _run_flagship("/root/testdata/sf0.001")
    return res.violations.to_pandas().sort_values(
        ["rule_id", "image_id", "severity"]).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from faang_pydantics_validation_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from faang_pydantics_validation_ray.imagetable import datagen
    from faang_pydantics_validation_ray.pipelines.queries import ORACLES

    # the img_* oracles read the generated parquet under /tmp/fpv_imgtable at
    # the driver's comparison scale (sf0.01 → n=10000); make sure it exists
    # regardless of whether DuckDB or the Ray query runs first (idempotent)
    datagen.ensure_image_table(n=10000, seed=42, n_files=4)
    datagen.ensure_ground_truth(n=10000, seed=42, n_files=4)
    return dict(ORACLES)
