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
    driver's cwd/PYTHONPATH: register every package module for cloudpickle
    by-value serialization, so closures/classes shipped to workers carry
    their code instead of requiring an import."""
    try:
        from ray import cloudpickle

        import faang_pydantics_validation_ray  # noqa: F401 — load the tree
        from faang_pydantics_validation_ray import functions, imagetable  # noqa: F401
        from faang_pydantics_validation_ray import pipelines, rules, sources, stages, state  # noqa: F401
        from faang_pydantics_validation_ray.pipelines import profile, queries, report, validate  # noqa: F401
        from faang_pydantics_validation_ray.functions import (  # noqa: F401
            ann, dedup, groups, hashing, joins, multimodal, sketches, text,
        )
        for name, mod in list(sys.modules.items()):
            if name.startswith("faang_pydantics_validation_ray") and mod is not None:
                try:
                    cloudpickle.register_pickle_by_value(mod)
                except Exception:
                    pass
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
    return dict(ORACLES)
