"""Multi-record-type unified validation run — graft of the reference's
submission-wide validator, which validates every typed sheet of one
submission and rolls the per-type summaries into a cross-type total
(/root/reference/unified_validator.py:27-76,139-233, summary semantics at
base_validator.py:115-125: a row with only warnings still counts VALID).

Each record type streams through its own RuleSet once (per-batch vectorized
kernels → tiny (rows, error_rows, warn_only_rows) partials summed on the
driver); types run sequentially because concurrent Dataset executions from
driver threads contend in one Ray session (measured in round 1).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..rules.spec import RuleSet

SUMMARY_COLUMNS = ["record_type", "total", "valid", "invalid", "warnings"]


def table_summary(ds, ruleset: RuleSet) -> dict[str, int]:
    """One streaming pass: per-batch row/error/warn-only partial counts →
    driver-side sum. ``warnings`` counts rows whose ONLY findings are
    warnings (those rows are still valid, reference semantics)."""
    def f(t: pa.Table) -> pa.Table:
        res = ruleset.evaluate(t, exemplar_cap=0)
        warn_only = res.warning_mask & ~res.error_mask
        return pa.table({
            "rows": pa.array([t.num_rows], type=pa.int64()),
            "err_rows": pa.array([int(res.error_mask.sum())], type=pa.int64()),
            "warn_rows": pa.array([int(warn_only.sum())], type=pa.int64())})

    parts = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    total = int(parts["rows"].sum()) if len(parts) else 0
    invalid = int(parts["err_rows"].sum()) if len(parts) else 0
    warnings = int(parts["warn_rows"].sum()) if len(parts) else 0
    return {"total": total, "valid": total - invalid, "invalid": invalid,
            "warnings": warnings}


def validate_many(named: dict[str, tuple]) -> pd.DataFrame:
    """Validate several (dataset, ruleset) pairs and append the cross-type
    ``total`` rollup row — the unified_validator's total_summary.

    A ruleset may be given as a RuleSet, OR as the string name of a
    declarative ruleset shipped as package data (``rulesets/<name>.json``,
    loaded via rules.serde — the config-driven path mirroring the
    reference's rulesets-json files), OR as a plain spec dict."""
    from ..rules.serde import load_packaged_ruleset, ruleset_from_dict
    rows = []
    for record_type, (ds, ruleset) in named.items():
        if isinstance(ruleset, str):
            ruleset = load_packaged_ruleset(ruleset)
        elif isinstance(ruleset, dict):
            ruleset = ruleset_from_dict(ruleset)
        rows.append({"record_type": record_type,
                     **table_summary(ds, ruleset)})
    out = pd.DataFrame(rows, columns=SUMMARY_COLUMNS).sort_values(
        "record_type").reset_index(drop=True)
    rollup = {"record_type": "total",
              **{c: int(out[c].sum()) for c in SUMMARY_COLUMNS[1:]}}
    out = pd.concat([out, pd.DataFrame([rollup])], ignore_index=True)
    for c in SUMMARY_COLUMNS[1:]:
        out[c] = out[c].astype("int64")
    return out
