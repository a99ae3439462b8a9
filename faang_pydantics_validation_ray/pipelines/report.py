"""Human-readable run report — driver-side rendering of small aggregates,
mirroring the content of the reference's per-type reports and unified summary
(/root/reference/base_validator.py:196-267, unified_validator.py:235-250):
counts per severity, per-rule breakdown with exemplars, and the global
summary line — but rendered from parquet-backed aggregates instead of
in-memory record dumps.
"""

from __future__ import annotations

from .validate import ValidationResult


def render_report(res: ValidationResult, max_exemplars: int = 5) -> str:
    s = res.summary
    lines = [
        "=" * 64,
        "IMAGE TABLE VALIDATION REPORT",
        "=" * 64,
        (f"Total rows: {s['total']}  valid: {s['valid']}  "
         f"invalid: {s['invalid']}  valid-with-warnings: {s['warnings']}  "
         f"relationship errors: {s['relationship_errors']}"),
        (f"Partitions: {s['partitions']}  passed: {s['partitions_passed']}  "
         f"drift: {s['drift_partitions'] or 'none'}"),
        "",
        "--- Rule violations " + "-" * 40,
    ]
    rc = res.rule_counts.sort_values(["severity", "count"],
                                     ascending=[True, False])
    ex_by_rule: dict[str, list[str]] = {}
    v = res.violations
    for rule, key in zip(v.column("rule_id").to_pylist(),
                         v.column("image_id").to_pylist()):
        ex = ex_by_rule.setdefault(rule, [])
        if len(ex) < max_exemplars:
            ex.append(str(key))
    for rule_id, sev, cnt in rc[["rule_id", "severity", "count"]].itertuples(index=False):
        ex = ", ".join(ex_by_rule.get(rule_id, []))
        lines.append(f"  [{sev.upper():7s}] {rule_id:28s} ×{int(cnt):<8d} e.g. {ex}")
    lines += ["", "--- Partition verdicts " + "-" * 37]
    for _, row in res.verdicts.iterrows():
        status = "PASS" if row["pass"] else "FAIL"
        lines.append(
            f"  part={int(row['partition_id']):<4d} rows={int(row['rows']):<9d} "
            f"err_rate={row['error_rate']:.4f} max_psi={row['max_psi']:.3f} {status}")
    lines.append("=" * 64)
    return "\n".join(lines)
