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


def render_detail_report(res: ValidationResult, max_records: int = 50) -> str:
    """Per-record drill-down for SMALL result sets — graft of the reference's
    detailed per-type report, which lists every invalid record with its field
    errors (/root/reference/base_validator.py:196-267).

    Renders from the exemplar violation rows (bounded by the exemplar caps),
    grouped per record key; ``max_records`` bounds the listing, with an
    explicit truncation line so a capped report never reads as complete."""
    v = res.violations
    per_rec: dict[str, list[str]] = {}
    order: list[str] = []
    for rule, key, sev, field, msg in zip(
            v.column("rule_id").to_pylist(), v.column("image_id").to_pylist(),
            v.column("severity").to_pylist(), v.column("field").to_pylist(),
            v.column("message").to_pylist()):
        k = str(key)
        if k not in per_rec:
            per_rec[k] = []
            order.append(k)
        per_rec[k].append(f"    [{sev.upper():7s}] {field}: {msg} ({rule})")
    lines = ["=" * 64, "PER-RECORD VALIDATION DETAIL", "=" * 64]
    for k in sorted(order)[:max_records]:
        lines.append(f"  record {k}:")
        lines.extend(per_rec[k])
    if len(order) > max_records:
        lines.append(f"  ... {len(order) - max_records} more records "
                     "(exemplar-capped; see rule_counts for exact totals)")
    lines.append("=" * 64)
    return "\n".join(lines)
