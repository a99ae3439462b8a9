"""Rule registry: a rule is DATA — ``(rule_id, field, kernel)`` — and a kernel
is a pure vectorized function ``(pa.Table, RuleContext) → [(mask, severity,
message)]``.

This replaces the reference's imperative Pydantic ``@field_validator`` /
``@model_validator`` surface (/root/reference/base_validator.py:10-29,
organism_ruleset.py:114-275) with the declarative, pluggable registry promised
by SURVEY.md §2.8: adding a record type = declaring a new RuleSet; adding a
check = one kernel entry. Violations are rows of a second Dataset, not a
ContextVar side-channel (/root/reference/base_validator.py:7).

Scale contract (SURVEY.md §7 "violation-row explosion"): ``evaluate`` caps
exemplar violation rows per (rule, severity) per batch and always returns FULL
counts separately, so a pathological batch cannot emit ≫1 row per input row.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable

import numpy as np
import pyarrow as pa

from . import sentinels
from ._arrow import np_bool

# (violating-rows mask, severity, static message)
Finding = tuple[np.ndarray, str, str]
Kernel = Callable[[pa.Table, "RuleContext"], list[Finding]]


@dataclass
class RuleSpec:
    rule_id: str
    field: str                 # column the rule is "about" (report label)
    kernel: Kernel


class RuleContext:
    """Per-batch evaluation context: cached sentinel masks + null masks.

    ``sentinel_levels`` maps column → mandatory level; every typed kernel must
    AND out ``ctx.sentinel(colname)`` so sentinel rows bypass typed predicates
    (graft of /root/reference/organism_ruleset.py:119-121 skip logic).
    """

    def __init__(self, table: pa.Table, sentinel_levels: dict[str, str]):
        self.table = table
        self.sentinel_levels = sentinel_levels
        self._sent: dict[str, np.ndarray] = {}
        self._null: dict[str, np.ndarray] = {}

    def sentinel(self, colname: str) -> np.ndarray:
        if colname not in self._sent:
            if colname in self.sentinel_levels and colname in self.table.column_names:
                self._sent[colname] = sentinels.sentinel_mask(self.table.column(colname))
            else:
                self._sent[colname] = np.zeros(self.table.num_rows, dtype=bool)
        return self._sent[colname]

    def null(self, colname: str) -> np.ndarray:
        if colname not in self._null:
            self._null[colname] = np_bool(
                pa.compute.is_null(self.table.column(colname)))
        return self._null[colname]

    def present(self, colname: str) -> np.ndarray:
        """Rows with a real (non-null, non-sentinel) value."""
        return ~(self.null(colname) | self.sentinel(colname))


@dataclass
class EvalResult:
    violations: pa.Table          # exemplars: (rule_id, key, severity, field, message)
    rule_counts: list[tuple[str, str, int]]   # FULL (rule_id, severity, count)
    error_mask: np.ndarray        # per-row: any error-severity violation
    warning_mask: np.ndarray      # per-row: any warning-severity violation
    violation_idx: np.ndarray | None = None   # batch row index of each exemplar


VIOLATION_FIELDS = [
    ("rule_id", pa.string()), ("image_id", pa.string()),
    ("severity", pa.string()), ("field", pa.string()), ("message", pa.string()),
]


@dataclass
class RuleSet:
    key_column: str
    rules: list[RuleSpec] = dc_field(default_factory=list)
    sentinel_levels: dict[str, str] = dc_field(default_factory=dict)

    def add(self, rule_id: str, field: str, kernel: Kernel) -> "RuleSet":
        self.rules.append(RuleSpec(rule_id, field, kernel))
        return self

    def evaluate(self, table: pa.Table, exemplar_cap: int = 100,
                 extra_findings: dict[str, list[Finding]] | None = None) -> EvalResult:
        """Run every rule kernel over one Arrow batch.

        ``extra_findings`` lets stage-computed findings (e.g. decode-based
        pixel rules from the actor pool) merge into the same result with the
        same capping/severity accounting; keys are ``rule_id:field`` pairs.
        """
        n = table.num_rows
        ctx = RuleContext(table, self.sentinel_levels)
        err = np.zeros(n, dtype=bool)
        warn = np.zeros(n, dtype=bool)
        keys = table.column(self.key_column)
        v_rule, v_key, v_sev, v_field, v_msg = [], [], [], [], []
        v_idx: list[np.ndarray] = []
        counts: list[tuple[str, str, int]] = []

        def emit(rule_id: str, field: str, findings: list[Finding]) -> None:
            nonlocal err, warn
            for mask, sev, msg in findings:
                cnt = int(mask.sum())
                if cnt == 0:
                    continue
                counts.append((rule_id, sev, cnt))
                (err if sev == "error" else warn).__ior__(mask)
                idx = np.flatnonzero(mask)[:exemplar_cap]
                v_idx.append(idx)
                kv = [None if v is None else str(v)
                      for v in keys.take(pa.array(idx)).to_pylist()]
                v_rule.extend([rule_id] * len(idx))
                v_key.extend(kv)
                v_sev.extend([sev] * len(idx))
                v_field.extend([field] * len(idx))
                v_msg.extend([msg] * len(idx))

        for spec in self.rules:
            emit(spec.rule_id, spec.field, spec.kernel(table, ctx))
        for colname, level in self.sentinel_levels.items():
            if colname in table.column_names:
                emit(f"sentinel.{colname}", colname,
                     sentinels.sentinel_findings(table.column(colname), level))
        if extra_findings:
            for key, findings in extra_findings.items():
                rule_id, _, fieldname = key.partition(":")
                emit(rule_id, fieldname or rule_id, findings)

        violations = pa.table(
            {"rule_id": v_rule, "image_id": v_key, "severity": v_sev,
             "field": v_field, "message": v_msg},
            schema=pa.schema(VIOLATION_FIELDS))
        all_idx = (np.concatenate(v_idx) if v_idx
                   else np.empty(0, dtype=np.int64))
        return EvalResult(violations, counts, err, warn, all_idx)
