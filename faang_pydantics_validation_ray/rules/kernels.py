"""Vectorized rule-kernel library — the P1–P13 families of SURVEY.md §2.2.

Each factory returns a :class:`~.spec.Kernel`: a pure function over one Arrow
batch producing ``(mask, severity, message)`` findings via ``pyarrow.compute``
/ numpy — no Python row loops. These replace the reference's per-record scalar
validators (e.g. /root/reference/validation_utils.py:50-223,
standard_ruleset.py:8-79) with batch predicates.

Sentinel handling (P8): every typed kernel evaluates only on
``ctx.present(col)`` rows — nulls and sentinel strings are masked out, with
their own rules (required / recommended / sentinel policy) owning those rows.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._arrow import np_bool
from .spec import Finding, RuleContext

Severity = str


# ---------------------------------------------------------------- P1 required
def required(col: str, message: str | None = None) -> Callable:
    """P1 — mandatory field must be non-null (empty-string handled by the
    sentinel policy; graft of validation_utils.py:214-223)."""
    msg = message or f"required field '{col}' is missing"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        return [(ctx.null(col), "error", msg)]
    return kernel


# ------------------------------------------------------- P13 recommended warn
def recommended(col: str) -> Callable:
    """P13 — null recommended field ⇒ warning (base_validator.py:32-41)."""
    msg = f"field '{col}' is recommended but was not provided"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        return [(ctx.null(col), "warning", msg)]
    return kernel


# -------------------------------------------------------------------- P2 enum
def enum_in(col: str, allowed: Sequence[str], severity: Severity = "error") -> Callable:
    """P2 — value ∈ closed set (graft of Literal[...] enums,
    standard_ruleset.py:8-31). Evaluates on present rows only."""
    msg = f"value of '{col}' is not one of the permitted values"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        c = t.column(col)
        bad = ~np_bool(pc.is_in(c, value_set=pa.array(list(allowed), type=c.type)))
        return [(bad & ctx.present(col), severity, msg)]
    return kernel


# ------------------------------------------------------------------- P3 regex
def regex(col: str, pattern: str, severity: Severity = "error",
          message: str | None = None) -> Callable:
    """P3 — pattern-constrained string (validation_utils.py:150-202)."""
    msg = message or f"value of '{col}' does not match pattern {pattern}"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        ok = np_bool(pc.match_substring_regex(t.column(col), pattern))
        return [(~ok & ctx.present(col), severity, msg)]
    return kernel


# -------------------------------------------------------------- P4 url prefix
def url_prefix(col: str, prefixes: Sequence[str] = ("http://", "https://"),
               severity: Severity = "error") -> Callable:
    """P4 — protocol-prefix check (validation_utils.py:120-147)."""
    msg = f"value of '{col}' must start with one of {list(prefixes)}"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        c = t.column(col)
        ok = np.zeros(t.num_rows, dtype=bool)
        for p in prefixes:
            ok |= np_bool(pc.starts_with(c, p))
        return [(~ok & ctx.present(col), severity, msg)]
    return kernel


# ----------------------------------------------------------------- P5 numeric
def numeric_range(col: str, lo: float | None = None, hi: float | None = None,
                  severity: Severity = "error") -> Callable:
    """P5 — numeric bounds (non-negative / percentage / lat-long,
    validation_utils.py:50-117)."""
    msg = f"value of '{col}' outside range [{lo}, {hi}]"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        c = t.column(col)
        bad = np.zeros(t.num_rows, dtype=bool)
        if lo is not None:
            bad |= np_bool(pc.less(c, lo))
        if hi is not None:
            bad |= np_bool(pc.greater(c, hi))
        return [(bad & ~ctx.null(col), severity, msg)]
    return kernel


def expr_mask(cols: Sequence[str], fn: Callable[..., np.ndarray], rule_msg: str,
              severity: Severity = "error", require_present: bool = True) -> Callable:
    """Generic multi-column predicate: ``fn(*numpy_or_arrow_cols) → bad-mask``.

    The escape hatch for custom cross-column math (P5/P9 composites like
    ``w*h > max_pixels`` or the oxygen %-vs-mg/L heuristic,
    teleostei_post_hatching_ruleset.py:222-232)."""
    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        bad = np.asarray(fn(*[t.column(c) for c in cols]), dtype=bool)
        if require_present:
            for c in cols:
                bad &= ~ctx.null(c)
        return [(bad, severity, rule_msg)]
    return kernel


# -------------------------------------------------------------- P6 type/parse
def castable(col: str, target: pa.DataType, severity: Severity = "error") -> Callable:
    """P6 — parseability via safe-cast null-diff (graft of ``float(v)``-try,
    validation_utils.py:64-72)."""
    msg = f"value of '{col}' is not parseable as {target}"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        c = t.column(col)
        try:
            c.cast(target)
            bad = np.zeros(t.num_rows, dtype=bool)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # per-chunk fallback: mark rows that fail the cast
            import pandas as pd
            s = c.to_pandas()
            converted = pd.to_numeric(s, errors="coerce")
            bad = converted.isna().to_numpy() & s.notna().to_numpy()
        return [(bad & ctx.present(col), severity, msg)]
    return kernel


# ---------------------------------------------------- P9 cross-field equality
def fields_equal(col_a: str, col_b: str, severity: Severity = "error",
                 message: str | None = None) -> Callable:
    """P9 — two columns must agree (material↔term mapping style,
    standard_ruleset.py:49-70)."""
    msg = message or f"'{col_a}' does not match '{col_b}'"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        bad = ~np_bool(pc.equal(t.column(col_a), t.column(col_b)))
        return [(bad & ctx.present(col_a) & ctx.present(col_b), severity, msg)]
    return kernel


def both_or_neither(col_a: str, col_b: str, severity: Severity = "error") -> Callable:
    """P9 — text↔term both-or-neither (organism_ruleset.py:214-229)."""
    msg = f"'{col_a}' and '{col_b}' must be provided together"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        return [(ctx.null(col_a) ^ ctx.null(col_b), severity, msg)]
    return kernel


def mapped_consistent(col_a: str, col_b: str, mapping: dict, severity: Severity = "error"
                      ) -> Callable:
    """P9 — ``mapping[a] == b`` via broadcast dict → index_in + take
    (no per-row Python; graft of SPECIES_BREED_LINKS / material↔term)."""
    msg = f"'{col_b}' inconsistent with '{col_a}' per mapping"
    keys = pa.array(list(mapping.keys()))
    vals = pa.array([mapping[k] for k in mapping.keys()])

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        idx = pc.index_in(t.column(col_a), value_set=keys)
        expected = vals.take(idx)  # null where a not in mapping
        bad = ~np_bool(pc.equal(expected, t.column(col_b)))
        known = ~np_bool(pc.is_null(idx))
        return [(bad & known & ctx.present(col_a) & ctx.present(col_b), severity, msg)]
    return kernel


def area_range(w_col: str, h_col: str, max_area: int,
               severity: Severity = "error") -> Callable:
    """P5/P9 composite — both dims positive and their product bounded
    (``w>0 ∧ h>0 ∧ w*h ≤ max_area``). Declarative form of the flagship's
    range.dims rule so JSON rulesets reproduce it exactly."""
    msg = (f"claimed dims invalid ({w_col}>0, {h_col}>0, "
           f"{w_col}*{h_col}<={max_area})")

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        w, h = t.column(w_col), t.column(h_col)
        bad = np_bool(pc.less_equal(w, 0)) | np_bool(pc.less_equal(h, 0))
        area = pc.multiply(w.cast(pa.int64()), h.cast(pa.int64()))
        bad |= np_bool(pc.greater(area, max_area))
        bad &= ~(ctx.null(w_col) | ctx.null(h_col))
        return [(bad, severity, msg)]
    return kernel


def cond_compare(cond_col: str, cond_values: Sequence, col: str, op: str,
                 limit, message: str, severity: Severity = "error") -> Callable:
    """P9 — flag rows where ``cond_col ∈ cond_values`` and ``col <op>
    limit`` (declarative form of the returned-lines-tax cross-field rule;
    op ∈ gt/ge/lt/le). Both columns must be present."""
    f = {"gt": pc.greater, "ge": pc.greater_equal,
         "lt": pc.less, "le": pc.less_equal}[op]

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        c = t.column(cond_col)
        cond = np_bool(pc.is_in(c, value_set=pa.array(list(cond_values),
                                                      type=c.type)))
        bad = cond & np_bool(f(t.column(col), limit))
        bad &= ~ctx.null(cond_col) & ~ctx.null(col)
        return [(bad, severity, message)]
    return kernel


def unit_gate(unit_col: str, value: str) -> Callable:
    """Gate factory: a rule applies only to rows where ``unit_col ==
    value`` (e.g. calendar validity only for full-date units). Shared by
    the built-in image ruleset and the JSON ruleset loader so both build
    the identical kernel."""
    def gate(t: pa.Table, ctx) -> np.ndarray:
        if unit_col not in t.column_names:
            return np.zeros(t.num_rows, dtype=bool)
        return np_bool(pc.equal(t.column(unit_col), value))
    return gate


# --------------------------------------------------------- P10 conditional req
def conditional_required(cond_col: str, cond_values: Sequence, dep_col: str,
                         severity: Severity = "error",
                         message: str | None = None) -> Callable:
    """P10 — if cond_col ∈ cond_values then dep_col required
    (freezing-method conditional, organoid_ruleset.py:209-217)."""
    msg = message or \
        f"'{dep_col}' is required when '{cond_col}' in {list(cond_values)}"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        c = t.column(cond_col)
        cond = np_bool(pc.is_in(c, value_set=pa.array(list(cond_values), type=c.type)))
        return [(cond & ctx.present(cond_col) & ctx.null(dep_col), severity, msg)]
    return kernel


# -------------------------------------------- P3/P6 date-family (unit dispatch)
def unit_pattern(col: str, unit_col: str, patterns: dict[str, str],
                 severity: Severity = "error") -> Callable:
    """P3 graft — per-unit pattern dispatch: the regex a value must match is
    selected by its companion unit column (the reference's date_units →
    YYYY[-MM[-DD]] selection, /root/reference/validation_utils.py:150-202,
    organoid_ruleset.py:136-151). Units without a declared pattern pass."""
    msg = f"value of '{col}' does not match the pattern for its '{unit_col}'"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        if col not in t.column_names or unit_col not in t.column_names:
            return []
        vals = t.column(col).combine_chunks()
        bad = np.zeros(t.num_rows, dtype=bool)
        for unit, pat in patterns.items():
            sel = np_bool(pc.equal(t.column(unit_col), unit))
            if not sel.any():
                continue
            # regex only the rows declaring THIS unit (take → match →
            # scatter): total regex work is one pass over the batch
            # regardless of how many unit patterns exist
            idx = np.nonzero(sel)[0]
            ok = np_bool(pc.match_substring_regex(
                pc.take(vals, pa.array(idx)), pat))
            bad[idx[~ok]] = True
        return [(bad & ctx.present(col) & ctx.present(unit_col), severity, msg)]
    return kernel


def real_date(col: str, fmt: str = "%Y-%m-%d",
              gate_pattern: str = r"^\d{4}-\d{2}-\d{2}$",
              severity: Severity = "error",
              gate: Callable[[pa.Table, "RuleContext"], np.ndarray] | None = None,
              ) -> Callable:
    """P6 graft — calendar validity beyond the pattern: parse + round-trip
    re-format must reproduce the input (Arrow's strptime ROLLS OVER invalid
    days like 2021-02-30 → 2021-03-02, so a null-diff alone misses them; the
    round-trip catches rollover exactly like DuckDB's try_strptime rejects
    it). Only values matching ``gate_pattern`` are checked — malformed values
    belong to the pattern rule, not this one. Graft of the strptime check in
    /root/reference/validation_utils.py:150-202."""
    msg = f"value of '{col}' is not a real calendar date ({fmt})"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        if col not in t.column_names:
            return []
        c = t.column(col)
        shaped = np_bool(pc.match_substring_regex(c, gate_pattern))
        parsed = pc.strptime(c, format=fmt, unit="s", error_is_null=True)
        rt = pc.strftime(parsed, format=fmt)
        bad = (np_bool(pc.is_null(parsed), null_value=True)
               | ~np_bool(pc.equal(rt, c))) & shaped
        if gate is not None:
            bad &= gate(t, ctx)
        return [(bad & ctx.present(col), severity, msg)]
    return kernel


# ------------------------------------------------- T1/T2 vocab (ontology) dims
def vocab_member(col: str, vocab: Sequence[str],
                 severity: Severity = "error") -> Callable:
    """T1 graft — value must exist in the (broadcast) vocabulary dim
    (the reference's ontology-term existence check,
    /root/reference/generic_validator_classes.py:63-88)."""
    msg = f"value of '{col}' is not a known vocabulary term"
    # explicit string type: pa.array([]) is null-typed and is_in raises on
    # (string, null) when the vocab dim is empty
    vs = pa.array(sorted(set(vocab)), type=pa.string())

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        if col not in t.column_names:
            return []
        bad = ~np_bool(pc.is_in(t.column(col), value_set=vs))
        return [(bad & ctx.present(col), severity, msg)]
    return kernel


def text_label_consistent(text_col: str, label_col: str, vocab: Sequence[str],
                          severity: Severity = "warning") -> Callable:
    """T2 graft — the reference's signature ontology check: provided text must
    agree with the declared label, WARNING on mismatch
    (/root/reference/generic_validator_classes.py:90-121). Vectorized as one
    word-boundary regex pass per (small, broadcast) vocab term: rows whose
    label is term w must contain w in the text. Labels outside the vocab are
    skipped here — :func:`vocab_member` owns those rows."""
    msg = f"'{text_col}' does not mention the declared '{label_col}'"
    import re as _re

    terms = sorted(set(vocab))

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        if text_col not in t.column_names or label_col not in t.column_names:
            return []
        lab = t.column(label_col)
        txt = t.column(text_col).combine_chunks()
        bad = np.zeros(t.num_rows, dtype=bool)
        for w in terms:
            is_w = np_bool(pc.equal(lab, w))
            if not is_w.any():
                continue
            # regex only the rows declaring THIS label (take → match →
            # scatter), not the whole column once per vocab term: total regex
            # work is one pass over the batch regardless of vocab size
            idx = np.nonzero(is_w)[0]
            mentions = np_bool(pc.match_substring_regex(
                pc.take(txt, pa.array(idx)),
                r"\b" + _re.escape(w) + r"\b"))
            bad[idx[~mentions]] = True
        return [(bad & ctx.present(text_col) & ctx.present(label_col),
                 severity, msg)]
    return kernel


# ------------------------------------------------------- P11 list cardinality
def list_cardinality(col: str, lo: int | None = None, hi: int | None = None,
                     severity: Severity = "error") -> Callable:
    """P11 — bounds on list length (child_of ≤ 2 / derived_from == 1,
    organism_ruleset.py:249-260)."""
    msg = f"list length of '{col}' outside [{lo}, {hi}]"

    def kernel(t: pa.Table, ctx: RuleContext) -> list[Finding]:
        ln = pc.list_value_length(t.column(col))
        bad = np.zeros(t.num_rows, dtype=bool)
        if lo is not None:
            bad |= np_bool(pc.less(ln, lo))
        if hi is not None:
            bad |= np_bool(pc.greater(ln, hi))
        return [(bad & ~ctx.null(col), severity, msg)]
    return kernel


# ------------------------------------------------------------- P7 normalizers
def normalize_strings(t: pa.Table, cols: Sequence[str],
                      empty_to_null: bool = True) -> tuple[pa.Table, dict[str, np.ndarray]]:
    """P7 — trim + lowercase + ''→null normalize pass; returns the normalized
    table and per-column changed-masks (graft of strip_and_convert_empty_to_none,
    validation_utils.py:205-211). Lowercasing applies to enum-ish columns only —
    callers choose ``cols``; captions are NOT touched (caption-equality invariant)."""
    changed: dict[str, np.ndarray] = {}
    for c in cols:
        if c not in t.column_names:
            continue
        arr = t.column(c)
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
        if empty_to_null:
            norm = pc.if_else(pc.equal(norm, ""), pa.scalar(None, type=norm.type), norm)
        changed[c] = ~np_bool(pc.equal(arr, norm), null_value=True) & ~np_bool(pc.is_null(arr))
        t = t.set_column(t.column_names.index(c), c, norm)
    return t, changed
