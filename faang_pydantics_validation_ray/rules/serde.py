"""Declarative (JSON-serializable) rule specs → RuleSet.

Graft of the reference's JSON-Schema rulesets
(/root/reference/rulesets-json/*.json, fetched via constants.py:4-70 and
compiled into Pydantic models): here a ruleset is plain data — a dict with
``key_column``, ``sentinel_levels`` and a list of rule specs — so pipelines
can be config-driven and rulesets versioned/stored beside the data
(SURVEY.md §2.8).

Supported kinds map 1:1 onto the kernel factories in :mod:`.kernels`.
"""

from __future__ import annotations

import json
import re
from typing import Any

from . import kernels
from .spec import RuleSet

_KINDS = {
    "required": lambda s: kernels.required(s["field"]),
    "recommended": lambda s: kernels.recommended(s["field"]),
    "enum": lambda s: kernels.enum_in(s["field"], s["allowed"],
                                      s.get("severity", "error")),
    "regex": lambda s: kernels.regex(s["field"], s["pattern"],
                                     s.get("severity", "error"),
                                     s.get("message")),
    "url_prefix": lambda s: kernels.url_prefix(
        s["field"], tuple(s.get("prefixes", ("http://", "https://"))),
        s.get("severity", "error")),
    "range": lambda s: kernels.numeric_range(s["field"], s.get("lo"),
                                             s.get("hi"),
                                             s.get("severity", "error")),
    "castable": lambda s: kernels.castable(s["field"], _dtype(s["target"]),
                                           s.get("severity", "error")),
    "fields_equal": lambda s: kernels.fields_equal(s["field"], s["other"],
                                                   s.get("severity", "error")),
    "both_or_neither": lambda s: kernels.both_or_neither(
        s["field"], s["other"], s.get("severity", "error")),
    "mapped_consistent": lambda s: kernels.mapped_consistent(
        s["field"], s["other"], s["mapping"], s.get("severity", "error")),
    "conditional_required": lambda s: kernels.conditional_required(
        s["cond_field"], s["cond_values"], s["field"],
        s.get("severity", "error"), s.get("message")),
    "area_range": lambda s: kernels.area_range(
        s["w_field"], s["h_field"], s["max_area"],
        s.get("severity", "error")),
    "cond_compare": lambda s: kernels.cond_compare(
        s["cond_field"], s["cond_values"], s["field"], s["op"], s["limit"],
        s["message"], s.get("severity", "error")),
    "list_cardinality": lambda s: kernels.list_cardinality(
        s["field"], s.get("lo"), s.get("hi"), s.get("severity", "error")),
    "unit_pattern": lambda s: kernels.unit_pattern(
        s["field"], s["unit_field"], dict(s["patterns"]),
        s.get("severity", "error")),
    "real_date": lambda s: kernels.real_date(
        s["field"], s.get("format", "%Y-%m-%d"),
        s.get("gate_pattern", r"^\d{4}-\d{2}-\d{2}$"),
        s.get("severity", "error"),
        gate=(kernels.unit_gate(s["unit_field"], s["unit_value"])
              if "unit_field" in s else None)),
    "vocab_member": lambda s: kernels.vocab_member(
        s["field"], s["vocab"], s.get("severity", "error")),
    "text_label_consistent": lambda s: kernels.text_label_consistent(
        s["text_field"], s["field"], s["vocab"],
        s.get("severity", "warning")),
}


def _dtype(name: str):
    import pyarrow as pa
    return {"int64": pa.int64(), "int32": pa.int32(), "float64": pa.float64(),
            "string": pa.string()}[name]


_PLACEHOLDER = re.compile(r"^\$[A-Za-z_][A-Za-z0-9_]*$")


def _resolve(spec: dict, context: dict | None) -> dict | None:
    """Substitute ``"$name"`` placeholder values from ``context`` (runtime
    data like the vocab dim-table terms, which do not belong in a versioned
    ruleset file).

    Resolution is FAIL-CLOSED: a malformed placeholder raises, and a
    placeholder absent from a *provided* context raises (a typo'd context
    key must not silently deactivate validation). Deactivation is explicit
    only — ``context=None`` (no runtime data loaded) or the key present with
    value ``None`` skips the rule, matching ``build_image_ruleset(vocab=None)``.
    A literal leading ``$`` in a spec value is escaped as ``$$``."""
    out = {}
    for k, v in spec.items():
        if isinstance(v, str) and v.startswith("$$"):
            v = v[1:]                       # escaped literal "$..."
        elif isinstance(v, str) and v.startswith("$"):
            if not _PLACEHOLDER.match(v):
                raise ValueError(
                    f"malformed placeholder {v!r} in rule spec "
                    f"{spec.get('rule_id') or spec.get('kind')!r}: "
                    "placeholders are '$name'; escape a literal leading "
                    "'$' as '$$'")
            name = v[1:]
            if context is None:
                return None                 # no runtime data → rule off
            if name not in context:
                raise KeyError(
                    f"placeholder '${name}' not found in context keys "
                    f"{sorted(context)}; pass context[{name!r}] (or None "
                    "to deactivate the rule), or omit context entirely")
            v = context[name]
            if v is None:
                return None                 # explicit deactivation
        out[k] = v
    return out


def ruleset_from_dict(cfg: dict[str, Any],
                      context: dict | None = None) -> RuleSet:
    rs = RuleSet(key_column=cfg["key_column"],
                 sentinel_levels=dict(cfg.get("sentinel_levels", {})))
    for spec in cfg["rules"]:
        spec = _resolve(spec, context)
        if spec is None:
            continue
        kind = spec["kind"]
        if kind not in _KINDS:
            raise ValueError(f"unknown rule kind {kind!r}")
        rule_id = spec.get("rule_id") or f"{kind}.{spec['field']}"
        rs.add(rule_id, spec["field"], _KINDS[kind](spec))
    return rs


def ruleset_from_json(text_or_path: str,
                      context: dict | None = None) -> RuleSet:
    if text_or_path.lstrip().startswith("{"):
        return ruleset_from_dict(json.loads(text_or_path), context)
    with open(text_or_path) as fh:
        return ruleset_from_dict(json.load(fh), context)


def packaged_ruleset_path(name: str) -> str:
    """Path of a ruleset JSON shipped as package data (graft of the
    reference's rulesets-json/*.json files, constants.py:4-70 — but
    versioned INSIDE the package instead of fetched over HTTP)."""
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "rulesets", f"{name}.json")


def load_packaged_ruleset(name: str, context: dict | None = None) -> RuleSet:
    """Build a RuleSet from a shipped declarative ruleset file
    (``rulesets/<name>.json``): image, orders, lineitem, customer, events,
    supplier, part, embeddings, nation, region.
    ``context`` supplies runtime ``$placeholder`` data (e.g.
    ``{"vocab": [...]}`` for the image vocab rules)."""
    return ruleset_from_json(packaged_ruleset_path(name), context)
