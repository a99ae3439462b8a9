"""Config-driven rulesets: JSON spec → RuleSet → same results as coded rules."""

import json

import pyarrow as pa

from faang_pydantics_validation_ray.rules.serde import ruleset_from_json


def test_json_ruleset_end_to_end():
    cfg = {
        "key_column": "id",
        "sentinel_levels": {"status": "mandatory"},
        "rules": [
            {"kind": "required", "field": "id"},
            {"kind": "enum", "field": "status", "allowed": ["ok", "bad"]},
            {"kind": "range", "field": "v", "lo": 0, "hi": 10,
             "severity": "warning"},
            {"kind": "regex", "field": "code", "pattern": "^C[0-9]+$"},
            {"kind": "conditional_required", "cond_field": "status",
             "cond_values": ["bad"], "field": "code",
             "rule_id": "cond.code_for_bad"},
        ],
    }
    t = pa.table({
        "id": ["a", None, "c", "d", "e"],
        "status": ["ok", "bad", "weird", "restricted access", "bad"],
        "v": [5.0, -1.0, 3.0, 99.0, None],
        "code": ["C1", None, "xx", "C9", "C2"],
    })
    rs = ruleset_from_json(json.dumps(cfg))
    res = rs.evaluate(t)
    got = {(r, k, s) for r, k, s in zip(
        res.violations.column("rule_id").to_pylist(),
        res.violations.column("image_id").to_pylist(),
        res.violations.column("severity").to_pylist())}
    assert ("required.id", None, "error") in got
    assert ("enum.status", "c", "error") in got
    assert ("range.v", None, "warning") in got and ("range.v", "d", "warning") in got
    assert ("regex.code", "c", "error") in got
    assert ("cond.code_for_bad", None, "error") in got       # row b: bad + null code
    assert ("sentinel.status", "d", "warning") in got        # restricted access
    assert ("enum.status", "d", "error") not in got          # sentinel masked out


def test_json_ruleset_new_kinds():
    """Round-2 kinds: unit-dispatched date pattern, real-date round-trip,
    vocab membership, text↔label consistency."""
    cfg = {
        "key_column": "id",
        "rules": [
            {"kind": "unit_pattern", "field": "d", "unit_field": "u",
             "patterns": {"YYYY-MM-DD": r"^\d{4}-\d{2}-\d{2}$",
                          "YYYY": r"^\d{4}$"}},
            {"kind": "real_date", "field": "d"},
            {"kind": "vocab_member", "field": "lab",
             "vocab": ["cat", "dog"]},
            {"kind": "text_label_consistent", "field": "lab",
             "text_field": "txt", "vocab": ["cat", "dog"]},
        ],
    }
    t = pa.table({
        "id": ["a", "b", "c", "d"],
        "d": ["2021-02-30", "2021-05-01", "2021", "2021-01-01"],
        "u": ["YYYY-MM-DD", "YYYY", "YYYY", "YYYY-MM-DD"],
        "lab": ["cat", "dog", "wug", "dog"],
        "txt": ["a cat photo", "a dog here", "whatever", "a cat not d-o-g"],
    })
    from faang_pydantics_validation_ray.rules.serde import ruleset_from_json
    rs = ruleset_from_json(json.dumps(cfg))
    res = rs.evaluate(t, exemplar_cap=100)
    got = {(r, k) for r, k in zip(res.violations.column("rule_id").to_pylist(),
                                  res.violations.column("image_id").to_pylist())}
    assert got == {
        ("unit_pattern.d", "b"),        # full date under YYYY unit
        ("real_date.d", "a"),           # Feb 30 rolls over -> caught
        ("vocab_member.lab", "c"),      # wug not in vocab
        ("text_label_consistent.lab", "d"),  # label dog absent from text
    }
