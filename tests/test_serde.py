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
