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


def test_placeholder_resolution_fails_closed():
    """Placeholders must never silently deactivate validation: a malformed
    placeholder raises, a placeholder missing from a PROVIDED context raises
    (typo protection), '$$' escapes a literal leading '$', and deactivation
    happens only explicitly (context=None, or the key present with None)."""
    import pytest

    from faang_pydantics_validation_ray.rules.serde import ruleset_from_dict

    base = {"key_column": "id", "rules": [
        {"kind": "enum", "field": "status", "allowed": "$allowed"}]}
    t = pa.table({"id": ["a", "b"], "status": ["ok", "nope"]})

    # resolved placeholder: rule active
    rs = ruleset_from_dict(base, context={"allowed": ["ok"]})
    assert rs.evaluate(t).violations.num_rows == 1
    # context omitted entirely, or key explicitly None → rule deactivates
    assert ruleset_from_dict(base).evaluate(t).violations.num_rows == 0
    assert ruleset_from_dict(base, context={"allowed": None}) \
        .evaluate(t).violations.num_rows == 0
    # typo'd context key must raise, not silently skip the rule
    with pytest.raises(KeyError, match=r"\$allowed"):
        ruleset_from_dict(base, context={"alowed": ["ok"]})
    # a literal '$...' string is not a placeholder: malformed → loud error
    bad = {"key_column": "id", "rules": [
        {"kind": "regex", "field": "id", "pattern": "^a$",
         "message": "$100 minimum"}]}
    with pytest.raises(ValueError, match="escape"):
        ruleset_from_dict(bad)
    # '$$' escape produces the literal leading-'$' value
    esc = {"key_column": "id", "rules": [
        {"kind": "regex", "field": "id", "pattern": "^a$",
         "message": "$$100 minimum", "rule_id": "regex.id"}]}
    rs = ruleset_from_dict(esc)
    res = rs.evaluate(t)
    assert res.violations.num_rows == 1
    assert res.violations.column("message").to_pylist() == ["$100 minimum"]


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


def _img_scalar_counts_with(sf_dir, ruleset, vocab):
    """Per-(rule, severity) exact counts through the fused stage with an
    explicit RuleSet — the q_img_scalar_counts computation, parameterized."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from faang_pydantics_validation_ray.stages.validate_batch import (
        ValidateImagesBatch,
    )
    events = rd.read_parquet(f"{sf_dir}/images").map_batches(
        ValidateImagesBatch,
        fn_constructor_kwargs=dict(decode=False, exemplar_cap=0,
                                   ruleset=ruleset, vocab=vocab),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=512,
        concurrency=2, num_cpus=1)
    rc = events.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "rule_count"))
        .select(["rule_id", "severity", "count"]), batch_format="pyarrow")
    out = (rc.groupby(["rule_id", "severity"])
           .aggregate(Sum("count", alias_name="violations")).to_pandas())
    return (out.sort_values(["rule_id", "severity"])
            .reset_index(drop=True).astype({"violations": "int64"}))


def test_packaged_image_ruleset_reproduces_builtin(ray_session):
    """The shipped rulesets/image.json, loaded through serde with the vocab
    context, must reproduce the coded build_image_ruleset EXACTLY — same
    rule_ids, same severities, same per-rule violation counts over the
    dirty golden table (the config-driven path of VERDICT r3 #5)."""
    import pyarrow.parquet as pq

    from faang_pydantics_validation_ray.imagetable import datagen
    from faang_pydantics_validation_ray.rules.image_rules import (
        build_image_ruleset,
    )
    from faang_pydantics_validation_ray.rules.serde import (
        load_packaged_ruleset,
    )
    d = datagen.ensure_image_table(n=2000, seed=42, n_files=4)
    vocab = pq.read_table(f"{d}/vocab.parquet").column("label").to_pylist()
    coded = _img_scalar_counts_with(d, build_image_ruleset(vocab=vocab),
                                    vocab)
    loaded = _img_scalar_counts_with(
        d, load_packaged_ruleset("image", context={"vocab": vocab}), vocab)
    assert len(coded) >= 10 and (coded["violations"] > 0).any()
    import pandas as pd
    pd.testing.assert_frame_equal(coded, loaded)
    # without context the vocab rules deactivate (= build_image_ruleset(None))
    novocab = load_packaged_ruleset("image")
    coded_nv = _img_scalar_counts_with(d, build_image_ruleset(vocab=None),
                                       vocab)
    loaded_nv = _img_scalar_counts_with(d, novocab, vocab)
    pd.testing.assert_frame_equal(coded_nv, loaded_nv)


def test_packaged_tpch_rulesets_through_validate_many(ray_session):
    """validate_many accepts packaged ruleset NAMES; summaries must equal
    the coded-ruleset run row for row."""
    import pandas as pd
    import ray.data as rd

    from faang_pydantics_validation_ray.pipelines.queries import (
        ruleset_customer, ruleset_events, ruleset_lineitem, ruleset_orders,
    )
    from faang_pydantics_validation_ray.pipelines.unified import validate_many
    sf = "/root/testdata/sf0.001"

    def rp(t):
        return rd.read_parquet(f"{sf}/{t}.parquet")

    coded = validate_many({
        "orders": (rp("orders"), ruleset_orders()[0]),
        "lineitem": (rp("lineitem"), ruleset_lineitem()[0]),
        "customer": (rp("customer"), ruleset_customer()[0]),
        "events": (rp("events"), ruleset_events()[0])})
    packaged = validate_many({
        "orders": (rp("orders"), "orders"),
        "lineitem": (rp("lineitem"), "lineitem"),
        "customer": (rp("customer"), "customer"),
        "events": (rp("events"), "events")})
    pd.testing.assert_frame_equal(coded, packaged)
