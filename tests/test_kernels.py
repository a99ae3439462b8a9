"""Unit tests for the vectorized rule kernels (pure Arrow, no Ray)."""

import numpy as np
import pyarrow as pa

from faang_pydantics_validation_ray.rules import image_rules, kernels, sentinels
from faang_pydantics_validation_ray.rules.spec import RuleContext, RuleSet


def _ctx(t, levels=None):
    return RuleContext(t, levels or {})


def _mask(findings, i=0):
    return findings[i][0]


def test_required_and_recommended():
    t = pa.table({"k": ["a", None, "c"], "x": [1, None, 3]})
    assert _mask(kernels.required("k")(t, _ctx(t))).tolist() == [False, True, False]
    m, sev, _ = kernels.recommended("x")(t, _ctx(t))[0]
    assert m.tolist() == [False, True, False] and sev == "warning"


def test_enum_skips_sentinels_and_nulls():
    t = pa.table({"fmt": ["png", "bmp", None, "restricted access"]})
    ctx = _ctx(t, {"fmt": "mandatory"})
    m = _mask(kernels.enum_in("fmt", ["png", "jpeg"])(t, ctx))
    assert m.tolist() == [False, True, False, False]


def test_sentinel_policy():
    col = pa.chunked_array([["ok", "restricted access", "not collected", "", None]])
    f = sentinels.sentinel_findings(col, "mandatory")
    sev_by_val = {}
    for mask, sev, _ in f:
        for i, hit in enumerate(mask):
            if hit:
                sev_by_val[col[i].as_py()] = sev
    assert sev_by_val == {"restricted access": "warning", "not collected": "error", "": "error"}
    f2 = sentinels.sentinel_findings(col, "recommended")
    assert all(sev == "warning" for _, sev, _ in f2)
    hits = np.zeros(5, dtype=bool)
    for mask, _, _ in f2:
        hits |= mask
    assert hits.tolist() == [False, False, True, False, False]


def test_regex_and_url_and_range():
    t = pa.table({"id": ["IMG_000000000001", "img-bad", None],
                  "u": ["https://x", "ftp://y", None],
                  "v": [5.0, -1.0, None]})
    ctx = _ctx(t)
    assert _mask(kernels.regex("id", image_rules.ID_PATTERN)(t, ctx)).tolist() == [False, True, False]
    assert _mask(kernels.url_prefix("u")(t, ctx)).tolist() == [False, True, False]
    assert _mask(kernels.numeric_range("v", lo=0)(t, ctx)).tolist() == [False, True, False]


def test_cross_field_kernels():
    t = pa.table({"a": ["x", "y", None, "x"], "b": ["x", "z", "w", None]})
    ctx = _ctx(t)
    assert _mask(kernels.fields_equal("a", "b")(t, ctx)).tolist() == [False, True, False, False]
    assert _mask(kernels.both_or_neither("a", "b")(t, ctx)).tolist() == [False, False, True, True]
    m = _mask(kernels.mapped_consistent("a", "b", {"x": "x", "y": "yy"})(t, ctx))
    assert m.tolist() == [False, True, False, False]


def test_conditional_and_cardinality():
    t = pa.table({"fm": ["frozen", "fresh", "frozen", None],
                  "dt": [None, None, "2024-01-01", None],
                  "lst": [["a", "b", "c"], ["a"], [], None]})
    ctx = _ctx(t)
    m = _mask(kernels.conditional_required("fm", ["frozen"], "dt")(t, ctx))
    assert m.tolist() == [True, False, False, False]
    m2 = _mask(kernels.list_cardinality("lst", lo=1, hi=2)(t, ctx))
    assert m2.tolist() == [True, False, True, False]


def test_normalize():
    t = pa.table({"fmt": [" JPEG ", "png", "", None]})
    t2, changed = kernels.normalize_strings(t, ["fmt"])
    assert t2.column("fmt").to_pylist() == ["jpeg", "png", None, None]
    assert changed["fmt"].tolist() == [True, False, False, False]


def test_image_ruleset_end_to_end_batch():
    """One batch through the full scalar image RuleSet with known violations."""
    from faang_pydantics_validation_ray.imagetable import datagen
    n = 2000
    raw = datagen.generate_chunk(0, n, n, 42, 1)
    t, changed = image_rules.normalize_image_batch(raw)
    rs = image_rules.build_image_ruleset()
    res = rs.evaluate(t, extra_findings={
        "normalize.fmt:fmt": [(changed["fmt"], "warning", "fmt normalized")]})
    got = {(r, s) for r, _, s in zip(
        res.violations.column("rule_id").to_pylist(),
        res.violations.column("image_id").to_pylist(),
        res.violations.column("severity").to_pylist())}
    assert ("required.image_id", "error") in got
    assert ("required.bytes", "error") in got
    assert ("enum.fmt", "error") in got
    assert ("pattern.image_id", "error") in got
    assert ("range.dims", "error") in got
    assert ("sentinel.fmt", "warning") in got
    assert ("sentinel.fmt", "error") in got
    assert ("normalize.fmt", "warning") in got
    # exact counts for scalar rules at n=2000 (2 rows per bucket)
    cnt = {(r, s): c for r, s, c in res.rule_counts}
    assert cnt[("required.image_id", "error")] == 2
    assert cnt[("enum.fmt", "error")] == 2
    assert cnt[("range.dims", "error")] == 6      # buckets 6,7,8 × 2
    assert cnt[("recommended.caption", "warning")] == 2
    assert cnt[("normalize.fmt", "warning")] == 2
    # row masks: error rows ≥ sum of distinct error buckets
    assert res.error_mask.sum() >= 10


def test_ontology_transitive_closure_and_mask():
    """Subclass-closure membership (graph_restriction graft): transitive
    reachability incl. self, shared subtrees, and the vectorized mask."""
    import numpy as np
    import pyarrow as pa
    from faang_pydantics_validation_ray.rules import ontology

    clo = ontology.transitive_closure()
    # transitive: root reaches leaf brands through GRP nodes
    assert ("ROOT#BUDGET", "Brand#1") in clo
    assert ("ROOT#PREMIUM", "Brand#25") in clo
    # shared subtree GRP#2 belongs to BOTH roots
    assert ("ROOT#BUDGET", "Brand#12") in clo
    assert ("ROOT#PREMIUM", "Brand#12") in clo
    # restriction: premium-only brands NOT under budget and vice versa
    assert ("ROOT#BUDGET", "Brand#20") not in clo
    assert ("ROOT#PREMIUM", "Brand#3") not in clo
    # include_self
    assert ("GRP#1", "GRP#1") in clo and ("Brand#5", "Brand#5") in clo

    ps = ontology.closure_pair_set(clo)
    root = pa.array(["ROOT#BUDGET", "ROOT#BUDGET", "ROOT#PREMIUM", None])
    term = pa.array(["Brand#3", "Brand#20", "Brand#20", "Brand#1"])
    bad = ontology.subclass_violation_mask(root, term, ps)
    assert bad.tolist() == [False, True, False, False]  # nulls pass
