"""Golden end-to-end: full pipeline over the seeded synthetic table must
reproduce the exactly-computed expected violation multiset (FIXTURES.md §A.3),
mirroring the reference's seeded-corpus + golden-output strategy
(/root/reference/validation_results.json)."""

import collections

import pyarrow.parquet as pq
import pytest

from faang_pydantics_validation_ray.imagetable import datagen
from faang_pydantics_validation_ray.pipelines import profile as prof
from faang_pydantics_validation_ray.pipelines.validate import (
    ValidationOptions, validate_images,
)

N = 2000
N_FILES = 4


@pytest.fixture(scope="module")
def golden_run(ray_session):
    import ray.data as rd
    d = datagen.ensure_image_table(n=N, seed=42, n_files=N_FILES)
    clean = datagen.ensure_image_table(n=N, seed=42, n_files=N_FILES,
                                       violations=False, drift=False)
    images = rd.read_parquet(f"{d}/images")
    captions = rd.read_parquet(f"{d}/captions.parquet")
    catalog = rd.read_parquet(f"{d}/catalog.parquet")
    vocab = pq.read_table(f"{d}/vocab.parquet").column("label").to_pylist()
    ref_profile = prof.build_reference_profile(rd.read_parquet(f"{clean}/images"))
    res = validate_images(images, captions_ds=captions, ref_profile=ref_profile,
                          catalog_ds=catalog, vocab=vocab,
                          opts=ValidationOptions(batch_size=256, concurrency=2))
    return res


def test_violation_multiset_matches_golden(golden_run):
    res = golden_run
    got = collections.Counter()
    for r, i, s, c in zip(res.violations.column("rule_id").to_pylist(),
                          res.violations.column("image_id").to_pylist(),
                          res.violations.column("severity").to_pylist(),
                          res.violations.column("count").to_pylist()):
        if r.startswith("drift."):
            continue  # partition-level, asserted separately
        got[(r, i, s)] += 1
    exp = collections.Counter()
    for r, i, s in datagen.expected_violations(N, 42, N_FILES):
        exp[(r, i, s)] += 1
    missing = exp - got
    unexpected = got - exp
    assert not missing, f"missing violations: {dict(list(missing.items())[:10])}"
    assert not unexpected, f"unexpected violations: {dict(list(unexpected.items())[:10])}"


def test_verdicts_and_drift(golden_run):
    res = golden_run
    v = res.verdicts
    assert len(v) == N_FILES
    assert set(v["partition_id"]) == set(range(N_FILES))
    # drift partition is the last file, and only it fails
    drift_pid = N_FILES - 1
    assert res.summary["drift_partitions"] == [drift_pid]
    assert not v.loc[v.partition_id == drift_pid, "pass"].iloc[0]
    assert v.loc[v.partition_id != drift_pid, "pass"].all()
    # summary semantics: valid + invalid == total; warnings are valid rows
    s = res.summary
    assert s["valid"] + s["invalid"] == s["total"] == N
    assert s["warnings"] > 0 and s["relationship_errors"] > 0


def test_rule_counts_exact(golden_run):
    res = golden_run
    exp = collections.Counter()
    for r, _, s in datagen.expected_violations(N, 42, N_FILES):
        exp[(r, s)] += 1
    rc = {(r, s): int(c) for r, s, c in
          res.rule_counts[["rule_id", "severity", "count"]].itertuples(index=False)}
    # row-level rules: counts must match exactly
    for key in [("required.image_id", "error"), ("enum.fmt", "error"),
                ("pattern.image_id", "error"), ("range.dims", "error"),
                ("pixel.psnr", "error"), ("pixel.decode", "error"),
                ("xfield.fmt_magic", "error"), ("xfield.dims_match", "error"),
                ("recommended.caption", "warning"), ("normalize.fmt", "warning")]:
        assert rc.get(key) == exp[key], (key, rc.get(key), exp[key])
    # group rules: count = total affected rows, not groups
    dup_rows = sum(1 for i in range(N)
                   if (i % 1000) in (datagen.B_DUP_PREV, datagen.B_DUP_HOT)
                   or ((i + 1) % 1000 == datagen.B_DUP_PREV and i + 1 < N))
    assert rc[("unique.image_id", "error")] == dup_rows
    assert rc[("ref.caption_image", "error")] == exp[("ref.caption_image", "error")]


def test_profile_written(golden_run):
    res = golden_run
    p = res.profile
    assert {"w", "h", "byte_size", "phash"} <= set(p["col"])
    wp = p[(p.col == "w") & (p.partition_id == 0)].iloc[0]
    assert wp["count"] == N // N_FILES
    assert wp["psi"] < 0.2  # non-drift partition close to reference
    wd = p[(p.col == "w") & (p.partition_id == N_FILES - 1)].iloc[0]
    assert wd["psi"] > 0.2


def test_violation_explosion_bounded(ray_session):
    """A table where EVERY row violates several rules must emit capped
    exemplars plus exact counts — never ≫1 violation row per input row
    (SURVEY.md §7 'violation-row explosion')."""
    import pyarrow as pa
    import ray.data as rd
    from faang_pydantics_validation_ray.pipelines.validate import (
        ValidationOptions, validate_images,
    )
    n = 5000
    t = pa.table({
        "image_id": pa.array([None] * n, type=pa.string()),   # required error
        "bytes": pa.array([None] * n, type=pa.binary()),      # required error
        "w": pa.array([0] * n, type=pa.int32()),              # range error
        "h": pa.array([0] * n, type=pa.int32()),
        "fmt": pa.array(["bmp"] * n, type=pa.string()),       # enum error
        "caption": pa.array([None] * n, type=pa.string()),    # warning
        "phash": pa.array([None] * n, type=pa.int64()),       # warning
        "partition_id": pa.array([0] * n, type=pa.int32()),
    })
    cap, gcap = 10, 25
    opts = ValidationOptions(
        batch_size=500, concurrency=2, exemplar_cap=cap,
        exemplar_global_cap=gcap,
        check_neardup=False, check_unique=False, check_referential=False)
    res = validate_images(rd.from_arrow(t), opts=opts)
    # exact counts survive: every rule fired on every row
    rc = {r: c for r, _, c in res.rule_counts[["rule_id", "severity", "count"]]
          .itertuples(index=False)}
    for rule in ("required.image_id", "required.bytes", "range.dims",
                 "enum.fmt", "recommended.caption", "recommended.phash"):
        assert rc[rule] == n, rule
    # driver-side exemplars GLOBALLY bounded per (rule, severity) — the
    # bound is independent of row/batch count (VERDICT r3 #3): the per-
    # batch cap alone would admit cap × #batches rows per rule here
    vdf = res.violations.to_pandas()
    per_rule = vdf.groupby(["rule_id", "severity"]).size()
    assert (per_rule <= gcap).all(), per_rule
    assert res.violations.num_rows <= gcap * len(rc)
    assert res.violations.num_rows < n
    assert res.summary["invalid"] == n
    # selection is deterministic (exact distributed top-k, block-boundary
    # independent): a second run yields the byte-identical exemplar set
    res2 = validate_images(rd.from_arrow(t), opts=opts)
    assert res.violations.equals(res2.violations)
    # mid-tree level (VERDICT r4 #2): forcing the hash(rule_id, severity)
    # exchange between block heads and the driver head (the cluster-scale
    # regime where the event stream has hundreds of blocks) must keep the
    # exemplar set byte-identical AND the per-(rule, severity) bound —
    # driver-resident rows are then cap × #(rule, severity) regardless of
    # event-stream block count
    opts3 = ValidationOptions(
        batch_size=500, concurrency=2, exemplar_cap=cap,
        exemplar_global_cap=gcap, exemplar_midtree_min_blocks=1,
        check_neardup=False, check_unique=False, check_referential=False)
    res3 = validate_images(rd.from_arrow(t), opts=opts3)
    assert res.violations.equals(res3.violations)
    v3 = res3.violations.to_pandas()
    assert (v3.groupby(["rule_id", "severity"]).size() <= gcap).all()


def test_unified_multi_type_rollup(ray_session):
    """Unified multi-record-type run (reference unified_validator semantics):
    per-type summaries + cross-type total; warn-only rows count as VALID."""
    import pandas as pd
    import ray.data as rd
    from faang_pydantics_validation_ray.pipelines.unified import validate_many
    from faang_pydantics_validation_ray.rules import kernels
    from faang_pydantics_validation_ray.rules.spec import RuleSet

    rs_a = RuleSet(key_column="k")
    rs_a.add("required.v", "v", kernels.required("v"))
    rs_a.add("range.w", "w", kernels.numeric_range("w", lo=0, severity="warning"))
    a = rd.from_pandas(pd.DataFrame({
        "k": [1, 2, 3, 4],
        "v": ["x", None, "y", "z"],       # 1 error row
        "w": [1.0, 5.0, -1.0, 2.0]}))     # row 3: warning only
    rs_b = RuleSet(key_column="k")
    rs_b.add("required.v", "v", kernels.required("v"))
    b = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))

    out = validate_many({"alpha": (a, rs_a), "beta": (b, rs_b)})
    byt = out.set_index("record_type")
    assert byt.loc["alpha"].to_dict() == {
        "total": 4, "valid": 3, "invalid": 1, "warnings": 1}
    assert byt.loc["beta"].to_dict() == {
        "total": 2, "valid": 2, "invalid": 0, "warnings": 0}
    assert byt.loc["total"].to_dict() == {
        "total": 6, "valid": 5, "invalid": 1, "warnings": 1}
    assert list(out["record_type"]) == ["alpha", "beta", "total"]
