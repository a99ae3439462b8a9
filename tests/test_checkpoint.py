"""Resume semantics: a killed run (k of n partitions) resumes without
recomputing finished partitions and converges to the same outputs as a fresh
full run (SURVEY.md §5.2 item 5)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from faang_pydantics_validation_ray.imagetable import datagen
from faang_pydantics_validation_ray.pipelines.validate import ValidationOptions
from faang_pydantics_validation_ray.state.checkpoint import run_validation_checkpointed

N, N_FILES = 2000, 4


@pytest.fixture(scope="module")
def table_dir(ray_session):
    return datagen.ensure_image_table(n=N, seed=42, n_files=N_FILES)


def _opts():
    return ValidationOptions(batch_size=256, concurrency=2)


def test_partial_then_resume(table_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt"))
    # simulate a kill after 2 partitions
    s1 = run_validation_checkpointed(table_dir, out, opts=_opts(), max_partitions=2)
    assert s1["partitions_done"] == 2 and not s1["complete"]
    assert not os.path.exists(os.path.join(out, "summary.json"))
    mtimes = {i: os.path.getmtime(os.path.join(out, "_manifest", f"part={i}.json"))
              for i in range(2)}
    # resume: finishes the rest without touching completed partitions
    s2 = run_validation_checkpointed(table_dir, out, opts=_opts())
    assert s2["complete"] and s2["partitions_done"] == N_FILES
    for i in range(2):
        assert os.path.getmtime(
            os.path.join(out, "_manifest", f"part={i}.json")) == mtimes[i]
    assert s2["total"] == N
    # manifest carries lineage
    with open(os.path.join(out, "_manifest", "part=0.json")) as fh:
        m = json.load(fh)
    assert m["input_files"] and "ruleset_version" in m and m["verdicts"]


def test_resume_equals_fresh(table_dir, tmp_path_factory):
    out_a = str(tmp_path_factory.mktemp("ckpt_a"))
    out_b = str(tmp_path_factory.mktemp("ckpt_b"))
    run_validation_checkpointed(table_dir, out_a, opts=_opts(), max_partitions=1)
    sa = run_validation_checkpointed(table_dir, out_a, opts=_opts())
    sb = run_validation_checkpointed(table_dir, out_b, opts=_opts())
    for k in ("total", "valid", "invalid", "warnings", "relationship_errors"):
        assert sa[k] == sb[k], k
    # byte-identical per-partition violation outputs
    for i in range(N_FILES):
        ta = pq.read_table(os.path.join(out_a, "violations", f"part={i}",
                                        "violations.parquet"))
        tb = pq.read_table(os.path.join(out_b, "violations", f"part={i}",
                                        "violations.parquet"))
        assert ta.equals(tb), f"partition {i} differs"
    ga = pq.read_table(os.path.join(out_a, "global", "violations.parquet"))
    gb = pq.read_table(os.path.join(out_b, "global", "violations.parquet"))
    assert ga.sort_by([("rule_id", "ascending"), ("image_id", "ascending")]).equals(
        gb.sort_by([("rule_id", "ascending"), ("image_id", "ascending")]))


def test_idempotent_rerun(table_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt_i"))
    run_validation_checkpointed(table_dir, out, opts=_opts())
    mt = os.path.getmtime(os.path.join(out, "_manifest", "part=3.json"))
    s = run_validation_checkpointed(table_dir, out, opts=_opts())
    assert s["complete"]
    assert os.path.getmtime(os.path.join(out, "_manifest", "part=3.json")) == mt
