"""Resume semantics for the curation chain: a killed run resumes without
recomputing finished partitions/stages, converges to byte-identical outputs
vs a fresh full run, and the final survivors match the registered
``curate_documents`` query (same per-batch kernel) — mirrors
test_dedup_checkpoint.py."""

import json
import os

import pyarrow.parquet as pq
import pytest

from faang_pydantics_validation_ray.state.curate_checkpoint import (
    read_survivors,
    run_curate_checkpointed,
)

SF = "/root/testdata/sf0.001"
N_FILES = 4


@pytest.fixture(scope="module")
def docs_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("curate_parts")
    t = pq.read_table(f"{SF}/documents.parquet")
    step = (t.num_rows + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        pq.write_table(t.slice(i * step, step), str(d / f"part-{i}.parquet"))
    return str(d)


def test_partial_then_resume_byte_identical(docs_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curate_ckpt"))
    s1 = run_curate_checkpointed(docs_dir, out, max_partitions=2)
    assert s1["partitions_done"] == 2 and not s1["complete"]
    assert not os.path.exists(os.path.join(out, "summary.json"))
    mtimes = {i: os.path.getmtime(
        os.path.join(out, "_manifest", f"part={i}.json")) for i in range(2)}
    bench_mt = os.path.getmtime(
        os.path.join(out, "_manifest", "benchgrams.json"))

    s2 = run_curate_checkpointed(docs_dir, out)
    assert s2["complete"] and s2["partitions_done"] == N_FILES
    assert s2["survivors"] > 0
    for i in range(2):
        assert os.path.getmtime(os.path.join(
            out, "_manifest", f"part={i}.json")) == mtimes[i]
    assert os.path.getmtime(os.path.join(
        out, "_manifest", "benchgrams.json")) == bench_mt

    # fresh full run in another dir: every stage output byte-identical
    out_b = str(tmp_path_factory.mktemp("curate_ckpt_b"))
    sb = run_curate_checkpointed(docs_dir, out_b)
    assert s2["survivors"] == sb["survivors"]
    for rel in ([f"clean/part={i}/clean.parquet" for i in range(N_FILES)]
                + ["benchgrams/benchgrams.parquet",
                   "survivors/survivors.parquet"]):
        a = open(os.path.join(out, rel), "rb").read()
        b = open(os.path.join(out_b, rel), "rb").read()
        assert a == b, f"{rel} differs between resumed and fresh runs"

    # lineage recorded
    with open(os.path.join(out, "_manifest", "part=0.json")) as fh:
        m = json.load(fh)
    assert m["input_files"] and "params_version" in m

    # the checkpointed survivors ARE the registered query's result (the
    # DuckDB-oracle-verified one) — same kernel, same answer
    from faang_pydantics_validation_ray.pipelines import queries as Q
    expected = Q.QUERIES["curate_documents"](SF)
    got = read_survivors(out)
    assert got["doc_id"].tolist() == expected["doc_id"].tolist()


def test_stage_level_resume(docs_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curate_ckpt_s"))
    run_curate_checkpointed(docs_dir, out)
    part_mt = os.path.getmtime(os.path.join(out, "_manifest", "part=0.json"))
    surv_before = open(os.path.join(out, "survivors", "survivors.parquet"),
                       "rb").read()
    os.remove(os.path.join(out, "_manifest", "survivors.json"))
    s = run_curate_checkpointed(docs_dir, out)
    assert s["complete"]
    assert os.path.getmtime(os.path.join(
        out, "_manifest", "part=0.json")) == part_mt
    surv_after = open(os.path.join(out, "survivors", "survivors.parquet"),
                      "rb").read()
    assert surv_before == surv_after


def test_empty_partition_and_custom_params(ray_session, tmp_path_factory):
    """A partition whose docs are ALL filtered out is still a valid,
    completed unit (empty clean parquet + manifest), and the exposed
    col/ngram knobs are honored end-to-end."""
    import numpy as np
    import pyarrow as pa

    d = tmp_path_factory.mktemp("curate_empty_parts")
    # part 0: real English docs; part 1: all fail the 5-token quality bar
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(1, 9, dtype=np.int64)),
        "body": pa.array(["the quick brown fox jumps over the lazy dog"] * 8),
    }), str(d / "part-0.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(101, 109, dtype=np.int64)),
        "body": pa.array(["x"] * 8),
    }), str(d / "part-1.parquet"))

    out = str(tmp_path_factory.mktemp("curate_empty_out"))
    s = run_curate_checkpointed(str(d), out, col="body", ngram=5)
    assert s["complete"] and s["partitions_done"] == 2
    empty_part = pq.read_table(
        os.path.join(out, "clean", "part=1", "clean.parquet"))
    assert empty_part.num_rows == 0
    # 8 identical docs dedup to one survivor (the min doc_id)
    assert read_survivors(out)["doc_id"].tolist() == [1]


def test_resume_with_changed_params_recomputes(docs_dir, tmp_path_factory,
                                               tmp_path):
    """Killing an ngram=4 run and resuming with ngram=5 must NOT mix stage
    outputs computed under different parameters (ADVICE r3): stale-version
    manifests don't count as done, every unit recomputes, and the result is
    byte-identical to a fresh ngram=5 run."""
    out = str(tmp_path_factory.mktemp("curate_ckpt_params"))
    s1 = run_curate_checkpointed(docs_dir, out, ngram=4, max_partitions=2)
    assert s1["partitions_done"] == 2 and not s1["complete"]

    s2 = run_curate_checkpointed(docs_dir, out, ngram=5)   # resumed, new params
    assert s2["complete"] and s2["partitions_done"] == s2["partitions_total"]
    assert "ngram=5" in s2["params_version"]
    # manifests on disk all carry the new version — nothing stale survived
    man_dir = os.path.join(out, "_manifest")
    for f in os.listdir(man_dir):
        with open(os.path.join(man_dir, f)) as fh:
            assert json.load(fh).get("params_version") == s2["params_version"], f

    fresh = str(tmp_path_factory.mktemp("curate_fresh_params"))
    run_curate_checkpointed(docs_dir, fresh, ngram=5)
    import pandas as pd
    pd.testing.assert_frame_equal(read_survivors(out), read_survivors(fresh))
