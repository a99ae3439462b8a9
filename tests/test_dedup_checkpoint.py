"""Resume semantics for the MinHash dedup chain (VERDICT r2 #6): a killed
run resumes without recomputing finished partitions/stages and converges to
byte-identical outputs vs a fresh full run — mirrors test_checkpoint.py."""

import json
import os

import pyarrow.parquet as pq
import pytest

from faang_pydantics_validation_ray.state.dedup_checkpoint import (
    run_minhash_dedup_checkpointed,
)

SF = "/root/testdata/sf0.001"
N_FILES = 4


@pytest.fixture(scope="module")
def docs_dir(ray_session, tmp_path_factory):
    """Split the seeded-duplicate documents table into N_FILES partitions."""
    d = tmp_path_factory.mktemp("docs_parts")
    t = pq.read_table(f"{SF}/documents.parquet")
    n = t.num_rows
    step = (n + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        pq.write_table(t.slice(i * step, step), str(d / f"part-{i}.parquet"))
    return str(d)


def test_partial_then_resume_byte_identical(docs_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dedup_ckpt"))
    s1 = run_minhash_dedup_checkpointed(docs_dir, out, threshold=0.6,
                                        max_partitions=2)
    assert s1["partitions_done"] == 2 and not s1["complete"]
    assert not os.path.exists(os.path.join(out, "summary.json"))
    mtimes = {i: os.path.getmtime(
        os.path.join(out, "_manifest", f"part={i}.json")) for i in range(2)}

    s2 = run_minhash_dedup_checkpointed(docs_dir, out, threshold=0.6)
    assert s2["complete"] and s2["partitions_done"] == N_FILES
    assert s2["verified_pairs"] > 0 and s2["survivors"] > 0
    for i in range(2):
        assert os.path.getmtime(os.path.join(
            out, "_manifest", f"part={i}.json")) == mtimes[i]

    # fresh full run in another dir: every stage output byte-identical
    out_b = str(tmp_path_factory.mktemp("dedup_ckpt_b"))
    sb = run_minhash_dedup_checkpointed(docs_dir, out_b, threshold=0.6)
    assert {k: s2[k] for k in ("verified_pairs", "survivors",
                               "candidate_buckets", "clustered_ids")} == \
           {k: sb[k] for k in ("verified_pairs", "survivors",
                               "candidate_buckets", "clustered_ids")}
    for rel in ([f"bands/part={i}/bands.parquet" for i in range(N_FILES)]
                + ["candidates/candidates.parquet", "pairs/pairs.parquet",
                   "clusters/clusters.parquet"]):
        a = open(os.path.join(out, rel), "rb").read()
        b = open(os.path.join(out_b, rel), "rb").read()
        assert a == b, f"{rel} differs between resumed and fresh runs"

    # lineage recorded
    with open(os.path.join(out, "_manifest", "part=0.json")) as fh:
        m = json.load(fh)
    assert m["input_files"] and "params_version" in m and m["rows"] > 0


def test_stage_level_resume(docs_dir, tmp_path_factory):
    """Deleting a late-stage manifest re-runs only that stage onward; the
    earlier stages' outputs are reused untouched."""
    out = str(tmp_path_factory.mktemp("dedup_ckpt_s"))
    run_minhash_dedup_checkpointed(docs_dir, out, threshold=0.6)
    cand_mt = os.path.getmtime(
        os.path.join(out, "_manifest", "candidates.json"))
    band_mt = os.path.getmtime(
        os.path.join(out, "_manifest", "part=0.json"))
    pairs_before = open(os.path.join(out, "pairs", "pairs.parquet"),
                        "rb").read()
    os.remove(os.path.join(out, "_manifest", "pairs.json"))
    s = run_minhash_dedup_checkpointed(docs_dir, out, threshold=0.6)
    assert s["complete"]
    assert os.path.getmtime(os.path.join(
        out, "_manifest", "candidates.json")) == cand_mt
    assert os.path.getmtime(os.path.join(
        out, "_manifest", "part=0.json")) == band_mt
    pairs_after = open(os.path.join(out, "pairs", "pairs.parquet"),
                       "rb").read()
    assert pairs_before == pairs_after
