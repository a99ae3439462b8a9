"""Schema-enforcing reader (P12) + report rendering."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from faang_pydantics_validation_ray.imagetable import datagen
from faang_pydantics_validation_ray.sources.readers import (
    read_image_table, schema_violations,
)


def test_schema_clean(tmp_path):
    d = datagen.ensure_image_table(n=200, seed=42, n_files=1)
    assert schema_violations(d + "/images") == []


def test_schema_unknown_and_missing(tmp_path):
    t = datagen.generate_chunk(0, 10, 10, 42, 1)
    bad = t.append_column("rogue", pa.array(range(10))).drop_columns(["caption"])
    p = str(tmp_path / "bad.parquet")
    pq.write_table(bad, p)
    v = schema_violations(p)
    rules = {x["rule_id"] for x in v}
    assert rules == {"schema.unknown_column", "schema.missing_column"}
    fields = {x["field"] for x in v}
    assert {"rogue", "caption"} <= fields


def test_read_strict_raises(tmp_path, ray_session):
    t = datagen.generate_chunk(0, 10, 10, 42, 1).append_column(
        "rogue", pa.array(range(10)))
    pq.write_table(t, str(tmp_path / "x.parquet"))
    with pytest.raises(ValueError, match="schema violations"):
        read_image_table(str(tmp_path / "x.parquet"))
    ds, viol = read_image_table(str(tmp_path / "x.parquet"), strict=False)
    assert viol and ds.count() == 10


def test_report_renders(ray_session):
    import ray.data as rd
    from faang_pydantics_validation_ray.pipelines.report import render_report
    from faang_pydantics_validation_ray.pipelines.validate import (
        ValidationOptions, validate_images,
    )
    d = datagen.ensure_image_table(n=1000, seed=42, n_files=2)
    res = validate_images(rd.read_parquet(f"{d}/images"),
                          captions_ds=rd.read_parquet(f"{d}/captions.parquet"),
                          opts=ValidationOptions(batch_size=256, concurrency=2))
    rep = render_report(res)
    assert "VALIDATION REPORT" in rep and "unique.image_id" in rep
    assert "part=0" in rep and ("PASS" in rep or "FAIL" in rep)


def test_export_clean_images(ray_session, tmp_path):
    import ray.data as rd
    from faang_pydantics_validation_ray.imagetable import codec, datagen
    from faang_pydantics_validation_ray.pipelines.export import export_clean_images
    n = 1000
    d = datagen.ensure_image_table(n=n, seed=42, n_files=2)
    out = export_clean_images(rd.read_parquet(f"{d}/images"),
                              bad_keys=[datagen.HOT_DUP_ID],
                              out_dir=str(tmp_path / "export"),
                              concurrency=2).to_pandas()
    assert {"image_id", "characteristics", "payload"} <= set(out.columns)
    # all error rows removed (≈1.1% seeded), hot dup excluded explicitly
    assert n * 0.95 < len(out) < n
    assert datagen.HOT_DUP_ID not in set(out.image_id)
    # per-row invariant (input_hint): caption equality + decoded-pixel
    # fidelity between source row and exported doc
    src_df = rd.read_parquet(f"{d}/images").to_pandas()
    src_df = src_df[~src_df.image_id.duplicated(keep=False)]  # seeded dup ids
    src = src_df.set_index("image_id")
    sample = out[out.image_id.isin(src.index)].head(20)
    assert len(sample) == 20
    for _, row in sample.iterrows():
        s = src.loc[row.image_id]
        assert row.characteristics["caption"] == s.caption
        _, _, _, px_out = codec.decode(row.payload)
        _, _, _, px_src = codec.decode(s.bytes)
        assert codec.psnr(px_src, px_out) == float("inf")  # byte-preserving export
    import os
    assert any(p.startswith("partition_id=") for p in
               os.listdir(tmp_path / "export"))


def test_export_relationships(ray_session):
    """Export docs carry relationships[] described_by links to the caption
    records (distributed list-collect + left join; BioSamples-format graft)."""
    import ray.data as rd
    from faang_pydantics_validation_ray.pipelines.export import export_clean_images
    n = 600
    d = datagen.ensure_image_table(n=n, seed=42, n_files=2)
    out = export_clean_images(
        rd.read_parquet(f"{d}/images"), concurrency=2,
        captions_ds=rd.read_parquet(f"{d}/captions.parquet")).to_pandas()
    assert "relationships" in out.columns
    caps = pq.read_table(f"{d}/captions.parquet").to_pandas()
    by_img = caps.groupby("image_id")["caption_id"].apply(set).to_dict()
    checked_nonempty = 0
    for _, row in out.head(200).iterrows():
        rels = list(row.relationships)
        expect = by_img.get(row.image_id, set())
        assert {r["target"] for r in rels} == expect
        assert all(r["type"] == "described_by" for r in rels)
        checked_nonempty += bool(rels)
    assert checked_nonempty > 150  # most images have a caption link


def test_detail_report_renders(ray_session):
    import ray.data as rd
    from faang_pydantics_validation_ray.pipelines.report import render_detail_report
    from faang_pydantics_validation_ray.pipelines.validate import (
        ValidationOptions, validate_images,
    )
    d = datagen.ensure_image_table(n=1000, seed=42, n_files=2)
    res = validate_images(rd.read_parquet(f"{d}/images"),
                          captions_ds=rd.read_parquet(f"{d}/captions.parquet"),
                          opts=ValidationOptions(batch_size=256, concurrency=2))
    rep = render_detail_report(res, max_records=5)
    assert "PER-RECORD VALIDATION DETAIL" in rep
    assert "record " in rep and "more records" in rep  # truncation disclosed
    full = render_detail_report(res, max_records=10**6)
    assert "more records" not in full


def test_read_submission_json_unified_run(tmp_path, ray_session):
    """Reference-style submission intake: one JSON doc of record-type ->
    record-list feeds the unified multi-type run; summary counts follow the
    reference's warn-rows-still-valid semantics."""
    import json
    from faang_pydantics_validation_ray.pipelines.queries import ruleset_orders
    from faang_pydantics_validation_ray.pipelines.unified import validate_many
    from faang_pydantics_validation_ray.sources.readers import read_submission_json
    sub = {"orders": [
        {"o_orderkey": 1, "o_custkey": 10, "o_orderstatus": "O",
         "o_totalprice": 100.0, "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 2, "o_custkey": 11, "o_orderstatus": "X",
         "o_totalprice": 100.0, "o_orderpriority": "2-HIGH"},
        {"o_orderkey": 3, "o_custkey": None, "o_orderstatus": "F",
         "o_totalprice": 100.0, "o_orderpriority": "3-MEDIUM"},
    ]}
    p = str(tmp_path / "submission.json")
    with open(p, "w") as fh:
        json.dump(sub, fh)
    dss = read_submission_json(p)
    assert set(dss) == {"orders"}
    out = validate_many({"orders": (dss["orders"], ruleset_orders()[0])})
    row = out[out.record_type == "orders"].iloc[0]
    assert (row.total, row.valid, row.invalid, row.warnings) == (3, 1, 2, 0)
    tot = out[out.record_type == "total"].iloc[0]
    assert (tot.total, tot.invalid) == (3, 2)


def test_read_records_jsonl_closed_schema(tmp_path, ray_session):
    from faang_pydantics_validation_ray.sources.readers import read_records_jsonl
    p = str(tmp_path / "records.json")
    with open(p, "w") as fh:
        fh.write('{"a": 1, "b": "x", "c": 9}\n{"a": 2, "b": "y", "c": 8}\n')
    ds, viol = read_records_jsonl(p, expected=["a", "b", "z"], strict=False)
    assert ds.count() == 2
    got = {(v["rule_id"], v["field"]) for v in viol}
    assert got == {("schema.unknown_column", "c"), ("schema.missing_column", "z")}
    with pytest.raises(ValueError):
        read_records_jsonl(p, expected=["a", "b"], strict=True)


def test_cli_strict_json_maps_malformed_to_400(tmp_path):
    """validate-submission --strict-json: a truncated/mis-shaped document
    (the reference's provided.json failure mode) yields ONE structured
    400-style error line + exit code 2 — never a traceback (reference
    app.py:101-138 returns HTTP 400 with a structured body). Without the
    flag the parse error still raises (debuggable traceback)."""
    import json
    import subprocess
    import sys

    def run(doc: str, *flags):
        p = tmp_path / "provided.json"
        p.write_text(doc)
        return subprocess.run(
            [sys.executable, "-m", "faang_pydantics_validation_ray.cli",
             "validate-submission", "--input", str(p), "--num-cpus", "2",
             *flags],
            capture_output=True, text=True, cwd="/root/repo", timeout=180)

    # truncated JSON (reference golden-file shape, cut mid-record)
    r = run('{"orders": [{"o_orderkey": 1, "o_orderstatus": "O"', "--strict-json")
    assert r.returncode == 2, r.stderr
    err = json.loads(r.stdout.strip().splitlines()[-1])
    assert err["status"] == 400 and "malformed" in err["error"]
    assert "Traceback" not in r.stderr

    # well-formed JSON, wrong shape (record type not a list) → same 400
    r2 = run('{"orders": {"not": "a list"}}', "--strict-json")
    assert r2.returncode == 2
    assert json.loads(r2.stdout.strip().splitlines()[-1])["status"] == 400

    # without --strict-json the old raising behavior is preserved — and
    # stdout stays EMPTY (the 400 line is a --strict-json-only contract)
    r3 = run('{"orders": [{"o_orderkey": 1', )
    assert r3.returncode not in (0, 2) and "Traceback" in r3.stderr
    assert r3.stdout.strip() == ""


def test_cli_serve_http_contract(tmp_path):
    """cli.py serve — the reference FastAPI analog (app.py:101-138): a
    malformed POST body returns HTTP 400 with a structured JSON error, a
    valid submission returns 200 with the per-type + total summary rows.
    One subprocess serving exactly two requests, driven over localhost."""
    import json
    import socket
    import subprocess
    import sys
    import time
    import urllib.error
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "faang_pydantics_validation_ray.cli",
         "serve", "--port", str(port), "--max-requests", "2",
         "--num-cpus", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo")
    try:
        line = proc.stdout.readline()
        assert json.loads(line)["serving"].endswith("/validate"), line

        def post(body: bytes):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/validate", data=body,
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, err = post(b'{"orders": [{"o_orderkey": 1')
        assert code == 400 and "malformed" in err["error"]

        sub = {"orders": [
            {"o_orderkey": 1, "o_orderstatus": "O", "o_totalprice": 10.0,
             "o_orderpriority": "1-URGENT", "o_custkey": 7},
            {"o_orderkey": 2, "o_orderstatus": "BAD", "o_totalprice": 10.0,
             "o_orderpriority": "1-URGENT", "o_custkey": 7}]}
        code2, rows = post(json.dumps(sub).encode())
        assert code2 == 200
        by_type = {r["record_type"]: r for r in rows}
        assert by_type["orders"]["total"] == 2
        assert by_type["orders"]["invalid"] == 1      # enum.o_orderstatus
        assert by_type["total"]["total"] == 2
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
