"""Checkpoint / resume with per-partition lineage manifests (SURVEY.md §4.2,
north_rule "resumable from checkpoint with per-partition lineage + metrics").

Layout under ``out_dir``::

    violations/part=<i>/violations.parquet     per-partition row-level outputs
    _manifest/part=<i>.json                    lineage: input files, ruleset
                                               version, row counts, verdict
                                               metrics, wall time
    global/violations.parquet                  cross-partition (shuffle) rules
    _manifest/global.json
    verdicts.parquet, summary.json, report.txt final combined outputs

Writes are ATOMIC: each partition's outputs land in a temp dir that is
``os.rename``d into place after its manifest is fully written — a killed run
leaves either a complete partition or nothing, so resume = "skip partitions
whose manifest exists". Partition granularity here is one input parquet file;
on a real cluster it is a bundle of Lance fragments per manifest entry (the
manifest records the fragment list either way).

The reference has no checkpointing at all — a crash reruns everything and
overwrites one JSON file (/root/reference/main.py:79-87).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import __version__
from ..functions import groups
from ..pipelines.profile import load_profile
from ..pipelines.validate import (
    VIOLATION_SCHEMA, ValidationOptions, _viol_table, validate_images,
)


def _ruleset_version(vocab=None) -> str:
    """Version string identifying the EFFECTIVE ruleset: includes the
    vocab-dependent rule ids and a content hash of the vocab terms, so
    changing vocab.parquet changes every manifest's recorded version (a
    resume cannot silently mix partitions validated under different
    rulesets)."""
    import hashlib

    from ..rules.image_rules import build_image_ruleset
    rules = sorted(r.rule_id for r in build_image_ruleset(vocab=vocab).rules)
    v = f"{__version__}:{','.join(rules)}"
    if vocab is not None:
        vh = hashlib.md5("\x00".join(sorted(set(vocab)))
                         .encode("utf-8")).hexdigest()[:12]
        v += f":vocab={vh}"
    return v


def run_validation_checkpointed(input_dir: str, out_dir: str,
                                ref_profile_path: str | None = None,
                                opts: ValidationOptions = ValidationOptions(),
                                resume: bool = True,
                                max_partitions: int | None = None) -> dict:
    """Validate ``input_dir/images/*.parquet`` (+ optional captions.parquet)
    partition-by-partition with resume; returns the combined summary.

    ``max_partitions`` processes only the first K incomplete partitions (used
    by the resume test to simulate a killed run).
    """
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(input_dir, "images", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no images/*.parquet under {input_dir}")
    man_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    ref_profile = load_profile(ref_profile_path) if ref_profile_path else None
    vocab_path = os.path.join(input_dir, "vocab.parquet")
    vocab = (pq.read_table(vocab_path).column("label").to_pylist()
             if os.path.exists(vocab_path) else None)

    per_opts = ValidationOptions(**{**opts.__dict__, "check_unique": False,
                                    "check_neardup": False,
                                    "check_referential": False})
    done = 0
    for i, f in enumerate(files):
        man_path = os.path.join(man_dir, f"part={i}.json")
        if resume and os.path.exists(man_path):
            continue
        if max_partitions is not None and done >= max_partitions:
            continue
        t0 = time.time()
        res = validate_images(rd.read_parquet(f), ref_profile=ref_profile,
                              opts=per_opts, vocab=vocab)
        part_dir = os.path.join(out_dir, "violations", f"part={i}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(res.violations, os.path.join(tmp_dir, "violations.parquet"))
        shutil.rmtree(part_dir, ignore_errors=True)
        os.rename(tmp_dir, part_dir)
        manifest = {
            "partition": i, "input_files": [f],
            "ruleset_version": _ruleset_version(vocab),
            "verdicts": res.verdicts.to_dict(orient="records"),
            "summary": res.summary,
            "profile": res.profile.drop(columns=[c for c in ("sketch",)
                                                 if c in res.profile], errors="ignore")
            .to_dict(orient="records"),
            "wall_s": round(time.time() - t0, 3),
        }
        tmp_man = man_path + ".tmp"
        with open(tmp_man, "w") as fh:
            json.dump(manifest, fh, default=str)
        os.rename(tmp_man, man_path)
        done += 1

    manifests = []
    for i in range(len(files)):
        mp = os.path.join(man_dir, f"part={i}.json")
        if os.path.exists(mp):
            with open(mp) as fh:
                manifests.append(json.load(fh))
    complete = len(manifests) == len(files)

    # ---- global (cross-partition) rules once, over narrow columns only
    if complete:
        gman = os.path.join(man_dir, "global.json")
        if not (resume and os.path.exists(gman)):
            narrow = rd.read_parquet(os.path.join(input_dir, "images"),
                                     columns=["image_id", "phash"])
            cap_path = os.path.join(input_dir, "captions.parquet")
            cat_path = os.path.join(input_dir, "catalog.parquet")
            # ALL cross-partition counting rules in the ONE fused shuffle
            # (same path as the streaming pipeline): uniqueness, referential
            # (with external-catalog fall-through), near-dup cardinality
            dup, missing, near_cnt, external = groups.fused_cross_record_counts(
                narrow,
                rd.read_parquet(cap_path).select_columns(["image_id"])
                if os.path.exists(cap_path) else None,
                catalog_keys=rd.read_parquet(cat_path).select_columns(["image_id"])
                if os.path.exists(cat_path) else None)
            near_cnt = near_cnt[near_cnt["cnt"] >= opts.neardup_min]
            near = groups.collect_exemplars(narrow, "phash", "image_id",
                                            near_cnt, k=3)
            gtables = [
                _viol_table("unique.image_id", dup["image_id"].tolist(), "error",
                            "image_id", "duplicate image_id", dup["cnt"].tolist()),
                _viol_table("neardup.phash",
                            [f"phash={int(p)}" for p in near.get("phash", [])],
                            "warning", "phash", "near-duplicate phash cluster",
                            near.get("cnt", pd.Series(dtype=int)).tolist()),
                _viol_table("ref.caption_image", missing["image_id"].tolist(),
                            "error", "image_id",
                            "caption references a missing image_id",
                            missing["left_cnt"].astype(int).tolist()),
                _viol_table("ref.caption_image_external",
                            external["image_id"].tolist(), "warning", "image_id",
                            "caption reference resolved via external catalog only",
                            external["left_cnt"].astype(int).tolist()),
            ]
            gdir = os.path.join(out_dir, "global")
            tmp = gdir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp, exist_ok=True)
            gt = pa.concat_tables([t for t in gtables if t.num_rows]) \
                if any(t.num_rows for t in gtables) else VIOLATION_SCHEMA.empty_table()
            pq.write_table(gt, os.path.join(tmp, "violations.parquet"))
            shutil.rmtree(gdir, ignore_errors=True)
            os.rename(tmp, gdir)
            gsum = {"relationship_errors": int(
                (dup["cnt"].sum() if len(dup) else 0) +
                (missing["left_cnt"].sum() if len(missing) else 0)),
                "external_refs": int(external["left_cnt"].sum()
                                     if len(external) else 0),
                "neardup_clusters": int(len(near))}
            with open(gman + ".tmp", "w") as fh:
                json.dump(gsum, fh)
            os.rename(gman + ".tmp", gman)
        with open(gman) as fh:
            gsum = json.load(fh)
    else:
        gsum = {}

    # ---- combined outputs
    verd = pd.DataFrame([v for m in manifests for v in m["verdicts"]])
    if len(verd):
        verd["partition_id"] = [m["partition"] for m in manifests
                                for _ in m["verdicts"]]
        verd = verd.sort_values("partition_id").reset_index(drop=True)
    summary = {
        "partitions_total": len(files), "partitions_done": len(manifests),
        "complete": complete,
        "total": int(sum(m["summary"]["total"] for m in manifests)),
        "valid": int(sum(m["summary"]["valid"] for m in manifests)),
        "invalid": int(sum(m["summary"]["invalid"] for m in manifests)),
        "warnings": int(sum(m["summary"]["warnings"] for m in manifests)),
        **gsum,
        "ruleset_version": _ruleset_version(vocab),
    }
    if complete:
        verd.to_parquet(os.path.join(out_dir, "verdicts.parquet"))
        with open(os.path.join(out_dir, "summary.json"), "w") as fh:
            json.dump(summary, fh, indent=2, default=str)
    return summary
