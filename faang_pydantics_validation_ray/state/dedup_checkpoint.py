"""Checkpoint / resume for the MinHash near-dup chain (VERDICT r2 #6).

At 100 TB the dedup jobs are as long-running as the flagship validation —
this extends ``state/checkpoint.py``'s atomic per-partition manifest
pattern to the candidates → verify → clusters chain:

    bands/part=<i>/bands.parquet        per-input-partition LSH band rows
                                        (the expensive shingle+signature
                                        work — resumable per partition)
    _manifest/part=<i>.json             lineage: input file, minhash params,
                                        row counts, wall time
    candidates/candidates.parquet       global colliding-bucket candidates
    pairs/pairs.parquet                 exact-Jaccard-verified pairs
    clusters/clusters.parquet           union-find survivors
    _manifest/{candidates,pairs,clusters}.json
    summary.json

Stage 1 is per-partition (skip = manifest exists); stages 2-4 are global
and each skips when its own manifest exists, so a kill anywhere resumes
from the last completed stage. All writes are atomic (tmp + rename); every
output is explicitly sorted so a resumed run is BYTE-identical to a fresh
one regardless of execution order.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import __version__
from ..functions import dedup


def _atomic_write_table(t: pa.Table, dirpath: str, fname: str) -> None:
    tmp = dirpath + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, os.path.join(tmp, fname))
    shutil.rmtree(dirpath, ignore_errors=True)
    os.rename(tmp, dirpath)


def _write_manifest(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, default=str)
    os.rename(tmp, path)


def _manifest_current(path: str, version: str) -> bool:
    """A completed unit counts for resume ONLY if its manifest was written
    under the SAME params_version — resuming with different parameters
    (e.g. kill an ngram=4 run, resume with ngram=5) must recompute, not
    silently mix stage outputs produced under different semantics
    (ADVICE r3). An unreadable manifest also recomputes."""
    if not os.path.exists(path):
        return False
    try:
        with open(path) as fh:
            return json.load(fh).get("params_version") == version
    except (json.JSONDecodeError, OSError):
        return False


def _params_version(num_perm: int, bands: int, k: int,
                    threshold: float) -> str:
    return (f"{__version__}:minhash(num_perm={num_perm},bands={bands},"
            f"k={k},threshold={threshold})")


def run_minhash_dedup_checkpointed(input_dir: str, out_dir: str,
                                   col: str = "text",
                                   id_col: str = "doc_id",
                                   num_perm: int = 64, bands: int = 16,
                                   k: int = 5, threshold: float = 0.8,
                                   resume: bool = True,
                                   max_partitions: int | None = None) -> dict:
    """MinHash near-dup chain over ``input_dir/*.parquet`` with per-stage
    resume. ``max_partitions`` limits stage 1 to the first K incomplete
    partitions (the kill-simulation hook the tests use)."""
    import ray.data as rd
    from ..runtime import ensure_shipped
    ensure_shipped()

    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no *.parquet under {input_dir}")
    man_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    version = _params_version(num_perm, bands, k, threshold)
    hasher = dedup.MinHasher(num_perm)

    # ---- stage 1: per-partition band rows (shingle → signature → bands)
    done = 0
    for i, f in enumerate(files):
        man_path = os.path.join(man_dir, f"part={i}.json")
        if resume and _manifest_current(man_path, version):
            continue
        if max_partitions is not None and done >= max_partitions:
            continue
        t0 = time.time()
        bt = (rd.read_parquet(f, columns=[id_col, col])
              .map_batches(lambda t: dedup.minhash_band_rows(
                  t, col, id_col, hasher, bands, k),
                  batch_format="pyarrow"))
        # collect + one explicit sort → byte-identical parquet regardless of
        # block arrival order (band rows are n_docs×bands narrow ints)
        tbl = pa.concat_tables(list(
            bt.iter_batches(batch_size=None, batch_format="pyarrow")))
        tbl = tbl.sort_by([("band_id", "ascending"),
                           ("band_hash", "ascending"),
                           (id_col, "ascending")])
        _atomic_write_table(tbl, os.path.join(out_dir, "bands", f"part={i}"),
                            "bands.parquet")
        _write_manifest(man_path, {
            "partition": i, "input_files": [f], "params_version": version,
            "rows": tbl.num_rows, "wall_s": round(time.time() - t0, 3)})
        done += 1

    manifests = []
    for i in range(len(files)):
        mp = os.path.join(man_dir, f"part={i}.json")
        if _manifest_current(mp, version):
            with open(mp) as fh:
                manifests.append(json.load(fh))
    bands_complete = len(manifests) == len(files)
    summary: dict = {
        "partitions_total": len(files), "partitions_done": len(manifests),
        "complete": False, "params_version": version,
    }
    if not bands_complete:
        return summary

    # ---- stage 2: global colliding-bucket candidates (one groupby over the
    # checkpointed band rows — stage 1 is never recomputed)
    cand_man = os.path.join(man_dir, "candidates.json")
    cand_path = os.path.join(out_dir, "candidates", "candidates.parquet")
    if not (resume and _manifest_current(cand_man, version)):
        t0 = time.time()
        bands_ds = rd.read_parquet(os.path.join(out_dir, "bands"))

        def add_combo(t: pa.Table) -> pa.Table:
            combo = (t.column("band_hash").to_numpy(zero_copy_only=False)
                     + t.column("band_id").to_numpy(zero_copy_only=False)
                     .astype(np.int64) * np.int64(0x9E3779B9))
            return t.append_column("combo", pa.array(combo, type=pa.int64()))

        rows = dedup._colliding_bucket_rows(
            bands_ds.map_batches(add_combo, batch_format="pyarrow"), "combo")
        if rows is None:
            cand = pd.DataFrame({"band_id": pd.Series([], dtype="int64"),
                                 "band_hash": pd.Series([], dtype="int64"),
                                 "ids": pd.Series([], dtype=object)})
        else:
            members = rows.to_pandas()
            cand = (members.groupby(["band_id", "band_hash"])[id_col]
                    .apply(lambda s: sorted(s.tolist())).rename("ids")
                    .reset_index())
            cand = cand[cand["ids"].str.len() >= 2]
            cand = (cand.sort_values(["band_id", "band_hash"])
                    .reset_index(drop=True))
        _atomic_write_table(pa.Table.from_pandas(cand, preserve_index=False),
                            os.path.dirname(cand_path), "candidates.parquet")
        _write_manifest(cand_man, {
            "stage": "candidates", "params_version": version,
            "buckets": int(len(cand)), "wall_s": round(time.time() - t0, 3)})
    with open(cand_man) as fh:
        summary["candidate_buckets"] = json.load(fh)["buckets"]

    # ---- stage 3: distributed exact-Jaccard verification
    pairs_man = os.path.join(man_dir, "pairs.json")
    pairs_path = os.path.join(out_dir, "pairs", "pairs.parquet")
    if not (resume and _manifest_current(pairs_man, version)):
        t0 = time.time()
        cand = pq.read_table(cand_path).to_pandas()
        docs = rd.read_parquet(files, columns=[id_col, col])
        pairs = dedup.verify_candidates_distributed(
            docs, cand, id_col=id_col, col=col, threshold=threshold, k=k)
        pairs = pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        _atomic_write_table(pa.Table.from_pandas(pairs, preserve_index=False),
                            os.path.dirname(pairs_path), "pairs.parquet")
        _write_manifest(pairs_man, {
            "stage": "pairs", "params_version": version,
            "pairs": int(len(pairs)), "wall_s": round(time.time() - t0, 3)})
    with open(pairs_man) as fh:
        summary["verified_pairs"] = json.load(fh)["pairs"]

    # ---- stage 4: cluster resolution (union-find; past the driver bound the
    # same pairs go through connected_components_distributed)
    clus_man = os.path.join(man_dir, "clusters.json")
    if not (resume and _manifest_current(clus_man, version)):
        t0 = time.time()
        pairs = pq.read_table(pairs_path).to_pandas()
        if pairs.empty:
            clusters = pd.DataFrame({"id": pd.Series([], dtype=object),
                                     "cluster_id": pd.Series([], dtype=object),
                                     "keep": pd.Series([], dtype=bool)})
        elif len(pairs) > 200_000:
            clusters = dedup.connected_components_distributed(
                rd.from_pandas(pairs))
        else:
            clusters = dedup.cluster_pairs(pairs)
        clusters = clusters.sort_values("id").reset_index(drop=True)
        _atomic_write_table(
            pa.Table.from_pandas(clusters, preserve_index=False),
            os.path.join(out_dir, "clusters"), "clusters.parquet")
        _write_manifest(clus_man, {
            "stage": "clusters", "params_version": version,
            "clustered_ids": int(len(clusters)),
            "survivors": int(clusters["keep"].sum()) if len(clusters) else 0,
            "wall_s": round(time.time() - t0, 3)})
    with open(clus_man) as fh:
        cm = json.load(fh)
    summary.update({"complete": True, "clustered_ids": cm["clustered_ids"],
                    "survivors": cm["survivors"]})
    _write_manifest(os.path.join(out_dir, "summary.json"), summary)
    return summary
