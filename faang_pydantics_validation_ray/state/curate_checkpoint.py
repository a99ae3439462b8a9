"""Checkpoint / resume for the composed corpus-curation chain.

At 100 TB the curation job (language filter → quality filter → line clean
→ decontaminate → exact dedup, the registered ``curate_documents`` query)
runs for hours; this gives it the same atomic per-partition manifest
pattern as ``state/checkpoint.py`` (flagship) and
``state/dedup_checkpoint.py`` (minhash chain):

    benchgrams/benchgrams.parquet       global held-out-slice 4-gram hash
                                        set (sorted uint64 — the broadcast
                                        small side, computed ONCE)
    clean/part=<i>/clean.parquet        per-input-partition curated
                                        (doc_id, content_hash) rows — the
                                        expensive text pass, resumable
                                        per partition
    survivors/survivors.parquet         global min-doc_id-per-hash dedup
    _manifest/{benchgrams,part=<i>,survivors}.json
    summary.json

Stage 0 and 2 are global and skip when their manifest exists; stage 1 is
per-partition (skip = manifest exists), so a kill anywhere resumes from
the last completed unit. Every output is explicitly sorted and written
atomically (tmp + rename) — a resumed run is BYTE-identical to a fresh
one regardless of execution order. The per-batch kernel is the SAME
``functions.clean.curate_clean_batch`` the registered query runs, so the
DuckDB oracle that verifies ``curate_documents`` verifies this path too.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import __version__
from ..functions import clean, text
from .dedup_checkpoint import (_atomic_write_table,
                               _manifest_current, _write_manifest)


def _params_version(ngram: int) -> str:
    return f"{__version__}:curate(ngram={ngram},holdout=97)"


def run_curate_checkpointed(input_dir: str, out_dir: str,
                            col: str = "text", id_col: str = "doc_id",
                            ngram: int = 4, resume: bool = True,
                            max_partitions: int | None = None) -> dict:
    """Curation chain over ``input_dir/*.parquet`` with per-stage resume.
    ``max_partitions`` limits stage 1 to the first K incomplete partitions
    (the kill-simulation hook the tests use)."""
    import ray.data as rd
    from ..runtime import ensure_shipped
    ensure_shipped()

    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no *.parquet under {input_dir}")
    man_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    version = _params_version(ngram)

    # ---- stage 0: global benchmark gram set (held-out slice spans ALL
    # partitions, so it must exist before any partition is curated)
    bench_man = os.path.join(man_dir, "benchgrams.json")
    bench_path = os.path.join(out_dir, "benchgrams", "benchgrams.parquet")
    if not (resume and _manifest_current(bench_man, version)):
        t0 = time.time()
        ds = rd.read_parquet(files, columns=[id_col, col])

        def bench_side(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 97 == 0))

        grams = np.sort(np.asarray(text.benchmark_ngram_hashes(
            ds.map_batches(bench_side, batch_format="pyarrow"),
            col=col, n=ngram), dtype=np.uint64))
        _atomic_write_table(
            pa.table({"gram": pa.array(grams.view(np.int64))}),
            os.path.dirname(bench_path), "benchgrams.parquet")
        _write_manifest(bench_man, {
            "stage": "benchgrams", "params_version": version,
            "grams": int(len(grams)), "wall_s": round(time.time() - t0, 3)})
    import ray
    bench_sorted = (pq.read_table(bench_path).column("gram")
                    .to_numpy(zero_copy_only=False).view(np.uint64))
    # broadcast ONCE (same bref pattern as the registered query) — a
    # per-partition closure capture would re-serialize the gram array
    # into the object store once per input file
    bref = ray.put(bench_sorted)
    empty_clean = pa.table({id_col: pa.array([], type=pa.int64()),
                            "content_hash": pa.array([], type=pa.string())})

    # ---- stage 1: per-partition curated (doc_id, content_hash) rows
    done = 0
    for i, f in enumerate(files):
        man_path = os.path.join(man_dir, f"part={i}.json")
        if resume and _manifest_current(man_path, version):
            continue
        if max_partitions is not None and done >= max_partitions:
            continue
        t0 = time.time()
        ct = (rd.read_parquet(f, columns=[id_col, col])
              .map_batches(lambda t: clean.curate_clean_batch(
                  t, ray.get(bref), id_col=id_col, col=col, ngram=ngram),
                  batch_format="pyarrow"))
        # a fully-filtered partition yields zero batches — still a valid,
        # completed unit (empty parquet + manifest)
        tabs = list(ct.iter_batches(batch_size=None, batch_format="pyarrow"))
        tbl = pa.concat_tables(tabs) if tabs else empty_clean
        tbl = tbl.sort_by([(id_col, "ascending")])
        _atomic_write_table(tbl, os.path.join(out_dir, "clean", f"part={i}"),
                            "clean.parquet")
        _write_manifest(man_path, {
            "partition": i, "input_files": [f], "params_version": version,
            "rows": tbl.num_rows, "wall_s": round(time.time() - t0, 3)})
        done += 1

    n_done = sum(_manifest_current(
        os.path.join(man_dir, f"part={i}.json"), version)
        for i in range(len(files)))
    summary: dict = {
        "partitions_total": len(files), "partitions_done": n_done,
        "complete": False, "params_version": version,
    }
    if n_done != len(files):
        return summary

    # ---- stage 2: global exact dedup over the checkpointed clean rows
    # (stage 1 is never recomputed; only narrow (id, hash) rows shuffle)
    surv_man = os.path.join(man_dir, "survivors.json")
    if not (resume and _manifest_current(surv_man, version)):
        t0 = time.time()
        from ray.data.aggregate import Min
        clean_ds = rd.read_parquet(os.path.join(out_dir, "clean"))
        if clean_ds.count() == 0:
            survivors = pd.DataFrame({id_col: pd.Series([], dtype="int64")})
        else:
            survivors = (clean_ds.groupby("content_hash")
                         .aggregate(Min(id_col, alias_name=id_col))
                         .to_pandas())
            survivors = (survivors[[id_col]].astype({id_col: "int64"})
                         .sort_values(id_col).reset_index(drop=True))
        _atomic_write_table(
            pa.Table.from_pandas(survivors, preserve_index=False),
            os.path.join(out_dir, "survivors"), "survivors.parquet")
        _write_manifest(surv_man, {
            "stage": "survivors", "params_version": version,
            "survivors": int(len(survivors)),
            "wall_s": round(time.time() - t0, 3)})
    with open(surv_man) as fh:
        sm = json.load(fh)
    summary.update({"complete": True, "survivors": sm["survivors"]})
    _write_manifest(os.path.join(out_dir, "summary.json"), summary)
    return summary


def read_survivors(out_dir: str) -> pd.DataFrame:
    """The final curated doc_id list of a completed run (oracle-comparable
    to the registered ``curate_documents`` query)."""
    return (pq.read_table(os.path.join(out_dir, "survivors",
                                       "survivors.parquet"))
            .to_pandas())
