"""Clean-row export of validated images (SURVEY.md S5).

Graft of the reference's BioSamples-format projection of valid records
(/root/reference/organism_validator.py:36-95: each valid model →
``characteristics{...}`` + ``relationships[]`` nested doc): here every row
with NO error-severity violation is projected into a nested export doc —
``characteristics`` struct (dims/format/caption metadata) + the original
payload — and written as partitioned parquet.

The invalid-key set is exemplar-independent: the same scalar+decode rules are
re-evaluated per batch (cheap, one pass), so export does not depend on a
prior validation run's exemplar caps. Cross-record errors (duplicates,
orphan refs) are passed in as a broadcast key set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rules import image_rules
from ..stages.decode import DecodeChecker


class ExportCleanBatch:
    """Actor-pool stage: evaluate rules, keep rows with no error, project to
    the nested export schema. ``bad_keys_ref`` is a ``ray.put`` broadcast of
    cross-record-invalid image_ids (or None)."""

    def __init__(self, bad_keys_ref=None, decode: bool = True, seed: int = 42,
                 psnr_min: float = 40.0):
        self.ruleset = image_rules.build_image_ruleset()
        self.decoder = DecodeChecker(psnr_min=psnr_min, seed=seed) if decode else None
        if bad_keys_ref is not None:
            import ray
            self.bad_keys = set(ray.get(bad_keys_ref))
        else:
            self.bad_keys = set()

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm, _changed = image_rules.normalize_image_batch(batch)
        extra = self.decoder.findings(norm) if self.decoder else None
        res = self.ruleset.evaluate(norm, exemplar_cap=0, extra_findings=extra)
        keep = ~res.error_mask
        if self.bad_keys:
            ids = norm.column("image_id").to_pylist()
            keep &= np.array([i not in self.bad_keys for i in ids])
        clean = norm.filter(pa.array(keep))
        characteristics = pa.StructArray.from_arrays(
            [clean.column(c).combine_chunks() for c in
             ("w", "h", "fmt", "caption", "phash")],
            names=["width", "height", "format", "caption", "phash"])
        return pa.table({
            "image_id": clean.column("image_id"),
            "characteristics": characteristics,
            "payload": clean.column("bytes"),
            "partition_id": clean.column("partition_id")
            if "partition_id" in clean.column_names
            else pa.array(np.zeros(clean.num_rows, dtype=np.int32)),
        })


def export_clean_images(images_ds, bad_keys: list[str] | None = None,
                        out_dir: str | None = None, concurrency=None,
                        batch_size: int = 512):
    """→ Dataset of export docs for valid rows; writes partitioned parquet
    when ``out_dir`` is given (streamed, never materialized)."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, cpus - 2)
    ref = ray.put(bad_keys or [])
    ds = images_ds.map_batches(
        ExportCleanBatch, fn_constructor_kwargs=dict(bad_keys_ref=ref),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)
    if out_dir is not None:
        ds.write_parquet(out_dir, partition_cols=["partition_id"])
    return ds
