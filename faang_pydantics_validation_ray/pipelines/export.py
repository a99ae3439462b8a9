"""Clean-row export of validated images (SURVEY.md S5).

Graft of the reference's BioSamples-format projection of valid records
(/root/reference/organism_validator.py:36-95: each valid model →
``characteristics{...}`` + ``relationships[]`` nested doc): here every row
with NO error-severity violation is projected into a nested export doc —
``characteristics`` struct (dims/format/caption metadata) + the original
payload + optional ``relationships[]`` links to its caption records — and
written as partitioned parquet.

The invalid-key set is exemplar-independent: the same scalar+decode rules are
re-evaluated per batch (cheap, one pass), so export does not depend on a
prior validation run's exemplar caps. Cross-record errors (duplicates,
orphan refs) are passed in as a broadcast key set.

Join note: Arrow's hash join rejects nested (struct/list) non-key columns,
so the pipeline keeps docs FLAT through the relationships join (the caption
side is collapsed to a JSON string per image) and builds both nested columns
in one final vectorized pass.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..rules import image_rules
from ..stages.decode import DecodeChecker

_FLAT_CHARS = ("w", "h", "fmt", "caption", "phash")
_CHAR_NAMES = ("width", "height", "format", "caption", "phash")


class ExportCleanBatch:
    """Actor-pool stage: evaluate rules, keep rows with no error, project to
    the FLAT export columns (nesting happens in the final pass — nested
    columns cannot ride through the relationships hash join).
    ``bad_keys_ref`` is a ``ray.put`` broadcast of cross-record-invalid
    image_ids (or None)."""

    def __init__(self, bad_keys_ref=None, decode: bool = True, seed: int = 42,
                 psnr_min: float = 40.0, vocab=None):
        self.ruleset = image_rules.build_image_ruleset(vocab=vocab)
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
        cols = {"image_id": clean.column("image_id")}
        for src in _FLAT_CHARS:
            cols[src] = clean.column(src)
        cols["payload"] = clean.column("bytes")
        cols["partition_id"] = (clean.column("partition_id")
                                if "partition_id" in clean.column_names
                                else pa.array(np.zeros(clean.num_rows,
                                                       dtype=np.int32)))
        return pa.table(cols)


def _nest_docs(t: pa.Table) -> pa.Table:
    """Final vectorized projection: flat columns → characteristics{} (+
    relationships[] from the joined JSON caption-id lists, when present)."""
    characteristics = pa.StructArray.from_arrays(
        [t.column(src).combine_chunks() for src in _FLAT_CHARS],
        names=list(_CHAR_NAMES))
    out = {"image_id": t.column("image_id"),
           "characteristics": characteristics,
           "payload": t.column("payload"),
           "partition_id": t.column("partition_id")}
    if "caption_ids_json" in t.column_names:
        lists = [json.loads(v) if v is not None else []
                 for v in t.column("caption_ids_json").to_pylist()]
        flat = [c for lst in lists for c in lst]
        offsets = np.zeros(len(lists) + 1, dtype=np.int32)
        np.cumsum([len(x) for x in lists], out=offsets[1:])
        out["relationships"] = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(["described_by"] * len(flat), type=pa.string()),
                 pa.array(flat, type=pa.string())],
                names=["type", "target"]))
    return pa.table(out)


def _attach_relationships(docs_ds, captions_ds, num_partitions: int):
    """relationships[] graft: caption ids are list-collected per image_id
    with a distributed aggregate (JSON-encoded so the payload is a plain
    string through the hash join), LEFT-joined onto the flat docs — no
    broadcast of a table-sized side; docs co-partition by image_id, the
    pipeline's single partitioning key."""
    from ..functions.groups import collect_list_agg

    links = (captions_ds.select_columns(["image_id", "caption_id"])
             .groupby("image_id")
             .aggregate(collect_list_agg("caption_id", "caption_ids"))
             .map_batches(lambda df: df.assign(
                 caption_ids_json=df["caption_ids"].map(
                     lambda v: json.dumps(sorted(v))))
                 .drop(columns=["caption_ids"]), batch_format="pandas"))
    return docs_ds.join(links, join_type="left_outer",
                        num_partitions=num_partitions, on=("image_id",))


class ProjectCleanBatch:
    """Actor-pool stage for CONFIG-DRIVEN per-type export projections — the
    generic mechanism behind the reference's ~10 type-specific validators
    (each valid record → a nested characteristics{} doc;
    /root/reference/organism_validator.py:36-95,
    specimen_validator.py:22-150, teleostei_post_hatching_validator.py:22-216).
    ``ruleset`` decides validity (rows with NO error-severity finding
    survive; warnings don't block export, reference semantics), a
    ``characteristics`` name→column mapping decides the doc layout.
    Takes a built RuleSet: packaged-name resolution happens DRIVER-side in
    export_clean_rows (an in-actor import would need the package on the
    worker's sys.path; the resolved RuleSet ships by value)."""

    def __init__(self, ruleset, key_column: str, characteristics: dict):
        self.ruleset = ruleset
        self.key = key_column
        self.chars = dict(characteristics)

    def __call__(self, t: pa.Table) -> pa.Table:
        res = self.ruleset.evaluate(t, exemplar_cap=0)
        clean = t.filter(pa.array(~res.error_mask))
        struct = pa.StructArray.from_arrays(
            [clean.column(c).combine_chunks() for c in self.chars.values()],
            names=list(self.chars))
        return pa.table({self.key: clean.column(self.key),
                         "characteristics": struct})


def export_clean_rows(ds, ruleset, key_column: str, characteristics: dict,
                      out_dir: str | None = None, concurrency=None,
                      batch_size: int = 4096):
    """Generic S5 export for any record type: stream → per-batch vectorized
    rule evaluation → error-free rows projected to nested docs → optional
    partitioned parquet. The image flagship keeps its specialized stage
    (decode findings + relationships join); every other type goes through
    this one mechanism + a projection config. ``ruleset`` may be a RuleSet
    or the name of a packaged ruleset JSON (resolved here, driver-side)."""
    import ray

    if isinstance(ruleset, str):
        from ..rules.serde import load_packaged_ruleset
        ruleset = load_packaged_ruleset(ruleset)
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, cpus - 2)
    out = ds.map_batches(
        ProjectCleanBatch,
        fn_constructor_kwargs=dict(ruleset=ruleset, key_column=key_column,
                                   characteristics=characteristics),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)
    if out_dir is not None:
        out.write_parquet(out_dir)
    return out


def export_clean_images(images_ds, bad_keys: list[str] | None = None,
                        out_dir: str | None = None, concurrency=None,
                        batch_size: int = 512, captions_ds=None, vocab=None,
                        decode: bool = True):
    """→ Dataset of export docs for valid rows; writes partitioned parquet
    when ``out_dir`` is given (streamed, never materialized).

    With ``captions_ds``, each doc additionally carries ``relationships[]``
    (described_by links to its caption records) — the full BioSamples-format
    graft: characteristics{} + payload + relationships[].
    ``decode=False`` restricts validity to the scalar ruleset (the
    SQL-expressible subset — used by the img_export_clean_scalar oracle)."""
    import ray

    from ..runtime import shuffle_partitions

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, cpus - 2)
    if captions_ds is not None and isinstance(concurrency, int):
        # the relationships hash join runs aggregator actors CONCURRENTLY
        # with this pool — a fixed pool that leaves them no CPUs deadlocks
        # the stream (measured at 4 cpus); an autoscaling pool can yield
        concurrency = (1, concurrency)
    ref = ray.put(bad_keys or [])
    ds = images_ds.map_batches(
        ExportCleanBatch, fn_constructor_kwargs=dict(bad_keys_ref=ref,
                                                     vocab=vocab,
                                                     decode=decode),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)
    if captions_ds is not None:
        ds = _attach_relationships(ds, captions_ds, shuffle_partitions())
    ds = ds.map_batches(_nest_docs, batch_format="pyarrow")
    if out_dir is not None:
        ds.write_parquet(out_dir, partition_cols=["partition_id"])
    return ds
