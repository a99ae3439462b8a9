"""The fused per-batch validation stage: normalize → scalar rules → decode
checks → sketch partials, emitting ONE small "event stream" batch per input
batch (SURVEY.md §3.4).

Single pass over the heavy ``bytes`` column; outputs are sparse/tiny:

- ``violation``  rows — exemplar violations, capped per (rule, severity) per
  batch; full counts live in ``rule_count`` rows (scale contract: a bad
  partition cannot emit ≫1 row per input row).
- ``rule_count`` rows — exact per-(rule, severity) violation counts.
- ``batch_stat`` rows — per-partition row totals + per-row error/warn-only
  counts (the verdict partials; graft of
  /root/reference/base_validator.py:115-125 summary semantics where a row
  with only warnings counts as valid).
- ``sketch``     rows — serialized ColumnProfile partials per (partition,
  column), merged downstream by a tiny groupby (mergeable sketches).

Runs as an ACTOR POOL (`map_batches(ValidateImagesBatch, concurrency=N)`):
the rule set, decoder and reference profile are built once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.groups import _batch_key_counts
from ..functions.hashing import hash_column
from ..functions.sketches import ColumnProfile
from ..rules import image_rules
from ..rules.spec import RuleSet
from .decode import DecodeChecker

EVENT_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("rule_id", pa.string()),
    ("image_id", pa.string()),
    ("severity", pa.string()),
    ("field", pa.string()),
    ("message", pa.string()),
    ("partition_id", pa.int32()),
    ("count", pa.int64()),
    ("rows", pa.int64()),
    ("n_error_rows", pa.int64()),
    ("n_warn_only_rows", pa.int64()),
    ("col", pa.string()),
    ("sketch", pa.binary()),
    ("key", pa.string()),
    # 64-bit key hash for kind="key_count" partial rows (col carries the
    # namespace: "i" image_id SipHash, "p" raw phash) — fixed-width keys
    # through the fused cross-record exchange instead of tagged strings
    ("kh", pa.int64()),
])

PROFILE_COLS = ("w", "h", "byte_size", "phash")


def _events(rows: list[dict]) -> pa.Table:
    cols = {f.name: [r.get(f.name) for r in rows] for f in EVENT_SCHEMA}
    return pa.table(cols, schema=EVENT_SCHEMA)


def _events_columnar(n: int, cols: dict) -> pa.Table:
    """Build an EVENT_SCHEMA table from column arrays directly (no per-row
    Python dicts — the dict path built ~1 object per cell and dominated the
    event-assembly cost of bad batches). Missing fields are nulls."""
    out = {}
    for f in EVENT_SCHEMA:
        a = cols.get(f.name)
        if a is None:
            out[f.name] = pa.nulls(n, type=f.type)
        elif isinstance(a, pa.ChunkedArray):
            out[f.name] = a.combine_chunks().cast(f.type)
        elif isinstance(a, pa.Array):
            out[f.name] = a.cast(f.type)
        else:
            out[f.name] = pa.array(a, type=f.type)
    return pa.table(out, schema=EVENT_SCHEMA)


class ValidateImagesBatch:
    def __init__(self, exemplar_cap: int = 50, psnr_min: float = 40.0,
                 decode: bool = True, seed: int = 42,
                 ruleset: RuleSet | None = None, vocab=None,
                 key_count_cols: tuple = ("image_id", "phash")):
        self.exemplar_cap = exemplar_cap
        self.ruleset = ruleset or image_rules.build_image_ruleset(vocab=vocab)
        self.decoder = DecodeChecker(psnr_min=psnr_min, seed=seed) if decode else None
        # which cross-record (key, cnt) partial namespaces to emit from this
        # pass; () when every counting rule is disabled, so the event stream
        # doesn't carry ~2 partial rows per input row for no consumer
        self.key_count_cols = tuple(key_count_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _events([])
        if "partition_id" not in batch.column_names:
            batch = batch.append_column(
                "partition_id", pa.array(np.zeros(batch.num_rows, dtype=np.int32)))
        batch = batch.append_column(
            "byte_size", pc.cast(pc.binary_length(batch.column("bytes")), pa.int64()))

        norm, changed = image_rules.normalize_image_batch(batch)
        extra = {"normalize.fmt:fmt": [(changed["fmt"], "warning",
                                        "fmt value was normalized (trim/lowercase)")]}
        if self.decoder is not None:
            extra.update(self.decoder.findings(norm))
        res = self.ruleset.evaluate(norm, exemplar_cap=self.exemplar_cap,
                                    extra_findings=extra)

        parts = norm.column("partition_id").to_numpy(zero_copy_only=False)
        tables: list[pa.Table] = []

        # violation exemplars (carry the partition of their row) — columnar
        v = res.violations
        if v.num_rows:
            vparts = (parts[res.violation_idx].astype(np.int32)
                      if len(res.violation_idx)
                      else np.full(v.num_rows, -1, dtype=np.int32))
            tables.append(_events_columnar(v.num_rows, {
                "kind": np.full(v.num_rows, "violation", dtype=object),
                "rule_id": v.column("rule_id"),
                "image_id": v.column("image_id"),
                "severity": v.column("severity"),
                "field": v.column("field"),
                "message": v.column("message"),
                "partition_id": vparts,
                "count": np.ones(v.num_rows, dtype=np.int64)}))
        # exact per-rule counts (one row per rule — tiny)
        if res.rule_counts:
            rids, sevs, cnts = zip(*res.rule_counts)
            tables.append(_events_columnar(len(rids), {
                "kind": np.full(len(rids), "rule_count", dtype=object),
                "rule_id": list(rids), "severity": list(sevs),
                "count": np.asarray(cnts, dtype=np.int64),
                "partition_id": np.full(len(rids), -1, dtype=np.int32)}))
        # per-partition verdict partials + sketch partials (usually one
        # partition per batch — the loop is over partitions, not rows)
        stat_rows: list[dict] = []
        for pid in np.unique(parts):
            pmask = parts == pid
            err = res.error_mask[pmask]
            warn = res.warning_mask[pmask]
            stat_rows.append({"kind": "batch_stat", "partition_id": int(pid),
                              "rows": int(pmask.sum()),
                              "n_error_rows": int(err.sum()),
                              "n_warn_only_rows": int((warn & ~err).sum())})
            sub = norm.filter(pa.array(pmask)) if not pmask.all() else norm
            for colname in PROFILE_COLS:
                if colname in sub.column_names:
                    prof = ColumnProfile().add_arrow(sub.column(colname))
                    stat_rows.append({"kind": "sketch", "partition_id": int(pid),
                                      "col": colname, "sketch": prof.to_bytes()})
        tables.append(_events(stat_rows))
        if self.key_count_cols:
            kc = _key_count_events(batch, self.key_count_cols)
            if kc.num_rows:
                tables.append(kc)
        return pa.concat_tables(tables)


def _key_count_events(batch: pa.Table,
                      cols: tuple = ("image_id", "phash")) -> pa.Table:
    """Per-batch combined (kh, count) partials for the cross-record counting
    rules, emitted from the SAME pass that already holds every row — the
    separate narrow full-table scan the shuffle rules used to pay is gone.
    Keys are HASHED (``col``="i": 64-bit SipHash of image_id; ``col``="p":
    raw phash in ``kh``) over the RAW batch values (pre-normalize —
    identical to what a narrow parquet re-read would see), so the fused
    exchange moves fixed-width int64 rows; real keys for the tiny candidate
    sets are recovered exactly by groups.recover_exact_counts. Vectorized:
    one Arrow group_by + one vectorized hash per namespace. ``cols``
    restricts which namespaces are emitted (callers with the near-dup rule
    off skip the "p" partials entirely)."""
    ns_arr, kh_arr, counts = [], [], []
    for colname, ns in (("image_id", "i"), ("phash", "p")):
        if colname not in batch.column_names or colname not in cols:
            continue
        c = _batch_key_counts(batch, colname)
        if c.num_rows == 0:
            continue
        keys = c.column(colname)
        if pa.types.is_integer(keys.type):
            kh = np.asarray(keys.cast(pa.int64())).astype(np.int64)
        else:
            kh = hash_column(keys).view(np.int64)
        ns_arr.append(np.full(c.num_rows, ns, dtype=object))
        kh_arr.append(kh)
        counts.append(np.asarray(c.column("cnt").cast(pa.int64())))
    if not kh_arr:
        return _events([])
    n = sum(len(a) for a in kh_arr)
    out = {}
    for f in EVENT_SCHEMA:
        if f.name == "kind":
            out[f.name] = pa.array(["key_count"] * n, type=pa.string())
        elif f.name == "col":
            out[f.name] = pa.array(np.concatenate(ns_arr), type=pa.string())
        elif f.name == "kh":
            out[f.name] = pa.array(np.concatenate(kh_arr))
        elif f.name == "count":
            out[f.name] = pa.array(np.concatenate(counts))
        elif f.name == "partition_id":
            out[f.name] = pa.array(np.full(n, -1, dtype=np.int32))
        else:
            out[f.name] = pa.nulls(n, type=f.type)
    return pa.table(out, schema=EVENT_SCHEMA)
