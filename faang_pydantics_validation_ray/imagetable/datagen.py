"""Deterministic synthetic image+caption table generator (FIXTURES.md §A).

Row ``i`` is fully determined by ``(seed, i)``; violations are injected at
fixed ``i % 1000`` buckets so the expected violation set is exactly
computable (:func:`expected_violations`) — mirroring the reference's
seeded-corpus test style (/root/reference/json_files/sample1.json carries
seeded enum + self-parent violations; see SURVEY.md §5.1).

Schema (BASELINE.json input_hint):
    image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
    caption: string, phash: int64, partition_id: int32

Companion table: captions(caption_id, image_id, caption) for the
referential semi-join rule (SURVEY.md J1).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import splitmix64
from . import codec

MAX_PIXELS = 1 << 24  # range rule: claimed w*h must be ≤ this

# violation buckets (b = i % 1000) — FIXTURES.md §A.2
B_ID_NULL = 1          # required.image_id           error
B_BYTES_NULL = 2       # required.bytes              error
B_FMT_BAD = 3          # enum.fmt                    error
B_FMT_CASE = 4         # normalize.fmt               warning (valid after normalize)
B_ID_PATTERN = 5       # pattern.image_id            error
B_W_ZERO = 6           # range.dims                  error
B_H_NEG = 7            # range.dims                  error
B_TOO_BIG = 8          # range.dims (w*h>MAX_PIXELS) error
B_MAGIC = 9            # xfield.fmt_magic            error
B_DIMS = 10            # xfield.dims_match           error
B_DUP_PREV = 11        # unique.image_id             error (dup of row i-1)
B_DUP_HOT = 13         # unique.image_id             error (hot shared id)
B_NEARDUP_A = 14       # neardup.phash               warning (shared cluster)
B_NEARDUP_PAIR = 15    # neardup.phash               warning (pairs)
B_CAP_NULL = 16        # recommended.caption         warning
B_PHASH_NULL = 17      # recommended.phash warning (+ conditional.phash_for_lossy if jpeg)
B_PSNR = 18            # pixel.psnr                  error (jpeg step 24 → ~31dB)
B_SENT_WARN = 19       # sentinel.fmt                warning ("restricted access")
B_SENT_ERR = 20        # sentinel.fmt                error ("not collected")
B_CORRUPT = 21         # pixel.decode                error (truncated payload)
B_LABEL_MISMATCH = 22  # consistency.caption_label   warning (label ≠ caption noun)
B_LABEL_BAD = 23       # vocab.label                 error (label not in vocab dim)
B_DATE_PATTERN = 24    # datepattern.collected_date  error (format ≠ unit's pattern)
B_DATE_INVALID = 25    # datevalid.collected_date    error (well-formed, not a real date)

BUCKETS = {
    B_ID_NULL, B_BYTES_NULL, B_FMT_BAD, B_FMT_CASE, B_ID_PATTERN, B_W_ZERO,
    B_H_NEG, B_TOO_BIG, B_MAGIC, B_DIMS, B_DUP_PREV, B_DUP_HOT, B_NEARDUP_A,
    B_NEARDUP_PAIR, B_CAP_NULL, B_PHASH_NULL, B_PSNR, B_SENT_WARN, B_SENT_ERR,
    B_CORRUPT, B_LABEL_MISMATCH, B_LABEL_BAD, B_DATE_PATTERN, B_DATE_INVALID,
}

HOT_DUP_ID = "IMG_999999999999"
NEARDUP_CLUSTER_PHASH = 0x00DEAD0001
NEARDUP_PAIR_BASE = 0x00BEEF0000
HOT_PHASH = 0x0000FACE
ORPHAN_EVERY = 500      # captions: j % 500 == 77 → orphan caption row
ORPHAN_OFFSET = 77

_ADJ = ["red", "small", "old", "bright", "wet", "tall", "round", "quiet"]
_NOUN = ["cat", "house", "tree", "river", "car", "bird", "mountain", "boat"]

# vocab dim (T1/T2 graft): the closed label ontology with canonical categories
VOCAB = {"cat": "animal", "bird": "animal", "house": "structure",
         "boat": "structure", "car": "structure", "tree": "nature",
         "river": "nature", "mountain": "nature"}
BAD_LABEL = "wug"                 # out-of-vocab label for B_LABEL_BAD

# collected_date units and their expected patterns (reference's per-unit
# date-pattern dispatch, /root/reference/validation_utils.py:150-202)
DATE_UNITS = ("YYYY-MM-DD", "YYYY-MM", "YYYY")
INVALID_DAY_DATE_SUFFIX = "-02-30"   # well-formed, never a real date


def _sm(x: int) -> int:
    return int(splitmix64(np.array([x], dtype=np.uint64))[0])


@dataclass
class RowPlan:
    """Everything needed to materialize row i AND its expected violations."""
    i: int
    image_id: str | None
    wa: int               # actual encoded width
    ha: int               # actual encoded height
    w: int | None         # claimed width
    h: int | None         # claimed height
    fmt: str | None       # claimed fmt (raw, pre-normalize)
    enc_fmt: str          # actual encoding container
    jpeg_step: int
    caption: str | None
    phash_override: int | None   # None → real phash of pixels
    phash_null: bool
    bytes_null: bool
    corrupt: bool
    partition_id: int
    bucket: int
    label: str | None = None
    collected_date: str | None = None
    date_unit: str | None = None

    def norm_fmt(self) -> str | None:
        return self.fmt.strip().lower() if self.fmt is not None else None


def row_plan(i: int, n: int, seed: int, n_files: int, violations: bool = True,
             drift: bool = True) -> RowPlan:
    b = i % 1000 if violations else -1
    part = i * n_files // n if n else 0
    s1, s2, s3, s4, s5, s6, s7, s8 = (
        _sm(seed * 1_000_003 + i * 8 + k) for k in range(8))
    in_drift = drift and n_files > 1 and part == n_files - 1
    lo, span = (24, 57) if in_drift else (8, 41)       # drift: shifted dims distribution
    wa, ha = lo + s1 % span, lo + s2 % span
    fmt = codec.FORMATS[s3 % 3]
    noun = _NOUN[s5 % 8]
    caption = f"a photo of a {_ADJ[s4 % 8]} {noun} #{i}"
    # collected_date: always a REAL date formatted per its unit (day ≤ 28)
    y, mo, dy = 2015 + s6 % 10, 1 + s7 % 12, 1 + s8 % 28
    unit = DATE_UNITS[s6 % 3]
    date = {"YYYY-MM-DD": f"{y:04d}-{mo:02d}-{dy:02d}",
            "YYYY-MM": f"{y:04d}-{mo:02d}", "YYYY": f"{y:04d}"}[unit]
    p = RowPlan(i=i, image_id=f"IMG_{i:012d}", wa=wa, ha=ha, w=wa, h=ha, fmt=fmt,
                enc_fmt=fmt, jpeg_step=codec.DEFAULT_JPEG_STEP, caption=caption,
                phash_override=None, phash_null=False, bytes_null=False,
                corrupt=False, partition_id=part, bucket=b, label=noun,
                collected_date=date, date_unit=unit)
    if not violations:
        return p
    if b == B_ID_NULL:
        p.image_id = None
    elif b == B_BYTES_NULL:
        p.bytes_null = True
    elif b == B_FMT_BAD:
        p.fmt, p.enc_fmt = "bmp", "png"
    elif b == B_FMT_CASE:
        p.fmt, p.enc_fmt = " JPEG ", "jpeg"
    elif b == B_ID_PATTERN:
        p.image_id = f"img-badid-{i:09d}"
    elif b == B_W_ZERO:
        p.w = 0
    elif b == B_H_NEG:
        p.h = -3
    elif b == B_TOO_BIG:
        p.w = p.h = 6000
        p.wa = p.ha = 16
    elif b == B_MAGIC:
        p.fmt, p.enc_fmt = "jpeg", "png"
    elif b == B_DIMS:
        p.w, p.h = p.wa + 3, p.ha + 3
    elif b == B_DUP_PREV and i > 0:
        p.image_id = f"IMG_{i - 1:012d}"
    elif b == B_DUP_HOT:
        p.image_id = HOT_DUP_ID
    elif b == B_NEARDUP_A:
        p.phash_override = NEARDUP_CLUSTER_PHASH
    elif b == B_NEARDUP_PAIR:
        p.phash_override = NEARDUP_PAIR_BASE + i // 2000
    elif b == B_CAP_NULL:
        p.caption = None
    elif b == B_PHASH_NULL:
        p.phash_null = True
    elif b == B_PSNR:
        p.fmt = p.enc_fmt = "jpeg"
        p.jpeg_step = codec.BAD_JPEG_STEP
    elif b == B_SENT_WARN:
        p.fmt, p.enc_fmt = "restricted access", "png"
    elif b == B_SENT_ERR:
        p.fmt, p.enc_fmt = "not collected", "png"
    elif b == B_CORRUPT:
        p.corrupt = True
    elif b == B_LABEL_MISMATCH:
        p.label = _NOUN[(s5 + 1) % 8]     # in vocab, but not the caption noun
    elif b == B_LABEL_BAD:
        p.label = BAD_LABEL               # not in the vocab dim
    elif b == B_DATE_PATTERN:
        p.date_unit = "YYYY"              # full date under a year-only unit
        p.collected_date = f"{2015 + s6 % 10:04d}-{1 + s7 % 12:02d}-{1 + s8 % 28:02d}"
    elif b == B_DATE_INVALID:
        p.date_unit = "YYYY-MM-DD"        # pattern-valid but not a real date
        p.collected_date = f"{2015 + s6 % 10:04d}{INVALID_DAY_DATE_SUFFIX}"
    if i % 20 == 19 and b not in BUCKETS:
        p.phash_override = HOT_PHASH    # 4.8% hot near-dup bucket (skew test)
    return p


def _materialize(p: RowPlan, seed: int) -> dict:
    pid = p.image_id if p.image_id is not None else f"IMG_{p.i:012d}"
    buf = None
    ph = None
    if not p.bytes_null:
        px = codec.gen_pixels(pid, p.wa, p.ha, seed=seed)
        buf = codec.encode(px, p.enc_fmt, jpeg_step=p.jpeg_step)
        if p.corrupt:
            buf = buf[:20]
        if not p.phash_null:
            ph = p.phash_override if p.phash_override is not None else codec.phash64(px)
    elif not p.phash_null:
        ph = p.phash_override if p.phash_override is not None else _sm(p.i * 31 + 7) % (1 << 62)
    return {
        "image_id": p.image_id, "bytes": buf, "w": p.w, "h": p.h, "fmt": p.fmt,
        "caption": p.caption, "phash": ph, "partition_id": p.partition_id,
        "label": p.label, "collected_date": p.collected_date,
        "date_unit": p.date_unit,
    }


IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()), ("bytes", pa.binary()), ("w", pa.int32()),
    ("h", pa.int32()), ("fmt", pa.string()), ("caption", pa.string()),
    ("phash", pa.int64()), ("partition_id", pa.int32()),
    ("label", pa.string()), ("collected_date", pa.string()),
    ("date_unit", pa.string()),
])

VOCAB_SCHEMA = pa.schema([("label", pa.string()), ("category", pa.string())])
CATALOG_SCHEMA = pa.schema([("image_id", pa.string())])


def vocab_table() -> pa.Table:
    """The label-ontology dim (T1/T2): broadcast-joined by the caption↔label
    consistency and vocab-membership rules."""
    labels = sorted(VOCAB)
    return pa.table({"label": labels,
                     "category": [VOCAB[x] for x in labels]},
                    schema=VOCAB_SCHEMA)


def catalog_table(n: int) -> pa.Table:
    """External catalog dim (T3 graft of the reference's BioSamples
    fall-through, /root/reference/generic_validator_classes.py:604-636):
    every EVEN orphan caption target is registered externally, so the
    referential rule downgrades it to a warning instead of an error."""
    ids = [f"IMG_MISSING_{j:06d}" for j in range(n)
           if j % ORPHAN_EVERY == ORPHAN_OFFSET and (j // ORPHAN_EVERY) % 2 == 0]
    return pa.table({"image_id": ids}, schema=CATALOG_SCHEMA)

CAPTIONS_SCHEMA = pa.schema([
    ("caption_id", pa.string()), ("image_id", pa.string()), ("caption", pa.string()),
])


def generate_chunk(lo: int, hi: int, n: int, seed: int, n_files: int,
                   violations: bool = True, drift: bool = True) -> pa.Table:
    rows = [_materialize(row_plan(i, n, seed, n_files, violations, drift), seed)
            for i in range(lo, hi)]
    cols = {k: [r[k] for r in rows] for k in IMAGE_SCHEMA.names}
    return pa.table(cols, schema=IMAGE_SCHEMA)


def _captions_chunk(lo: int, hi: int, n: int, seed: int, n_files: int,
                    violations: bool, drift: bool) -> pa.Table:
    """Caption rows for plan indices [lo, hi) — deterministic per chunk, so
    ordered concatenation of chunks equals the single-pass table."""
    cid, iid, cap = [], [], []
    for i in range(lo, hi):
        p = row_plan(i, n, seed, n_files, violations, drift)
        if p.image_id is not None and p.caption is not None:
            cid.append(f"CAP_{i:012d}")
            iid.append(p.image_id)
            cap.append(p.caption)
    return pa.table({"caption_id": cid, "image_id": iid, "caption": cap},
                    schema=CAPTIONS_SCHEMA)


def captions_table(n: int, seed: int, n_files: int, violations: bool = True,
                   drift: bool = True, use_ray: bool = False) -> pa.Table:
    """One caption row per image with non-null id+caption, plus seeded
    orphans. ``use_ray`` fans the row_plan scan out as one task per chunk
    (the driver-side single-thread loop took 15+ min at 6.4M rows);
    ordered chunk concat keeps the output byte-identical to the serial
    path."""
    if use_ray and n >= 200_000:
        import ray

        chunk = max(100_000, n // 64)
        bounds = [(lo, min(lo + chunk, n)) for lo in range(0, n, chunk)]
        task = ray.remote(num_cpus=1)(_captions_chunk)
        parts = ray.get([task.remote(lo, hi, n, seed, n_files, violations,
                                     drift) for lo, hi in bounds])
        base = pa.concat_tables(parts)
    else:
        base = _captions_chunk(0, n, n, seed, n_files, violations, drift)
    if violations:
        js = [j for j in range(n) if j % ORPHAN_EVERY == ORPHAN_OFFSET]
        orph = pa.table({
            "caption_id": [f"CAP_ORPH_{j:09d}" for j in js],
            "image_id": [f"IMG_MISSING_{j:06d}" for j in js],
            "caption": ["an orphan caption"] * len(js)},
            schema=CAPTIONS_SCHEMA)
        base = pa.concat_tables([base, orph])
    return base.combine_chunks()


def write_image_table(out_dir: str, n: int, seed: int = 42, n_files: int = 4,
                      violations: bool = True, drift: bool = True,
                      use_ray: bool = False) -> str:
    """Write images/part-*.parquet + captions.parquet under out_dir. Idempotent
    via a _SUCCESS marker (the small-scale analogue of the resume manifest)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    bounds = [(f * n // n_files, (f + 1) * n // n_files) for f in range(n_files)]

    def _write_one(f: int, lo: int, hi: int) -> None:
        t = generate_chunk(lo, hi, n, seed, n_files, violations, drift)
        pq.write_table(t, os.path.join(img_dir, f"part-{f:05d}.parquet"))

    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _task(f: int, lo: int, hi: int) -> None:
            _write_one(f, lo, hi)

        ray.get([_task.remote(f, lo, hi) for f, (lo, hi) in enumerate(bounds)])
    else:
        for f, (lo, hi) in enumerate(bounds):
            _write_one(f, lo, hi)
    pq.write_table(captions_table(n, seed, n_files, violations, drift,
                                  use_ray=use_ray),
                   os.path.join(out_dir, "captions.parquet"))
    pq.write_table(vocab_table(), os.path.join(out_dir, "vocab.parquet"))
    pq.write_table(catalog_table(n if violations else 0),
                   os.path.join(out_dir, "catalog.parquet"))
    with open(marker, "w") as fh:
        fh.write(f"n={n} seed={seed} n_files={n_files} violations={violations}\n")
    return out_dir


def _row_findings(i: int, n: int, seed: int, n_files: int,
                  drift: bool) -> tuple["RowPlan", list]:
    """Pass1 (per-row) expected findings for row ``i`` — the single source
    for expected_violations / expected_rule_counts / expected_summary.
    Cross-record (unique/neardup/ref) expectations are key-scoped and live
    in the callers."""
    from ..stages.decode import PHASH_HAMMING_TOL

    p = row_plan(i, n, seed, n_files, True, drift)
    b = p.bucket
    iid = p.image_id
    out: list[tuple[str, str | None, str]] = []
    # phash-consistency expectation, computed exactly like the engine:
    # decode the materialized bytes, recompute the perceptual hash,
    # compare to the claimed column value (skip psnr-failing rows)
    if (not p.bytes_null and not p.phash_null and not p.corrupt
            and b != B_PSNR):
        row = _materialize(p, seed)
        try:
            _, _, _, px = codec.decode(row["bytes"])
            dist = bin((codec.phash64(px) ^ row["phash"])
                       & 0xFFFFFFFFFFFFFFFF).count("1")
            if dist > PHASH_HAMMING_TOL:
                out.append(("xfield.phash_consistency", iid, "warning"))
        except codec.DecodeError:
            pass
    if b == B_ID_NULL:
        out.append(("required.image_id", None, "error"))
    if b == B_BYTES_NULL:
        out.append(("required.bytes", iid, "error"))
    if b == B_FMT_BAD:
        out.append(("enum.fmt", iid, "error"))
    if b == B_FMT_CASE:
        out.append(("normalize.fmt", iid, "warning"))
    if b == B_ID_PATTERN:
        out.append(("pattern.image_id", iid, "error"))
    if b in (B_W_ZERO, B_H_NEG, B_TOO_BIG):
        out.append(("range.dims", iid, "error"))
    if b == B_MAGIC:
        out.append(("xfield.fmt_magic", iid, "error"))
    if b == B_DIMS:
        out.append(("xfield.dims_match", iid, "error"))
    if b == B_CAP_NULL:
        out.append(("recommended.caption", iid, "warning"))
    if b == B_PHASH_NULL:
        out.append(("recommended.phash", iid, "warning"))
        if p.norm_fmt() in codec.LOSSY_FORMATS:
            out.append(("conditional.phash_for_lossy", iid, "error"))
    if b == B_PSNR:
        out.append(("pixel.psnr", iid, "error"))
    if b == B_SENT_WARN:
        out.append(("sentinel.fmt", iid, "warning"))
    if b == B_SENT_ERR:
        out.append(("sentinel.fmt", iid, "error"))
    if b == B_CORRUPT:
        out.append(("pixel.decode", iid, "error"))
    if b == B_LABEL_MISMATCH:
        out.append(("consistency.caption_label", iid, "warning"))
    if b == B_LABEL_BAD:
        out.append(("vocab.label", iid, "error"))
    if b == B_DATE_PATTERN:
        out.append(("datepattern.collected_date", iid, "error"))
    if b == B_DATE_INVALID:
        out.append(("datevalid.collected_date", iid, "error"))
    return p, out


def expected_summary(n: int, seed: int = 42, n_files: int = 4,
                     drift: bool = True, max_error_rate: float = 0.05):
    """Expected flagship run summary (pipelines/validate.py semantics):
    ``invalid`` = rows with ≥1 pass1 ERROR; ``warnings`` = rows whose only
    findings are warnings; ``relationship_errors`` = duplicate rows + missing
    caption refs (external-catalog hits excluded); a partition passes when
    its error rate ≤ ``max_error_rate`` AND it is not the seeded drift
    partition (the last file — its PSI shift is designed to exceed the 0.2
    verdict threshold at any n; the golden drift test pins this)."""
    import pandas as pd

    part_rows: dict[int, int] = {}
    part_errs: dict[int, int] = {}
    id_counts: dict[str, int] = {}
    n_err = n_warn_only = 0
    for i in range(n):
        p, findings = _row_findings(i, n, seed, n_files, drift)
        part_rows[p.partition_id] = part_rows.get(p.partition_id, 0) + 1
        if p.image_id is not None:
            id_counts[p.image_id] = id_counts.get(p.image_id, 0) + 1
        has_err = any(s == "error" for _, _, s in findings)
        if has_err:
            n_err += 1
            part_errs[p.partition_id] = part_errs.get(p.partition_id, 0) + 1
        elif findings:
            n_warn_only += 1
    dup_rows = sum(c for c in id_counts.values() if c > 1)
    missing_refs = sum(1 for j in range(n)
                       if j % ORPHAN_EVERY == ORPHAN_OFFSET
                       and (j // ORPHAN_EVERY) % 2 == 1)
    drift_part = n_files - 1 if (drift and n_files > 1) else None
    passed = sum(
        1 for f, rows in part_rows.items()
        if part_errs.get(f, 0) / max(rows, 1) <= max_error_rate
        and f != drift_part)
    return pd.DataFrame([{
        "total": n, "valid": n - n_err, "invalid": n_err,
        "warnings": n_warn_only,
        "relationship_errors": dup_rows + missing_refs,
        "partitions": len(part_rows), "partitions_passed": passed}])


def expected_rule_counts(n: int, seed: int = 42, n_files: int = 4,
                         drift: bool = True):
    """Exact (rule_id, severity, count) the engine must report for the dirty
    table, with cross-record rules weighted by ROWS involved (the
    ``rule_counts`` semantics in pipelines/validate.py: ``sum(cnt)`` per
    duplicate/near-dup key, ``sum(left_cnt)`` per missing ref) rather than
    one per key as in :func:`expected_violations`. Excludes partition-level
    drift verdicts (PSI math, owned by the golden drift test)."""
    import pandas as pd

    ev = expected_violations(n, seed, n_files, drift)
    id_counts: dict[str, int] = {}
    phash_counts: dict[int, int] = {}
    for i in range(n):
        p = row_plan(i, n, seed, n_files, True, drift)
        if p.image_id is not None:
            id_counts[p.image_id] = id_counts.get(p.image_id, 0) + 1
        if not p.phash_null and p.phash_override is not None:
            phash_counts[p.phash_override] = \
                phash_counts.get(p.phash_override, 0) + 1
    rows = []
    for rule, key, sev in ev:
        w = 1
        if rule == "unique.image_id":
            w = id_counts.get(key, 1)
        elif rule == "neardup.phash":
            w = phash_counts.get(int(str(key).split("=", 1)[1]), 1)
        rows.append((rule, sev, w))
    df = pd.DataFrame(rows, columns=["rule_id", "severity", "count"])
    return (df.groupby(["rule_id", "severity"])["count"].sum().reset_index()
            .sort_values(["rule_id", "severity"]).reset_index(drop=True))


def ensure_ground_truth(n: int, seed: int = 42, n_files: int = 4,
                        drift: bool = True,
                        root: str = "/tmp/fpv_imgtable") -> str:
    """Write (idempotently, atomically) the seeded ground-truth rule-count
    sidecar next to the dirty table; the DuckDB ``img_rule_counts_truth``
    oracle reads it. The generator's row plan — not the engine — is the
    source, so this checks the decode-dependent rules end-to-end."""
    tag = table_tag(n, seed, n_files, True, drift)
    base = os.path.join(root, tag)
    path = os.path.join(base, "ground_truth_counts.parquet")
    spath = os.path.join(base, "ground_truth_summary.parquet")
    for p, build in ((path, lambda: expected_rule_counts(n, seed, n_files,
                                                         drift)),
                     (spath, lambda: expected_summary(n, seed, n_files,
                                                      drift))):
        if not os.path.exists(p):
            os.makedirs(base, exist_ok=True)
            t = pa.Table.from_pandas(build(), preserve_index=False)
            pq.write_table(t, p + ".tmp")
            os.replace(p + ".tmp", p)
    return path


def table_tag(n: int, seed: int = 42, n_files: int = 4, violations: bool = True,
              drift: bool = True) -> str:
    """Cache-directory tag; the trailing generation id is bumped whenever the
    generated schema/content changes so stale /tmp caches are never reused
    (g2: label/collected_date/date_unit columns + vocab/catalog dims)."""
    return f"n{n}_s{seed}_f{n_files}_v{int(violations)}_d{int(drift)}_g2"


def ensure_image_table(n: int, seed: int = 42, n_files: int = 4, violations: bool = True,
                       drift: bool = True, root: str = "/tmp/fpv_imgtable",
                       use_ray: bool = False) -> str:
    tag = table_tag(n, seed, n_files, violations, drift)
    if use_ray:
        from ..runtime import ensure_shipped
        ensure_shipped()  # workers need no repo on sys.path (any cwd)
    return write_image_table(os.path.join(root, tag), n, seed, n_files,
                             violations, drift, use_ray=use_ray)


# ---------------------------------------------------------------- golden set

def expected_violations(n: int, seed: int = 42, n_files: int = 4,
                        drift: bool = True) -> list[tuple[str, str | None, str]]:
    """Exact expected (rule_id, image_id, severity) multiset for the dirty table.

    Shuffle rules (unique/neardup) emit ONE violation per offending KEY (not per
    row) — the scalable contract (SURVEY.md §7 'violation-row explosion').
    Drift verdicts are partition-level and asserted separately.
    """
    out: list[tuple[str, str | None, str]] = []
    id_counts: dict[str, int] = {}
    phash_counts: dict[int, int] = {}
    for i in range(n):
        p, findings = _row_findings(i, n, seed, n_files, drift)
        if p.image_id is not None:
            id_counts[p.image_id] = id_counts.get(p.image_id, 0) + 1
        # track every non-null phash for collision-exact neardup expectation
        if not p.phash_null and p.phash_override is not None:
            phash_counts[p.phash_override] = phash_counts.get(p.phash_override, 0) + 1
            # real phashes are effectively unique; tests at small n verify no
            # accidental collisions via the engine output itself
        out.extend(findings)
    for iid, c in id_counts.items():
        if c > 1:
            out.append(("unique.image_id", iid, "error"))
    for ph, c in phash_counts.items():
        if c > 1:
            out.append(("neardup.phash", f"phash={ph}", "warning"))
    for j in range(n):
        if j % ORPHAN_EVERY == ORPHAN_OFFSET:
            if (j // ORPHAN_EVERY) % 2 == 0:   # registered in the external catalog
                out.append(("ref.caption_image_external",
                            f"IMG_MISSING_{j:06d}", "warning"))
            else:
                out.append(("ref.caption_image", f"IMG_MISSING_{j:06d}", "error"))
    return out
