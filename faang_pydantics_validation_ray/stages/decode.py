"""Image-decode checks — the stateful pixel-rule stage (SURVEY.md T5).

Per-row by nature (a decoder consumes one buffer at a time), which is exactly
why this runs as an actor-pool ``map_batches`` stage: the decoder + reference
profile are loaded once per actor in ``__init__`` and amortized across
batches. Everything scalar stays vectorized elsewhere.

Rules produced (graft of the cross-field consistency family,
/root/reference/standard_ruleset.py:49-70, onto pixels per BASELINE.json
north_star):
- ``pixel.decode``       — bytes must decode (error)
- ``xfield.fmt_magic``   — claimed fmt must match the container magic (error)
- ``xfield.dims_match``  — claimed (w,h) must equal decoded dims (error); only
  evaluated for rows whose claimed dims pass ``range.dims`` (no double-flag)
- ``pixel.psnr``         — lossy containers must reconstruct the reference
  pixels at ≥ ``psnr_min`` dB (error)
- ``xfield.phash_consistency`` — the claimed ``phash`` must be within
  ``PHASH_HAMMING_TOL`` bits of the hash recomputed from the decoded pixels
  (warning; skipped for rows already failing PSNR, whose pixels are
  legitimately degraded)

``reference_pixel_fn(image_id, w, h) → ndarray`` abstracts the reference
pixel store; the sandbox default regenerates the deterministic synthetic
pixels (stand-in for fetching original/reference bytes from a side store).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..imagetable import codec
from ..rules.image_rules import range_valid_mask
from ..rules.spec import Finding


def _binary_views(col) -> list:
    """Zero-copy per-row views of an Arrow binary column (memoryview slices
    over the data buffer). ``to_pylist()`` copied every image payload into a
    fresh Python bytes object — at full actor-pool concurrency that extra
    pass over the heaviest column is pure memory-bandwidth waste; the
    decoder (zlib/struct/sniff) accepts any buffer-protocol object."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return []
    off_dtype = (np.int64 if pa.types.is_large_binary(arr.type)
                 else np.int32)
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset:arr.offset + n + 1]
    dbuf = arr.buffers()[2]
    # cast to unsigned-char format: pyarrow buffers expose 'b' (signed), and
    # memoryview == bytes compares VALUES per format — signed would break
    # magic-number equality for any byte ≥ 0x80
    mv = (memoryview(dbuf).cast("B") if dbuf is not None
          else memoryview(b""))
    if arr.null_count:
        valid = np.asarray(pc.is_valid(arr))
        return [mv[off[i]:off[i + 1]] if valid[i] else None
                for i in range(n)]
    return [mv[off[i]:off[i + 1]] for i in range(n)]


# max Hamming distance between claimed and recomputed perceptual hash before
# the consistency warning fires (default-quality lossy re-encoding flips only
# a few near-median bits; unrelated hashes differ by ~32)
PHASH_HAMMING_TOL = 8


class DecodeChecker:
    def __init__(self, psnr_min: float = 40.0, seed: int = 42,
                 reference_pixel_fn: Callable[[str, int, int], np.ndarray] | None = None):
        self.psnr_min = psnr_min
        self.ref_fn = reference_pixel_fn or (
            lambda image_id, w, h: codec.gen_pixels(image_id, w, h, seed=seed))

    def findings(self, t: pa.Table) -> dict[str, list[Finding]]:
        """Compute pixel/cross-field findings for one (normalized) batch.

        Expects columns: image_id, bytes, w, h, fmt (normalized).
        """
        n = t.num_rows
        decode_fail = np.zeros(n, dtype=bool)
        magic_bad = np.zeros(n, dtype=bool)
        dims_bad = np.zeros(n, dtype=bool)
        psnr_bad = np.zeros(n, dtype=bool)
        phash_bad = np.zeros(n, dtype=bool)

        range_ok = range_valid_mask(t)
        bufs = _binary_views(t.column("bytes"))
        ids = t.column("image_id").to_pylist()
        ws = t.column("w").to_pylist()
        hs = t.column("h").to_pylist()
        fmts = t.column("fmt").to_pylist()
        phashes = t.column("phash").to_pylist() if "phash" in t.column_names \
            else [None] * n

        for i in range(n):
            buf = bufs[i]
            if buf is None:
                continue  # required.bytes owns this row
            claimed_fmt = fmts[i]
            actual_fmt = codec.sniff_format(buf)
            if (claimed_fmt in codec.FORMATS and actual_fmt is not None
                    and claimed_fmt != actual_fmt):
                magic_bad[i] = True
            try:
                _, wd, hd, px = codec.decode(buf)
            except codec.DecodeError:
                decode_fail[i] = True
                continue
            if range_ok[i] and ws[i] is not None and hs[i] is not None \
                    and (wd != ws[i] or hd != hs[i]):
                dims_bad[i] = True
            if actual_fmt in codec.LOSSY_FORMATS and ids[i] is not None:
                ref = self.ref_fn(ids[i], wd, hd)
                if codec.psnr(ref, px) < self.psnr_min:
                    psnr_bad[i] = True
            if phashes[i] is not None and not psnr_bad[i]:
                dist = bin((codec.phash64(px) ^ phashes[i])
                           & 0xFFFFFFFFFFFFFFFF).count("1")
                if dist > PHASH_HAMMING_TOL:
                    phash_bad[i] = True

        return {
            "pixel.decode:bytes": [(decode_fail, "error", "bytes failed to decode")],
            "xfield.fmt_magic:fmt": [(magic_bad, "error",
                                      "claimed fmt does not match container magic bytes")],
            "xfield.dims_match:w": [(dims_bad, "error",
                                     "claimed (w,h) does not match decoded dimensions")],
            "pixel.psnr:bytes": [(psnr_bad, "error",
                                  f"decoded pixels below {self.psnr_min}dB PSNR vs reference")],
            "xfield.phash_consistency:phash": [
                (phash_bad, "warning",
                 f"claimed phash differs from decoded-pixel hash by more than "
                 f"{PHASH_HAMMING_TOL} bits")],
        }
