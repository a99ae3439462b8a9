"""The flagship rule set over the image+caption table (BASELINE.json input_hint).

Each rule grafts a reference rule family onto the image domain (SURVEY.md §2.2
"Graft rule" column); decode-dependent rules (xfield.fmt_magic,
xfield.dims_match, pixel.decode, pixel.psnr) are computed by the decode actor
stage and merged via ``RuleSet.evaluate(extra_findings=...)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..imagetable import codec
from . import kernels
from ._arrow import np_bool
from .spec import RuleSet

MAX_PIXELS = 1 << 24
ID_PATTERN = r"^IMG_[0-9]{12}$"


# P5 graft: claimed w>0 ∧ h>0 ∧ w*h ≤ MAX_PIXELS — built from the shared
# declarative factory so the packaged JSON ruleset reproduces it exactly
_range_dims_kernel = kernels.area_range("w", "h", MAX_PIXELS)

# P10 graft: lossy fmt ⇒ phash required (conditional requirement)
PHASH_LOSSY_MESSAGE = "phash is required for lossy formats"
_phash_for_lossy_kernel = kernels.conditional_required(
    "fmt", sorted(codec.LOSSY_FORMATS), "phash",
    message=PHASH_LOSSY_MESSAGE)


def range_valid_mask(t: pa.Table) -> np.ndarray:
    """Rows whose claimed dims pass the range rule — gates xfield.dims_match
    so a row failing range.dims is not double-flagged (FIXTURES.md §A.2)."""
    w, h = t.column("w"), t.column("h")
    ok = np_bool(pc.greater(w, 0)) & np_bool(pc.greater(h, 0))
    area = pc.multiply(pc.cast(w, pa.int64()), pc.cast(h, pa.int64()))
    ok &= np_bool(pc.less_equal(area, MAX_PIXELS))
    return ok


# per-unit date patterns (strict anchored forms; see kernels.unit_pattern)
DATE_PATTERNS = {"YYYY-MM-DD": r"^\d{4}-\d{2}-\d{2}$",
                 "YYYY-MM": r"^\d{4}-\d{2}$",
                 "YYYY": r"^\d{4}$"}


# Calendar validity applies only to rows whose unit declares a full date —
# year/month-granularity values have no day to validate. Shared factory so
# the packaged JSON ruleset builds the identical gate.
_full_date_unit_gate = kernels.unit_gate("date_unit", "YYYY-MM-DD")


def build_image_ruleset(vocab=None) -> RuleSet:
    """``vocab``: label terms from the (broadcast) vocab dim table — enables
    the T1 vocab-membership and T2 caption↔label consistency rules; date
    rules activate whenever the collected_date/date_unit columns exist."""
    rs = RuleSet(key_column="image_id",
                 sentinel_levels={"fmt": "mandatory"})
    rs.add("required.image_id", "image_id", kernels.required("image_id"))
    rs.add("required.bytes", "bytes", kernels.required("bytes"))
    rs.add("pattern.image_id", "image_id",
           kernels.regex("image_id", ID_PATTERN,
                         message="image_id must match IMG_ followed by 12 digits"))
    rs.add("enum.fmt", "fmt", kernels.enum_in("fmt", codec.FORMATS))
    rs.add("range.dims", "w", _range_dims_kernel)
    rs.add("recommended.caption", "caption", kernels.recommended("caption"))
    rs.add("recommended.phash", "phash", kernels.recommended("phash"))
    rs.add("conditional.phash_for_lossy", "phash", _phash_for_lossy_kernel)
    rs.add("datepattern.collected_date", "collected_date",
           kernels.unit_pattern("collected_date", "date_unit", DATE_PATTERNS))
    rs.add("datevalid.collected_date", "collected_date",
           kernels.real_date("collected_date", gate=_full_date_unit_gate))
    if vocab is not None:
        rs.add("vocab.label", "label", kernels.vocab_member("label", vocab))
        rs.add("consistency.caption_label", "label",
               kernels.text_label_consistent("caption", "label", vocab))
    return rs


def normalize_image_batch(t: pa.Table) -> tuple[pa.Table, dict[str, np.ndarray]]:
    """P7 normalize pass: fmt trim+lower (+''→null); captions untouched to
    preserve the caption-equality invariant. Returns changed-masks for the
    ``normalize.fmt`` warning rule."""
    return kernels.normalize_strings(t, ["fmt"])
