"""Sentinel ("special value") policy — graft of the reference's tri-state
value / sentinel / null semantics.

The reference admits the special strings ``"restricted access"``,
``"not applicable"``, ``"not collected"``, ``"not provided"``, ``""`` alongside
a field's real type (/root/reference/validation_utils.py:34-46) and maps each
(mandatory-level, sentinel) pair to an error or warning
(/root/reference/constants.py:214-228). This module encodes that policy ONCE;
every kernel ANDs the sentinel mask out of its predicate so severities cannot
drift between rules (SURVEY.md §7 "Sentinel semantics").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._arrow import np_bool

SENTINELS = ("restricted access", "not applicable", "not collected", "not provided", "")

# mandatory-level → {sentinel → severity}; absent sentinel ⇒ allowed silently.
# Mirrors /root/reference/constants.py:214-228: mandatory: na/collected/provided
# are errors, restricted is a warning; recommended: collected/provided are
# warnings; optional: every sentinel is an error.
POLICY: dict[str, dict[str, str]] = {
    "mandatory": {
        "not applicable": "error", "not collected": "error",
        "not provided": "error", "": "error", "restricted access": "warning",
    },
    "recommended": {"not collected": "warning", "not provided": "warning"},
    "optional": {s: "error" for s in SENTINELS},
}


def sentinel_mask(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Boolean mask: row holds any sentinel string (nulls → False)."""
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        return np.zeros(len(col), dtype=bool)
    return np_bool(pc.is_in(col, value_set=pa.array(SENTINELS, type=col.type)))


def sentinel_findings(col: pa.ChunkedArray | pa.Array, level: str
                      ) -> list[tuple[np.ndarray, str, str]]:
    """Per-policy (mask, severity, message) findings for a column at a level."""
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        return []
    out = []
    policy = POLICY[level]
    by_sev: dict[str, list[str]] = {}
    for s, sev in policy.items():
        by_sev.setdefault(sev, []).append(s)
    for sev, sents in by_sev.items():
        mask = np_bool(pc.is_in(col, value_set=pa.array(sents, type=col.type)))
        if mask.any():
            out.append((mask, sev,
                        f"sentinel value not permitted at {level} level" if sev == "error"
                        else f"sentinel value downgraded to warning at {level} level"))
    return out
