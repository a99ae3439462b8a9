"""Misra-Gries heavy hitters — the skew diagnostic for 100-TB shuffles.

Hot keys are what break wide operations at scale (a single phash bucket or
token taking 5% of a 10^12-row table lands on one reducer). The MG sketch
finds every key with frequency > N/k in ONE streaming pass with k counters
per block and NO shuffle of raw keys; a second sparse pass computes exact
counts for just the candidate set, so the reported counts are EXACT (the
sketch can only over-admit, never miss — no false negatives for any key
above the guarantee threshold).

Shuffle shape: per-batch MG partials (≤ k rows each) → driver merge (the MG
merge: sum, then decrement by the (k+1)-th largest and drop non-positives)
→ broadcast candidates → per-batch exact partial counts (≤ |candidates|
rows each) → driver sum. Raw keys never cross the wire.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def mg_merge(counts: pd.Series, k: int) -> pd.Series:
    """Merge-and-shrink: keep at most k counters by subtracting the
    (k+1)-th largest count from all and dropping non-positive ones — the
    standard mergeable-summary rule (Agarwal et al., PODS'12)."""
    if len(counts) <= k:
        return counts
    kth = np.partition(counts.to_numpy(), len(counts) - k - 1)[
        len(counts) - k - 1]
    out = counts - kth
    return out[out > 0]


def heavy_hitters(ds, batch_tokens, k: int = 200,
                  min_count: int | None = None,
                  min_frac: float | None = None) -> pd.DataFrame:
    """Exact heavy keys of a token stream: every token whose global count
    satisfies the threshold (``min_count`` or ``min_frac`` of total).

    ``batch_tokens(t: pa.Table) -> pa.Array`` extracts the token stream
    from a batch (flattened, may repeat). Guarantee: with k counters, any
    token with frequency > total/k survives pass 1, so choose
    ``k >> 1/min_frac`` (asserted).

    Returns pandas (token, n) sorted by (n desc, token asc), EXACT counts.

    Completeness: the reported counts are always exact, and the result is
    COMPLETE (no heavy key missed) iff the threshold exceeds the MG
    survival bound ``total/k``. With ``min_frac`` that bound is checked up
    front (``k >= 4/min_frac``); with ``min_count`` only, the stream total
    is unknown before the scan, so the bound is verified after pass 2 and
    a too-small ``k`` raises instead of silently dropping heavy keys.
    """
    import ray

    from ray.data.aggregate import Sum

    if min_frac is not None and k < 4 / min_frac:
        raise ValueError(
            f"k={k} too small for min_frac={min_frac}: keys below the MG "
            f"survival bound (total/k) can be dropped in pass 1; need "
            f"k >= {4 / min_frac:.0f}")

    def sketch(t: pa.Table) -> pa.Table:
        toks = batch_tokens(t)
        vc = pc.value_counts(toks.combine_chunks()
                             if isinstance(toks, pa.ChunkedArray) else toks)
        s = pd.Series(pc.cast(vc.field("counts"), pa.int64()).to_numpy(),
                      index=vc.field("values").to_pylist())
        s = mg_merge(s, k)
        return pa.table({"token": pa.array(s.index, type=pa.string()),
                         "n": pa.array(s.to_numpy(), type=pa.int64())})

    # driver merge of ≤ k-row partials; the exact stream total comes from
    # pass 2's marker rows. An EMPTY partial set does not short-circuit:
    # a too-small k can shrink every batch sketch to nothing (all counters
    # decremented away) — pass 2 must still run so the completeness guard
    # below sees the true stream total instead of silently returning [].
    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    merged = (parts.groupby("token")["n"].sum() if len(parts)
              else pd.Series(dtype="int64"))
    cand = mg_merge(merged, k)
    cand_tokens = np.sort(np.asarray(cand.index, dtype=object))
    cand_ref = ray.put(pa.array(cand_tokens, type=pa.string()))

    def exact(t: pa.Table) -> pa.Table:
        """Per-batch exact counts of candidate tokens, plus ONE null-token
        marker row carrying the batch's raw token total."""
        want = ray.get(cand_ref)
        toks = batch_tokens(t)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        hit = toks.filter(pc.is_in(toks, value_set=want))
        vc = pc.value_counts(hit)
        tok = pa.concat_arrays([pc.cast(vc.field("values"), pa.string()),
                                pa.array([None], type=pa.string())])
        n = pa.concat_arrays([pc.cast(vc.field("counts"), pa.int64()),
                              pa.array([len(toks)], type=pa.int64())])
        return pa.table({"token": tok, "n": n})

    ex = ds.map_batches(exact, batch_format="pyarrow").to_pandas()
    total = int(ex.loc[ex["token"].isna(), "n"].sum())
    ex = ex.dropna(subset=["token"])
    counts = (ex.groupby("token")["n"].sum().reset_index()
              if len(ex) else pd.DataFrame({"token": [], "n": []}))
    if min_frac is not None:
        min_count = max(min_count or 1, int(np.ceil(min_frac * total)))
    if min_count is not None:
        # post-hoc completeness check for the min_count-only path: any key
        # with true count > total/k survived pass 1, so min_count above that
        # bound guarantees no heavy key was dropped
        if min_count <= total / k:
            raise ValueError(
                f"k={k} cannot guarantee completeness for "
                f"min_count={min_count} over a {total}-token stream: keys "
                f"between min_count and total/k={total / k:.0f} may have "
                f"been dropped in pass 1; rerun with k > {total // min_count}")
        counts = counts[counts["n"] >= min_count]
    counts["n"] = counts["n"].astype("int64")
    return (counts.sort_values(["n", "token"], ascending=[False, True])
            .reset_index(drop=True))
