"""Exact distributed per-group quantiles by iterative histogram refinement.

The scale-correct way to get an EXACT percentile out of a dataset too big
to sort: no full sort, no per-group materialization, no driver-side value
collection beyond a bounded final fetch.

Algorithm (multi-round distributed selection):

- pass 0: one tiny aggregate shuffle for per-group ``(n, min, max)``;
  each requested (group, q) becomes a *target* holding a closed interval
  ``[lo, hi]`` and the 0-based in-interval rank ``k = ceil(q*n) - 1``
  (the SQL ``percentile_disc`` / DuckDB ``quantile_disc`` convention).
- each round: one streaming ``map_batches`` pass histograms every batch's
  in-group, in-interval values into ``B`` equal sub-buckets per target
  (vectorized ``np.searchsorted``); only ``(target, bucket, count)``
  partial rows cross the one groupby-sum exchange (≤ B rows/target reach
  the driver). The driver walks the cumulative counts, finds the bucket
  containing rank ``k``, and narrows the interval 128×.
- a target stops refining when its interval holds ≤ ``fetch_cap`` rows
  OR the interval width underflows float spacing (a mass-duplicate
  plateau — subdividing can't split it). The final pass fetches
  per-target ``(value, count)`` pairs (np.unique partials, bounded by
  distinct-in-interval ≤ fetch_cap, or a handful on a plateau) and reads
  the kth value off the merged counts.

Rounds needed: O(log_B(range / answer-spacing)) — 2-3 in practice. Every
pass is a column-pruned stream; payload values never cross an exchange.
Graft context: complements the t-digest sketches
(functions/sketches.py) which give *approximate* quantiles in one pass;
this gives the exact answer the reference's summary statistics imply
(/root/reference/base_validator.py:196-267 reports exact counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

B = 128  # sub-buckets per target per round


def _targets_state(base: pd.DataFrame, group_col: str,
                   qs: tuple[float, ...]) -> list[dict]:
    targets = []
    for _, row in base.iterrows():
        n = int(row["n"])
        if n == 0:
            continue
        for q in qs:
            k = max(0, int(np.ceil(q * n)) - 1)
            # hi_closed: buckets are half-open [e[j], e[j+1]) except the
            # LAST, which stays closed while the interval still ends at the
            # group max — keeps filter and bucketing boundary-consistent
            targets.append({"group": row[group_col], "q": q, "k": k,
                            "lo": float(row["lo"]), "hi": float(row["hi"]),
                            "hi_closed": True, "n_in": n, "done": False})
    return targets


def _in_interval(v: np.ndarray, lo: float, hi: float,
                 hi_closed: bool) -> np.ndarray:
    return (v >= lo) & ((v <= hi) if hi_closed else (v < hi))


def _plateau(lo: float, hi: float) -> bool:
    return (hi - lo) <= 4 * np.spacing(max(abs(lo), abs(hi), 1e-300))


def exact_group_quantiles(ds, group_col: str, val_col: str,
                          qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                          fetch_cap: int = 8192,
                          max_rounds: int = 20,
                          materialize_cap_bytes: int | None = 8 << 30,
                          ) -> pd.DataFrame:
    """→ DataFrame (group_col, q, value): the exact per-group discrete
    quantiles of ``val_col`` (nulls ignored)."""
    import ray

    # materialize the narrow (group, value) stream ONCE when it fits the
    # object store comfortably: every refinement round re-scans it, and a
    # lazy dataset would re-execute the parquet read + filter per round
    # (measured ~1 s/scan of pure re-read overhead). For huge inputs
    # (estimate above the cap, or caller passed None… pinning/spilling the
    # whole value column would be worse than re-reading) keep the lazy
    # streaming path — each round is then one column-pruned re-scan.
    if materialize_cap_bytes is not None:
        try:
            # metadata-only for an untransformed parquet read (the common
            # call shape); a transformed input would execute its plan here,
            # so estimate BEFORE attaching the projection. Conservative:
            # the narrow stream is ≤ the input estimate.
            est = ds.size_bytes()
        except Exception:
            est = None
    else:
        est = None
    ds = ds.map_batches(
        lambda t: t.select([group_col, val_col])
        .filter(pc.is_valid(t.column(val_col))),
        batch_format="pyarrow")
    if est is not None and materialize_cap_bytes is not None \
            and est <= materialize_cap_bytes:
        ds = ds.materialize()

    # per-batch (group, n, lo, hi) partials + driver combine — the result
    # is one row per group; no per-key aggregate machinery needed
    def base_partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col]).append_column(
            "v", pc.cast(t.column(val_col), pa.float64()))
        agg = g.group_by(group_col).aggregate(
            [("v", "count"), ("v", "min"), ("v", "max")])
        return agg.rename_columns([group_col, "n", "lo", "hi"])

    base = (ds.map_batches(base_partial, batch_format="pyarrow").to_pandas()
            .groupby(group_col)
            .agg(n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
            .reset_index())
    targets = _targets_state(base, group_col, qs)

    for _ in range(max_rounds):
        live = [i for i, t in enumerate(targets)
                if not t["done"] and t["n_in"] > fetch_cap
                and not _plateau(t["lo"], t["hi"])]
        if not live:
            break
        edges = {i: np.linspace(targets[i]["lo"], targets[i]["hi"], B + 1)
                 for i in live}
        spec_ref = ray.put([(i, targets[i]["group"], edges[i],
                             targets[i]["hi_closed"]) for i in live])

        def hist_partial(tb: pa.Table) -> pa.Table:
            spec = ray.get(spec_ref)
            g = tb.column(group_col).to_numpy(zero_copy_only=False)
            v = tb.column(val_col).to_numpy(zero_copy_only=False)
            tid_out, b_out, n_out = [], [], []
            for tid, grp, e, hic in spec:
                vals = v[(g == grp) & _in_interval(v, e[0], e[-1], hic)]
                if not len(vals):
                    continue
                idx = np.clip(np.searchsorted(e, vals, side="right") - 1,
                              0, B - 1)
                cnt = np.bincount(idx, minlength=B)
                nz = np.flatnonzero(cnt)
                tid_out.extend([tid] * len(nz))
                b_out.extend(nz.tolist())
                n_out.extend(cnt[nz].tolist())
            return pa.table({"tid": pa.array(tid_out, type=pa.int32()),
                             "bucket": pa.array(b_out, type=pa.int32()),
                             "n": pa.array(n_out, type=pa.int64())})

        # partials are ≤ live×B rows per block — combine on the driver
        # instead of paying a per-key aggregate exchange for a few kB
        hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
                .to_pandas()
                .groupby(["tid", "bucket"], as_index=False)["n"].sum())
        for i in live:
            t = targets[i]
            sub = hist[hist["tid"] == i].sort_values("bucket")
            cnt = np.zeros(B, dtype=np.int64)
            cnt[sub["bucket"].to_numpy()] = sub["n"].to_numpy()
            cum = np.cumsum(cnt)
            j = int(np.searchsorted(cum, t["k"] + 1))
            e = edges[i]
            t["k"] -= int(cum[j - 1]) if j else 0
            t["lo"], t["hi"], t["n_in"] = float(e[j]), float(e[j + 1]), \
                int(cnt[j])
            # the clip puts values == hi into bucket B-1, so only that
            # bucket keeps the closed upper end
            t["hi_closed"] = t["hi_closed"] and j == B - 1

    # final pass: exact (value, count) pairs for every target at once
    spec_ref = ray.put([(i, t["group"], t["lo"], t["hi"], t["hi_closed"])
                        for i, t in enumerate(targets) if not t["done"]])

    def value_partial(tb: pa.Table) -> pa.Table:
        spec = ray.get(spec_ref)
        g = tb.column(group_col).to_numpy(zero_copy_only=False)
        v = tb.column(val_col).to_numpy(zero_copy_only=False)
        tid_out, v_out, n_out = [], [], []
        for tid, grp, lo, hi, hic in spec:
            vals = v[(g == grp) & _in_interval(v, lo, hi, hic)]
            if not len(vals):
                continue
            u, c = np.unique(vals, return_counts=True)
            tid_out.extend([tid] * len(u))
            v_out.extend(u.tolist())
            n_out.extend(c.tolist())
        return pa.table({"tid": pa.array(tid_out, type=pa.int32()),
                         "val": pa.array(v_out, type=pa.float64()),
                         "n": pa.array(n_out, type=pa.int64())})

    # bounded by fetch_cap distinct values per target per block
    vals = (ds.map_batches(value_partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["tid", "val"], as_index=False)["n"].sum())
    out = []
    for i, t in enumerate(targets):
        sub = vals[vals["tid"] == i].sort_values("val")
        cum = sub["n"].cumsum().to_numpy()
        pos = int(np.searchsorted(cum, t["k"] + 1))
        out.append({group_col: t["group"], "q": t["q"],
                    "value": float(sub["val"].to_numpy()[pos])})
    return pd.DataFrame(out)
