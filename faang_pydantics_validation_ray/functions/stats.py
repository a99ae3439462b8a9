"""Distributed bivariate statistics: Pearson correlation / covariance as a
pure combiner — per-batch moment partials merged with the pairwise update
formula (Chan et al. 1982), numerically stable at any row count.

Scale shape: ONE streaming map_batches pass emits a 6-number partial per
batch; the driver folds the tiny partial list. No shuffle, no
materialization — the same combiner would fold tree-wise on a 256-node
cluster.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _merge(a, b):
    """Combine two (n, mx, my, M2x, M2y, Cxy) moment partials."""
    n1, mx1, my1, m2x1, m2y1, cxy1 = a
    n2, mx2, my2, m2x2, m2y2, cxy2 = b
    if n1 == 0:
        return b
    if n2 == 0:
        return a
    n = n1 + n2
    dx, dy = mx2 - mx1, my2 - my1
    return (n,
            mx1 + dx * n2 / n,
            my1 + dy * n2 / n,
            m2x1 + m2x2 + dx * dx * n1 * n2 / n,
            m2y1 + m2y2 + dy * dy * n1 * n2 / n,
            cxy1 + cxy2 + dx * dy * n1 * n2 / n)


def bivariate_moments(ds, x: str, y: str) -> tuple:
    """→ (n, mean_x, mean_y, M2x, M2y, Cxy) over all rows where both
    columns are non-null (SQL corr()/covar semantics)."""
    def partial(t: pa.Table) -> pa.Table:
        xa = t.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
        ya = t.column(y).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(xa) | np.isnan(ya))
        xa, ya = xa[ok], ya[ok]
        n = len(xa)
        if n == 0:
            return pa.table({c: pa.array([0.0], type=pa.float64())
                             for c in ("n", "mx", "my", "m2x", "m2y", "cxy")})
        mx, my = xa.mean(), ya.mean()
        return pa.table({
            "n": pa.array([float(n)], type=pa.float64()),
            "mx": pa.array([mx], type=pa.float64()),
            "my": pa.array([my], type=pa.float64()),
            "m2x": pa.array([float(((xa - mx) ** 2).sum())],
                            type=pa.float64()),
            "m2y": pa.array([float(((ya - my) ** 2).sum())],
                            type=pa.float64()),
            "cxy": pa.array([float(((xa - mx) * (ya - my)).sum())],
                            type=pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    acc = (0, 0.0, 0.0, 0.0, 0.0, 0.0)
    for row in parts.itertuples(index=False):
        acc = _merge(acc, (row.n, row.mx, row.my, row.m2x, row.m2y, row.cxy))
    return acc


def pearson(ds, x: str, y: str) -> pd.DataFrame:
    """→ one-row DataFrame(n, corr, covar_pop, covar_samp) — SQL
    corr()/covar_pop()/covar_samp() parity."""
    n, _, _, m2x, m2y, cxy = bivariate_moments(ds, x, y)
    n = int(n)
    corr = cxy / np.sqrt(m2x * m2y) if n > 1 and m2x > 0 and m2y > 0 \
        else np.nan
    return pd.DataFrame({
        "n": pd.array([n], dtype="int64"),
        "corr": pd.array([corr], dtype="float64"),
        "covar_pop": pd.array([cxy / n if n else np.nan], dtype="float64"),
        "covar_samp": pd.array([cxy / (n - 1) if n > 1 else np.nan],
                               dtype="float64"),
    })


def ks_two_sample(ds, value: str, flag_fn, num_partitions: int | None = None
                  ) -> pd.DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic, distributed:
    ``D = max_x |F_a(x) − F_b(x)|`` over the empirical CDFs of two
    sub-populations (``flag_fn(table) → BooleanArray`` marks population A).
    The exact counterpart of the t-digest ``sketches.ks_stat`` used by the
    drift checks (A6).

    Plan: per-batch distinct-value (x, na, nb) partials → ONE groupby(x)
    sum → ONE range sort on x — both distributed — then a boundary pass
    ships TWO scalars per block (the block's (Σna, Σnb)) to the driver,
    which threads prefix offsets; each block evaluates its local
    ``max |cum_a/ta − cum_b/tb|`` and only per-block maxima return. The
    value domain never materializes on the driver."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(value).to_numpy(zero_copy_only=False)
        is_a = np.asarray(flag_fn(t), dtype=bool)
        ok = ~np.isnan(x) if x.dtype.kind == "f" else np.ones(len(x), bool)
        x, is_a = x[ok], is_a[ok]
        vals = np.unique(x)
        idx = np.searchsorted(vals, x)
        na = np.bincount(idx[is_a], minlength=len(vals))
        nb = np.bincount(idx[~is_a], minlength=len(vals))
        return pa.table({"x": pa.array(vals),
                         "na": pa.array(na, type=pa.int64()),
                         "nb": pa.array(nb, type=pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("x")
           .aggregate(Sum("na", alias_name="na"), Sum("nb", alias_name="nb"))
           .sort("x").materialize())
    refs = [blk for bundle in agg.iter_internal_ref_bundles()
            for blk, md in bundle.blocks if (md.num_rows or 0) > 0]
    if not refs:
        return pd.DataFrame({"ks": [0.0], "n_a": np.array([0], dtype="int64"),
                             "n_b": np.array([0], dtype="int64")})

    @ray.remote
    def block_sums(blk):
        t = blk if isinstance(blk, pa.Table) else pa.Table.from_pandas(blk)
        return (int(pc.sum(t.column("na")).as_py() or 0),
                int(pc.sum(t.column("nb")).as_py() or 0))

    sums = ray.get([block_sums.remote(r) for r in refs])
    ta = float(sum(s[0] for s in sums))
    tb = float(sum(s[1] for s in sums))
    if ta == 0 or tb == 0:
        return pd.DataFrame({"ks": [0.0],
                             "n_a": np.array([int(ta)], dtype="int64"),
                             "n_b": np.array([int(tb)], dtype="int64")})
    offs, ca, cb = [], 0, 0
    for sa, sb in sums:
        offs.append((ca, cb))
        ca, cb = ca + sa, cb + sb

    @ray.remote
    def block_max(blk, off_a: int, off_b: int) -> float:
        t = blk if isinstance(blk, pa.Table) else pa.Table.from_pandas(blk)
        na = t.column("na").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False)
        fa = (np.cumsum(na) + off_a) / ta
        fb = (np.cumsum(nb) + off_b) / tb
        return float(np.abs(fa - fb).max())

    d = max(ray.get([block_max.remote(r, oa, ob)
                     for r, (oa, ob) in zip(refs, offs)]))
    return pd.DataFrame({"ks": [round(d, 6)],
                         "n_a": np.array([int(ta)], dtype="int64"),
                         "n_b": np.array([int(tb)], dtype="int64")})
