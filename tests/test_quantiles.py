"""Exact distributed quantiles (functions/quantiles.py): refinement rounds
forced by a tiny fetch_cap, a mass-duplicate plateau group, negative values,
and the DuckDB quantile_disc rank convention (ceil(q*n)-1, 0-based)."""

import numpy as np
import pandas as pd

from faang_pydantics_validation_ray.functions.quantiles import (
    exact_group_quantiles,
)

QS = (0.1, 0.5, 0.95, 0.99)


def _expected(g: np.ndarray, v: np.ndarray) -> pd.DataFrame:
    rows = []
    for grp in np.unique(g):
        s = np.sort(v[g == grp])
        for q in QS:
            k = max(0, int(np.ceil(q * len(s))) - 1)
            rows.append((grp, q, s[k]))
    return pd.DataFrame(rows, columns=["g", "q", "value"])


def test_exact_quantiles_refinement_and_plateau(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(7)
    per = 5000
    g = np.repeat(["a", "b", "c"], per)
    v = np.concatenate([
        rng.normal(0, 100, per),            # smooth, forces refinement
        np.full(per, 3.14159),              # plateau: width underflow path
        rng.exponential(50, per) - 25,      # skewed + negatives
    ])
    ds = rd.from_pandas(pd.DataFrame({"g": g, "v": v})).repartition(8)
    out = exact_group_quantiles(ds, "g", "v", qs=QS, fetch_cap=64)
    m = out.merge(_expected(g, v), on=["g", "q"], suffixes=("_got", "_exp"))
    assert len(m) == 3 * len(QS)
    assert (m["value_got"] == m["value_exp"]).all(), m


def test_exact_quantiles_small_group_and_nulls(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"g": ["x"] * 5 + ["y"] * 3,
                       "v": [5.0, 1.0, None, 3.0, 2.0, 9.0, None, 7.0]})
    out = exact_group_quantiles(rd.from_pandas(df), "g", "v", qs=(0.5,))
    got = dict(zip(out["g"], out["value"]))
    # x: sorted non-null [1,2,3,5] -> k=ceil(.5*4)-1=1 -> 2.0
    # y: sorted non-null [7,9]     -> k=0            -> 7.0
    assert got == {"x": 2.0, "y": 7.0}
