"""Keyed window analytics: the sort + boundary-offset scale path must match
the per-group reference implementation and pandas exactly, including keys
that span many blocks (the carry chain)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from faang_pydantics_validation_ray.functions import window


def _frame(seed=7, n=500, n_keys=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, n_keys, n),
        "t": rng.integers(0, 10_000, n),
        "i": np.arange(n, dtype=np.int64),  # unique tiebreak
        "v": rng.normal(100.0, 30.0, n).round(3),
    })


def _pandas_truth(df):
    g = df.sort_values(["k", "t", "i"]).reset_index(drop=True)
    g["cum_sum"] = g.groupby("k")["v"].cumsum()
    g["rn"] = g.groupby("k").cumcount() + 1
    return g


def test_cumulative_by_key_matches_pandas(ray_session):
    df = _frame()
    ds = rd.from_pandas(df).repartition(7)  # force many small blocks
    got = (window.cumulative_by_key(ds, key="k", order=["t", "i"], value="v")
           .to_pandas().sort_values(["k", "t", "i"]).reset_index(drop=True))
    want = _pandas_truth(df)
    assert len(got) == len(want)
    assert got["rn"].astype(int).tolist() == want["rn"].astype(int).tolist()
    np.testing.assert_allclose(got["cum_sum"].to_numpy(),
                               want["cum_sum"].to_numpy(), rtol=1e-9)


def test_cumulative_by_key_single_hot_key_spans_blocks(ray_session):
    """One key across EVERY block: the carry dict must thread the running
    (sum, count) through the whole block chain."""
    n = 300
    df = pd.DataFrame({"k": np.zeros(n, dtype=np.int64),
                       "t": np.arange(n, dtype=np.int64),
                       "i": np.arange(n, dtype=np.int64),
                       "v": np.ones(n)})
    ds = rd.from_pandas(df).repartition(11)
    got = (window.cumulative_by_key(ds, key="k", order=["t", "i"], value="v")
           .to_pandas().sort_values("t").reset_index(drop=True))
    np.testing.assert_allclose(got["cum_sum"].to_numpy(),
                               np.arange(1, n + 1, dtype=float))
    assert got["rn"].tolist() == list(range(1, n + 1))


def test_cumulative_matches_map_groups_reference(ray_session):
    df = _frame(seed=13, n=400, n_keys=5)
    ds = rd.from_pandas(df).repartition(6)
    fast = (window.cumulative_by_key(ds, key="k", order=["t", "i"], value="v")
            .to_pandas().sort_values(["k", "t", "i"]).reset_index(drop=True))
    ref = (window.cumulative_by_key_groups(
        rd.from_pandas(df), key="k", order=["t", "i"], value="v")
        .to_pandas().sort_values(["k", "t", "i"]).reset_index(drop=True))
    assert fast["rn"].astype(int).tolist() == ref["rn"].astype(int).tolist()
    np.testing.assert_allclose(fast["cum_sum"].to_numpy(),
                               ref["cum_sum"].to_numpy(), rtol=1e-9)


def test_lag_by_key_matches_pandas(ray_session):
    df = _frame(seed=21, n=350, n_keys=6)
    ds = rd.from_pandas(df).repartition(8)
    got = (window.lag_by_key(ds, key="k", order=["t", "i"], value="v",
                             out="prev")
           .to_pandas().sort_values(["k", "t", "i"]).reset_index(drop=True))
    want = df.sort_values(["k", "t", "i"]).reset_index(drop=True)
    want["prev"] = want.groupby("k")["v"].shift(1)
    assert got["prev"].isna().sum() == want["prev"].isna().sum() == 6
    pd.testing.assert_series_equal(got["prev"], want["prev"],
                                   check_exact=False, rtol=1e-12)


def test_window_empty_input(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64"),
                                      "t": pd.Series([], dtype="int64"),
                                      "v": pd.Series([], dtype="float64")}))
    out = window.cumulative_by_key(ds, key="k", order=["t"], value="v")
    assert out.count() == 0


def test_lead_by_key_matches_pandas(ray_session):
    df = _frame(seed=22, n=350, n_keys=6)
    ds = rd.from_pandas(df).repartition(8)
    got = (window.lead_by_key(ds, key="k", order=["t", "i"], value="v",
                              out="nxt")
           .to_pandas().sort_values(["k", "t", "i"]).reset_index(drop=True))
    want = df.sort_values(["k", "t", "i"]).reset_index(drop=True)
    want["nxt"] = want.groupby("k")["v"].shift(-1)
    assert got["nxt"].isna().sum() == want["nxt"].isna().sum() == 6
    pd.testing.assert_series_equal(got["nxt"], want["nxt"],
                                   check_exact=False, rtol=1e-12)


def test_rolling_mean_matches_pandas(ray_session):
    df = _frame(seed=23, n=400, n_keys=5)
    ds = rd.from_pandas(df).repartition(9)   # segments span blocks
    got = (window.rolling_mean_by_key(ds, key="k", order=["t", "i"],
                                      value="v", window=4, out="ma")
           .to_pandas().sort_values(["k", "t", "i"]).reset_index(drop=True))
    want = df.sort_values(["k", "t", "i"]).reset_index(drop=True)
    want["ma"] = (want.groupby("k")["v"]
                  .transform(lambda s: s.rolling(4, min_periods=1).mean()))
    np.testing.assert_allclose(got["ma"].to_numpy(), want["ma"].to_numpy(),
                               rtol=1e-9)


def test_rolling_mean_hot_key_spans_blocks(ray_session):
    """One key across EVERY block: the ≤ W-1 value carry must thread the
    whole block chain (true positions ≫ the per-block context length)."""
    n = 300
    df = pd.DataFrame({"k": np.zeros(n, dtype=np.int64),
                       "t": np.arange(n, dtype=np.int64),
                       "i": np.arange(n, dtype=np.int64),
                       "v": np.arange(n, dtype=np.float64)})
    ds = rd.from_pandas(df).repartition(11)
    got = (window.rolling_mean_by_key(ds, key="k", order=["t", "i"],
                                      value="v", window=7, out="ma")
           .to_pandas().sort_values("t").reset_index(drop=True))
    want = pd.Series(np.arange(n, dtype=np.float64)).rolling(
        7, min_periods=1).mean()
    np.testing.assert_allclose(got["ma"].to_numpy(), want.to_numpy(),
                               rtol=1e-12)


def test_rolling_mean_window_one_is_identity(ray_session):
    df = _frame(seed=24, n=100, n_keys=3)
    ds = rd.from_pandas(df).repartition(4)
    got = (window.rolling_mean_by_key(ds, key="k", order=["t", "i"],
                                      value="v", window=1, out="ma")
           .to_pandas().sort_values(["k", "t", "i"]).reset_index(drop=True))
    want = df.sort_values(["k", "t", "i"]).reset_index(drop=True)
    np.testing.assert_allclose(got["ma"].to_numpy(),
                               want["v"].to_numpy(), rtol=1e-12)
