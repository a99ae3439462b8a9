"""Pairwise-moment combiner: merged partials must equal single-pass numpy
results regardless of how rows are split into batches."""

import numpy as np
import pytest

from faang_pydantics_validation_ray.functions.stats import _merge


def _partial(x, y):
    n = len(x)
    if n == 0:
        return (0, 0.0, 0.0, 0.0, 0.0, 0.0)
    mx, my = x.mean(), y.mean()
    return (n, mx, my,
            float(((x - mx) ** 2).sum()),
            float(((y - my) ** 2).sum()),
            float(((x - mx) * (y - my)).sum()))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("splits", [1, 3, 17])
def test_merge_matches_single_pass(seed, splits):
    rng = np.random.default_rng(seed)
    x = rng.normal(1e6, 3.0, size=1000)   # large offset: stability check
    y = 0.5 * x + rng.normal(0, 2.0, size=1000)
    acc = (0, 0.0, 0.0, 0.0, 0.0, 0.0)
    for xs, ys in zip(np.array_split(x, splits), np.array_split(y, splits)):
        acc = _merge(acc, _partial(xs, ys))
    n, mx, my, m2x, m2y, cxy = acc
    assert n == 1000
    assert mx == pytest.approx(x.mean(), rel=1e-12)
    assert my == pytest.approx(y.mean(), rel=1e-12)
    assert m2x == pytest.approx(x.var() * 1000, rel=1e-9)
    assert cxy / np.sqrt(m2x * m2y) == pytest.approx(
        np.corrcoef(x, y)[0, 1], rel=1e-9)


def test_merge_empty_sides():
    p = _partial(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
    z = (0, 0.0, 0.0, 0.0, 0.0, 0.0)
    assert _merge(z, p) == p
    assert _merge(p, z) == p


def test_ks_two_sample_matches_numpy(ray_session):
    """Distributed exact KS vs a driver-side ECDF computation, with
    duplicate values and a real location shift between the populations."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.stats import ks_two_sample

    rng = np.random.default_rng(11)
    n = 4000
    a = np.round(rng.normal(0.0, 1.0, n), 1)       # duplicates via rounding
    b = np.round(rng.normal(0.4, 1.2, n), 1)       # shifted + rescaled
    df = pd.DataFrame({"x": np.concatenate([a, b]),
                       "grp": np.repeat([1, 0], n).astype(np.int64)})
    ds = rd.from_pandas(df).repartition(7)

    def flag(t: pa.Table) -> np.ndarray:
        return t.column("grp").to_numpy(zero_copy_only=False) == 1

    got = ks_two_sample(ds, "x", flag)

    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), xs, side="right") / n
    fb = np.searchsorted(np.sort(b), xs, side="right") / n
    want = np.abs(fa - fb).max()
    assert got["n_a"].iloc[0] == got["n_b"].iloc[0] == n
    assert abs(got["ks"].iloc[0] - round(want, 6)) < 1e-9
    assert got["ks"].iloc[0] > 0.1                 # the shift is detectable


def test_ks_two_sample_identical_populations(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.stats import ks_two_sample

    v = np.arange(500, dtype=np.float64)
    df = pd.DataFrame({"x": np.concatenate([v, v]),
                       "grp": np.repeat([1, 0], 500).astype(np.int64)})
    ds = rd.from_pandas(df).repartition(4)

    def flag(t: pa.Table) -> np.ndarray:
        return t.column("grp").to_numpy(zero_copy_only=False) == 1

    got = ks_two_sample(ds, "x", flag)
    assert got["ks"].iloc[0] == 0.0
